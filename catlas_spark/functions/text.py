"""Text-analysis column functions for large-scale training-data pipelines.

All functions are pure Column expressions (JVM-side, whole-stage codegen;
no Python UDFs in the hot path) so they run at 100 TB without Arrow
transfer. Patterned after the reference's scalar-function surface
(SURVEY.md §2.11) but targeting document corpora.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# THE whitespace definition (r8 review): one EXPLICIT ASCII class shared
# by every normalizer here and every DuckDB oracle. A bare \s diverges
# the engines — Java's \s is [ \t\n\x0B\f\r] but RE2's lacks \x0B, so a
# vertical-tab document normalized differently on the two sides broke
# fingerprint/token-count/minhash parity. The same class string parses
# identically in Java regex and RE2 (never use \v: Java reads it as
# "vertical whitespace" incl. U+2028, RE2 as the single 0x0B char).
WS_CHARS = " \\t\\n\\x0B\\f\\r"
WS = f"[{WS_CHARS}]"


def ws_strip(col: Column) -> Column:
    """Engine-portable whitespace trim. ``F.trim``/SQL ``trim`` strip
    ONLY U+0020, so a leading tab or trailing newline survived into the
    split and minted a phantom '' token — inflating token_count and
    diluting every ratio built on it for newline-terminated documents
    (r8 review). The oracle-side twin is
    ``regexp_replace(text, '^{WS}+|{WS}+$', '', 'g')``."""
    return F.regexp_replace(col, f"^{WS}+|{WS}+$", "")

# Tiny in-expression stopword lists (per-language); used by both quality
# scoring and the n-gram language-ID heuristic. Kept small deliberately —
# they are broadcast as literals inside the plan, no side table needed.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "in", "to", "is"],
    "fr": ["le", "la", "de", "et", "un", "une", "est"],
    "de": ["der", "die", "das", "und", "ein", "ist"],
    "es": ["el", "la", "de", "y", "un", "una", "es"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization.

    CONVENTION (engine-portable, shared with every DuckDB oracle):
    splitting EMPTY text yields one empty token — ``split('')`` is
    ``['']`` in Spark and ``string_split('', ' ')`` is ``['']`` in
    DuckDB, so ``token_count('') == 1`` on both engines. Callers
    summing corpus token counts over possibly-empty documents should
    pre-filter ``length(trim(text)) > 0``; changing the convention here
    would silently diverge every oracle that replays ``len(toks)``."""
    return F.split(ws_strip(col), WS + "+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword proxy: alpha runs, digit runs, and single
    non-space symbols each count as one token."""
    # the symbol alternative excludes ALL whitespace, not just the
    # space character (r8 review: 'foo\nbar' counted the newline as a
    # third token); the oracle carries the same explicit class
    return F.size(
        F.regexp_extract_all(
            F.lower(col), F.lit(f"[a-z]+|[0-9]+|[^a-z0-9{WS_CHARS}]"), 0
        )
    )


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    toks = tokens(F.lower(col))
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw / F.size(toks)


def unique_token_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    return F.size(F.array_distinct(toks)) / F.size(toks)


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are ASCII punctuation
    (``!-/ :-@ [-\\` {-~``, i.e. POSIX [:punct:]).

    Counting PUNCTUATION rather than "everything non-[A-Za-z0-9\\s]"
    keeps the ratio fair for non-English text (r8): under the old
    complement definition every accented or non-Latin LETTER (é, ü, ß,
    CJK) counted as noise, so the quality scorer systematically
    depressed exactly the fr/de/es documents this module's language-ID
    supports. For pure-ASCII text the two definitions are identical.
    Empty text yields NULL via ``try_divide`` — a plain ``/`` ERRORS on
    division by zero under Spark 4's ANSI default, where the DuckDB
    oracle's ``x/0`` is NULL; try_divide is the engine-portable
    spelling. See :func:`quality_score` for why NULL is the right
    disposition."""
    stripped = F.regexp_replace(col, r"[^\x21-\x2f\x3a-\x40\x5b-\x60\x7b-\x7e]", "")
    return F.try_divide(F.length(stripped), F.length(col))


def mean_token_length(col: Column) -> Column:
    toks = tokens(col)
    return F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
    ) / F.size(toks)


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: rewards moderate length,
    vocabulary diversity and low punctuation noise (the usual pre-training
    corpus filters, each a cheap native expression).

    EMPTY text scores NULL, deliberately (r8 review): punct_ratio is
    try_divide NULL on zero length (DuckDB's x/0 agrees), and NULL
    fails every ``quality >= tau`` keep-filter — the correct disposition
    for an empty document. Patching the ratios to 0 would be WORSE:
    unique_token_ratio of the [''] token list is 1.0, so a zero-guarded
    empty doc would score 0.6 and sail through the standard 0.5
    threshold. Reject-side callers (``quality < tau``) must handle NULL
    explicitly."""
    len_score = F.least(F.length(col) / F.lit(400.0), F.lit(1.0))
    raw = 0.4 * len_score + 0.4 * unique_token_ratio(col) + 0.2 * (1.0 - punct_ratio(col))
    # floor(x*1e4 + 0.5) instead of round(): the score's small-denominator
    # fractions land exactly on .00005 boundaries, where Spark rounds the
    # shortest decimal representation but other engines round the raw
    # double — floor of the identical double is engine-invariant
    return F.floor(raw * 10_000 + F.lit(0.5)) / 10_000.0


def lang_guess(col: Column) -> Column:
    """N-gram/stopword language-ID heuristic: highest stopword-hit-count
    wins (ties broken by lexicographically greatest language code);
    zero hits → 'und' (undetermined)."""
    toks = tokens(F.lower(col))
    scores = []
    for lang, words in STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column, length: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized
    lowercased text, truncated. Cross-engine stable (md5 is md5)."""
    normalized = F.regexp_replace(F.lower(ws_strip(col)), WS + "+", " ")
    return F.substring(F.md5(normalized), 1, length)


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams (for minhash/jaccard).

    Single codegen'd regex with overlapping-match lookahead — no
    interpreted higher-order functions in the hot path (measured ~2×
    faster than a transform() over substring indices). Texts shorter
    than ``n`` yield an empty array.
    """
    lowered = F.regexp_replace(F.lower(ws_strip(col)), WS + "+", " ")
    # (?s) — DOTALL (r8 review): Java '.' excludes the Unicode line
    # terminators U+2028/U+2029/U+0085, which no ASCII normalizer
    # removes, so every n-gram crossing one silently vanished (RE2's
    # '.' matches them — a cross-engine shingle divergence). Post-
    # normalization text contains no \n, so DOTALL only widens '.' to
    # exactly the characters RE2 already accepted.
    return F.array_distinct(
        F.regexp_extract_all(lowered, F.lit(f"(?s)(?=(.{{{n}}}))."), 1)
    )


def token_shingles(col: Column, n: int = 2) -> Column:
    """Distinct token n-grams (word shingles).

    Overlapping bigrams (trigrams, ...) are captured by one lookahead
    regex over the normalized text — fully inside whole-stage codegen,
    no transform()/slice() interpretation. Texts with fewer than ``n``
    tokens yield an empty array.
    """
    normalized = F.regexp_replace(F.lower(ws_strip(col)), WS + "+", " ")
    # post-normalization the only whitespace is ' ', so the explicit
    # negated class replaces \S (same Java/RE2 ambiguity as \s)
    pattern = "(?=([^ ]+" + " [^ ]+" * (n - 1) + "))[^ ]+"
    return F.array_distinct(F.regexp_extract_all(normalized, F.lit(pattern), 1))
