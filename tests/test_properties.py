"""Property-based tests (hypothesis) for the dedup/text operator core —
invariants that must hold for ANY input, not just fixtures."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from catlas_spark.operators.dedup import MINHASH_P, minhash_coeffs

words = st.lists(st.sampled_from("alpha beta gamma delta eps zeta".split()), min_size=2, max_size=30)


def _shingles(toks):
    return {f"{a} {b}" for a, b in zip(toks, toks[1:])}


def _sig(toks, n_perm=12):
    out = []
    for i, (a, b) in enumerate(minhash_coeffs(n_perm)):
        vals = []
        for s in _shingles(toks):
            x = int(hashlib.md5(s.encode()).hexdigest()[:7], 16)
            vals.append((a * x + b) % MINHASH_P)
        out.append(min(vals))
    return out


def test_minhash_production_sigs_match_python_replica(spark):
    """Drives the PRODUCTION minhash_signatures (r8 tautology hunt: the
    old form asserted _sig(toks) == _sig(list(toks)) — a pure function
    compared to itself, green under any production regression). The
    Python replica is the independent oracle: identical docs must get
    identical signatures AND both must equal the replica per-permutation
    values."""
    from catlas_spark.operators.dedup import minhash_signatures

    docs = [
        "alpha beta gamma delta",
        "alpha beta gamma delta",  # identical twin
        "zeta eps beta alpha zeta eps",
        "gamma gamma gamma gamma",  # degenerate single-shingle doc
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc"]: [r[f"sig_{i}"] for i in range(12)]
        for r in minhash_signatures(df, "text", "doc_id", n_perm=12).collect()
    }
    assert got[0] == got[1]  # identical docs, identical signatures
    for i, t in enumerate(docs):
        assert got[i] == _sig(t.split()), f"doc {i} diverges from the replica"


def test_minhash_zero_shingle_docs_emit_no_row(spark):
    """The in-row form (r9) must keep the explode form's contract: a doc
    with NO shingles (empty/one-token text, NULL text) produces NO
    signature row at all — an emitted row would carry NULL sigs, and
    concat_ws band keys collapse NULLs so every such doc would share one
    LSH bucket as spurious candidates."""
    from catlas_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, ""), (2, "solo"), (3, None)],
        "doc_id long, text string",
    )
    rows = minhash_signatures(df, "text", "doc_id", n_perm=4, with_hash_set=True).collect()
    assert [r["doc"] for r in rows] == [0]
    assert all(r["sig_0"] is not None for r in rows)


def test_minhash_signature_regime_equality(spark):
    """The two physical signature forms (explode+groupBy vs in-row HOF
    fold) must be value-identical on every column, including the hset
    compared as a SET, and share the zero-shingle no-row contract and
    the char-shingle mode. Also pins the dispatcher: both forced forms
    route, and an unknown form raises rather than silently defaulting."""
    import pytest

    from catlas_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta alpha beta"),
            (1, "zeta eps beta alpha zeta eps"),
            (2, ""),  # zero-shingle: no row in EITHER regime
            (3, "gamma gamma gamma gamma"),
            (4, None),
        ],
        "doc_id long, text string",
    )

    def norm(rows):
        return {
            r["doc"]: (
                [r[f"sig_{i}"] for i in range(8)],
                frozenset(r["hset"]),
            )
            for r in rows
        }

    for mode in ("token", "char"):
        a = norm(
            minhash_signatures(
                df, "text", "doc_id", n_perm=8, with_hash_set=True,
                shingle_mode=mode, form="explode",
            ).collect()
        )
        b = norm(
            minhash_signatures(
                df, "text", "doc_id", n_perm=8, with_hash_set=True,
                shingle_mode=mode, form="inrow",
            ).collect()
        )
        assert a == b, f"regimes diverge in {mode} mode"
        assert set(a) == {0, 1, 3}
    with pytest.raises(ValueError, match="unknown form"):
        minhash_signatures(df, "text", "doc_id", form="banana").collect()


@settings(max_examples=100, deadline=None)
@given(words, words)
def test_minhash_agreement_tracks_jaccard(a, b):
    """Signature agreement never exceeds 1, equals 1 for identical shingle
    sets, and is 0-similar docs rarely collide (statistical sanity)."""
    sa, sb = _shingles(a), _shingles(b)
    agree = sum(x == y for x, y in zip(_sig(a), _sig(b))) / 12
    if sa == sb:
        assert agree == 1.0
    if not (sa & sb):
        assert agree <= 0.5  # collisions only by 2^-28 hash accidents


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=64))
def test_minhash_coeffs_valid(n):
    coeffs = minhash_coeffs(n)
    assert len(coeffs) == n == len(set(coeffs))
    for a, b in coeffs:
        assert 0 < a < MINHASH_P and a % 2 == 1
        assert 0 <= b < MINHASH_P
        # overflow safety: max product fits in int64
        assert a * (2**28) + b < 2**63


def test_char_and_token_shingles_disjoint_semantics(spark):
    # char mode must produce overlapping 8-grams; token mode word bigrams
    from pyspark.sql import functions as F

    from catlas_spark.functions.text import char_shingles, token_shingles

    df = spark.createDataFrame([("abcdefghij klm",)], ["text"])
    chars, toks = df.select(
        char_shingles(F.col("text"), 8).alias("c"),
        token_shingles(F.col("text"), 2).alias("t"),
    ).first()
    assert "abcdefgh" in chars and "hij klm" not in chars  # 7 < n
    assert all(len(s) == 8 for s in chars)
    assert len(chars) == len("abcdefghij klm") - 7
    assert toks == ["abcdefghij klm"]


# --- round-6 rewrites: exact quantiles and CC regime equivalence -------------

_groups = st.sampled_from([None, "a", "b", "zz"])
_vals = st.integers(min_value=-50, max_value=50)


# max_examples 12 → 5 (r12, verdict item 1a: suite wall time): each
# example runs ~10 Spark actions (truth + 3 regimes x probe/stats/final),
# making this the single slowest test in the suite (155 s measured); 5
# examples + hypothesis shrinking keep the NULL-group / 1-partition /
# pre-aggregate-dispatch edges covered at ~40% of the cost.
@settings(max_examples=5, deadline=None)
@given(
    st.lists(st.tuples(_groups, _vals), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=8),
)
def test_grouped_exact_quantiles_property(spark, rows, n_parts):
    """For ANY (group, value) table — NULL groups included — and ANY
    partition count (1 = the empty-boundary edge), both regimes of
    grouped_exact_quantiles must equal Spark's single-buffer
    percentile per group."""
    from pyspark.sql import functions as F

    from catlas_spark.partitioning import grouped_exact_quantiles

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    probs = [0.0, 0.3, 0.5, 1.0]
    truth = {}
    for r in df.groupBy("g").agg(
        *[F.percentile("v", F.lit(p)).alias(f"p{i}") for i, p in enumerate(probs)]
    ).collect():
        for i, p in enumerate(probs):
            truth[(r["g"], float(p))] = round(r[f"p{i}"], 6)
    for pre in (None, True, False):
        got = {
            (r["g"], r.prob): round(r.quantile, 6)
            for r in grouped_exact_quantiles(df, "g", "v", probs, direct_max_bytes=0, num_partitions=n_parts, pre_aggregate=pre
            ).collect()
        }
        assert got == truth, f"pre_aggregate={pre} n_parts={n_parts}"


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_connected_components_regimes_agree(spark, edges):
    """Driver union-find and the distributed min-label loop must produce
    identical (node, min-id-of-component) labelings for ANY edge list —
    self-loops and duplicate/reversed edges included."""
    from catlas_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    uf = {
        (r.node, r.cluster_id)
        for r in connected_components(df).collect()
    }
    dist = {
        (r.node, r.cluster_id)
        for r in connected_components(df, driver_max_edges=0).collect()
    }
    assert uf == dist


def test_whitespace_convention_matches_duckdb_on_exotic_text(spark):
    """The r8 whitespace unification: one explicit ASCII class
    [ \\t\\n\\x0B\\f\\r] + regex-strip on BOTH engines. A bare \\s
    diverged them (Java's includes \\x0B, RE2's does not), SQL/F.trim
    strip only U+0020 (phantom '' token for tab/newline-fringed text),
    and Java '.' silently dropped char shingles crossing U+2028. Every
    normalized artifact must now agree cross-engine on the exotic zoo."""
    import duckdb
    from pyspark.sql import functions as F

    from catlas_spark.functions.text import (
        char_shingles,
        fingerprint,
        token_count,
        bpe_ish_token_count,
    )

    zoo = [
        (0, "plain text here"),
        (1, "\tleading tab"),
        (2, "trailing newline\n"),
        (3, "vertical\x0Btab"),
        (4, "line separator ab"),
        (5, "  multi   space  "),
        (6, ""),
        (7, "\x0b\x0b"),
        (8, "a bcdefg"),
    ]
    df = spark.createDataFrame(zoo, "doc_id long, text string")
    got = {
        r.doc_id: (r.fp, r.n_tok, r.n_bpe, sorted(r.sh))
        for r in df.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fp"),
            token_count(F.col("text")).alias("n_tok"),
            bpe_ish_token_count(F.col("text")).alias("n_bpe"),
            char_shingles(F.col("text"), 3).alias("sh"),
        ).collect()
    }

    con = duckdb.connect()
    con.register("docs", __import__("pandas").DataFrame(zoo, columns=["doc_id", "text"]))
    ws = "[ \\t\\n\\x0B\\f\\r]"
    norm = (
        f"regexp_replace(lower(regexp_replace(text, '^{ws}+|{ws}+$', '', 'g')), "
        f"'{ws}+', ' ', 'g')"
    )
    rows = con.execute(
        f"""
        SELECT doc_id,
               substring(md5({norm}), 1, 16) AS fp,
               len(string_split({norm}, ' ')) AS n_tok,
               len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9{ws[1:-1]}]')) AS n_bpe,
               1 AS _pad
        FROM docs
        """
    ).fetchall()

    # shingles: RE2 has no lookahead, so the DuckDB oracles never use
    # this form — check Spark against a plain-Python reference of the
    # convention instead (normalize with the explicit class, all
    # overlapping 3-grams incl. across U+2028, distinct)
    import re as _re

    def _py_sh(text):
        t = _re.sub("[ \t\n\x0B\f\r]+", " ", _re.sub("^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$", "", text.lower()))
        return sorted({t[i : i + 3] for i in range(len(t) - 2)})

    want = {r[0]: (r[1], r[2], r[3], _py_sh(dict(zoo)[r[0]])) for r in rows}
    assert got == want
