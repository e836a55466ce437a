"""Tokenizer-training operators: distributed BPE merge learning.

Reference parity: the reference has no tokenizer trainer — this is part
of the LLM-training-data extension surface (alongside dedup / quality /
packing), mirroring how Sennrich et al. 2016 BPE is trained at corpus
scale: the corpus is first reduced to a word-frequency histogram (the
only corpus-sized shuffle), and every merge iteration then runs over the
histogram, which is vocabulary-sized (≪ corpus) by construction. That
two-phase shape is exactly what survives 100 TB: one groupBy over the
corpus, then an iterative loop whose working set is a few thousand rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _apply_merge(seg: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one BPE merge (a, b) → a||b to a segmentation table
    (word, cnt, pos, sym), with BPE's left-to-right greedy non-overlap
    rule: in a run of consecutive match positions (which only arises
    when b == a, e.g. 'aaaa' under (a,a)), every other occurrence merges
    — 'aaaa' → 'aa','aa', not three overlapping pairs. The run-parity
    selection is pure window algebra (gaps-and-islands over match
    positions), so the identical logic replays in the SQL oracle."""
    w = Window.partitionBy("word").orderBy("pos")
    with_n = seg.withColumn("nxt", F.lead("sym").over(w))
    matches = with_n.filter((F.col("sym") == a) & (F.col("nxt") == b)).select(
        "word", "pos"
    )
    runs = matches.withColumn(
        "brk", F.when(F.col("pos") - F.lag("pos").over(w) == 1, 0).otherwise(1)
    ).withColumn("runid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    sel = (
        runs.withColumn(
            "rn", F.row_number().over(Window.partitionBy("word", "runid").orderBy("pos"))
        )
        .filter(F.col("rn") % 2 == 1)
        .select("word", "pos")
    )
    # ONE broadcast of a marker table instead of two (r8 job-count cut:
    # each broadcast exchange was its own AQE stage materialization, ×2
    # per merge iteration): a merge START (pos, mk=1) and its absorbed
    # right neighbor (pos+1, mk=2) are disjoint (starts within a run are
    # 2 apart; runs are non-adjacent), so the union keys are unique and
    # a single left join recovers both flags. Vocabulary-sized, as
    # before.
    marks = F.broadcast(
        sel.select("word", "pos", F.lit(1).alias("mk")).unionAll(
            sel.select("word", (F.col("pos") + 1).alias("pos"), F.lit(2).alias("mk"))
        )
    )
    return (
        with_n.join(marks, ["word", "pos"], "left")
        .filter(F.col("mk").isNull() | (F.col("mk") == 1))
        .withColumn(
            "sym2",
            F.when(F.col("mk") == 1, F.concat("sym", "nxt")).otherwise(F.col("sym")),
        )
        .withColumn("pos2", F.row_number().over(w))
        .select("word", "cnt", F.col("pos2").alias("pos"), F.col("sym2").alias("sym"))
    )


def bpe_train(
    word_counts: DataFrame,
    word_col: str = "word",
    count_col: str = "cnt",
    n_merges: int = 3,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a word-frequency table.

    Input: (word, count) — the output of the corpus-sized groupBy, the
    standard BPE training input (no end-of-word marker; plain character
    alphabet). Each iteration: adjacent-pair counts weighted by word
    frequency (a lead window + one map-side-combinable groupBy over the
    vocabulary-sized segmentation table), the arg-max pair (ties broken
    lexicographically on (left, right) for cross-engine determinism) is
    collected to the driver — a single row per iteration, the same
    "tiny model state drives the next distributed step" shape as
    ``kmeans_lloyd`` centroids — and applied everywhere via
    :func:`_apply_merge`. The segmentation is localCheckpoint-ed per
    iteration so the plan stays constant-size across merges.

    Returns (step, left_sym, right_sym, merged, pair_count): the learned
    merge table, k rows. Later steps' counts depend on earlier merges
    having been applied correctly corpus-wide, so an oracle replay of
    this table certifies the application logic too.
    """
    spark = word_counts.sparkSession
    merges, _ = _learn_merges(
        _char_segmentation(word_counts, word_col, count_col),
        n_merges,
        apply_last=False,
    )
    return spark.createDataFrame(
        merges,
        "step INT, left_sym STRING, right_sym STRING, merged STRING, pair_count BIGINT",
    )


def bpe_segment_words(
    word_counts: DataFrame,
    word_col: str = "word",
    count_col: str = "cnt",
    n_merges: int = 3,
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the word-frequency table and
    return the final VOCABULARY segmentation — (word, cnt, pos, sym)
    with every learned merge (including the last) applied. This is the
    encode half of the tokenizer: segmenting the vocabulary once and
    broadcast-joining it back to the corpus is how BPE encoding runs at
    100 TB — the merge loop never touches the corpus, and the per-doc
    application is a map-side join on the word key, not an iterative
    pass over every document."""
    _, seg = _learn_merges(
        _char_segmentation(word_counts, word_col, count_col),
        n_merges,
        apply_last=True,
    )
    return seg


def _char_segmentation(
    word_counts: DataFrame, word_col: str, count_col: str
) -> DataFrame:
    """Initial character-level segmentation table (word, cnt, pos, sym)."""
    return word_counts.select(
        F.col(word_col).alias("word"),
        F.col(count_col).cast("long").alias("cnt"),
        # split on the empty pattern, NOT regexp_extract_all(".") —
        # Java "." excludes line terminators (U+2028/U+2029/U+0085),
        # which would silently drop characters the oracle's
        # substr(word, i, 1) keeps
        F.posexplode(F.split(F.col(word_col), "")),
    ).select("word", "cnt", (F.col("pos") + 1).alias("pos"), F.col("col").alias("sym"))


def _learn_merges(
    seg: DataFrame, n_merges: int, apply_last: bool
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """The shared merge loop: per iteration, adjacent-pair counts →
    deterministic arg-max (ties lexicographic on (left, right)) →
    greedy application via :func:`_apply_merge`. ``apply_last`` is the
    train/encode split: training only needs the counts of the last pair
    (bpe_train), encoding needs the segmentation AFTER it
    (bpe_segment_words). Returns (merge table rows, final seg).

    Iteration pins stay pin() (localCheckpoint): a persist-based pin
    that in PRINCIPLE preserves the hash(word) partitioning/ordering
    for the next iteration's lead window was measured and REJECTED —
    under AQE the cached plan is adaptive, its final partitioning is
    unknown at the consumer's planning time, so the exchange is paid
    anyway AND the eager count through the full plan costs more than
    the checkpoint's direct RDD materialization (19 vs 20 jobs,
    2.3-2.7 s vs 1.8-2.0 s warm at sf0.1, same session back-to-back).
    """
    from ..caching import pin

    seg = pin(seg)
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        w = Window.partitionBy("word").orderBy("pos")
        pairs = (
            seg.withColumn("nxt", F.lead("sym").over(w))
            .filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        best = pairs.orderBy(F.col("pair_count").desc(), "sym", "nxt").limit(1).collect()
        if not best:
            break
        a, b, pc = best[0]["sym"], best[0]["nxt"], int(best[0]["pair_count"])
        merges.append((step, a, b, a + b, pc))
        if step < n_merges or apply_last:
            seg = pin(_apply_merge(seg, a, b))
    return merges, seg
