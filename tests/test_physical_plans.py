"""Physical-plan regression tests: the optimizations the engine relies on
at 100 TB must stay visible in explain() output (SURVEY.md §4)."""

from __future__ import annotations

import contextlib
import io

import pytest

from catlas_spark import queries as Q


# One shared sweep for the whole module (r12, verdict item 1a): the old
# per-call plan_of re-built + re-explained each query, and the full-
# registry UDF guard alone paid ~170 serial explains (56 s measured).
# Plans are built ONCE, serially (builders may touch shared session
# state), then explained from a small thread pool — Catalyst planning is
# thread-safe and explain never executes. ~200 explains collapse to one
# ~15 s sweep shared by every test below.
_PLAN_TEXTS: dict[str, str] = {}


def _explain_text(df) -> str:
    # the string straight from the JVM (what df.explain prints): a
    # redirect_stdout capture is process-global, so concurrent explains
    # in the thread pool would interleave each other's output
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _all_plans(spark, sf_dir) -> dict[str, str]:
    if _PLAN_TEXTS:
        return _PLAN_TEXTS
    from concurrent.futures import ThreadPoolExecutor

    from catlas_spark.caching import lazy_plans

    # lazy_plans: operators that normally checkpoint-and-release their
    # caches return the full lazy tree instead of Scan ExistingRDD, so
    # the sweep inspects (and does NOT execute) the real plan — a Python
    # stage inside those operators stays visible to the whitelist guard
    with lazy_plans():
        qs = Q.queries()
        dfs = {name: fn(spark, sf_dir) for name, fn in qs.items()}
        with ThreadPoolExecutor(max_workers=8) as ex:
            for name, text in zip(
                dfs, ex.map(_explain_text, dfs.values())
            ):
                _PLAN_TEXTS[name] = text
    # the last-built query may have left a per-query conf override set
    # (bloom_pruned_join's builder does); restore the baseline so the
    # sweep cannot leak plan-shaping confs into later tests
    Q._session_tune(spark)
    return _PLAN_TEXTS


def plan_of(spark, sf_dir, name: str) -> str:
    return _all_plans(spark, sf_dir)[name]


def test_filter_pushdown_and_pruning(spark, sf_dir):
    p = plan_of(spark, sf_dir, "filter_range")
    assert "GreaterThanOrEqual(p_retailprice,500.0)" in p  # predicate → scan
    assert "p_brand" not in p.split("ReadSchema")[1].splitlines()[0]  # pruned


def test_dim_joins_broadcast(spark, sf_dir):
    p = plan_of(spark, sf_dir, "join_revenue_per_nation")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_topn_avoids_global_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "orderby_limit_topn")
    assert "TakeOrderedAndProject" in p


def test_agg_is_partial_then_final(spark, sf_dir):
    p = plan_of(spark, sf_dir, "pricing_summary")
    assert p.count("HashAggregate") >= 2  # map-side combine present


def test_semi_anti_join_strategies(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "semi_join_customers_with_orders")
    assert "LeftAnti" in plan_of(spark, sf_dir, "anti_join_customers_without_orders")


# the ONLY queries allowed to carry a Python stage: the multimodal
# decoders and the custom-mergeable-sketch exemplar (Arrow-batched
# MapInPandas), the SemDeDup pairwise scorer (Arrow applyInPandas —
# the engine's one vectorized-Python arithmetic stage, bit-exact
# dim-sequential numpy fold), plus the native Spark-4 UDTF exemplar
# (Arrow-enabled UDTF) — never row-at-a-time EvalPython anywhere
MAPINPANDAS_QUERIES = (
    "multimodal_decode",
    "multimodal_frame_sample",
    "multimodal_resize",
    "multimodal_audio_energy",
    "misra_gries_contract",
)
# dedup_embedding_cosine and the CC queries built on its pair list
# moved to the blocked_cosine_pairs Arrow stage in r9 (the semantic_dedup
# scorer convention: pairwise float arithmetic is the engine's
# designated vectorized-Python stage; the interpreted higher-order
# aggregate join form measured 1.9 s vs 0.8 s at sf0.1)
GROUPED_PANDAS_QUERIES = (
    "dedup_semantic",
    "dedup_embedding_cosine",
    "dedup_cluster_assign",
)
UDTF_QUERIES = ("rle_tokens_udtf",)
PYTHON_STAGE_QUERIES = MAPINPANDAS_QUERIES + GROUPED_PANDAS_QUERIES + UDTF_QUERIES


def test_no_python_udf_in_native_queries(spark, sf_dir):
    # everything else must stay JVM-side: no BatchEvalPython /
    # ArrowEvalPython (scalar UDFs) and no pandas stages either — the
    # bare "InPandas" probe catches MapInPandas AND FlatMapGroupsInPandas
    # (a grouped stage slipping in unlisted used to pass the old
    # "MapInPandas" substring check — tautology-hunt fix, round 7).
    # A new Python stage must be added to the explicit whitelist above.
    for name in Q.queries():
        if name in PYTHON_STAGE_QUERIES:
            continue
        p = plan_of(spark, sf_dir, name)
        assert "EvalPython" not in p, f"{name} fell off the JVM path"
        assert "InPandas" not in p, f"{name} grew an unlisted Python stage"


def test_semantic_scorer_is_arrow_grouped(spark, sf_dir):
    for name in GROUPED_PANDAS_QUERIES:
        p = plan_of(spark, sf_dir, name)
        assert "FlatMapGroupsInPandas" in p  # Arrow per-cluster batches
        assert "BatchEvalPython" not in p


def test_multimodal_is_arrow_batched(spark, sf_dir):
    for name in MAPINPANDAS_QUERIES:
        p = plan_of(spark, sf_dir, name)
        assert "MapInPandas" in p  # Arrow batch, not row-at-a-time UDF
        assert "BatchEvalPython" not in p


def test_udtf_is_arrow_enabled(spark, sf_dir):
    for name in UDTF_QUERIES:
        p = plan_of(spark, sf_dir, name)
        assert "ArrowEvalPythonUDTF" in p  # Arrow batch, not pickle rows
        assert "BatchEvalPython" not in p


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Tables bucketed on the join key must join with zero Exchange
    operators (the write-once-shuffle-never pattern for 100 TB joins)."""
    from catlas_spark.partitioning import write_bucketed

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8, path=str(tmp_path / "li"))
    write_bucketed(orders, "o_bucketed", "o_orderkey", 8, path=str(tmp_path / "o"))

    import contextlib
    import io

    # disable broadcast BEFORE building the plan: the point at scale is
    # sort-merge over co-located buckets with zero exchanges. Restore
    # the PREVIOUS value, not a literal — the old hardcoded 64MB restore
    # silently leaked a non-default broadcast threshold into every later
    # test in the shared session (r7 tautology hunt).
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            spark.table("li_bucketed").l_orderkey
            == spark.table("o_bucketed").o_orderkey,
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" in p
        assert "Exchange hashpartitioning" not in p
        # results correct
        assert (
            joined.count()
            == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)


def test_bloom_filter_join_pruning(spark, sf_dir):
    # the selective orders predicate must inject a might_contain() probe
    # into the lineitem side (Catalyst InjectRuntimeFilter)
    df = Q.queries()["bloom_pruned_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan
    # the override is scoped: the next _t() restores the broadcast default
    Q.queries()["join_revenue_per_nation"](spark, sf_dir)
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "10485760"


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-partitioned layout + a partition-column predicate must prune
    at planning time: the scan lists only matching directories (at 100 TB
    the date partition is the first-line data-skipping mechanism)."""
    out = str(tmp_path / "orders_by_status")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(out)

    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in p
    # the pruned scan must not carry the predicate as a data filter
    expected = orders.filter("o_orderstatus = 'F'").count()
    assert df.count() == expected


def test_salted_join_shuffles_on_salted_key(spark, sf_dir):
    """salted_skew_join must actually shuffle on (key, salt): a shuffled
    hash join (dim side is replicate-cheap by contract, so it always
    fits a per-partition hash map and the fact-side sort is skipped)
    whose keys include the salt column, no broadcast of the replicated
    dim (replication is pointless under broadcast)."""
    p = plan_of(spark, sf_dir, "salted_skew_join")
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p
    assert "__salt" in p
    keys_line = next(l for l in p.splitlines() if l.startswith("Left keys"))
    assert "l_suppkey" in keys_line and "__salt" in keys_line


def test_sliding_window_single_shuffle(spark, sf_dir):
    """The sliding-window aggregate expands windows map-side (Expand or
    Generate before the exchange) and aggregates with a partial/final
    pair — one shuffle total."""
    p = plan_of(spark, sf_dir, "events_sliding_window")
    # tree form "Exchange (n)" counts physical exchanges once; the
    # formatted detail section repeats each as "(n) Exchange"
    assert p.count("Exchange (") == 1
    assert "HashAggregate" in p


def test_interval_join_is_hash_not_nested_loop(spark, sf_dir):
    # the bucket-expansion rewrite must keep the range join a hash join;
    # a BroadcastNestedLoopJoin here means the equi bucket key was lost
    # and the plan degraded to the O(points x intervals) cartesian
    p = plan_of(spark, sf_dir, "interval_bucket_join")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p


def test_broadcast_threshold_sensitivity(spark, sf_dir):
    """The same logical join must flip BroadcastHashJoin <-> SortMergeJoin
    purely on spark.sql.autoBroadcastJoinThreshold, with identical results
    — the knob a 100 TB deployment tunes per dimension-table size, so a
    regression here (e.g. a stray hint pinning one strategy) would silently
    force shuffle joins at scale."""
    from pyspark.sql import functions as F

    def build():
        # fresh DataFrame per phase: an executed DF pins its (adaptive)
        # final plan, so conf changes would not re-plan it
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
        return (
            cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"])
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def run():
        import contextlib
        import io

        df = build()
        rows = sorted((r.n_name, r.n) for r in df.collect())
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")  # post-run: shows the AQE final plan
        return buf.getvalue(), rows

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",  # AQE re-broadcast knob
    )
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, str(10 * 1024 * 1024))
        p_bc, rows_bc = run()
        for k in keys:
            spark.conf.set(k, "-1")
        p_smj, rows_smj = run()
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    assert "BroadcastHashJoin" in p_bc and "SortMergeJoin" not in p_bc
    assert "SortMergeJoin" in p_smj and "BroadcastHashJoin" not in p_smj
    assert rows_bc == rows_smj and rows_bc


def test_range_clustered_write_enables_rowgroup_skipping(spark, sf_dir, tmp_path):
    """Sort-on-write clustering must produce parquet row groups whose
    min/max footer stats let a range filter skip most groups, where the
    same data written hash-shuffled cannot skip any — the row-group
    layer of the data-skipping stack (partition pruning and bucketing
    are covered elsewhere). Spark's reader skips off exactly these
    stats when the filter is pushed (asserted on the plan)."""
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from catlas_spark.partitioning import write_range_clustered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    lo, hi = [
        r[0]
        for r in li.selectExpr("min(l_shipdate)").collect()
        + li.selectExpr("max(l_shipdate)").collect()
    ]
    span = (hi - lo).days
    f_lo, f_hi = lo, lo + __import__("datetime").timedelta(days=max(1, span // 20))

    clustered = str(tmp_path / "clustered")
    shuffled = str(tmp_path / "shuffled")
    write_range_clustered(li, clustered, "l_shipdate", n_ranges=2, row_group_bytes=8 * 1024)
    (
        li.repartition(2, "l_orderkey")
        .write.mode("overwrite")
        .option("parquet.block.size", str(8 * 1024))
        .parquet(shuffled)
    )

    def matching_groups(path):
        total = hit = 0
        for f in _glob.glob(f"{path}/*.parquet"):
            meta = _pq.ParquetFile(f).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[
                "l_shipdate"
            ]
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                total += 1
                if st.min <= f_hi and st.max >= f_lo:
                    hit += 1
        return total, hit

    c_total, c_hit = matching_groups(clustered)
    s_total, s_hit = matching_groups(shuffled)
    assert c_total >= 8 and s_total >= 8  # enough groups for the claim
    assert s_hit == s_total  # hash layout: every group overlaps the range
    assert c_hit <= max(1, c_total // 4)  # clustered: the vast majority skip

    # the filter actually reaches the scan (reader applies group skipping)
    scan = spark.read.parquet(clustered).filter(
        (F.col("l_shipdate") >= F.lit(f_lo)) & (F.col("l_shipdate") <= F.lit(f_hi))
    )
    import io as _io
    from contextlib import redirect_stdout as _rs

    buf = _io.StringIO()
    with _rs(buf):
        scan.explain("formatted")
    assert "PushedFilters: [" in buf.getvalue()
    assert "GreaterThanOrEqual(l_shipdate" in buf.getvalue()
    # and both layouts agree on the answer
    assert (
        scan.count()
        == spark.read.parquet(shuffled)
        .filter((F.col("l_shipdate") >= F.lit(f_lo)) & (F.col("l_shipdate") <= F.lit(f_hi)))
        .count()
    )


def test_zorder_write_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Morton-curve clustering vs 1-D sort, the defining contrast: the
    1-D layout skips row groups only for filters on its own sort column
    (a second-column filter overlaps EVERY group), while the z-ordered
    layout gives each group a small (x, y) rectangle so selective
    filters on EITHER column skip most groups from footer stats alone.
    Measured on this data: zorder ~24%/32% of groups overlap the x/y
    eighth-range filters; x-sort is 100% on the y filter."""
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql import functions as F

    from catlas_spark.partitioning import write_range_clustered, write_zorder_clustered

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    b = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).first()
    zp, xp = str(tmp_path / "zorder"), str(tmp_path / "xsort")
    write_zorder_clustered(
        li, zp, "l_orderkey", "l_partkey",
        bounds=((b[0], b[1]), (b[2], b[3])), n_ranges=2, row_group_bytes=4 * 1024,
    )
    write_range_clustered(li, xp, "l_orderkey", n_ranges=2, row_group_bytes=4 * 1024)

    def hits(path, col, lo, hi):
        tot = hit = 0
        for f in _glob.glob(f"{path}/*.parquet"):
            meta = _pq.ParquetFile(f).metadata
            idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}[col]
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                tot += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, tot

    x_rng = (b[0], b[0] + (b[1] - b[0]) // 8)
    y_rng = (b[2], b[2] + (b[3] - b[2]) // 8)
    zx, zx_tot = hits(zp, "l_orderkey", *x_rng)
    zy, zy_tot = hits(zp, "l_partkey", *y_rng)
    sx, sx_tot = hits(xp, "l_orderkey", *x_rng)
    sy, sy_tot = hits(xp, "l_partkey", *y_rng)
    assert zx_tot >= 20 and sx_tot >= 20  # enough groups for the claim
    # 1-D layout: the y filter overlaps essentially every group. Not an
    # exact equality (r8 flake): row_group_bytes=4KB makes tiny groups,
    # and a small TAIL group of n random partkeys misses the eighth-range
    # with probability 0.875^n — repartitionByRange's per-RDD sampling
    # seed shifts group sizes between sessions, so one stray skipped
    # group is luck, not layout. The contrast claim (≈100% vs <=50%)
    # survives a 5% allowance.
    assert sy >= sy_tot - max(1, sy_tot // 20), (sy, sy_tot)
    assert sx <= sx_tot // 4  # ...but is best-in-class on its own column
    assert zx <= zx_tot // 2 and zy <= zy_tot // 2  # zorder skips on BOTH
    # layout never changes answers: box-filter counts agree
    box = (
        (F.col("l_orderkey").between(*x_rng)) & (F.col("l_partkey").between(*y_rng))
    )
    assert (
        spark.read.parquet(zp).filter(box).count()
        == spark.read.parquet(xp).filter(box).count()
    )


def test_lazy_plans_registers_no_cache_entries(spark, sf_dir):
    """ADVICE r5: under lazy_plans() materialize_and_release never
    unpersists, so an unconditional .persist() inside a query would
    leave a canonicalized-plan CacheManager entry that a LATER query
    deriving the same subtree silently hits. Every persist on that
    release path must go through caching.maybe_persist, which is a
    no-op in lazy mode — building these plans must register nothing."""
    from catlas_spark.caching import lazy_plans

    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    with lazy_plans():
        for name in ("skyline_pareto", "set_containment_prefix", "lm_quality_score"):
            Q.queries()[name](spark, sf_dir)  # build only; no action
    assert cm.isEmpty(), "lazy_plans left CacheManager entries behind"


def test_keep_alive_prevents_premature_cache_release(spark):
    """r8: a frame DERIVED from a materialize_and_release output must
    not lose the materialized cache when the operator output's local
    name dies — without keep_alive the weakref finalizer unpersists the
    just-counted cache at function return and the caller's action
    silently recomputes the whole pipeline (caught at the 100x triangle
    stress: ten extra jobs re-running the 60M-row pair build)."""
    import gc

    from pyspark.sql import functions as F

    from catlas_spark.caching import keep_alive, materialize_and_release

    cm = spark._jsparkSession.sharedState().cacheManager()

    def make_derived(tie):
        big = spark.range(0, 100_000).select(
            (F.col("id") % 97).alias("k"), F.col("id").alias("v")
        )
        out = materialize_and_release(
            big.groupBy("k").agg(F.sum("v").alias("s"))
        )
        derived = out.select("k", (F.col("s") * 2).alias("s2"))
        return keep_alive(derived, out) if tie else derived

    # untied: the finalizer fires once the operator-local wrapper dies
    d = make_derived(tie=False)
    gc.collect()
    assert cm.isEmpty(), "expected the untied cache to be released on GC"
    d.count()  # recomputes, still correct — just wasteful

    # tied: the cache must survive until the DERIVED frame dies
    d = make_derived(tie=True)
    gc.collect()
    assert not cm.isEmpty(), "keep_alive failed: cache released early"
    d.count()  # served from the surviving cache
    del d
    gc.collect()
    assert cm.isEmpty(), "cache must still release once the derived frame dies"


def test_materialize_and_release_releases_on_error(spark):
    """r8 review: a failed materializing count must not leave the output
    persisted with no finalizer (the stale-canonicalized-plan hazard)
    nor keep the upstream caches pinned — both unpersist on the error
    path, and the error propagates."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from catlas_spark.caching import materialize_and_release, maybe_persist

    jcache = spark._jsparkSession.sharedState().cacheManager()
    assert jcache.isEmpty(), "test needs a clean CacheManager"

    upstream = maybe_persist(spark.range(5).select(F.col("id").alias("x")))
    bad = upstream.select(
        F.raise_error(F.lit("boom")).alias("y")
    )
    with pytest.raises(Exception, match="boom"):
        materialize_and_release(bad, upstream)
    assert jcache.isEmpty(), "error path must unpersist output AND caches"


def test_rle_udtf_tokenization_matches_oracle_on_fringed_text():
    """r8 unification: the UDTF's ASCII strip now matches the ORACLE's
    regex strip (the old oracle used SQL trim — U+0020 only — so a
    leading tab shifted every run_idx vs the UDTF)."""
    import duckdb
    import pandas as pd

    from catlas_spark.operators.udtfs import RunLengthTokens

    zoo = ["\tfoo foo bar", "x y y\n", "a\x0Ba a", "  b  b  "]
    con = duckdb.connect()
    con.register("docs", pd.DataFrame({"doc_id": range(len(zoo)), "text": zoo}))
    ws = "[ \\t\\n\\x0B\\f\\r]"
    norm = (
        f"regexp_replace(lower(regexp_replace(text, '^{ws}+|{ws}+$', '', 'g')), "
        f"'{ws}+', ' ', 'g')"
    )
    want = {}
    for doc_id, toks in con.execute(
        f"SELECT doc_id, string_split({norm}, ' ') FROM docs"
    ).fetchall():
        runs, i, idx = [], 0, 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                runs.append((idx, toks[i], j - i))
            idx += 1
            i = j
        want[doc_id] = runs
    # @udtf wraps the class; the raw implementation is .func
    impl = RunLengthTokens.func
    got = {i: list(impl().eval(t)) for i, t in enumerate(zoo)}
    assert got == want


def test_events_scan_restores_per_query_conf_overrides(spark, sf_dir):
    """r8 harness review: events-only queries restored neither the
    broadcast threshold nor the bloom scan-size threshold, so
    bloom_pruned_join's plan overrides leaked into whatever events query
    the LRU window placed after it (identical results, drifted timings —
    invisible to the oracle gate). _events now shares _t's restore."""
    from catlas_spark import queries as Q
    from catlas_spark.session import AUTOBROADCAST_BYTES

    Q.queries()["bloom_pruned_join"](spark, sf_dir)  # sets the overrides
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    Q._events(spark, sf_dir)  # an events-only query's table access
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == str(
        AUTOBROADCAST_BYTES
    )
    assert (
        spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )
        == "10GB"
    )
