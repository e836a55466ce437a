"""Contracts of the query registry and the driver-window ordering —
the machinery the correctness gate itself depends on (ADVICE r2: no
hand-maintained allowlists, no permanent exemption from re-checking).
No SparkSession needed."""

from __future__ import annotations

from catlas_spark.queries import _REGISTRY, _correctness_history, _ordered, oracle_sql, queries

WINDOW = 50  # the driver checks the first 50 queries() entries


def test_every_query_is_oracle_paired():
    q, o = queries(), oracle_sql()
    assert set(q) == set(o), "every registry entry must carry oracle SQL"
    assert len(q) == len(_REGISTRY)


def test_ordering_is_a_permutation_of_the_registry():
    assert sorted(_ordered()) == sorted(_REGISTRY)


def test_failures_and_new_queries_lead_the_driver_window(monkeypatch):
    """Synthetic-history form (r8 tautology hunt): against the repo's
    real artifacts both `failed` and `never` are EMPTY (all 172 green,
    all checked), so the old assertions reduced to set() <= window and
    an inverted rank key would have shipped silently. Inject a history
    with one failure and one never-checked query and assert their
    absolute positions."""
    import catlas_spark.queries as Q

    names_now = list(_REGISTRY)
    fail_name, green_names = names_now[5], names_now
    synthetic = {
        n: (3 if n != fail_name else 7, n != fail_name)
        for n in green_names
        if n != names_now[11]  # names_now[11] becomes never-checked
    }
    monkeypatch.setattr(Q, "_correctness_history", lambda: synthetic)
    Q._ORDERED_CACHE = None  # bust the memo (it keys on artifact mtimes)
    try:
        ordered = list(Q._ordered())
    finally:
        Q._ORDERED_CACHE = None
    # the failure leads everything, despite its RECENT round number
    assert ordered[0] == fail_name
    # the never-checked query precedes every green one
    assert ordered[1] == names_now[11]
    # greens follow in registry order (equal round, index tiebreak)
    greens = [n for n in names_now if n not in (fail_name, names_now[11])]
    assert ordered[2:] == greens


def test_window_contract_on_real_artifacts():
    # the original (now mostly-vacuous when everything is green) check
    # kept as a cheap invariant against the REAL artifacts
    names = list(queries())
    hist = _correctness_history()
    window = set(names[:WINDOW])
    failed = [n for n in names if n in hist and not hist[n][1]]
    never = [n for n in names if n not in hist]
    assert set(failed) <= window
    assert set(never[: WINDOW - len(failed)]) <= window


def test_verified_queries_rotate_least_recent_first():
    names = list(queries())
    hist = _correctness_history()
    rounds = [hist[n][0] for n in names if n in hist and hist[n][1]]
    # green queries appear in non-decreasing last-verified-round order,
    # so the oldest verification is always re-checked soonest
    assert rounds == sorted(rounds)


def test_register_rejects_duplicate_names():
    """r8 review: a copy-pasted @register name silently replaced the old
    query+oracle pair — both vanish together, so the oracle gate still
    passed. Duplicates now raise at import/definition time."""
    import pytest

    from catlas_spark.queries import register

    existing = next(iter(_REGISTRY))
    with pytest.raises(ValueError, match="duplicate"):
        @register(existing, "SELECT 1")
        def _dup(spark, sf_dir):  # pragma: no cover
            raise AssertionError


def test_schema_mismatch_counts_as_failed_in_history(tmp_path, monkeypatch):
    """r8 review: a schema-only driver failure (rows+hash green,
    schema_match false — e.g. a renamed output column) must rank as
    FAILED, not green, or the LRU ordering rotates the failing query to
    the back of the window instead of the front."""
    import json
    import os

    import catlas_spark.queries as Q

    art = {
        "pricing_summary": {
            "rows_match": True,
            "hash_match": True,
            "schema_match": False,
            "err": None,
        }
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(art))
    real_dirname = os.path.dirname

    monkeypatch.setattr(
        Q.os.path, "dirname", lambda p: str(tmp_path) if p.endswith("catlas_spark") else real_dirname(p)
    )
    hist = Q._correctness_history()
    assert hist["pricing_summary"] == (99, False)


# --- plan cache (prepared-statement semantics) guard ---------------------


def _fresh_plan_cache(monkeypatch):
    import catlas_spark.queries as Q

    monkeypatch.setattr(Q, "_PLAN_CACHE", {})
    monkeypatch.setattr(Q, "_PLAN_LAZY", {})
    return Q


def test_plan_cache_lazy_query_cached_and_still_executes(spark, sf_dir, monkeypatch):
    """A pure-plan-construction query is cached (second call returns the
    SAME plan object) — and executing the cached plan still launches real
    Spark jobs every time (metadata cached, compute never)."""
    Q = _fresh_plan_cache(monkeypatch)
    fn = Q.queries()["pricing_summary"]
    fn(spark, sf_dir)  # may absorb one-time table metadata jobs
    d1 = fn(spark, sf_dir)
    assert Q._PLAN_LAZY["pricing_summary"] is True
    d2 = fn(spark, sf_dir)
    assert d2 is d1
    j0 = Q._n_jobs(spark)
    d2.write.format("noop").mode("overwrite").save()
    assert Q._n_jobs(spark) > j0, "cached plan must still run the full compute"
    j1 = Q._n_jobs(spark)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert Q._n_jobs(spark) > j1


def test_plan_cache_excludes_eager_compute(spark, sf_dir, monkeypatch):
    """A query whose builder fn launches jobs (persist+count
    materialization) must never be plan-cached — otherwise warm bench
    passes would skip its real work."""
    Q = _fresh_plan_cache(monkeypatch)
    fn = Q.queries()["dedup_minhash_lsh"]
    fn(spark, sf_dir)
    fn(spark, sf_dir)  # verdict is permanent on the SECOND eager sighting
    assert Q._PLAN_LAZY["dedup_minhash_lsh"] is False
    assert not any(k[2] == "dedup_minhash_lsh" for k in Q._PLAN_CACHE)


def test_plan_cache_excludes_conf_setting_query(spark, sf_dir, monkeypatch):
    """A query that overrides plan-shaping confs (bloom_pruned_join) must
    not be cached: its physical plan depends on confs that _session_tune
    restores between queries, so a cached plan would execute under the
    wrong settings."""
    Q = _fresh_plan_cache(monkeypatch)
    fn = Q.queries()["bloom_pruned_join"]
    fn(spark, sf_dir)
    fn(spark, sf_dir)
    assert Q._PLAN_LAZY["bloom_pruned_join"] is False
    assert not any(k[2] == "bloom_pruned_join" for k in Q._PLAN_CACHE)


def test_plan_cache_env_kill_switch(spark, sf_dir, monkeypatch):
    Q = _fresh_plan_cache(monkeypatch)
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", "0")
    fn = Q.queries()["pricing_summary"]
    d1 = fn(spark, sf_dir)
    d2 = fn(spark, sf_dir)
    assert d2 is not d1
    assert Q._PLAN_CACHE == {}


def test_plan_cache_excludes_lazy_persist(spark, sf_dir, monkeypatch):
    """A builder that registers a persist WITHOUT materializing launches no
    jobs, but its CacheManager entry is stripped by clearCache between
    bench passes while the plan object lives on — so it must be excluded
    from the plan cache (third guard)."""
    Q = _fresh_plan_cache(monkeypatch)

    def lazy_persister(spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/region.parquet").persist()
        # leave it registered: the caller would consume it twice
        return df.select("r_regionkey")

    wrapped = Q._wrap_plan_cached("__lazy_persister__", lazy_persister)
    out = wrapped(spark, sf_dir)
    out2 = wrapped(spark, sf_dir)
    try:
        assert Q._PLAN_LAZY["__lazy_persister__"] is False
        assert not any(k[2] == "__lazy_persister__" for k in Q._PLAN_CACHE)
    finally:
        spark.catalog.clearCache()


def test_tiny_exec_profile_results_match_default(spark, sf_dir, monkeypatch):
    """The tiny-input execution profile (AQE off, 8 shuffle partitions on
    the plan-cache hit path) must be a pure physical-regime change: for
    shuffle-heavy lazy queries the collected result under the tiny
    profile equals the first-call (default-profile) result."""
    Q = _fresh_plan_cache(monkeypatch)
    monkeypatch.setattr(Q, "_PLAN_TINY", {})
    # seeded-sampling queries included (r11 verdict item: if any sampler
    # ever depended on partition layout — Spark's rand(seed) does — the
    # bench's hit path would silently run a different result than the one
    # the oracle blessed; the repo's hash-based sampling convention makes
    # this hold, and this test keeps it held); window_lag_lead covers the
    # window-function family under the 8-partition profile.
    for name in (
        "timeseries_gapfill",
        "grouped_topk",
        "union_distinct_keys",
        "stratified_sample",
        "train_test_split",
        "weighted_sample",
        "window_lag_lead",
    ):
        fn = Q.queries()[name]
        baseline = sorted(map(tuple, fn(spark, sf_dir).collect()))
        fn(spark, sf_dir)  # second sighting -> cached + tiny verdict
        assert Q._PLAN_LAZY[name] is True
        key = next(k for k in Q._PLAN_CACHE if k[2] == name)
        # force the tiny verdict so the test exercises the profile even
        # if the size estimate ever crosses the threshold
        Q._PLAN_TINY[key] = True
        df = fn(spark, sf_dir)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        tiny = sorted(map(tuple, df.collect()))
        assert tiny == baseline, f"{name}: tiny profile changed the result"
    # the override is scoped: the next query's tune restores AQE
    Q._session_tune(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_plan_cache_bypassed_under_lazy_plans(spark, sf_dir, monkeypatch):
    """Under the lazy_plans explain-only context, materializers are
    no-ops, so an eager builder reads as lazy — the cache must be
    bypassed entirely there (neither read nor write), or a later normal
    caller would receive the lazy-mode plan."""
    from catlas_spark.caching import lazy_plans

    Q = _fresh_plan_cache(monkeypatch)
    fn = Q.queries()["pricing_summary"]
    with lazy_plans():
        fn(spark, sf_dir)
        fn(spark, sf_dir)
    assert Q._PLAN_CACHE == {}
    assert "pricing_summary" not in Q._PLAN_LAZY
