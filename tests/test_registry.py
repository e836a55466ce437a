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


def test_failures_and_new_queries_lead_the_driver_window():
    names = list(queries())
    hist = _correctness_history()
    window = set(names[:WINDOW])
    failed = [n for n in names if n in hist and not hist[n][1]]
    never = [n for n in names if n not in hist]
    # every failing query re-enters the window immediately
    assert set(failed) <= window
    # never-checked queries precede all previously-verified ones
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
