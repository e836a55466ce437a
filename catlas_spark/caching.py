"""Cache-lifetime discipline for operators that persist a reused subtree.

The pattern (established for `dedup_cluster_keep_best`, then applied
module-wide): materialize the operator's SMALL output with
``localCheckpoint`` so the big persisted intermediate can be released
immediately, instead of pinning executor memory until the caller's
collect — across a 127-query session, unreleased MEMORY_ONLY caches
accumulate.

The cost of that discipline is plan opacity: a checkpointed DataFrame
explains as one ``Scan ExistingRDD``. Tooling that needs the REAL plan
(the plan-regression sweep, the PLANS.md generator) wraps its calls in
:func:`lazy_plans`, which turns :func:`materialize_and_release` into a
no-op — the operators then return their full lazy trees (with the
caches left to the ContextCleaner, fine for explain-only use).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_MATERIALIZE = True


@contextmanager
def lazy_plans():
    """Within this context, operators skip checkpoint/release and return
    their full lazy plans (for explain/inspection tooling only)."""
    global _MATERIALIZE
    prev = _MATERIALIZE
    _MATERIALIZE = False
    try:
        yield
    finally:
        _MATERIALIZE = prev


def materialize_and_release(out: DataFrame, *caches: DataFrame) -> DataFrame:
    """Materialize ``out`` (localCheckpoint) and unpersist ``caches``.

    Under :func:`lazy_plans` this is a no-op returning ``out`` unchanged.
    """
    if not _MATERIALIZE:
        return out
    out = out.localCheckpoint()
    for c in caches:
        c.unpersist(blocking=False)
    return out
