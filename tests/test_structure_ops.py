"""Tests for nuclearity (T4) and anomaly flags (T5) against pure-Python
oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from catlas_spark.operators.structure import (
    _nuclearity_one,
    add_nuclearity,
    anomaly_flags,
    attach_surrogate_graph,
)
from catlas_spark.pipeline import enumerate_slabs
from catlas_spark.sources import fixtures


def test_nuclearity_one_oracle():
    # two Cu dimers + one isolated Pt; chain 0-1, 2-3
    elements = ["Cu", "Cu", "Cu", "Cu", "Pt"]
    edges = [[0, 1], [2, 3]]
    got = _nuclearity_one(elements, edges)
    assert got["Cu"]["nuclearities"] == [2, 2]
    assert got["Pt"]["nuclearities"] == [1]
    # exact classifications under the surrogate replica (r8 tautology
    # hunt: the old 3-value membership passed any infiniteness verdict).
    # Pt sits at index 4 ≡ 0 (mod 4) — the x-periodic boundary — so its
    # isolated component doubles in the 2x2 replica: semi-finite. The
    # Cu chain 0-1 touches boundary node 0 and also doubles.
    assert got["Pt"]["nuclearity"] == "semi-finite"
    assert got["Cu"]["nuclearity"] == "semi-finite"
    # a component touching NO boundary node (x: i ≡ 0, y: i ≡ 2, mod 4)
    # stays finite with the exact count
    off = _nuclearity_one(["X", "Cu", "X", "Cu", "X"], [[1, 3]])
    assert off["Cu"]["nuclearity"] == "2"


def test_nuclearity_empty_edges():
    got = _nuclearity_one(["Au", "Au"], [])
    assert got["Au"]["nuclearities"] == [1, 1]


def test_add_nuclearity_distributed_matches_local(spark):
    bulks = fixtures.make_bulks(spark, n=6)
    slabs = attach_surrogate_graph(enumerate_slabs(bulks, max_miller=1))
    out = add_nuclearity(slabs).select(
        "atom_elements", "bond_edges", "nuclearity_info"
    ).collect()
    assert len(out) > 0
    for r in out[:40]:
        expected = _nuclearity_one(list(r.atom_elements), [list(e) for e in r.bond_edges])
        got = {
            el: {"nuclearity": v.nuclearity, "nuclearities": list(v.nuclearities)}
            for el, v in r.nuclearity_info.items()
        }
        assert got == expected
    # all bulk elements represented
    kinds = {v["nuclearity"] for r in out for v in (
        {el: {"nuclearity": vv.nuclearity} for el, vv in r.nuclearity_info.items()}
    ).values()}
    assert len(kinds) > 1  # finite AND infinite/semi-finite outcomes occur


@pytest.mark.parametrize(
    "initial,final,ads,expect",
    [
        # adsorbate bond 0-1 broken → dissociation; 0-2 present → no desorption
        ([[0, 1], [0, 2], [2, 3]], [[0, 2], [2, 3]], [0, 1], (True, False, False)),
        # adsorbate-surface bond gone → desorption
        ([[0, 2], [2, 3]], [[2, 3]], [0], (False, True, False)),
        # >25% surface bonds changed → reconstruction
        ([[2, 3], [3, 4], [4, 5], [5, 6]], [[2, 3], [3, 4], [4, 6], [2, 5], [0, 2]], [0], (False, False, True)),
    ],
)
def test_anomaly_flags(spark, initial, final, ads, expect):
    df = spark.createDataFrame(
        [(initial, final, ads)],
        "initial_edges array<array<int>>, final_edges array<array<int>>, ads array<int>",
    )
    out = df.select(
        anomaly_flags(F.col("initial_edges"), F.col("final_edges"), F.col("ads")).alias("a")
    ).collect()[0].a
    assert (out.dissociation, out.desorption, out.reconstruction) == expect


def test_anomaly_edge_keys_canonicalize_endpoint_order(spark):
    """A bond recorded [1,2] initially and [2,1] finally is the SAME
    edge — reversed endpoints must not read as a dissociation."""
    from pyspark.sql import functions as F

    from catlas_spark.operators.structure import anomaly_flags

    df = spark.createDataFrame(
        [(1,)], "id int"
    ).select(
        F.expr("array(array(0, 1), array(1, 2))").alias("init"),
        F.expr("array(array(1, 0), array(2, 1))").alias("final"),
        F.expr("array(0, 1)").alias("ads"),
    )
    row = df.select(anomaly_flags(F.col("init"), F.col("final"), F.col("ads")).alias("a")).first()
    assert row.a.dissociation is False
    assert row.a.reconstruction is False
