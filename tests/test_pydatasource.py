"""Spark 4 Python Data Source ingest (executor-side NPZ / pickle IO):
schema inference, per-file partitioning, comparison-filter pushdown."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from catlas_spark.sources.pydatasource import (
    NpzDataSource,
    PickleDataFrameSource,
    _NpzReader,
    register_python_sources,
)


@pytest.fixture()
def npz_dir(tmp_path):
    rng = np.random.default_rng(7)
    for i in range(3):
        np.savez(
            tmp_path / f"part{i}.npz",
            sid=np.arange(i * 10, i * 10 + 10),
            energy=rng.normal(size=10),
            emb=rng.normal(size=(10, 4)),
        )
    return str(tmp_path)


def test_npz_source_reads_all_files_one_task_each(spark, npz_dir):
    register_python_sources(spark)
    df = spark.read.format("catlas_npz").load(npz_dir)
    assert df.rdd.getNumPartitions() == 3  # one input partition per file
    rows = df.collect()
    assert len(rows) == 30
    assert {f.name for f in df.schema.fields} == {"sid", "energy", "emb"}
    assert sorted(r.sid for r in rows) == list(range(30))
    assert all(len(r.emb) == 4 for r in rows)
    # values survive the executor-side decode exactly
    z = np.load(f"{npz_dir}/part1.npz")
    got = {r.sid: r.energy for r in rows}
    assert all(abs(got[int(s)] - float(e)) < 1e-12 for s, e in zip(z["sid"], z["energy"]))


def test_npz_source_filter_pushdown_prunes_in_reader(spark, npz_dir):
    register_python_sources(spark)
    df = spark.read.format("catlas_npz").load(npz_dir).filter("sid >= 25")
    assert sorted(r.sid for r in df.collect()) == list(range(25, 30))


def test_npz_reader_filter_mask_directly():
    from pyspark.sql.datasource import GreaterThanOrEqual
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("sid long, energy double")
    r = _NpzReader([], schema)
    leftover = list(r.pushFilters([GreaterThanOrEqual(("sid",), 5)]))
    assert leftover == []  # supported -> consumed by the reader
    assert r._keep({"sid": 7, "energy": 0.0})
    assert not r._keep({"sid": 3, "energy": 0.0})


def test_pickledf_source_matches_legacy_driver_path(spark, tmp_path):
    pdf = pd.DataFrame(
        {"sid": ["a", "b", "c", "d"], "pred": [1.0, 2.0, 3.0, 4.0], "n": [1, 2, 3, 4]}
    )
    pdf.iloc[:2].to_pickle(tmp_path / "m0.pkl")
    pdf.iloc[2:].to_pickle(tmp_path / "m1.pkl")

    register_python_sources(spark)
    df = spark.read.format("catlas_pickledf").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 2
    got = sorted((r.sid, r.pred, r.n) for r in df.collect())
    assert got == [("a", 1.0, 1), ("b", 2.0, 2), ("c", 3.0, 3), ("d", 4.0, 4)]


def test_nested_field_filters_are_not_claimed():
    from pyspark.sql.datasource import EqualTo
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL("meta struct<x: long>, sid long")
    r = _NpzReader([], schema)
    nested = EqualTo(("meta", "x"), 1)
    flat = EqualTo(("sid",), 5)
    leftover = list(r.pushFilters([nested, flat]))
    # the nested filter must be yielded back (Spark re-applies it above
    # the scan); claiming it would compare the whole struct and drop rows
    assert leftover == [nested]
    assert r.filters == [flat]


def test_read_json_robust_bad_record_policies(spark, tmp_path):
    """The three declared bad-record policies: PERMISSIVE quarantines
    malformed lines into _corrupt_record with data fields null,
    DROPMALFORMED silently discards them, FAILFAST aborts the read."""
    import pytest as _pytest

    from catlas_spark.sources.star import read_json_robust

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok one"}\n'
        "{broken json here}\n"
        '{"doc_id": 3, "text": "ok three"}\n'
    )
    schema = "doc_id BIGINT, text STRING"

    perm = read_json_robust(spark, str(p), schema).collect()
    assert len(perm) == 3
    bad = [r for r in perm if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["doc_id"] is None
    assert bad[0]["_corrupt_record"] == "{broken json here}"
    good_ids = sorted(r["doc_id"] for r in perm if r["_corrupt_record"] is None)
    assert good_ids == [1, 3]

    dropped = read_json_robust(spark, str(p), schema, mode="DROPMALFORMED").collect()
    assert sorted(r["doc_id"] for r in dropped) == [1, 3]

    with _pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_json_robust(spark, str(p), schema, mode="FAILFAST").collect()


def test_np_field_maps_bool_to_boolean():
    """A bool npz array used to infer 'string', which fails at arrow
    conversion when the reader yields Python bools."""
    import numpy as np

    from catlas_spark.sources.pydatasource import _np_field

    assert _np_field("flag", np.array([True, False])) == "flag boolean"
    assert _np_field("x", np.array([1.5])) == "x double"
    assert _np_field("n", np.array([1])) == "n long"


def test_pushed_filters_match_spark_nan_semantics(spark, tmp_path):
    """Pushed comparison filters are CLAIMED (Spark never re-applies
    them), so they must use Spark's ordering — NaN is GREATER than every
    double and equal to itself — not Python's always-False NaN
    comparisons (r8 review: `energy > 0` silently dropped NaN rows
    relative to the same filter above an unpushed scan)."""
    import math

    import pandas as pd

    pdf = pd.DataFrame(
        {"sid": [0, 1, 2, 3], "energy": [1.5, -2.0, float("nan"), 0.0]}
    )
    p = str(tmp_path / "nan.pkl")
    pdf.to_pickle(p)
    register_python_sources(spark)
    pushed = (
        spark.read.format("catlas_pickledf").load(p).filter("energy > 0").collect()
    )
    # reference semantics: the same rows/filter with no pushdown. NOT
    # createDataFrame(pdf) — pandas conversion maps NaN to NULL, which
    # Spark's filter drops; the pickle reader hands a true NaN through
    want = sorted(
        r.sid
        for r in spark.sql(
            "SELECT * FROM VALUES (0, 1.5D), (1, -2.0D), "
            "(2, cast('nan' as double)), (3, 0.0D) AS t(sid, energy)"
        )
        .filter("energy > 0")
        .collect()
    )
    assert sorted(r.sid for r in pushed) == want
    assert 2 in {r.sid for r in pushed}  # the NaN row survives, like Spark
    # equality: NaN = NaN is TRUE in Spark
    eq = (
        spark.read.format("catlas_pickledf")
        .load(p)
        .filter("energy = cast('nan' as double)")
        .collect()
    )
    assert {r.sid for r in eq} == {2}


def test_empty_source_dir_raises_descriptive_error(spark, tmp_path):
    """Schema inference on an empty directory used to die with a bare
    IndexError naming neither the path nor the problem (r8 review)."""
    import pytest

    empty = tmp_path / "empty"
    empty.mkdir()
    register_python_sources(spark)
    with pytest.raises(Exception, match="no .*files under directory"):
        spark.read.format("catlas_npz").load(str(empty)).schema
