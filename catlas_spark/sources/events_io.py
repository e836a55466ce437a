"""Flavor-robust events source: probe the parquet footer once and derive
the read schema + ``ts`` normalization from the file's actual logical
type, for BOTH the batch scan and the Structured Streaming file source.

The driver's ``events.parquet`` has changed physical ``ts`` flavor
between rounds (r1: TIMESTAMP(NANOS); r3/r4: TIMESTAMP(MICROS,
isAdjustedToUTC=false)). Per-row magnitude heuristics are wrong for
pre-1973 nanos epochs and can split a single column across units, so the
unit is decided ONCE PER FILE here, from ``pyarrow.parquet.read_schema``
(footer-only read — no data IO), with column statistics as the fallback
for raw int64 columns that carry no logical type.

At 100 TB the probe still reads one footer of one part-file: flavor is a
writer-level property, uniform across a dataset's files.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# flavor constants: how Spark will see the column + which unit an
# integer-read column is in
TS_NTZ_MICROS = "ntz_micros"  # TIMESTAMP(MICROS/MILLIS, NTZ) → timestamp_ntz
TS_TZ_MICROS = "tz_micros"  # TIMESTAMP(MICROS/MILLIS, UTC-adjusted) → timestamp
TS_NANOS = "nanos"  # TIMESTAMP(NANOS) → bigint under nanosAsLong
TS_INT64_MICROS = "int64_micros"  # raw int64, stats say micros epoch
TS_INT64_NANOS = "int64_nanos"  # raw int64, stats say nanos epoch


def _first_parquet_file(path_or_glob: str) -> str | None:
    """Resolve a file / directory / glob to one concrete part-file."""
    for cand in sorted(_glob.glob(path_or_glob)) or [path_or_glob]:
        if os.path.isdir(cand):
            inner = sorted(
                _glob.glob(os.path.join(cand, "**", "*.parquet"), recursive=True)
            )
            if inner:
                return inner[0]
        elif os.path.isfile(cand):
            return cand
    return None


def _int64_unit_from_stats(f: str, col: str) -> str:
    """Raw int64 epoch column: decide the unit once per file from the
    footer max statistic (1e17 µs ≈ year 5138, 1e17 ns ≈ 1973 — modern
    data in nanos always exceeds it). Falls back to reading one page."""
    meta = pq.ParquetFile(f).metadata
    mx = None
    for rg in range(meta.num_row_groups):
        row_group = meta.row_group(rg)
        for ci in range(row_group.num_columns):
            c = row_group.column(ci)
            if c.path_in_schema == col and c.statistics and c.statistics.has_min_max:
                v = c.statistics.max
                mx = v if mx is None else max(mx, v)
    if mx is None:  # no stats: read row groups until one has a value
        # (r8 review: sampling ONLY group 0 classified a nanos column as
        # micros when group 0 happened to be all null — every timestamp
        # then read ~1000x too large with no error)
        pf = pq.ParquetFile(f)
        for rg in range(meta.num_row_groups):
            tbl = pf.read_row_group(rg, columns=[col])
            vals = [v for v in tbl.column(0).to_pylist() if v is not None]
            if vals:
                mx = max(vals)
                break
        else:
            mx = 0  # every group all-null: unit is moot, micros
    return TS_INT64_NANOS if mx > 10**17 else TS_INT64_MICROS


def probe_ts_flavor(path_or_glob: str, col: str = "ts") -> str:
    """Footer-probe the physical/logical type of ``col`` and classify it.
    Defaults to NTZ-micros (the current driver flavor) if no file is
    readable yet (e.g. a stream source directory that starts empty)."""
    f = _first_parquet_file(path_or_glob)
    if f is None:
        return TS_NTZ_MICROS
    t = pq.read_schema(f).field(col).type
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            return TS_NANOS
        return TS_TZ_MICROS if t.tz else TS_NTZ_MICROS
    if pa.types.is_integer(t):
        return _int64_unit_from_stats(f, col)
    return TS_TZ_MICROS  # plain TIMESTAMP read natively by Spark


def spark_ts_type(flavor: str) -> T.DataType:
    """The type Spark's parquet reader yields for this flavor (with
    ``spark.sql.legacy.parquet.nanosAsLong`` set for the NANOS case)."""
    if flavor in (TS_NANOS, TS_INT64_MICROS, TS_INT64_NANOS):
        return T.LongType()
    if flavor == TS_NTZ_MICROS:
        return T.TimestampNTZType()
    return T.TimestampType()


def normalize_ts(df: DataFrame, flavor: str, col: str = "ts") -> DataFrame:
    """Rewrite ``col`` to a session-TZ TimestampType column (callers pin
    the session to UTC, so NTZ wall-clock == UTC instant)."""
    c = F.col(col)
    if flavor in (TS_NANOS, TS_INT64_NANOS):
        # INTEGER division: `/` promotes the long to double, whose ULP at
        # modern ns epochs (~1.7e18) is 256 ns — the float quotient then
        # truncates to the wrong microsecond for ~12% of values.
        # FLOOR, not truncation (r8 review): `div` truncates toward
        # zero, so a pre-epoch ns value with a nonzero remainder landed
        # one microsecond LATE (-1500 div 1000 = -1; the instant is
        # -2 µs + 500 ns). pmod's non-negative remainder makes the
        # subtraction an exact multiple, so the div is exact floor for
        # the full long range (no double round-trip).
        return df.withColumn(
            col,
            F.timestamp_micros(
                F.expr(f"(`{col}` - pmod(`{col}`, 1000)) div 1000")
            ),
        )
    if flavor == TS_INT64_MICROS:
        return df.withColumn(col, F.timestamp_micros(c))
    if flavor == TS_NTZ_MICROS:
        return df.withColumn(col, c.cast("timestamp"))
    return df
