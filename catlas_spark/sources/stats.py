"""Planning-time parquet footer statistics.

The engine's stats-driven strategy picks (`set_containment_join_auto`,
quantile regime dispatch, IVF probe pruning) need cheap bounds on a
column. When the column comes straight off a parquet scan, the footer
min/max answer at PLANNING time — no Spark job, no data IO — the same
catalog-statistics shortcut a warehouse optimizer takes. Unlike the
single-footer flavor probe in ``events_io`` (a writer-level property),
VALUE bounds are data properties, so every part-file's footer is read
and the bounds are unioned; ~KBs of footer per file, still trivial next
to one runtime aggregation over the data.
"""

from __future__ import annotations

import glob as _glob
import os

import pyarrow.parquet as pq


def _parquet_files(path_or_glob: str) -> list[str]:
    out: list[str] = []
    for cand in sorted(_glob.glob(path_or_glob)) or [path_or_glob]:
        if os.path.isdir(cand):
            out.extend(
                sorted(_glob.glob(os.path.join(cand, "**", "*.parquet"), recursive=True))
            )
        elif os.path.isfile(cand):
            out.append(cand)
    return out


def parquet_column_bounds(path_or_glob: str, col: str):
    """(min, max) of ``col`` across every row group of every part-file,
    from footer statistics only. Returns None when the dataset has no
    files yet or ANY row group lacks min/max stats for the column —
    partial stats cannot bound the data, and callers treat None as
    "probe at runtime instead". NULL-only row groups (no min/max) also
    yield None rather than a fabricated bound.

    NUMERIC (and date/timestamp) columns only: parquet writers may
    TRUNCATE min/max for long BYTE_ARRAY values (string/binary), so
    those footer bounds are conservative pruning bounds, not exact data
    values — a caller using them as exact values would be silently
    wrong. String/binary columns return None.
    """
    files = _parquet_files(path_or_glob)
    if not files:
        return None
    # refuse string/binary up front (stats may be truncated, see above)
    schema = pq.ParquetFile(files[0]).schema_arrow
    idx = schema.get_field_index(col)
    if idx >= 0:
        t = schema.field(idx).type
        import pyarrow as pa

        # dictionary-encoded columns hide their value type one level
        # down (pandas categorical writers) — unwrap before the gate, or
        # a dictionary<values=string> column slips past it (r8 review)
        if pa.types.is_dictionary(t):
            t = t.value_type
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_fixed_size_binary(t)
        ):
            return None
    mn = mx = None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            found = False
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema != col:
                    continue
                found = True
                if c.statistics is None or not c.statistics.has_min_max:
                    # all-NULL group contributes no values: skip it. NOTE
                    # ColumnChunkMetaData.num_values COUNTS nulls, so the
                    # test must compare the statistics' null_count against
                    # it (num_values == 0 never matches in practice).
                    st = c.statistics
                    if st is not None and st.null_count == c.num_values:
                        break
                    return None
                s = c.statistics
                mn = s.min if mn is None else min(mn, s.min)
                mx = s.max if mx is None else max(mx, s.max)
                break
            if not found:
                return None
    if mn is None:
        return None
    return (mn, mx)


def parquet_row_count(path_or_glob: str) -> int | None:
    """Exact row count across every part-file, from file metadata only
    (``FileMetaData.num_rows`` is authoritative per the parquet spec —
    unlike min/max it cannot be truncated or absent). The catalog
    rowcount shortcut: replaces a COUNT(*) Spark job for an UNFILTERED
    scan at planning time. Returns None when no files exist yet."""
    files = _parquet_files(path_or_glob)
    if not files:
        return None
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
