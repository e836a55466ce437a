"""Structured Streaming surface over the events table.

New capability over the reference (it has no streaming data model —
SURVEY.md §1.2): watermarked tumbling-window aggregates and session
windows, written so the same transformations run on a readStream or a
batch DataFrame (the driver's events table doubles as the smoke source).

Scale notes: watermark bounds state; the window aggregate is a standard
partial-agg + state-store plan. At production scale the source is
Kafka/files and the sink is foreachBatch→parquet for exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from catlas_spark.sources.events_io import normalize_ts, probe_ts_flavor, spark_ts_type


def events_schema(ts_type: T.DataType | None = None) -> T.StructType:
    """Events read schema; the ``ts`` field type is supplied per-file
    because the driver parquet's physical flavor changes between rounds
    (r1 NANOS, r3/r4 MICROS-NTZ — see sources/events_io.py)."""
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", ts_type or T.TimestampNTZType(), True),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )


# default-flavor schema kept for callers that build their own sources
EVENTS_SCHEMA = events_schema()


def read_event_stream(
    spark: SparkSession, dir_glob: str, flavor: str | None = None
) -> DataFrame:
    """File-source stream over events parquet. The footer is probed ONCE
    at stream construction (pyarrow, no data IO) and the schema + ``ts``
    normalization are derived from the file's actual logical type —
    NANOS, MICROS-NTZ, UTC-adjusted, and raw-int64 flavors all end as a
    session-TZ TimestampType column under the pinned-UTC session, so
    watermarks/windows see real event time (mirrors the batch _events).

    The probe is construction-time ONLY: a source directory that starts
    EMPTY cannot be classified, and silently defaulting would read any
    later-arriving NANOS/int64 files against the wrong schema for the
    life of the query (r8 review) — so an empty source requires the
    caller to pass ``flavor`` explicitly (one of the events_io TS_*
    constants, the normal production bootstrap where the writer's
    flavor is known)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # harmless for micros files; lets a NANOS file read as bigint instead of failing
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if flavor is None:
        from ..sources.events_io import _first_parquet_file

        if _first_parquet_file(dir_glob) is None:
            raise ValueError(
                f"read_event_stream: no parquet file under {dir_glob!r} to "
                "probe the ts flavor from — pass flavor= explicitly when "
                "starting a stream on an empty source directory"
            )
        flavor = probe_ts_flavor(dir_glob)
    raw = spark.readStream.schema(events_schema(spark_ts_type(flavor))).parquet(dir_glob)
    return normalize_ts(raw, flavor)


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type. Works on both
    streaming and batch DataFrames (same plan shape)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionized_stream(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user (native session_window — the streaming
    form of the batch lag+cumsum sessionization operator)."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def _smoke_checkpoint_dir(query_name: str) -> str | None:
    """Checkpoint root for the finite SMOKE runs (availableNow, memory
    sink): tmpfs when the host has it. The offset/commit WAL and state
    deltas are per-micro-batch file IO on the driver's checkpoint store
    — measured 0.15-0.2 s per short run on this host's ext4 /tmp vs
    /dev/shm. A finite smoke run's checkpoint is deleted on completion,
    so durability is irrelevant HERE; an unbounded production stream
    must checkpoint to durable shared storage (set explicitly by the
    caller), never to this path. Returns None when no tmpfs exists —
    the writeStream then uses Spark's default temp checkpoint."""
    import uuid

    root = os.environ.get("SPARK_GRAFT_STREAM_CKPT", "/dev/shm")
    if not os.path.isdir(root):
        return None
    return os.path.join(root, f"catlas_smoke_ckpt_{query_name}_{uuid.uuid4().hex[:8]}")


def run_batch_like_stream(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: int | None = None,
    no_data_batches: bool = True,
) -> DataFrame:
    """Drive a streaming query over the available files to completion
    (memory sink) and return the result as a batch DataFrame — the
    local smoke path for streaming operators. Aggregations use the
    default ``complete`` mode; stream-stream joins must pass ``append``
    (matches are emitted as they arrive; complete mode is unsupported).

    ``state_partitions`` overrides ``spark.sql.shuffle.partitions`` for
    THIS query (the stream pins it at start; restored after): the state
    store pays per-partition commit overhead every micro-batch, so a
    small finite source wants few state partitions (32 → 8 measured
    5.0 → 1.8 s on the interval join; 8 → 4 a further 2.3 → 1.8 s,
    flat below 4) while an unbounded production stream sizes it to
    expected state, not to this default.

    ``no_data_batches=False`` disables the trailing no-data micro-batch
    for THIS query (conf pinned at start; restored after). ONLY valid
    for queries whose output does not depend on watermark-triggered
    emission — an INNER stream-stream join emits matches as they
    arrive, so its trailing batch only evicts state that a finite
    availableNow run discards anyway (measured: identical output rows,
    one batch instead of two, ~0.65 s saved). Left-outer joins and
    append-mode aggregations MUST keep the default: their
    watermark-closed results flush in exactly that batch."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    if not no_data_batches:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    ckpt = _smoke_checkpoint_dir(query_name)
    try:
        writer = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
        )
        if ckpt is not None:
            writer = writer.option("checkpointLocation", ckpt)
        q = writer.start()
        q.awaitTermination()
    finally:
        if state_partitions:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        if not no_data_batches:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
            )
        if ckpt is not None:
            import shutil

            shutil.rmtree(ckpt, ignore_errors=True)
    return spark.sql(f"SELECT * FROM {query_name}")


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    time_col: str = "ts",
    delay: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state — the streaming
    form of the batch exact_dedup operator.

    Streaming uses ``dropDuplicatesWithinWatermark`` (r8, closing the
    review finding): plain ``dropDuplicates`` on a business key only
    evicts state when the event-time column is PART OF the dedup subset,
    so the old default keys=["event_id"] kept one state row per id
    forever — the opposite of this docstring's scale claim. The
    within-watermark form guarantees dedup of any duplicate arriving
    within ``delay`` of the first occurrence and evicts the key's state
    once the watermark passes it; a duplicate arriving later than that
    is indistinguishable from a new event under bounded state (any
    engine's exact streaming dedup makes the same trade). Batch frames
    keep the global dropDuplicates — no state to bound."""
    if events.isStreaming:
        return events.withWatermark(time_col, delay).dropDuplicatesWithinWatermark(
            keys or ["event_id"]
        )
    return events.dropDuplicates(keys or ["event_id"])


USER_STATS_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
_USER_STATE_SCHEMA = "n long, total double, mx double"


def _user_stats_update(key, pdfs, state):
    """State-update body of :func:`stateful_user_stats` (module-level so
    the unit test can drive it with a fake state handle).

    -inf is the in-STATE sentinel for "no non-null value seen"; the
    emitted max_value is NULL in that case, matching batch F.max
    semantics (count(*) counts every row; sum/max skip nulls). The
    batch max is guarded with notna: an all-null batch's pandas max()
    is NaN, and ``max(mx, nan)`` only keeps ``mx`` by the accident of
    comparison-argument order.
    """
    import pandas as pd

    n, total, mx = (state.get if state.exists else (0, 0.0, float("-inf")))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_mx = pdf["value"].max()
        if pd.notna(batch_mx):
            mx = max(mx, float(batch_mx))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            # mx == -inf <=> no non-null value ever seen, and F.sum skips
            # exactly the rows F.max skips — so the batch-parity NULL
            # (not pandas' skipna 0.0) applies to the total too (r8)
            "total_value": [round(total, 4) if mx != float("-inf") else None],
            "max_value": [round(mx, 4) if mx != float("-inf") else None],
        }
    )


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running (count, total value, max value) maintained in the
    state store across micro-batches — the pattern for operators the
    built-in aggregations can't express (the reference has no streaming
    counterpart; this is a new engine capability).

    State is one fixed-size row per user; at scale the state store
    partitions by user_id with the shuffle, and a timeout would evict
    idle users (omitted here: the smoke source is finite).
    """
    update = _user_stats_update

    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_USER_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def click_purchase_join(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream interval join: each purchase matched to the same
    user's clicks within the preceding ``horizon`` (state bounded by
    watermarks on BOTH sides — the canonical attribution join)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "2 hours")
        purchases = purchases.withWatermark("purchase_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return clicks.join(purchases, cond, "inner").select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


def write_stream_parquet(stream_df: DataFrame, out_dir: str, query_name: str):
    """foreachBatch exactly-once-style parquet sink: each micro-batch is
    appended under its epoch id (idempotent on retry because the batch id
    names the output)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    return (
        stream_df.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


TYPE_CENSUS_SCHEMA = (
    "user_id long, n_events long, n_types long, top_type string"
)


def user_type_census_tws(events: DataFrame) -> DataFrame:
    """Per-user event-type census via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-stateful API (the successor surface to
    `stateful_user_stats`'s applyInPandasWithState): a typed MapState
    (event_type -> count) lives in the state store per user, updated
    every micro-batch; the emitted row is the census AFTER the batch
    (total events, distinct types, most-frequent type with
    lexicographic tiebreak). Requires the RocksDB state store provider
    (transformWithState is implemented against it); the caller/test
    pins `spark.sql.streaming.stateStore.providerClass`. ALSO requires
    `protobuf` (the TWS state-server wire protocol) — absent from this
    container, so the parity test import-skips, same policy as the
    matplotlib-gated parity PDF sink; the API usage itself is real.

    MapState (vs a single packed ValueState) is the point: per-type
    updates touch only the changed keys, so a user with a million
    events and five types carries five counters, and state growth is
    O(distinct types) — the right shape for an unbounded stream.
    """
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TypeCensusProcessor(),
        outputStructType=TYPE_CENSUS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class TypeCensusProcessor(StatefulProcessor):
    """The census processor itself, module-level so its batch-update
    logic is unit-testable against a fake MapState even though the full
    streaming drive needs protobuf (see `user_type_census_tws`)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("type_counts", "key string", "cnt long")

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        for pdf in rows:
            # value_counts() drops nulls — count null-typed events under
            # an explicit sentinel key so they are neither silently
            # excluded from the census nor able to crash the min() below
            # on an all-null first batch
            for t, c in pdf["event_type"].fillna("__null__").value_counts().items():
                prev = (
                    self._counts.getValue((t,))[0]
                    if self._counts.containsKey((t,))
                    else 0
                )
                self._counts.updateValue((t,), (prev + int(c),))
        counts = {k[0]: v[0] for k, v in self._counts.iterator()}
        if not counts:  # zero input rows for this key in this batch
            return
        total = sum(counts.values())
        top = min((-(c), t) for t, c in counts.items())[1]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [total],
                "n_types": [len(counts)],
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def click_purchase_left_outer(events: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream LEFT OUTER interval join: every purchase appears —
    joined to same-user clicks in the preceding ``horizon``, or with
    NULL click columns once the watermark proves no matching click can
    still arrive. The outer semantics are state-driven: an unmatched
    purchase's NULL row is emitted only in a batch AFTER the watermark
    passes its whole match window (purchase_ts), because until then a
    matching click could legally arrive; purchases whose window never
    expires before the stream ends are never emitted as NULL (tested —
    the availableNow smoke path needs a trailing batch to flush them).
    Batch mode on the same frame gives the plain left join, which
    equals the streamed result exactly when every unmatched purchase's
    window expired — the test's equality oracle."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_ts", "2 hours")
        purchases = purchases.withWatermark("purchase_ts", "2 hours")
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    return purchases.join(clicks, cond, "left_outer").select(
        "purchase_id", F.col("p_user").alias("user_id"), "click_id"
    )


def hopping_counts(
    events: DataFrame, window: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Watermarked HOPPING (sliding) window counts per event type — each
    event lands in window/slide overlapping windows (2 here), the shape
    behind moving-average dashboards. Works on both streaming and batch
    DataFrames (same plan; Spark expands the window assignment
    map-side, so state grows with windows retained, not with overlap)."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
