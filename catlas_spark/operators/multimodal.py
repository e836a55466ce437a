"""Multimodal (image/audio/video) column plumbing.

Design (SURVEY.md §7.1 / reference §1.2 opaque-object strategy,
`catlas/enumerate_slabs_adslabs.py:62-73`): media payloads are opaque
``binary`` columns accompanied by typed scalar metadata columns; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` with an
executor-singleton decoder (the reference's per-worker model cache
pattern, `catlas/adslab_predictions.py:22,260-272`).

The real decoders (PIL/librosa/av) are NOT in this container, so
``decode_features`` ships a deterministic fake implementation behind the
same Spark plumbing — schema, batch shape, partitioning are real and
tested; swap `_decode_batch` for the real library on a cluster image.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, byte_len long, head_mean double, modality string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encode a text column to a binary payload column + typed metadata
    (stand-in for reading real media bytes via
    spark.read.format('binaryFile'))."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "byte_len", F.length(F.col("payload")).cast("long")
    )


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: mean byte value of the first 64 payload
    bytes. A real implementation would decode image frames / audio samples
    here (library not available in this container — see module docstring).
    """
    import numpy as np

    # NULL payloads (a NULL text column upstream of attach_binary_payload)
    # are treated as empty bytes — the row stays in the output with the
    # empty-payload features instead of len(None) crashing the stage
    payloads = pdf["payload"].map(lambda b: b if b is not None else b"")
    head_mean = payloads.apply(
        lambda b: float(np.frombuffer(b[:64], dtype=np.uint8).mean()) if len(b) else 0.0
    )
    # round half-up (not pandas banker's rounding) to match SQL ROUND()
    head_mean = np.floor(head_mean * 10_000 + 0.5) / 10_000.0
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": payloads.apply(len).astype("int64"),
            "head_mean": head_mean,
            "modality": "text",
        }
    )


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over binary payloads.

    mapInPandas so one Python worker handles a whole Arrow batch of
    payloads (never per-row serde); the batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch on the cluster.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return df.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx long, frame_mean double"


def extract_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """TVF-shaped decode: one payload row → n sampled 'frames' (the
    video/audio frame-sampling plumbing; deterministic fake frames =
    mean byte of equal-width payload slices). Real decoders slot into
    the same mapInPandas without changing the plan shape."""
    import pandas as pd

    import numpy as np

    def run(batches):
        for pdf in batches:
            out_rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payload == empty payload: zero frames, no crash
                n = len(payload) if payload is not None else 0
                if n == 0:
                    continue
                step = max(n // n_frames, 1)
                buf = np.frombuffer(payload, dtype=np.uint8)
                # i < min(n_frames, n) keeps i*step <= n - step, so every
                # slice is non-empty by construction — no fallback needed
                for i in range(min(n_frames, n)):
                    chunk = buf[i * step : (i + 1) * step]
                    mean = float(chunk.mean())
                    mean = int(mean * 10_000 + 0.5) / 10_000.0
                    out_rows.append((int(doc_id), i, mean))
            yield pd.DataFrame(out_rows, columns=["doc_id", "frame_idx", "frame_mean"])

    return df.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_h int, src_w int, out_h int, out_w int, "
    "resized binary, checksum long"
)


def resize_nearest(
    df: DataFrame, out_h: int = 8, out_w: int = 8, src_h: int = 16
) -> DataFrame:
    """Image-resize plumbing with REAL resampling math: the payload's
    first ``src_h * (len // src_h)`` bytes are treated as a src_h x w
    single-channel image and nearest-neighbor downsampled to
    (out_h, out_w) — the index arithmetic (row r maps to source row
    ``(r * src_h) // out_h``) is exactly what a real image pipeline
    does; only the pixel SOURCE is a stand-in for decoded media (see
    module docstring). Emits the resized payload plus a checksum so an
    engine-independent oracle can verify the resample positions without
    comparing binaries.

    Arrow-batched mapInPandas; numpy strided indexing per batch — no
    per-row Python in the driver, no UDF serde per element.

    Contract: a payload shorter than ``src_h`` bytes (or NULL) has no
    complete source row to resample and emits NO output row — the
    frame-sampling convention (fewer bytes, fewer outputs), not the
    decode_features one (always one row per doc). Callers needing
    one-row-per-doc should left-join this output back on doc_id.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = (len(payload) if payload is not None else 0) // src_h
                if w == 0:
                    continue
                buf = np.frombuffer(payload[: src_h * w], dtype=np.uint8).reshape(
                    src_h, w
                )
                rr = (np.arange(out_h) * src_h) // out_h
                cc = (np.arange(out_w) * w) // out_w
                small = buf[np.ix_(rr, cc)]
                rows.append(
                    (int(doc_id), src_h, int(w), out_h, out_w, small.tobytes(), int(small.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "src_h", "src_w", "out_h", "out_w", "resized", "checksum",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def audio_window_energy(
    df: DataFrame, n_bytes: int = 64, win: int = 16
) -> DataFrame:
    """Audio leg of the multimodal family: treat the binary payload as a
    PCM-u8 waveform (sample = byte - 128) and emit per-window RMS energy
    — the loudness/silence feature a speech-data pipeline computes before
    segmenting. The decode is the deterministic stand-in this container
    requires (a real implementation would pull samples out of a codec
    here); the Spark-side plumbing is the real thing: Arrow-batched
    mapInPandas over the binary column, one output row per (doc, window),
    only FULL windows emitted. RMS goes through floor(x*1e4+0.5) —
    sum-of-squares and /win are exact (win is a power of two), so the
    value is engine-portable for the oracle replay."""
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, rms = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # NULL payload == empty: zero full windows
                h = np.frombuffer(payload[:n_bytes], dtype=np.uint8).astype(
                    np.int64
                ) - 128
                for w in range(len(h) // win):
                    seg = h[w * win : (w + 1) * win]
                    sumsq = int((seg * seg).sum())
                    ids.append(doc_id)
                    wins.append(w)
                    rms.append(
                        math.floor(math.sqrt(sumsq / float(win)) * 10000 + 0.5)
                        / 10000.0
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": wins, "rms": rms}
            ).astype({"doc_id": "int64", "window_idx": "int64", "rms": "float64"})

    # project to the two consumed columns BEFORE the Python stage — its
    # three siblings already do; without this every extra document column
    # (including the text the payload was encoded from) crosses the Arrow
    # boundary per batch for nothing
    return df.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, window_idx long, rms double"
    )
