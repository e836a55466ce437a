"""Multimodal operator edge semantics (r8 review findings): NULL
payloads must never crash an Arrow stage, and each operator's
row-emission contract on empty/short payloads is pinned."""

from __future__ import annotations

from pyspark.sql import functions as F


def _payloads(spark):
    from catlas_spark.operators.multimodal import attach_binary_payload

    rows = [
        (1, "hello world, a perfectly ordinary document body here"),
        (2, None),  # NULL text -> NULL payload
        (3, ""),  # empty text -> empty payload
        (4, "tiny"),  # shorter than one resize source row (16 bytes)
    ]
    return attach_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_decode_features_null_and_empty_payloads(spark):
    from catlas_spark.operators.multimodal import decode_features

    got = {r.doc_id: r for r in decode_features(_payloads(spark)).collect()}
    # one row per doc, ALWAYS — NULL and empty payloads take the
    # empty-payload features (len(None) crashed the stage before r8)
    assert set(got) == {1, 2, 3, 4}
    assert got[2].byte_len == 0 and got[2].head_mean == 0.0
    assert got[3].byte_len == 0 and got[3].head_mean == 0.0
    assert got[1].byte_len > 0 and got[1].head_mean > 0.0


def test_frames_resize_audio_skip_null_and_short_payloads(spark):
    from catlas_spark.operators.multimodal import (
        audio_window_energy,
        extract_frames,
        resize_nearest,
    )

    p = _payloads(spark)
    frames = {r.doc_id for r in extract_frames(p).collect()}
    assert 1 in frames and 2 not in frames and 3 not in frames  # no bytes, no frames
    resized = {r.doc_id for r in resize_nearest(p).collect()}
    # docs 2/3/4 have < src_h bytes: no complete source row, no output
    # (documented contract; left-join back for one-row-per-doc)
    assert resized == {1}
    audio = {r.doc_id for r in audio_window_energy(p).collect()}
    assert 1 in audio and 2 not in audio and 3 not in audio


def test_punct_ratio_multilingual_fairness(spark):
    """punct_ratio counts ASCII punctuation, not 'anything non-ASCII':
    an accented French sentence must score the same low ratio as its
    ASCII-folded twin (the old [^A-Za-z0-9\\s]-complement definition
    counted every accented letter as noise and depressed fr/de/es
    quality by up to the accent density), while a symbol-heavy doc
    still scores high; empty text stays NULL (see quality_score)."""
    from catlas_spark.functions.text import punct_ratio, quality_score
    from pyspark.sql import functions as F

    rows = [
        (1, "elegante journee a l'ete, tres agreable."),
        (2, "élégante journée à l'été, très agréable."),
        (3, "!!! $$$ ??? ###"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.pr, r.q)
        for r in df.select(
            "id",
            F.round(punct_ratio(F.col("text")), 4).alias("pr"),
            quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert abs(got[1][0] - got[2][0]) < 0.01  # accents are not punctuation
    assert got[2][0] < 0.1 and got[3][0] > 0.7
    assert got[4] == (None, None)  # empty text: NULL, not a 0.6 free pass
