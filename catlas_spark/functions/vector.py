"""Vector column functions over ``array<float>`` embedding columns.

Pure Column expressions (``F.aggregate`` / ``F.zip_with`` run JVM-side):
no Python in the hot path, so a 100 TB embedding sweep stays inside
whole-stage codegen. Summation order is the array order on both Spark and
DuckDB, which keeps dot products bit-comparable for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def band_sign_bucket(a: Column, band: int, band_bits: int = 4) -> Column:
    """Sign bucket of ONE LSH band: the signs of components
    ``[band*band_bits+1 .. band*band_bits+band_bits]`` packed into an
    int. With several bands, two vectors become candidates if they agree
    on ANY band — the banding trick that trades a per-band 2^-bits
    selectivity for multi-band recall, exactly like minhash LSH bands
    but over hyperplane signs."""
    bits = [
        F.when(
            F.element_at(as_double(a), band * band_bits + i + 1) >= 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
        for i in range(band_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sign_bucket(a: Column, n_bits: int = 3) -> Column:
    """Random-hyperplane-style coarse LSH bucket from the signs of the
    first ``n_bits`` components (deterministic; the scale path partitions
    candidate generation so ANN never does a full cross join)."""
    bits = [
        F.when(F.element_at(as_double(a), i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(n_bits)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
