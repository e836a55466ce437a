"""Mergeable frequent-items summaries (Misra-Gries family).

Spark's built-in `freqItems` already exposes a JVM-side sketch of this
family (used by `heavy_hitters_contract`); this module implements the
summary EXPLICITLY as the exemplar of a custom mergeable sketch on
Spark: per-partition summaries via Arrow-batched `mapInPandas` (bounded
memory: at most k counters per task, never a per-key shuffle of the raw
rows), merged with one k*P-row groupBy. That is the general recipe for
any mergeable summary Spark lacks natively (quantile digests, count-min,
space-saving): partial-summarize per partition in one pass, merge the
tiny summaries.

Guarantees (Misra & Gries 1982; merge rule per Agarwal et al.,
"Mergeable Summaries", PODS 2012): a capacity-k summary of n rows
undercounts every item by at most n/(k+1) and never overcounts; merging
by summing estimates preserves the bound, so the global summary has
error <= N/(k+1) and contains EVERY item with true count > N/(k+1).
`misra_gries_contract` in the query registry proves exactly that
contract against exact counts.

At 100 TB: each task carries O(k) state, the shuffle moves only k rows
per partition, and the merge is one small groupBy — the sketch is the
difference between a full groupBy of a hot-key column and a fixed-size
summary, which is why pretraining pipelines use it for hot-domain /
hot-shard detection.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Frequent-items summary of ``df[col]`` with capacity ``k``.

    Returns (col, est) with at most k rows per input partition before the
    merge; ``est`` never exceeds the true count and undercounts by at
    most N/(k+1). The per-partition pass is the batch formulation of
    Misra-Gries: merge each Arrow batch's value counts into the running
    summary, then prune back to k counters by subtracting the (k+1)-th
    largest count and dropping non-positive ones (each prune charges the
    subtracted amount against at least k+1 distinct count units, which
    is where the n/(k+1) bound comes from).
    """
    field = df.schema[col]

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pdf in batches:
            # dropna=False: NULL is an item (often THE hot key — a
            # missing-field domain). pandas' default silently dropped it,
            # so a NULL above the N/(k+1) bound was never reported (r8
            # review), violating the every-heavy-item guarantee; the
            # None index survives Arrow as a NULL key and the merge
            # groupBy groups it like any value.
            vc = pdf[col].value_counts(dropna=False)
            acc = vc if acc is None else acc.add(vc, fill_value=0)
            if len(acc) > k:
                cut = acc.nlargest(k + 1).iloc[-1]
                acc = acc - cut
                acc = acc[acc > 0]
        if acc is not None and len(acc):
            yield pd.DataFrame({col: acc.index, "est": acc.astype("int64").to_numpy()})

    partials = df.select(col).mapInPandas(
        summarize, schema=f"{col} {field.dataType.simpleString()}, est long"
    )
    # merge rule: sum the partial estimates (<= k rows per partition, so
    # this groupBy moves k*P rows, not N)
    return partials.groupBy(col).agg(F.sum("est").alias("est"))
