"""The screening pipeline: enumeration TVFs, batched inference with
soft-delete gating, and the config-driven cascade executor.

Reference lifecycle being re-expressed (SURVEY.md §3.1,
`bin/predictions.py:37-85`):

    bulks → filter chain → enumerate_slabs (T1 flatMap) → slab filters
    (grouped top-k / best-shift) → × adsorbates (J1 cross join, small
    side broadcast) → enumerate_adslabs (T2, kept as array column) →
    [inference | group-EXISTS filter]* cascade (R3) → grouped min (A3)
    → sinks + lineage.

Spark-first choices:
- Enumeration is NATIVE (explode over generated arrays): the reference's
  Python TVF exists to call pymatgen; the deterministic surrogate needs
  no Python, so the whole fan-out stays in whole-stage codegen and
  Catalyst sees cardinalities. The miller-index cap is a parameter of
  the source, not a post-filter (R1 pushdown, reference
  catlas/prediction_steps.py:227-231).
- Inference is an Arrow-batched mapInPandas with an executor-singleton
  model (P5, reference BOCPP_dict catlas/adslab_predictions.py:22,260-272)
  and micro-batching (P6, :287-292). Rows already soft-deleted skip the
  model and emit NULL energies (F20, :275-282).
- Per-row energy arrays stay ARRAY columns; grouped min/argmin is
  array_min + array_position (A3, :324-337) — no explode/shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lineage import Lineage, attach_counter
from .operators.filters import (
    ADSORBATE_FILTERS,
    BULK_FILTERS,
    SLAB_FILTERS,
    adsorption_energy_filter,
    adsorption_energy_target_filter,
    apply_filters,
)
from .operators.relational import soft_delete_gate


# F20 gating of struct-valued features lives in
# operators.relational.soft_delete_gate (a missing .otherwise is the
# same implicit NULL) — no pipeline-local copy to drift


# ---------------------------------------------------------------------------
# T1: slab enumeration (deterministic surrogate of
#     catlas/enumerate_slabs_adslabs.py:31-78 + enumeration_utils.py:21-68)
# ---------------------------------------------------------------------------


def miller_indices(max_miller: int) -> list[tuple[int, int, int]]:
    """Symmetrically-distinct surrogate: h ≥ k ≥ l ≥ 0, h > 0, h ≤ max."""
    out = []
    for h in range(1, max_miller + 1):
        for k in range(h + 1):
            for l in range(k + 1):  # noqa: E741
                out.append((h, k, l))
    return out


def _hash_unit(*cols) -> F.Column:
    """Deterministic double in [0, 1) from a 64-bit column hash."""
    return F.pmod(F.xxhash64(*cols), F.lit(1_000_000)) / 1_000_000.0


def enumerate_slabs(bulks: DataFrame, max_miller: int = 2) -> DataFrame:
    """bulk row → N surface rows. Parent bulk columns are carried on every
    slab row for free (explode keeps them — the reference deep-copies
    dicts for the same denormalized lineage, J5).

    max_miller is a parameter of the enumeration, not a post-filter
    (R1: the one pushdown Catalyst cannot do into a generator).
    """
    millers = miller_indices(max_miller)
    miller_arr = F.array(
        *[
            F.struct(F.lit(h).alias("h"), F.lit(k).alias("k"), F.lit(l).alias("l"))
            for (h, k, l) in millers
        ]
    )
    n_term = 1 + F.pmod(F.col("bulk_natoms"), F.lit(3))
    with_m = (
        bulks.withColumn("m", F.explode(miller_arr))
        .withColumn("slab_millers", F.array("m.h", "m.k", "m.l"))
        .withColumn("slab_max_miller_index", F.col("m.h"))
        .drop("m")
    )
    # terminations: shift grid (i+1)/(n_term+1), 2-decimal (FIXTURES.md §3)
    shifts = F.transform(
        F.sequence(F.lit(1), n_term),
        lambda i: F.round(i.cast("double") / (n_term + 1), 2),
    )
    with_shift = with_m.withColumn("slab_shift", F.explode(shifts))
    # non-z-invertible surfaces also emit the flipped bottom
    # (enumeration_utils.py:71-125)
    invertible = (
        F.pmod(F.xxhash64("bulk_id", "slab_millers", "slab_shift"), F.lit(2)) == 0
    )
    tops = F.when(invertible, F.array(F.lit(True))).otherwise(
        F.array(F.lit(True), F.lit(False))
    )
    slabs = with_shift.withColumn("slab_top", F.explode(tops))
    key = ["bulk_id", "slab_millers", "slab_shift", "slab_top"]
    return (
        slabs.withColumn(
            "slab_natoms", (10 + F.pmod(F.xxhash64(*key), F.lit(191))).cast("int")
        )
        .withColumn("slab_score_bb", F.round(_hash_unit(*key, F.lit("bb")) * 10.0, 6))
        .withColumn("slab_score_sd", F.round(_hash_unit(*key, F.lit("sd")) * 10.0, 6))
        .withColumn("slab_structure", F.col("bulk_structure"))
    )


# ---------------------------------------------------------------------------
# J1 + T2: cross join and adslab enumeration
#          (catlas/prediction_steps.py:271; enumerate_slabs_adslabs.py:81-122)
# ---------------------------------------------------------------------------


def enumerate_adslabs(surfaces: DataFrame, adsorbates: DataFrame) -> DataFrame:
    """surfaces × adsorbates (small side broadcast), plus the per-pair
    placement-configuration ids as an ARRAY column. The array is NOT
    exploded — batched inference and grouped min consume whole groups
    (reference keeps list[Atoms] per row for the same reason, T2 note).
    """
    combo = surfaces.crossJoin(F.broadcast(adsorbates))
    n_configs = 1 + F.pmod(F.col("slab_natoms"), F.lit(8))
    return combo.withColumn("config_ids", F.sequence(F.lit(0), n_configs - 1))


# ---------------------------------------------------------------------------
# Batched inference (deterministic surrogate of energy_prediction,
# catlas/adslab_predictions.py:217-362)
# ---------------------------------------------------------------------------

# executor-singleton model cache (P5): one entry per (checkpoint, batch)
# per Python worker process — survives across Arrow batches.
_MODEL_CACHE: dict[tuple, "_SurrogateModel"] = {}


class _SurrogateModel:
    """Deterministic stand-in for the reference's BatchOCPPredictor
    (catlas/adslab_predictions.py:59-113): energies are a splitmix64
    stream of the row seed, mapped into [-4, 2] eV (the parity-plot range,
    parity_utils.py:237-238). Swap for a torch checkpoint on a real
    cluster — the Spark plumbing does not change.
    """

    def __init__(self, checkpoint: str):
        self.checkpoint = checkpoint

    def predict(self, seeds: np.ndarray, counts: np.ndarray) -> list[np.ndarray]:
        flat_seed = np.repeat(seeds.astype(np.uint64), counts)
        offsets = np.concatenate([np.arange(c, dtype=np.uint64) for c in counts])
        x = flat_seed + offsets
        # splitmix64 finalizer (public-domain PRNG mixing constants)
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
        unit = x.astype(np.float64) / float(2**64)
        energies = -4.0 + 6.0 * unit
        return np.split(energies, np.cumsum(counts)[:-1])


def energy_prediction(
    df: DataFrame,
    step_label: str,
    checkpoint: str = "surrogate-v1",
    batch_size: int = 64,
    gpu: bool = False,
) -> DataFrame:
    """Add ``<label>`` (array<double>), ``min_<label>`` and
    ``argmin_config_<label>`` columns via Arrow-batched inference.

    - Soft-deleted rows (filter_reason set) skip the model and get NULL
      result columns (F20).
    - The model is an executor-singleton (P5); rows are scored in
      ``batch_size`` micro-batches inside each Arrow batch (P6).
    - min/argmin are native array_min/array_position afterwards (A3) —
      no second Python stage, no shuffle.
    """
    seed_cols = ["bulk_id", "slab_millers", "slab_shift", "slab_top", "adsorbate_smiles"]
    with_seed = df.withColumn(
        "__seed", F.xxhash64(*seed_cols, F.lit(step_label))
    )
    if "filter_reason" not in with_seed.columns:
        with_seed = with_seed.withColumn("filter_reason", F.lit(None).cast("string"))

    out_schema = T.StructType(
        list(with_seed.schema.fields)
        + [T.StructField(step_label, T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _MODEL_CACHE.setdefault(
            (checkpoint, batch_size), _SurrogateModel(checkpoint)
        )
        for pdf in batches:
            energies: list = [None] * len(pdf)
            live = pdf.index[pdf["filter_reason"].isna()]
            for start in range(0, len(live), batch_size):  # micro-batching (P6)
                idx = live[start : start + batch_size]
                seeds = pdf.loc[idx, "__seed"].to_numpy(dtype=np.int64).view(np.uint64)
                counts = pdf.loc[idx, "config_ids"].apply(len).to_numpy(dtype=np.int64)
                preds = model.predict(seeds, counts)
                for i, p in zip(idx, preds):
                    energies[i] = np.round(p, 6)
            out = pdf.copy()
            out[step_label] = energies
            yield out

    # GPU steps get a ResourceProfile pinning this stage to GPU executors
    # (P1/R8); local mode / CPU clusters fall through to the plain path.
    from .resources import inference_profile, map_with_profile

    profile = inference_profile(df.sparkSession) if gpu else None
    scored = map_with_profile(with_seed, run, out_schema, profile).drop("__seed")
    min_col = F.array_min(F.col(step_label))
    return scored.withColumn(f"min_{step_label}", min_col).withColumn(
        f"argmin_config_{step_label}",
        F.when(
            min_col.isNotNull(),
            F.array_position(F.col(step_label), min_col).cast("int") - 1,
        ),
    )


def memoized_energy_prediction(
    spark: SparkSession, df: DataFrame, step: dict[str, Any]
) -> DataFrame:
    """Inference with the memo-table (R4): results keyed by the surface +
    adsorbate identity and the step/checkpoint version; re-runs serve
    hits from parquet and compute only new keys.

    Cache-poisoning guard: only LIVE rows are memoized — soft-deleted
    rows skip compute (F20) and get NULL result columns directly, so a
    row filtered in one run can never store NULLs under the key a live
    run would read (the reference's ignore-args pitfall, SURVEY §7.3).
    """
    from .memo import memoize

    label = step["label"]
    if "filter_reason" not in df.columns:
        df = df.withColumn("filter_reason", F.lit(None).cast("string"))
    live = df.filter(F.col("filter_reason").isNull())
    dead = df.filter(F.col("filter_reason").isNotNull())

    def compute(part: DataFrame) -> DataFrame:
        return energy_prediction(
            part,
            label,
            checkpoint=step.get("checkpoint", "surrogate-v1"),
            batch_size=int(step.get("batch_size", 64)),
            gpu=bool(step.get("gpu", False)),
        )

    key_cols = [
        "bulk_id", "slab_millers", "slab_shift", "slab_top",
        "adsorbate_smiles", "config_ids",
    ]
    version = f"{label}:{step.get('checkpoint', 'surrogate-v1')}:v1"
    # pin_input=True: this input is exactly memoize's documented
    # "expensive derived plan" case — in a multi-step cascade it carries
    # the PREVIOUS step's Arrow inference lineage, which the memo's
    # append action plus both serving joins would otherwise re-execute
    # 3-4x per step (r8 review)
    live_out = memoize(
        spark, live, key_cols, compute, step["memo_table"], version, pin_input=True
    )
    dead_out = (
        dead.withColumn(label, F.lit(None).cast("array<double>"))
        .withColumn(f"min_{label}", F.lit(None).cast("double"))
        .withColumn(f"argmin_config_{label}", F.lit(None).cast("int"))
    )
    return live_out.unionByName(dead_out)


# ---------------------------------------------------------------------------
# Cascade executor (R3: multi-fidelity steps, bin/predictions.py:56-77)
# ---------------------------------------------------------------------------


def run_screen(
    spark: SparkSession,
    config: dict[str, Any],
    bulks: DataFrame,
    adsorbates: DataFrame,
    context: dict | None = None,
    lineage: Lineage | None = None,
) -> DataFrame:
    """Execute a validated screen config end-to-end; returns the lazy
    result DataFrame (callers choose the sink/action)."""
    ctx = dict(context or {})
    lin = lineage if lineage is not None else Lineage()

    b = attach_counter(bulks, "bulks_in", lin)
    b = apply_filters(b, config.get("bulk_filters", {}), BULK_FILTERS, ctx, None)
    b = attach_counter(b, "bulks_filtered", lin)

    a = apply_filters(
        adsorbates, config.get("adsorbate_filters", {}), ADSORBATE_FILTERS, ctx, None
    )

    # None / "None" disables a filter per the filters-module convention;
    # slab enumeration still needs a bound, so a disabled miller filter
    # falls back to the default 2 instead of crashing int()
    raw_mm = config.get("slab_filters", {}).get("filter_by_max_miller_index", 2)
    max_miller = 2 if raw_mm in (None, "None") else int(raw_mm)
    slabs = enumerate_slabs(b, max_miller=max_miller)
    slab_conf = {
        k: v
        for k, v in config.get("slab_filters", {}).items()
        if k != "filter_by_max_miller_index"  # pushed into the source (R1)
    }
    slabs = apply_filters(slabs, slab_conf, SLAB_FILTERS, ctx, None)
    if config.get("enumerate_nuclearity"):
        # T4 feature map on surfaces (reference prediction_steps.py:232-247)
        from .operators.structure import add_nuclearity, attach_surrogate_graph

        slabs = add_nuclearity(attach_surrogate_graph(slabs))
    slabs = attach_counter(slabs, "surfaces", lin)

    adslabs = enumerate_adslabs(slabs, a)
    adslabs = attach_counter(adslabs, "adslabs", lin)

    for step in config.get("adslab_prediction_steps", []):
        kind = step["step"]
        if kind == "inference":
            if step.get("memo_table"):
                adslabs = memoized_energy_prediction(spark, adslabs, step)
            else:
                adslabs = energy_prediction(
                    adslabs,
                    step["label"],
                    checkpoint=step.get("checkpoint", "surrogate-v1"),
                    batch_size=int(step.get("batch_size", 64)),
                    gpu=bool(step.get("gpu", False)),
                )
            if step.get("anomaly_detection"):
                # T5: relaxation steps flag dissociation/desorption/
                # reconstruction by comparing initial vs relaxed
                # connectivity (flag_systems.py:40-96). Surrogate final
                # edges = initial minus hash-selected bonds.
                from .operators.structure import anomaly_flags, attach_surrogate_graph

                if "bond_edges" not in adslabs.columns:
                    adslabs = attach_surrogate_graph(adslabs)
                final_edges = F.filter(
                    F.col("bond_edges"),
                    lambda e: F.pmod(
                        F.xxhash64(
                            "bulk_id", "adsorbate_smiles", F.lit(step["label"]),
                            F.element_at(e, 1),
                        ),
                        F.lit(4),
                    )
                    > 0,
                )
                ads_nodes = F.sequence(
                    F.lit(0), F.pmod(F.xxhash64("adsorbate_smiles"), F.lit(2))
                ).cast("array<int>")
                adslabs = adslabs.withColumn(
                    f"anomaly_detection_{step['label']}",
                    soft_delete_gate(
                        adslabs,
                        anomaly_flags(F.col("bond_edges"), final_edges, ads_nodes),
                    ),
                )
        elif kind == "filter_by_adsorption_energy":
            adslabs = adsorption_energy_filter(
                adslabs,
                step["label"],
                list(step["adsorbate_smiles"]),
                float(step["min_value"]),
                float(step["max_value"]),
                step.get("hash_columns"),
            )
        elif kind == "filter_by_adsorption_energy_target":
            adslabs = adsorption_energy_target_filter(
                adslabs,
                step["label"],
                list(step["adsorbate_smiles"]),
                float(step["target_value"]),
                float(step.get("range_value", 0.5)),
                step.get("hash_columns"),
            )
        else:
            raise ValueError(f"unknown step kind {kind!r}")

    return attach_counter(adslabs, "results", lin)
