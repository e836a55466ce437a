"""CLI entry point — the reference's ``bin/predictions.py`` lifecycle
(SURVEY.md §3.1) end-to-end:

    parse (Jinja2 env-var substitution → YAML → validated typed plan)
    → session → cascade → sinks (parquet results, config snapshot,
    Sankey lineage JSON, console preview).

Usage:
    python -m catlas_spark.run configs/example_screen.yml --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os

from .lineage import Lineage
from .plans.config import validate_config


def load_config(path: str) -> dict:
    """Jinja2-render env vars into the YAML (reference
    catlas/prediction_steps.py:79-80), then load + validate."""
    import jinja2
    import yaml

    with open(path) as f:
        raw = f.read()
    # StrictUndefined (r8 review): the default lenient Undefined renders
    # a missing/misspelled env var as an EMPTY STRING — `{{ DATA_DIR }}/x`
    # silently becomes `/x` and the run proceeds against the wrong path.
    # Defaults are the opt-in mechanism (`{{ VAR | default(2) }}`).
    rendered = jinja2.Template(raw, undefined=jinja2.StrictUndefined).render(
        **os.environ
    )
    return validate_config(yaml.safe_load(rendered))


def render_sankey(lineage: Lineage, out_dir: str) -> None:
    """K4 sink: lineage counts as Sankey. Plot libraries are optional —
    the JSON data file is always written; a PNG only when plotly exists."""
    data = lineage.sankey()
    with open(os.path.join(out_dir, "sankey.json"), "w") as f:
        json.dump({"sankey": data, "stages": lineage.summary()}, f, indent=2)
    try:
        import plotly.graph_objects as go  # pragma: no cover

        fig = go.Figure(
            go.Sankey(
                node={"label": data["nodes"]},
                link={
                    "source": [link["source"] for link in data["links"]],
                    "target": [link["target"] for link in data["links"]],
                    "value": [link["value"] for link in data["links"]],
                },
            )
        )
        fig.write_image(os.path.join(out_dir, "sankey.png"))
    except (ImportError, ValueError):
        # ImportError: plotly absent. ValueError: plotly present but the
        # kaleido image-export engine is not — either way the PNG is an
        # optional artifact and must not fail the run AFTER results wrote
        pass


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Run a screening config")
    ap.add_argument("config")
    ap.add_argument("--output", required=True)
    ap.add_argument("--bulks", default=None, help="parquet path (default: fixtures)")
    ap.add_argument("--adsorbates", default=None, help="parquet path (default: fixtures)")
    ap.add_argument("--preview", type=int, default=5)
    args = ap.parse_args(argv)

    from .pipeline import run_screen
    from .session import get_spark
    from .sinks import console_preview, snapshot_config, write_results
    from .sources import fixtures

    config = load_config(args.config)
    spark = get_spark("catlas_spark.run")
    bulks = (
        spark.read.parquet(args.bulks) if args.bulks else fixtures.make_bulks(spark)
    )
    adsorbates = (
        spark.read.parquet(args.adsorbates)
        if args.adsorbates
        else fixtures.make_adsorbates(spark)
    )
    from .plans.config import _active

    context = {}
    # _active, not truthiness (r8 review): a filter disabled with the
    # string "None" is skipped by apply_filters but was truthy here,
    # triggering a full driver-side collect of every bulk_id for a
    # pourbaix table that is never used
    if _active(config.get("bulk_filters", {}).get("filter_by_pourbaix_stability")):
        ids = [r.bulk_id for r in bulks.select("bulk_id").collect()]
        context["pourbaix"] = fixtures.make_pourbaix(spark, ids)

    lineage = Lineage()
    result = run_screen(spark, config, bulks, adsorbates, context, lineage)

    os.makedirs(args.output, exist_ok=True)
    write_results(result, args.output, partition_by=["adsorbate_smiles"])
    snapshot_config(config, args.output)
    render_sankey(lineage, args.output)
    if args.preview:
        # preview from the parquet just written, not the live plan (r8
        # review): a second action on the unpersisted `result` re-ran
        # the whole cascade — including Arrow inference — and every
        # preview column survives the sink's binary drop
        import glob as _glob

        res_dir = os.path.join(args.output, "results")
        # a partitionBy write of ZERO rows produces no data files, and
        # reading the bare _SUCCESS dir raises UNABLE_TO_INFER_SCHEMA —
        # an all-filtered screen must still exit 0 after writing (r8
        # diff review)
        if not _glob.glob(os.path.join(res_dir, "**", "*.parquet"), recursive=True):
            print("(no surviving rows — nothing to preview)")
            print(json.dumps({"stages": lineage.summary()}))
            return 0
        written = spark.read.parquet(res_dir)
        label_cols = [c for c in written.columns if c.startswith("min_")]
        # filter_reason only exists when the config ran an inference /
        # soft-delete step (r8 review: step-less configs crashed with
        # UNRESOLVED_COLUMN after the results were already written)
        if "filter_reason" in written.columns:
            written = written.filter("filter_reason IS NULL")
        preview_cols = [
            c
            for c in ["bulk_id", "slab_millers", "adsorbate_smiles", *label_cols]
            if c in written.columns
        ]
        console_preview(written, preview_cols, args.preview)
    print(json.dumps({"stages": lineage.summary()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
