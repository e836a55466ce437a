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
    rendered = jinja2.Template(raw).render(**os.environ)
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
    context = {}
    if config.get("bulk_filters", {}).get("filter_by_pourbaix_stability"):
        ids = [r.bulk_id for r in bulks.select("bulk_id").collect()]
        context["pourbaix"] = fixtures.make_pourbaix(spark, ids)

    lineage = Lineage()
    result = run_screen(spark, config, bulks, adsorbates, context, lineage)

    os.makedirs(args.output, exist_ok=True)
    write_results(result, args.output, partition_by=["adsorbate_smiles"])
    snapshot_config(config, args.output)
    render_sankey(lineage, args.output)
    if args.preview:
        label_cols = [c for c in result.columns if c.startswith("min_")]
        console_preview(
            result.filter("filter_reason IS NULL"),
            ["bulk_id", "slab_millers", "adsorbate_smiles", *label_cols],
            args.preview,
        )
    print(json.dumps({"stages": lineage.summary()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
