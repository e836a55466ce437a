"""The YAML "query grammar": typed validation of screen configs.

Port of the semantics of the reference's cerberus schema
(`catlas/config_validation.py:67-319`): legal filter names and parameter
types, mutual exclusions (top_k xor top_proportion, :194-203), and
dependency groups (pH_lower requires pH_upper/V_lower/V_upper,
:159-182). The validated dict is the logical plan the cascade executor
(`catlas_spark.pipeline.run_screen`) compiles to DataFrame transforms.
"""

from __future__ import annotations

import re
from typing import Any

BULK_ID_RE = re.compile(r"^(mp|mvc)-\d+$")

_LIST_OF_STR = ("filter_by_acceptable_elements", "filter_by_required_elements")
_PH_GROUP = ("pH_lower", "pH_upper", "V_lower", "V_upper")


class ConfigError(ValueError):
    pass


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise ConfigError(msg)


def _active(v: Any) -> bool:
    return v is not None and v != "None"


# Legal filter names per section — mirrors the cerberus grammar, which
# REJECTS unknown keys at validation time (`catlas/config_validation.py:67-319`;
# the runtime dispatch loop merely warns, `catlas/filters.py:135` — we keep
# that split: validator errors, executor warns).
_KNOWN_BULK_FILTERS = frozenset(
    {
        "filter_by_bulk_ids", "filter_ignore_bulk_ids",
        "filter_by_acceptable_elements", "filter_by_num_elements",
        "filter_by_required_elements", "filter_by_object_size",
        "filter_by_elements_active_host", "filter_by_element_groups",
        "filter_by_pourbaix_stability", "filter_by_bulk_e_above_hull",
        "filter_by_bulk_band_gap", "filter_fraction",
    }
)
_KNOWN_SLAB_FILTERS = frozenset(
    {
        "filter_by_object_size", "filter_by_max_miller_index",
        "filter_by_broken_bonds", "filter_by_surface_density",
        "filter_best_shift_by_broken_bonds", "filter_best_shift_by_surface_density",
    }
)
_KNOWN_ADSORBATE_FILTERS = frozenset({"filter_by_smiles"})
_BAND_GAP_KEYS = frozenset({"min_gap", "max_gap", "lower", "upper"})


def validate_config(config: dict[str, Any]) -> dict[str, Any]:
    """Validate and normalize a screen config; raises ConfigError with a
    precise message on the first violation. Returns the config unchanged
    (normalization hooks can rewrite later)."""
    _require(isinstance(config, dict), "config must be a mapping")

    bf = config.get("bulk_filters", {})
    _require(isinstance(bf, dict), "bulk_filters must be a mapping")
    for key in bf:
        _require(
            key in _KNOWN_BULK_FILTERS,
            f"unknown bulk filter {key!r} (legal: {sorted(_KNOWN_BULK_FILTERS)})",
        )
    bg = bf.get("filter_by_bulk_band_gap")
    if _active(bg):
        _require(isinstance(bg, dict), "filter_by_bulk_band_gap must be a mapping")
        bad = set(bg) - _BAND_GAP_KEYS
        _require(
            not bad,
            f"filter_by_bulk_band_gap: unknown keys {sorted(bad)} — use min_gap/"
            "max_gap (reference grammar, catlas/filters.py:116-129)",
        )
        _require(
            any(k in bg for k in _BAND_GAP_KEYS),
            "filter_by_bulk_band_gap needs min_gap and/or max_gap",
        )
    for key in ("filter_by_bulk_ids", "filter_ignore_bulk_ids"):
        ids = bf.get(key)
        if _active(ids):
            _require(isinstance(ids, list), f"{key} must be a list")
            for b in ids:
                _require(
                    isinstance(b, str) and BULK_ID_RE.match(b),
                    f"{key}: {b!r} is not a valid bulk id (mp-N / mvc-N)",
                )
    for key in _LIST_OF_STR:
        v = bf.get(key)
        if _active(v):
            _require(
                isinstance(v, list) and all(isinstance(x, str) for x in v),
                f"{key} must be a list of element symbols",
            )
    if _active(bf.get("filter_by_num_elements")):
        _require(
            isinstance(bf["filter_by_num_elements"], list)
            and all(isinstance(x, int) for x in bf["filter_by_num_elements"]),
            "filter_by_num_elements must be a list of ints",
        )
    if _active(bf.get("filter_by_object_size")):
        _require(
            isinstance(bf["filter_by_object_size"], int)
            and bf["filter_by_object_size"] > 0,
            "filter_by_object_size must be a positive int",
        )
    if _active(bf.get("filter_fraction")):
        f = bf["filter_fraction"]
        _require(isinstance(f, (int, float)) and 0 <= f <= 1, "filter_fraction in [0,1]")
    if _active(bf.get("filter_by_elements_active_host")):
        v = bf["filter_by_elements_active_host"]
        _require(
            isinstance(v, dict) and set(v) >= {"active", "host"},
            "filter_by_elements_active_host needs {active, host} lists",
        )
    eg = bf.get("filter_by_element_groups")
    if _active(eg):
        from ..operators.filters import ELEMENT_GROUP_ALIASES, ELEMENT_GROUPS

        _require(
            isinstance(eg, list) and all(isinstance(g, str) for g in eg),
            "filter_by_element_groups must be a list of group names",
        )
        legal = set(ELEMENT_GROUPS) | set(ELEMENT_GROUP_ALIASES)
        bad_groups = [g for g in eg if g not in legal]
        _require(
            not bad_groups,
            f"filter_by_element_groups: unknown groups {bad_groups} — supported: "
            f"{sorted(legal)} (reference grammar `valid_element_groups`, "
            "catlas/config_validation.py:7-16)",
        )
    pb = bf.get("filter_by_pourbaix_stability")
    if _active(pb):
        _require(isinstance(pb, dict), "filter_by_pourbaix_stability must be a mapping")
        present = [k for k in _PH_GROUP if k in pb]
        if present:
            _require(
                len(present) == len(_PH_GROUP),
                f"pourbaix window needs all of {_PH_GROUP} (got {present}) — "
                "dependency group per reference grammar",
            )
        elif "conditions" in pb:
            # non-empty + mappings only (r8 review): `all()` over an
            # empty list is True, so conditions: [] passed validation
            # and died as a runtime ValueError mid-pipeline — violating
            # the module's validator-errors/executor-warns contract; a
            # non-iterable entry made set(c) raise TypeError, not
            # ConfigError
            _require(
                isinstance(pb["conditions"], list)
                and len(pb["conditions"]) > 0
                and all(
                    isinstance(c, dict) and {"pH", "V"} <= set(c)
                    for c in pb["conditions"]
                ),
                "pourbaix conditions must be a NON-EMPTY list of {pH, V} mappings",
            )

    sf = config.get("slab_filters", {})
    _require(isinstance(sf, dict), "slab_filters must be a mapping")
    for key in sf:
        _require(
            key in _KNOWN_SLAB_FILTERS,
            f"unknown slab filter {key!r} (legal: {sorted(_KNOWN_SLAB_FILTERS)})",
        )
    for key in ("filter_by_broken_bonds", "filter_by_surface_density"):
        v = sf.get(key)
        if _active(v):
            _require(isinstance(v, dict), f"{key} must be a mapping")
            has_k, has_p = "top_k" in v, "top_proportion" in v
            _require(
                has_k != has_p,
                f"{key}: exactly one of top_k / top_proportion (mutual exclusion, "
                "reference config_validation.py:194-203)",
            )
    if _active(sf.get("filter_by_max_miller_index")):
        _require(
            isinstance(sf["filter_by_max_miller_index"], int)
            and 1 <= sf["filter_by_max_miller_index"] <= 4,
            "filter_by_max_miller_index must be an int in [1, 4]",
        )

    af = config.get("adsorbate_filters", {})
    _require(isinstance(af, dict), "adsorbate_filters must be a mapping")
    for key in af:
        _require(
            key in _KNOWN_ADSORBATE_FILTERS,
            f"unknown adsorbate filter {key!r} (legal: {sorted(_KNOWN_ADSORBATE_FILTERS)})",
        )
    if _active(af.get("filter_by_smiles")):
        _require(
            isinstance(af["filter_by_smiles"], list),
            "filter_by_smiles must be a list of SMILES strings",
        )

    steps = config.get("adslab_prediction_steps", [])
    _require(isinstance(steps, list), "adslab_prediction_steps must be a list")
    seen_labels: set[str] = set()
    for i, step in enumerate(steps):
        _require(isinstance(step, dict) and "step" in step, f"step {i}: needs 'step'")
        kind = step["step"]
        _require("label" in step, f"step {i}: needs 'label'")
        if kind == "inference":
            seen_labels.add(step["label"])
            if "batch_size" in step:
                _require(
                    isinstance(step["batch_size"], int) and step["batch_size"] > 0,
                    f"step {i}: batch_size must be a positive int",
                )
        elif kind == "filter_by_adsorption_energy":
            _require(
                {"adsorbate_smiles", "min_value", "max_value"} <= set(step),
                f"step {i}: filter needs adsorbate_smiles/min_value/max_value",
            )
            _require(
                step["label"] in seen_labels,
                f"step {i}: filters label {step['label']!r} before any inference "
                "step produced it",
            )
        elif kind == "filter_by_adsorption_energy_target":
            _require(
                {"adsorbate_smiles", "target_value"} <= set(step),
                f"step {i}: target filter needs adsorbate_smiles/target_value",
            )
            _require(step["label"] in seen_labels, f"step {i}: unknown label")
        else:
            raise ConfigError(f"step {i}: unknown step kind {kind!r}")

    return config
