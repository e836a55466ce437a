"""Structure-graph operators: nuclearity (per-element connected
components) and trajectory anomaly flags.

Reference parity:
- T4 nuclearity (`catlas/nuclearity.py:14-62`): per surface, for each
  element, label connected components among that element's surface atoms
  and report {nuclearity, nuclearities}; comparing the 1x cell against a
  2x2 replica classifies clusters as finite / 'semi-finite' /
  'infinite' (`catlas/nuclearity.py:86-105`). The reference uses
  graph_tool on a pymatgen structure; here the graph arrives as explicit
  edge arrays (the surrogate-structure policy, SURVEY §7.3) and the
  component labeling is a numpy union-find inside a grouped pandas UDF —
  one row = one graph, so no distributed graph machinery is warranted.
- T5 anomaly flags (`catlas/flag_systems.py:40-96`): dissociation /
  desorption / reconstruction decided by comparing initial vs final
  connectivity. Connectivity arrives as edge lists; the checks are pure
  native array expressions (exists / array_intersect) — no Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUCLEARITY_SCHEMA = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("nuclearity", T.StringType(), True),
            T.StructField("nuclearities", T.ArrayType(T.IntegerType()), True),
        ]
    ),
)


def _components(n: int, edges: np.ndarray) -> np.ndarray:
    """Union-find connected-component labels for nodes 0..n-1."""
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in edges:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[ra] = rb
    return np.array([find(i) for i in range(n)])


def _nuclearity_one(elements: list[str], edges: list[list[int]]) -> dict:
    """Per-element component analysis of one structure vs its 2x2 replica,
    with the reference's EXACT infiniteness ratios
    (`evaluate_infiniteness`, catlas/nuclearity.py:86-105):

        max1 == max4        → finite, nuclearity = str(max1)
        max1 == 0.5 * max4  → "semi-finite"  (periodic in one direction)
        max1 == 0.25 * max4 → "infinite"     (periodic in both)
        otherwise           → "somewhat-infinite"

    The reference tiles the real slab ``repeat((2, 2, 1))`` and lets the
    pymatgen neighbor list re-derive cross-cell bonds. Without pymatgen
    in this container the replica is a surrogate: four copies of the
    graph in a 2x2 grid, where nodes ≡ 0 (mod 4) act as the x-periodic
    boundary (wrap-connect x-adjacent copies) and nodes ≡ 2 (mod 4) as
    the y-periodic boundary (wrap-connect y-adjacent copies). A component
    touching one boundary doubles (semi-finite), touching both
    quadruples (infinite), touching neither stays fixed (finite) — the
    same growth signatures the real tiling produces."""
    n = len(elements)
    edge_arr = np.array(edges, dtype=np.int64).reshape(-1, 2) if edges else np.empty((0, 2), int)
    # 2x2 grid of copies k=0..3 at node offsets k*n; grid adjacency:
    # x-pairs (0,1),(2,3); y-pairs (0,2),(1,3)
    parts = [edge_arr + k * n for k in range(4)] if len(edge_arr) else []
    wrap = [
        [i + a * n, i + b * n]
        for (a, b) in ((0, 1), (2, 3))
        for i in range(0, n, 4)
    ] + [
        [i + a * n, i + b * n]
        for (a, b) in ((0, 2), (1, 3))
        for i in range(2, n, 4)
    ]
    wrap_arr = np.array(wrap, dtype=np.int64).reshape(-1, 2)
    all4 = np.concatenate(parts + [wrap_arr]) if parts else wrap_arr

    def _sub_components(n_nodes: int, e_arr, mask):
        """Component sizes of the subgraph INDUCED by mask — the
        reference slices the connectivity matrix to the element's atoms
        (connectivity_matrix[mask,:][:,mask], catlas/nuclearity.py:77-79)
        BEFORE labeling, so a Cu-Pt-Cu chain is two Cu monomers, never a
        Cu 'dimer' bridged through the Pt atom (r8 review: the old
        full-graph labeling inflated every multi-element structure's
        per-element cluster sizes)."""
        m = int(mask.sum())
        remap = np.full(n_nodes, -1, dtype=np.int64)
        remap[np.flatnonzero(mask)] = np.arange(m)
        if len(e_arr):
            keep = mask[e_arr[:, 0]] & mask[e_arr[:, 1]]
            sub = remap[e_arr[keep]]
        else:
            sub = np.empty((0, 2), int)
        return pd.Series(_components(m, sub)).value_counts().sort_values().tolist()

    out = {}
    el_arr = np.array(elements)
    for el in sorted(set(elements)):
        mask1 = el_arr == el
        comp1 = _sub_components(n, edge_arr, mask1)
        mask4 = np.concatenate([mask1] * 4)
        comp4 = _sub_components(4 * n, all4, mask4)
        max1, max4 = (max(comp1) if comp1 else 0), (max(comp4) if comp4 else 0)
        if max1 == max4:
            nuclearity = str(max1)
        elif 2 * max1 == max4:
            nuclearity = "semi-finite"
        elif 4 * max1 == max4:
            nuclearity = "infinite"
        else:
            nuclearity = "somewhat-infinite"
        out[el] = {"nuclearity": nuclearity, "nuclearities": [int(c) for c in comp1]}
    return out


def add_nuclearity(
    df: DataFrame,
    elements_col: str = "atom_elements",
    edges_col: str = "bond_edges",
    out_col: str = "nuclearity_info",
) -> DataFrame:
    """Arrow-batched nuclearity feature (one graph per row).

    ``edges_col`` is array<array<int>> (pairs); ``elements_col`` is
    array<string>. Output is the reference's MAP shape.
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, NUCLEARITY_SCHEMA, True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # NULL cells on EITHER graph column degrade to the empty
            # graph (r8 review: the edges guard existed but a NULL
            # elements cell crashed list(None) inside the Arrow worker)
            pdf[out_col] = [
                _nuclearity_one(
                    list(els) if els is not None else [],
                    [list(e) for e in edges] if edges is not None else [],
                )
                for els, edges in zip(pdf[elements_col], pdf[edges_col])
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def attach_surrogate_graph(slabs: DataFrame, n_nodes_mod: int = 12) -> DataFrame:
    """Deterministic surrogate structure graph per slab: node elements
    cycle through bulk_elements; edges from a hash chain. Stands in for
    the pymatgen connectivity matrix (SURVEY §7.3 surrogate policy)."""
    key = ["bulk_id", "slab_millers", "slab_shift", "slab_top"]
    n_nodes = 4 + F.pmod(F.xxhash64(*key, F.lit("n")), F.lit(n_nodes_mod))
    idx = F.sequence(F.lit(0), n_nodes - 1)
    # greatest(size, 1): an EMPTY bulk_elements array (dirty upstream
    # row) made pmod(i, 0) an ANSI DIVIDE_BY_ZERO job abort (r8 review);
    # with the guard element_at probes index 1 of the empty array via
    # try_element_at -> NULL element labels, a degenerate-but-alive row
    elements = F.transform(
        idx,
        lambda i: F.try_element_at(
            F.col("bulk_elements"),
            (
                F.pmod(i, F.greatest(F.size("bulk_elements"), F.lit(1))) + 1
            ).cast("int"),
        ),
    )
    # chain edges kept with prob 2/3, plus skip links every 4th node
    chain = F.filter(
        F.transform(idx, lambda i: F.array(i, i + 1)),
        lambda e: (F.element_at(e, 2) < n_nodes)
        & (F.pmod(F.xxhash64(*key, F.element_at(e, 1)), F.lit(3)) > 0),
    )
    skips = F.filter(
        F.transform(idx, lambda i: F.array(i, i + 4)),
        lambda e: (F.element_at(e, 2) < n_nodes)
        & (F.pmod(F.xxhash64(*key, F.element_at(e, 1), F.lit("s")), F.lit(5)) == 0),
    )
    return slabs.withColumn("atom_elements", elements).withColumn(
        "bond_edges", F.concat(chain, skips).cast("array<array<int>>")
    )


# --- T5: trajectory anomaly flags (native expressions) ---------------------


def _edge_keys(edges: Column) -> Column:
    """array<array<int>> → canonical sortable string keys. Endpoints are
    sorted first: a bond recorded [1,2] initially and [2,1] in the final
    frame is the SAME edge — without canonicalization array_except would
    count it as one removal plus one addition (a phantom dissociation
    and a double-counted reconstruction change)."""
    return F.transform(edges, lambda e: F.concat_ws("-", F.array_sort(e)))


def anomaly_flags(
    initial_edges: Column,
    final_edges: Column,
    adsorbate_nodes: Column,
) -> Column:
    """Struct(dissociation, desorption, reconstruction) from initial vs
    final connectivity (flag_systems.py:40-96 semantics):

    - dissociation: an adsorbate-internal bond present initially is
      missing in the final frame (`is_adsorbate_dissociated:40-52`)
    - desorption: the final frame has NO adsorbate-surface bond
      (`is_adsorbate_desorbed:78-96`)
    - reconstruction: >25% of surface-surface bonds changed
      (`has_surface_changed:54-76`)
    """

    def is_ads(node: Column) -> Column:
        return F.array_contains(adsorbate_nodes, node.cast("int"))

    def kind(e: Column) -> Column:
        a_ads, b_ads = is_ads(F.element_at(e, 1)), is_ads(F.element_at(e, 2))
        return (
            F.when(a_ads & b_ads, F.lit("aa"))
            .when(a_ads | b_ads, F.lit("as"))
            .otherwise(F.lit("ss"))
        )

    def keys_of(edges: Column, k: str) -> Column:
        return _edge_keys(F.filter(edges, lambda e: kind(e) == F.lit(k)))

    init_aa, fin_aa = keys_of(initial_edges, "aa"), keys_of(final_edges, "aa")
    fin_as = keys_of(final_edges, "as")
    init_ss, fin_ss = keys_of(initial_edges, "ss"), keys_of(final_edges, "ss")

    dissociation = F.size(F.array_except(init_aa, fin_aa)) > 0
    desorption = F.size(fin_as) == 0
    changed = F.size(F.array_except(init_ss, fin_ss)) + F.size(
        F.array_except(fin_ss, init_ss)
    )
    reconstruction = changed > (F.size(init_ss) / 4)

    return F.struct(
        dissociation.alias("dissociation"),
        desorption.alias("desorption"),
        reconstruction.alias("reconstruction"),
    )
