"""Explicit StructType schemas for the screening engine's logical tables.

The reference uses dynamic schema-on-read dicts (SURVEY.md §1.3,
`catlas/load_bulk_structures.py:8-16` declares required fields by
convention only). This engine inverts that: fixed, explicit schemas per
logical table; accumulative columns (e.g. ``filter_reason``, per-step
``min_dE_*``) are nullable columns added by operators.

Opaque scientific payloads (pymatgen Structure / ase.Atoms in the
reference, §1.2) are ``BinaryType`` columns with extracted scalar
metadata — mirroring how the reference itself extracts `slab_natoms`,
`slab_millers` (`catlas/enumerate_slabs_adslabs.py:62-73`).
"""

from __future__ import annotations

from pyspark.sql import types as T

BULKS = T.StructType(
    [
        T.StructField("bulk_id", T.StringType(), False),
        T.StructField("bulk_data_source", T.StringType(), True),
        T.StructField("bulk_natoms", T.IntegerType(), True),
        T.StructField("bulk_xc", T.StringType(), True),
        T.StructField("bulk_nelements", T.IntegerType(), True),
        T.StructField("bulk_elements", T.ArrayType(T.StringType()), True),
        T.StructField("bulk_e_above_hull", T.DoubleType(), True),
        T.StructField("bulk_band_gap", T.DoubleType(), True),
        T.StructField("bulk_structure", T.BinaryType(), True),
    ]
)

ADSORBATES = T.StructType(
    [
        T.StructField("adsorbate_smiles", T.StringType(), False),
        T.StructField("adsorbate_atoms", T.BinaryType(), True),
        T.StructField("adsorbate_bond_indices", T.ArrayType(T.IntegerType()), True),
        T.StructField("adsorbate_data_source", T.StringType(), True),
    ]
)

# slabs = all bulk columns (denormalized parent copy, reference J5) + slab_*
SLAB_EXTRA = T.StructType(
    [
        T.StructField("slab_millers", T.ArrayType(T.IntegerType()), True),
        T.StructField("slab_max_miller_index", T.IntegerType(), True),
        T.StructField("slab_shift", T.DoubleType(), True),
        T.StructField("slab_top", T.BooleanType(), True),
        T.StructField("slab_natoms", T.IntegerType(), True),
        T.StructField("slab_score_bb", T.DoubleType(), True),
        T.StructField("slab_score_sd", T.DoubleType(), True),
        T.StructField("slab_structure", T.BinaryType(), True),
    ]
)

SLABS = T.StructType(list(BULKS.fields) + list(SLAB_EXTRA.fields))

ANOMALY = T.StructType(
    [
        T.StructField("dissociation", T.BooleanType(), True),
        T.StructField("desorption", T.BooleanType(), True),
        T.StructField("reconstruction", T.BooleanType(), True),
    ]
)

POURBAIX = T.StructType(
    [
        T.StructField("bulk_id", T.StringType(), False),
        T.StructField("pH", T.DoubleType(), False),
        T.StructField("V", T.DoubleType(), False),
        T.StructField("decomp_e", T.DoubleType(), True),
    ]
)

VALIDATION = T.StructType(
    [
        T.StructField("random_id", T.StringType(), False),
        T.StructField("distribution", T.StringType(), True),
        T.StructField("adsorbate", T.StringType(), True),
        T.StructField("bulk_elements", T.ArrayType(T.StringType()), True),
        T.StructField("bulk_nelements", T.IntegerType(), True),
        T.StructField("DFT_energy", T.DoubleType(), True),
        T.StructField("ML_energy", T.ArrayType(T.DoubleType()), True),
        T.StructField("good_trajectory", T.BooleanType(), True),
    ]
)
