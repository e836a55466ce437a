"""Meta-tests for the correctness gate itself (r7 tautology hunt).

The whole oracle sweep reduces to ``scripts.check_oracle.compare`` — if
that comparator silently accepted wrong answers, 172 green rows would
mean nothing. These tests feed it each failure class it must flag and
each legal variation it must accept, so a comparator regression fails
HERE instead of silently weakening every oracle test.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pandas as pd

# repo root from __file__, not a hardcoded checkout path (ADVICE r7)
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scripts.check_oracle import compare


def _df(**cols):
    return pd.DataFrame(dict(cols))


def test_flags_wrong_value():
    a = _df(k=[1, 2], v=["x", "y"])
    b = _df(k=[1, 2], v=["x", "z"])
    assert compare(a, b) is not None


def test_flags_float_beyond_tolerance_and_ulp():
    a = _df(v=[1.0, 2.0])
    assert compare(a, _df(v=[1.0, 2.0 + 1e-6])) is not None
    # bit-level difference below 1e-9 must still be reported (the
    # driver may hash raw bits)
    nxt = math.nextafter(2.0, 3.0)
    assert compare(a, _df(v=[1.0, nxt])) is not None


def test_flags_row_count_columns_dtype():
    a = _df(k=[1, 2])
    assert compare(a, _df(k=[1, 2, 3])) is not None  # row count
    assert compare(a, _df(j=[1, 2])) is not None  # column names
    assert compare(a, _df(k=[1.0, 2.0])) is not None  # 3 vs 3.0 dtype


def test_flags_none_vs_value():
    a = _df(v=[1.0, None])
    b = _df(v=[1.0, 2.0])
    assert compare(a, b) is not None


def test_accepts_reordered_rows_and_columns():
    a = _df(k=[1, 2], v=["x", "y"])
    b = _df(v=["y", "x"], k=[2, 1])
    assert compare(a, b) is None


def test_accepts_null_and_nan_equivalence():
    a = _df(v=[float("nan"), None])
    b = _df(v=[None, float("nan")])
    # each side sorts independently; NaN/None must compare equal
    assert compare(a, b) is None


def test_accepts_subtolerance_tie_reordering():
    """Two rows whose SORT KEY differs only below tolerance must align
    regardless of which side carries the +ulp value (the rounded-key
    sort in normalize())."""
    lo, hi = 0.3, math.nextafter(0.3, 1.0)
    a = _df(k=[lo, hi], v=[1, 1])
    b = _df(k=[hi, lo], v=[1, 1])
    err = compare(a, b)
    # rows align (no value mismatch on v); the sub-tolerance key diff
    # itself is at most reported as a ULP note, never a hard value error
    assert err is None or "ULP" in err
