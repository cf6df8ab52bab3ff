"""Native CSV parser: bit-exactness vs pandas on real + synthetic files."""

from pathlib import Path

import numpy as np
import pytest

from eegsynth.data.fast_csv import native_available, read_columns, read_header

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native csv loader unavailable")


def test_matches_pandas_on_synthetic(tmp_path, rng):
    import pandas as pd
    fp = tmp_path / "t.csv"
    df = pd.DataFrame({
        "a": rng.standard_normal(100),
        "b": ["x"] * 50 + [str(v) for v in rng.standard_normal(50)],
        "c": rng.integers(0, 10, 100),
        "d": [""] * 100,
    })
    df.to_csv(fp, index=False)
    cols = ["a", "b", "c", "d"]
    A = read_columns(fp, cols)

    # exactness oracle: Python float() is correctly rounded (pandas' python
    # engine is NOT — its fast strtod can be tens of ulp off)
    def pyfloat(s):
        try:
            return float(s)
        except ValueError:
            return np.nan
    lines = fp.read_text().strip().split("\n")[1:]
    ref = np.array([[pyfloat(v) for v in ln.split(",")] for ln in lines])
    eq = (A == ref) | (np.isnan(A) & np.isnan(ref))
    assert eq.all()

    # and pandas agrees to float32-level precision
    B = pd.read_csv(fp, engine="python")[cols].apply(
        pd.to_numeric, errors="coerce").values.astype(np.float64)
    both_nan = np.isnan(A) & np.isnan(B)
    assert (both_nan | (np.abs(A - B) <= 1e-12 * np.maximum(np.abs(B), 1e-6))).all()
    assert read_header(fp) == cols


def test_matches_pandas_on_real_trial():
    import pandas as pd
    real = sorted(Path("/root/reference/CGAN/6s_window").glob(
        "protocol_outputs_*/*trial*.csv"))
    real = [f for f in real if f.stat().st_size > 10000]
    if not real:
        pytest.skip("no real CSVs mounted")
    fp = real[0]
    hdr = read_header(fp)
    cols = [c for c in hdr if c.startswith("eeg.")][:15]
    A = read_columns(fp, cols)
    B = pd.read_csv(fp, engine="python")[cols].apply(
        pd.to_numeric, errors="coerce").values.astype(np.float64)
    eq = (A == B) | (np.isnan(A) & np.isnan(B))
    assert eq.all()


def test_missing_column_raises(tmp_path):
    (tmp_path / "t.csv").write_text("a,b\n1,2\n")
    with pytest.raises(KeyError):
        read_columns(tmp_path / "t.csv", ["nope"])


def test_bom_quotes_and_plus_signs(tmp_path):
    # pandas-parity for messy exports: UTF-8 BOM, quoted header names,
    # quoted numeric fields, '+'-signed numbers
    import pandas as pd
    fp = tmp_path / "messy.csv"
    fp.write_bytes("﻿\"Timestamp\",EEG.AF3,\"EEG.F7\"\n"
                   "1.0,+1.5,\"2.5\"\n"
                   "2.0,-3.5,oops\n".encode("utf-8"))
    hdr = read_header(fp)
    assert hdr == ["Timestamp", "EEG.AF3", "EEG.F7"]
    got = read_columns(fp, ["Timestamp", "EEG.AF3", "EEG.F7"])
    assert pd.read_csv(fp).columns.tolist() == hdr   # pandas agrees on names
    assert got.shape == (2, 3)
    np.testing.assert_array_equal(got[:, 0], [1.0, 2.0])
    np.testing.assert_array_equal(got[:, 1], [1.5, -3.5])
    assert got[0, 2] == 2.5 and np.isnan(got[1, 2])
