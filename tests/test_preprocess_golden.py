"""Golden-file test: full CSV→NPZ preprocessing vs the reference's committed NPZ.

The reference tree retains the complete raw CSV set for posture 1 (no_exo)
across participants; running our pipeline on exactly those files must reproduce
the committed preprocessed/posture1_no_exo.npz bit-for-bit (verified ≤1 float32
ulp end-to-end: fs estimation, mains detection, notch+band-pass filtfilt,
epoching, min-max scaling, ordering).
"""

from pathlib import Path

import numpy as np
import pytest

RAW = Path("/root/reference/CGAN/6s_window")
GOLD = Path("/root/reference/timeGAN/preprocessed/posture1_no_exo.npz")

pytestmark = pytest.mark.skipif(not (RAW.exists() and GOLD.exists()),
                                reason="reference raw data not mounted")


def test_preprocess_bit_exact_vs_committed_npz(tmp_path):
    import jax
    from eegsynth.data.preprocess import run_preprocess

    # Stage only the posture-1 no-exo trial CSVs (bucket scaling is per bucket,
    # so a single-bucket subset reproduces the committed bucket exactly).
    root = tmp_path / "raw"
    n = 0
    for pdir in sorted(RAW.glob("protocol_outputs_*")):
        dst = root / pdir.name
        for fp in sorted(pdir.rglob("*.csv")):
            nm = fp.name.lower()
            if nm.startswith("posture-1-") and "trial" in nm and "no exo" in nm:
                dst.mkdir(parents=True, exist_ok=True)
                (dst / fp.name).symlink_to(fp)
                n += 1
    if n == 0:
        pytest.skip("no surviving posture-1 CSVs")

    out = tmp_path / "prep"
    with jax.default_device(jax.devices("cpu")[0]):
        rows = run_preprocess(root, out, log=lambda *a, **k: None)
    assert rows and rows[0]["condition"] == "no_exo"

    ours = np.load(out / "posture1_no_exo.npz", allow_pickle=True)
    ref = np.load(GOLD, allow_pickle=True)
    assert ours["X"].shape == ref["X"].shape
    np.testing.assert_allclose(ours["X"], ref["X"], atol=1e-7)
    np.testing.assert_array_equal(ours["participant"], ref["participant"])
    np.testing.assert_array_equal(ours["trial"], ref["trial"])
    np.testing.assert_allclose(ours["scale_min"], ref["scale_min"], rtol=1e-7)
    np.testing.assert_allclose(ours["scale_range"], ref["scale_range"], rtol=1e-7)
    assert float(ours["fs"]) == pytest.approx(float(ref["fs"]), abs=1e-6)
    assert [str(c) for c in ours["ch_names"]] == [str(c) for c in ref["ch_names"]]
