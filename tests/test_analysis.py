"""Fatigue analysis + visualization units: oracles vs the reference formulas."""

import numpy as np
import pytest
import scipy.signal as sig

from eegsynth.analysis.bandpower import (
    BANDS, band_powers, compute_psd_per_channel, order_channels_grouped,
)
from eegsynth.analysis.fatigue import fatigue_indices, tbr_matrix, workload_ratio
from eegsynth.analysis.participant_fatigue import (
    compute_fatigue_tbr, remap_to_14_channels,
)
from eegsynth.analysis.ttests import (
    display_scales, reorder_by_region, sig_stars, welch_ttest_per_channel,
)


def test_compute_psd_matches_scipy_loops(rng):
    X = rng.standard_normal((5, 256, 3))
    fs = 128.0
    f, psd_mean, psd_sem = compute_psd_per_channel(X, fs)
    # reference loops scipy.welch per (epoch, channel)
    all_psd = np.stack([
        np.stack([sig.welch(X[i, :, c], fs=fs, nperseg=128, noverlap=64)[1]
                  for c in range(3)]) for i in range(5)])
    np.testing.assert_allclose(psd_mean, all_psd.mean(axis=0), rtol=1e-7, atol=1e-12)
    np.testing.assert_allclose(psd_sem, all_psd.std(axis=0, ddof=1) / np.sqrt(5),
                               rtol=1e-6, atol=1e-12)


def test_band_powers_and_indices(rng):
    X = rng.standard_normal((4, 256, 3))
    f, psd_mean, _ = compute_psd_per_channel(X, 128.0)
    bp = band_powers(f, psd_mean)
    assert set(bp) == set(BANDS)
    for v in bp.values():
        assert v.shape == (3,)
        assert (v >= 0).all()
    idx = fatigue_indices(bp)
    np.testing.assert_allclose(idx["TBR (Theta/Beta)"],
                               bp["Theta"] / (bp["Beta"] + 1e-12))
    np.testing.assert_allclose(idx["Theta/Alpha"],
                               bp["Theta"] / (bp["Alpha"] + 1e-12))


def test_workload_ratio_region_fallback(rng):
    bp = {"Theta": np.array([2.0, 4.0]), "Alpha": np.array([1.0, 3.0]),
          "Beta": np.array([1.0, 1.0])}
    # named channels present
    w = workload_ratio(bp, ["AF3", "P7"])
    np.testing.assert_allclose(w, 2.0 / 3.0, rtol=1e-9)
    # unknown channel names → global mean fallback (reference safe_mean)
    w2 = workload_ratio(bp, ["X1", "X2"])
    np.testing.assert_allclose(w2, 3.0 / 2.0, rtol=1e-9)


def test_tbr_matrix_matches_scipy(rng):
    X = rng.standard_normal((3, 256, 2))
    fs = 128.0
    got = tbr_matrix(X, fs)
    for i in range(3):
        for c in range(2):
            fr, P = sig.welch(X[i, :, c], fs=fs, nperseg=128, noverlap=64)
            trapz = getattr(np, "trapezoid", np.trapz)  # np.trapz deprecated
            th = trapz(P[(fr >= 4) & (fr <= 8)], fr[(fr >= 4) & (fr <= 8)])
            be = trapz(P[(fr >= 13) & (fr <= 30)], fr[(fr >= 13) & (fr <= 30)])
            np.testing.assert_allclose(got[i, c], th / (be + 1e-12), rtol=1e-6)


def test_welch_ttest_and_stars(rng):
    a = rng.standard_normal((30, 4))
    b = rng.standard_normal((30, 4)) + 2.0
    t, p = welch_ttest_per_channel(a, b, 4)
    assert (p < 0.01).all()
    assert sig_stars(0.0001) == "***" and sig_stars(0.004) == "**"
    assert sig_stars(0.04) == "*" and sig_stars(0.5) == ""
    assert sig_stars(np.nan) == ""


def test_welch_ttest_malformed_channel_logs_and_skips(rng, caplog):
    """An all-NaN channel must yield NaN WITH a logged diagnostic (never a
    silent pass) and must not poison the healthy channels."""
    import logging
    import warnings
    a = rng.standard_normal((6, 2))
    b = rng.standard_normal((6, 2)) + 5.0
    a[:, 0] = np.nan
    with caplog.at_level(logging.WARNING, logger="eegsynth.analysis.ttests"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # scipy SmallSampleWarning
            t, p = welch_ttest_per_channel(a, b, 2)
    assert np.isnan(t[0]) and np.isnan(p[0])
    assert np.isfinite(t[1]) and p[1] < 0.05
    assert any("channel 0" in r.getMessage() for r in caplog.records)


def test_welch_ttest_raise_path_logs_and_skips(rng, caplog, monkeypatch):
    """Older scipy raises ValueError on degenerate columns — the except path
    must log and leave NaN rather than swallow silently."""
    import logging
    import eegsynth.analysis.ttests as tt

    real_ttest = tt.ttest_ind

    def raising(x, y, **kw):
        if np.isnan(x).all():
            raise ValueError("zero-size array")
        return real_ttest(x, y, **kw)

    monkeypatch.setattr(tt, "ttest_ind", raising)
    a = rng.standard_normal((6, 2))
    b = rng.standard_normal((6, 2)) + 5.0
    a[:, 0] = np.nan
    with caplog.at_level(logging.WARNING, logger="eegsynth.analysis.ttests"):
        t, p = tt.welch_ttest_per_channel(a, b, 2)
    assert np.isnan(t[0]) and np.isnan(p[0])
    assert np.isfinite(t[1]) and p[1] < 0.05
    assert any("skipping channel 0" in r.getMessage() for r in caplog.records)


def test_paired_ttest_malformed_channel_logs_and_skips(rng, caplog):
    import logging
    import warnings
    from eegsynth.analysis.ttests import paired_ttest_real_vs_fake
    a = rng.standard_normal((6, 2))
    b = rng.standard_normal((6, 2)) + 5.0
    a[:, 0] = np.nan
    with caplog.at_level(logging.WARNING, logger="eegsynth.analysis.ttests"):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            t, p = paired_ttest_real_vs_fake(a, b)
    assert np.isnan(t[0]) and np.isnan(p[0])
    assert np.isfinite(t[1])
    assert any("channel 0" in r.getMessage() for r in caplog.records)


def test_display_scales():
    groups = {"RN": np.full((10, 2), 4.0), "RW": np.full((10, 2), 6.0),
              "SN": np.full((10, 2), 2.0), "SW": np.full((10, 2), 3.0)}
    s = display_scales(groups, "none")
    assert all(v == 1.0 for v in s.values())
    # p95 never UPSCALES (t_test_v2.py:134: scale only when synth > 1.5*real):
    # here synthetic p95 (3) < real p95 (6) so the scale stays 1.0
    s = display_scales(groups, "p95")
    np.testing.assert_allclose(s["SN"], 1.0)
    # trigger case: synth p95 = 30 > 1.5*6 → scale to 1.5*real/synth
    big = {**groups, "SN": np.full((10, 2), 30.0), "SW": np.full((10, 2), 30.0)}
    s = display_scales(big, "p95")
    np.testing.assert_allclose(s["SN"], 1.5 * 6.0 / 30.0)
    # floor: enormous synthetic clamps at MIN_SCALE=0.05
    huge = {**groups, "SN": np.full((10, 2), 1e4), "SW": np.full((10, 2), 1e4)}
    np.testing.assert_allclose(display_scales(huge, "p95")["SN"], 0.05)
    s = display_scales(groups, "median")
    np.testing.assert_allclose(s["SN"], 2.0)   # RN median 4 / SN median 2
    np.testing.assert_allclose(s["SW"], 2.0)   # RW 6 / SW 3
    # zero real median must not zero the bars (t_test_v3.py:128 guard)
    zr = {**groups, "RN": np.zeros((10, 2))}
    np.testing.assert_allclose(display_scales(zr, "median")["SN"], 1.0)


def test_reorder_and_group_channels():
    names = ["O1", "AF3", "T7", "weird"]
    ordered, arr = reorder_by_region(names, np.arange(4))
    assert ordered[0] == "AF3" and "weird" in ordered
    on, oi, bounds = order_channels_grouped(names)
    assert on[0] == "AF3"
    regions = [b[0] for b in bounds]
    assert "Frontal" in regions and "Other" in regions


def test_participant_fatigue_units(rng):
    x = rng.standard_normal((256, 3))
    tbr = compute_fatigue_tbr(x, 128.0)
    assert tbr.shape == (3,) and (tbr > 0).all()
    # remap: eeg.af3-style names land in canonical slots
    v = remap_to_14_channels(np.array([1.0, 2.0]), ["eeg.af3", "eeg.af4"])
    assert v[0] == 1.0 and v[13] == 2.0 and np.isnan(v[1:13]).all()


def test_subsample_to_count(rng):
    # reference `take` (mental_fatigue_t_test.py:270-277): NaN-row drop, then
    # sample k rows without replacement; keep all when fewer; empty on k<=0
    from eegsynth.analysis.participant_fatigue import _subsample_to_count
    M = rng.standard_normal((10, 3))
    M[4] = np.nan  # all-NaN row must be dropped before counting
    out = _subsample_to_count(M, 4, np.random.RandomState(0))
    assert out.shape == (4, 3) and not np.isnan(out).any()
    # rows come from M without replacement (all distinct)
    assert len({tuple(r) for r in out}) == 4
    # fewer rows than k → keep all 9 non-NaN rows
    out = _subsample_to_count(M, 50, np.random.RandomState(0))
    assert out.shape == (9, 3)
    assert _subsample_to_count(M, 0, np.random.RandomState(0)).shape == (0, 3)
    allnan = np.full((3, 2), np.nan)
    assert _subsample_to_count(allnan, 2, np.random.RandomState(0)).shape[0] == 0


def test_viz_smoke(tmp_path, rng):
    from eegsynth.viz.cluster import cluster_figures
    from eegsynth.viz.traces import estimate_prefix_to_trim, plot_pair

    pairs = {(1, "no_exo"): (rng.uniform(0, 1, (12, 64, 3)).astype(np.float32),
                             rng.uniform(0, 1, (12, 64, 3)).astype(np.float32)),
             (2, "with_exo"): (rng.uniform(0, 1, (10, 64, 3)).astype(np.float32),
                               rng.uniform(0, 1, (10, 64, 3)).astype(np.float32))}
    cluster_figures(pairs, tmp_path, color_scheme="18", tsne_perplexity=5.0,
                    zooms=True, separate_legend=True)
    assert (tmp_path / "pca_combined.png").exists()
    assert (tmp_path / "tsne_combined.png").exists()
    assert (tmp_path / "pca_combined_legend.png").exists()
    assert (tmp_path / "zoom_p1_no_exo_pca.png").exists()
    assert (tmp_path / "zoom_p1_no_exo_tsne.png").exists()

    real, fake = pairs[(1, "no_exo")]
    L = plot_pair(real, fake, ["a", "b", "c"], 128.0, tmp_path, "t", n_samples=2)
    assert (tmp_path / "samples_t.png").exists()
    assert (tmp_path / "summary_t.png").exists()
    assert 0 <= L <= 64
    # warm-up detection: fake with a large constant prefix gets trimmed
    warm = fake.copy()
    warm[:, :20, :] += 5.0
    assert estimate_prefix_to_trim(warm) > 0


def test_lenient_checkpoint_loader(tmp_path):
    import jax
    from eegsynth.train.checkpoint import load_checkpoint, save_checkpoint
    tree = {"a": np.ones(3), "b": np.zeros(2)}
    save_checkpoint(tmp_path / "c.npz", {"model": tree}, {"x": 1})
    bigger = {"a": np.zeros(3), "b": np.ones(2), "c": np.full(4, 7.0)}
    with pytest.raises(KeyError):
        load_checkpoint(tmp_path / "c.npz", {"model": bigger})
    trees, meta = load_checkpoint(tmp_path / "c.npz", {"model": bigger}, strict=False)
    np.testing.assert_array_equal(trees["model"]["a"], np.ones(3))
    np.testing.assert_array_equal(trees["model"]["c"], np.full(4, 7.0))