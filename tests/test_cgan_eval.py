"""CGAN eval metric oracles + driver artifact contract."""

import numpy as np
import pytest

from eegsynth.eval.cgan_eval import (
    _acf_avg, _coh_avg, _psd_avg, evaluate_condition, psd_features,
)


def test_psd_features_matches_numpy(rng):
    X = rng.standard_normal((5, 14, 768)).astype(np.float32)
    N, C, T = X.shape
    F = np.fft.rfft(X, axis=2)
    P = np.log((F.real**2 + F.imag**2) / (T / 2.0 + 1e-8) + 1e-6)
    pool = P.shape[2] // 64
    ref = P[:, :, :pool * 64].reshape(N, C, 64, pool).mean(-1).reshape(N, C * 64)
    ours = psd_features(X)
    assert ours.shape == (5, 14 * 64)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_acf_avg_matches_loop(rng):
    X = rng.standard_normal((4, 3, 100)).astype(np.float64)
    Xc = X - X.mean(axis=2, keepdims=True)
    ref = np.stack([
        np.array([np.mean(Xc[:, ch, :-k] * Xc[:, ch, k:]) for k in range(1, 33)])
        for ch in range(3)])
    np.testing.assert_allclose(_acf_avg(X, max_lag=32), ref, atol=1e-10)


def test_coh_psd_avg_shapes(rng):
    X = rng.standard_normal((6, 14, 128)).astype(np.float32)
    assert _psd_avg(X).shape == (14, 65)
    coh = _coh_avg(X)
    assert coh.shape == (4, 65)
    assert (coh >= 0).all() and (coh <= 1.0 + 1e-5).all()


def test_evaluate_condition_artifacts(tmp_path, rng):
    Xr = rng.uniform(0, 1, (60, 14, 128)).astype(np.float32)
    Xg = rng.uniform(0, 1, (60, 14, 128)).astype(np.float32)
    yr = np.repeat(np.arange(1, 4), 20)
    yg = np.repeat(np.arange(1, 4), 20)
    evaluate_condition(Xr, yr, Xg, yg, tmp_path, perplexity=10.0)
    for name in ("metrics_discriminative.csv", "metrics_predictive.csv",
                 "metrics_stats.csv", "pca_scatter.png", "tsne_scatter.png",
                 "tsne_real_gen.png"):
        assert (tmp_path / name).exists(), name
    import csv
    rows = list(csv.DictReader(open(tmp_path / "metrics_stats.csv")))
    assert rows[0]["level"] == "global"
    assert float(rows[0]["psd_l1"]) >= 0
    # lag counts clamp to T-1: at T=128 the ACF L1 used to be inf (lag-128
    # count is zero) — every stats column must be finite
    for r in rows:
        for k in ("psd_l1", "acf_l1", "coh_l1"):
            assert np.isfinite(float(r[k])), (r["level"], k)
