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


def test_discriminative_v2_split_reproduces_reference_bug(tmp_path, rng):
    """--v2-split replays eval_cgan_v2.py:169-201's positional per-posture
    selection. Oracle: a direct NumPy port of the v2 code (mask the interleaved
    driver-built y_posture vector positionally against the stacked features)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import accuracy_score, roc_auc_score
    from sklearn.model_selection import train_test_split
    from sklearn.preprocessing import StandardScaler

    from eegsynth.eval.cgan_eval import discriminative_metrics, psd_features

    # two postures with DIFFERENT counts → interleaved vector misaligns
    nr = {1: 30, 2: 44}
    ng = {1: 30, 2: 44}
    Xr = np.concatenate([rng.uniform(0, 1, (nr[p], 6, 64)) for p in (1, 2)]).astype(np.float32)
    Xg = np.concatenate([rng.uniform(0.2, 1.2, (ng[p], 6, 64)) for p in (1, 2)]).astype(np.float32)
    yr = np.concatenate([np.full(nr[p], p) for p in (1, 2)]).astype(np.int64)
    yg = np.concatenate([np.full(ng[p], p) for p in (1, 2)]).astype(np.int64)

    rows_v2 = discriminative_metrics(Xr, Xg, yr, yg, tmp_path / "v2.csv",
                                     seed=123, v2_split=True)
    rows_v3 = discriminative_metrics(Xr, Xg, yr, yg, tmp_path / "v3.csv",
                                     seed=123)

    # oracle port of the reference v2 flow (driver builds y_posture
    # interleaved per posture, metrics mask it positionally)
    Fr, Fg = psd_features(Xr), psd_features(Xg)
    X = np.vstack([Fr, Fg])
    y = np.hstack([np.zeros(len(Fr), np.int64), np.ones(len(Fg), np.int64)])
    Xs = np.nan_to_num(StandardScaler().fit_transform(X), nan=0.0, posinf=0.0,
                       neginf=0.0)
    y_v2 = np.concatenate([np.full(nr[p] + ng[p], p, np.int64) for p in (1, 2)])
    expect = {}
    for p in (1, 2):
        m = y_v2 == p
        Xp, yp = Xs[m], y[m]
        if len(np.unique(yp)) < 2:     # v2's guard (eval_cgan_v2.py:191-192)
            continue
        Xtr, Xte, ytr, yte = train_test_split(Xp, yp, test_size=0.3,
                                              stratify=yp, random_state=123)
        clf = LogisticRegression(max_iter=1000).fit(Xtr, ytr)
        prob = clf.predict_proba(Xte)[:, 1]
        expect[p] = (accuracy_score(yte, (prob > 0.5).astype(int)),
                     roc_auc_score(yte, prob))

    # the bug in action: posture 1's positional block is all-real → v2 skips
    # it (single class), posture 2 scores a misaligned real/gen mixture
    assert set(expect) == {2}
    got = {r["posture"]: (r["acc"], r["auc"]) for r in rows_v2
           if r["level"] == "posture"}
    assert set(got) == set(expect)
    for p in expect:
        np.testing.assert_allclose(got[p], expect[p], atol=1e-12)

    # the global row is split-mode independent; the fixed split scores BOTH
    # postures (correctly aligned) and disagrees with v2 on the shared one
    assert rows_v2[0]["acc"] == rows_v3[0]["acc"]
    got_v3 = {r["posture"]: (r["acc"], r["auc"]) for r in rows_v3
              if r["level"] == "posture"}
    assert set(got_v3) == {1, 2}
    assert got[2] != got_v3[2]
