"""CGAN evaluation metrics + drivers (CGAN/eval_cgan.py, eval_cgan_v2/v3.py).

Featurization and spectral statistics run batched on the accelerator; the tiny
classical models (LogisticRegression, Ridge, StandardScaler, t-SNE) stay on
host sklearn for protocol parity. Artifact contract: metrics_discriminative.csv,
metrics_predictive.csv, metrics_stats.csv (+ pca_scatter.png, tsne_scatter.png,
tsne_real_gen.png) per condition (v1) or per posture + global/ (v2/v3).
"""

from __future__ import annotations

import csv
import functools
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from eegsynth.eval.features import psd_features

NUM_POSTURES = 9
FIXED_PAIRS = [(0, 13), (6, 7), (9, 10), (1, 12)]


def _on_cpu(fn):
    """Run the wrapped helper on the CPU backend: it rFFTs T=768 (mixed
    radix), which compiles pathologically slowly through the remote TPU
    tunnel (CLAUDE.md FFT rule). Zero-padding to a power of two would change
    the metric values (reference parity), so these tiny transforms run on
    host instead — _acf_avg stays backend-native because it already pads."""
    @functools.wraps(fn)
    def wrap(*a, **k):
        with jax.default_device(jax.devices("cpu")[0]):
            return fn(*a, **k)
    return wrap


def _write_rows(path, rows):
    if not rows:
        rows = [{}]
    cols = list(rows[0].keys())
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)


def _logreg_acc_auc(Xs, y, seed=123):
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import accuracy_score, roc_auc_score
    from sklearn.model_selection import train_test_split

    Xtr, Xte, ytr, yte = train_test_split(Xs, y, test_size=0.3, stratify=y,
                                          random_state=seed)
    clf = LogisticRegression(max_iter=1000).fit(Xtr, ytr)
    prob = clf.predict_proba(Xte)[:, 1]
    acc = accuracy_score(yte, (prob > 0.5).astype(int))
    try:
        auc = roc_auc_score(yte, prob)
    except ValueError:
        auc = float("nan")
    return acc, auc


def discriminative_metrics(Xr, Xg, yr, yg, out_csv, seed=123, v2_split=False):
    """LogReg real-vs-gen on standardized log-PSD features, global + per posture
    (eval_cgan.py:124-145; per-posture split per eval_cgan_v3.py fix).

    ``v2_split=True`` reproduces eval_cgan_v2.py:169-201's per-posture
    selection INCLUDING its positional bug: the v2 driver builds one
    interleaved ``y_posture`` vector ([p]×(nR_p+nG_p) blocks in posture order,
    eval_cgan_v2.py:404-414) and masks it POSITIONALLY against the stacked
    feature matrix [real rows..., gen rows...], so each "posture" row of the
    global CSV scores a misaligned mixture whenever posture counts differ.
    Requires the caller to pass posture-block-ordered rows (ascending posture),
    which is how both the reference driver and ours assemble the global
    arrays. Default (False) is the v3 fixed split (eval_cgan_v3.py:184-198)."""
    from sklearn.preprocessing import StandardScaler

    Fr, Fg = psd_features(Xr), psd_features(Xg)
    X = np.vstack([Fr, Fg])
    y = np.hstack([np.zeros(len(Fr), np.int64), np.ones(len(Fg), np.int64)])
    y_post = np.hstack([yr, yg])
    Xs = np.nan_to_num(StandardScaler().fit_transform(X), nan=0.0, posinf=0.0,
                       neginf=0.0)
    acc, auc = _logreg_acc_auc(Xs, y, seed)
    rows = [dict(level="global", posture=0, acc=acc, auc=auc)]
    if v2_split:
        # the v2 driver's y_posture: per-posture [p]*(nR_p+nG_p) blocks,
        # np.unique iteration order; no minimum-count guard in the reference
        posts = np.unique(y_post)
        y_v2 = np.concatenate(
            [np.full(int((yr == p).sum() + (yg == p).sum()), p, np.int64)
             for p in posts]) if len(posts) else np.empty(0, np.int64)
        for p in posts:
            m = y_v2 == p
            if len(np.unique(y[m])) < 2:   # v2's only guard (:191-192)
                continue
            acc, auc = _logreg_acc_auc(Xs[m], y[m], seed)
            rows.append(dict(level="posture", posture=int(p), acc=acc, auc=auc))
    else:
        for p in range(1, NUM_POSTURES + 1):
            m = y_post == p
            if m.sum() < 20 or len(np.unique(y[m])) < 2:
                continue
            acc, auc = _logreg_acc_auc(Xs[m], y[m], seed)
            rows.append(dict(level="posture", posture=p, acc=acc, auc=auc))
    _write_rows(out_csv, rows)
    return rows


def _ridge_tstr(X_train, X_test, target_idx, seed=123):
    from sklearn.linear_model import Ridge
    from sklearn.metrics import mean_squared_error, r2_score
    from sklearn.preprocessing import StandardScaler

    C = X_train.shape[1]

    def make_xy(X):
        Xf = X[:, np.arange(C) != target_idx, :].transpose(0, 2, 1).reshape(len(X), -1)
        Y = X[:, target_idx, :].reshape(len(X), -1)
        return Xf.astype(np.float32), Y.astype(np.float32)

    sX, sY = StandardScaler(), StandardScaler()
    Xtr, Ytr = make_xy(X_train)
    Xte, Yte = make_xy(X_test)
    Xtr = np.nan_to_num(sX.fit_transform(Xtr), nan=0.0, posinf=0.0, neginf=0.0)
    Ytr = np.nan_to_num(sY.fit_transform(Ytr), nan=0.0, posinf=0.0, neginf=0.0)
    Xte = np.nan_to_num(sX.transform(Xte), nan=0.0, posinf=0.0, neginf=0.0)
    Yte = np.nan_to_num(sY.transform(Yte), nan=0.0, posinf=0.0, neginf=0.0)
    reg = Ridge(alpha=1.0).fit(Xtr, Ytr)
    Yhat = reg.predict(Xte)
    return (float(np.sqrt(mean_squared_error(Yte, Yhat))),
            float(r2_score(Yte, Yhat)))


def predictive_scores(Xr, Xg, yr, yg, out_csv, target_idx=13, seed=123):
    """Ridge(α=1) predicting the target channel's full trace from the other 13,
    TSTR + TRTS, global + per posture (eval_cgan.py:147-187)."""
    rows = []
    rmse, r2 = _ridge_tstr(Xg, Xr, target_idx, seed)
    rows.append(dict(level="global", posture=0, split="TSTR", rmse=rmse, r2=r2))
    rmse, r2 = _ridge_tstr(Xr, Xg, target_idx, seed)
    rows.append(dict(level="global", posture=0, split="TRTS", rmse=rmse, r2=r2))
    for p in range(1, NUM_POSTURES + 1):
        mr, mg = yr == p, yg == p
        if mr.sum() < 10 or mg.sum() < 10:
            continue
        rmse, r2 = _ridge_tstr(Xg[mg], Xr[mr], target_idx, seed)
        rows.append(dict(level="posture", posture=p, split="TSTR", rmse=rmse, r2=r2))
        rmse, r2 = _ridge_tstr(Xr[mr], Xg[mg], target_idx, seed)
        rows.append(dict(level="posture", posture=p, split="TRTS", rmse=rmse, r2=r2))
    _write_rows(out_csv, rows)
    return rows


@_on_cpu
def _psd_avg(X):
    F = jnp.fft.rfft(jnp.asarray(X), axis=2)
    return np.asarray(jnp.mean(F.real ** 2 + F.imag ** 2, axis=0))


def _acf_avg(X, max_lag=128):
    """(N, C, T) → (C, L): mean_{N,T-k}(xc[:, :-k]·xc[:, k:]) per channel, via one
    FFT autocorrelation (replaces eval_cgan.py:196-200 Python loops)."""
    X = jnp.asarray(X)
    Xc = X - jnp.mean(X, axis=2, keepdims=True)
    T = X.shape[2]
    L = min(max_lag, T - 1)    # lag T has zero valid samples (count 0 → inf)
    n = 1 << (2 * T - 1).bit_length()
    spec = jnp.fft.rfft(Xc, n=n, axis=2)
    cross = jnp.fft.irfft(spec * jnp.conj(spec), n=n, axis=2)[:, :, 1:L + 1]
    counts = (T - jnp.arange(1, L + 1)).astype(X.dtype)
    return np.asarray(jnp.sum(cross, axis=0) / (X.shape[0] * counts)[None, :])


@_on_cpu
def _coh_avg(X, pairs=FIXED_PAIRS):
    X = jnp.asarray(X)
    F = jnp.fft.rfft(X, axis=2)
    out = []
    for i, j in pairs:
        A, B = F[:, i, :], F[:, j, :]
        cross = A * jnp.conj(B)
        num = jnp.sqrt(cross.real ** 2 + cross.imag ** 2)
        den = jnp.sqrt((A.real ** 2 + A.imag ** 2) * (B.real ** 2 + B.imag ** 2) + 1e-8)
        out.append(jnp.mean(num / den, axis=0))
    return np.asarray(jnp.stack(out, 0))


def stats_similarity(Xr, Xg, yr, yg, out_csv):
    """Mean-PSD / mean-ACF / 4-pair coherence L1, global + per posture
    (eval_cgan.py:190-219)."""
    def row(level, posture, R, G):
        return dict(level=level, posture=posture,
                    psd_l1=float(np.mean(np.abs(_psd_avg(R) - _psd_avg(G)))),
                    acf_l1=float(np.mean(np.abs(_acf_avg(R) - _acf_avg(G)))),
                    coh_l1=float(np.mean(np.abs(_coh_avg(R) - _coh_avg(G)))))

    rows = [row("global", 0, Xr, Xg)]
    for p in range(1, NUM_POSTURES + 1):
        mr, mg = yr == p, yg == p
        if mr.sum() < 10 or mg.sum() < 10:
            continue
        rows.append(row("posture", p, Xr[mr], Xg[mg]))
    _write_rows(out_csv, rows)
    return rows


def scatter_plots(Xr, Xg, yr, yg, out_dir, perplexity=30.0, seed=123):
    """PCA + PCA50→t-SNE scatters on log-PSD features (eval_cgan.py:228-241)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    out_dir = Path(out_dir)
    Fr, Fg = psd_features(Xr), psd_features(Xg)
    X = np.nan_to_num(np.vstack([Fr, Fg]), nan=0.0, posinf=0.0, neginf=0.0)
    y = np.hstack([yr, yg])
    src = np.hstack([np.zeros(len(Fr)), np.ones(len(Fg))])

    Zp = PCA(n_components=2, svd_solver="full", random_state=seed).fit_transform(X)
    fig, ax = plt.subplots(figsize=(7, 6))
    m = ax.scatter(Zp[:, 0], Zp[:, 1], c=y, cmap="tab10", s=10, alpha=0.7,
                   edgecolors="none")
    plt.colorbar(m, ax=ax, label="posture")
    ax.set_title("PCA (color=posture)")
    plt.savefig(out_dir / "pca_scatter.png", dpi=150, bbox_inches="tight")
    plt.close()

    X50 = PCA(n_components=min(50, X.shape[1] - 1), svd_solver="full",
              random_state=seed).fit_transform(X)
    # old/new-sklearn support (eval_cgan.py:222-227): retry with the legacy
    # numeric learning_rate on TypeError so the two t-SNE PNGs are always
    # part of the artifact set rather than silently skipped
    try:
        Z = TSNE(n_components=2, perplexity=perplexity, init="pca",
                 learning_rate="auto", random_state=seed).fit_transform(X50)
    except (TypeError, ValueError):
        Z = TSNE(n_components=2, perplexity=perplexity, init="pca",
                 learning_rate=200.0, random_state=seed).fit_transform(X50)
    fig, ax = plt.subplots(figsize=(7, 6))
    m = ax.scatter(Z[:, 0], Z[:, 1], c=y, cmap="tab10", s=8, alpha=0.7,
                   edgecolors="none")
    plt.colorbar(m, ax=ax, label="posture")
    ax.set_title("t-SNE (color=posture)")
    plt.savefig(out_dir / "tsne_scatter.png", dpi=150, bbox_inches="tight")
    plt.close()
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.scatter(Z[src == 0, 0], Z[src == 0, 1], c="C0", s=8, alpha=0.6, label="real")
    ax.scatter(Z[src == 1, 0], Z[src == 1, 1], c="C3", s=8, alpha=0.6, label="gen")
    ax.legend()
    ax.set_title("t-SNE (real vs gen)")
    plt.savefig(out_dir / "tsne_real_gen.png", dpi=150, bbox_inches="tight")
    plt.close()


def evaluate_condition(Xr, yr, Xg, yg, out_dir, perplexity=30.0, seed=123):
    """One condition's full CSV trio + scatter set (eval_cgan.py:243-260)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    discriminative_metrics(Xr, Xg, yr, yg, out_dir / "metrics_discriminative.csv",
                           seed)
    predictive_scores(Xr, Xg, yr, yg, out_dir / "metrics_predictive.csv", seed=seed)
    stats_similarity(Xr, Xg, yr, yg, out_dir / "metrics_stats.csv")
    scatter_plots(Xr, Xg, yr, yg, out_dir, perplexity, seed)
