"""Viz-layer tests: cluster figures (visualization*.py family), trace plots
with warm-up auto-trim (plot_real_vs_syn_all.py:91-115), preprocessing-stage
figures (preprocessing_plots.py) — smoke-driven on tiny data plus unit oracles
for the numeric helpers."""

import numpy as np
import pytest

from eegsynth.viz.cluster import (
    balanced_subsample, cluster_figures, cluster_id, winsorize, zscore,
)
from eegsynth.viz.prep_stages import hampel, parse_labels_from_filename
from eegsynth.viz.traces import (
    estimate_prefix_to_trim, plot_pair, smooth_ma, standardize_per_seq,
)


def test_winsorize_clips_to_percentiles(rng):
    X = rng.normal(size=(200, 8))
    W = winsorize(X, 0.05, 0.95)
    lo = np.quantile(X, 0.05, axis=0)
    hi = np.quantile(X, 0.95, axis=0)
    assert np.all(W >= lo - 1e-9) and np.all(W <= hi + 1e-9)
    mid = (X > lo) & (X < hi)
    np.testing.assert_allclose(W[mid], X[mid])


def test_zscore_moments(rng):
    Z = zscore(rng.normal(3.0, 2.0, size=(500, 4)))
    np.testing.assert_allclose(Z.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(Z.std(axis=0), 1.0, atol=1e-6)


def test_cluster_id_schemes():
    # 36-scheme: posture × condition × domain all distinct
    ids36 = {cluster_id(p, c, d, "36")
             for p in range(1, 10) for c in ("no_exo", "with_exo") for d in (0, 1)}
    assert len(ids36) == 36 and min(ids36) >= 0 and max(ids36) < 36
    # 18-scheme: domain folds together (real/gen share a color)
    for p in (1, 5, 9):
        for c in ("no_exo", "with_exo"):
            assert cluster_id(p, c, 0, "18") == cluster_id(p, c, 1, "18")
    ids18 = {cluster_id(p, c, 0, "18")
             for p in range(1, 10) for c in ("no_exo", "with_exo")}
    assert len(ids18) == 18


def test_balanced_subsample_caps_total(rng):
    X = rng.normal(size=(120, 6))
    P = np.repeat([1, 2, 3], 40)
    D = np.tile([0, 1], 60)
    C = np.array(["no_exo"] * 60 + ["with_exo"] * 60)
    Xb, Pb, Db, Cb = balanced_subsample(X, P, D, C, max_total=30, seed=0)
    assert len(Xb) <= 30 and len(Xb) == len(Pb) == len(Db) == len(Cb)
    # every (posture, domain) group that existed keeps representation
    for p in (1, 2, 3):
        assert np.any(Pb == p)


def test_cluster_figures_smoke(tmp_path, rng):
    pairs = {
        (1, "no_exo"): (rng.normal(size=(20, 16, 3)).astype(np.float32),
                        rng.normal(size=(20, 16, 3)).astype(np.float32)),
        (2, "with_exo"): (rng.normal(size=(20, 16, 3)).astype(np.float32),
                          rng.normal(size=(20, 16, 3)).astype(np.float32)),
    }
    cluster_figures(pairs, tmp_path, color_scheme="36", tsne_perplexity=5.0,
                    tsne_max=80, zooms=True, separate_legend=True)
    assert (tmp_path / "pca_combined.png").exists()
    assert (tmp_path / "tsne_combined.png").exists()
    assert (tmp_path / "pca_combined_legend.png").exists()
    # reference zoom contract (visualization_v2.py:124,139): one pca + one
    # tsne zoom per (posture, condition), fresh subset embeddings
    for p, cond in ((1, "no_exo"), (2, "with_exo")):
        assert (tmp_path / f"zoom_p{p}_{cond}_pca.png").exists()
        assert (tmp_path / f"zoom_p{p}_{cond}_tsne.png").exists()
    # paired-legend mode renders without error
    cluster_figures(pairs, tmp_path / "paired", color_scheme="18",
                    tsne_perplexity=5.0, tsne_max=80, paired_legend=True)
    assert (tmp_path / "paired" / "pca_combined.png").exists()


def test_standardize_per_seq(rng):
    X = rng.normal(5.0, 3.0, size=(4, 64, 2)).astype(np.float32)
    Z = standardize_per_seq(X)
    np.testing.assert_allclose(Z.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(Z.std(axis=1), 1.0, atol=1e-4)


def test_smooth_ma_constant_invariant():
    X = np.full((2, 32, 3), 7.0, np.float32)
    np.testing.assert_allclose(smooth_ma(X, 5), X, atol=1e-6)


def test_estimate_prefix_trim_detects_warmup(rng):
    T = 256
    clean = rng.normal(size=(8, T, 4)).astype(np.float32)
    warm = clean.copy()
    warm[:, :48, :] += 25.0  # large DC warm-up artifact in the prefix
    L_warm = estimate_prefix_to_trim(warm)
    L_clean = estimate_prefix_to_trim(clean)
    assert L_warm > 0
    assert L_warm >= L_clean
    assert L_warm <= 64  # max_trim contract


def test_plot_pair_smoke(tmp_path, rng):
    real = rng.normal(size=(6, 96, 4)).astype(np.float32)
    fake = rng.normal(size=(8, 96, 4)).astype(np.float32)
    L = plot_pair(real, fake, ["AF3", "F7", "F3", "FC5"], 128.0, tmp_path,
                  "p1_no_exo", n_samples=2, smooth=3)
    assert isinstance(L, int) and 0 <= L <= 64
    assert (tmp_path / "samples_p1_no_exo.png").exists()
    assert (tmp_path / "summary_p1_no_exo.png").exists()


def test_hampel_removes_spikes(rng):
    x = np.sin(np.linspace(0, 20, 512)).astype(np.float64)
    x_sp = x.copy()
    x_sp[[50, 200, 400]] = 40.0
    y = hampel(x_sp, k=11, t0=5.0)
    assert np.max(np.abs(y)) < 5.0          # spikes gone
    keep = np.ones(512, bool)
    keep[[50, 200, 400]] = False
    np.testing.assert_allclose(y[keep], x_sp[keep])  # non-spikes untouched


def test_parse_labels_from_filename():
    meta = parse_labels_from_filename(
        "Posture-3-con-1-overhead-fatigue-without "
        "exoskeleton-03.08.22_10.22.33_trial2.csv")
    assert meta["posture"].endswith("3") or "3" in meta["posture"]
    assert "trial" in meta["trial"].lower() or "2" in meta["trial"]
    assert isinstance(meta["condition"], str) and meta["condition"]
    assert "task" in meta and "state" in meta


def test_cluster_id_dark_posture():
    # visualization_color_scheme.py bias: the dark posture takes indices 0..3
    # (36 scheme) / 0..1 (18 scheme); other postures keep their slots
    assert cluster_id(2, "with_exo", 1, "36", dark_posture=2) == 0
    assert cluster_id(2, "no_exo", 0, "36", dark_posture=2) == 3
    assert cluster_id(3, "with_exo", 1, "36", dark_posture=2) == 8
    assert cluster_id(2, "no_exo", 1, "18", dark_posture=2) == 1
    assert cluster_id(2, "no_exo", 1, "18") == 3


def test_zoom_single_sample_subset(tmp_path, rng):
    """A 1-window (posture, condition) subset must still emit BOTH zoom
    figures: PCA pads the embedding and the t-SNE leg (which sklearn refuses
    for n < 2) reuses it, preserving the zoom_p{p}_{cond}_{pca,tsne}.png
    artifact contract instead of crashing the whole --zooms run."""
    pairs = {
        (1, "no_exo"): (rng.normal(size=(1, 16, 3)).astype(np.float32),
                        np.zeros((0, 16, 3), np.float32)),
        (2, "no_exo"): (rng.normal(size=(8, 16, 3)).astype(np.float32),
                        rng.normal(size=(8, 16, 3)).astype(np.float32)),
    }
    cluster_figures(pairs, tmp_path, tsne_perplexity=5.0, zooms=True)
    for p in (1, 2):
        assert (tmp_path / f"zoom_p{p}_no_exo_pca.png").exists()
        assert (tmp_path / f"zoom_p{p}_no_exo_tsne.png").exists()


def test_tsne_embed_clamps_tiny_inputs(rng):
    """tsne_embed clamps K ≤ n−1 and perplexity < n, so inputs smaller than
    the default perplexity (30) embed instead of raising."""
    from eegsynth.viz.cluster import tsne_embed
    Z = tsne_embed(rng.normal(size=(4, 10)), seed=0, perplexity=30.0)
    assert Z.shape == (4, 2) and np.isfinite(Z).all()
    # n < 2: sklearn refuses both PCA(2) and any perplexity — degenerate pad
    Z1 = tsne_embed(rng.normal(size=(1, 10)), seed=0)
    assert Z1.shape == (1, 2) and np.all(Z1 == 0)


def test_plot_pair_trim_synth_only(tmp_path, rng):
    """trim_both=False (reference TRIM_BOTH toggle) trims only the synthetic
    side; the plots must handle the length mismatch by aligning the shorter
    synthetic trace to the tail of the real axis instead of crashing."""
    real = rng.normal(size=(6, 96, 4)).astype(np.float32)
    fake = rng.normal(size=(6, 96, 4)).astype(np.float32)
    L = plot_pair(real, fake, ["AF3", "F7", "F3", "FC5"], 128.0, tmp_path,
                  "pt", auto_trim=False, fixed_trim=16, trim_both=False,
                  n_samples=2)
    assert L == 16
    assert (tmp_path / "samples_pt.png").exists()
    assert (tmp_path / "summary_pt.png").exists()
