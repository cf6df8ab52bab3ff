"""PCA / t-SNE cluster visualization family.

Rebuild of timeGAN/visualization*.py (5 variants, ~1.1 kLoC) and the CGAN twins
(CGAN/visualization_v2.py, visualization_36_clusters_zoom.py) as one
parameterized module:

- flatten → winsorize 0.5–99.5% quantiles → z-score (visualization.py:50-60)
- PCA-2D everywhere; PCA-``pca_keep``→t-SNE on a balanced ≤``tsne_max``
  subsample (visualization.py:62-76,160-170)
- 36-color (posture × condition × domain) or 18-color (posture × condition)
  HSV palettes; real='o', gen='x' markers (visualization.py:79-104)
- compact in-figure legend, optional separate legend PNG
  (visualization_with_legends.py capability)
- per-(posture, condition) zoom figures preserving global colors
  (visualization_v2.py / visualization_36_clusters_zoom.py capability)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def winsorize(X: np.ndarray, lo: float = 0.005, hi: float = 0.995) -> np.ndarray:
    low = np.quantile(X, lo, axis=0)
    high = np.quantile(X, hi, axis=0)
    return np.clip(X, low, high)


def zscore(X: np.ndarray) -> np.ndarray:
    from sklearn.preprocessing import StandardScaler
    return StandardScaler().fit_transform(X)


def balanced_subsample(X, P, D, C, max_total: int = 6000, seed: int = 0):
    """Per-(posture, condition, domain) balanced cap (visualization.py:62-76)."""
    if len(X) <= max_total:
        return X, P, D, C
    rng = np.random.RandomState(seed)
    idxs = []
    posts = np.unique(P)
    for p in posts:
        for c in ("with_exo", "no_exo"):
            for d in (1, 0):
                m = (P == p) & (C == c) & (D == d)
                if not np.any(m):
                    continue
                take = min(max_total // (len(posts) * 2 * 2), m.sum())
                idxs.append(rng.choice(np.where(m)[0], size=take, replace=False))
    idx = np.concatenate(idxs) if idxs else np.arange(len(X))
    return X[idx], P[idx], D[idx], C[idx]


def make_palette(n: int, cmap_name: str = "hsv"):
    import matplotlib
    cmap = matplotlib.colormaps.get_cmap(cmap_name).resampled(n)
    return [cmap(i) for i in range(n)]


def cluster_id(posture: int, cond: str, domain: int, color_scheme: str = "36",
               dark_posture: int | None = None) -> int:
    """36: unique color per posture×cond×domain; 18: per posture×cond
    (visualization.py:85-93). ``dark_posture`` forces that posture onto the
    low palette indices — the darker hsv colors — the cosmetic bias the
    visualization_color_scheme*.py variants apply to posture 2."""
    p = posture - 1
    c = 0 if cond == "with_exo" else 1
    if color_scheme == "36":
        if posture == dark_posture:
            return c * 2 + (0 if domain == 1 else 1)
        return p * 4 + c * 2 + (0 if domain == 1 else 1)
    if posture == dark_posture:
        return c
    return p * 2 + c


def scatter_clusters(ax, emb, P, D, C, colors, color_scheme: str = "36",
                     point_size: float = 9, dark_posture: int | None = None):
    for p in np.unique(P):
        for c in ("with_exo", "no_exo"):
            for d in (1, 0):
                m = (P == p) & (C == c) & (D == d)
                if not np.any(m):
                    continue
                gid = cluster_id(p, c, d, color_scheme, dark_posture)
                label = f"P{p} {'W' if c == 'with_exo' else 'N'} {'R' if d == 1 else 'G'}"
                ax.scatter(emb[m, 0], emb[m, 1], s=point_size, alpha=0.8,
                           marker=("o" if d == 1 else "x"), c=[colors[gid]],
                           label=label)


def _compact_legend(ax, ncols=3, fontsize=5.2):
    return ax.legend(bbox_to_anchor=(1.02, 1), loc="upper left", ncol=ncols,
                     fontsize=fontsize, frameon=False, borderaxespad=0.0,
                     columnspacing=0.7, handlelength=1.2, handletextpad=0.3,
                     markerscale=0.9)


def add_paired_legend(ax, colors, color_scheme: str = "36",
                      fontsize: float = 5.6, dark_posture: int | None = None):
    """2-column (Real, Synthetic) legend enumerating all posture×condition rows
    (visualization_color_scheme_paired_legend.py:123-150; CGAN twin
    visualization_36_clusters_zoom.py:175-193). Enumerates postures 1..9 ×
    both conditions regardless of which combinations are present, matching the
    reference's fixed layout."""
    from matplotlib.lines import Line2D
    handles, labels = [], []
    for p in range(1, 10):
        for cond in ("no_exo", "with_exo"):
            nm = "No exo" if cond == "no_exo" else "With exo"
            gid_r = cluster_id(p, cond, 1, color_scheme, dark_posture)
            handles.append(Line2D([], [], linestyle="None", marker="o",
                                  markersize=5, color=colors[gid_r]))
            labels.append(f"P-{p} {nm} Real")
            gid_g = cluster_id(p, cond, 0, color_scheme, dark_posture)
            handles.append(Line2D([], [], linestyle="None", marker="x",
                                  markersize=5, color=colors[gid_g]))
            labels.append(f"P-{p} {nm} Syn")
    return ax.legend(handles, labels, ncol=2, fontsize=fontsize, frameon=False,
                     loc="upper left", bbox_to_anchor=(1.02, 1),
                     borderaxespad=0.0, columnspacing=1.0, handlelength=1.2,
                     handletextpad=0.5, markerscale=1.0)


def zoom_pair_figures(X, P, D, C, colors, p, cond, out_dir,
                      color_scheme: str = "36", seed: int = 0,
                      pca_keep: int = 50, tsne_perplexity: float = 30.0,
                      dark_posture: int | None = None) -> bool:
    """Per-(posture, condition) zoom pair with FRESH subset embeddings
    (visualization_v2.py:111-140; CGAN twin plot_zoom_pair
    visualization_36_clusters_zoom.py:237-283): PCA-2 and PCA-K→t-SNE are
    recomputed on the subset — not sliced out of the global embedding — so the
    zoom shows the pair's local structure. Writes zoom_p{p}_{cond}_pca.png and
    zoom_p{p}_{cond}_tsne.png at dpi 180."""
    plt = _plt()
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    ms = (P == p) & (C == cond)
    if not np.any(ms):
        return False
    Xs, Ds = X[ms], D[ms]
    n = len(Xs)
    gid_r = cluster_id(p, cond, 1, color_scheme, dark_posture)
    gid_g = cluster_id(p, cond, 0, color_scheme, dark_posture)
    nm = f"P{p} {'W' if cond == 'with_exo' else 'N'}"

    def save(emb, kind, title):
        fig, ax = plt.subplots(figsize=(6.0, 4.6))
        ri = Ds == 1
        if np.any(ri):
            ax.scatter(emb[ri, 0], emb[ri, 1], s=14, alpha=0.9, marker="o",
                       c=[colors[gid_r]], label=f"{nm} R")
        if np.any(~ri):
            ax.scatter(emb[~ri, 0], emb[~ri, 1], s=14, alpha=0.9, marker="x",
                       c=[colors[gid_g]], label=f"{nm} G")
        ax.set_title(title)
        ax.set_xlabel("Dim 1")
        ax.set_ylabel("Dim 2")
        ax.legend(loc="best", fontsize=8, frameon=False)
        fig.tight_layout()
        fig.savefig(Path(out_dir) / f"zoom_p{p}_{cond}_{kind}.png", dpi=180)
        plt.close(fig)

    k2 = min(2, n, Xs.shape[1])
    pca2 = PCA(n_components=k2, random_state=seed).fit_transform(Xs)
    if pca2.shape[1] < 2:  # degenerate 1-sample subset; reference would crash
        pca2 = np.concatenate([pca2, np.zeros((n, 2 - pca2.shape[1]))], axis=1)
    save(pca2, "pca", f"ZOOM PCA: P{p} – {cond} (●R, ×G)")

    if n < 2:  # t-SNE needs ≥2 samples (sklearn requires perplexity < n);
        # emit the tsne artifact from the padded PCA embedding so the
        # zoom_p{p}_{cond}_{pca,tsne}.png file contract still holds
        save(pca2, "tsne", f"ZOOM t-SNE: P{p} – {cond} (●R, ×G)")
        return True

    K = min(pca_keep, Xs.shape[1], max(2, n - 1))
    Xred = PCA(n_components=K, random_state=seed).fit_transform(Xs)
    # reference safe-perplexity formula, plus sklearn's hard bound perp < n
    perp = min(tsne_perplexity, max(5, n // 3), max(1, n - 1))
    ts2 = TSNE(n_components=2, perplexity=perp, init="pca",
               random_state=seed).fit_transform(Xred)
    save(ts2, "tsne", f"ZOOM t-SNE: P{p} – {cond} (●R, ×G)")
    return True


def tsne_embed(X, seed: int, pca_keep: int = 50, perplexity: float = 30.0):
    """PCA-reduce to ≤``pca_keep`` dims then t-SNE to 2-D (the shared tail of
    every cluster-figure flow, visualization.py:142-150 /
    visualization_36_clusters_zoom.py:318-326), with the clamps the reference
    omits: K ≤ n−1/dims (PCA validity), perplexity < n (sklearn hard bound),
    and the legacy-sklearn fallback for ``learning_rate="auto"``."""
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    n = len(X)
    if n < 2:  # t-SNE needs perplexity < n; mirror zoom_pair_figures' pad
        return np.zeros((n, 2), np.float32)
    K = min(pca_keep, X.shape[1], max(2, n - 1))
    Xred = PCA(n_components=K, random_state=seed).fit_transform(X)
    kw = dict(n_components=2, perplexity=min(perplexity, max(1, n - 1)),
              init="pca", random_state=seed)
    try:
        return TSNE(learning_rate="auto", **kw).fit_transform(Xred)
    except TypeError:  # older sklearn without learning_rate="auto"
        return TSNE(learning_rate=200.0, **kw).fit_transform(Xred)


def save_legend_png(handles_labels, out_path, ncols=4):
    """Separate legend figure (visualization_with_legends.py capability)."""
    plt = _plt()
    handles, labels = handles_labels
    fig = plt.figure(figsize=(8, max(2, len(labels) / (ncols * 4))))
    fig.legend(handles, labels, loc="center", ncol=ncols, fontsize=7,
               frameon=False)
    fig.savefig(out_path, dpi=170, bbox_inches="tight")
    plt.close(fig)


def cluster_figures(pairs: dict, out_dir, color_scheme: str = "36", seed: int = 0,
                    tsne_perplexity: float = 30.0, tsne_max: int = 6000,
                    pca_keep: int = 50, winsor_low: float = 0.005,
                    winsor_high: float = 0.995, zooms: bool = False,
                    separate_legend: bool = False,
                    paired_legend: bool = False,
                    dark_posture: int | None = None) -> None:
    """Full cluster-figure pass over {(posture, cond): (real, fake)} pairs.

    Writes pca_combined.png + tsne_combined.png; with ``zooms``, per-(posture,
    condition) zoom_p{p}_{cond}_{pca,tsne}.png figures with fresh subset
    embeddings and global colors; with ``separate_legend``, standalone legend
    PNGs; with ``paired_legend``, the fixed 2-column (Real, Synthetic)
    enumeration legend instead of the compact per-scatter one; with
    ``dark_posture``, that posture takes the low (darker) palette indices
    (the visualization_color_scheme*.py posture-2 bias).
    """
    plt = _plt()
    from sklearn.decomposition import PCA

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    X_blocks, P, D, C = [], [], [], []
    for (p, c), (r, f) in sorted(pairs.items()):
        X_blocks.append(np.concatenate([r, f], axis=0))
        P += [p] * (len(r) + len(f))
        D += [1] * len(r) + [0] * len(f)
        C += [c] * (len(r) + len(f))
    P, D, C = np.array(P), np.array(D), np.array(C)

    X = np.concatenate(X_blocks, axis=0).reshape(len(P), -1)
    X = zscore(winsorize(X, winsor_low, winsor_high))

    n_colors = 36 if color_scheme == "36" else 18
    colors = make_palette(n_colors)

    def one_plot(emb, Pm, Dm, Cm, name, title):
        fig, ax = plt.subplots(figsize=(8.6, 5.8))
        scatter_clusters(ax, emb, Pm, Dm, Cm, colors, color_scheme,
                         dark_posture=dark_posture)
        ax.set_title(title)
        ax.set_xlabel("Dim 1")
        ax.set_ylabel("Dim 2")
        fig.subplots_adjust(right=0.78)
        if separate_legend:
            save_legend_png(ax.get_legend_handles_labels(),
                            out_dir / f"{name}_legend.png")
        elif paired_legend:
            add_paired_legend(ax, colors, color_scheme,
                              dark_posture=dark_posture)
        else:
            _compact_legend(ax)
        fig.savefig(out_dir / f"{name}.png", dpi=170)
        plt.close(fig)

    pca2 = PCA(n_components=2, random_state=seed).fit_transform(X)
    one_plot(pca2, P, D, C, "pca_combined",
             "Combined PCA: Posture×Condition (● Real, × Gen)")

    Xb, Pb, Db, Cb = balanced_subsample(X, P, D, C, max_total=tsne_max, seed=seed)
    ts2 = tsne_embed(Xb, seed, pca_keep=pca_keep, perplexity=tsne_perplexity)
    one_plot(ts2, Pb, Db, Cb, "tsne_combined",
             "Combined t-SNE: Posture×Condition (● Real, × Gen)")

    if zooms:
        # fresh subset embeddings on the full preprocessed X, one pair of
        # figures per (posture, condition) present (visualization_v2.py:202-208)
        for (p, c) in sorted(pairs):
            zoom_pair_figures(X, P, D, C, colors, p, c, out_dir,
                              color_scheme=color_scheme, seed=seed,
                              pca_keep=pca_keep,
                              tsne_perplexity=tsne_perplexity,
                              dark_posture=dark_posture)
