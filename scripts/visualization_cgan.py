#!/usr/bin/env python3
"""36-cluster PCA/t-SNE figures for the per-posture CGAN family.

Contract of CGAN/visualization_36_clusters_zoom.py: synthesize from the
per-posture generators ("match" real counts), embed 64-bin log-PSD features
(global StandardScaler, nan_to_num), write global pca_36.png / tsne_36.png
with the fixed paired legend (:330-353), plus zooms/zoom_p{p}_{cond}_
{pca,tsne}.png with FRESH per-(posture,condition) subset embeddings
(:237-283). CGAN/visualization_v2.py is the same flow without the zooms
(covered by --no-zooms).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COND_NAME = {0: "no_exo", 1: "with_exo"}


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--data-dir", type=str, default="./preprocessed")
    ap.add_argument("--runs-root", type=str, default="./cgan_runs_posture")
    ap.add_argument("--out", type=str, default="./cgan_viz_out")
    ap.add_argument("--postures", type=str, default="all")
    ap.add_argument("--samples-per-cond", type=str, default="match",
                    help='"match" real counts or an integer')
    ap.add_argument("--tsne-perplexity", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--no-zooms", action="store_true",
                    help="global figures only (visualization_v2.py contract)")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend — the tiny generators and "
                         "host-side sklearn run fine without the TPU")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.decomposition import PCA

    from eegsynth.data.datasets import load_posture_both_conditions
    from eegsynth.eval.features import psd_features
    from eegsynth.train.cgan import generate_batch, load_generator
    from eegsynth.viz.cluster import (
        add_paired_legend, make_palette, scatter_clusters, tsne_embed,
        zoom_pair_figures, zscore,
    )

    np.random.seed(args.seed)
    postures = (range(1, 10) if args.postures == "all"
                else [int(p) for p in args.postures.split(",")])
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    feats, P, D, C = [], [], [], []
    key = jax.random.key(args.seed)
    for p in postures:
        try:
            X, y, meta = load_posture_both_conditions(args.data_dir, p)
        except SystemExit:  # loader raises on a missing condition NPZ
            print(f"[posture {p}] real NPZs missing; skipping")
            continue
        real = {c: X[y == c] for c in (0, 1)}

        run_dir = Path(args.runs_root) / f"posture{p}"
        gpath = run_dir / f"CGAN_generator_posture{p}_best.npz"
        if not gpath.exists():
            gpath = run_dir / f"CGAN_generator_posture{p}_last.npz"
        if not gpath.exists():
            print(f"[posture {p}] no generator found under {run_dir}; skipping")
            continue
        G, bn, cfg, _ = load_generator(gpath, num_classes=2, variant="v2")

        if args.samples_per_cond.lower() == "match":
            n_synth = min(real[0].shape[0], real[1].shape[0])
        else:
            n_synth = int(args.samples_per_cond)
        n = min(real[0].shape[0], real[1].shape[0], n_synth)
        if n == 0:
            print(f"[posture {p}] a condition has no real data; skipping")
            continue
        for c in (0, 1):
            key, sub = jax.random.split(key)
            fake = np.asarray(generate_batch(G, bn, cfg, sub, n, c))
            Fr, Fg = psd_features(real[c][:n]), psd_features(fake)
            feats.extend([Fr, Fg])
            P += [p] * (len(Fr) + len(Fg))
            D += [1] * len(Fr) + [0] * len(Fg)
            C += [COND_NAME[c]] * (len(Fr) + len(Fg))
        print(f"[posture {p}] featurized ({n} per condition per domain)")

    if not feats:
        raise SystemExit("No (real data, generator) pairs found.")
    P, D, C = np.array(P), np.array(D), np.array(C)
    X = np.nan_to_num(zscore(np.vstack(feats)), nan=0.0, posinf=0.0, neginf=0.0)
    colors = make_palette(36)

    def one_plot(emb, name, title):
        fig, ax = plt.subplots(figsize=(8.6, 5.8))
        scatter_clusters(ax, emb, P, D, C, colors, "36")
        ax.set_title(title)
        ax.set_xlabel("Dim 1")
        ax.set_ylabel("Dim 2")
        fig.subplots_adjust(right=0.78)
        add_paired_legend(ax, colors, "36")
        fig.savefig(out_dir / f"{name}.png", dpi=170)
        plt.close(fig)

    pca2 = PCA(n_components=2, random_state=args.seed).fit_transform(X)
    one_plot(pca2, "pca_36", "PCA: 9 Postures × 2 Conditions × {Real, Synthetic}")

    Z = tsne_embed(X, args.seed, pca_keep=50, perplexity=args.tsne_perplexity)
    one_plot(Z, "tsne_36", "t-SNE: 9 Postures × 2 Conditions × {Real, Synthetic}")

    if not args.no_zooms:
        out_zoom = out_dir / "zooms"
        out_zoom.mkdir(parents=True, exist_ok=True)
        for p in sorted(set(P.tolist())):
            for cond in ("no_exo", "with_exo"):
                zoom_pair_figures(X, P, D, C, colors, p, cond, out_zoom,
                                  color_scheme="36", seed=args.seed,
                                  pca_keep=50,
                                  tsne_perplexity=args.tsne_perplexity)
    print(f"Saved global and zoom plots to {out_dir}")


if __name__ == "__main__":
    main()
