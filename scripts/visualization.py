#!/usr/bin/env python3
"""PCA/t-SNE cluster figures over all (posture, condition) real/synth pairs.

CLI parity with timeGAN/visualization.py (plus flags covering the variants:
--zooms for visualization_v2 / 36_clusters_zoom, --separate-legend for
visualization_with_legends, --color_scheme 36|18 for the color-scheme files).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--real_dir", type=str, default="./preprocessed")
    ap.add_argument("--synth_dir", type=str, default="./timegan_runs")
    ap.add_argument("--out", type=str, default="./eval_out_plots")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tsne_perplexity", type=float, default=30.0)
    ap.add_argument("--tsne_max", type=int, default=6000)
    ap.add_argument("--pca_keep", type=int, default=50)
    ap.add_argument("--winsor_low", type=float, default=0.005)
    ap.add_argument("--winsor_high", type=float, default=0.995)
    ap.add_argument("--color_scheme", type=str, choices=["36", "18"], default="36")
    ap.add_argument("--zooms", action="store_true",
                    help="per-(posture,condition) zoom figures (fresh subset "
                         "PCA/t-SNE embeddings, global colors)")
    ap.add_argument("--separate-legend", action="store_true",
                    help="write legends as standalone PNGs")
    ap.add_argument("--paired-legend", action="store_true",
                    help="fixed 2-column (Real, Synthetic) enumeration legend")
    ap.add_argument("--dark-posture", type=int, default=None,
                    help="force this posture onto the darker low palette "
                         "indices (visualization_color_scheme*.py posture-2 "
                         "bias; pass 2 for the reference rendering)")
    args = ap.parse_args()

    import numpy as np
    np.random.seed(args.seed)
    from eegsynth.eval.drivers import load_pairs_by_condition
    from eegsynth.viz.cluster import cluster_figures

    pairs = load_pairs_by_condition(Path(args.real_dir), Path(args.synth_dir))
    if not pairs:
        raise SystemExit("No matching (posture, condition) pairs found.")
    cluster_figures(pairs, args.out, color_scheme=args.color_scheme,
                    seed=args.seed, tsne_perplexity=args.tsne_perplexity,
                    tsne_max=args.tsne_max, pca_keep=args.pca_keep,
                    winsor_low=args.winsor_low, winsor_high=args.winsor_high,
                    zooms=args.zooms, separate_legend=args.separate_legend,
                    paired_legend=args.paired_legend,
                    dark_posture=args.dark_posture)
    print(f"Saved PCA and t-SNE to {args.out}")


if __name__ == "__main__":
    main()
