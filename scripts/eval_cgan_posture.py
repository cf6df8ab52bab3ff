#!/usr/bin/env python3
"""Evaluate the v2/v3 posture-specialist CGANs (CGAN/eval_cgan_v2.py /
eval_cgan_v3.py contract): per-posture CSV trio + global/ trio + scatters.

The reference versions are edit-the-constants scripts; this exposes the same
knobs as flags with the reference defaults (SAMPLES_PER_COND='match')."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--data-dir", type=str, default="./preprocessed")
    ap.add_argument("--runs-root", type=str, default="./cgan_runs_posture")
    ap.add_argument("--save-root", type=str, default="./cgan_eval_posture")
    ap.add_argument("--postures", type=str, default="all")
    ap.add_argument("--samples-per-cond", type=str, default="match")
    ap.add_argument("--noise-dim", type=int, default=100,
                   help="unused: noise_dim is read from checkpoint meta")
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--v2-split", action="store_true",
                    help="reproduce eval_cgan_v2.py's per-posture "
                         "discriminative selection including its positional "
                         "bug (default: the eval_cgan_v3.py fixed split)")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend (jax_platforms) — the "
                         "metrics are backend-agnostic and the tiny scorers "
                         "run fine on host when the TPU is busy or unreachable")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from eegsynth.data.datasets import load_posture_both_conditions
    from eegsynth.eval.cgan_eval import (
        discriminative_metrics, predictive_scores, scatter_plots, stats_similarity,
    )
    from eegsynth.train.cgan import generate_batch, load_generator

    np.random.seed(args.seed)
    postures = (list(range(1, 10)) if args.postures == "all"
                else [int(p) for p in args.postures.split(",")])
    if args.v2_split and postures != sorted(postures):
        # the v2 positional-bug reproduction assumes the global arrays are
        # posture-block ordered ascending (the reference iterates POSTURES in
        # order); an arbitrary order would silently reproduce neither v2 nor v3
        print(f"--v2-split requires ascending posture order; sorting {postures}")
        postures = sorted(postures)
    save_root = Path(args.save_root)
    save_root.mkdir(parents=True, exist_ok=True)

    Xr_glob, Xg_glob, yp_glob_r, yp_glob_g = [], [], [], []
    key = jax.random.key(args.seed)
    for p in postures:
        X, y, meta = load_posture_both_conditions(args.data_dir, p)
        real = {c: X[y == c] for c in (0, 1)}

        run_dir = Path(args.runs_root) / f"posture{p}"
        gpath = run_dir / f"CGAN_generator_posture{p}_best.npz"
        if not gpath.exists():
            gpath = run_dir / f"CGAN_generator_posture{p}_last.npz"
        if not gpath.exists():
            print(f"[posture {p}] no generator found under {run_dir}; skipping")
            continue
        # arch (conv or transformer) is rebuilt from the checkpoint meta
        G, bn, cfg, _ = load_generator(gpath, num_classes=2, variant="v2")

        if args.samples_per_cond.lower() == "match":
            n_synth = min(real[0].shape[0], real[1].shape[0])
        else:
            n_synth = int(args.samples_per_cond)
        fakes = {}
        for c in (0, 1):
            key, sub = jax.random.split(key)
            fakes[c] = np.asarray(generate_batch(G, bn, cfg, sub, n_synth, c))

        n = min(real[0].shape[0], real[1].shape[0], n_synth)
        R = np.concatenate([real[0][:n], real[1][:n]], 0)
        Gx = np.concatenate([fakes[0][:n], fakes[1][:n]], 0)
        yr = np.full(len(R), p, np.int64)
        yg = np.full(len(Gx), p, np.int64)

        out_p = save_root / f"posture{p}"
        out_p.mkdir(parents=True, exist_ok=True)
        discriminative_metrics(R, Gx, yr, yg, out_p / "metrics_discriminative.csv",
                               args.seed, v2_split=args.v2_split)
        predictive_scores(R, Gx, yr, yg, out_p / "metrics_predictive.csv",
                          seed=args.seed)
        stats_similarity(R, Gx, yr, yg, out_p / "metrics_stats.csv")
        print(f"[posture {p}] evaluated ({len(R)} real / {len(Gx)} gen)")

        Xr_glob.append(R)
        Xg_glob.append(Gx)
        yp_glob_r.append(yr)
        yp_glob_g.append(yg)

    if Xr_glob:
        Xr_all = np.concatenate(Xr_glob)
        Xg_all = np.concatenate(Xg_glob)
        yr_all = np.concatenate(yp_glob_r)
        yg_all = np.concatenate(yp_glob_g)
        out_g = save_root / "global"
        out_g.mkdir(parents=True, exist_ok=True)
        discriminative_metrics(Xr_all, Xg_all, yr_all, yg_all,
                               out_g / "metrics_discriminative.csv", args.seed,
                               v2_split=args.v2_split)
        predictive_scores(Xr_all, Xg_all, yr_all, yg_all,
                          out_g / "metrics_predictive.csv", seed=args.seed)
        stats_similarity(Xr_all, Xg_all, yr_all, yg_all, out_g / "metrics_stats.csv")
        scatter_plots(Xr_all, Xg_all, yr_all, yg_all, out_g, seed=args.seed)
        print(f"Saved all evaluations under: {save_root}")


if __name__ == "__main__":
    main()
