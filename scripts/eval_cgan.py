#!/usr/bin/env python3
"""Evaluate a trained v1 CGAN per condition (CLI parity with CGAN/eval_cgan.py):
synthesize per posture from the best generator, subsample real windows, then
discriminative (LogReg on log-PSD), predictive (Ridge TSTR/TRTS), statistical
similarity, and PCA/t-SNE scatters → cgan_eval/{condition}/."""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--data-dir", type=str, default="./preprocessed")
    ap.add_argument("--runs-root", type=str, default="./cgan_runs")
    ap.add_argument("--save-root", type=str, default="./cgan_eval")
    ap.add_argument("--condition", type=str, default="both",
                    choices=["both", "with_exo", "no_exo"])
    ap.add_argument("--samples-per-posture", type=int, default=400)
    ap.add_argument("--noise-dim", type=int, default=100,
                   help="unused: noise_dim is read from checkpoint meta")
    ap.add_argument("--tsne-perplexity", type=float, default=30.0)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend (jax_platforms) — the "
                         "metrics are backend-agnostic and the tiny scorers "
                         "run fine on host when the TPU is busy or unreachable")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from eegsynth.data.datasets import load_condition_dataset
    from eegsynth.eval.cgan_eval import NUM_POSTURES, evaluate_condition
    from eegsynth.train.cgan import generate_batch, load_generator

    np.random.seed(args.seed)
    conditions = (["with_exo", "no_exo"] if args.condition == "both"
                  else [args.condition])
    for condition in conditions:
        Xr, yr, meta = load_condition_dataset(args.data_dir, condition)
        npp = args.samples_per_posture
        keep = []
        for p in range(1, NUM_POSTURES + 1):
            idx = np.where(yr == p)[0]
            if len(idx):
                np.random.shuffle(idx)
                keep.append(idx[:min(npp, len(idx))])
        if keep:
            keep = np.concatenate(keep)
            Xr, yr = Xr[keep], yr[keep]

        run_dir = Path(args.runs_root) / condition
        gpath = run_dir / f"CGAN_generator_{condition}_best.npz"
        if not gpath.exists():
            gpath = run_dir / f"CGAN_generator_{condition}_last.npz"
        # arch (conv or transformer) is rebuilt from the checkpoint meta
        G, bn, cfg, _ = load_generator(gpath, num_classes=NUM_POSTURES)
        print(f"[{condition}] Loaded generator: {gpath}")

        key = jax.random.key(args.seed)
        outs, labs = [], []
        for p in range(1, NUM_POSTURES + 1):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(generate_batch(G, bn, cfg, sub, npp, p - 1)))
            labs.append(np.full(npp, p, np.int64))
        Xg = np.concatenate(outs, 0)
        yg = np.concatenate(labs, 0)

        out_dir = Path(args.save_root) / condition
        evaluate_condition(Xr, yr, Xg, yg, out_dir, args.tsne_perplexity, args.seed)
        print(f"[{condition}] Saved results to {out_dir}")


if __name__ == "__main__":
    main()
