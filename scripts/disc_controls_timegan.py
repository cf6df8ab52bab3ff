#!/usr/bin/env python3
"""Saturation controls for the TimeGAN discriminative score (GRU protocol).

Round 4 proved the CGAN LogReg real-vs-generated metric saturates at this
dataset scale (docs/cgan_disc_controls/: real vs real+N(0,0.01) scores
acc=1.0). Several TimeGAN buckets score disc_acc=1.0 for BOTH stacks
(QUALITY.md seed-repeat table: posture1_with_exo, posture8 both conditions —
the reference's committed cells are identical), but no analogous control had
been run through the GRU protocol this score actually uses
(eegsynth/eval/classifiers.py:discriminative_score, the re-design of
/root/reference/timeGAN/evaluation.py:72-98). This script grounds those
cells: for each real bucket it scores

- ``noise_<sigma>``: real vs real + N(0, sigma) on the [0,1] scale
  (sigma 0.001 ≈ 60 dB SNR, 0.01 ≈ 40 dB — imperceptible perturbations);
- ``half``: one random half of the real bucket vs the other half (same
  distribution — the honest floor of the protocol at N/2 vs N/2).

k scorer seeds per arm (the GRU scorer is freshly initialized and trained
per call, so its own variance matters at N=26–63). Writes one CSV + prints
the summary table recorded in QUALITY.md.

Metrics are backend-agnostic; defaults to the CPU backend so the control can
run while the TPU is busy (scorers are tiny — CLAUDE.md).
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real_dir", type=str,
                    default="/root/reference/timeGAN/preprocessed")
    ap.add_argument("--out", type=str, default="docs/timegan_disc_controls")
    ap.add_argument("--sigmas", type=float, nargs="+", default=[0.001, 0.01])
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--epochs", type=int, default=20,
                    help="scorer train epochs (evaluate_18's setting)")
    ap.add_argument("--platform", choices=["default", "cpu"], default="cpu")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    from eegsynth.eval.classifiers import discriminative_scores_batch

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    buckets = sorted(Path(args.real_dir).glob("posture*_*.npz"))
    if not buckets:
        raise SystemExit(f"no buckets under {args.real_dir}")

    rows = []
    for fp in buckets:
        X = np.load(fp)["X"].astype(np.float32)
        N = len(X)
        arms = []
        for sig in args.sigmas:
            arms.append((f"noise_{sig:g}", None, sig))
        arms.append(("half", None, None))
        for seed in args.seeds:
            rng = np.random.default_rng(10_000 + seed)
            pairs, names = [], []
            for name, _, sig in arms:
                if name == "half":
                    perm = rng.permutation(N)
                    pairs.append((X[perm[: N // 2]], X[perm[N // 2:]]))
                else:
                    fake = X + rng.normal(0.0, sig, X.shape).astype(np.float32)
                    pairs.append((X, fake))
                names.append(name)
            scores = discriminative_scores_batch(pairs, epochs=args.epochs,
                                                 seed=seed)
            for name, (acc, auc) in zip(names, scores):
                rows.append((fp.stem, N, name, seed, float(acc), float(auc)))
                print(f"{fp.stem:22s} N={N:3d} {name:12s} seed={seed} "
                      f"acc={acc:.3f} auc={auc:.3f}", flush=True)

    csv = out / "controls.csv"
    with open(csv, "w") as f:
        f.write("bucket,N,arm,seed,acc,auc\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    print(f"\nwrote {csv}")

    # summary: median over seeds per (bucket, arm)
    print(f"\n{'bucket':22s} {'N':>3s} " +
          " ".join(f"{a:>12s}" for a in dict.fromkeys(r[2] for r in rows)))
    by = {}
    for b, n, a, s, acc, auc in rows:
        by.setdefault((b, n), {}).setdefault(a, []).append(acc)
    for (b, n), d in by.items():
        cells = " ".join(f"{np.median(v):12.3f}" for v in d.values())
        print(f"{b:22s} {n:3d} {cells}")


if __name__ == "__main__":
    main()
