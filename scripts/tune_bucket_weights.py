#!/usr/bin/env python3
"""Deployment-form per-bucket weight tuning / best-of-k replica selection.

The reference hand-tunes ONE global weight set for all 18 buckets
(`/root/reference/timeGAN/timegan_config.json:24-27`). The vmapped trainer
makes a stronger workflow cheap: replicate ONE bucket's data under
candidate×replica pseudo-names, train the whole grid as ONE
``--parallel_buckets``-style job — every replica gets its own independent
deployment RNG stream (fold_in(seed, bucket_index)), unlike
``scripts/sweep_timegan.py``'s shared-RNG protocol — then score each
replica's synthetic corpus against the real bucket with the golden-tested
statistics and report per-candidate medians plus the best replica.

Why both protocols exist: the shared-RNG sweep isolates pure weight effects
(one seed, identical batches/noise per point), but GAN per-run variance at
N=26–63 windows can dominate the weight effect in deployment (QUALITY.md
round-5 re-tune: the same candidate's k=3 median moved 3–9× between stream
protocols). This script measures what deployment will actually see, and its
best-of-k selection (pick the replica whose generated corpus scores best on
the target statistic) reached ≤1.4× the reference's best committed cell in
all four triples measured where median-of-k could not (QUALITY.md).

Example:
  python scripts/tune_bucket_weights.py \
    --npz preprocessed/posture2_with_exo.npz --out /tmp/tune \
    --grid '[{"gamma_acf":0.15,"gamma_cov":0.15},{"gamma_acf":0.1,"gamma_cov":0.2}]' \
    --replicas 3 --config configs/timegan_config.json
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--npz", type=str, required=True, help="real bucket NPZ")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--grid", type=str, required=True,
                    help="JSON list of weight-override dicts (or a file path);"
                         " {} = config defaults")
    ap.add_argument("--replicas", type=int, default=3,
                    help="independent deployment-stream replicas per candidate")
    ap.add_argument("--config", type=str, default=None,
                    help="trainer config JSON (timegan_config.json schema)")
    ap.add_argument("--metric", choices=["acf", "psd", "coh"], default="acf",
                    help="selection statistic for ranking / best-of-k")
    ap.add_argument("--seed", type=int, default=None,
                    help="override config seed")
    args = ap.parse_args()

    grid_src = args.grid
    grid = (json.load(open(grid_src)) if Path(grid_src).is_file()
            else json.loads(grid_src))
    if not isinstance(grid, list) or not all(isinstance(g, dict) for g in grid):
        raise SystemExit("--grid must be a JSON list of override dicts")

    src = Path(args.npz)
    stem = src.stem
    out = Path(args.out)
    data_dir = out / "replicas_data"
    runs_dir = out / "runs"
    data_dir.mkdir(parents=True, exist_ok=True)

    weights, names = {}, []
    for c, overrides in enumerate(grid):
        for r in range(args.replicas):
            name = f"{stem}_c{c}r{r}"
            shutil.copy(src, data_dir / f"{name}.npz")
            weights[name] = overrides
            names.append((name, c, r))

    hp = {}
    if args.config:
        from scripts.train_timegan import CONFIG_KEYS, load_config
        cfg = load_config(Path(args.config))
        hp = {k: CONFIG_KEYS[k](cfg[k]) for k in CONFIG_KEYS if k in cfg}
    if args.seed is not None:
        hp["seed"] = args.seed

    from eegsynth.train.timegan_multi import train_all_buckets
    print(f"[tune] {len(grid)} candidates × {args.replicas} replicas of "
          f"{stem} as one vmapped job", flush=True)
    train_all_buckets(data_dir, runs_dir,
                      bucket_weights={k: v for k, v in weights.items() if v},
                      **hp)

    real = np.load(src)
    X = real["X"].astype(np.float32)
    fs = float(real["fs"]) if "fs" in real.files else 128.0
    from eegsynth.eval.stats import statistical_similarity
    rows = []
    for name, c, r in names:
        Xh = np.load(runs_dir / name / "synthetic.npz")["X"].astype(np.float32)
        psd, acf, coh = statistical_similarity(X, Xh, fs=fs)
        rows.append({"name": name, "candidate": c, "replica": r,
                     "overrides": grid[c], "psd": float(psd),
                     "acf": float(acf), "coh": float(coh)})

    with open(out / "results.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(f"\n{'replica':30s} {'psd':>9s} {'acf':>8s} {'coh':>6s}")
    for r in rows:
        print(f"{r['name']:30s} {r['psd']:9.2e} {r['acf']:8.4f} "
              f"{r['coh']:6.3f}")
    print(f"\nper-candidate {args.metric} median / best "
          f"(k={args.replicas} deployment streams each):")
    best = None
    for c, overrides in enumerate(grid):
        vals = [r for r in rows if r["candidate"] == c]
        med = float(np.median([v[args.metric] for v in vals]))
        top = min(vals, key=lambda v: v[args.metric])
        print(f"  c{c} {overrides}: median {med:.4f}  "
              f"best {top[args.metric]:.4f} ({top['name']})")
        if best is None or top[args.metric] < best[args.metric]:
            best = top
    print(f"\nbest-of-k selection: {runs_dir / best['name']}  "
          f"({args.metric}={best[args.metric]:.4f}, overrides "
          f"{best['overrides']})")


if __name__ == "__main__":
    main()
