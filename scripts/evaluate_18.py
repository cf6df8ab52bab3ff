#!/usr/bin/env python3
"""TimeGAN evaluation over all 18 (posture, condition) pairs + global.

CLI parity with timeGAN/evaluate_18.py (incl. --tsne_max subsample and the
synthetic_long.npz → synthetic.npz file preference).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--real_dir", type=str, default="./preprocessed")
    ap.add_argument("--synth_dir", type=str, default="./timegan_runs")
    ap.add_argument("--out", type=str, default="./eval_out")
    ap.add_argument("--fs", type=float, default=128.0)
    ap.add_argument("--tsne_max", type=int, default=6000)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend (jax_platforms) — the "
                         "metrics are backend-agnostic and the tiny scorers "
                         "run fine on host when the TPU is busy or unreachable")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batched scorer stacks over all local "
                         "devices (one independent scorer per chip)")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from eegsynth.eval.drivers import run_timegan_eval
    from eegsynth.train.sharding import mesh_from_flags
    mesh = mesh_from_flags(args.mesh)
    run_timegan_eval(args.real_dir, args.synth_dir, args.out, fs=args.fs,
                     by_condition=True, tsne_max=args.tsne_max, mesh=mesh)


if __name__ == "__main__":
    main()
