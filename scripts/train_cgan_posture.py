#!/usr/bin/env python3
"""Conditional GAN (v2/v3): 9 posture-specialist models, condition-conditional.

CLI parity with CGAN/cgan_v2.py:29-73 / cgan_v3.py (same contract).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HP_FLAGS = {
    "epochs": int, "prewarm": int, "batch_size": int, "noise_dim": int,
    "lr_g": float, "lr_d": float, "beta1": float, "beta2": float,
    "d_steps": int, "proj_scale": float, "r1_gamma": float, "r1_every": int,
    "inst_noise_start": float, "inst_noise_end": float, "diffaugment_p": float,
    "acgan_weight": float, "g_acgan_weight": float, "fm_weight": float,
    "psd_weight": float, "coh_weight": float, "cov_weight": float,
    "amp_weight": float, "coh_pairs": int, "ema_decay": float,
    "log_psd_weight": float,  # log-domain PSD moment matching (quality preset)
    "save_every": int, "epochs_per_dispatch": int, "seed": int,
    "arch": str, "tf_dim": int, "tf_depth": int, "tf_heads": int, "tf_patch": int,
    "ckpt_format": str,  # full-state resume checkpoints: npz | orbax
    "precision_d": str,  # f32 | bf16 (bf16 D trunks = reference AMP-on-D)
}


def main():
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data-dir", type=str, default="./preprocessed")
    p.add_argument("--runs-root", type=str, default="./cgan_runs_posture")
    for k, typ in HP_FLAGS.items():
        p.add_argument(f"--{k.replace('_', '-')}", dest=k, type=typ, default=None)
    p.add_argument("--posture", type=str, default="all", help="'all' or an int 1..9")
    # Reference CLI-surface parity (cgan_v2.py flags; store_true default True
    # there too, so passing them is a no-op in both implementations):
    p.add_argument("--ema", action="store_true", default=True,
                   help="EMA generator (always on; disable with --no-ema)")
    p.add_argument("--use-diffaugment", action="store_true", default=True,
                   help="DiffAugment-1D (always on; disable with --no-diffaugment)")
    p.add_argument("--amp-d", action="store_true", default=True,
                   help="kept for reference CLI parity; the real control is "
                        "--precision-d bf16 (bf16 D conv trunks, f32 masters)")
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--no-diffaugment", action="store_true")
    p.add_argument("--async-ckpt", dest="async_ckpt",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="orbax full-state checkpoints only: overlap the "
                        "device->host pull with training (default: on for "
                        "the orbax default; --no-async-ckpt forces sync)")
    p.add_argument("--parallel-postures", "--parallel_postures",
                   dest="parallel_postures", action="store_true",
                   help="vmap all posture models into one training run (TPU extra)")
    p.add_argument("--mesh", action="store_true",
                   help="shard over all local devices (the posture axis with "
                        "--parallel-postures, else the batch)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize and span the whole slice")
    args = p.parse_args()

    hp = {k: getattr(args, k) for k in HP_FLAGS if getattr(args, k) is not None}
    if args.no_ema:
        hp["ema"] = False
    if args.no_diffaugment:
        hp["use_diffaugment"] = False
    if args.async_ckpt is not None:
        hp["async_ckpt"] = args.async_ckpt

    postures = range(1, 10) if args.posture == "all" else [int(args.posture)]
    # defensive SKIP for postures without both condition NPZs on disk (the
    # reference's per-file try/except SKIP pattern, pre-processing.py:147-150)
    data_dir = Path(args.data_dir)
    missing = [p for p in postures
               if not all((data_dir / f"posture{p}_{c}.npz").exists()
                          for c in ("no_exo", "with_exo"))]
    if missing:
        print(f"[skip] postures {missing}: missing condition NPZs under {data_dir}",
              flush=True)
        postures = [p for p in postures if p not in missing]
    if not postures:
        raise SystemExit("No postures with complete data to train.")
    if args.parallel_postures:
        if "ckpt_format" in hp or args.async_ckpt is not None:
            raise SystemExit("--ckpt-format/--async-ckpt apply to the "
                             "sequential trainer only (the vmapped trainer "
                             "writes NPZ at run end).")
        from eegsynth.train.cgan_multi import train_all_postures
        from eegsynth.train.sharding import mesh_from_flags
        mesh = mesh_from_flags(args.mesh, args.multihost)
        train_all_postures(args.data_dir, args.runs_root, postures=postures,
                           mesh=mesh, **hp)
        return

    from eegsynth.train.cgan import train_one_posture
    from eegsynth.train.sharding import mesh_from_flags
    mesh = mesh_from_flags(args.mesh, args.multihost)
    for posture in postures:
        train_one_posture(args.data_dir, args.runs_root, posture, mesh=mesh, **hp)


if __name__ == "__main__":
    main()
