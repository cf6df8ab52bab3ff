#!/usr/bin/env python3
"""Conditional GAN (v1): one posture-conditional model per exoskeleton condition.

CLI parity with CGAN/cgan.py:34-102, including the ``generate`` subcommand.
Also accepts --config JSON (configs/cgan_config.json schema) like the other
entry points; flags override config values.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HP_FLAGS = {
    "epochs": int, "batch_size": int, "noise_dim": int, "lr_g": float,
    "lr_d": float, "beta1": float, "beta2": float, "d_steps": int,
    "proj_scale": float, "acgan_weight": float, "g_acgan_weight": float,
    "r1_gamma": float, "r1_every": int, "inst_noise_start": float,
    "inst_noise_end": float, "diffaugment_p": float, "psd_weight": float,
    "coh_weight": float, "cov_weight": float, "amp_weight": float,
    "coh_pairs": int, "local_crop": int,
    "log_psd_weight": float,  # log-domain PSD moment matching (quality preset)
    "fm_weight": float, "ema_decay": float, "lr_decay": float,
    "lr_decay_step": int, "save_every": int, "print_every": int, "epochs_per_dispatch": int, "seed": int,
    "arch": str, "tf_dim": int, "tf_depth": int, "tf_heads": int, "tf_patch": int,
    "ckpt_format": str,  # full-state resume checkpoints: npz | orbax
    "precision_d": str,  # f32 | bf16 (bf16 D trunks = reference AMP-on-D)
}


def get_args():
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=False)

    p.add_argument("--config", type=str, default=None)
    # default None so flag-over-config precedence works even when the user
    # explicitly passes the default value (same pattern as the HP_FLAGS loop)
    p.add_argument("--data-dir", type=str, default=None,
                   help="default: config data_dir key, else ./preprocessed")
    p.add_argument("--save-root", type=str, default=None,
                   help="default: config save_root key, else ./cgan_runs")
    p.add_argument("--condition", type=str, default="both",
                   choices=["both", "with_exo", "no_exo"])
    for k, typ in HP_FLAGS.items():
        p.add_argument(f"--{k.replace('_', '-')}", dest=k, type=typ, default=None)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--no-diffaugment", action="store_true")
    # Reference CLI-surface parity (cgan.py:55-84). --ema/--use-diffaugment
    # are store_true with default True in the reference too (i.e. no-ops
    # there as well); --amp-d is meaningless on TPU (no GradScaler needed).
    # The reference lists wgan-gp/bce in --loss but implements only hinge
    # (cgan.py:258-261); here all three are real (losses/gan.py).
    p.add_argument("--ema", action="store_true", default=True,
                   help="EMA generator (always on; disable with --no-ema)")
    p.add_argument("--use-diffaugment", action="store_true", default=True,
                   help="DiffAugment-1D (always on; disable with --no-diffaugment)")
    p.add_argument("--loss", type=str, default=None,
                   choices=["hinge", "wgan-gp", "bce"],
                   help="default: config gan_loss key, else hinge")
    p.add_argument("--gp-weight", type=float, default=None,
                   help="gradient-penalty weight (wgan-gp loss only; "
                        "default: config gp_weight key, else 10.0)")
    p.add_argument("--amp-d", action="store_true", default=True,
                   help="kept for reference CLI parity; the real control is "
                        "--precision-d bf16 (bf16 D conv trunks, f32 masters "
                        "— no GradScaler needed on TPU)")
    p.add_argument("--resume", type=str, default="")
    p.add_argument("--async-ckpt", dest="async_ckpt",
                   action=argparse.BooleanOptionalAction, default=None,
                   help="orbax full-state checkpoints only: overlap the "
                        "device->host pull with training (default: on for "
                        "the orbax default; --no-async-ckpt forces sync)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all local devices (data parallel)")
    p.add_argument("--multihost", action="store_true",
                   help="jax.distributed.initialize and span the whole slice")

    g = sub.add_parser("generate", formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    g.add_argument("--data-dir", type=str, default="./preprocessed")
    g.add_argument("--save-root", type=str, default="./cgan_runs")
    g.add_argument("--condition", type=str, required=True, choices=["with_exo", "no_exo"])
    g.add_argument("--model-path", type=str, default="")
    g.add_argument("--noise-dim", type=int, default=100,
                   help="unused: noise_dim is read from checkpoint meta")
    g.add_argument("--num-per-posture", type=int, default=100)
    g.add_argument("--inverse-scale", action="store_true")
    g.add_argument("--seed", type=int, default=123)
    return p.parse_args()


def generate_for_condition(args):
    """Per-posture synthesis from the best generator, optional inverse scaling,
    reference NPZ contract (cgan.py:518-547)."""
    import numpy as np
    import jax
    from eegsynth.data.datasets import load_condition_dataset
    from eegsynth.train.cgan import NUM_POSTURES, generate_batch, load_generator

    _, _, meta = load_condition_dataset(args.data_dir, args.condition)
    gpath = (Path(args.model_path) if args.model_path else
             Path(args.save_root) / args.condition /
             f"CGAN_generator_{args.condition}_best.npz")
    # arch (conv or transformer) is rebuilt from the checkpoint meta
    G, bn, cfg, _ = load_generator(gpath, num_classes=NUM_POSTURES)
    print(f"[{args.condition}] Loaded generator: {gpath}")

    out_dir = Path(args.save_root) / args.condition / f"generated_{int(time.time())}"
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.key(args.seed)
    for posture in range(1, NUM_POSTURES + 1):
        key, sub = jax.random.split(key)
        synth = np.asarray(generate_batch(G, bn, cfg, sub, args.num_per_posture,
                                          posture - 1))
        minv = meta[posture]["scale_min"][None, :, None]
        rngv = meta[posture]["scale_range"][None, :, None]
        X_out = synth * rngv + minv if args.inverse_scale else synth
        fp = out_dir / f"synth_posture{posture}_{args.condition}.npz"
        np.savez_compressed(fp, X=X_out.transpose(0, 2, 1).astype(np.float32),
                            posture=np.int32(posture), condition=str(args.condition),
                            ch_names=np.array(meta[posture]["ch_names"], dtype=object),
                            fs=np.float32(meta[posture]["fs"]),
                            note="CGAN generation")
        print(f"[{args.condition}] Saved {args.num_per_posture} -> {fp}")
    print(f"[{args.condition}] Generation complete: {out_dir}")


def main():
    args = get_args()
    if args.cmd == "generate":
        generate_for_condition(args)
        return

    cfg = json.load(open(args.config)) if args.config else {}
    hp = {}
    for k in HP_FLAGS:
        flag = getattr(args, k)
        if flag is not None:
            hp[k] = flag
        elif k in cfg:
            hp[k] = HP_FLAGS[k](cfg[k])
    if args.no_ema:
        hp["ema"] = False
    if args.no_diffaugment:
        hp["use_diffaugment"] = False
    # same flag-over-config precedence as the HP_FLAGS loop (these two keep
    # the reference's flag spellings --loss/--gp-weight, cgan.py:48,84)
    for k, typ, flag in (("gan_loss", str, args.loss),
                         ("gp_weight", float, args.gp_weight)):
        if flag is not None:
            hp[k] = flag
        elif k in cfg:
            hp[k] = typ(cfg[k])
    if args.async_ckpt is not None:
        hp["async_ckpt"] = args.async_ckpt

    from eegsynth.train.cgan import train_one_condition
    from eegsynth.train.sharding import mesh_from_flags
    mesh = mesh_from_flags(args.mesh, args.multihost)
    data_dir = args.data_dir or cfg.get("data_dir", "./preprocessed")
    save_root = args.save_root or cfg.get("save_root", "./cgan_runs")
    if args.condition in ("both", "with_exo"):
        train_one_condition(data_dir, save_root, "with_exo", resume=args.resume,
                            mesh=mesh, **hp)
    if args.condition in ("both", "no_exo"):
        train_one_condition(data_dir, save_root, "no_exo", resume=args.resume,
                            mesh=mesh, **hp)


if __name__ == "__main__":
    main()
