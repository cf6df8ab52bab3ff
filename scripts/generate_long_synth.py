#!/usr/bin/env python3
"""Generate long synthetic EEG from trained TimeGAN checkpoints.

CLI parity with the reference (timeGAN/generate_long_synth.py:44-61):
scans runs_dir/posture{p}_{with_exo|no_exo}/, loads ckpt_best.npz (fallback
ckpt_latest.npz, --prefer_latest flips), rebuilds the model from checkpoint meta
plus the real NPZ (x_dim, fs), samples U[0,1) noise at the requested horizon
(--gen_seconds·fs | --gen_len | training T), optionally denormalizes with the
bucket scalers, and writes synthetic_long.npz per run.
"""

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--runs_dir", type=str, default="./timegan_runs")
    ap.add_argument("--real_dir", type=str, default="./preprocessed")
    ap.add_argument("--out_suffix", type=str, default="synthetic_long.npz")
    ap.add_argument("--gen_seconds", type=float, default=None)
    ap.add_argument("--gen_len", type=int, default=None)
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--prefer_latest", action="store_true")
    ap.add_argument("--denorm", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend — synthesis is correct "
                         "on any backend; use when the TPU is busy or "
                         "unreachable")
    ap.add_argument("--batch", type=int, default=None,
                    help="Optional synthesis micro-batch (memory cap for huge N·T)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the synthesis batch over all local devices "
                         "(params replicated; per-window GRU chains are "
                         "independent, so sharding is communication-free)")
    ap.add_argument("--precision", type=str, default="f32",
                    choices=["f32", "bf16"],
                    help="bf16 runs the fused cascade in bfloat16 (f32 master "
                         "weights, f32 outputs) — HBM-bound synthesis speedup")
    ap.add_argument("--time_chunk", type=int, default=None,
                    help="Stream the sequence axis in fixed chunks, carrying "
                         "GRU state — one compiled executable for any length")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    from eegsynth.models.timegan import TimeGANConfig, timegan_init
    from eegsynth.train.checkpoint import load_checkpoint
    from eegsynth.train.sharding import mesh_from_flags
    from eegsynth.train.timegan import synthesize

    mesh = mesh_from_flags(args.mesh)

    runs_root = Path(args.runs_dir)
    real_root = Path(args.real_dir)
    if not runs_root.is_dir():
        raise SystemExit(f"Runs dir not found: {runs_root}")
    run_dirs = [p for p in sorted(runs_root.iterdir())
                if p.is_dir() and re.match(r"posture\d+_(with_exo|no_exo)$", p.name)]
    if not run_dirs:
        raise SystemExit(f"No run folders found under {runs_root}")

    key = jax.random.key(args.seed)
    for rd in run_dirs:
        m = re.match(r"posture(\d+)_(with_exo|no_exo)$", rd.name)
        posture, cond = int(m.group(1)), m.group(2)

        # either backend format per run dir (ckpt_*.npz or ckpt_*.orbax)
        from eegsynth.train.checkpoint import find_checkpoint, load_meta
        ckpt_best = find_checkpoint(rd, "ckpt_best")
        ckpt_last = find_checkpoint(rd, "ckpt_latest")
        ckpt = (ckpt_last if args.prefer_latest and ckpt_last is not None
                else (ckpt_best if ckpt_best is not None else ckpt_last))
        if ckpt is None:
            print(f"[SKIP] {rd.name}: no checkpoint found.")
            continue

        # Rebuild from meta (generate_long_synth.py:96-101). Checkpoint meta
        # carries x_dim/layers precisely so a converted/copied checkpoint can
        # generate without the real NPZ on hand (train/timegan.py meta note);
        # the real file only refines fs and supplies N default + denorm scalers.
        meta = load_meta(ckpt)

        real = None
        N_real, T_train, C = None, None, int(meta.get("x_dim", 14))
        fs = float(meta.get("fs", 128.0))
        real_npz = real_root / f"posture{posture}_{cond}.npz"
        if real_npz.exists():
            real = np.load(real_npz)
            N_real, T_train, C = real["X"].shape
            fs = float(real["fs"]) if "fs" in real.files else fs
        else:
            if args.gen_seconds is not None and "fs" not in meta:
                print(f"[WARN] {rd.name}: real file missing and checkpoint "
                      f"meta has no fs — assuming {fs:.0f} Hz for "
                      "--gen_seconds; pass --gen_len for an exact horizon")
            missing = [w for w, v in (("--n", args.n),
                                      ("--gen_seconds/--gen_len",
                                       args.gen_seconds or args.gen_len))
                       if v is None]
            if missing:
                print(f"[SKIP] {rd.name}: real file missing ({real_npz}) and "
                      f"{' and '.join(missing)} not given — cannot infer "
                      "N/T from the data.")
                continue
            if args.denorm:
                print(f"[WARN] {rd.name}: --denorm ignored, scalers live in "
                      f"the missing real file {real_npz}")

        cfg = TimeGANConfig(x_dim=C, z_dim=int(meta["z_dim"]), h_dim=int(meta["h_dim"]),
                            num_layers=int(meta.get("layers", 1)))
        template = timegan_init(jax.random.key(0), cfg)
        trees, _ = load_checkpoint(ckpt, {"model": template})
        params = trees["model"]

        if args.gen_seconds is not None:
            T_out = int(round(args.gen_seconds * fs))
        elif args.gen_len is not None:
            T_out = int(args.gen_len)
        else:
            T_out = int(T_train)
        N_out = int(args.n) if args.n is not None else int(N_real)

        print(f"[{rd.name}] N_out={N_out}  T_out={T_out}  C={C}  "
              f"z_dim={cfg.z_dim}  fs≈{fs:.2f}", flush=True)

        key, sub = jax.random.split(key)
        Xh = np.asarray(synthesize(params, cfg, sub, N_out, T_out,
                                   batch=args.batch, time_chunk=args.time_chunk,
                                   precision=args.precision, mesh=mesh),
                        dtype=np.float32)

        if (args.denorm and real is not None
                and "scale_min" in real.files and "scale_range" in real.files):
            mn = real["scale_min"].astype(np.float32)
            rg = real["scale_range"].astype(np.float32)
            Xh = Xh * rg[None, None, :] + mn[None, None, :]

        out_fp = rd / (args.out_suffix if "{" not in args.out_suffix
                       else args.out_suffix.format(T=T_out))
        np.savez_compressed(out_fp, X=Xh)
        print(f"[OK] wrote {out_fp}", flush=True)


if __name__ == "__main__":
    main()
