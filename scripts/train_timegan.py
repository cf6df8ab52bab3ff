#!/usr/bin/env python3
"""Train one TimeGAN per (posture, condition) NPZ bucket — TPU-native.

Keeps both reference entry contracts:
- config-JSON/YAML front-end (reference timeGAN/main.py):
    python scripts/train_timegan.py --config configs/timegan_config.json
- argparse flags with the reference defaults (reference timeGAN/train_timegan.py:427-457);
  flags override config values when both are given.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CONFIG_KEYS = {
    "batch_size": int, "ae_epochs": int, "sup_epochs": int, "gan_steps": int,
    "lr_g": float, "lr_d": float, "beta1": float, "beta2": float,
    "alpha_sup": float, "beta_rec": float, "label_smooth": float,
    "inst_noise_start": float, "inst_noise_end": float, "grad_clip": float,
    "layers": int, "dropout": float, "seed": int, "r1_gamma": float,
    "d_min_acc": float, "d_max_acc": float, "gamma_cov": float,
    "gamma_acf": float, "acf_max_lag": int, "chunk": int,
}


def load_config(path: Path) -> dict:
    """JSON, or YAML when available (reference main.py:13-25)."""
    if not path.exists():
        raise SystemExit(f"Config file not found: {path}")
    if path.suffix.lower() in {".yaml", ".yml"}:
        try:
            import yaml
        except Exception as e:  # pragma: no cover
            raise SystemExit("YAML config requested but PyYAML not installed; use JSON.") from e
        with open(path, "r", encoding="utf-8") as f:
            return yaml.safe_load(f)
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--config", type=str, default=None,
                    help="JSON/YAML config (same schema as the reference timegan_config.json)")
    ap.add_argument("--data_dir", type=str, default=None)
    ap.add_argument("--out_dir", type=str, default=None)
    ap.add_argument("--parallel_buckets", action="store_true",
                    help="train ALL buckets simultaneously via vmap (TPU-native "
                         "bucket parallelism; see eegsynth.train.timegan_multi)")
    ap.add_argument("--profile_dir", type=str, default=None,
                    help="wrap the adversarial phase in a jax.profiler trace")
    ap.add_argument("--resume", action="store_true",
                    help="continue each run from its ckpt_latest.npz "
                         "(skips phases 1-2; framework extra, reference lacks it)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the batch over all local devices (data parallel)")
    ap.add_argument("--multihost", action="store_true",
                    help="jax.distributed.initialize and span the whole slice")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend (jax_platforms) — smoke "
                         "runs / CI while the TPU is busy or unreachable")
    ap.add_argument("--ckpt_format", choices=("npz", "orbax"), default=None,
                    help="checkpoint backend (default: orbax with async "
                         "saves; 'npz' writes the reference-contract flat-NPZ "
                         "artifacts, synchronously)")
    ap.add_argument("--async_ckpt", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="orbax only: overlap checkpoint writes with training "
                         "(default: on for orbax; --no-async_ckpt forces "
                         "synchronous saves)")
    ap.add_argument("--fused_step", action="store_true", default=None,
                    help="run the GAN step's E/G/S/R recurrences as fused "
                         "single-scan cells (numerics-identical; wins for the "
                         "vmapped multi-bucket trainer, where it is the "
                         "default, loses at sequential reference sizes — see "
                         "BASELINE.md)")
    ap.add_argument("--no_fused_step", action="store_true",
                    help="force composed per-network scans (overrides the "
                         "--parallel_buckets fused default)")
    ap.add_argument("--epoch_cycle", action="store_true",
                    help="sequential trainer only: emulate the reference's "
                         "epoch-cycled shuffled DataLoader in the GAN phase "
                         "instead of independent per-step permutation batches "
                         "(A/B instrument for the documented sampling "
                         "deviation; see QUALITY.md)")
    ap.add_argument("--bucket_weights", type=str, default=None,
                    help="with --parallel_buckets: per-bucket G-loss weight "
                         "overrides as inline JSON or a JSON file path — "
                         '{"<bucket>": {"gamma_acf": 0.1, ...}}; weights from '
                         "alpha_sup/beta_rec/gamma_cov/gamma_acf enter the "
                         "chunk as a traced per-bucket matrix (framework "
                         "extra; tune with scripts/sweep_timegan.py)")
    ap.add_argument("--dispatch_budget", type=int, default=None,
                    help="with --parallel_buckets: cap on device work per GAN "
                         "dispatch in reference-scaled bucket-steps "
                         "(nb·steps·(B/64)·(T/768)); the remote runtime kills "
                         "dispatches over ~55 s of device time (default 2000 "
                         "≈ 31 s measured — see timegan_multi.py)")
    ap.add_argument("--max_stack", type=int, default=None,
                    help="legacy escape hatch: additionally vmap at most this "
                         "many buckets per GAN dispatch (sequential "
                         "sub-stacks); superseded by --dispatch_budget")
    ap.add_argument("--ckpt_every", type=int, default=None,
                    help="with --parallel_buckets: save the full stacked "
                         "training state to out_dir/_multi_state.npz every "
                         "this many GAN steps, enabling --resume after a "
                         "worker crash (scripts/supervise.py relaunches "
                         "with --resume automatically; resumed trajectories "
                         "are identical to uninterrupted ones)")
    ap.add_argument("--pallas_multigru", action="store_true",
                    help="with --parallel_buckets + fused_step: run all "
                         "stacked buckets' D-input recurrences in one Pallas "
                         "kernel (measured 0.91x at reference H=56 — escape "
                         "hatch for large-H configs; see BASELINE.md)")
    for k, typ in CONFIG_KEYS.items():
        ap.add_argument(f"--{k}", type=typ, default=None)
    args = ap.parse_args()

    if args.platform == "cpu":
        # pin BEFORE backend init (env JAX_PLATFORMS is overridden by the
        # container sitecustomize; the config knob is authoritative)
        import jax
        jax.config.update("jax_platforms", "cpu")

    cfg = load_config(Path(args.config)) if args.config else {}
    data_dir = Path(args.data_dir or cfg.get("data_dir", "./preprocessed"))
    out_root = Path(args.out_dir or cfg.get("out_dir", "./timegan_runs"))
    out_root.mkdir(parents=True, exist_ok=True)

    hp = {}
    for k, typ in CONFIG_KEYS.items():
        flag = getattr(args, k)
        if flag is not None:
            hp[k] = typ(flag)
        elif k in cfg:
            hp[k] = typ(cfg[k])
    if args.no_fused_step:
        hp["fused_step"] = False
    elif args.fused_step:
        hp["fused_step"] = True
    elif "fused_step" in cfg:
        hp["fused_step"] = bool(cfg["fused_step"])
    if args.pallas_multigru:
        hp["pallas_multigru"] = True
    if args.epoch_cycle:
        hp["epoch_cycle"] = True
    # with --parallel_buckets and no explicit setting, train_all_buckets
    # defaults fused_step on (measured +18% aggregate — BASELINE.md)

    from eegsynth.data.io import bucket_paths
    from eegsynth.train.sharding import mesh_from_flags

    files = bucket_paths(data_dir)
    if not files:
        raise SystemExit(f"No NPZs found in {data_dir}. Run preprocessing first.")
    # mesh_from_flags FIRST: jax.distributed.initialize must run before
    # anything (jax.devices() included) initializes the local backend
    mesh = mesh_from_flags(args.mesh, args.multihost)
    import jax
    print(f"Using devices: {jax.devices()}")
    print(f"Found {len(files)} datasets → training {len(files)} models.")
    if mesh is not None:
        print(f"Data-parallel mesh: {dict(mesh.shape)}")

    if args.parallel_buckets:
        if args.ckpt_format is not None or args.async_ckpt is not None:
            raise SystemExit("--ckpt_format/--async_ckpt apply to the "
                             "sequential trainer only (the vmapped trainer "
                             "writes NPZ at run end).")
        bucket_weights = None
        if args.bucket_weights:
            import json as _json
            bw = args.bucket_weights
            bucket_weights = (_json.load(open(bw)) if Path(bw).is_file()
                              else _json.loads(bw))
            bucket_weights = {k: v for k, v in bucket_weights.items()
                              if not k.startswith("_")}   # "_comment" keys
        from eegsynth.train.timegan_multi import train_all_buckets
        extra = {}
        if args.dispatch_budget is not None:
            extra["dispatch_budget"] = args.dispatch_budget
        if args.max_stack is not None:
            extra["max_stack"] = args.max_stack
        if args.ckpt_every is not None:
            extra["ckpt_every"] = args.ckpt_every
        res = train_all_buckets(data_dir, out_root, mesh=mesh,
                                profile_dir=args.profile_dir,
                                bucket_weights=bucket_weights,
                                resume=args.resume, **extra, **hp)
        print(f"\nAggregate: {res['aggregate_steps_per_sec']:.1f} GAN steps/s "
              f"across {res['n_buckets']} buckets "
              f"({res['total_seconds']:.1f}s total)")
    else:
        if args.bucket_weights:
            raise SystemExit("--bucket_weights requires --parallel_buckets "
                             "(the sequential trainer takes plain "
                             "--alpha_sup/--beta_rec/--gamma_cov/--gamma_acf "
                             "per run)")
        from eegsynth.train.timegan import train_single_npz
        for fp in files:
            run_dir = out_root / fp.stem
            print(f"\n=== Training {fp.name} → {run_dir} ===")
            train_single_npz(fp, run_dir, mesh=mesh, profile_dir=args.profile_dir,
                             resume=args.resume,
                             ckpt_format=args.ckpt_format or "orbax",
                             async_ckpt=args.async_ckpt, **hp)

    print("\nAll models trained. Checkpoints, logs, and synthetic data are under:", out_root)


if __name__ == "__main__":
    main()
