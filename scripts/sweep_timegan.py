#!/usr/bin/env python3
"""Sweep TimeGAN G-step loss weights on ONE bucket: S settings trained in a
single vmapped job (identical data/init/RNG per point), then each point's
synthetic.npz scored vs the real bucket (PSD/ACF/coherence diffs — the
evaluate_18 statistics).

Framework extra (no reference analogue — the reference hand-tuned one global
weight set, timegan_config.json:24-27). Primary use: per-bucket weights for
``--parallel_buckets --bucket_weights`` (train/timegan_multi.py).

Example (the QUALITY.md posture2_with_exo acf cell):
    python scripts/sweep_timegan.py \
        --npz /root/reference/timeGAN/preprocessed/posture2_with_exo.npz \
        --out /tmp/tg_sweep --gan_steps 8000 \
        --grid '[{}, {"gamma_acf": 0.08}, {"gamma_acf": 0.2}]'
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--npz", type=str, required=True,
                    help="the real bucket to sweep on")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--grid", type=str, required=True,
                    help="JSON list of weight-override dicts over "
                         "alpha_sup/beta_rec/gamma_cov/gamma_acf "
                         '(e.g. \'[{}, {"gamma_acf": 0.1}]\'; {} = defaults)')
    ap.add_argument("--config", type=str, default="",
                    help="optional trainer config JSON (same schema as "
                         "train_timegan.py --config)")
    ap.add_argument("--ae_epochs", type=int, default=None)
    ap.add_argument("--sup_epochs", type=int, default=None)
    ap.add_argument("--gan_steps", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    hp = {}
    if args.config:
        # shared trainer configs carry driver-level keys (data_dir,
        # parallel_buckets, bucket_weights, ...) that are not TimeGANHParams
        # fields — filter to the dataclass's own fields and say what was
        # dropped instead of letting TimeGANHParams(**hp) raise a TypeError
        import dataclasses
        from eegsynth.train.timegan import TimeGANHParams
        fields = {f.name for f in dataclasses.fields(TimeGANHParams)}
        with open(args.config) as f:
            cfg = json.load(f)
        unknown = sorted(set(cfg) - fields)
        if unknown:
            print(f"[tsweep] ignoring non-hparam config keys: {unknown}")
        hp.update({k: v for k, v in cfg.items() if k in fields})
    for k in ("ae_epochs", "sup_epochs", "gan_steps", "batch_size", "seed"):
        if getattr(args, k) is not None:
            hp[k] = getattr(args, k)

    from eegsynth.eval.stats import statistical_similarity
    from eegsynth.train.timegan_sweep import sweep_bucket

    grid = json.loads(args.grid)
    results = sweep_bucket(args.npz, args.out, grid, **hp)

    real = np.load(args.npz)
    Xr = real["X"].astype(np.float32)
    fs = float(real["fs"]) if "fs" in real.files else 128.0
    for res in results:
        Xf = np.load(Path(res["dir"]) / "synthetic.npz")["X"]
        psd, acf, coh = statistical_similarity(Xr, Xf, fs)
        res["stats"] = {"psd_diff": psd, "acf_diff": acf, "coh_diff": coh}
        print(f"[tsweep] {Path(res['dir']).name} {res['weights']} → "
              f"psd={psd:.3e} acf={acf:.4f} coh={coh:.3f}", flush=True)

    with open(Path(args.out) / "sweep_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"[tsweep] wrote {Path(args.out) / 'sweep_results.json'}")


if __name__ == "__main__":
    main()
