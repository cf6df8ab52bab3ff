#!/usr/bin/env python3
"""Sweep CGAN G-step loss weights: S settings trained in ONE vmapped job,
then evaluated (PSD/ACF/coh L1 vs real) per setting.

Framework extra (no reference analogue — the reference hand-tuned its weights
over sequential GPU runs). Primary use: tuning the transformer arch, which
otherwise inherits conv-tuned weights (QUALITY.md "CGAN family").

The round-1 smoke protocol is built in: ``--smoke-from DIR`` relabels the
no_exo buckets found in DIR as 9 postures (cycling) into a temp data dir, the
same setup QUALITY.md's conv-vs-transformer table used.
"""

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_smoke_set(src_dir: str, condition: str, out_dir: Path) -> Path:
    """Relabel the condition's real buckets as postures 1..9 (cycling)."""
    srcs = sorted(Path(src_dir).glob(f"posture*_{condition}.npz"))
    if not srcs:
        raise SystemExit(f"no posture*_{condition}.npz in {src_dir}")
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in range(1, 10):
        z = dict(np.load(srcs[(p - 1) % len(srcs)], allow_pickle=True))
        z["posture"] = np.int32(p)
        np.savez_compressed(out_dir / f"posture{p}_{condition}.npz", **z)
    return out_dir


def eval_sweep_points(results, Xr, yr, samples_per_posture=400, seed=123,
                      log=print):
    """Per sweep point: synthesize per-posture batches from the saved best (or
    last) generator and score PSD/ACF/coh L1 vs real (same protocol as
    eval_cgan.py). Mutates each ``results`` entry with a ``stats`` global row
    and writes ``stats_similarity.csv`` next to the checkpoints."""
    import jax
    from eegsynth.eval.cgan_eval import discriminative_metrics, stats_similarity
    from eegsynth.train.cgan import generate_batch, load_generator

    npp = samples_per_posture
    for res in results:
        d = Path(res["dir"])
        tag = d.name
        gpath = d / f"CGAN_generator_{tag}_best.npz"
        if not gpath.exists():
            gpath = d / f"CGAN_generator_{tag}_last.npz"
        G, bn, cfg, _ = load_generator(gpath, num_classes=9)
        key = jax.random.key(seed)
        outs, labs = [], []
        for p in range(1, 10):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(generate_batch(G, bn, cfg, sub, npp, p - 1)))
            labs.append(np.full(npp, p, np.int64))
        Xg, yg = np.concatenate(outs), np.concatenate(labs)
        rows = stats_similarity(Xr, Xg, yr, yg, d / "stats_similarity.csv")
        res["stats"] = rows[0]  # global row
        # the reference's committed discriminative eval is degenerate (LogReg
        # acc/AUC = 1.0 everywhere, CGAN/cgan_eval/no_exo/
        # metrics_discriminative.csv) — score every sweep point on the same
        # protocol so "did any setting push acc below 1.0" is answerable
        drows = discriminative_metrics(Xr, Xg, yr, yg,
                                       d / "metrics_discriminative.csv",
                                       seed=seed)
        res["disc"] = drows[0]  # global row
        log(f"[sweep] {tag} {res['weights']} → psd_l1={rows[0]['psd_l1']:.1f} "
            f"acf_l1={rows[0]['acf_l1']:.2e} coh_l1={rows[0]['coh_l1']:.3f} "
            f"logreg_acc={drows[0]['acc']:.3f} "
            f"best_g={res['best_g']:.2f}")
    return results


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--data-dir", type=str, default="./preprocessed")
    ap.add_argument("--smoke-from", type=str, default="",
                    help="build the 9-posture relabeled smoke set from this "
                         "dir's no_exo buckets instead of using --data-dir")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--condition", type=str, default="no_exo")
    ap.add_argument("--grid", type=str, required=True,
                    help="JSON list of weight-override dicts, e.g. "
                         '\'[{}, {"psd_weight": 4.0}]\' ({} = current defaults)')
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--arch", choices=["conv", "transformer"], default="transformer")
    ap.add_argument("--no-tf-remat", action="store_true",
                    help="disable jax.checkpoint on the transformer D blocks "
                         "(remat is the sweep default: R1's double-backward "
                         "residuals × S stacked points are what OOMs the HBM "
                         "above 5 points without it)")
    ap.add_argument("--samples-per-posture", type=int, default=400)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from eegsynth.data.datasets import load_condition_dataset
    from eegsynth.train.cgan_sweep import sweep_condition

    grid = json.loads(args.grid)
    data_dir = args.data_dir
    if args.smoke_from:
        data_dir = str(build_smoke_set(
            args.smoke_from, args.condition,
            Path(tempfile.mkdtemp(prefix="eegsynth_smoke_")) / "prep"))
        print(f"[sweep] smoke set → {data_dir}")

    results = sweep_condition(data_dir, args.out, args.condition, grid,
                              epochs=args.epochs, seed=args.seed,
                              arch=args.arch,
                              tf_remat=(args.arch == "transformer"
                                        and not args.no_tf_remat))

    # eval every point with the same protocol as eval_cgan.py
    np.random.seed(123)
    Xr, yr, _ = load_condition_dataset(data_dir, args.condition)
    eval_sweep_points(results, Xr, yr,
                      samples_per_posture=args.samples_per_posture)

    with open(Path(args.out) / "sweep_results.json", "w") as f:
        json.dump(results, f, indent=2)
    print(f"[sweep] wrote {Path(args.out) / 'sweep_results.json'}")


if __name__ == "__main__":
    main()
