#!/usr/bin/env python3
"""Convert reference PyTorch TimeGAN checkpoints to eegsynth NPZ checkpoints.

The reference saves ``torch.save({"step", "model", "optG", "optD", "meta"})``
per run dir (reference train_timegan.py:58-61); this tool rewrites the model
weights into eegsynth's flat-pytree NPZ format so trained reference models can
be used directly for synthesis (scripts/generate_long_synth.py) and evaluation
on TPU. Weight layouts are identical by construction (our GRU/dense/spectral-
norm modules use the torch conventions, verified by oracle tests), so the
conversion is a pure key remap:

    <net>.rnn.rnn.{weight_ih_lK, weight_hh_lK, bias_*}  ->  <net>.gru[K].{w_ih,...}
    recovery.out.{weight,bias}                          ->  recovery.out.{w,b}
    {generator,supervisor}.proj.{weight,bias}           ->  ....proj.{w,b}
    discriminator.fc.{weight_orig,bias,weight_u}        ->  discriminator.fc.{w,b,u}

Optimizer state is NOT converted (torch Adam slots are keyed by parameter id,
and the reference has no TimeGAN mid-train resume anyway) — converted
checkpoints are for inference/eval, not for resuming training.

Usage:
    python scripts/convert_torch_ckpt.py --runs_dir <reference>/timeGAN/timegan_runs \
        --out_dir ./timegan_runs_converted [--which best|latest|both]

Full-model numerical parity of converted checkpoints against torch oracles is
asserted in tests/test_convert_ckpt.py.
"""

import argparse
import re
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NETS = ("embedder", "recovery", "generator", "supervisor", "discriminator")


def convert_timegan_model(torch_model: dict) -> dict:
    """Reference TimeGAN state_dict (torch tensors or ndarrays) → eegsynth
    params pytree (numpy, float32)."""
    def arr(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    params: dict = {}
    for net in NETS:
        # GRU stack: collect layers l0, l1, ... in order
        layers = []
        for k in range(64):
            pref = f"{net}.rnn.rnn."
            if f"{pref}weight_ih_l{k}" not in torch_model:
                break
            layers.append({
                "w_ih": arr(torch_model[f"{pref}weight_ih_l{k}"]),
                "w_hh": arr(torch_model[f"{pref}weight_hh_l{k}"]),
                "b_ih": arr(torch_model[f"{pref}bias_ih_l{k}"]),
                "b_hh": arr(torch_model[f"{pref}bias_hh_l{k}"]),
            })
        if not layers:
            raise KeyError(f"no GRU weights found for net '{net}'")
        params[net] = {"gru": layers}

    params["recovery"]["out"] = {"w": arr(torch_model["recovery.out.weight"]),
                                 "b": arr(torch_model["recovery.out.bias"])}
    for net in ("generator", "supervisor"):
        wk = f"{net}.proj.weight"
        params[net]["proj"] = ({"w": arr(torch_model[wk]),
                                "b": arr(torch_model[f"{net}.proj.bias"])}
                               if wk in torch_model else None)
    # torch spectral_norm stores the raw weight as weight_orig and the power-
    # iteration vector u; v is re-derived from (W, u) at apply time in both
    # implementations, so it is dropped.
    params["discriminator"]["fc"] = {
        "w": arr(torch_model["discriminator.fc.weight_orig"]),
        "b": arr(torch_model["discriminator.fc.bias"]),
        "u": arr(torch_model["discriminator.fc.weight_u"]),
    }
    return params


def convert_file(pt_path: Path, out_path: Path) -> dict:
    """Convert one torch checkpoint file; returns its meta."""
    import torch
    from eegsynth.train.checkpoint import save_checkpoint

    sd = torch.load(pt_path, map_location="cpu", weights_only=False)
    params = convert_timegan_model(sd["model"])
    meta = {**sd.get("meta", {}), "step": int(sd.get("step", 0)),
            "x_dim": int(params["embedder"]["gru"][0]["w_ih"].shape[1]),
            "layers": len(params["embedder"]["gru"]),
            "converted_from": pt_path.name, "model_only": True}
    save_checkpoint(out_path, {"model": params}, meta)
    return meta


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--runs_dir", type=str, required=True,
                    help="reference timegan_runs/ with posture*_{no,with}_exo dirs")
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--which", type=str, default="both",
                    choices=["best", "latest", "both"])
    args = ap.parse_args()

    runs_root, out_root = Path(args.runs_dir), Path(args.out_dir)
    names = {"best": ["ckpt_best.pt"], "latest": ["ckpt_latest.pt"],
             "both": ["ckpt_best.pt", "ckpt_latest.pt"]}[args.which]

    n = 0
    for rd in sorted(runs_root.iterdir()):
        if not (rd.is_dir() and re.match(r"posture\d+_(with_exo|no_exo)$", rd.name)):
            continue
        for name in names:
            src = rd / name
            if not src.exists():
                continue
            dst_dir = out_root / rd.name
            dst_dir.mkdir(parents=True, exist_ok=True)
            dst = dst_dir / (src.stem + ".npz")
            meta = convert_file(src, dst)
            print(f"[OK] {rd.name}/{name} -> {dst}  "
                  f"(z={meta.get('z_dim')}, h={meta.get('h_dim')}, "
                  f"step={meta.get('step')})", flush=True)
            n += 1
    if n == 0:
        raise SystemExit(f"No checkpoints found under {runs_root}")
    print(f"Converted {n} checkpoints into {out_root}")


if __name__ == "__main__":
    main()
