#!/usr/bin/env python3
"""Convert reference PyTorch checkpoints (TimeGAN + CGAN) to eegsynth NPZ.

TimeGAN: the reference saves ``torch.save({"step","model","optG","optD","meta"})``
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

CGAN (``--family cgan``): the reference saves bare generator/discriminator
state_dicts (cgan.py:499-514, cgan_v2.py:359-363) named
``CGAN_generator_<tag>_{best,epochN,last}.pth`` and
``CGAN_{globalD,localD}_<tag>_best.pth`` under ``<runs>/<tag>/`` (tag =
condition for v1, posture{p} for v2). Those map onto our conv CGAN params:

    proj.{weight,bias}                  -> proj.{w,b}
    up{i}.conv.{weight,bias}            -> up{i}.conv.{w,b}
    up{i}.cbn.embed.weight              -> up{i}.cbn.embed
    up{i}.cbn.bn.running_{mean,var}     -> bn state up{i}.{mean,var}
    to_out.{weight,bias}                -> to_out.{w,b}
    c{i}.{weight_orig,bias,weight_u}    -> c{i}.{w,b,u}   (v dropped: re-derived)
    {fc,cls}.{weight_orig,bias,weight_u}-> {fc,cls}.{w,b,u}
    embed.weight / std_weight           -> embed / std_weight

with the reference's own legacy-key renames applied first (u1.->up1.,
out.->to_out., eval_cgan.py:90-93). Converted generators load through
``train.cgan.load_generator`` (variant inferred from the class count), so
``scripts/train_cgan.py generate`` / eval / serving consume them directly.

Optimizer state is NOT converted (torch Adam slots are keyed by parameter id,
and the reference has no TimeGAN mid-train resume anyway) — converted
checkpoints are for inference/eval, not for resuming training.

``--reverse`` exports the OTHER direction: eegsynth checkpoints written in
the reference's own torch formats — TimeGAN ``ckpt_{best,latest}.pt`` with
the train_timegan.py:58-61 payload shape ({step, model, optG, optD, meta};
optimizers empty, inference-only), strict-loadable by
generate_long_synth.py:96-101, and CGAN ``CGAN_generator_<tag>_*.pth`` bare
state_dicts loadable by eval_cgan.py:83-94's safe_load_generator — so the
reference's own synthesis/eval scripts run unmodified on OUR trained weights
(round-trip + torch-oracle output parity in tests/test_convert_reverse.py).

Usage:
    python scripts/convert_torch_ckpt.py --runs_dir <reference>/timeGAN/timegan_runs \
        --out_dir ./timegan_runs_converted [--which best|latest|both]
    python scripts/convert_torch_ckpt.py --family cgan \
        --runs_dir <reference>/CGAN/cgan_runs --out_dir ./cgan_runs_converted
    python scripts/convert_torch_ckpt.py --reverse --runs_dir ./timegan_runs \
        --out_dir ./timegan_runs_torch [--which latest]
    python scripts/convert_torch_ckpt.py --reverse --family cgan \
        --runs_dir ./cgan_runs --out_dir ./cgan_runs_torch

Full-model numerical parity of converted checkpoints against torch oracles is
asserted in tests/test_convert_ckpt.py (TimeGAN) and tests/test_convert_cgan.py.
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


def _arr(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      dtype=np.float32)


def _legacy_cgan_renames(sd: dict) -> dict:
    """The reference's own lenient loader's key renames for older checkpoints
    (safe_load_generator, eval_cgan.py:90-93): u{i}. -> up{i}., out. -> to_out.
    Plus the v2/v3 CBN attribute-name difference: v1's CBN1d calls its
    embedding ``self.embed`` (cgan.py:185) but v2/v3's calls it ``self.emb``
    (cgan_v2.py:137), so real v2 generator state_dicts carry
    ``up{i}.cbn.emb.weight`` keys — normalize those to ``.cbn.embed.``."""
    out = {}
    for k, v in sd.items():
        for i in range(1, 6):
            if k.startswith(f"u{i}."):
                k = f"up{i}." + k[len(f"u{i}."):]
                break
        if k.startswith("out."):
            k = "to_out." + k[len("out."):]
        k = k.replace(".cbn.emb.", ".cbn.embed.")
        out[k] = v
    return out


def convert_cgan_generator(sd: dict):
    """Reference CGAN Generator state_dict (cgan.py:205-223 / cgan_v2.py:152-165)
    → (params, bn_state, num_classes, noise_dim). Weight layouts are identical
    (torch Linear (out,in) / Conv1d OIW); BatchNorm running stats become the
    explicit CBN state our apply threads."""
    sd = _legacy_cgan_renames(sd)
    num_classes = int(sd["up1.cbn.embed.weight"].shape[0])
    noise_dim = int(sd["proj.weight"].shape[1]) - num_classes
    params = {"proj": {"w": _arr(sd["proj.weight"]), "b": _arr(sd["proj.bias"])}}
    bn_state = {}
    for i in range(1, 6):
        params[f"up{i}"] = {
            "conv": {"w": _arr(sd[f"up{i}.conv.weight"]),
                     "b": _arr(sd[f"up{i}.conv.bias"])},
            "cbn": {"embed": _arr(sd[f"up{i}.cbn.embed.weight"])},
        }
        bn_state[f"up{i}"] = {"mean": _arr(sd[f"up{i}.cbn.bn.running_mean"]),
                              "var": _arr(sd[f"up{i}.cbn.bn.running_var"])}
    params["to_out"] = {"w": _arr(sd["to_out.weight"]), "b": _arr(sd["to_out.bias"])}
    return params, bn_state, num_classes, noise_dim


def convert_cgan_disc(sd: dict):
    """Reference DiscBase state_dict (cgan.py:225-252 / cgan_v2.py:167-192)
    → (params, num_classes). Spectral-norm v vectors are dropped (re-derived
    from (W, u) at apply time, same as the TimeGAN fc conversion above)."""
    params = {}
    for i in range(1, 6):
        params[f"c{i}"] = {"w": _arr(sd[f"c{i}.weight_orig"]),
                           "b": _arr(sd[f"c{i}.bias"]),
                           "u": _arr(sd[f"c{i}.weight_u"])}
    for head in ("fc", "cls"):
        params[head] = {"w": _arr(sd[f"{head}.weight_orig"]),
                        "b": _arr(sd[f"{head}.bias"]),
                        "u": _arr(sd[f"{head}.weight_u"])}
    params["embed"] = _arr(sd["embed.weight"])
    params["std_weight"] = _arr(sd["std_weight"])
    return params, int(params["embed"].shape[0])


def _infer_cgan_variant(tag: str, num_classes: int) -> str:
    """v1 trains one model per condition (tags 'no_exo'/'with_exo', 9 posture
    classes, proj_scale 0.25 — cgan.py:227); v2/v3 one per posture (tags
    'posture<p>', 2 condition classes, proj_scale 0.10 — cgan_v2.py:168).
    The run-dir tag shape is the primary signal so a hypothetical 2-class
    v1-style run is not mislabeled; class count is the fallback."""
    if re.fullmatch(r"posture\d+", tag):
        return "v2"
    if tag in ("no_exo", "with_exo"):
        return "v1"
    return "v1" if num_classes != 2 else "v2"


def convert_cgan_file(pt_path: Path, out_path: Path) -> dict:
    """Convert one CGAN .pth (generator or discriminator, by filename)."""
    import torch
    from eegsynth.train.checkpoint import save_checkpoint

    # CGAN checkpoints are bare tensor state_dicts (cgan.py:499-514), which
    # load fine under the safe unpickler — no reason to run arbitrary pickle
    # code from an untrusted tree here.
    sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    m = re.match(r"CGAN_(generator|globalD|localD|discriminator)_(.+?)"
                 r"_(best|last|epoch\d+)$", pt_path.stem)
    if not m:
        raise KeyError(f"unrecognized CGAN checkpoint name: {pt_path.name}")
    kind, tag = m.group(1), m.group(2)
    if kind == "generator":
        params, bn, num_classes, noise_dim = convert_cgan_generator(sd)
        variant = _infer_cgan_variant(tag, num_classes)
        meta = {"tag": tag, "variant": variant, "num_classes": num_classes,
                "noise_dim": noise_dim, "arch": "conv",
                "proj_scale": 0.25 if variant == "v1" else 0.10,
                "converted_from": pt_path.name, "model_only": True}
        save_checkpoint(out_path, {"model": params, "bn": bn}, meta)
    else:
        params, num_classes = convert_cgan_disc(sd)
        meta = {"tag": tag, "num_classes": num_classes,
                "converted_from": pt_path.name, "model_only": True}
        save_checkpoint(out_path, {"model": params}, meta)
    return meta


def convert_file(pt_path: Path, out_path: Path) -> dict:
    """Convert one torch checkpoint file; returns its meta."""
    import torch
    from eegsynth.train.checkpoint import save_checkpoint

    try:
        sd = torch.load(pt_path, map_location="cpu", weights_only=True)
    except Exception:
        # TimeGAN checkpoints carry a meta dict that may need the full
        # unpickler (train_timegan.py:58-61); fall back for those only.
        sd = torch.load(pt_path, map_location="cpu", weights_only=False)
    params = convert_timegan_model(sd["model"])
    meta = {**sd.get("meta", {}), "step": int(sd.get("step", 0)),
            "x_dim": int(params["embedder"]["gru"][0]["w_ih"].shape[1]),
            "layers": len(params["embedder"]["gru"]),
            "converted_from": pt_path.name, "model_only": True}
    save_checkpoint(out_path, {"model": params}, meta)
    return meta


def _t(a):
    import torch
    # .copy() guarantees a writable buffer: torch.from_numpy warns on
    # read-only arrays (e.g. zipfile-backed npz loads)
    return torch.from_numpy(np.asarray(a, np.float32).copy(order="C"))


def reverse_timegan_model(params: dict) -> dict:
    """eegsynth TimeGAN params pytree → reference torch state_dict, loadable
    STRICTLY by the reference model (generate_long_synth.py:96-101 does
    ``model.load_state_dict(state["model"])`` with default strict=True).

    Inverse of convert_timegan_model: layouts are identical by construction,
    so this is a key remap. torch's spectral_norm additionally keeps a
    ``weight_v`` buffer in the state dict; we re-derive it the way torch's
    power iteration does (v = normalize(Wᵀu)), which also makes the stored
    σ = uᵀWv the true current spectral estimate."""
    import torch

    sd: dict = {}
    for net in NETS:
        for k, layer in enumerate(params[net]["gru"]):
            pref = f"{net}.rnn.rnn."
            sd[f"{pref}weight_ih_l{k}"] = _t(layer["w_ih"])
            sd[f"{pref}weight_hh_l{k}"] = _t(layer["w_hh"])
            sd[f"{pref}bias_ih_l{k}"] = _t(layer["b_ih"])
            sd[f"{pref}bias_hh_l{k}"] = _t(layer["b_hh"])
    sd["recovery.out.weight"] = _t(params["recovery"]["out"]["w"])
    sd["recovery.out.bias"] = _t(params["recovery"]["out"]["b"])
    for net in ("generator", "supervisor"):
        proj = params[net].get("proj")
        if proj is not None:
            sd[f"{net}.proj.weight"] = _t(proj["w"])
            sd[f"{net}.proj.bias"] = _t(proj["b"])
    fc = params["discriminator"]["fc"]
    W, u = _t(fc["w"]), _t(fc["u"])
    v = torch.nn.functional.normalize(W.t() @ u, dim=0, eps=1e-12)
    sd["discriminator.fc.weight_orig"] = W
    sd["discriminator.fc.bias"] = _t(fc["b"])
    sd["discriminator.fc.weight_u"] = u
    sd["discriminator.fc.weight_v"] = v
    return sd


def reverse_cgan_generator(params: dict, bn_state: dict) -> dict:
    """eegsynth conv CGAN generator (params, bn_state) → reference torch
    Generator state_dict (cgan.py:205-223 attribute names: proj / up{i}.conv /
    up{i}.cbn.{bn,embed} / to_out), strict-loadable by safe_load_generator
    (eval_cgan.py:83-94). BatchNorm1d(affine=False) state = running stats +
    num_batches_tracked (informational; eval-mode forward ignores it)."""
    import torch

    sd = {"proj.weight": _t(params["proj"]["w"]),
          "proj.bias": _t(params["proj"]["b"])}
    for i in range(1, 6):
        up = params[f"up{i}"]
        sd[f"up{i}.conv.weight"] = _t(up["conv"]["w"])
        sd[f"up{i}.conv.bias"] = _t(up["conv"]["b"])
        sd[f"up{i}.cbn.embed.weight"] = _t(up["cbn"]["embed"])
        sd[f"up{i}.cbn.bn.running_mean"] = _t(bn_state[f"up{i}"]["mean"])
        sd[f"up{i}.cbn.bn.running_var"] = _t(bn_state[f"up{i}"]["var"])
        sd[f"up{i}.cbn.bn.num_batches_tracked"] = torch.tensor(0, dtype=torch.long)
    sd["to_out.weight"] = _t(params["to_out"]["w"])
    sd["to_out.bias"] = _t(params["to_out"]["b"])
    return sd


def reverse_timegan_file(ckpt_path: Path, out_pt: Path) -> dict:
    """One eegsynth TimeGAN checkpoint (.npz or .orbax) → reference-format
    ckpt_*.pt with the reference's payload shape
    (train_timegan.py:58-61: {step, model, optG, optD, meta}). Optimizer
    states are exported empty — the reference only reads ``model`` and
    ``meta`` at synthesis/eval time; resuming torch training from an exported
    checkpoint is out of scope either direction."""
    import jax
    import torch
    from eegsynth.models.timegan import TimeGANConfig, timegan_init
    from eegsynth.train.checkpoint import load_checkpoint, load_meta

    meta = load_meta(ckpt_path)
    cfg = TimeGANConfig(x_dim=int(meta.get("x_dim", 14)),
                        z_dim=int(meta["z_dim"]), h_dim=int(meta["h_dim"]),
                        num_layers=int(meta.get("layers", 1)))
    template = timegan_init(jax.random.key(0), cfg)
    trees, _ = load_checkpoint(ckpt_path, {"model": template})
    sd = reverse_timegan_model(jax.device_get(trees["model"]))
    ref_meta = {"npz": meta.get("npz", ""), "z_dim": cfg.z_dim,
                "h_dim": cfg.h_dim}
    if meta.get("best") is not None:
        ref_meta["best"] = meta["best"]
    torch.save({"step": int(meta.get("step", 0)), "model": sd,
                "optG": {}, "optD": {}, "meta": ref_meta}, out_pt)
    return ref_meta


def reverse_cgan_file(npz_path: Path, out_pth: Path) -> dict:
    """One eegsynth CGAN generator checkpoint → reference-format bare
    state_dict .pth (what cgan.py:508-512 saves and eval_cgan.py loads).
    Transformer-arch checkpoints have no torch counterpart and are refused."""
    import torch
    from eegsynth.train.cgan import load_generator

    G, bn, cfg, meta = load_generator(npz_path)
    if meta.get("arch", "conv") != "conv":
        raise KeyError(f"arch={meta.get('arch')} has no reference torch "
                       "equivalent (conv only)")
    torch.save(reverse_cgan_generator(G, bn), out_pth)
    return meta


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--runs_dir", type=str, required=True,
                    help="reference timegan_runs/ with posture*_{no,with}_exo dirs, "
                         "or (--family cgan) cgan_runs/ with per-tag dirs; "
                         "with --reverse: OUR runs dir of NPZ/orbax checkpoints")
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--family", type=str, default="timegan",
                    choices=["timegan", "cgan"])
    ap.add_argument("--which", type=str, default="both",
                    choices=["best", "latest", "both"],
                    help="timegan family only; cgan converts every *.pth found")
    ap.add_argument("--reverse", action="store_true",
                    help="export eegsynth checkpoints TO the reference's torch "
                         "formats (ckpt_*.pt / CGAN_generator_*_best.pth) so "
                         "the reference's own scripts can run on our weights")
    args = ap.parse_args()

    runs_root, out_root = Path(args.runs_dir), Path(args.out_dir)

    if args.reverse:
        n = 0
        if args.family == "cgan":
            for src in sorted(runs_root.rglob("CGAN_generator_*.npz")) + \
                    sorted(p for p in runs_root.rglob("CGAN_generator_*.orbax")
                           if p.is_dir()):
                dst = (out_root / src.parent.relative_to(runs_root)
                       / (src.stem + ".pth"))
                dst.parent.mkdir(parents=True, exist_ok=True)
                try:
                    reverse_cgan_file(src, dst)
                except KeyError as e:
                    print(f"[SKIP] {src.relative_to(runs_root)}: {e}", flush=True)
                    continue
                print(f"[OK] {src.relative_to(runs_root)} -> {dst}", flush=True)
                n += 1
        else:
            from eegsynth.train.checkpoint import find_checkpoint
            names = {"best": ["ckpt_best"], "latest": ["ckpt_latest"],
                     "both": ["ckpt_best", "ckpt_latest"]}[args.which]
            for rd in sorted(runs_root.iterdir()):
                if not (rd.is_dir()
                        and re.match(r"posture\d+_(with_exo|no_exo)$", rd.name)):
                    continue
                for stem in names:
                    src = find_checkpoint(rd, stem)
                    if src is None:
                        continue
                    dst_dir = out_root / rd.name
                    dst_dir.mkdir(parents=True, exist_ok=True)
                    dst = dst_dir / f"{stem}.pt"
                    meta = reverse_timegan_file(src, dst)
                    print(f"[OK] {rd.name}/{src.name} -> {dst}  "
                          f"(z={meta['z_dim']}, h={meta['h_dim']})", flush=True)
                    n += 1
        if n == 0:
            raise SystemExit(f"No checkpoints exported from {runs_root}")
        print(f"Exported {n} checkpoints into {out_root}")
        return

    if args.family == "cgan":
        n = 0
        for src in sorted(runs_root.rglob("CGAN_*.pth")):
            dst = out_root / src.parent.relative_to(runs_root) / (src.stem + ".npz")
            dst.parent.mkdir(parents=True, exist_ok=True)
            try:
                meta = convert_cgan_file(src, dst)
            except KeyError as e:
                print(f"[SKIP] {src.relative_to(runs_root)}: {e}", flush=True)
                continue
            print(f"[OK] {src.relative_to(runs_root)} -> {dst}  "
                  f"(classes={meta['num_classes']})", flush=True)
            n += 1
        if n == 0:
            raise SystemExit(f"No CGAN checkpoints converted under {runs_root}")
        print(f"Converted {n} checkpoints into {out_root}")
        return
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
