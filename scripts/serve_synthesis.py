#!/usr/bin/env python3
"""Synthesis serving endpoint: trained models resident on device, HTTP in front.

The reference's only inference surface is a batch script
(generate_long_synth.py); this server is the deployment-shaped equivalent:

- loads every run's checkpoint at startup and keeps params resident on the
  accelerator (no per-request host→device weight traffic),
- executes requests through ONE pre-compiled fixed-shape executable per model:
  batch is padded to ``--serve_batch`` and the sequence axis is streamed in
  ``--time_chunk`` chunks with carried GRU state (see train/timegan.synthesize),
  so arbitrary (n, seq_len) requests never trigger a recompile,
- optional per-bucket denormalization with the real scalers.

API (stdlib ThreadingHTTPServer: socket I/O is per-thread so a slow or hung
client can never block other requests, while all DEVICE work serializes
behind one dispatch lock — one TPU process needs the device queue serialized,
not the sockets):
Seed semantics: `seed` reproduces outputs for identical (run, n, seq_len) and
server shape config — requests of different sizes consume the key stream
differently and draw different noise.

    GET  /healthz              -> {"status": "ok", "runs": [...]}
    GET  /runs                 -> per-run metadata (dims, step, scalers)
    POST /synthesize           body: {"run": "posture1_no_exo", "n": 64,
                                      "seq_len": 768, "seed": 0,
                                      "denorm": false, "format": "npz"|"json"}
        -> NPZ bytes (X float32 (n, seq_len, C)) or JSON.

Usage:
    python scripts/serve_synthesis.py --runs_dir ./timegan_runs \
        --real_dir ./preprocessed --port 8777
"""

import argparse
import io
import json
import re
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Per-request caps: the host concat of a maxed request stays ~100s of MB, and
# JSON (Python-float) responses stay small. One oversized request must not OOM
# the process holding every device-resident model.
MAX_SAMPLES_PER_REQUEST = 1 << 22        # n * seq_len (≈235 MB f32 at C=14)
MAX_JSON_ELEMENTS = 1 << 22


class ModelRegistry:
    """Checkpoints → device-resident params + per-run meta/scalers."""

    def __init__(self, runs_dir: Path | None, real_dir: Path | None,
                 prefer_latest: bool = False, cgan_root: Path | None = None):
        self.real_dir = Path(real_dir) if real_dir is not None else None
        self.models = {}
        self.cgan = {}
        # Serializes DEVICE dispatch only (one TPU process at a time); socket
        # I/O and host-side NPZ packing stay concurrent across handler threads.
        self.device_lock = threading.Lock()
        if runs_dir is not None:
            self._load_timegan(Path(runs_dir), prefer_latest)
        if cgan_root is not None:
            self._load_cgan(Path(cgan_root))
        if not self.models and not self.cgan:
            raise SystemExit("No servable checkpoints found")

    def _load_cgan(self, root: Path):
        """<root>/<tag>/CGAN_generator_<tag>_{best,last}.npz (tag = condition
        for v1, posture{p} for v2); arch rebuilt from checkpoint meta."""
        import jax
        from eegsynth.train.cgan import load_generator

        for d in sorted(p for p in root.iterdir() if p.is_dir()):
            for which in ("best", "last"):
                fp = d / f"CGAN_generator_{d.name}_{which}.npz"
                if fp.exists():
                    G, bn, cfg, meta = load_generator(fp)
                    self.cgan[d.name] = {
                        "G": jax.device_put(G), "bn": jax.device_put(bn),
                        "cfg": cfg, "meta": meta}
                    break

    def _bucket_scalers(self, tag: str, label: int):
        """Resolve (scale_min, scale_range) for a CGAN (tag, label) from the
        real buckets: v1 tag=<cond> + label=posture-1; v2 tag=posture{p} +
        label∈{0,1}={no,with}_exo."""
        if self.real_dir is None:
            return None
        if tag in ("no_exo", "with_exo"):
            fp = self.real_dir / f"posture{label + 1}_{tag}.npz"
        elif tag.startswith("posture"):
            fp = self.real_dir / f"{tag}_{('no_exo', 'with_exo')[label]}.npz"
        else:
            return None
        if not fp.exists():
            return None
        real = np.load(fp)
        if "scale_min" not in real.files:
            return None
        return (real["scale_min"].astype(np.float32),
                real["scale_range"].astype(np.float32))

    def synthesize_cgan(self, tag: str, label: int, n: int, seed: int,
                        inverse_scale: bool, serve_batch: int) -> np.ndarray:
        import jax
        from eegsynth.train.cgan import generate_batch

        m = self.cgan[tag]
        nb = -(-n // serve_batch) * serve_batch
        pieces = []
        key = jax.random.key(seed)
        with self.device_lock:
            for _ in range(nb // serve_batch):      # fixed compiled shape
                key, sub = jax.random.split(key)
                pieces.append(np.asarray(
                    generate_batch(m["G"], m["bn"], m["cfg"], sub, serve_batch,
                                   label), dtype=np.float32))
        X = np.concatenate(pieces, axis=0)[:n]      # (n, C, T)
        if inverse_scale:
            sc = self._bucket_scalers(tag, label)
            if sc is not None:
                X = X * sc[1][None, :, None] + sc[0][None, :, None]
        return X.transpose(0, 2, 1)                 # (n, T, C) NPZ layout

    def _load_timegan(self, runs_dir: Path, prefer_latest: bool):
        import jax
        from eegsynth.models.timegan import TimeGANConfig, timegan_init
        from eegsynth.train.checkpoint import (
            find_checkpoint, load_checkpoint, load_meta,
        )

        real_dir = self.real_dir
        for rd in sorted(Path(runs_dir).iterdir()):
            if not (rd.is_dir() and re.match(r"posture\d+_(with_exo|no_exo)$", rd.name)):
                continue
            best = find_checkpoint(rd, "ckpt_best")       # .npz or .orbax
            latest = find_checkpoint(rd, "ckpt_latest")
            ckpt = (latest if prefer_latest and latest is not None
                    else (best if best is not None else latest))
            if ckpt is None:
                continue
            meta = load_meta(ckpt)
            scale_min = scale_range = None
            x_dim, fs = int(meta.get("x_dim", 14)), float(meta.get("fs", 128.0))
            if real_dir is not None:
                real_fp = Path(real_dir) / f"{rd.name}.npz"
                if real_fp.exists():
                    real = np.load(real_fp)
                    x_dim = int(real["X"].shape[2])
                    fs = float(real["fs"]) if "fs" in real.files else fs
                    if "scale_min" in real.files:
                        scale_min = real["scale_min"].astype(np.float32)
                        scale_range = real["scale_range"].astype(np.float32)
            cfg = TimeGANConfig(x_dim=x_dim, z_dim=int(meta["z_dim"]),
                                h_dim=int(meta["h_dim"]),
                                num_layers=int(meta.get("layers", 1)))
            template = timegan_init(jax.random.key(0), cfg)
            trees, _ = load_checkpoint(ckpt, {"model": template})
            self.models[rd.name] = {
                "params": jax.device_put(trees["model"]), "cfg": cfg,
                "meta": meta, "fs": fs,
                "scale_min": scale_min, "scale_range": scale_range,
            }

    def synthesize(self, run: str, n: int, seq_len: int, seed: int,
                   denorm: bool, serve_batch: int, time_chunk: int,
                   precision: str = "f32") -> np.ndarray:
        import jax
        from eegsynth.train.timegan import synthesize

        m = self.models[run]
        # Pad both axes to the fixed serving shape and slice down: the GRU is
        # strictly causal, so the first seq_len steps of a longer run are
        # identical to a shorter run — every request hits ONE compiled
        # (serve_batch, time_chunk) executable, no recompiles ever.
        nb = -(-n // serve_batch) * serve_batch
        tb = -(-seq_len // time_chunk) * time_chunk
        with self.device_lock:
            X = np.asarray(
                synthesize(m["params"], m["cfg"], jax.random.key(seed), nb, tb,
                           batch=serve_batch if nb > serve_batch else None,
                           time_chunk=time_chunk if tb > time_chunk else None,
                           precision=precision),
                dtype=np.float32)[:n, :seq_len]
        if denorm and m["scale_min"] is not None:
            X = X * m["scale_range"][None, None, :] + m["scale_min"][None, None, :]
        return X


def make_handler(reg: ModelRegistry, serve_batch: int, time_chunk: int,
                 precision: str = "f32"):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log to stdout
            print(f"[serve] {args[0] if args else ''}", flush=True)

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok", "runs": sorted(reg.models),
                                 "cgan": sorted(reg.cgan)})
            elif self.path == "/runs":
                self._json(200, {
                    "timegan": {
                        name: {"z_dim": m["cfg"].z_dim, "h_dim": m["cfg"].h_dim,
                               "x_dim": m["cfg"].x_dim, "fs": m["fs"],
                               "step": m["meta"].get("step"),
                               "has_scalers": m["scale_min"] is not None}
                        for name, m in reg.models.items()},
                    "cgan": {
                        name: {"arch": m["meta"].get("arch", "conv"),
                               "variant": m["meta"].get("variant", "v1"),
                               "num_classes": m["cfg"].num_classes,
                               "noise_dim": m["cfg"].noise_dim}
                        for name, m in reg.cgan.items()}})
            else:
                self._json(404, {"error": "unknown path"})

        def _post_cgan(self, req):
            tag = req["model"]
            if tag not in reg.cgan:
                return None, self._json(404, {"error": f"unknown model {tag!r}",
                                              "models": sorted(reg.cgan)})
            n = int(req.get("n", 16))
            label = int(req.get("label", 0))
            cfg = reg.cgan[tag]["cfg"]
            if not (1 <= n <= 65536 and 0 <= label < cfg.num_classes):
                return None, self._json(400, {"error": "n or label out of range"})
            # cap on what is actually allocated: n padded to serve_batch
            # multiples, full seq_len windows
            nb = -(-n // serve_batch) * serve_batch
            if nb * cfg.seq_len > MAX_SAMPLES_PER_REQUEST:
                return None, self._json(400, {
                    "error": f"padded n*seq_len = {nb * cfg.seq_len} > "
                             f"{MAX_SAMPLES_PER_REQUEST} (split into multiple "
                             "requests)"})
            return reg.synthesize_cgan(tag, label, n, int(req.get("seed", 0)),
                                       bool(req.get("inverse_scale", False)),
                                       serve_batch), None

        def do_POST(self):
            if self.path not in ("/synthesize", "/synthesize_cgan"):
                return self._json(404, {"error": "unknown path"})
            try:
                req = json.loads(self.rfile.read(
                    int(self.headers.get("Content-Length", 0)) or 0) or b"{}")
                if self.path == "/synthesize_cgan":
                    X, err = self._post_cgan(req)
                    if X is None:
                        return err
                else:
                    run = req["run"]
                    if run not in reg.models:
                        return self._json(404, {"error": f"unknown run {run!r}",
                                                "runs": sorted(reg.models)})
                    n = int(req.get("n", 16))
                    seq_len = int(req.get("seq_len", 768))
                    if not (1 <= n <= 65536 and 1 <= seq_len <= 1 << 20):
                        return self._json(400, {"error": "n or seq_len out of range"})
                    # cap on what synthesize actually allocates: both axes
                    # padded up to the fixed compiled (serve_batch, time_chunk)
                    # multiples — the raw n*seq_len can be up to 12× smaller
                    nb = -(-n // serve_batch) * serve_batch
                    tb = -(-seq_len // time_chunk) * time_chunk
                    if nb * tb > MAX_SAMPLES_PER_REQUEST:
                        return self._json(400, {
                            "error": f"padded n*seq_len = {nb * tb} > "
                                     f"{MAX_SAMPLES_PER_REQUEST} "
                                     "(split into multiple requests)"})
                    X = reg.synthesize(run, n, seq_len, int(req.get("seed", 0)),
                                       bool(req.get("denorm", False)),
                                       serve_batch, time_chunk, precision)
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._json(400, {"error": str(e)})
            if req.get("format", "npz") == "json":
                if X.size > MAX_JSON_ELEMENTS:
                    return self._json(400, {"error": "too large for json; use npz"})
                return self._json(200, {"shape": list(X.shape),
                                        "X": X.tolist()})
            buf = io.BytesIO()
            np.savez_compressed(buf, X=X)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    ap = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    ap.add_argument("--runs_dir", type=str, default="./timegan_runs")
    ap.add_argument("--real_dir", type=str, default="./preprocessed",
                    help="real buckets for x_dim/fs/denorm scalers")
    ap.add_argument("--cgan_root", type=str, default=None,
                    help="also serve CGAN generators found under this root "
                         "(<root>/<tag>/CGAN_generator_<tag>_{best,last}.npz)")
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--prefer_latest", action="store_true")
    ap.add_argument("--serve_batch", type=int, default=256,
                    help="fixed compiled batch; requests are padded/micro-batched")
    ap.add_argument("--time_chunk", type=int, default=768,
                    help="fixed compiled sequence chunk for long requests")
    ap.add_argument("--precision", type=str, default="f32",
                    choices=["f32", "bf16"],
                    help="TimeGAN serving compute precision: bf16 runs the "
                         "fused cascade in bfloat16 (f32 weights/outputs)")
    ap.add_argument("--warmup", action="store_true",
                    help="pre-compile the serving shape for every run at startup")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="'cpu' pins the CPU backend — serve correctly (if "
                         "slower) when the TPU is busy or unreachable")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    runs_dir = Path(args.runs_dir) if Path(args.runs_dir).is_dir() else None
    reg = ModelRegistry(runs_dir, Path(args.real_dir), args.prefer_latest,
                        cgan_root=Path(args.cgan_root) if args.cgan_root else None)
    print(f"[serve] loaded {len(reg.models)} TimeGAN + {len(reg.cgan)} CGAN "
          f"models: {sorted(reg.models) + sorted(reg.cgan)}", flush=True)
    if args.warmup:
        for i, name in enumerate(reg.models):
            # one-shot executable (seq_len == time_chunk) for every model;
            # the chunked carry executable (seq_len > time_chunk) once — the
            # jitted fns are shared, so one compile covers all models
            reg.synthesize(name, 1, args.time_chunk, 0, False,
                           args.serve_batch, args.time_chunk, args.precision)
            if i == 0:
                reg.synthesize(name, 1, 2 * args.time_chunk, 0, False,
                               args.serve_batch, args.time_chunk, args.precision)
            print(f"[serve] warmed {name}", flush=True)
        for tag in reg.cgan:
            reg.synthesize_cgan(tag, 0, 1, 0, False, args.serve_batch)
            print(f"[serve] warmed cgan {tag}", flush=True)

    srv = ThreadingHTTPServer((args.host, args.port),
                              make_handler(reg, args.serve_batch,
                                           args.time_chunk, args.precision))
    srv.daemon_threads = True      # a hung client thread never blocks shutdown
    print(f"[serve] listening on http://{args.host}:{args.port}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
