#!/usr/bin/env python3
"""Synthesis (inference) throughput: TimeGAN fused cascade + CGAN generator.

Timing protocol for the remote TPU (CLAUDE.md): the runtime dedupes repeated
identical dispatches and `block_until_ready` can acknowledge early, so each
timed region is ONE jitted dispatch whose iterations are chained (iteration
i+1's input is data-dependent on iteration i's output) and the clock stops on
a host pull of a scalar that depends on every iteration.

Usage: python -u scripts/bench_synthesis.py [--batch 512 1024 4096] [--iters 20]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_timegan(batch: int, iters: int, T: int = 768, C: int = 14,
                  precision: str = "f32", dims_T: int = 768) -> float:
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import (
        TimeGANConfig, adaptive_dims, fused_gen_refine, sample_noise, timegan_init,
    )
    from eegsynth.nn.precision import cast_floating, compute_dtype

    # dims follow the TRAINING length (a long-horizon drive generates T >>
    # train-T from the same trained z28/h56 model — generate_long_synth.py)
    z_dim, h_dim = adaptive_dims(C, dims_T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim)
    dtype = compute_dtype(precision)
    params = cast_floating(timegan_init(jax.random.key(0), cfg), dtype)
    z0 = sample_noise(jax.random.key(1), batch, T, cfg.z_dim).astype(dtype)

    @jax.jit
    def run(params, z, k):
        def body(i, carry):
            z, acc = carry
            _, x = fused_gen_refine(params, z, with_decode=True)
            s = jnp.mean(x.astype(jnp.float32))   # depends on the whole output
            # next input depends on output; cast keeps the carry dtype stable
            z = z * 0.999 + (1e-4 * s).astype(z.dtype)
            return (z, acc + s)
        _, acc = jax.lax.fori_loop(0, k, body, (z, jnp.float32(0.0)))
        return acc

    float(run(params, z0, jnp.int32(2)))          # compile + warm
    t0 = time.perf_counter()
    float(run(params, z0, jnp.int32(iters)))      # host pull = true barrier
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_timegan_stream(batch: int, T: int, time_chunk: int, C: int = 14,
                         precision: str = "f32", reps: int = 3) -> float:
    """Streaming (``time_chunk``) long-horizon synthesis: carried-state
    per-chunk dispatches — the `synthesize(time_chunk=...)` deployment path.
    Chunk i+1's carry is data-dependent on chunk i (no runtime dedupe) and
    the clock stops on a host pull of the final chunk's mean. Device memory
    holds one (batch, time_chunk, C) buffer regardless of T — this is the
    watchdog-safe path for arbitrary horizons (each dispatch's device time is
    bounded by time_chunk, BASELINE.md round-5 long-T section)."""
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import (
        TimeGANConfig, adaptive_dims, cascade_init_carry, sample_noise,
        timegan_init,
    )
    from eegsynth.nn.precision import cast_floating, compute_dtype
    from eegsynth.train.timegan import _synth_step

    z_dim, h_dim = adaptive_dims(C, 768)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim)
    dtype = compute_dtype(precision)
    params = cast_floating(timegan_init(jax.random.key(0), cfg), dtype)

    def one_pass(key):
        carry = cascade_init_carry(params, batch, dtype)
        last = None
        for t0 in range(0, T, time_chunk):
            key, sub = jax.random.split(key)
            z = sample_noise(sub, batch, time_chunk, cfg.z_dim).astype(dtype)
            last, carry = _synth_step(params, z, carry)
        return float(jnp.mean(last.astype(jnp.float32)))  # host-pull barrier

    one_pass(jax.random.key(1))                            # compile + warm
    t0 = time.perf_counter()
    for r in range(reps):
        one_pass(jax.random.key(2 + r))
    dt = time.perf_counter() - t0
    return batch * reps / dt


def parity_long(batch: int, T: int, time_chunk: int, C: int = 14,
                precision: str = "f32") -> float:
    """On-chip chunked-vs-oneshot equality at a LONG horizon: the same noise
    tensor through (a) one fused-scan dispatch and (b) carried-state
    time_chunk dispatches. GRUs are strictly causal, so the streams must
    agree to fp-accumulation noise; returns max|Δ| (asserted tiny by caller).
    This is tests/test_timegan_fused.py's property, executed on the real
    chip's compiled executables at reference long-T scale."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import (
        TimeGANConfig, adaptive_dims, cascade_init_carry, sample_noise,
        timegan_init,
    )
    from eegsynth.nn.precision import cast_floating, compute_dtype
    from eegsynth.train.timegan import _synth_run, _synth_step

    z_dim, h_dim = adaptive_dims(C, 768)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim)
    dtype = compute_dtype(precision)
    params = cast_floating(timegan_init(jax.random.key(0), cfg), dtype)
    z = sample_noise(jax.random.key(1), batch, T, cfg.z_dim).astype(dtype)

    one = np.asarray(_synth_run(params, z))
    carry = cascade_init_carry(params, batch, dtype)
    pieces = []
    for t0 in range(0, T, time_chunk):
        x, carry = _synth_step(params, z[:, t0:t0 + time_chunk], carry)
        pieces.append(np.asarray(x))
    return float(np.abs(one - np.concatenate(pieces, axis=1)).max())


def bench_cgan(batch: int, iters: int, num_classes: int = 9) -> float:
    import jax
    import jax.numpy as jnp
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, generator_apply, generator_init,
    )

    cfg = build_cfg(CGANHParams(), num_classes)
    G, bn = generator_init(jax.random.key(0), cfg)
    z0 = jax.random.normal(jax.random.key(1), (batch, cfg.noise_dim))
    labels = jnp.arange(batch, dtype=jnp.int32) % num_classes

    @jax.jit
    def run(G, bn, z, k):
        def body(i, carry):
            z, acc = carry
            x, _ = generator_apply(G, bn, z, labels, cfg, train=False)
            s = jnp.mean(x)
            z = z * 0.999 + 1e-4 * s
            return (z, acc + s)
        _, acc = jax.lax.fori_loop(0, k, body, (z, jnp.float32(0.0)))
        return acc

    float(run(G, bn, z0, jnp.int32(2)))
    t0 = time.perf_counter()
    float(run(G, bn, z0, jnp.int32(iters)))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[512, 2048, 4096])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", type=str, default="both",
                    choices=["timegan", "cgan", "both"])
    ap.add_argument("--precision", type=str, default="f32",
                    choices=["f32", "bf16"],
                    help="TimeGAN cascade compute precision (cgan bench is f32)")
    ap.add_argument("--T", type=int, default=768,
                    help="sequence length (long-horizon rows: 7680 = 60 s, "
                         "8192 = the reference's own gen_len example); model "
                         "dims stay at the trained-768 shape")
    ap.add_argument("--time_chunk", type=int, default=None,
                    help="also bench the streaming carried-state path at this "
                         "chunk length")
    ap.add_argument("--stream_only", action="store_true",
                    help="skip the one-shot row (e.g. f32 one-shot at "
                         "batch 2048 × T 7680+ exceeds the 16 GB HBM — the "
                         "streaming path is the memory-bounded route there)")
    ap.add_argument("--parity", action="store_true",
                    help="run the on-chip chunked-vs-oneshot equality check "
                         "at (--batch[0], --T, --time_chunk)")
    args = ap.parse_args()

    if args.parity:
        tc = args.time_chunk or 1024
        d = parity_long(args.batch[0], args.T, tc, precision=args.precision)
        print(f"timegan parity batch={args.batch[0]} T={args.T} "
              f"chunk={tc} {args.precision}: max|oneshot-chunked|={d:.3e}",
              flush=True)
        assert d <= (5e-5 if args.precision == "f32" else 5e-2), d
        return

    for b in args.batch:
        if args.model in ("timegan", "both"):
            if not args.stream_only:
                w = bench_timegan(b, args.iters, T=args.T,
                                  precision=args.precision)
                print(f"timegan synth  batch={b:5d} T={args.T} "
                      f"{args.precision}: {w:,.0f} windows/s = "
                      f"{w * args.T:,.0f} samples/s", flush=True)
            if args.time_chunk:
                ws = bench_timegan_stream(b, args.T, args.time_chunk,
                                          precision=args.precision)
                print(f"timegan stream batch={b:5d} T={args.T} "
                      f"chunk={args.time_chunk} {args.precision}: "
                      f"{ws:,.0f} windows/s = {ws * args.T:,.0f} samples/s",
                      flush=True)
        if args.model in ("cgan", "both"):
            w = bench_cgan(b, args.iters)
            print(f"cgan   synth  batch={b:5d}: {w:,.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
