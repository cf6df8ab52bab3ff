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
                  precision: str = "f32") -> float:
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import (
        TimeGANConfig, adaptive_dims, fused_gen_refine, sample_noise, timegan_init,
    )
    from eegsynth.nn.precision import cast_floating, compute_dtype

    z_dim, h_dim = adaptive_dims(C, T)
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
    args = ap.parse_args()

    for b in args.batch:
        if args.model in ("timegan", "both"):
            w = bench_timegan(b, args.iters, precision=args.precision)
            print(f"timegan synth  batch={b:5d} {args.precision}: "
                  f"{w:,.0f} windows/s", flush=True)
        if args.model in ("cgan", "both"):
            w = bench_cgan(b, args.iters)
            print(f"cgan   synth  batch={b:5d}: {w:,.0f} windows/s", flush=True)


if __name__ == "__main__":
    main()
