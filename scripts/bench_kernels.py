#!/usr/bin/env python3
"""Kernel micro-benchmarks on the real TPU: XLA scan-GRU vs the fused Pallas
GRU sequence kernel across hidden sizes.

Timing protocol (CLAUDE.md): the remote TPU runtime dedupes repeated identical
dispatches and block_until_ready can acknowledge early, so each iteration is
chained on the previous one's output (h0 ← last hidden state) and the clock
stops only on a host pull of a scalar data-dependent on the whole chain.

Usage: python -u scripts/bench_kernels.py [--hs 56,128,256,512] [--batch 64]
       [--seq 768] [--iters 20] [--backward]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_one(H, B, T, iters, impl, backward):
    import jax
    import jax.numpy as jnp
    from eegsynth.nn.gru import gru_apply, gru_init

    params = gru_init(jax.random.key(0), H, H)   # square in/out: worst case for hoisting
    x = jax.random.normal(jax.random.key(1), (B, T, H), jnp.float32)

    if backward:
        def loss(params, x, h0):
            return jnp.sum(gru_apply(params, x, h0, impl=impl) ** 2)

        vg = jax.value_and_grad(loss)

        @jax.jit
        def step(params, x, h0):
            val, g = vg(params, x, h0)
            # chain: next h0 depends on this step's gradient (whole backward)
            h0_next = jnp.tanh(h0 + jnp.sum(g["w_hh"]) * 1e-6)
            return val, h0_next
    else:
        @jax.jit
        def step(params, x, h0):
            ys = gru_apply(params, x, h0, impl=impl)
            return jnp.sum(ys[:, -1, :]), ys[:, -1, :]   # chain on final hidden

    h0 = jnp.zeros((B, H), jnp.float32)
    val, h0 = step(params, x, h0)        # compile + warmup
    float(val)
    t0 = time.perf_counter()
    for _ in range(iters):
        val, h0 = step(params, x, h0)
    acc = float(val)                      # host pull: true barrier on the chain
    dt = (time.perf_counter() - t0) / iters
    assert acc == acc, "NaN in chained benchmark"
    return dt * 1e3                       # ms / call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hs", type=str, default="56,128,256,512")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--backward", action="store_true",
                    help="time value_and_grad instead of forward only")
    args = ap.parse_args()

    import jax
    print(f"backend={jax.default_backend()}  B={args.batch} T={args.seq} "
          f"iters={args.iters} mode={'fwd+bwd' if args.backward else 'fwd'}",
          flush=True)
    print(f"{'H':>5} {'xla ms':>9} {'pallas ms':>9} {'speedup':>8}", flush=True)
    for H in [int(h) for h in args.hs.split(",")]:
        ms_x = bench_one(H, args.batch, args.seq, args.iters, "xla", args.backward)
        ms_p = bench_one(H, args.batch, args.seq, args.iters, "pallas", args.backward)
        print(f"{H:>5} {ms_x:>9.2f} {ms_p:>9.2f} {ms_x / ms_p:>8.2f}x", flush=True)


if __name__ == "__main__":
    main()
