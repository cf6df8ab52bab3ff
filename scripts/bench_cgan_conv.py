#!/usr/bin/env python3
"""CGAN conv-lowering microbench: alternate formulations of the same math.

BASELINE.md's roofline puts the CGAN conv step at 17.3% of bf16 peak with a
diagnosed 2-3x f32 gap from conv lowering (im2col-style passes at channel
widths below the 128-lane tile). This bench A/Bs the candidate mitigations on
the two real stacks (D trunk: 5x sn-conv k4 s2; G stack: 5x upsample+conv k3)
at training batch sizes, fwd+bwd, chained-state protocol (CLAUDE.md timing
rules):

- nch:    the library's current lax.conv_general_dilated NCW layout
- nwc:    feature-minor NWC layout (lanes = channels)
- matmul: explicit static-slice im2col -> one (B*L, K*C) @ (K*C, O) matmul
          per layer (bypasses XLA's conv lowering entirely)

Usage: python -u scripts/bench_cgan_conv.py [--batch 64] [--iters 30]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DISC_CH = (14, 32, 64, 128, 256, 512)
GEN_CH = (512, 256, 128, 64, 32, 16)


def make_stacks(jnp, jax):
    def d_weights(key):
        ws = []
        for i in range(5):
            key, k = jax.random.split(key)
            ws.append((jax.random.normal(k, (DISC_CH[i + 1], DISC_CH[i], 4),
                                         jnp.float32) * 0.05,
                       jnp.zeros((DISC_CH[i + 1],), jnp.float32)))
        return ws

    def g_weights(key):
        ws = []
        for i in range(5):
            key, k = jax.random.split(key)
            ws.append((jax.random.normal(k, (GEN_CH[i + 1], GEN_CH[i], 3),
                                         jnp.float32) * 0.05,
                       jnp.zeros((GEN_CH[i + 1],), jnp.float32)))
        return ws
    return d_weights, g_weights


def build_fns(jax, jnp):
    import jax.lax as lax

    def conv_nch(x, w, b, stride, pad):
        y = lax.conv_general_dilated(x, w, (stride,), [(pad, pad)],
                                     dimension_numbers=("NCH", "OIH", "NCH"))
        return y + b[None, :, None]

    def conv_nwc(x, w, b, stride, pad):
        # x (B,L,C); w OIW -> WIO ("HIO")
        y = lax.conv_general_dilated(x, w.transpose(2, 1, 0), (stride,),
                                     [(pad, pad)],
                                     dimension_numbers=("NHC", "HIO", "NHC"))
        return y + b[None, None, :]

    def conv_matmul(x, w, b, stride, pad):
        # x (B,L,C); static-slice im2col, patch order (k-major, channel-minor)
        B, L, C = x.shape
        O, I, K = w.shape
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        L_out = (L + 2 * pad - K) // stride + 1
        cols = [xp[:, k:k + stride * L_out:stride, :] for k in range(K)]
        patches = jnp.stack(cols, axis=2).reshape(B, L_out, K * C)
        Wt = w.transpose(2, 1, 0).reshape(K * I, O)
        return patches @ Wt + b[None, None, :]

    def d_stack(kind, ws, x_nch):
        if kind == "nch":
            h = x_nch
            for w, b in ws:
                h = jax.nn.leaky_relu(conv_nch(h, w, b, 2, 1), 0.2)
            return jnp.mean(h, axis=2)
        h = x_nch.transpose(0, 2, 1)
        conv = conv_nwc if kind == "nwc" else conv_matmul
        for w, b in ws:
            h = jax.nn.leaky_relu(conv(h, w, b, 2, 1), 0.2)
        return jnp.mean(h, axis=1)

    def g_stack(kind, ws, h0_nch):
        if kind == "nch":
            h = h0_nch
            for w, b in ws:
                h = jnp.repeat(h, 2, axis=-1)
                h = jax.nn.relu(conv_nch(h, w, b, 1, 1))
            return h
        h = h0_nch.transpose(0, 2, 1)
        conv = conv_nwc if kind == "nwc" else conv_matmul
        for w, b in ws:
            h = jnp.repeat(h, 2, axis=1)
            h = jax.nn.relu(conv(h, w, b, 1, 1))
        return h.transpose(0, 2, 1)

    return d_stack, g_stack


def bench(step, x0, iters):
    """step must chain its output into its input; iters outer dispatches."""
    val, x = step(x0)
    float(val)                       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        val, x = step(x)
    acc = float(val)                 # host pull barrier on the chain
    assert acc == acc
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10,
                    help="outer dispatches (each runs --inner chained steps)")
    ap.add_argument("--inner", type=int, default=20,
                    help="in-jit chained iterations per dispatch (removes "
                         "enqueue overhead from the per-step number)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print(f"backend={jax.default_backend()} B={args.batch} "
          f"iters={args.iters}x{args.inner}", flush=True)
    d_weights, g_weights = make_stacks(jnp, jax)
    d_stack, g_stack = build_fns(jax, jnp)
    ws_d = d_weights(jax.random.key(0))
    ws_g = g_weights(jax.random.key(1))
    B, INNER = args.batch, args.inner

    results = {}
    for kind in ("nch", "nwc", "matmul"):
        def d_loss(ws, x):
            return jnp.sum(d_stack(kind, ws, x) ** 2)

        vg = jax.value_and_grad(d_loss)

        @jax.jit
        def d_step(x, _ws=tuple(ws_d), _k=kind):
            def body(_, carry):
                val, x = carry
                v, g = vg(list(_ws), x)
                return v, jnp.tanh(x + v * 1e-12 + g[0][0].sum() * 1e-9)
            return jax.lax.fori_loop(0, INNER, body, (jnp.float32(0), x))

        x0 = jax.random.normal(jax.random.key(2), (B, 14, 768), jnp.float32)
        ms_d = bench(d_step, x0, args.iters) / INNER

        def g_loss(ws, h):
            return jnp.sum(g_stack(kind, ws, h) ** 2)

        vg2 = jax.value_and_grad(g_loss)

        @jax.jit
        def g_step(h, _ws=tuple(ws_g), _k=kind):
            def body(_, carry):
                val, h = carry
                v, g = vg2(list(_ws), h)
                return v, jnp.tanh(h + v * 1e-12 + g[0][0].sum() * 1e-9)
            return jax.lax.fori_loop(0, INNER, body, (jnp.float32(0), h))

        h0 = jax.random.normal(jax.random.key(3), (B, 512, 24), jnp.float32)
        ms_g = bench(g_step, h0, args.iters) / INNER
        results[kind] = (ms_d, ms_g)
        print(f"{kind:>7}: D trunk fwd+bwd {ms_d:8.3f} ms | "
              f"G stack fwd+bwd {ms_g:8.3f} ms", flush=True)

    base_d, base_g = results["nch"]
    for kind in ("nwc", "matmul"):
        d, g = results[kind]
        print(f"{kind} vs nch: D {base_d / d:.2f}x  G {base_g / g:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
