#!/usr/bin/env python3
"""Bisect the remote-runtime crash on vmapped GAN-chunk executables at nb>=8.

Round-3 finding (CLAUDE.md): this environment's remote TPU runtime kills its
worker process ("TPU worker process crashed or restarted") when COMPILING the
vmapped multi-bucket GAN-chunk executable with nb >= 8 stacked buckets
(nb <= 7 fine; AE/SUP phases fine at any nb; round 2's environment ran
nb=18), forcing `train_all_buckets(max_stack=7)` sub-stacks that cost ~20%
aggregate throughput on the reference's 18-bucket workload
(timeGAN/train_timegan.py:468-495). This harness isolates WHICH graph
dimension triggers the crash: one case per invocation (a worker crash kills
the process, so a driver loop runs cases as subprocesses), parameterized over
nb, chunk length, fused vs composed step, R1 formulation, traced weights,
batch, and T.

Usage (one case):
  python -u scripts/bisect_nb8.py --nb 8 --chunk 50 --steps 100
Driver loop example:
  for nb in 7 8; do timeout 1200 python -u scripts/bisect_nb8.py --nb $nb \
      --chunk 50 --steps 50 || echo "CASE nb=$nb FAILED rc=$?"; done

Prints one summary line per case:
  BISECT {"nb": 8, ..., "compile_s": 93.1, "run_s": 4.2, "ok": true}
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nb", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--steps", type=int, default=500,
                    help="total GAN steps to dispatch (>=1 chunk)")
    ap.add_argument("--batch", type=int, default=63)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--ch", type=int, default=14)
    ap.add_argument("--n", type=int, default=63, help="windows per bucket")
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--direct-r1", action="store_true",
                    help="reverse-over-reverse R1 instead of fwd-over-rev")
    ap.add_argument("--no-r1", action="store_true")
    ap.add_argument("--weights", action="store_true",
                    help="traced (nb,4) G-weight matrix (bucket_weights path)")
    ap.add_argument("--donate", action="store_true",
                    help="donate the carried state buffers")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import eegsynth  # noqa: F401  (persistent compile cache)
    from eegsynth.models.timegan import TimeGANConfig, adaptive_dims, timegan_init
    from eegsynth.train import timegan as tg
    from eegsynth.train.timegan import TimeGANHParams, make_gan_chunk, make_gan_opts

    if args.direct_r1:
        tg._R1_FWD_OVER_REV = False

    nb, T, C, N, B = args.nb, args.seq, args.ch, args.n, args.batch
    z_dim, h_dim = adaptive_dims(C, T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim)
    hp = TimeGANHParams(batch_size=B, gan_steps=args.steps, chunk=args.chunk,
                        fused_step=not args.no_fused,
                        r1_gamma=0.0 if args.no_r1 else 1.0)

    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(42), i))(
        jnp.arange(nb))
    params = jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)
    X = jax.random.uniform(jax.random.key(1), (nb, N, T, C), jnp.float32)
    n_valid = jnp.full((nb,), float(N), jnp.float32)
    optD, optG = make_gan_opts(hp)
    d_state = jax.vmap(lambda p: optD.init(p["discriminator"]))(params)
    g_state = jax.vmap(lambda p: optG.init(
        {k: p[k] for k in ("generator", "supervisor", "embedder",
                           "recovery")}))(params)
    gw = (jnp.tile(jnp.asarray([hp.alpha_sup, hp.beta_rec, hp.gamma_cov,
                                hp.gamma_acf], jnp.float32), (nb, 1))
          if args.weights else None)

    runner = make_gan_chunk(cfg, hp, optD, optG, None)(
        min(B, N), with_valid_n=True, vmapped=True, with_weights=args.weights)
    if args.donate:
        # same positional layout as make_gan_chunk's runner: donate the six
        # carried state trees (params, opt states, best tracking)
        inner = runner
        runner = jax.jit(lambda *a: inner(*a), donate_argnums=(0, 1, 2, 3, 4, 5))

    best_params = params
    best_loss = jnp.full((nb,), jnp.inf, jnp.float32)
    best_step = jnp.zeros((nb,), jnp.int32)

    case = {k: getattr(args, k.replace("-", "_")) for k in
            ("nb", "chunk", "steps", "batch", "seq", "n", "weights", "donate")}
    case["fused"] = not args.no_fused
    case["r1"] = "off" if args.no_r1 else ("direct" if args.direct_r1
                                           else "fwd_over_rev")
    print(f"[bisect] case {case} — compiling...", flush=True)

    t0 = time.perf_counter()
    done = 0
    first = None
    logs = None
    while done < args.steps:
        ns = min(args.chunk, args.steps - done)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED0004))(keys)
        steps_arr = jnp.arange(1, ns + 1, dtype=jnp.int32)
        extra = (n_valid, gw) if args.weights else (n_valid,)
        (params, d_state, g_state, best_params, best_loss, best_step,
         _), logs = runner(params, d_state, g_state, best_params, best_loss,
                           best_step, keys, jnp.int32(done), steps_arr, X,
                           *extra)
        if first is None:
            # host pull barrier: stop the compile clock on real data
            np.asarray(logs[:, -1, 0])
            first = time.perf_counter() - t0
            t_run = time.perf_counter()
        done += ns
    row = np.asarray(logs[:, -1, :])      # chained host-pull barrier
    ok = bool(np.isfinite(row).all())
    out = {**case, "compile_plus_first_s": round(first, 1), "ok": ok}
    if done > args.chunk:
        # warm rate over the post-first-chunk dispatches only; with a single
        # dispatch there is no warm window, so the timing keys are OMITTED
        # rather than printed as 0/NaN masquerading as a measurement
        run_s = time.perf_counter() - t_run
        out["run_s"] = round(run_s, 2)
        out["agg_steps_per_s"] = round(nb * (args.steps - args.chunk) / run_s, 1)
    print("BISECT " + json.dumps(out), flush=True)
    sys.exit(0 if ok else 3)


if __name__ == "__main__":
    main()
