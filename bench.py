#!/usr/bin/env python3
"""Headline benchmark: TimeGAN joint-adversarial training steps/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline: the reference PyTorch implementation's GAN phase (disc_step+gen_step,
train_timegan.py:166-276) measured on CPU in this container on the same bucket
(posture1_no_exo, batch 26): 0.334 steps/s (15 steps in 44.98 s, after 3-step
warmup). The driver-set north star is ≥20× that on TPU.

Protocol: real committed bucket (26, 768, 14); config-JSON hyperparameters;
one warmup chunk (compile + cache), then 1000 timed steady-state steps.

Secondary fields (same JSON line, primary keys unchanged so old parsers keep
working) cover the flagship paths the single-bucket number cannot see:
- ``multibucket_agg_steps_per_sec``: warm chunk-level aggregate rate of the
  vmapped 18-bucket trainer (the reference's FULL workload shape in ONE
  executable, train/timegan_multi.py; watchdog-budgeted chunk=125).
- ``synth_windows_per_sec_bf16``: fused single-scan G→S→R cascade, bf16
  compute, B=2048, in-jit chained-generation protocol (bench_synthesis.py).
Secondary legs are best-effort: a failure leaves the field null rather than
breaking the primary metric.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

REFERENCE_CPU_STEPS_PER_SEC = 0.334
BUCKET = Path("/root/reference/timeGAN/preprocessed/posture1_no_exo.npz")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import TimeGANConfig, adaptive_dims, timegan_init
    from eegsynth.train.timegan import (
        TimeGANHParams, make_gan_chunk, make_gan_opts,
    )

    if BUCKET.exists():
        X_host = np.load(BUCKET)["X"].astype(np.float32)
    else:  # fallback: same shape/scale as the real bucket
        X_host = np.random.default_rng(0).uniform(0, 1, (26, 768, 14)).astype(np.float32)
    N, T, C = X_host.shape
    z_dim, h_dim = adaptive_dims(C, T)
    cfg = TimeGANConfig(x_dim=C, z_dim=z_dim, h_dim=h_dim)
    hp = TimeGANHParams(chunk=250)  # defaults == configs/timegan_config.json

    params = timegan_init(jax.random.key(hp.seed), cfg)
    X = jnp.asarray(X_host)
    optD, optG = make_gan_opts(hp)
    d_state = optD.init(params["discriminator"])
    gser = {k: params[k] for k in ("generator", "supervisor", "embedder", "recovery")}
    g_state = optG.init(gser)

    gan_chunk = make_gan_chunk(cfg, hp, optD, optG, None)(min(hp.batch_size, N))

    def run_chunk(carry, step0):
        params, d_state, g_state, best_p, best_l, best_s, key = carry
        key, sub = jax.random.split(key)
        out, logs = gan_chunk(params, d_state, g_state, best_p, best_l, best_s,
                              sub, jnp.int32(step0),
                              jnp.arange(1, hp.chunk + 1, dtype=jnp.int32), X)
        # device→host scalar pull: through the remote TPU attachment,
        # block_until_ready can acknowledge before execution finishes (and the
        # runtime dedupes repeated identical dispatches) — only a host read of
        # a value data-dependent on the whole chunk is a true barrier
        float(logs[-1, 0])
        return out, logs

    carry = (params, d_state, g_state, params, jnp.float32(np.inf),
             jnp.int32(0), jax.random.key(0))
    carry, _ = run_chunk(carry, 0)  # warmup: compile + first chunk

    timed_steps = 1000
    t0 = time.perf_counter()
    done = hp.chunk
    while done < hp.chunk + timed_steps:
        carry, logs = run_chunk(carry, done)
        done += hp.chunk
    dt = time.perf_counter() - t0
    steps_per_sec = timed_steps / dt

    out = {
        "metric": "timegan_joint_phase_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
        "multibucket_agg_steps_per_sec": None,
        "synth_windows_per_sec_bf16": None,
        "synth_long_T8192_samples_per_sec_bf16": None,
    }

    try:
        out["multibucket_agg_steps_per_sec"] = round(
            bench_multibucket(cfg), 1)
    except Exception as e:  # secondary leg must not break the primary metric
        print(f"# multibucket leg failed: {e!r}", file=sys.stderr)
    try:
        out["synth_windows_per_sec_bf16"] = round(bench_synth_bf16(cfg))
    except Exception as e:
        print(f"# synth leg failed: {e!r}", file=sys.stderr)
    try:
        # long-horizon leg (the reference's own gen_len example scale —
        # BASELINE.md round-5 long-T table): samples/s so the number is
        # comparable across horizons
        w = bench_synth_bf16(cfg, batch=512, iters=10, T=8192)
        out["synth_long_T8192_samples_per_sec_bf16"] = round(w * 8192)
    except Exception as e:
        print(f"# long-T synth leg failed: {e!r}", file=sys.stderr)

    print(json.dumps(out))


def bench_multibucket(cfg, nb=18, N=63, chunk=125, timed_chunks=2, T=768):
    """Warm aggregate bucket-steps/s of the vmapped 18-bucket GAN trainer
    (one executable, dispatch length under the ~35 s watchdog budget —
    CLAUDE.md / BASELINE.md round-4 table)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import timegan_init
    from eegsynth.train.timegan import TimeGANHParams, make_gan_chunk, make_gan_opts

    hp = TimeGANHParams(batch_size=N, chunk=chunk, fused_step=True)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(42), i))(
        jnp.arange(nb))
    params = jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)
    X = jax.random.uniform(jax.random.key(1), (nb, N, T, cfg.x_dim),
                           jnp.float32)
    n_valid = jnp.full((nb,), float(N), jnp.float32)
    optD, optG = make_gan_opts(hp)
    d_state = jax.vmap(lambda p: optD.init(p["discriminator"]))(params)
    g_state = jax.vmap(lambda p: optG.init(
        {k: p[k] for k in ("generator", "supervisor", "embedder",
                           "recovery")}))(params)
    runner = make_gan_chunk(cfg, hp, optD, optG, None)(
        N, with_valid_n=True, vmapped=True)

    carry = (params, d_state, g_state, params,
             jnp.full((nb,), np.inf, jnp.float32),
             jnp.zeros((nb,), jnp.int32))
    done, t0 = 0, None
    for i in range(1 + timed_chunks):
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 0x5EED0004))(keys)
        (*carry, _), logs = runner(*carry, keys, jnp.int32(done),
                                   jnp.arange(1, chunk + 1, dtype=jnp.int32),
                                   X, n_valid)
        done += chunk
        if i == 0:
            float(logs[-1, -1, 0])       # host-pull barrier ends the warmup
            t0 = time.perf_counter()
    float(logs[-1, -1, 0])               # chained state → true barrier
    return nb * chunk * timed_chunks / (time.perf_counter() - t0)


def bench_synth_bf16(cfg, batch=2048, iters=10, T=768):
    """bf16 fused G→S→R cascade windows/s, in-jit chained-generation loop
    (scripts/bench_synthesis.py protocol, compacted)."""
    import jax
    import jax.numpy as jnp
    from eegsynth.models.timegan import fused_gen_refine, sample_noise, timegan_init
    from eegsynth.nn.precision import cast_floating, compute_dtype

    dtype = compute_dtype("bf16")
    params = cast_floating(timegan_init(jax.random.key(0), cfg), dtype)
    z0 = sample_noise(jax.random.key(1), batch, T, cfg.z_dim).astype(dtype)

    @jax.jit
    def run(params, z, k):
        def body(i, carry):
            z, acc = carry
            _, x = fused_gen_refine(params, z, with_decode=True)
            s = jnp.mean(x.astype(jnp.float32))
            z = z * 0.999 + (1e-4 * s).astype(z.dtype)
            return (z, acc + s)
        _, acc = jax.lax.fori_loop(0, k, body, (z, jnp.float32(0.0)))
        return acc

    float(run(params, z0, jnp.int32(2)))      # compile + warm
    t0 = time.perf_counter()
    float(run(params, z0, jnp.int32(iters)))  # host pull = true barrier
    return batch * iters / (time.perf_counter() - t0)


if __name__ == "__main__":
    main()
