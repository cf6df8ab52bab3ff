#!/usr/bin/env python3
"""Headline benchmark: TimeGAN joint-adversarial training steps/sec on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference PyTorch implementation's GAN phase (disc_step+gen_step,
train_timegan.py:166-276) measured on CPU in this container on the same bucket
(posture1_no_exo, batch 26): 0.334 steps/s (15 steps in 44.98 s, after 3-step
warmup). The driver-set north star is ≥20× that on TPU.

Protocol: real committed bucket (26, 768, 14); config-JSON hyperparameters;
one warmup chunk (compile + cache), then 1000 timed steady-state steps.
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

    print(json.dumps({
        "metric": "timegan_joint_phase_train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
