"""Epoch-cycled DataLoader emulation (hp.epoch_cycle A/B instrument).

Covers the sampling property the reference's GAN phase has and our default
sampler deliberately does not (train/timegan.py module docstring): within one
epoch every sample id is visited at most once, consecutive batches partition
the epoch's permutation, and the cycle reshuffles at epoch boundaries
(reference timeGAN/train_timegan.py:166-175 DataLoader semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.train.timegan import (
    TimeGANHParams, _epoch_cycle_next, make_gan_chunk, make_gan_opts,
)


def test_epoch_cycle_partitions_each_epoch():
    N, B = 10, 3  # spe = 3, short tail of 1 dropped per epoch
    spe = N // B

    def step(carry, key):
        perm, cursor = carry
        idx, perm, cursor = _epoch_cycle_next(perm, cursor, key, B)
        return (perm, cursor), idx

    keys = jax.random.split(jax.random.key(0), 4 * spe)
    (_, cursor), idxs = jax.lax.scan(
        step, (jnp.zeros(N, jnp.int32), jnp.int32(0)), keys)
    idxs = np.asarray(idxs)  # (12, 3)

    assert int(cursor) == 0  # 4 whole epochs consumed
    for e in range(4):
        epoch = idxs[e * spe:(e + 1) * spe].ravel()
        # batches within an epoch are disjoint slices of one permutation
        assert len(set(epoch.tolist())) == spe * B
        assert set(epoch.tolist()) <= set(range(N))
    # reshuffling actually happens: epochs differ somewhere
    assert any(not np.array_equal(idxs[0], idxs[e * spe]) for e in range(1, 4))


def test_epoch_cycle_full_batch_reduces_to_permutation():
    # B == N: every step is one whole epoch — cursor stays 0, idx is a
    # fresh permutation each step (== the default sampler at B_eff=N)
    N = 6
    perm, cursor = jnp.zeros(N, jnp.int32), jnp.int32(0)
    seen = []
    for i in range(3):
        idx, perm, cursor = _epoch_cycle_next(
            perm, cursor, jax.random.key(i), N)
        assert int(cursor) == 0
        assert sorted(np.asarray(idx).tolist()) == list(range(N))
        seen.append(np.asarray(idx))
    assert any(not np.array_equal(seen[0], s) for s in seen[1:])


def test_gan_chunk_epoch_cycle_runs_and_rejects_stacked():
    cfg = TimeGANConfig(x_dim=3, z_dim=4, h_dim=5, num_layers=1, dropout=0.0)
    hp = TimeGANHParams(batch_size=4, gan_steps=8, chunk=4, epoch_cycle=True,
                        acf_max_lag=4)
    optD, optG = make_gan_opts(hp)
    build = make_gan_chunk(cfg, hp, optD, optG)

    with pytest.raises(ValueError, match="epoch_cycle"):
        build(4, with_valid_n=True)

    runner = build(4)
    key = jax.random.key(0)
    params = timegan_init(key, cfg)
    d_state = optD.init(params["discriminator"])
    g_state = optG.init({k: params[k] for k in
                         ("generator", "supervisor", "embedder", "recovery")})
    X = jax.random.uniform(jax.random.key(1), (10, 12, 3), jnp.float32)
    out, logs = runner(params, d_state, g_state, params, jnp.float32(np.inf),
                       jnp.int32(0), key, jnp.int32(0),
                       jnp.arange(1, 5, dtype=jnp.int32), X)
    assert np.isfinite(np.asarray(logs)).all()

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
