"""Distributed tier (SURVEY §4): data-parallel training equals single-device.

Runs the identical GAN chunk (same PRNG key, same data) without a mesh and with
an 8-virtual-device data mesh; GSPMD's inserted collectives must reproduce the
single-device numerics to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.train.sharding import data_mesh, round_batch_to_mesh
from eegsynth.train.timegan import TimeGANHParams, make_gan_chunk, make_gan_opts


def _run(mesh, params, X, hp, cfg, batch):
    optD, optG = make_gan_opts(hp, milestones=(2, 3))
    d_state = optD.init(params["discriminator"])
    gser = {k: params[k] for k in ("generator", "supervisor", "embedder", "recovery")}
    g_state = optG.init(gser)
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        params = jax.device_put(params, repl)
        X = jax.device_put(X, repl)
    chunk = make_gan_chunk(cfg, hp, optD, optG, mesh)(batch)
    out, logs = chunk(params, d_state, g_state, params, jnp.float32(np.inf),
                      jnp.int32(0), jax.random.key(7), jnp.int32(0),
                      jnp.arange(1, 4, dtype=jnp.int32), X)
    return np.asarray(logs), jax.tree_util.tree_map(np.asarray, out[0])


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = TimeGANConfig(x_dim=4, z_dim=16, h_dim=32)
    hp = TimeGANHParams(batch_size=16, gan_steps=4, chunk=4, acf_max_lag=8)
    params = timegan_init(jax.random.key(0), cfg)
    X = jax.random.uniform(jax.random.key(1), (24, 32, 4), jnp.float32)
    batch = round_batch_to_mesh(16, data_mesh(jax.devices()[:8]))
    assert batch == 16

    logs_single, params_single = _run(None, params, X, hp, cfg, batch)
    mesh = data_mesh(jax.devices()[:8])
    logs_mesh, params_mesh = _run(mesh, params, X, hp, cfg, batch)

    assert np.isfinite(logs_single).all()
    np.testing.assert_allclose(logs_mesh, logs_single, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_mesh),
                    jax.tree_util.tree_leaves(params_single)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


@pytest.mark.slow
def test_cgan_data_parallel_matches_single_device():
    """Same CGAN epoch (transformer arch, v1 losses) with and without an
    8-device data mesh must agree to float tolerance."""
    import optax
    from eegsynth.data.datasets import build_label_table
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, disc_init, generator_init, make_cgan_epoch,
    )

    assert len(jax.devices()) >= 8
    hp = CGANHParams(batch_size=16, arch="transformer", variant="v1",
                     tf_dim=32, tf_depth=1, tf_heads=2, tf_patch=8,
                     local_crop=256, use_diffaugment=False)
    cfg = build_cfg(hp, 9)
    key = jax.random.key(0)
    G0, bn0 = generator_init(key, cfg)
    D0 = {"dg": disc_init(jax.random.fold_in(key, 1), cfg),
          "dl": disc_init(jax.random.fold_in(key, 2), cfg)}
    X = jax.random.uniform(jax.random.key(1), (36, 14, 768), jnp.float32)
    y = np.repeat(np.arange(1, 10), 4)
    tab_np, cnt_np = build_label_table(y, 9, 1)

    def run(mesh):
        G, bn, D = G0, bn0, D0
        X_, tab, cnt = X, jnp.asarray(tab_np), jnp.asarray(cnt_np, jnp.float32)
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            G, D, X_ = jax.device_put((G, D, X_), repl)
        optG, optD = optax.adam(1e-4), optax.adam(1e-4)
        ema = G  # EMA starts as the generator (arrays are immutable)
        epoch = make_cgan_epoch(cfg, hp, optG, optD, 2, prewarm=False, mesh=mesh)
        G, bn, D, ema, _, _, logs = epoch(G, bn, D, ema, optG.init(G),
                                          optD.init(D), X_, tab, cnt,
                                          jnp.float32(0.1), jax.random.key(7))
        return np.asarray(logs), jax.tree_util.tree_map(np.asarray, G)

    logs_single, G_single = run(None)
    logs_mesh, G_mesh = run(data_mesh(jax.devices()[:8]))
    assert np.isfinite(logs_single).all()
    np.testing.assert_allclose(logs_mesh, logs_single, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(G_mesh),
                    jax.tree_util.tree_leaves(G_single)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_mesh_from_flags():
    from eegsynth.train.sharding import mesh_from_flags
    assert mesh_from_flags(False) is None
    m = mesh_from_flags(True)
    assert m is not None and m.devices.size == len(jax.devices())
