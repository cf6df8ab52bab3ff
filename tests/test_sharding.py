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
from eegsynth.train.timegan import TimeGANHParams, _make_opt, _multistep_lr, make_gan_chunk


def _run(mesh, params, X, hp, cfg, batch):
    optD = _make_opt(_multistep_lr(hp.lr_d, (2, 3)), hp.grad_clip, hp.beta1, hp.beta2)
    optG = _make_opt(_multistep_lr(hp.lr_g, (2, 3)), hp.grad_clip, hp.beta1, hp.beta2)
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
