"""Parity of the fused multi-network multi-bucket Pallas kernel against the
XLA fused scan it replaces (interpret mode — no TPU in CI)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from eegsynth.models.timegan import (
    TimeGANConfig, fused_disc_inputs, timegan_init,
)
from eegsynth.nn.pallas_multigru import multigru_disc_inputs_pallas

NB, B, T = 3, 8, 12


def _stacked_params(cfg):
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(0), i))(
        jnp.arange(NB))
    return jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)


def test_multigru_matches_xla_fused_scan():
    cfg = TimeGANConfig(x_dim=5, z_dim=16, h_dim=24)
    params = _stacked_params(cfg)
    x = jax.random.uniform(jax.random.key(1), (NB, B, T, cfg.x_dim))
    z = jax.random.uniform(jax.random.key(2), (NB, B, T, cfg.z_dim))

    ref_r, ref_f = jax.vmap(fused_disc_inputs)(params, x, z)
    got_r, got_f = multigru_disc_inputs_pallas(params, x, z, interpret=True)
    assert got_r.shape == (NB, B, T, cfg.z_dim)
    assert got_f.shape == (NB, B, T, cfg.z_dim)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-5)


def test_custom_vmap_dispatch():
    """disc_inputs_multigru: unbatched == fused_disc_inputs; under vmap the
    batching rule fires the all-bucket Pallas kernel (interpret off-TPU) and
    matches jax.vmap of the XLA fused scan."""
    from eegsynth.models.timegan import disc_inputs_multigru

    cfg = TimeGANConfig(x_dim=5, z_dim=16, h_dim=24)
    params = _stacked_params(cfg)
    x = jax.random.uniform(jax.random.key(5), (NB, B, T, cfg.x_dim))
    z = jax.random.uniform(jax.random.key(6), (NB, B, T, cfg.z_dim))

    ref = jax.vmap(fused_disc_inputs)(params, x, z)
    got = jax.jit(jax.vmap(disc_inputs_multigru))(params, x, z)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # unbatched call == plain fused scan, bit-exact
    take = jax.tree_util.tree_map(lambda a: a[0], params)
    one = disc_inputs_multigru(take, x[0], z[0])
    exp = fused_disc_inputs(take, x[0], z[0])
    for a, b in zip(one, exp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gan_chunk_pallas_equivalence():
    """The vmapped GAN chunk with pallas_multigru=True matches the XLA
    fused-step chunk step-for-step (same RNG stream, same math)."""
    from eegsynth.train.timegan import (
        TimeGANHParams, make_gan_chunk, make_gan_opts, sample_noise,
    )
    import optax  # noqa: F401

    cfg = TimeGANConfig(x_dim=5, z_dim=16, h_dim=24)
    params = _stacked_params(cfg)
    nb, n_max, Tt = NB, 10, T
    X = jax.random.uniform(jax.random.key(7), (nb, n_max, Tt, cfg.x_dim),
                           jnp.float32)
    n_valid = jnp.array([10., 7., 9.], jnp.float32)
    keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.key(1), i))(
        jnp.arange(nb))

    outs = []
    for use_pallas in (False, True):
        hp = TimeGANHParams(batch_size=4, gan_steps=4, chunk=4, dropout=0.0,
                            fused_step=True, pallas_multigru=use_pallas)
        optD, optG = make_gan_opts(hp)
        d_state = jax.vmap(lambda p: optD.init(p["discriminator"]))(params)
        g_state = jax.vmap(lambda p: optG.init(
            {k: p[k] for k in ("generator", "supervisor", "embedder",
                               "recovery")}))(params)
        chunk = make_gan_chunk(cfg, hp, optD, optG, None)(
            4, with_valid_n=True, vmapped=True)
        (p_out, *_), logs = chunk(
            params, d_state, g_state, params,
            jnp.full((nb,), jnp.inf, jnp.float32),
            jnp.zeros((nb,), jnp.int32), keys, jnp.int32(0),
            jnp.arange(1, 5, dtype=jnp.int32), X, n_valid)
        outs.append((p_out, logs))

    (p_a, logs_a), (p_b, logs_b) = outs
    np.testing.assert_allclose(np.asarray(logs_b), np.asarray(logs_a),
                               rtol=2e-4, atol=2e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-5), p_a, p_b)


def test_multigru_reference_dims():
    """The real vmapped geometry's dims (z=28, h=56 — adaptive_dims for C=14):
    distinct hidden sizes per net exercise the He/Hg/Hs slicing."""
    cfg = TimeGANConfig(x_dim=14, z_dim=28, h_dim=56)
    params = _stacked_params(cfg)
    x = jax.random.uniform(jax.random.key(3), (NB, 4, 16, cfg.x_dim))
    z = jax.random.uniform(jax.random.key(4), (NB, 4, 16, cfg.z_dim))
    ref = jax.vmap(fused_disc_inputs)(params, x, z)
    got = multigru_disc_inputs_pallas(params, x, z, interpret=True)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
