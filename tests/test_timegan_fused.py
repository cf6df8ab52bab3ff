"""Fused GRU cascades == composed applications (forward and gradients)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from eegsynth.models.timegan import (
    TimeGANConfig, decode, fused_gen_refine, fused_reconstruct, gen_latent,
    reconstruct, refine_latent, timegan_init,
)


def _setup(z_dim=16, h_dim=24, x_dim=5):
    cfg = TimeGANConfig(x_dim=x_dim, z_dim=z_dim, h_dim=h_dim)
    params = timegan_init(jax.random.key(0), cfg)
    return cfg, params


def test_fused_gen_refine_matches_composition(rng):
    cfg, params = _setup()
    z = jnp.asarray(rng.uniform(0, 1, (3, 40, cfg.z_dim)).astype(np.float32))
    ref_h = refine_latent(params, gen_latent(params, z))
    got_h = fused_gen_refine(params, z)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=2e-6)

    got_h2, got_x = fused_gen_refine(params, z, with_decode=True)
    ref_x = decode(params, ref_h)
    np.testing.assert_allclose(np.asarray(got_h2), np.asarray(ref_h), atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref_x), atol=2e-6)


def test_fused_reconstruct_matches_composition(rng):
    cfg, params = _setup()
    x = jnp.asarray(rng.uniform(0, 1, (3, 40, cfg.x_dim)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(fused_reconstruct(params, x)),
                               np.asarray(reconstruct(params, x)), atol=2e-6)


def test_fused_gradients_match(rng):
    cfg, params = _setup()
    z = jnp.asarray(rng.uniform(0, 1, (2, 24, cfg.z_dim)).astype(np.float32))

    def loss_fused(p):
        h, x = fused_gen_refine(p, z, with_decode=True)
        return jnp.mean(h ** 2) + jnp.mean(x ** 2)

    def loss_ref(p):
        h = refine_latent(p, gen_latent(p, z))
        return jnp.mean(h ** 2) + jnp.mean(decode(p, h) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_identity_proj_path(rng):
    # h_dim == z_dim → generator/supervisor proj is None (reference Identity)
    cfg = TimeGANConfig(x_dim=4, z_dim=16, h_dim=16)
    params = timegan_init(jax.random.key(1), cfg)
    assert params["generator"]["proj"] is None
    z = jnp.asarray(rng.uniform(0, 1, (2, 20, 16)).astype(np.float32))
    ref_h = refine_latent(params, gen_latent(params, z))
    got_h = fused_gen_refine(params, z)
    np.testing.assert_allclose(np.asarray(got_h), np.asarray(ref_h), atol=2e-6)


def test_carry_chunked_scan_bit_identical(rng):
    # GRUs are strictly causal: scanning T in carried chunks must equal the
    # one full-length scan exactly (this property underpins time-chunked
    # long-horizon synthesis at one compiled shape).
    from eegsynth.models.timegan import cascade_init_carry, fused_gen_refine_carry
    cfg, params = _setup()
    z = jnp.asarray(rng.uniform(0, 1, (3, 48, cfg.z_dim)).astype(np.float32))
    ref_h, ref_x = fused_gen_refine(params, z, with_decode=True)

    carry = cascade_init_carry(params, 3)
    hs, xs = [], []
    for t0 in (0, 16, 32):
        carry, (h, x) = fused_gen_refine_carry(params, z[:, t0:t0 + 16], carry,
                                               with_decode=True)
        hs.append(h)
        xs.append(x)
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(hs, 1)),
                                  np.asarray(ref_h))
    np.testing.assert_array_equal(np.asarray(jnp.concatenate(xs, 1)),
                                  np.asarray(ref_x))


def test_fused_disc_inputs_matches_composition(rng):
    from eegsynth.models.timegan import encode, fused_disc_inputs
    cfg, params = _setup()
    x = jnp.asarray(rng.uniform(0, 1, (3, 40, cfg.x_dim)).astype(np.float32))
    z = jnp.asarray(rng.uniform(0, 1, (3, 40, cfg.z_dim)).astype(np.float32))
    h_real, h_fake = fused_disc_inputs(params, x, z)
    np.testing.assert_allclose(np.asarray(h_real), np.asarray(encode(params, x)),
                               atol=2e-6)
    ref_fake = refine_latent(params, gen_latent(params, z))
    np.testing.assert_allclose(np.asarray(h_fake), np.asarray(ref_fake), atol=2e-6)

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
