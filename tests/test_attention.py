"""Pallas flash-attention kernel: forward + VJP parity vs dense softmax.

Interpret mode on CPU (the real-TPU path is exercised by bench.py / TPU
drives); the online-softmax math and the custom-VJP backward kernels are the
same code either way. Covers padded (T % 128 != 0) and multi-block shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eegsynth.nn.attention import attention_xla, flash_attention, mha, set_attention_impl


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("B,H,T,D", [
    (2, 2, 96, 64),     # transformer-CGAN training geometry (single block, padded)
    (1, 3, 200, 48),    # non-128-multiple T, odd head dim
    (2, 1, 256, 64),    # two KV blocks — exercises the online-softmax carry
    (1, 2, 384, 32),    # three blocks
])
def test_forward_matches_dense(rng, B, H, T, D):
    q, k, v = (_rand(rng, B, H, T, D) for _ in range(3))
    ref = attention_xla(q, k, v)
    got = flash_attention(q, k, v, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("B,H,T,D", [(2, 2, 96, 32), (1, 2, 200, 32)])
def test_vjp_matches_dense(rng, B, H, T, D):
    q, k, v = (_rand(rng, B, H, T, D) for _ in range(3))
    tgt = _rand(rng, B, H, T, D)

    def loss(fn):
        return lambda q, k, v: jnp.mean((fn(q, k, v) - tgt) ** 2)

    g_ref = jax.grad(loss(attention_xla), argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss(lambda q, k, v: flash_attention(q, k, v, True)),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_softmax_scale_and_rows_sum():
    """One hot key direction must dominate: scale = 1/sqrt(D)."""
    D = 64
    q = jnp.zeros((1, 1, 4, D)).at[0, 0, 0, 0].set(100.0)
    k = jnp.zeros((1, 1, 4, D)).at[0, 0, 2, 0].set(100.0)
    v = jnp.arange(4.0)[None, None, :, None] * jnp.ones((1, 1, 4, D))
    out = flash_attention(q, k, v, True)
    # row 0 attends ~entirely to key 2 → value 2
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 2.0, atol=1e-4)
    # zero queries → uniform attention → mean of values
    np.testing.assert_allclose(float(out[0, 0, 1, 0]), 1.5, atol=1e-4)


def test_mha_dispatch(rng):
    q, k, v = (_rand(rng, 1, 2, 64, 16) for _ in range(3))
    ref = attention_xla(q, k, v)
    # on CPU, "auto" must route to the dense path
    set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(mha(q, k, v)), np.asarray(ref), atol=0)
    got = mha(q, k, v, impl="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
