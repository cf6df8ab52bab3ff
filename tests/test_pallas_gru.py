"""Fused Pallas GRU kernel: forward + VJP parity vs the XLA scan path.

Runs the kernel in interpret mode on CPU (the real-TPU path is exercised by
bench.py and the TPU drives); the custom VJP backward is pure XLA and tests
exactly either way.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eegsynth.nn.gru import gru_apply, gru_init
from eegsynth.nn.pallas_gru import gru_apply_pallas, gru_sequence


@pytest.mark.parametrize("B,T,I,H", [(4, 37, 14, 28), (2, 16, 28, 56)])
def test_forward_matches_xla(rng, B, T, I, H):
    params = gru_init(jax.random.key(0), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    ref = gru_apply(params, x, impl="xla")
    got = gru_apply_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_vjp_matches_xla(rng):
    B, T, I, H = 3, 12, 5, 8
    params = gru_init(jax.random.key(1), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_fn(impl):
        def f(p, xx):
            if impl == "pallas":
                y = gru_apply_pallas(p, xx, interpret=True)
            else:
                y = gru_apply(p, xx, impl="xla")
            return jnp.mean((y - tgt) ** 2)
        return f

    g_ref = jax.grad(loss_fn("xla"), argnums=(0, 1))(params, x)
    g_got = jax.grad(loss_fn("pallas"), argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_got), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_gru_sequence_vjp_dh0(rng):
    T, B, H = 9, 2, 4
    xp = jnp.asarray(rng.standard_normal((T, B, 3 * H)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32)) * 0.3
    b = jnp.asarray(rng.standard_normal((1, 3 * H)).astype(np.float32)) * 0.1
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))

    def f(xp, w, b, h0):
        return jnp.sum(gru_sequence(xp, w, b, h0, True) ** 2)

    # numerical gradient check on h0
    g = jax.grad(f, argnums=3)(xp, w, b, h0)
    eps = 1e-3
    for i in range(2):
        dh = jnp.zeros_like(h0).at[0, i].set(eps)
        num = (f(xp, w, b, h0 + dh) - f(xp, w, b, h0 - dh)) / (2 * eps)
        np.testing.assert_allclose(float(g[0, i]), float(num), rtol=2e-2, atol=1e-3)


def test_pallas_gru_bf16_inputs():
    """bf16 callers (the mixed-precision synthesis policy casts the whole
    model tree) must not crash the kernel: inputs are cast to f32 around the
    f32 VMEM recurrence and the output returns in bf16."""
    import jax
    import jax.numpy as jnp
    from eegsynth.nn.gru import gru_init
    from eegsynth.nn.pallas_gru import gru_apply_pallas

    B, T, I, H = 2, 5, 3, 8
    p32 = gru_init(jax.random.key(0), I, H)
    x32 = jax.random.uniform(jax.random.key(1), (B, T, I))
    ref = gru_apply_pallas(p32, x32, interpret=True)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    y16 = gru_apply_pallas(p16, x32.astype(jnp.bfloat16), interpret=True)
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(y16, np.float32), np.asarray(ref),
                               atol=0.05)
