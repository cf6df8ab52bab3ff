"""Fast-tier contract tests for the vmapped pre-phase shared by
train/timegan_multi.py (run_pre_phase) and train/timegan_sweep.py.

Round-4 regression: _make_pre_phase's phase grew a 4th return value (the
carried keys, for budget-chunked dispatches) and the sweep call site kept
unpacking 3, breaking sweep_bucket — but its covering test lives in the slow
tier. These tests pin the 4-tuple contract and drive BOTH call sites in the
fast lane (tiny shapes, 1-2 steps).
"""

import numpy as np
import jax
import jax.numpy as jnp

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.train.timegan import TimeGANHParams, _make_opt


def _tiny_stack(S=2, n=5, T=12, C=2):
    cfg = TimeGANConfig(x_dim=C, z_dim=4, h_dim=6)
    hp = TimeGANHParams(batch_size=4, acf_max_lag=4)
    keys = jnp.stack([jax.random.key(i) for i in range(S)])
    params = jax.vmap(timegan_init, in_axes=(0, None))(keys, cfg)
    X = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (S, n, T, C)),
                    jnp.float32)
    n_valid = jnp.full((S,), n, jnp.int32)
    return cfg, hp, keys, params, X, n_valid


def test_pre_phase_returns_four_and_chunks_chain():
    """phase() -> (params, opt_state, carried_keys, losses); running it as
    2 chunked dispatches with the carried keys equals one 2-step dispatch
    (the property run_pre_phase's budget chunking relies on)."""
    from eegsynth.train.timegan_multi import _make_pre_phase

    cfg, hp, keys, params, X, n_valid = _tiny_stack()
    opt = _make_opt(hp.lr_g, hp.grad_clip, hp.beta1, hp.beta2)
    er0 = jax.vmap(lambda p: {"embedder": p["embedder"],
                              "recovery": p["recovery"]})(params)
    state0 = jax.vmap(opt.init)(er0)
    phase = _make_pre_phase(hp, opt, "ae")

    out = phase(params, state0, keys, X, n_valid, 2)
    assert len(out) == 4
    p_one, _, keys_one, losses_one = out
    assert losses_one.shape == (2, 2)  # (S, n_steps) — scan loss per step

    p_a, st_a, k_a, l_a = phase(params, state0, keys, X, n_valid, 1)
    p_b, _, k_b, l_b = phase(p_a, st_a, k_a, X, n_valid, 1)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k_b)),
        np.asarray(jax.random.key_data(keys_one)))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([l_a, l_b], axis=1)),
        np.asarray(losses_one), rtol=1e-6, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(p_b),
                    jax.tree_util.tree_leaves(p_one)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_sweep_bucket_call_site_runs(tmp_path, rng):
    """Drive sweep_bucket's own pre-phase call lines end-to-end (1 point,
    1 GAN step) so a pre-phase signature change breaks the fast lane."""
    from eegsynth.train.timegan_sweep import sweep_bucket

    npz = tmp_path / "posture1_no_exo.npz"
    np.savez_compressed(npz,
                        X=rng.uniform(0, 1, (5, 12, 2)).astype(np.float32),
                        fs=np.float32(128.0))
    res = sweep_bucket(npz, tmp_path / "sweep", [{}],
                       ae_epochs=1, sup_epochs=1, gan_steps=1, chunk=1,
                       batch_size=4, acf_max_lag=4, log=lambda *a: None)
    assert len(res) == 1
    X0 = np.load(tmp_path / "sweep" / "sweep0" / "synthetic.npz")["X"]
    assert X0.shape == (5, 12, 2) and np.isfinite(X0).all()
