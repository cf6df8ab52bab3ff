"""Traced TimeGAN G-loss weights + the one-bucket weight sweep.

Traced weights must reproduce the static (baked-constant) chunk tightly;
per-bucket weight overrides must change only the overridden bucket; the
vmapped sweep must keep identical-weight rows bit-identical (shared RNG) and
diverge rows with different weights.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.train.timegan import (
    TIMEGAN_G_WEIGHT_NAMES, TimeGANHParams, make_gan_chunk, make_gan_opts,
)


@pytest.fixture
def tiny():
    cfg = TimeGANConfig(x_dim=3, z_dim=8, h_dim=12)
    hp = TimeGANHParams(batch_size=4, gan_steps=4, chunk=4, acf_max_lag=8)
    return cfg, hp


def _setup(cfg, hp, rng, n=10):
    params = timegan_init(jax.random.key(0), cfg)
    optD, optG = make_gan_opts(hp)
    d_state = optD.init(params["discriminator"])
    g_state = optG.init({k: params[k] for k in
                         ("generator", "supervisor", "embedder", "recovery")})
    X = jnp.asarray(rng.uniform(0, 1, (n, 16, cfg.x_dim)), jnp.float32)
    return params, optD, optG, d_state, g_state, X


def test_traced_weights_match_static_chunk(tiny, rng):
    cfg, hp = tiny
    params, optD, optG, d_state, g_state, X = _setup(cfg, hp, rng)
    build = make_gan_chunk(cfg, hp, optD, optG, None)
    run_static = build(4)
    run_traced = build(4, with_weights=True)

    common = (params, d_state, g_state, params, jnp.float32(np.inf),
              jnp.int32(0), jax.random.key(7), jnp.int32(0),
              jnp.arange(1, 5, dtype=jnp.int32), X)
    out_s, logs_s = run_static(*common)
    w = jnp.asarray([getattr(hp, n) for n in TIMEGAN_G_WEIGHT_NAMES],
                    jnp.float32)
    out_t, logs_t = run_traced(*common, jnp.float32(0.0), w)

    np.testing.assert_allclose(np.asarray(logs_t), np.asarray(logs_s),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out_s[0]),
                    jax.tree_util.tree_leaves(out_t[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_vmapped_weight_rows_shared_rng(tiny, rng):
    """Identical weight rows → bit-identical models; different rows diverge."""
    cfg, hp = tiny
    params, optD, optG, d_state, g_state, X = _setup(cfg, hp, rng)
    S = 3
    stack = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (S,) + a.shape), t)
    Ps, Ds, Gs = stack(params), stack(d_state), stack(g_state)
    Xs = jnp.broadcast_to(X[None], (S,) + X.shape)
    keys = jnp.broadcast_to(jax.random.key(7)[None], (S,) + jax.random.key(7).shape)
    W = jnp.asarray([[3.0, 0.15, 0.03, 0.02],
                     [3.0, 0.15, 0.03, 0.02],
                     [3.0, 0.15, 0.30, 0.50]], jnp.float32)

    run = make_gan_chunk(cfg, hp, optD, optG, None)(
        4, with_valid_n=True, vmapped=True, with_weights=True)
    out, logs = run(Ps, Ds, Gs, Ps, jnp.full((S,), np.inf, jnp.float32),
                    jnp.zeros((S,), jnp.int32), keys, jnp.int32(0),
                    jnp.arange(1, 5, dtype=jnp.int32), Xs,
                    jnp.full((S,), X.shape[0], jnp.float32), W)
    assert np.isfinite(np.asarray(logs)).all()
    leaf = jax.tree_util.tree_leaves(out[0])[0]
    np.testing.assert_array_equal(np.asarray(leaf[0]), np.asarray(leaf[1]))
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[2]))


def test_bucket_weights_change_only_named_bucket(tmp_path):
    """train_all_buckets with an override for ONE bucket tracks the
    no-override run within float noise on every other bucket (traced weights
    equal to the baked defaults compute the same math; HLO constant-folding
    differences reorder f32 reductions, so bit-identity is not expected)
    while visibly diverging the overridden bucket."""
    from eegsynth.train.timegan_multi import train_all_buckets

    rng = np.random.default_rng(0)
    data = tmp_path / "prep"
    data.mkdir()
    for name, n in (("posture1_no_exo", 6), ("posture2_no_exo", 5)):
        np.savez_compressed(data / f"{name}.npz",
                            X=rng.uniform(0, 1, (n, 32, 3)).astype(np.float32),
                            fs=np.float32(128.0))
    kw = dict(ae_epochs=1, sup_epochs=1, gan_steps=4, chunk=2, batch_size=4,
              acf_max_lag=8)
    train_all_buckets(data, tmp_path / "base", **kw)
    train_all_buckets(data, tmp_path / "tuned",
                      bucket_weights={"posture2_no_exo": {"gamma_acf": 0.9}},
                      **kw)

    def log_vals(root, name):
        rows = (root / name / "train_log.csv").read_text().strip().split("\n")[1:]
        return np.array([r.split(",")[2:] for r in rows], dtype=float)

    b1, t1 = log_vals(tmp_path / "base", "posture1_no_exo"), \
        log_vals(tmp_path / "tuned", "posture1_no_exo")
    np.testing.assert_allclose(t1, b1, rtol=1e-3, atol=1e-5)  # untouched
    b2, t2 = log_vals(tmp_path / "base", "posture2_no_exo"), \
        log_vals(tmp_path / "tuned", "posture2_no_exo")
    # overridden bucket: the G-total column must move far beyond float noise
    assert np.abs(t2[:, 2] - b2[:, 2]).max() > 1e-2

    with pytest.raises(ValueError, match="unknown buckets"):
        train_all_buckets(data, tmp_path / "x",
                          bucket_weights={"nope": {}}, **kw)
    with pytest.raises(ValueError, match="unsweepable"):
        train_all_buckets(data, tmp_path / "y",
                          bucket_weights={"posture1_no_exo": {"r1_gamma": 1.0}},
                          **kw)


def test_sweep_bucket_end_to_end(tmp_path, rng):
    from eegsynth.train.timegan_sweep import sweep_bucket, timegan_weight_matrix

    npz = tmp_path / "posture1_no_exo.npz"
    np.savez_compressed(npz,
                        X=rng.uniform(0, 1, (8, 32, 3)).astype(np.float32),
                        fs=np.float32(128.0))
    res = sweep_bucket(npz, tmp_path / "sweep",
                       [{}, {}, {"gamma_acf": 0.5, "alpha_sup": 10.0}],
                       ae_epochs=1, sup_epochs=1, gan_steps=4, chunk=2,
                       batch_size=4, acf_max_lag=8, log=lambda *a: None)
    assert len(res) == 3
    X0 = np.load(tmp_path / "sweep" / "sweep0" / "synthetic.npz")["X"]
    X1 = np.load(tmp_path / "sweep" / "sweep1" / "synthetic.npz")["X"]
    X2 = np.load(tmp_path / "sweep" / "sweep2" / "synthetic.npz")["X"]
    assert X0.shape == (8, 32, 3) and np.isfinite(X0).all()
    # identical weights + shared RNG + shared synthesis noise → identical
    np.testing.assert_array_equal(X0, X1)
    assert not np.array_equal(X0, X2)
    hj = json.loads((tmp_path / "sweep" / "sweep2" / "hparams.json").read_text())
    assert hj["gamma_acf"] == 0.5 and hj["alpha_sup"] == 10.0
    assert res[2]["weights"]["gamma_acf"] == 0.5

    hp = __import__("eegsynth.train.timegan", fromlist=["TimeGANHParams"]
                    ).TimeGANHParams()
    with pytest.raises(ValueError, match="unsweepable"):
        timegan_weight_matrix(hp, [{"label_smooth": 0.1}])

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
