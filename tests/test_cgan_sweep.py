"""Traced G-step loss weights + the vmapped loss-weight sweep.

Traced weights must be bit-identical to the static (baked-constant) path, and
a sweep with different weight rows must actually diverge while identical rows
stay identical (shared RNG stream across sweep points)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eegsynth.models.cgan import CGANConfig
from eegsynth.train.cgan import (
    CGANHParams, G_WEIGHT_NAMES, _make_epoch_core, disc_init, generator_init,
    make_lr,
)


@pytest.fixture
def tiny():
    cfg = CGANConfig(num_classes=3, channels=2, seq_len=64, init_len=2,
                     noise_dim=8)
    hp = CGANHParams(batch_size=4, local_crop=32, noise_dim=8, r1_every=2,
                     epochs=2, save_every=4, coh_pairs=2)
    return cfg, hp


def _setup(cfg, hp, rng):
    kG, kDg, kDl = jax.random.split(jax.random.key(0), 3)
    G, bn = generator_init(kG, cfg)
    D = {"dg": disc_init(kDg, cfg), "dl": disc_init(kDl, cfg)}
    ema = jax.tree_util.tree_map(lambda a: a, G)
    optG = optax.adam(make_lr(hp, 2, hp.lr_g))
    optD = optax.adam(make_lr(hp, 2, hp.lr_d))
    X = jnp.asarray(rng.uniform(0, 1, (12, cfg.channels, cfg.seq_len)), jnp.float32)
    y = np.resize(np.arange(cfg.num_classes), 12)
    from eegsynth.data.datasets import build_label_table
    tab, cnt = build_label_table(y, cfg.num_classes, 0)
    return (G, bn, D, ema, optG.init(G), optD.init(D), X,
            jnp.asarray(tab), jnp.asarray(cnt.astype(np.float32)), optG, optD)


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_traced_weights_match_static(tiny, rng, variant):
    cfg, hp = tiny
    if variant == "v2":
        cfg = CGANConfig(**{**cfg.__dict__, "num_classes": 2, "variant": "v2"})
        hp = CGANHParams(**{**hp.__dict__, "variant": "v2", "amp_weight": 0.5})
    (G, bn, D, ema, gs, ds, X, tab, cnt, optG, optD) = _setup(cfg, hp, rng)
    core = _make_epoch_core(cfg, hp, optG, optD, steps_per_epoch=2, prewarm=False)
    sigma, key = jnp.float32(0.1), jax.random.key(7)

    out_static = jax.jit(core)(G, bn, D, ema, gs, ds, X, tab, cnt, sigma, key)
    w = jnp.asarray([getattr(hp, n) for n in G_WEIGHT_NAMES], jnp.float32)
    out_traced = jax.jit(core)(G, bn, D, ema, gs, ds, X, tab, cnt, sigma, key, w)

    # Same math, different HLO (constants fold differently when weights are
    # traced): the per-step losses/diagnostics must agree tightly ...
    np.testing.assert_allclose(np.asarray(out_static[-1]),
                               np.asarray(out_traced[-1]), rtol=1e-3, atol=1e-5)
    # ... while params may differ by O(lr) per Adam step (near-zero grads make
    # the first update ±lr regardless of grad magnitude, so f32 reduction-order
    # noise flips update signs) — trajectories must still track within that.
    n_steps = 2
    for la, lb in zip(jax.tree_util.tree_leaves(out_static[:-1]),
                      jax.tree_util.tree_leaves(out_traced[:-1])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=3 * n_steps * max(hp.lr_g, hp.lr_d),
                                   rtol=0)


def test_sweep_points_share_rng_and_diverge_by_weights(tiny, rng):
    cfg, hp = tiny
    (G, bn, D, ema, gs, ds, X, tab, cnt, optG, optD) = _setup(cfg, hp, rng)
    from eegsynth.train.cgan_sweep import _make_sweep_chunk, _stack, weight_matrix

    W = jnp.asarray(weight_matrix(hp, [{}, {}, {"psd_weight": 8.0,
                                               "fm_weight": 1.0}]))
    S = 3
    Gs, bns, Ds, emas = _stack(G, S), _stack(bn, S), _stack(D, S), _stack(ema, S)
    gss = jax.vmap(optG.init)(Gs)
    dss = jax.vmap(optD.init)(Ds)
    best = {"loss": jnp.full((S,), jnp.inf, jnp.float32), "G": emas, "bn": bns}
    chunk = _make_sweep_chunk(cfg, hp, optG, optD, steps=2, prewarm=False)
    sigmas = jnp.asarray([0.1, 0.05], jnp.float32)
    keys = jax.random.split(jax.random.key(3), 2)
    (Gs, bns, Ds, emas, gss, dss, best), logs = chunk(
        Gs, bns, Ds, emas, gss, dss, best, X, tab, cnt, sigmas, keys, W)

    assert logs.shape == (2, S, 2, 10)
    assert np.isfinite(np.asarray(logs)).all()
    leaf = jax.tree_util.tree_leaves(Gs)[0]
    # rows 0 and 1 have identical weights + shared RNG → bit-identical models
    np.testing.assert_array_equal(np.asarray(leaf[0]), np.asarray(leaf[1]))
    # row 2's weights differ → the model must have diverged
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[2]))
    assert np.all(np.asarray(best["loss"]) < np.inf)


def test_weight_matrix_rejects_unknown_names(tiny):
    _, hp = tiny
    from eegsynth.train.cgan_sweep import weight_matrix
    with pytest.raises(ValueError, match="unsweepable"):
        weight_matrix(hp, [{"acgan_weight": 1.0}])  # D-side weight: static only


def test_weight_matrix_rejects_amp_weight_under_v1(tiny):
    # amp_calib_loss lives on the v2 branch only; a v1 sweep overriding it
    # would silently produce bit-identical points (advisor round-2 finding).
    _, hp = tiny
    from eegsynth.train.cgan_sweep import weight_matrix
    assert hp.variant == "v1"
    with pytest.raises(ValueError, match="amp_weight"):
        weight_matrix(hp, [{}, {"amp_weight": 1.0}])
    hp2 = CGANHParams(**{**hp.__dict__, "variant": "v2"})
    W = weight_matrix(hp2, [{"amp_weight": 1.0}])   # fine under v2
    assert W[0, G_WEIGHT_NAMES.index("amp_weight")] == 1.0


def test_sweep_condition_end_to_end(tmp_path, rng):
    """Tiny full sweep: artifacts per point, loadable generators."""
    data = tmp_path / "prep"
    data.mkdir()
    for p in range(1, 10):
        np.savez_compressed(
            data / f"posture{p}_no_exo.npz",
            X=rng.uniform(0, 1, (5, 768, 14)).astype(np.float32),
            posture=np.int32(p), condition="no_exo", fs=np.float32(128.0),
            ch_names=np.array([f"ch{i}" for i in range(14)], dtype=object),
            scale_min=np.zeros(14, np.float32),
            scale_range=np.ones(14, np.float32))
    from eegsynth.train.cgan import generate_batch, load_generator
    from eegsynth.train.cgan_sweep import sweep_condition

    res = sweep_condition(data, tmp_path / "sweep", "no_exo",
                          [{}, {"psd_weight": 4.0}], epochs=2, batch_size=4,
                          epochs_per_dispatch=2, print_every=1,
                          arch="transformer", tf_dim=32, tf_depth=1,
                          tf_heads=2, tf_patch=8, log=lambda *a: None)
    assert len(res) == 2
    for i, r in enumerate(res):
        d = tmp_path / "sweep" / f"sweep{i}"
        hj = json.loads((d / "hparams.json").read_text())
        assert hj["tag"] == f"sweep{i}"
        G, bn, cfg, meta = load_generator(d / f"CGAN_generator_sweep{i}_last.npz")
        x = generate_batch(G, bn, cfg, jax.random.key(0), 2, 0)
        assert x.shape == (2, 14, 768) and np.isfinite(np.asarray(x)).all()
    assert res[1]["weights"]["psd_weight"] == 4.0
    assert res[0]["weights"]["psd_weight"] == 0.5

    # the CLI's post-sweep eval block (advisor round-2 high finding: it used
    # to crash on a swapped stats_similarity arg order AFTER training)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "sweep_cgan", "scripts/sweep_cgan.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from eegsynth.data.datasets import load_condition_dataset
    np.random.seed(123)
    Xr, yr, _ = load_condition_dataset(str(data), "no_exo")
    res = mod.eval_sweep_points(res, Xr, yr, samples_per_posture=12,
                                log=lambda *a: None)
    for i, r in enumerate(res):
        assert set(r["stats"]) >= {"psd_l1", "acf_l1", "coh_l1"}
        assert np.isfinite(r["stats"]["psd_l1"])
        assert (tmp_path / "sweep" / f"sweep{i}" / "stats_similarity.csv").exists()

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
