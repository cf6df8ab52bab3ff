"""Transformer CGAN (framework extra): shapes, conditioning, adaLN-zero
identity-at-init, head parity with the conv discriminator, training-step
integration through the arch-agnostic trainer, and checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from eegsynth.data.datasets import build_label_table
from eegsynth.models.cgan_transformer import (
    TransformerCGANConfig, disc_apply, disc_features, disc_init,
    generator_apply, generator_init,
)
from eegsynth.train.cgan import CGANHParams, build_cfg, make_cgan_epoch
from eegsynth.train import cgan as train_cgan

TINY = dict(dim=32, depth=2, heads=2, patch=8)


def _cfg(**kw):
    return TransformerCGANConfig(**{**TINY, **kw})


def test_generator_output_contract(rng):
    cfg = _cfg(num_classes=9)
    G, state = generator_init(jax.random.key(0), cfg)
    z = jnp.asarray(rng.standard_normal((4, cfg.noise_dim)).astype(np.float32))
    x, _ = generator_apply(G, state, z, jnp.array([0, 3, 5, 8]), cfg)
    assert x.shape == (4, 14, 768)
    assert float(x.min()) > 0.0 and float(x.max()) < 1.0
    # once the adaLN heads are non-zero (i.e. after any training), class
    # conditioning must change the output — emulate with a perturbed head
    G_t = jax.tree_util.tree_map(lambda a: a, G)
    G_t["blk0"] = {**G["blk0"], "ada": {
        "w": 0.1 * jnp.ones_like(G["blk0"]["ada"]["w"]),
        "b": G["blk0"]["ada"]["b"]}}
    xa, _ = generator_apply(G_t, state, z, jnp.array([0, 3, 5, 8]), cfg)
    xb, _ = generator_apply(G_t, state, z, jnp.array([1, 4, 6, 0]), cfg)
    assert float(jnp.max(jnp.abs(xa - xb))) > 1e-6


def test_adaln_zero_blocks_start_as_identity(rng):
    """Zero-init adaLN gates ⇒ at init the trunk is conditioning-independent
    up to the (non-zero-init) output head's shared affine of LN(tokens)."""
    cfg = _cfg(num_classes=9)
    G, state = generator_init(jax.random.key(0), cfg)
    z1 = jnp.asarray(rng.standard_normal((2, cfg.noise_dim)).astype(np.float32))
    z2 = jnp.asarray(rng.standard_normal((2, cfg.noise_dim)).astype(np.float32))
    x1, _ = generator_apply(G, state, z1, jnp.array([0, 1]), cfg)
    x2, _ = generator_apply(G, state, z2, jnp.array([2, 3]), cfg)
    # head_ada is zero-init too, so at init all samples are the same function
    # of the learned tokens — z/class only enter once gates/ada learn
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-6)


def test_disc_heads_and_local_crop(rng):
    cfg = _cfg(num_classes=9)
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((6, 14, 768)).astype(np.float32))
    s, logits, f, newD = disc_apply(D, x, jnp.array([0, 1, 2, 3, 4, 5]), cfg, train=True)
    assert s.shape == (6, 1) and logits.shape == (6, 9) and f.shape == (6, cfg.dim)
    # power iteration advanced (cls head: u has 9 components; fc's is a
    # 1-vector whose normalization pins it at ±1)
    assert not np.allclose(np.asarray(newD["cls"]["u"]), np.asarray(D["cls"]["u"]))
    # same params serve the 256-sample local crop (pos-emb slice)
    s2, logits2, _, _ = disc_apply(D, x[:, :, :256], jnp.array([0, 1, 2, 3, 4, 5]),
                                   cfg, train=False)
    assert s2.shape == (6, 1) and logits2.shape == (6, 9)


def test_disc_projection_head_uses_label(rng):
    cfg = _cfg(num_classes=9)
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((4, 14, 768)).astype(np.float32))
    s_a, _, _, _ = disc_apply(D, x, jnp.array([0, 0, 0, 0]), cfg, train=False)
    s_b, _, _, _ = disc_apply(D, x, jnp.array([5, 5, 5, 5]), cfg, train=False)
    assert float(jnp.max(jnp.abs(s_a - s_b))) > 1e-6


def test_v2_dropout_needs_key(rng):
    cfg = _cfg(num_classes=2, variant="v2")
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((4, 14, 768)).astype(np.float32))
    with pytest.raises(AssertionError):
        disc_apply(D, x, jnp.zeros(4, jnp.int32), cfg, train=True)
    s, _, _, _ = disc_apply(D, x, jnp.zeros(4, jnp.int32), cfg, train=True,
                            dropout_key=jax.random.key(2))
    assert bool(jnp.all(jnp.isfinite(s)))


@pytest.mark.parametrize("variant,K,base", [("v1", 9, 1), ("v2", 2, 0)])
def test_training_steps_finite(rng, variant, K, base):
    hp = CGANHParams(batch_size=8, arch="transformer", variant=variant,
                     tf_dim=32, tf_depth=1, tf_heads=2, tf_patch=8,
                     local_crop=256)
    cfg = build_cfg(hp, K)
    assert isinstance(cfg, TransformerCGANConfig)
    key = jax.random.key(0)
    G, bn = train_cgan.generator_init(key, cfg)
    D = {"dg": train_cgan.disc_init(key, cfg), "dl": train_cgan.disc_init(key, cfg)}
    X = jnp.asarray(rng.random((4 * K, 14, 768)).astype(np.float32))
    y = np.repeat(np.arange(base, base + K), 4)
    tab, cnt = build_label_table(y, K, base)
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    ema = G  # EMA starts as the generator (arrays are immutable)
    epoch = make_cgan_epoch(cfg, hp, optG, optD, 2, prewarm=False)
    G2, bn2, D2, ema2, _, _, logs = epoch(
        G, bn, D, ema, optG.init(G), optD.init(D), X,
        jnp.asarray(tab), jnp.asarray(cnt, jnp.float32), jnp.float32(0.1), key)
    assert bool(jnp.all(jnp.isfinite(logs)))
    # params actually moved and EMA tracked them
    assert float(jnp.max(jnp.abs(G2["tok"] - G["tok"]))) > 0
    assert float(jnp.max(jnp.abs(ema2["tok"] - G["tok"]))) > 0


def test_checkpoint_roundtrip_and_meta_rebuild(rng, tmp_path):
    from eegsynth.train import checkpoint as ckpt_io
    from eegsynth.train.cgan import load_generator

    hp = CGANHParams(arch="transformer", tf_dim=32, tf_depth=1, tf_heads=2,
                     tf_patch=8, variant="v1")
    cfg = build_cfg(hp, 9)
    G, bn = generator_init(jax.random.key(3), cfg)
    path = tmp_path / "gen.npz"
    ckpt_io.save_checkpoint(path, {"model": G, "bn": bn},
                            {"tag": "t", "variant": "v1", "num_classes": 9,
                             "noise_dim": cfg.noise_dim, "arch": "transformer",
                             "tf_dim": 32, "tf_depth": 1, "tf_heads": 2,
                             "tf_patch": 8})
    G2, bn2, cfg2, meta = load_generator(path)
    assert isinstance(cfg2, TransformerCGANConfig) and cfg2.dim == 32
    z = jnp.asarray(rng.standard_normal((2, cfg.noise_dim)).astype(np.float32))
    x1, _ = generator_apply(G, bn, z, jnp.array([0, 1]), cfg, train=False)
    x2, _ = generator_apply(G2, bn2, z, jnp.array([0, 1]), cfg2, train=False)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=0)


def test_conv_checkpoints_still_load(tmp_path):
    """Meta without "arch" must rebuild the conv parity model."""
    from eegsynth.models.cgan import CGANConfig, generator_init as conv_init
    from eegsynth.train import checkpoint as ckpt_io
    from eegsynth.train.cgan import load_generator

    cfg = CGANConfig(num_classes=9, variant="v1")
    G, bn = conv_init(jax.random.key(0), cfg)
    path = tmp_path / "conv.npz"
    ckpt_io.save_checkpoint(path, {"model": G, "bn": bn},
                            {"tag": "t", "variant": "v1", "num_classes": 9,
                             "noise_dim": 100})
    _, _, cfg2, _ = load_generator(path)
    assert not isinstance(cfg2, TransformerCGANConfig)
    assert cfg2.arch == "conv"


def test_disc_r1_works_with_pallas_impl_forced(rng):
    """R1 differentiates the D twice; the flash kernel's custom VJP is
    first-order only, so the discriminator trunk must pin the XLA attention
    path even when the global impl is forced to pallas."""
    from eegsynth.nn.attention import set_attention_impl

    cfg = _cfg(num_classes=9)
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((4, 14, 768)).astype(np.float32))
    labels = jnp.zeros(4, jnp.int32)

    set_attention_impl("pallas")
    try:
        def r1(xx):
            def score(x_in):
                return jnp.sum(disc_apply(D, x_in, labels, cfg, train=False)[0])
            g = jax.grad(score)(xx)
            return jnp.sum(g ** 2)
        val, grad = jax.value_and_grad(r1)(x)   # second-order through the trunk
        assert bool(jnp.isfinite(val)) and bool(jnp.all(jnp.isfinite(grad)))
    finally:
        set_attention_impl("auto")


def test_disc_remat_is_numerics_identical(rng):
    """cfg.remat wraps the D blocks in jax.checkpoint (the vmapped-sweep HBM
    fix, round-4): value, first grad, and the R1 double-backward must all
    match the non-remat trunk exactly (same ops, recomputed)."""
    import dataclasses

    cfg = _cfg(num_classes=9)
    cfg_r = dataclasses.replace(cfg, remat=True)
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.asarray(rng.random((4, 14, 768)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 9, 4), jnp.int32)

    def r1_and_score(c):
        def score(x_in):
            return jnp.sum(disc_apply(D, x_in, labels, c, train=False)[0])
        def r1(xx):
            g = jax.grad(score)(xx)
            return jnp.sum(g ** 2)
        v, gx = jax.value_and_grad(r1)(x)
        return score(x), v, gx

    s0, v0, g0 = r1_and_score(cfg)
    s1, v1, g1 = r1_and_score(cfg_r)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    # grad-of-grad reassociates a few reductions under remat: identical math,
    # f32 noise on near-zero elements (observed max abs diff ~6e-11)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5,
                               atol=1e-9)


def test_tf_remat_flag_reaches_cfg():
    hp = CGANHParams(arch="transformer", tf_remat=True, **{
        "tf_dim": 32, "tf_depth": 2, "tf_heads": 2, "tf_patch": 8})
    assert build_cfg(hp, 9).remat is True
    assert build_cfg(CGANHParams(arch="transformer"), 9).remat is False
