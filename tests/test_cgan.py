"""CGAN model shapes, loss oracles, DiffAugment behavior, tiny end-to-end train."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as TF

from eegsynth.losses.augment import diffaugment_1d
from eegsynth.losses.gan import amp_calib_loss, cross_entropy, d_hinge, g_hinge
from eegsynth.losses.spectral import (
    FIXED_PAIRS, coh_loss, cov_loss, posture_conditional_losses, psd_loss,
)
from eegsynth.models.cgan import (
    CGANConfig, disc_apply, disc_init, generator_apply, generator_init,
)


def test_generator_shapes():
    cfg = CGANConfig(num_classes=9)
    G, bn = generator_init(jax.random.key(0), cfg)
    z = jnp.zeros((4, 100))
    labels = jnp.array([0, 3, 8, 1])
    x, bn2 = generator_apply(G, bn, z, labels, cfg, train=True)
    assert x.shape == (4, 14, 768)
    assert float(jnp.min(x)) >= 0.0 and float(jnp.max(x)) <= 1.0
    # BN state advanced
    assert not np.allclose(np.asarray(bn2["up1"]["mean"]), 0.0)


def test_discriminator_shapes():
    cfg = CGANConfig(num_classes=9)
    D = disc_init(jax.random.key(1), cfg)
    x = jnp.zeros((4, 14, 768))
    labels = jnp.array([0, 1, 2, 3])
    score, logits, f, D2 = disc_apply(D, x, labels, cfg, train=True)
    assert score.shape == (4, 1) and logits.shape == (4, 9) and f.shape == (4, 512)
    # works on 256-crop too (local D)
    score_l, _, _, _ = disc_apply(D, x[:, :, :256], labels, cfg, train=True)
    assert score_l.shape == (4, 1)


def test_hinge_and_ce_match_torch(rng):
    rs = rng.standard_normal((8, 1)).astype(np.float32)
    fs = rng.standard_normal((8, 1)).astype(np.float32)
    ref_d = (TF.relu(1 - torch.tensor(rs)) + TF.relu(1 + torch.tensor(fs))).mean().item()
    np.testing.assert_allclose(float(d_hinge(rs, fs)), ref_d, rtol=1e-6)
    np.testing.assert_allclose(float(g_hinge(fs)), -fs.mean(), rtol=1e-6)

    logits = rng.standard_normal((8, 9)).astype(np.float32)
    labels = rng.integers(0, 9, 8)
    ref_ce = torch.nn.CrossEntropyLoss()(torch.tensor(logits),
                                         torch.tensor(labels)).item()
    np.testing.assert_allclose(float(cross_entropy(logits, jnp.asarray(labels))),
                               ref_ce, rtol=1e-5)


def test_structure_losses_match_torch(rng):
    real = rng.uniform(0, 1, (6, 14, 64)).astype(np.float32)
    fake = rng.uniform(0, 1, (6, 14, 64)).astype(np.float32)
    tr, tf_ = torch.tensor(real), torch.tensor(fake)

    Fr, Ff = torch.fft.rfft(tr, dim=2), torch.fft.rfft(tf_, dim=2)
    ref_psd = TF.l1_loss((Ff.real**2 + Ff.imag**2).mean(0),
                         (Fr.real**2 + Fr.imag**2).mean(0)).item()
    np.testing.assert_allclose(float(psd_loss(real, fake)), ref_psd, rtol=1e-4)

    def coh(a, b):
        A, B = torch.fft.rfft(a, dim=2), torch.fft.rfft(b, dim=2)
        num = torch.sqrt((A * torch.conj(B)).real**2 + (A * torch.conj(B)).imag**2)
        den = torch.sqrt((A.real**2 + A.imag**2) * (B.real**2 + B.imag**2) + 1e-8)
        return (num / den).mean(0)
    ref_coh = np.mean([TF.l1_loss(coh(tf_[:, i:i+1], tf_[:, j:j+1]),
                                  coh(tr[:, i:i+1], tr[:, j:j+1])).item()
                       for i, j in FIXED_PAIRS])
    # the L1-of-coherence statistic is cancellation-dominated in f32; allow a
    # tiny absolute slack on top of rtol
    np.testing.assert_allclose(float(coh_loss(real, fake, FIXED_PAIRS)), ref_coh,
                               rtol=1e-2, atol=1e-8)

    def covmat(x):
        x = x - x.mean(dim=2, keepdim=True)
        return (torch.matmul(x, x.transpose(1, 2)) / (x.size(2) - 1)).mean(0)
    ref_cov = TF.mse_loss(covmat(tf_), covmat(tr)).item()
    np.testing.assert_allclose(float(cov_loss(real, fake)), ref_cov, rtol=1e-4)

    mu_r, mu_f = tr.mean((0, 2)), tf_.mean((0, 2))
    sd_r, sd_f = tr.std((0, 2)), tf_.std((0, 2))
    ref_amp = (TF.l1_loss(mu_f, mu_r) + TF.l1_loss(sd_f, sd_r)).item()
    np.testing.assert_allclose(float(amp_calib_loss(real, fake)), ref_amp, rtol=1e-4)


def test_posture_conditional_losses_match_subset_math(rng):
    """Masked segment formulation == explicit per-class subsetting."""
    real = rng.uniform(0, 1, (8, 14, 32)).astype(np.float32)
    fake = rng.uniform(0, 1, (8, 14, 32)).astype(np.float32)
    labels = np.array([0, 0, 2, 2, 2, 5, 5, 5])
    got = float(posture_conditional_losses(real, fake, jnp.asarray(labels), 9,
                                           0.5, 0.25, 0.25))
    refs = []
    for lab in np.unique(labels):
        m = labels == lab
        r, f = real[m], fake[m]
        val = (0.5 * float(psd_loss(r, f))
               + 0.25 * float(coh_loss(r, f, FIXED_PAIRS))
               + 0.25 * float(cov_loss(r, f)))
        refs.append(val)
    np.testing.assert_allclose(got, np.mean(refs), rtol=1e-4)


def test_diffaugment_properties(rng):
    x = rng.uniform(0, 1, (8, 14, 768)).astype(np.float32)
    # p=0: identity
    out = np.asarray(diffaugment_1d(jax.random.key(0), x, p=0.0))
    np.testing.assert_allclose(out, x)
    # p=1: all three branches applied; output stays in [0,1]; cutout zeros ~5%
    out = np.asarray(diffaugment_1d(jax.random.key(1), x, p=1.0))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert out.shape == x.shape
    frac_zero_cols = np.mean((out == 0).all(axis=1))
    assert 0.02 < frac_zero_cols < 0.08  # ≈5% time cutout


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_cgan_tiny_end_to_end(tmp_path, variant):
    from eegsynth.train.cgan import train_one_condition, train_one_posture

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "prep"
    data_dir.mkdir()
    for p in range(1, 10) if variant == "v1" else [1]:
        for cond in ("no_exo", "with_exo"):
            X = rng.uniform(0, 1, (6, 768, 14)).astype(np.float32)
            np.savez_compressed(data_dir / f"posture{p}_{cond}.npz", X=X,
                                posture=np.int32(p), condition=cond,
                                fs=np.float32(128.0),
                                ch_names=np.array([f"ch{i}" for i in range(14)],
                                                  dtype=object),
                                scale_min=np.zeros(14, np.float32),
                                scale_range=np.ones(14, np.float32))
    if variant == "v1":
        res = train_one_condition(data_dir, tmp_path / "runs", "no_exo",
                                  epochs=2, batch_size=8, save_every=2,
                                  print_every=1, log=lambda *a: None)
        run_dir = tmp_path / "runs" / "no_exo"
        tag = "no_exo"
    else:
        res = train_one_posture(data_dir, tmp_path / "runs", 1,
                                epochs=1, prewarm=1, batch_size=8, save_every=2,
                                print_every=1, log=lambda *a: None)
        run_dir = tmp_path / "runs" / "posture1"
        tag = "posture1"

    assert np.isfinite(res["best_g"])
    assert (run_dir / "hparams.json").exists()
    assert (run_dir / "metrics.csv").exists()
    assert (run_dir / f"CGAN_generator_{tag}_best.npz").exists()
    assert (run_dir / f"CGAN_generator_{tag}_last.npz").exists()
    rows = (run_dir / "metrics.csv").read_text().strip().split("\n")
    assert len(rows) == 3  # header + 2 epochs
    # generation from the trained model
    from eegsynth.train.cgan import generate_batch
    x = generate_batch(res["ema"], res["bn"], res["cfg"], jax.random.key(0), 3, 0)
    assert x.shape == (3, 14, 768)
    assert np.isfinite(np.asarray(x)).all()


def test_cgan_resume_continues_epochs(tmp_path):
    """--resume restores state + epoch counter; the chunked driver picks up
    mid-run and appends the remaining epochs (cgan.py:372-378 contract)."""
    import jax
    import numpy as np
    from eegsynth.train.cgan import train_one_condition

    rng = np.random.default_rng(1)
    data_dir = tmp_path / "prep"
    data_dir.mkdir()
    for p in range(1, 10):
        np.savez_compressed(
            data_dir / f"posture{p}_no_exo.npz",
            X=rng.uniform(0, 1, (6, 768, 14)).astype(np.float32),
            posture=np.int32(p), condition="no_exo", fs=np.float32(128.0),
            ch_names=np.array([f"ch{i}" for i in range(14)], dtype=object),
            scale_min=np.zeros(14, np.float32),
            scale_range=np.ones(14, np.float32))

    run_dir = tmp_path / "runs" / "no_exo"
    # ckpt_format="npz" pins the reference-artifact contract (the default is
    # orbax+async — covered by tests/test_checkpoint_orbax.py)
    train_one_condition(data_dir, tmp_path / "runs", "no_exo",
                        epochs=2, batch_size=8, save_every=2,
                        print_every=10, ckpt_format="npz", log=lambda *a: None)
    ckpt = run_dir / "checkpoint_epoch2.npz"
    assert ckpt.exists()
    rows1 = (run_dir / "metrics.csv").read_text().strip().split("\n")
    assert len(rows1) == 3  # header + epochs 1..2

    res = train_one_condition(data_dir, tmp_path / "runs", "no_exo",
                              epochs=4, batch_size=8, save_every=2,
                              print_every=10, resume=str(ckpt),
                              ckpt_format="npz", log=lambda *a: None)
    rows2 = (run_dir / "metrics.csv").read_text().strip().split("\n")
    assert rows2[:3] == rows1                      # old rows untouched
    assert [r.split(",")[0] for r in rows2[3:]] == ["3", "4"]
    assert np.isfinite(res["best_g"])
    assert (run_dir / "checkpoint_epoch4.npz").exists()


def test_cgan_d_steps_multiple():
    """hp.d_steps runs that many D updates per G update (cgan.py:396): the
    extra D pass must change the discriminator relative to d_steps=1 while
    leaving the step finite; d_steps=1 keeps the original key stream."""
    import optax
    from eegsynth.data.datasets import build_label_table
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, disc_init, generator_init, make_cgan_epoch,
    )

    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(0, 1, (18, 14, 768)).astype(np.float32))
    y = np.repeat(np.arange(1, 10), 2)
    tab_np, cnt_np = build_label_table(y, 9, 1)
    tab, cnt = jnp.asarray(tab_np), jnp.asarray(cnt_np, jnp.float32)

    def run(d_steps):
        hp = CGANHParams(batch_size=8, arch="transformer", variant="v1",
                         tf_dim=32, tf_depth=1, tf_heads=2, tf_patch=8,
                         use_diffaugment=False, d_steps=d_steps)
        cfg = build_cfg(hp, 9)
        key = jax.random.key(0)
        G, bn = generator_init(key, cfg)
        D = {"dg": disc_init(jax.random.fold_in(key, 1), cfg),
             "dl": disc_init(jax.random.fold_in(key, 2), cfg)}
        optG, optD = optax.adam(1e-4), optax.adam(1e-4)
        ema = G  # EMA starts as the generator (arrays are immutable)
        epoch = make_cgan_epoch(cfg, hp, optG, optD, 1, prewarm=False)
        G, bn, D, ema, _, _, logs = epoch(G, bn, D, ema, optG.init(G),
                                          optD.init(D), X, tab, cnt,
                                          jnp.float32(0.05), jax.random.key(7))
        return np.asarray(logs), jax.tree_util.tree_map(np.asarray, D)

    logs1, D1 = run(1)
    logs2, D2 = run(2)
    assert np.isfinite(logs1).all() and np.isfinite(logs2).all()
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(D1), jax.tree_util.tree_leaves(D2))]
    assert max(diffs) > 0  # the second D update moved the discriminator


def test_bce_wgan_losses_match_torch(rng):
    import torch
    from eegsynth.losses.gan import d_bce, d_wgan, g_bce, g_wgan

    rs = rng.standard_normal((16,)).astype(np.float32)
    fs = rng.standard_normal((16,)).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss()
    ref_d = (bce(torch.tensor(rs), torch.ones(16))
             + bce(torch.tensor(fs), torch.zeros(16))).item()
    np.testing.assert_allclose(float(d_bce(rs, fs)), ref_d, rtol=1e-6)
    ref_g = bce(torch.tensor(fs), torch.ones(16)).item()
    np.testing.assert_allclose(float(g_bce(fs)), ref_g, rtol=1e-6)
    np.testing.assert_allclose(float(d_wgan(rs, fs)), fs.mean() - rs.mean(),
                               rtol=1e-6)
    np.testing.assert_allclose(float(g_wgan(fs)), -fs.mean(), rtol=1e-6)


def test_gradient_penalty_linear_critic(rng):
    """For D(x)=<w,x> the interpolate gradient is w everywhere, so the
    penalty is exactly (||w||-1)^2 independent of the inputs."""
    from eegsynth.losses.gan import gradient_penalty

    w = jnp.asarray(rng.standard_normal((14, 32)).astype(np.float32))
    real = jnp.asarray(rng.uniform(0, 1, (6, 14, 32)).astype(np.float32))
    fake = jnp.asarray(rng.uniform(0, 1, (6, 14, 32)).astype(np.float32))
    gp = gradient_penalty(lambda x: jnp.sum(x * w[None], axis=(1, 2)),
                          jax.random.key(0), real, fake)
    expect = (float(jnp.linalg.norm(w)) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expect, rtol=1e-5)
    # zero critic → gradient norm 0 → penalty (0-1)^2 = 1
    gp0 = gradient_penalty(lambda x: jnp.zeros(x.shape[0]),
                           jax.random.key(1), real, fake)
    np.testing.assert_allclose(float(gp0), 1.0, rtol=1e-5)  # sqrt(+1e-12) eps


@pytest.mark.parametrize("gan_loss", ["bce", "wgan-gp"])
def test_cgan_alternative_losses_train(gan_loss):
    """The advertised-but-unimplemented reference --loss modes actually train
    here: one epoch runs finite and moves both G and D."""
    import optax
    from eegsynth.data.datasets import build_label_table
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, disc_init, generator_init, make_cgan_epoch,
    )

    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.uniform(0, 1, (18, 14, 768)).astype(np.float32))
    y = np.repeat(np.arange(1, 10), 2)
    tab_np, cnt_np = build_label_table(y, 9, 1)
    tab, cnt = jnp.asarray(tab_np), jnp.asarray(cnt_np, jnp.float32)

    hp = CGANHParams(batch_size=8, arch="transformer", variant="v1",
                     tf_dim=32, tf_depth=1, tf_heads=2, tf_patch=8,
                     use_diffaugment=False, gan_loss=gan_loss,
                     gp_weight=10.0, r1_gamma=0.0)
    cfg = build_cfg(hp, 9)
    key = jax.random.key(0)
    G, bn = generator_init(key, cfg)
    D = {"dg": disc_init(jax.random.fold_in(key, 1), cfg),
         "dl": disc_init(jax.random.fold_in(key, 2), cfg)}
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    ema = G  # EMA starts as the generator (arrays are immutable)
    epoch = make_cgan_epoch(cfg, hp, optG, optD, 2, prewarm=False)
    G2, bn2, D2, ema2, _, _, logs = epoch(G, bn, D, ema, optG.init(G),
                                          optD.init(D), X, tab, cnt,
                                          jnp.float32(0.05), jax.random.key(7))
    assert np.isfinite(np.asarray(logs)).all()
    gd = max(np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, G)),
                 jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, G2))))
    dd = max(np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, D)),
                 jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, D2))))
    assert gd > 0 and dd > 0


def test_r1_gamma_auto_default():
    """R1 defaults off under wgan-gp (GP pushes the critic's gradient norm
    to 1, R1 pushes it to 0 at real data — contradictory targets); explicit
    values always win; hinge/bce keep the reference's 0.5 default."""
    from eegsynth.train.cgan import CGANHParams
    assert CGANHParams().r1_gamma == 0.5
    assert CGANHParams(gan_loss="bce").r1_gamma == 0.5
    assert CGANHParams(gan_loss="wgan-gp").r1_gamma == 0.0
    assert CGANHParams(gan_loss="wgan-gp", r1_gamma=0.3).r1_gamma == 0.3
    assert CGANHParams(gan_loss="hinge", r1_gamma=0.0).r1_gamma == 0.0


def test_generate_batch_padding_invariant():
    """The compiled pow-2-padded generate_batch matches the direct unpadded
    forward (eval-mode BN rows are independent; the padded noise's leading
    rows equal the unpadded draw) to float tolerance."""
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, generate_batch, generator_apply, generator_init,
    )
    hp = CGANHParams(variant="v2")
    cfg = build_cfg(hp, num_classes=2)
    G, bn = generator_init(jax.random.key(0), cfg)
    key = jax.random.key(7)
    x_pad = np.asarray(generate_batch(G, bn, cfg, key, 3, 1))
    z = jax.random.normal(key, (3, cfg.noise_dim))
    x_ref, _ = generator_apply(G, bn, z, jnp.full((3,), 1, jnp.int32), cfg,
                               train=False)
    assert x_pad.shape == (3, 14, 768)
    np.testing.assert_allclose(x_pad, np.asarray(x_ref), atol=1e-6)


def test_make_lr_d_steps_and_prewarm():
    """StepLR parity: the decay boundary lands on the same EPOCH for both
    optimizers even though D takes d_steps updates per step and none during
    the v2 prewarm (the reference steps schG/schD once per epoch)."""
    from eegsynth.train.cgan import CGANHParams, make_lr
    hp = CGANHParams(lr_decay=0.5, lr_decay_step=10, d_steps=2, prewarm=5)
    steps = 4
    g = make_lr(hp, steps, 1.0)
    assert g(39) == 1.0 and g(40) == 0.5          # epoch 10 -> count 40
    d = make_lr(hp, steps * hp.d_steps, 1.0, epoch_offset=hp.prewarm)
    # true epoch 10 = 5 prewarm (0 D updates) + 5 trained epochs x 8 updates
    assert d(39) == 1.0 and d(40) == 0.5
    assert make_lr(CGANHParams(), 4, 3e-4) == 3e-4  # lr_decay=1 -> constant


def test_disc_bf16_trunk_close_to_f32(rng):
    """precision_d='bf16' core (reference AMP-on-D analogue, cgan.py:351,
    399-426): bf16 conv trunk with f32 masters keeps features close to the
    f32 forward, returns f32 everywhere, and the power iteration never sees
    bf16 (u vectors bit-equal to the f32 path's)."""
    cfg = CGANConfig(num_classes=9)
    D = disc_init(jax.random.key(3), cfg)
    x = jnp.asarray(rng.uniform(0, 1, (8, 14, 768)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 9, 8))
    s32, l32, f32_, D32 = disc_apply(D, x, labels, cfg, train=True)
    s16, l16, f16_, D16 = disc_apply(D, x, labels, cfg, train=True,
                                     compute_dtype=jnp.bfloat16)
    assert s16.dtype == l16.dtype == f16_.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(D16):
        assert leaf.dtype == jnp.float32
    for i in range(1, 6):  # f32 power iteration in both paths -> identical u
        np.testing.assert_array_equal(np.asarray(D16[f"c{i}"]["u"]),
                                      np.asarray(D32[f"c{i}"]["u"]))
    scale = float(np.abs(np.asarray(f32_)).max())
    assert float(np.abs(np.asarray(f16_) - np.asarray(f32_)).max()) < 0.05 * scale
    assert np.isfinite(np.asarray(s16)).all() and np.isfinite(np.asarray(l16)).all()


def test_cgan_bf16_d_step_trains():
    """One conv-arch epoch with precision_d='bf16' runs finite, moves both
    nets, and every parameter (and optimizer leaf) stays f32 — bf16 exists
    only inside the D-step forward/backward."""
    import optax
    from eegsynth.data.datasets import build_label_table
    from eegsynth.train.cgan import (
        CGANHParams, build_cfg, disc_init, generator_init, make_cgan_epoch,
    )

    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.uniform(0, 1, (18, 14, 768)).astype(np.float32))
    y = np.repeat(np.arange(1, 10), 2)
    tab_np, cnt_np = build_label_table(y, 9, 1)
    tab, cnt = jnp.asarray(tab_np), jnp.asarray(cnt_np, jnp.float32)

    hp = CGANHParams(batch_size=8, use_diffaugment=False, precision_d="bf16")
    cfg = build_cfg(hp, 9)
    key = jax.random.key(0)
    G, bn = generator_init(key, cfg)
    D = {"dg": disc_init(jax.random.fold_in(key, 1), cfg),
         "dl": disc_init(jax.random.fold_in(key, 2), cfg)}
    optG, optD = optax.adam(1e-4), optax.adam(1e-4)
    epoch = make_cgan_epoch(cfg, hp, optG, optD, 1, prewarm=False)
    G2, bn2, D2, ema2, gs2, ds2, logs = epoch(G, bn, D, G, optG.init(G),
                                              optD.init(D), X, tab, cnt,
                                              jnp.float32(0.05), jax.random.key(7))
    assert np.isfinite(np.asarray(logs)).all()
    for leaf in jax.tree_util.tree_leaves((G2, D2, gs2, ds2)):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype
    gd = max(np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in
             zip(jax.tree_util.tree_leaves(G), jax.tree_util.tree_leaves(G2)))
    dd = max(np.abs(np.asarray(a) - np.asarray(b)).max() for a, b in
             zip(jax.tree_util.tree_leaves(D), jax.tree_util.tree_leaves(D2)))
    assert gd > 0 and dd > 0


def test_precision_d_validation():
    from eegsynth.train.cgan import CGANHParams
    with pytest.raises(ValueError, match="precision_d"):
        CGANHParams(precision_d="fp16")
    with pytest.raises(ValueError, match="conv"):
        CGANHParams(arch="transformer", precision_d="bf16")


def test_cgan_pipelined_logs_complete_with_odd_boundaries(tmp_path):
    """Multi-epoch dispatches with a save boundary that is neither a chunk
    multiple nor the final epoch: the deferred-log pipeline must still write
    every epoch row exactly once, in order, and fire the boundary artifacts
    (train/cgan.py process_pending/refresh_best paths)."""
    from eegsynth.train.cgan import train_one_condition

    rng = np.random.default_rng(3)
    data_dir = tmp_path / "prep"
    data_dir.mkdir()
    for p in range(1, 10):
        np.savez_compressed(
            data_dir / f"posture{p}_no_exo.npz",
            X=rng.uniform(0, 1, (6, 768, 14)).astype(np.float32),
            posture=np.int32(p), condition="no_exo", fs=np.float32(128.0),
            ch_names=np.array([f"ch{i}" for i in range(14)], dtype=object),
            scale_min=np.zeros(14, np.float32),
            scale_range=np.ones(14, np.float32))

    res = train_one_condition(data_dir, tmp_path / "runs", "no_exo",
                              epochs=5, batch_size=8, save_every=4,
                              epochs_per_dispatch=2, print_every=1,
                              ckpt_format="npz", log=lambda *a: None)
    run_dir = tmp_path / "runs" / "no_exo"
    rows = (run_dir / "metrics.csv").read_text().strip().split("\n")
    assert [r.split(",")[0] for r in rows[1:]] == ["1", "2", "3", "4", "5"]
    assert all(np.isfinite(float(v)) for r in rows[1:] for v in r.split(","))
    assert (run_dir / "checkpoint_epoch4.npz").exists()
    assert (run_dir / "CGAN_generator_no_exo_epoch4.npz").exists()
    assert (run_dir / "CGAN_generator_no_exo_last.npz").exists()
    assert np.isfinite(res["best_g"])

# integration tier: full trainer loops / golden end-to-end drives (fast lane: -m "not slow")
pytestmark = pytest.mark.slow
