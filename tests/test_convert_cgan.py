"""Torch→eegsynth CGAN checkpoint conversion: numerical parity.

Generator parity uses a functional torch oracle replaying the reference
Generator's documented forward (CGAN/cgan.py:205-223: Linear proj → five
(nearest×2 ▸ conv k3 p1 ▸ affine-free BN + class (γ,β) embedding ▸ ReLU)
blocks → conv k3 → sigmoid) on a randomized state_dict. Discriminator parity
runs the reference's COMMITTED ``CGAN_globalD_no_exo_best.pth`` weights
through a functional oracle of DiscBase (cgan.py:225-252) and through our
converted params — same weights + same inputs must agree end-to-end.
"""

import sys
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from convert_torch_ckpt import (
    convert_cgan_disc, convert_cgan_file, convert_cgan_generator,
)
from eegsynth.models.cgan import CGANConfig, disc_apply, generator_apply

REF_D = Path("/root/reference/CGAN/cgan_runs/no_exo/CGAN_globalD_no_exo_best.pth")

K, NOISE = 9, 100


def _random_gen_state_dict(seed=0):
    """Reference-Generator-shaped state_dict with randomized weights AND
    non-trivial BatchNorm running stats (so eval-mode normalization is
    actually exercised)."""
    g = torch.Generator().manual_seed(seed)
    chans = (512, 256, 128, 64, 32, 16)
    sd = {"proj.weight": torch.randn(512 * 24, NOISE + K, generator=g) * 0.05,
          "proj.bias": torch.randn(512 * 24, generator=g) * 0.05}
    for i in range(1, 6):
        ci, co = chans[i - 1], chans[i]
        sd[f"up{i}.conv.weight"] = torch.randn(co, ci, 3, generator=g) * 0.05
        sd[f"up{i}.conv.bias"] = torch.randn(co, generator=g) * 0.05
        sd[f"up{i}.cbn.embed.weight"] = torch.cat(
            [1 + 0.1 * torch.randn(K, co, generator=g),
             0.1 * torch.randn(K, co, generator=g)], dim=1)
        sd[f"up{i}.cbn.bn.running_mean"] = 0.1 * torch.randn(co, generator=g)
        sd[f"up{i}.cbn.bn.running_var"] = 1 + 0.3 * torch.rand(co, generator=g)
        sd[f"up{i}.cbn.bn.num_batches_tracked"] = torch.tensor(7)
    sd["to_out.weight"] = torch.randn(14, 16, 3, generator=g) * 0.05
    sd["to_out.bias"] = torch.randn(14, generator=g) * 0.05
    return sd


def _torch_gen_forward(sd, z, labels):
    """Eval-mode reference Generator forward (cgan.py:205-223, CBN :181-192)."""
    oh = F.one_hot(labels, K).float()
    h = F.linear(torch.cat([z, oh], dim=1), sd["proj.weight"], sd["proj.bias"])
    h = h.view(-1, 512, 24)
    for i in range(1, 6):
        h = F.interpolate(h, scale_factor=2, mode="nearest")
        h = F.conv1d(h, sd[f"up{i}.conv.weight"], sd[f"up{i}.conv.bias"], padding=1)
        h = F.batch_norm(h, sd[f"up{i}.cbn.bn.running_mean"],
                         sd[f"up{i}.cbn.bn.running_var"], training=False)
        gb = F.embedding(labels, sd[f"up{i}.cbn.embed.weight"])
        nf = h.shape[1]
        h = F.relu(gb[:, :nf, None] * h + gb[:, nf:, None])
    x = F.conv1d(h, sd["to_out.weight"], sd["to_out.bias"], padding=1)
    return torch.sigmoid(x)


def test_generator_conversion_matches_torch():
    sd = _random_gen_state_dict()
    params, bn, num_classes, noise_dim = convert_cgan_generator(sd)
    assert (num_classes, noise_dim) == (K, NOISE)

    rng = np.random.default_rng(0)
    z = rng.standard_normal((6, NOISE)).astype(np.float32)
    labels = np.array([0, 3, 8, 1, 1, 5])

    with torch.no_grad():
        ref = _torch_gen_forward(sd, torch.tensor(z), torch.tensor(labels)).numpy()
    cfg = CGANConfig(noise_dim=NOISE, num_classes=K)
    ours, _ = generator_apply(params, bn, jnp.asarray(z), jnp.asarray(labels),
                              cfg, train=False)
    assert ours.shape == (6, 14, 768)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)


def test_generator_legacy_key_renames():
    """u{i}. / out. prefixed checkpoints (the reference's own lenient-loader
    case, eval_cgan.py:90-93) convert identically to canonical keys."""
    sd = _random_gen_state_dict(seed=1)
    legacy = {}
    for k, v in sd.items():
        for i in range(1, 6):
            k = k.replace(f"up{i}.", f"u{i}.")
        legacy[k.replace("to_out.", "out.")] = v
    a, bn_a, *_ = convert_cgan_generator(sd)
    b, bn_b, *_ = convert_cgan_generator(legacy)
    for x, y in zip(jax.tree_util.tree_leaves((a, bn_a)),
                    jax.tree_util.tree_leaves((b, bn_b))):
        np.testing.assert_array_equal(x, y)


def _sn_weight(sd, prefix):
    """torch eval-mode spectral norm: W / (u · W v) with the STORED u, v."""
    w = sd[prefix + ".weight_orig"]
    u, v = sd[prefix + ".weight_u"], sd[prefix + ".weight_v"]
    sigma = torch.dot(u, w.reshape(w.shape[0], -1) @ v)
    return w / sigma


def _torch_disc_forward(sd, x, labels, proj_scale=0.25):
    """Eval-mode reference DiscBase forward (cgan.py:225-252)."""
    h = x
    for i in range(1, 6):
        h = F.leaky_relu(F.conv1d(h, _sn_weight(sd, f"c{i}"), sd[f"c{i}.bias"],
                                  stride=2, padding=1), 0.2)
    f = h.mean(dim=2)
    std = torch.sqrt(f.var(dim=0, unbiased=False) + 1e-8)
    mb = std.mean().view(1).expand(f.size(0), 1)
    proj = (f * F.embedding(labels, sd["embed.weight"])).sum(1, keepdim=True)
    score = (F.linear(f, _sn_weight(sd, "fc"), sd["fc.bias"])
             + proj_scale * proj + sd["std_weight"] * mb)
    logits = F.linear(f, _sn_weight(sd, "cls"), sd["cls.bias"])
    return score, logits, f


@pytest.mark.skipif(not REF_D.exists(), reason="committed checkpoint not on disk")
def test_committed_globald_conversion_matches_torch():
    sd = torch.load(REF_D, map_location="cpu", weights_only=True)
    params, num_classes = convert_cgan_disc(sd)
    assert num_classes == K

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (8, 14, 768)).astype(np.float32)
    labels = np.arange(8) % K

    with torch.no_grad():
        score_t, logits_t, f_t = _torch_disc_forward(
            sd, torch.tensor(x), torch.tensor(labels))
    cfg = CGANConfig(num_classes=K, variant="v1")
    score_j, logits_j, f_j, _ = disc_apply(params, jnp.asarray(x),
                                           jnp.asarray(labels), cfg, train=False)
    # our eval re-derives v from (W, u) instead of torch's stored v
    # (documented deviation, nn/spectral_norm.py) — at this trained
    # checkpoint's converged power iteration the sigmas agree closely
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(score_j), score_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_converted_file_loads_through_load_generator(tmp_path):
    """End-to-end plumbing: .pth file → convert_cgan_file → load_generator
    rebuilds the right config and generates the oracle's output."""
    from eegsynth.train.cgan import load_generator

    sd = _random_gen_state_dict(seed=3)
    src = tmp_path / "CGAN_generator_no_exo_best.pth"
    torch.save(sd, src)
    dst = tmp_path / "CGAN_generator_no_exo_best.npz"
    meta = convert_cgan_file(src, dst)
    assert (meta["variant"], meta["num_classes"], meta["arch"]) == ("v1", K, "conv")

    G, bn, cfg, _ = load_generator(dst)
    assert cfg.num_classes == K and cfg.noise_dim == NOISE and cfg.arch == "conv"
    rng = np.random.default_rng(4)
    z = rng.standard_normal((4, NOISE)).astype(np.float32)
    labels = np.array([2, 2, 7, 0])
    with torch.no_grad():
        ref = _torch_gen_forward(sd, torch.tensor(z), torch.tensor(labels)).numpy()
    ours, _ = generator_apply(G, bn, jnp.asarray(z), jnp.asarray(labels),
                              cfg, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)


def _random_v2_gen_state_dict(seed=11):
    """Reference-accurate v2 generator state_dict: per-posture 2-class model
    whose CBN embedding attribute is ``emb`` (cgan_v2.py:137), NOT v1's
    ``embed`` (cgan.py:185) — real v2 checkpoints carry
    ``up{i}.cbn.emb.weight`` keys."""
    g = torch.Generator().manual_seed(seed)
    chans = (512, 256, 128, 64, 32, 16)
    sd = {"proj.weight": torch.randn(512 * 24, NOISE + 2, generator=g) * 0.05,
          "proj.bias": torch.randn(512 * 24, generator=g) * 0.05}
    for i in range(1, 6):
        ci, co = chans[i - 1], chans[i]
        sd[f"up{i}.conv.weight"] = torch.randn(co, ci, 3, generator=g) * 0.05
        sd[f"up{i}.conv.bias"] = torch.randn(co, generator=g) * 0.05
        sd[f"up{i}.cbn.emb.weight"] = torch.cat(
            [1 + 0.1 * torch.randn(2, co, generator=g),
             0.1 * torch.randn(2, co, generator=g)], dim=1)
        sd[f"up{i}.cbn.bn.running_mean"] = 0.1 * torch.randn(co, generator=g)
        sd[f"up{i}.cbn.bn.running_var"] = 1 + 0.3 * torch.rand(co, generator=g)
        sd[f"up{i}.cbn.bn.num_batches_tracked"] = torch.tensor(3)
    sd["to_out.weight"] = torch.randn(14, 16, 3, generator=g) * 0.05
    sd["to_out.bias"] = torch.randn(14, generator=g) * 0.05
    return sd


def test_v2_two_class_checkpoint_infers_variant(tmp_path):
    """A per-posture (2-condition-class) generator checkpoint
    (cgan_v2.py:152-165, saved :359-363) converts with variant=v2 and the v2
    proj_scale, loads through load_generator with the right config, and
    matches the torch oracle numerically (exercising the ``emb``→``embed``
    key rename on reference-accurate keys)."""
    from eegsynth.train.cgan import load_generator

    sd = _random_v2_gen_state_dict()
    src = tmp_path / "CGAN_generator_posture3_best.pth"
    torch.save(sd, src)
    dst = tmp_path / "CGAN_generator_posture3_best.npz"
    meta = convert_cgan_file(src, dst)
    assert (meta["variant"], meta["num_classes"], meta["tag"],
            meta["proj_scale"]) == ("v2", 2, "posture3", 0.10)

    G, bn, cfg, _ = load_generator(dst)
    assert (cfg.variant, cfg.num_classes, cfg.proj_scale) == ("v2", 2, 0.10)
    rng = np.random.default_rng(5)
    z = rng.standard_normal((4, NOISE)).astype(np.float32)
    labels = np.array([0, 1, 1, 0])
    # torch oracle: same forward as v1, only the CBN attr name differs
    sd_ref = {k.replace(".cbn.emb.", ".cbn.embed."): v for k, v in sd.items()}
    global K
    K_saved, K = K, 2
    try:
        with torch.no_grad():
            ref = _torch_gen_forward(sd_ref, torch.tensor(z),
                                     torch.tensor(labels)).numpy()
    finally:
        K = K_saved
    ours, _ = generator_apply(G, bn, jnp.asarray(z), jnp.asarray(labels),
                              cfg, train=False)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)


def test_variant_inference_prefers_tag_shape():
    """Tag shape wins over class count: a hypothetical 2-class condition-tag
    run stays v1; a posture tag is v2 regardless; unknown tags fall back to
    the class-count heuristic."""
    from scripts.convert_torch_ckpt import _infer_cgan_variant
    assert _infer_cgan_variant("no_exo", 2) == "v1"
    assert _infer_cgan_variant("with_exo", 9) == "v1"
    assert _infer_cgan_variant("posture7", 9) == "v2"
    assert _infer_cgan_variant("posture1", 2) == "v2"
    assert _infer_cgan_variant("mystery", 9) == "v1"
    assert _infer_cgan_variant("mystery", 2) == "v2"
