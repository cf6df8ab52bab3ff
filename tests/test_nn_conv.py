"""Conv / CBN / spectral-norm-conv parity vs PyTorch."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from eegsynth.nn.conv import (
    conv1d_apply, conv1d_init, sn_conv1d_apply, sn_conv1d_init, upsample_nearest_2x,
)
from eegsynth.nn.norm import cbn1d_apply, cbn1d_init, cbn1d_state_init


def test_conv1d_matches_torch(rng):
    p = conv1d_init(jax.random.key(0), 6, 12, 3)
    x = rng.standard_normal((4, 6, 32)).astype(np.float32)
    conv = torch.nn.Conv1d(6, 12, 3, stride=1, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(np.asarray(p["w"])))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        ref = conv(torch.tensor(x)).numpy()
    ours = np.asarray(conv1d_apply(p, x, stride=1, padding=1))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_strided_conv_matches_torch(rng):
    p = conv1d_init(jax.random.key(1), 14, 32, 4)
    x = rng.standard_normal((2, 14, 768)).astype(np.float32)
    conv = torch.nn.Conv1d(14, 32, 4, stride=2, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(np.asarray(p["w"])))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        ref = conv(torch.tensor(x)).numpy()
    ours = np.asarray(conv1d_apply(p, x, stride=2, padding=1))
    assert ours.shape == (2, 32, 384)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_sn_conv_matches_torch(rng):
    p = sn_conv1d_init(jax.random.key(2), 6, 8, 4)
    x = rng.standard_normal((4, 6, 64)).astype(np.float32)
    conv = torch.nn.utils.spectral_norm(torch.nn.Conv1d(6, 8, 4, stride=2, padding=1))
    with torch.no_grad():
        conv.weight_orig.copy_(torch.tensor(np.asarray(p["w"])))
        conv.bias.copy_(torch.tensor(np.asarray(p["b"])))
        conv.weight_u.copy_(torch.tensor(np.asarray(p["u"])))
    conv.train()
    ref = conv(torch.tensor(x)).detach().numpy()
    ours, p2 = sn_conv1d_apply(p, x, stride=2, padding=1, train=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)
    np.testing.assert_allclose(np.asarray(p2["u"]), conv.weight_u.detach().numpy(),
                               atol=1e-5)


def test_upsample_nearest(rng):
    x = rng.standard_normal((2, 3, 8)).astype(np.float32)
    ref = torch.nn.Upsample(scale_factor=2, mode="nearest")(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(upsample_nearest_2x(x)), ref)


def test_cbn_matches_torch(rng):
    nf, ncls = 8, 3
    params = cbn1d_init(jax.random.key(3), nf, ncls)
    state = cbn1d_state_init(nf)
    x = rng.standard_normal((6, nf, 16)).astype(np.float32)
    labels = np.array([0, 1, 2, 0, 1, 2])

    bn = torch.nn.BatchNorm1d(nf, affine=False)
    emb = torch.nn.Embedding(ncls, nf * 2)
    with torch.no_grad():
        emb.weight.copy_(torch.tensor(np.asarray(params["embed"])))
    bn.train()
    h = bn(torch.tensor(x))
    g, b = emb(torch.tensor(labels)).chunk(2, dim=1)
    ref = (g.unsqueeze(-1) * h + b.unsqueeze(-1)).detach().numpy()

    ours, new_state = cbn1d_apply(params, state, x, jnp.asarray(labels), train=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), atol=1e-5)

    # eval mode uses running stats
    bn.eval()
    ref_eval = (g.unsqueeze(-1) * bn(torch.tensor(x)) + b.unsqueeze(-1)).detach().numpy()
    ours_eval, _ = cbn1d_apply(params, new_state, x, jnp.asarray(labels), train=False)
    np.testing.assert_allclose(np.asarray(ours_eval), ref_eval, atol=1e-5)
