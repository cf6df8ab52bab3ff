"""GRU / dense / spectral-norm parity vs PyTorch (SURVEY.md §4 unit tier)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from eegsynth.nn.gru import gru_apply, gru_init, gru_stack_apply, gru_stack_init
from eegsynth.nn.layers import dense_apply, dense_init
from eegsynth.nn.spectral_norm import sn_dense_apply, sn_dense_init


def _torch_gru_from_params(params, input_dim, hidden_dim):
    g = torch.nn.GRU(input_dim, hidden_dim, num_layers=1, batch_first=True)
    with torch.no_grad():
        g.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"])))
        g.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"])))
        g.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        g.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
    return g


def test_gru_matches_torch(rng):
    B, T, I, H = 4, 37, 14, 28
    params = gru_init(jax.random.key(0), I, H)
    x = rng.standard_normal((B, T, I)).astype(np.float32)

    ours = np.asarray(gru_apply(params, jnp.asarray(x)))
    g = _torch_gru_from_params(params, I, H)
    with torch.no_grad():
        ref, _ = g(torch.tensor(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-5)


def test_gru_stack_two_layers(rng):
    B, T, I, H = 2, 16, 6, 12
    params = gru_stack_init(jax.random.key(1), I, H, num_layers=2)
    x = rng.standard_normal((B, T, I)).astype(np.float32)
    ours = np.asarray(gru_stack_apply(params, jnp.asarray(x)))

    g = torch.nn.GRU(I, H, num_layers=2, batch_first=True)
    with torch.no_grad():
        for layer in range(2):
            p = params[layer]
            getattr(g, f"weight_ih_l{layer}").copy_(torch.tensor(np.asarray(p["w_ih"])))
            getattr(g, f"weight_hh_l{layer}").copy_(torch.tensor(np.asarray(p["w_hh"])))
            getattr(g, f"bias_ih_l{layer}").copy_(torch.tensor(np.asarray(p["b_ih"])))
            getattr(g, f"bias_hh_l{layer}").copy_(torch.tensor(np.asarray(p["b_hh"])))
        ref, _ = g(torch.tensor(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-5)


def test_gru_variable_length(rng):
    """GRUs run at any T at inference (generate_long_synth.py:28)."""
    params = gru_init(jax.random.key(2), 28, 56)
    for T in (10, 768, 2000):
        y = gru_apply(params, jnp.zeros((2, T, 28)))
        assert y.shape == (2, T, 56)


def test_dense_matches_torch(rng):
    params = dense_init(jax.random.key(3), 56, 14)
    x = rng.standard_normal((8, 56)).astype(np.float32)
    lin = torch.nn.Linear(56, 14)
    with torch.no_grad():
        lin.weight.copy_(torch.tensor(np.asarray(params["w"])))
        lin.bias.copy_(torch.tensor(np.asarray(params["b"])))
        ref = lin(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(dense_apply(params, x)), ref, atol=1e-6)


def test_spectral_norm_matches_torch(rng):
    out_dim, in_dim = 1, 56
    params = sn_dense_init(jax.random.key(4), in_dim, out_dim)
    x = rng.standard_normal((8, in_dim)).astype(np.float32)

    lin = torch.nn.utils.spectral_norm(torch.nn.Linear(in_dim, out_dim))
    with torch.no_grad():
        lin.weight_orig.copy_(torch.tensor(np.asarray(params["w"])))
        lin.bias.copy_(torch.tensor(np.asarray(params["b"])))
        lin.weight_u.copy_(torch.tensor(np.asarray(params["u"])))

    # training forward: one power iteration, then normalized weight
    lin.train()
    ref = lin(torch.tensor(x)).detach().numpy()
    ours, new_params = sn_dense_apply(params, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["u"]),
                               lin.weight_u.detach().numpy(), atol=1e-5)

    # second forward advances the power iteration identically
    ref2 = lin(torch.tensor(x)).detach().numpy()
    ours2, _ = sn_dense_apply(new_params, jnp.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=1e-5)


def test_spectral_norm_divides_by_sigma(rng):
    params = sn_dense_init(jax.random.key(5), 32, 16)
    params["w"] = params["w"] * 10.0
    p = dict(params)
    for _ in range(30):  # converge power iteration
        _, p = sn_dense_apply(p, jnp.zeros((1, 32)), train=True)
    w_sn, _ = __import__("eegsynth.nn.spectral_norm", fromlist=["spectral_normalize"]).spectral_normalize(p["w"], p["u"])
    s = np.linalg.svd(np.asarray(w_sn), compute_uv=False)
    assert abs(s[0] - 1.0) < 1e-4
