"""TimeGAN loss parity vs NumPy/torch oracles (formulas from train_timegan.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from eegsynth.losses.timegan import (
    acf_loss, bce, cov_loss, recon_loss, smooth_labels, sup_loss, throttle_scale,
)


def test_recon_loss(rng):
    x = rng.standard_normal((4, 16, 3)).astype(np.float32)
    y = rng.standard_normal((4, 16, 3)).astype(np.float32)
    ref = 10.0 * np.sqrt(np.mean((x - y) ** 2) + 1e-8)
    np.testing.assert_allclose(float(recon_loss(x, y)), ref, rtol=1e-6)
    # weighted: only first 3 samples valid == plain loss on those samples
    w = np.array([1, 1, 1, 0], np.float32)
    ref3 = 10.0 * np.sqrt(np.mean((x[:3] - y[:3]) ** 2) + 1e-8)
    np.testing.assert_allclose(float(recon_loss(x, y, weight=w)), ref3, rtol=1e-6)


def test_sup_loss(rng):
    h = rng.standard_normal((4, 16, 5)).astype(np.float32)
    ref = np.mean((h[:, 1:] - h[:, :-1]) ** 2)
    np.testing.assert_allclose(float(sup_loss(h)), ref, rtol=1e-6)


def test_bce_matches_torch(rng):
    p = rng.uniform(1e-6, 1 - 1e-6, (8, 1)).astype(np.float32)
    y = rng.uniform(0, 1, (8, 1)).astype(np.float32)
    ref = torch.nn.BCELoss()(torch.tensor(p), torch.tensor(y)).item()
    np.testing.assert_allclose(float(bce(p, y)), ref, rtol=1e-6)
    # extreme probabilities exercise the -100 clamp
    p_ext = np.array([[1e-45], [1.0 - 1e-7]], np.float32)
    y_ext = np.array([[1.0], [0.0]], np.float32)
    ref = torch.nn.BCELoss()(torch.tensor(p_ext), torch.tensor(y_ext)).item()
    np.testing.assert_allclose(float(bce(p_ext, y_ext)), ref, rtol=1e-4)


def test_cov_loss(rng):
    xf = rng.standard_normal((4, 16, 3)).astype(np.float32)
    xr = rng.standard_normal((4, 16, 3)).astype(np.float32)

    def np_cov(x):
        X = x.reshape(-1, x.shape[-1])
        X = X - X.mean(axis=0, keepdims=True)
        return X.T @ X / (X.shape[0] - 1)

    ref = np.linalg.norm(np_cov(xf) - np_cov(xr), "fro") / (3 * 3) ** 0.5
    np.testing.assert_allclose(float(cov_loss(xf, xr)), ref, rtol=1e-5)


def test_acf_loss_matches_torch_formula(rng):
    xg = rng.standard_normal((3, 40, 2)).astype(np.float32)
    xr = rng.standard_normal((3, 40, 2)).astype(np.float32)

    def acf_all(x, L):
        xm = x.mean(axis=(0, 1), keepdims=True)
        xs = x.std(axis=(0, 1), ddof=1, keepdims=True) + 1e-8
        xz = (x - xm) / xs
        return np.stack([(xz[:, :-l] * xz[:, l:]).mean(axis=(0, 1)) for l in range(1, L + 1)])

    ref = np.mean(np.abs(acf_all(xg, 8) - acf_all(xr, 8)))
    np.testing.assert_allclose(float(acf_loss(xg, xr, 8)), ref, rtol=1e-5)


def test_smooth_labels_ranges():
    real, fake = smooth_labels(jax.random.key(0), 1000, 0.2)
    assert float(jnp.min(real)) >= 0.8 and float(jnp.max(real)) <= 1.0
    assert float(jnp.min(fake)) >= 0.0 and float(jnp.max(fake)) <= 0.2


def test_throttle_scale():
    # reference: scale = max(0.2, 1 - max(0, acc-target)/band)
    assert float(throttle_scale(jnp.float32(0.5), 0.565, 0.23)) == 1.0
    np.testing.assert_allclose(float(throttle_scale(jnp.float32(0.68), 0.565, 0.23)),
                               max(0.2, 1 - (0.68 - 0.565) / 0.23), rtol=1e-6)
    assert float(throttle_scale(jnp.float32(1.0), 0.565, 0.23)) == np.float32(0.2)
