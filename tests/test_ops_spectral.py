"""Welch / ACF / covariance parity vs scipy+numpy oracles."""

import numpy as np
import pytest
import scipy.signal as sig

from eegsynth.ops.acf import acf_per_channel, mean_acf_per_channel, pearson_lag_corrs
from eegsynth.ops.spectral import welch_psd, trapezoid, rfft_power
from eegsynth.ops.stats import channel_cov, channel_corrcoef, per_sample_channel_cov


def test_welch_matches_scipy(rng):
    x = rng.standard_normal((8, 768, 14))
    f_ref, p_ref = sig.welch(x, fs=128.0, axis=1, nperseg=256)
    f, p = welch_psd(x, fs=128.0, nperseg=256, axis=1)
    np.testing.assert_allclose(np.asarray(f), f_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)


def test_welch_1d_and_odd_nperseg(rng):
    x = rng.standard_normal(2560)
    f_ref, p_ref = sig.welch(x, fs=128.0, nperseg=512, noverlap=256)
    f, p = welch_psd(x, fs=128.0, nperseg=512, noverlap=256)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)
    f_ref, p_ref = sig.welch(x, fs=128.0, nperseg=255)
    f, p = welch_psd(x, fs=128.0, nperseg=255)
    np.testing.assert_allclose(np.asarray(p), p_ref, rtol=1e-8, atol=1e-12)


def test_trapezoid(rng):
    y = rng.standard_normal(50)
    x = np.sort(rng.standard_normal(50))
    oracle = getattr(np, "trapezoid", np.trapz)  # np.trapz deprecated in numpy 2
    np.testing.assert_allclose(float(trapezoid(y, x)), oracle(y, x), rtol=1e-9)


def test_rfft_power(rng):
    x = rng.standard_normal((4, 768, 14))
    ref = np.abs(np.fft.rfft(x, axis=1)) ** 2
    np.testing.assert_allclose(np.asarray(rfft_power(x, axis=1)), ref, rtol=1e-7, atol=1e-9)


def _acf_all_oracle(x, max_lag):
    """NumPy replication of train_timegan.py:110-122 (torch unbiased std)."""
    xm = x.mean(axis=(0, 1), keepdims=True)
    xs = x.std(axis=(0, 1), ddof=1, keepdims=True) + 1e-8
    xz = (x - xm) / xs
    out = []
    for lag in range(1, max_lag + 1):
        out.append((xz[:, :-lag, :] * xz[:, lag:, :]).mean(axis=(0, 1)))
    return np.stack(out, axis=0)


@pytest.mark.parametrize("max_lag", [48, 110])  # direct-slice and FFT paths
def test_acf_per_channel_matches_loop(rng, max_lag):
    x = rng.standard_normal((6, 120, 5))
    ours = np.asarray(acf_per_channel(x, max_lag))
    np.testing.assert_allclose(ours, _acf_all_oracle(x, max_lag),
                               rtol=1e-6, atol=1e-9)


def _autocorr_seq_oracle(x, maxlag):
    """NumPy replication of evaluation.py:63-70."""
    if np.std(x) < 1e-8:
        return 0.0
    vals = []
    for lag in range(1, maxlag + 1):
        if lag >= len(x):
            break
        vals.append(np.corrcoef(x[:-lag], x[lag:])[0, 1])
    return float(np.mean(vals)) if vals else 0.0


def test_pearson_lag_corrs(rng):
    x = rng.standard_normal(200)
    ours = np.asarray(pearson_lag_corrs(x, 96))
    ref = [np.corrcoef(x[:-lag], x[lag:])[0, 1] for lag in range(1, 97)]
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_mean_acf_ill_conditioned_f32(rng):
    # Regression: sequences with mean >> std used to hit catastrophic f32
    # cancellation in the E[x²]−m² segment variance (a real trained-run
    # synthetic channel measured −1.1e5 vs the f64 oracle's −0.243). The
    # pre-centering fix must keep f32 on the f64 oracle.
    x = (1.0 + 0.013 * rng.standard_normal((8, 768, 2))).astype(np.float32)
    ours = np.asarray(mean_acf_per_channel(x, 96))
    ref = [np.mean([_autocorr_seq_oracle(seq[:, c].astype(np.float64), 96)
                    for seq in x]) for c in range(2)]
    assert np.all(np.abs(ours) <= 1.0)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_mean_acf_flat_segment(rng):
    # Regression (round 5): a window whose per-lag tail SEGMENT is nearly
    # constant relative to its mean (segment var/mean² ~1e-5 — a real GAN
    # output flat over its tail) cancels catastrophically in any f32
    # E[x²]−m² form even after global centering/standardization (measured
    # |corr| up to 1e6 where the f64 oracle says −0.71). The eval feature
    # must run in host f64 and stay on the oracle.
    x = np.full((4, 768, 2), -0.16, np.float32)
    x[:, :80, :] += 0.04 * rng.standard_normal((4, 80, 2)).astype(np.float32)
    x[:, 80:, :] += 1e-4 * rng.standard_normal((4, 688, 2)).astype(np.float32)
    ours = np.asarray(mean_acf_per_channel(x, 96))
    ref = [np.mean([_autocorr_seq_oracle(seq[:, c].astype(np.float64), 96)
                    for seq in x]) for c in range(2)]
    assert np.all(np.abs(ours) <= 1.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mean_acf_per_channel(rng):
    x = rng.standard_normal((5, 128, 3)).astype(np.float64)
    x[:, :, 1] = 0.5  # constant channel triggers the std guard
    ours = np.asarray(mean_acf_per_channel(x, 96))
    ref = [np.mean([_autocorr_seq_oracle(seq[:, c], 96) for seq in x]) for c in range(3)]
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_channel_cov_corr(rng):
    x = rng.standard_normal((7, 64, 6))
    flat = x.reshape(-1, 6)
    np.testing.assert_allclose(np.asarray(channel_cov(x)), np.cov(flat, rowvar=False),
                               rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(np.asarray(channel_corrcoef(x)),
                               np.corrcoef(flat, rowvar=False), rtol=1e-7, atol=1e-10)


def test_per_sample_channel_cov(rng):
    x = rng.standard_normal((4, 6, 64))  # (B, C, T)
    ref = np.mean([np.cov(s) for s in x], axis=0)
    np.testing.assert_allclose(np.asarray(per_sample_channel_cov(x)), ref, rtol=1e-8, atol=1e-12)


def test_windowing_and_scaling(rng):
    from eegsynth.data.scaling import minmax_apply, minmax_fit, minmax_invert
    from eegsynth.data.windowing import epoch_fixed

    arr = rng.standard_normal((2000, 14))
    eps = epoch_fixed(arr, 768, 0.0)
    assert eps.shape == (2, 768, 14)
    np.testing.assert_allclose(eps[1], arr[768:1536], rtol=1e-6)
    assert epoch_fixed(arr[:700], 768).shape == (0, 768, 14)
    # 50% overlap
    assert epoch_fixed(arr, 768, 0.5).shape == (4, 768, 14)

    x = rng.standard_normal((5, 768, 14)).astype(np.float32)
    mn, rg = minmax_fit(x)
    xs = minmax_apply(x, mn, rg)
    assert xs.min() >= 0.0 and xs.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(minmax_invert(xs, mn, rg), x, atol=1e-4)


def test_log_psd_loss_targets_log_domain(rng):
    """log_psd_loss (framework extra) must see low-power-cell mismatches the
    linear psd_loss is blind to, match the eval features' normalization, and
    keep posture_conditional_losses' zero-weight graph unchanged."""
    import jax
    import jax.numpy as jnp
    from eegsynth.losses.spectral import (
        log_psd_loss, posture_conditional_losses, psd_loss,
    )

    # real: EEG-like 1/f spectrum — strong low-frequency, near-zero
    # high-frequency power; fake adds a tiny high-frequency ripple that is
    # invisible to linear PSD L1 but orders of magnitude off in the log
    # domain (the separability mechanism found in round 4)
    t = np.arange(64)
    phases = rng.uniform(0, 2 * np.pi, (12, 3, 1))
    r = (0.5 + 0.4 * np.sin(2 * np.pi * 2 * t / 64 + phases)).astype(np.float32)
    ripple = 1e-3 * np.sin(2 * np.pi * 0.45 * t).astype(np.float32)
    r = jnp.asarray(r)
    f = r + jnp.asarray(ripple)[None, None, :]
    lin, logd = float(psd_loss(r, f)), float(log_psd_loss(r, f))
    # relative to each loss's own scale on this data, the log-domain term
    # must amplify the mismatch by orders of magnitude
    assert logd > 100 * lin, (lin, logd)

    lab = jnp.asarray(np.arange(12) % 3)
    base = posture_conditional_losses(r, f, lab, 3, 0.5, 0.25, 0.25)
    same = posture_conditional_losses(r, f, lab, 3, 0.5, 0.25, 0.25, 0.0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    with_log = posture_conditional_losses(r, f, lab, 3, 0.5, 0.25, 0.25, 2.0)
    assert float(with_log) > float(base)
    g = jax.grad(lambda ff: posture_conditional_losses(
        r, ff, lab, 3, 0.5, 0.25, 0.25, 2.0))(f)
    assert bool(jnp.isfinite(g).all())
