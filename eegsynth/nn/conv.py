"""1-D convolution blocks with torch-default init and spectral-norm variants.

The CGAN stack (reference CGAN/cgan.py:194-255) is Conv1d-based: nearest-×2
upsample → Conv1d(k3,p1) generator blocks and strided spectral-norm Conv1d
(k4,s2,p1) discriminator towers. Convs lower to `lax.conv_general_dilated`,
which XLA tiles onto the MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from eegsynth.nn.spectral_norm import spectral_normalize, _l2_normalize


def _torch_conv_init(key, out_ch: int, in_ch: int, k: int, dtype=jnp.float32):
    """torch Conv1d default: kaiming_uniform(a=√5) ⇒ U(±1/√(in_ch·k)) for both
    weight and bias."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * k)
    return {"w": jax.random.uniform(kw, (out_ch, in_ch, k), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)}


def conv1d_init(key, in_ch: int, out_ch: int, k: int, dtype=jnp.float32):
    return _torch_conv_init(key, out_ch, in_ch, k, dtype)


def conv1d_apply(params, x: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """x: (B, C_in, L) → (B, C_out, L'). NCW layout, OIW weights (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y + params["b"][None, :, None]


def sn_conv1d_init(key, in_ch: int, out_ch: int, k: int, dtype=jnp.float32):
    """Spectral-norm conv: torch reshapes the kernel to (out, in·k) for the
    power iteration; ``u`` has length out_ch."""
    kp, ku = jax.random.split(key)
    p = _torch_conv_init(kp, out_ch, in_ch, k, dtype)
    p["u"] = _l2_normalize(jax.random.normal(ku, (out_ch,), dtype))
    return p


def sn_conv1d_apply(params, x: jax.Array, stride: int = 1, padding: int = 0,
                    train: bool = True, compute_dtype=None):
    """Returns (y, updated params) — power iteration advances in train mode.

    ``compute_dtype`` (e.g. bfloat16) casts the normalized weight and runs the
    conv in that dtype; the power iteration and its ``u`` state stay in the
    parameter dtype (more stable than the reference's AMP, which lets autocast
    run the power-iteration matvecs in fp16 — CGAN/cgan.py:351,399)."""
    w = params["w"]
    w2d = w.reshape(w.shape[0], -1)
    w_sn, u_new = spectral_normalize(w2d, params["u"], update=train)
    w_sn = w_sn.reshape(w.shape)
    b = params["b"]
    if compute_dtype is not None:
        w_sn, b, x = w_sn.astype(compute_dtype), b.astype(compute_dtype), \
            x.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w_sn, window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = y + b[None, :, None]
    return y, {**params, "u": u_new}


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """nn.Upsample(scale_factor=2, mode='nearest') on (B, C, L)."""
    return jnp.repeat(x, 2, axis=-1)
