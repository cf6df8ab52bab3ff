"""Zero-phase IIR filtering as `lax.scan` — the TPU replacement for scipy.filtfilt.

The reference applies scipy ``filtfilt`` with Butterworth band-pass + IIR notch
coefficients during preprocessing (reference: timeGAN/pre-processing.py:93-99,173-179).
Here the *design* stays on the host (scipy, see ``eegsynth.data.filters``) while the
*application* is a jittable direct-form-II-transposed recurrence that XLA fuses and
vectorizes across channels/files. Matches scipy's default ``padtype='odd'``,
``padlen=3*max(len(a),len(b))`` semantics so outputs agree with the reference pipeline.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def lfilter_zi(b: np.ndarray, a: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions for a step input (host-side, numpy).

    Same linear system scipy.signal.lfilter_zi solves; used to seed the
    forward/backward passes of :func:`filtfilt`.
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    if a[0] != 1.0:
        b = b / a[0]
        a = a / a[0]
    n = max(len(a), len(b))
    a = np.concatenate([a, np.zeros(n - len(a))])
    b = np.concatenate([b, np.zeros(n - len(b))])
    # Companion-matrix formulation: zi = (I - A^T)^-1 B
    comp = np.zeros((n - 1, n - 1))
    comp[0, :] = -a[1:n]
    comp[1:, :-1] = np.eye(n - 2)
    B = b[1:n] - a[1:n] * b[0]
    zi = np.linalg.solve(np.eye(n - 1) - comp.T, B)
    return zi


@partial(jax.jit, static_argnames=("axis",))
def lfilter(b: jax.Array, a: jax.Array, x: jax.Array, zi: jax.Array | None = None,
            axis: int = 0) -> jax.Array:
    """IIR filter along ``axis`` via direct-form II transposed `lax.scan`.

    ``x`` may have any number of trailing/leading batch dims; the recurrence is
    carried across the time axis while all other dims ride the VPU lanes.
    ``zi`` has shape ``(order,) + batch_shape`` (or None for zeros).
    """
    x = jnp.moveaxis(x, axis, 0)
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    n = max(b.shape[0], a.shape[0])
    b = jnp.pad(b, (0, n - b.shape[0]))
    a = jnp.pad(a, (0, n - a.shape[0]))
    b = b / a[0]
    a = a / a[0]
    order = n - 1
    batch_shape = x.shape[1:]
    if zi is None:
        z0 = jnp.zeros((order,) + batch_shape, dtype=x.dtype)
    else:
        z0 = jnp.asarray(zi, dtype=x.dtype)

    b_taps = b[1:].reshape((order,) + (1,) * len(batch_shape))
    a_taps = a[1:].reshape((order,) + (1,) * len(batch_shape))

    def step(z, xt):
        yt = b[0] * xt + z[0]
        # z_i' = b_{i+1} x + z_{i+1} - a_{i+1} y   (z_order := 0)
        z_shift = jnp.concatenate([z[1:], jnp.zeros((1,) + batch_shape, dtype=x.dtype)], axis=0)
        z_new = b_taps * xt[None] + z_shift - a_taps * yt[None]
        return z_new, yt

    _, y = jax.lax.scan(step, z0, x)
    return jnp.moveaxis(y, 0, axis)


def _odd_ext(x: jax.Array, padlen: int) -> jax.Array:
    """Odd extension at both ends along axis 0 (scipy padtype='odd')."""
    left = 2 * x[0] - x[1:padlen + 1][::-1]
    right = 2 * x[-1] - x[-padlen - 1:-1][::-1]
    return jnp.concatenate([left, x, right], axis=0)


def filtfilt(b, a, x: jax.Array, axis: int = 0) -> jax.Array:
    """Zero-phase forward-backward IIR filter, scipy.filtfilt-compatible.

    Default scipy semantics: odd extension of length ``3*max(len(a),len(b))``,
    forward and backward passes each seeded with ``lfilter_zi * first_sample``.
    ``b``/``a`` are host-side numpy coefficient arrays (static per design).
    """
    b = np.asarray(b, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    padlen = 3 * max(len(a), len(b))
    zi_host = lfilter_zi(b, a)  # (order,)

    x = jnp.moveaxis(x, axis, 0)
    T = x.shape[0]
    if T <= padlen:
        raise ValueError(f"Input length {T} must exceed padlen {padlen}.")
    batch_shape = x.shape[1:]
    zi = jnp.asarray(zi_host, dtype=x.dtype).reshape((-1,) + (1,) * len(batch_shape))

    ext = _odd_ext(x, padlen)
    y = lfilter(b, a, ext, zi=zi * ext[0][None], axis=0)
    y = y[::-1]
    y = lfilter(b, a, y, zi=zi * y[0][None], axis=0)
    y = y[::-1]
    y = y[padlen:padlen + T]
    return jnp.moveaxis(y, 0, axis)
