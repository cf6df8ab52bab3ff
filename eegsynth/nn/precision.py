"""Mixed-precision policy helpers.

TPU inference for this framework is HBM-bound: the fused GRU cascades stream
(B, T, 3H) hoisted input projections and (B, T, C) outputs through HBM, and
the CGAN generator streams (B, C', T') conv activations — halving the element
width nearly halves the traffic. ``bfloat16`` is the TPU-native half format
(same exponent range as f32, no loss-scaling needed), so the synthesis paths
offer an opt-in policy: **master parameters stay f32**, compute runs in bf16,
and outputs are returned in f32.

The reference (torch) has no mixed precision on its inference paths and its
training AMP flag is a no-op outside CUDA (timeGAN reference has none; CGAN
``--amp-d`` guards a GradScaler that never engages on CPU) — this module is a
TPU-native extra. Training stays f32 by default: at the reference model sizes
the training step is latency- not bandwidth-bound, and GAN losses (R1
grad-of-grad, hinge margins) are numerically touchy in half precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PRECISIONS = ("f32", "bf16")

_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16}


def compute_dtype(precision: str):
    """Map a CLI-facing precision name to the jnp dtype used for compute."""
    if precision not in _DTYPES:
        raise ValueError(f"precision must be one of {PRECISIONS}, got {precision!r}")
    return _DTYPES[precision]


def cast_floating(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``.

    Integer leaves (step counters, label tables) and None subtrees pass
    through untouched, so a full train-state or model pytree can be cast
    safely. This is one fused device op per leaf — for the reference-size
    TimeGAN (~100 KB of parameters) the cast is negligible next to a single
    synthesis dispatch, so callers cast per call rather than caching a
    half-precision copy.
    """
    def cast(a):
        a = jnp.asarray(a)
        return a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
    return jax.tree.map(cast, tree)
