"""Mixed-precision (bf16) synthesis: policy helpers + output parity vs f32.

The reference has no inference mixed precision (torch CPU/CUDA f32 paths);
bf16 synthesis is a TPU-native extra — master weights stay f32, the fused
G→S→R cascade computes in bfloat16, outputs return in f32
(eegsynth/nn/precision.py, train/timegan.synthesize(precision=...)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eegsynth.models.timegan import TimeGANConfig, timegan_init
from eegsynth.nn.precision import cast_floating, compute_dtype
from eegsynth.train.timegan import synthesize

CFG = TimeGANConfig(x_dim=4, z_dim=8, h_dim=12)


def test_compute_dtype():
    assert compute_dtype("f32") == jnp.float32
    assert compute_dtype("bf16") == jnp.bfloat16
    with pytest.raises(ValueError, match="precision"):
        compute_dtype("fp16")


def test_cast_floating_leaves_non_floats_alone():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "step": jnp.int32(7),
            "nested": [jnp.zeros(3, jnp.float64), None]}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32
    assert out["nested"][0].dtype == jnp.bfloat16
    assert out["nested"][1] is None


def test_synthesize_bf16_matches_f32_closely():
    params = timegan_init(jax.random.key(0), CFG)
    key = jax.random.key(3)
    x32 = np.asarray(synthesize(params, CFG, key, n=16, seq_len=64))
    x16 = np.asarray(synthesize(params, CFG, key, n=16, seq_len=64,
                                precision="bf16"))
    assert x16.dtype == np.float32          # outputs always return in f32
    assert x16.shape == x32.shape
    assert np.isfinite(x16).all()
    # same noise grid (f32 draw, then cast): bf16 tracks f32 to ~3 decimal
    # digits through the bounded GRU recurrence
    corr = np.corrcoef(x32.ravel(), x16.ravel())[0, 1]
    assert corr > 0.999, corr
    assert np.max(np.abs(x16 - x32)) < 0.05


def test_synthesize_bf16_chunked_and_microbatched():
    params = timegan_init(jax.random.key(1), CFG)
    x = synthesize(params, CFG, jax.random.key(5), n=12, seq_len=48,
                   batch=8, time_chunk=16, precision="bf16")
    x2 = synthesize(params, CFG, jax.random.key(5), n=12, seq_len=48,
                    batch=8, time_chunk=16, precision="bf16")
    assert x.shape == (12, 48, 4) and np.isfinite(x).all()
    np.testing.assert_array_equal(x, x2)    # deterministic per (args, seed)


def test_synthesize_mesh_matches_single_device():
    """SURVEY §5 long-sequence plan: batch sharded across devices. Per-window
    GRU chains are independent, so the 8-way sharded run must reproduce the
    single-device output (same host-drawn noise, same params)."""
    from eegsynth.train.sharding import data_mesh

    params = timegan_init(jax.random.key(2), CFG)
    key = jax.random.key(9)
    ref = np.asarray(synthesize(params, CFG, key, n=16, seq_len=32))
    got = np.asarray(synthesize(params, CFG, key, n=16, seq_len=32,
                                mesh=data_mesh()))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)

    # n not divisible by the device count: pads the dispatch, slices back
    odd = np.asarray(synthesize(params, CFG, key, n=11, seq_len=32,
                                mesh=data_mesh()))
    assert odd.shape == (11, 32, 4) and np.isfinite(odd).all()

    # composes with bf16 + micro-batching + time streaming
    x = synthesize(params, CFG, key, n=12, seq_len=48, batch=6, time_chunk=16,
                   precision="bf16", mesh=data_mesh())
    assert x.shape == (12, 48, 4) and np.isfinite(np.asarray(x)).all()
