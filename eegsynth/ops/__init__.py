"""Core batched numerics shared by preprocessing, losses, and evaluation.

Everything here is pure jnp / lax — jit-friendly, static shapes, batched so the
TPU VPU/MXU sees large fused element-wise/matmul work instead of Python loops.
"""

from eegsynth.ops.filtering import lfilter, filtfilt  # noqa: F401
from eegsynth.ops.spectral import welch_psd, hann_periodic, trapezoid  # noqa: F401
from eegsynth.ops.acf import acf_per_channel, mean_acf_per_channel  # noqa: F401
from eegsynth.ops.stats import channel_cov, channel_corrcoef  # noqa: F401
