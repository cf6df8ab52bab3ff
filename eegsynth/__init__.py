"""eegsynth — TPU-native (JAX/XLA/Pallas/pjit) synthetic-EEG framework.

A from-scratch rebuild of the capabilities of the reference research codebase
`Jeniya1378/eeg-gan-timegan-cgan` (PyTorch, single-device), re-designed for TPU:

- ``eegsynth.ops``      — batched spectral/autocorr/filtering numerics (jnp, MXU/VPU friendly)
- ``eegsynth.data``     — CSV→NPZ preprocessing contract, windowing, scaling, bucket datasets
- ``eegsynth.nn``       — scan-GRU (+ fused Pallas GRU cell), spectral-norm dense/conv, cond-BN
- ``eegsynth.models``   — TimeGAN 5-network bundle; conditional GAN generator/discriminators
- ``eegsynth.losses``   — reconstruction/supervised/moment/spectral/GAN losses
- ``eegsynth.train``    — jitted 3-phase TimeGAN trainer, CGAN trainer, mesh sharding, ckpts
- ``eegsynth.eval``     — discriminative/predictive scores, PSD/ACF/coherence similarity
- ``eegsynth.analysis`` — band powers, fatigue indices (TBR/TABR/...), t-test reports
- ``eegsynth.viz``      — PCA/t-SNE cluster figures, trace grids, preprocessing stages

The public entry points under ``scripts/`` keep the reference's CLI / config-JSON contracts.
"""

__version__ = "0.1.0"

from eegsynth.runtime import setup_compilation_cache as _setup_cache

_setup_cache()  # one persistent compile per machine, not per process

EPOC_CHANNELS = [
    "AF3", "F7", "F3", "FC5", "T7", "P7", "O1",
    "O2", "P8", "T8", "FC6", "F4", "F8", "AF4",
]
"""Canonical Emotiv EPOC+ channel order (reference: timeGAN/pre-processing.py:22)."""
