"""Downstream neuroscience analysis: band powers, fatigue indices, t-tests."""

from eegsynth.analysis.bandpower import (  # noqa: F401
    BANDS, band_powers, compute_psd_per_channel,
)
from eegsynth.analysis.fatigue import fatigue_indices, workload_ratio  # noqa: F401
