"""Data layer: CSV→NPZ preprocessing contract, windowing, scaling, bucket datasets."""

from eegsynth.data.io import Bucket, load_bucket, save_bucket, write_prep_index  # noqa: F401
from eegsynth.data.scaling import minmax_fit, minmax_apply, minmax_invert  # noqa: F401
from eegsynth.data.windowing import epoch_fixed  # noqa: F401
