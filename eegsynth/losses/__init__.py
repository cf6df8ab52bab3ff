"""Loss library: TimeGAN reconstruction/supervised/moment losses, GAN objectives."""

from eegsynth.losses.timegan import (  # noqa: F401
    recon_loss, sup_loss, bce, smooth_labels, add_instance_noise,
    cov_loss, acf_loss, throttle_scale,
)
