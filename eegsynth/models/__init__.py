"""Model families: TimeGAN (5 scan-GRU networks) and the conditional GAN."""

from eegsynth.models.timegan import (  # noqa: F401
    TimeGANConfig, adaptive_dims, timegan_init,
    encode, recover, reconstruct, gen_latent, refine_latent, decode, discriminate,
)
