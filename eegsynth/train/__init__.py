"""Training drivers: jitted 3-phase TimeGAN, CGAN loops, sharding, checkpoints."""
