"""VAE trainer (KL + VQ recipes with GAN/perceptual losses).

Implemented in fmdm_tpu.train.vae_impl once the VAE model stack lands; this
module keeps the import surface stable for train.py dispatch."""

from fmdm_tpu.train.vae_impl import debug_visual_only, train  # noqa: F401
