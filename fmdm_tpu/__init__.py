"""
fmdm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for training and sampling
latent autoencoders (KL-VAE, VQ-VAE recipes), DDPM diffusion and flow matching.

Re-designed TPU-first from the capability surface of
tomn681/Flow-Matching-and-Diffusion-Models (see SURVEY.md):

- ``ops``        pure-JAX ND primitives (conv/norm/resample/time-embedding) and
                 Pallas TPU kernels for the hot paths.
- ``nn``         functional blocks (ResBlockND, attention, VAE encoder/decoder,
                 quantizers, losses). Parameter trees mirror the reference's
                 ``state_dict`` key paths so torch checkpoints convert 1:1.
- ``schedulers`` pure-JAX, stateless diffusion/flow schedulers composable inside
                 ``jax.lax.scan`` (ddpm/ddim/dpm-solver/dpm-sde/unipc/flow-match).
- ``models``     AutoencoderKL, VQVAE, EfficientUNetND, UNetDiffusersND + factories.
- ``data``       numpy data layer (MNIST/LDCT/base) with tensor cache.
- ``train``      jitted trainers (diffusion, flow matching, VAE+GAN).
- ``sample``     compiled sampling loops + run_model handlers.
- ``parallel``   device-mesh / sharding helpers (data parallelism over ICI).
- ``utils``      config IO, run dirs, checkpointing, metrics, evaluation.
"""

__version__ = "0.1.0"
