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

# Honor JAX_PLATFORMS even when a PJRT plugin's registration hook (e.g. the
# axon TPU sitecustomize in this image) force-selects its own platform after
# env processing: an explicit jax.config update wins over both. Without this,
# `JAX_PLATFORMS=cpu python train.py ...` silently runs on the TPU — and a
# second process touching a single-client TPU tunnel can wedge the first.
# No-op when the env var is unset (plugin/default selection applies).


def _honor_jax_platforms_env() -> None:
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        try:
            jax.config.update("jax_platforms", plat)
        except Exception:  # backend already initialized — too late to switch
            pass


_honor_jax_platforms_env()
