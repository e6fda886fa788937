"""Sampling engines + run_model handlers (L5/L6)."""

from fmdm_tpu.sample.engine import (
    SamplingEngine,
    align_conditioning,
    normalize_latent_conditioning,
    prepare_attention_context,
    sample_with_scheduler,
    select_timesteps,
)
