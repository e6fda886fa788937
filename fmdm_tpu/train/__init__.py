"""Trainers (L5): diffusion, flow matching, VAE."""

from fmdm_tpu.train import diffusion_lib, flow_matching_lib

__all__ = ["diffusion_lib", "flow_matching_lib"]
