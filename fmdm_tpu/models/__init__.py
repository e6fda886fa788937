"""Model assemblies layer (L3). See SURVEY.md §1."""

from fmdm_tpu.models.unet_diffusers import TimestepEmbedding, UNetDiffusersND, UNetExactND
from fmdm_tpu.models.unet_efficient import EfficientUNetND
from fmdm_tpu.models.factories import DiffusionUNetFactory, VAEFactory, build_from_json

__all__ = [
    "TimestepEmbedding",
    "UNetDiffusersND",
    "UNetExactND",
    "EfficientUNetND",
    "DiffusionUNetFactory",
    "VAEFactory",
    "build_from_json",
]
