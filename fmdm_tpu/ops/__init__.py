"""Pure-JAX ND primitive ops (L1 of the layer map, SURVEY.md §1)."""

from fmdm_tpu.ops.conv import conv_nd, conv_transpose_nd, conv_kernel_init, conv_bias_init
from fmdm_tpu.ops.norm import group_norm, rms_norm_nd, layer_norm, safe_num_groups
from fmdm_tpu.ops.resample import (
    upsample_nearest,
    avg_pool_nd,
    max_pool_nd,
    resize_bilinear,
)
from fmdm_tpu.ops.time_embed import timestep_embedding
from fmdm_tpu.ops.attention import sdpa, sdpa_xla, linear_attention, set_sdpa_backend, get_sdpa_backend

__all__ = [
    "conv_nd",
    "conv_transpose_nd",
    "conv_kernel_init",
    "conv_bias_init",
    "group_norm",
    "rms_norm_nd",
    "layer_norm",
    "safe_num_groups",
    "upsample_nearest",
    "avg_pool_nd",
    "max_pool_nd",
    "resize_bilinear",
    "timestep_embedding",
    "sdpa",
    "sdpa_xla",
    "linear_attention",
    "set_sdpa_backend",
    "get_sdpa_backend",
]
