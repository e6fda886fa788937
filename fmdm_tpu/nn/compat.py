"""
API-parity wrappers for reference symbols that are pure functions in our
functional core (SURVEY.md §2.3 inventory):
 - QKVAttention / LinearQKVAttention  (attention.py:10-70)
 - TimestepBlock / ContextBlock protocols (timestep.py:13-23, attention.py:73-79)
 - AvgPoolND / MaxPoolND module envelopes (pooling.py:32-86)
 - zero_module (common.py:7-14) — zeroes an existing param tree
 - build_resblock_* convenience factories (residual.py:144-157)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Module, Params
from fmdm_tpu.nn.blocks import ResBlockND
from fmdm_tpu.ops.attention import linear_attention, sdpa
from fmdm_tpu.ops.resample import avg_pool_nd, max_pool_nd


class TimestepBlock(Module):
    """Marker protocol: __call__(params, x, emb) (reference timestep.py:13-23)."""


class ContextBlock(Module):
    """Marker protocol: __call__(params, x, context) (attention.py:73-79)."""


class QKVAttention(Module):
    """Scaled dot-product attention module (attention.py:10-50); the
    ``efficient_attn`` knob is accepted — on TPU both paths are the fused
    XLA/Pallas SDPA."""

    def __init__(self, efficient_attn: bool = True, dropout: float = 0.0):
        super().__init__()
        self.dropout = dropout

    def __call__(self, params: Params, q, k, v, **kwargs):
        return sdpa(q, k, v)


class LinearQKVAttention(Module):
    """O(N) softmax-factored linear attention (attention.py:53-70)."""

    def __init__(self, dropout: float = 0.0, eps: float = 1e-6):
        super().__init__()
        self.eps = eps

    def __call__(self, params: Params, q, k, v, **kwargs):
        return linear_attention(q, k, v, eps=self.eps)


class AvgPoolND(Module):
    def __init__(self, spatial_dims: int, kernel_size=2, stride=None, padding=0):
        super().__init__()
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding

    def __call__(self, params: Params, x, **kwargs):
        return avg_pool_nd(x, self.kernel_size, self.stride, self.padding)


class MaxPoolND(Module):
    def __init__(self, spatial_dims: int, kernel_size=2, stride=None, padding=0):
        super().__init__()
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")
        self.kernel_size, self.stride, self.padding = kernel_size, stride, padding

    def __call__(self, params: Params, x, **kwargs):
        return max_pool_nd(x, self.kernel_size, self.stride, self.padding)


def zero_module(params: Params) -> Params:
    """Zero every parameter leaf (functional analogue of common.py:7-14)."""
    return jax.tree_util.tree_map(jnp.zeros_like, params)


# -- ResBlock convenience factories (residual.py:144-157) ---------------------

def build_resblock_gn_silu(**kwargs) -> ResBlockND:
    return ResBlockND(norm_type="gn", act="silu", **kwargs)


def build_resblock_gn_swish(**kwargs) -> ResBlockND:
    return ResBlockND(norm_type="gn", act="swish", **kwargs)


def build_resblock_rmsnorm_silu(**kwargs) -> ResBlockND:
    return ResBlockND(norm_type="rmsnorm", act="silu", **kwargs)


def build_resblock_rmsnorm_swish(**kwargs) -> ResBlockND:
    return ResBlockND(norm_type="rmsnorm", act="swish", **kwargs)
