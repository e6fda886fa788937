"""
N-dimensional convolution primitives (1/2/3-D) on top of XLA:TPU.

Semantics follow the reference ConvND/ConvTransposeND wrappers
(/root/reference/src/nn/ops/convolution.py:8-101): channels-first tensors
(N, C, *spatial), integer "same-ish" padding defaults (k//2), torch-layout
weights. Weights are stored in the torch layout (OI + spatial for conv,
IO + spatial for transposed conv) so checkpoints are byte-compatible; XLA's
layout assignment handles the TPU-internal format — no transposes are paid at
runtime inside a jitted program.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from fmdm_tpu.ops.quant import QuantizedConvWeight, dequant_scale, quantize_activation

SizeArg = Union[int, Tuple[int, ...], Sequence[int]]

_SPATIAL_CHARS = "DHW"  # enough labels for up to 3 spatial dims


def _normalize(value: SizeArg, nd: int) -> Tuple[int, ...]:
    if isinstance(value, int):
        return (value,) * nd
    value = tuple(int(v) for v in value)
    if len(value) != nd:
        raise ValueError(f"Expected {nd} entries, got {value}")
    return value


def _dim_numbers(nd: int, transpose: bool = False) -> Tuple[str, str, str]:
    sp = _SPATIAL_CHARS[-nd:]
    lhs = "NC" + sp
    rhs = ("IO" if transpose else "OI") + sp
    return (lhs, rhs, lhs)


def conv_nd(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: SizeArg = 1,
    padding: Optional[SizeArg] = None,
    dilation: SizeArg = 1,
    groups: int = 1,
) -> jax.Array:
    """Channels-first ND convolution with torch padding semantics.

    x: (N, C_in, *spatial); weight: (C_out, C_in//groups, *kernel).
    ``padding=None`` defaults to k//2 per dim (reference convolution.py:30-35).

    ``weight`` may also be a :class:`fmdm_tpu.ops.quant.QuantizedConvWeight`,
    in which case the conv runs on the 2x-rate int8 MXU path (W8A8, int32
    accumulation) — see ops/quant.py. Inference-only.
    """
    nd = x.ndim - 2
    kernel = weight.shape[2:]
    stride = _normalize(stride, nd)
    dilation = _normalize(dilation, nd)
    if padding is None:
        padding = tuple(k // 2 for k in kernel)
    else:
        padding = _normalize(padding, nd)
    pads = [(p, p) for p in padding]
    if isinstance(weight, QuantizedConvWeight):
        acc = lax.conv_general_dilated(
            quantize_activation(x, weight.act_scale),
            weight.qweight,
            window_strides=stride,
            padding=pads,
            rhs_dilation=dilation,
            feature_group_count=groups,
            dimension_numbers=_dim_numbers(nd),
            preferred_element_type=jnp.int32,
        )
        out = (acc.astype(jnp.float32) * dequant_scale(weight, nd)).astype(x.dtype)
    else:
        out = lax.conv_general_dilated(
            x,
            weight.astype(x.dtype),
            window_strides=stride,
            padding=pads,
            rhs_dilation=dilation,
            feature_group_count=groups,
            dimension_numbers=_dim_numbers(nd),
        )
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * nd)
    return out


def conv_transpose_nd(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    stride: SizeArg = 2,
    padding: SizeArg = 0,
    output_padding: SizeArg = 0,
    groups: int = 1,
) -> jax.Array:
    """Channels-first ND transposed convolution with torch semantics.

    x: (N, C_in, *spatial); weight: (C_in, C_out//groups, *kernel) (torch layout).
    out_spatial = (in-1)*stride - 2*padding + kernel + output_padding.
    Implemented as an input-dilated convolution with a spatially-flipped kernel
    (the standard equivalence), which XLA lowers onto the MXU directly.
    """
    if groups != 1:
        raise NotImplementedError("grouped transposed conv is not used by the reference")
    nd = x.ndim - 2
    kernel = weight.shape[2:]
    stride = _normalize(stride, nd)
    padding = _normalize(padding, nd)
    output_padding = _normalize(output_padding, nd)
    # Flip spatial dims; use IO dimension spec so no transpose copy is needed.
    w = jnp.flip(weight, axis=tuple(range(2, 2 + nd)))
    pads = [
        (k - 1 - p, k - 1 - p + op)
        for k, p, op in zip(kernel, padding, output_padding)
    ]
    out = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=_dim_numbers(nd, transpose=True),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * nd)
    return out


# ---------------------------------------------------------------------------
# Initializers matching torch's Conv/Linear defaults (kaiming-uniform a=sqrt(5)
# => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias).
# ---------------------------------------------------------------------------

def conv_kernel_init(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    fan_in = int(math.prod(shape[1:]))  # C_in//groups * prod(kernel)
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def conv_bias_init(key: jax.Array, shape: Tuple[int, ...], fan_in: int, dtype=jnp.float32) -> jax.Array:
    bound = 1.0 / math.sqrt(max(fan_in, 1))
    return jax.random.uniform(key, shape, dtype, -bound, bound)
