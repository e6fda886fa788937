"""
Post-training int8 (W8A8) quantization primitives for TPU inference.

Beyond-reference subsystem (the torch reference is bf16/f32-only): the v5e MXU
runs int8 at 2x the bf16 rate (394 vs 197 T-op/s), and the flagship sampling
forward is ~84% convolutions at ~90% bf16 MXU utilization (BENCHMARKS.md), so
selected convolutions quantized to int8 with int32 accumulation buy real
wall-clock at sampling time.

Scheme (standard symmetric W8A8):
- weights: per-output-channel symmetric absmax scales, quantized offline;
- activations: per-tensor static scale, calibrated by running example batches
  through the model on CPU (``fmdm_tpu.utils.quantize``) — static scales keep
  the quantize op a fused elementwise pass (no extra in-graph max reduction);
- accumulation in int32, dequantized by ``act_scale * wscale[c]`` in f32.

``QuantizedConvWeight`` is a registered pytree, so a params tree holding a mix
of plain arrays and quantized weights still works under jit / device_put /
NamedSharding. ``conv_nd`` (ops/conv.py) dispatches on the weight type, which
makes every conv call-site in the framework quantization-ready with no model
changes. Inference-only: there is deliberately no VJP for the int8 path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QuantizedConvWeight:
    """int8 conv weight + dequantization scales (a pytree leaf bundle).

    qweight: int8, torch OIHW-style layout (C_out, C_in//groups, *kernel)
    wscale:  f32 (C_out,) per-output-channel weight scales
    act_scale: f32 scalar, static input-activation scale
    """

    def __init__(self, qweight, wscale, act_scale):
        self.qweight = qweight
        self.wscale = wscale
        self.act_scale = act_scale

    @property
    def shape(self):  # mirrors the plain-array attribute conv_nd consults
        return self.qweight.shape

    def tree_flatten(self):
        return (self.qweight, self.wscale, self.act_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return (f"QuantizedConvWeight(shape={tuple(self.qweight.shape)}, "
                f"act_scale={self.act_scale!r})")


@jax.tree_util.register_pytree_node_class
class QuantizedLinearWeight:
    """int8 linear weight + dequantization scales (a pytree leaf bundle).

    Same W8A8 scheme as :class:`QuantizedConvWeight`, for ``nn.layers.Linear``
    (torch (out, in) layout) — covers the diffusers attention projections
    (to_q/to_k/to_v/to_out) and any other dense layer the calibration policy
    admits. ``linear_nd`` (nn/layers.py) dispatches on this type.

    qweight: int8 (out_features, in_features)
    wscale:  f32 (out_features,)
    act_scale: f32 scalar, static input-activation scale
    """

    def __init__(self, qweight, wscale, act_scale):
        self.qweight = qweight
        self.wscale = wscale
        self.act_scale = act_scale

    @property
    def shape(self):
        return self.qweight.shape

    def tree_flatten(self):
        return (self.qweight, self.wscale, self.act_scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return (f"QuantizedLinearWeight(shape={tuple(self.qweight.shape)}, "
                f"act_scale={self.act_scale!r})")


def quantize_conv_weight(weight: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8 quantization of a conv weight.

    Returns (qweight int8, wscale f32 (C_out,)) with
    ``weight ≈ qweight * wscale[:, None, ...]``.
    """
    w = jnp.asarray(weight, jnp.float32)
    reduce_axes = tuple(range(1, w.ndim))
    absmax = jnp.max(jnp.abs(w), axis=reduce_axes)
    wscale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.round(w / wscale.reshape((-1,) + (1,) * (w.ndim - 1)))
    qweight = jnp.clip(q, -127, 127).astype(jnp.int8)
    return qweight, wscale.astype(jnp.float32)


def quantize_activation(x: jax.Array, act_scale) -> jax.Array:
    """Symmetric per-tensor int8 quantization with a static scale."""
    inv = 1.0 / jnp.asarray(act_scale, jnp.float32)
    q = jnp.round(x.astype(jnp.float32) * inv)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def dequant_scale(qw: QuantizedConvWeight, nd: int) -> jax.Array:
    """Combined (1, C_out, 1...) f32 dequantization factor."""
    return (qw.wscale * qw.act_scale).reshape((1, -1) + (1,) * nd)


def make_quantized(weight, act_absmax: float) -> QuantizedConvWeight:
    """Bundle a float conv weight + calibrated input absmax into a
    QuantizedConvWeight."""
    qweight, wscale = quantize_conv_weight(weight)
    act_scale = jnp.float32(max(float(act_absmax), 1e-8) / 127.0)
    return QuantizedConvWeight(qweight, wscale, act_scale)


def make_quantized_linear(weight, act_absmax: float) -> QuantizedLinearWeight:
    """Bundle a float (out, in) linear weight + calibrated input absmax into a
    QuantizedLinearWeight (per-output-channel weight scales, like convs)."""
    qweight, wscale = quantize_conv_weight(weight)  # axis-0 scales fit (O, I) too
    act_scale = jnp.float32(max(float(act_absmax), 1e-8) / 127.0)
    return QuantizedLinearWeight(qweight, wscale, act_scale)


def linear_qdq(x: jax.Array, qw: QuantizedLinearWeight) -> jax.Array:
    """y = dequant(int8(x) @ qweightᵀ): the 2x-rate int8 MXU path for Linear.

    Contracts the last axis of ``x`` against in_features with int32
    accumulation; the combined (act_scale * wscale) factor broadcasts over the
    trailing out_features axis of the result.
    """
    from jax import lax

    xq = quantize_activation(x, qw.act_scale)
    acc = lax.dot_general(
        xq, qw.qweight,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (qw.wscale * qw.act_scale)).astype(x.dtype)


def is_quantized_tree(params) -> bool:
    """True if any leaf bundle is a QuantizedConv/LinearWeight."""
    found = [False]
    kinds = (QuantizedConvWeight, QuantizedLinearWeight)

    def _visit(x):
        if isinstance(x, kinds):
            found[0] = True
        return x

    jax.tree_util.tree_map(_visit, params,
                           is_leaf=lambda x: isinstance(x, kinds))
    return found[0]
