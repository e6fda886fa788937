"""
Core parameterized layers (functional modules).

Parameter names and nesting match the reference torch modules so state_dicts
map 1:1: e.g. the reference ``ConvND`` holds its conv under ``.conv``
(/root/reference/src/nn/ops/convolution.py:40-54), so ours nests params as
``{"conv": {"weight", "bias"}}``.

Initializers reproduce torch defaults (kaiming-uniform a=√5 for conv/linear
weights, U(±1/√fan_in) biases) so from-scratch training matches the reference's
initialization distribution.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Module, Params
from fmdm_tpu.ops.conv import conv_nd, conv_transpose_nd
from fmdm_tpu.ops.norm import group_norm, rms_norm_nd, safe_num_groups

SizeArg = Union[int, Tuple[int, ...]]


def _tupled(value: SizeArg, nd: int) -> Tuple[int, ...]:
    if isinstance(value, int):
        return (value,) * nd
    return tuple(int(v) for v in value)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def silu(x):
    return jax.nn.silu(x)


def make_activation(name: str) -> Callable[[jax.Array], jax.Array]:
    """Activation factory with the reference's accepted names
    (residual.py:131-140)."""
    name = name.lower()
    if name in ("silu", "swish"):
        return jax.nn.silu
    if name == "relu":
        return jax.nn.relu
    if name == "gelu":
        return jax.nn.gelu
    if name == "tanh":
        return jnp.tanh
    raise ValueError(f"Unsupported activation '{name}'")


def dropout(x: jax.Array, rate: float, *, rng: Optional[jax.Array], train: bool) -> jax.Array:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_nd(x: jax.Array, weight, bias=None) -> jax.Array:
    """y = x Wᵀ + b with torch weight layout (out, in).

    Module-level for the same reason ``conv_nd`` is: the int8 calibration
    recorder (utils/quantize.py) patches this symbol, and ``weight`` may be a
    :class:`fmdm_tpu.ops.quant.QuantizedLinearWeight` — then the matmul runs
    on the 2x-rate int8 MXU path (W8A8, int32 accumulation). Inference-only.
    """
    from fmdm_tpu.ops.quant import QuantizedLinearWeight, linear_qdq

    if isinstance(weight, QuantizedLinearWeight):
        y = linear_qdq(x, weight)
    else:
        w = weight.astype(x.dtype)
        y = jnp.einsum("...i,oi->...o", x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class Linear(Module):
    """y = x Wᵀ + b with torch weight layout (out, in)."""

    def __init__(self, in_features: int, out_features: int, bias: bool = True, zero_init: bool = False):
        super().__init__()
        self.in_features = in_features
        self.out_features = out_features
        bound = 1.0 / math.sqrt(max(in_features, 1))
        if zero_init:
            self.param("weight", lambda k: jnp.zeros((out_features, in_features), jnp.float32))
        else:
            self.param("weight", lambda k: jax.random.uniform(k, (out_features, in_features), jnp.float32, -bound, bound))
        if bias:
            if zero_init:
                self.param("bias", lambda k: jnp.zeros((out_features,), jnp.float32))
            else:
                self.param("bias", lambda k: jax.random.uniform(k, (out_features,), jnp.float32, -bound, bound))
        self.use_bias = bias

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return linear_nd(x, params["weight"], params["bias"] if self.use_bias else None)


# ---------------------------------------------------------------------------
# Convolutions
# ---------------------------------------------------------------------------

class Conv(Module):
    """Bare ND conv (params: weight/bias at this level, like torch nn.ConvNd).

    Used where the reference takes ``ConvND(...).conv`` (e.g. UNetDiffusersND
    conv_in/conv_out, unet_diffusers_nd.py:62,146).
    """

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        out_channels: int,
        kernel_size: SizeArg = 3,
        stride: SizeArg = 1,
        padding: Optional[SizeArg] = None,
        dilation: SizeArg = 1,
        groups: int = 1,
        bias: bool = True,
        zero_init: bool = False,
    ):
        super().__init__()
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")
        kernel = _tupled(kernel_size, spatial_dims)
        if padding is None:
            padding = tuple(k // 2 for k in kernel)
        self.spatial_dims = spatial_dims
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.groups = groups
        self.use_bias = bias
        wshape = (out_channels, in_channels // groups) + kernel
        fan_in = (in_channels // groups) * int(math.prod(kernel))
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        if zero_init:
            self.param("weight", lambda k: jnp.zeros(wshape, jnp.float32))
        else:
            self.param("weight", lambda k: jax.random.uniform(k, wshape, jnp.float32, -bound, bound))
        if bias:
            if zero_init:
                self.param("bias", lambda k: jnp.zeros((out_channels,), jnp.float32))
            else:
                self.param("bias", lambda k: jax.random.uniform(k, (out_channels,), jnp.float32, -bound, bound))

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return conv_nd(
            x,
            params["weight"],
            params.get("bias") if self.use_bias else None,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
        )


class ConvND(Module):
    """Reference-style envelope: params nest under ``conv``
    (convolution.py:40-54)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self.conv = Conv(*args, **kwargs)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return self.conv(params["conv"], x)


class ConvTranspose(Module):
    """Bare ND transposed conv with torch (in, out, *k) weight layout."""

    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        out_channels: int,
        kernel_size: SizeArg = 2,
        stride: SizeArg = 2,
        padding: SizeArg = 0,
        output_padding: SizeArg = 0,
        bias: bool = True,
    ):
        super().__init__()
        kernel = _tupled(kernel_size, spatial_dims)
        self.stride = stride
        self.padding = padding
        self.output_padding = output_padding
        self.use_bias = bias
        wshape = (in_channels, out_channels) + kernel
        # torch fan_in for ConvTranspose uses weight.size(1)*prod(kernel)
        fan_in = out_channels * int(math.prod(kernel))
        bound = 1.0 / math.sqrt(max(fan_in, 1))
        self.param("weight", lambda k: jax.random.uniform(k, wshape, jnp.float32, -bound, bound))
        if bias:
            self.param("bias", lambda k: jax.random.uniform(k, (out_channels,), jnp.float32, -bound, bound))

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return conv_transpose_nd(
            x,
            params["weight"],
            params.get("bias") if self.use_bias else None,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
        )


class ConvTransposeND(Module):
    """Reference-style envelope: params nest under ``convT``
    (convolution.py:56-101)."""

    def __init__(self, *args, **kwargs):
        super().__init__()
        self.convT = ConvTranspose(*args, **kwargs)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return self.convT(params["convT"], x)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

class GroupNorm(Module):
    def __init__(self, num_groups: int, channels: int, eps: float = 1e-5):
        super().__init__()
        self.num_groups = num_groups
        self.eps = eps
        self.param("weight", lambda k: jnp.ones((channels,), jnp.float32))
        self.param("bias", lambda k: jnp.zeros((channels,), jnp.float32))

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return group_norm(x, params["weight"], params["bias"], num_groups=self.num_groups, eps=self.eps)


def make_group_norm(channels: int, groups: int = 32, eps: float = 1e-5) -> GroupNorm:
    """GroupNorm with divisor fallback (reference normalization.py:11-19)."""
    return GroupNorm(safe_num_groups(channels, groups), channels, eps=eps)


class RMSNormND(Module):
    def __init__(self, channels: int, eps: float = 1e-6):
        super().__init__()
        self.eps = eps
        self.param("weight", lambda k: jnp.ones((channels,), jnp.float32))

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        return rms_norm_nd(x, params["weight"], eps=self.eps)


class BatchNorm(Module):
    """BatchNorm (used by the PatchDiscriminator, reference vae.py:83-98).

    Functional variant: running stats are treated as extra state returned by
    ``__call__`` when ``train=True``; at eval the stored stats are used. To keep
    the train step functional we fold stats into params (they are leaves named
    like torch buffers: running_mean/running_var).
    """

    def __init__(self, channels: int, eps: float = 1e-5, momentum: float = 0.1):
        super().__init__()
        self.eps = eps
        self.momentum = momentum
        self.param("weight", lambda k: jnp.ones((channels,), jnp.float32))
        self.param("bias", lambda k: jnp.zeros((channels,), jnp.float32))
        self.param("running_mean", lambda k: jnp.zeros((channels,), jnp.float32))
        self.param("running_var", lambda k: jnp.ones((channels,), jnp.float32))

    def __call__(self, params: Params, x: jax.Array, *, train: bool = False, **kwargs) -> jax.Array:
        nd = x.ndim - 2
        shape = (1, -1) + (1,) * nd
        if train:
            axes = (0,) + tuple(range(2, x.ndim))
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            var = jnp.var(x.astype(jnp.float32), axis=axes)
        else:
            mean, var = params["running_mean"], params["running_var"]
        xf = (x.astype(jnp.float32) - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + self.eps)
        out = xf * params["weight"].reshape(shape) + params["bias"].reshape(shape)
        return out.astype(x.dtype)


class Sequential(Module):
    """Sequential container with torch-style integer child names."""

    def __init__(self, modules):
        super().__init__()
        self._items = []
        for m in modules:
            self.add_child(str(len(self._items)), m)
            self._items.append(m)

    def __call__(self, params: Params, x, **kwargs):
        for i, m in enumerate(self._items):
            x = m(params.get(str(i), {}), x, **kwargs)
        return x

    def __iter__(self):
        return iter(self._items)

    def __getitem__(self, idx):
        return self._items[idx]


class Activation(Module):
    """Parameter-free activation wrapper so Sequential naming matches torch."""

    def __init__(self, name: str = "silu"):
        super().__init__()
        self.fn = make_activation(name)

    def __call__(self, params: Params, x, **kwargs):
        return self.fn(x)
