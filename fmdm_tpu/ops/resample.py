"""
Resampling primitives: nearest upsample, average/max pooling (channels-first).

Functional equivalents of the reference ops
(/root/reference/src/nn/ops/upsampling.py:8-62, pooling.py:10-109). Patchify
(PoolND) and unpatchify (UnPoolND) are strided convs / transposed convs and are
built from :mod:`fmdm_tpu.ops.conv` at the block level.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

SizeArg = Union[int, Tuple[int, ...]]


def _normalize(value: SizeArg, nd: int) -> Tuple[int, ...]:
    if isinstance(value, int):
        return (value,) * nd
    return tuple(int(v) for v in value)


def upsample_nearest(x: jax.Array, scale: int = 2) -> jax.Array:
    """Nearest-neighbor x`scale` upsampling of all spatial dims of (N, C, *S).

    Implemented as reshape+broadcast (one fused XLA broadcast, no gathers).
    """
    nd = x.ndim - 2
    shape = x.shape
    # (N, C, s1, 1, s2, 1, ...) -> broadcast -> (N, C, s1, k, s2, k, ...)
    expanded = x.reshape(shape[:2] + tuple(v for s in shape[2:] for v in (s, 1)))
    target = shape[:2] + tuple(v for s in shape[2:] for v in (s, scale))
    expanded = jnp.broadcast_to(expanded, target)
    return expanded.reshape(shape[:2] + tuple(s * scale for s in shape[2:]))


def avg_pool_nd(
    x: jax.Array,
    kernel_size: SizeArg = 2,
    stride: Optional[SizeArg] = None,
    padding: SizeArg = 0,
) -> jax.Array:
    """Average pooling with torch AvgPoolNd semantics (count includes padding)."""
    nd = x.ndim - 2
    k = _normalize(kernel_size, nd)
    s = _normalize(stride if stride is not None else kernel_size, nd)
    p = _normalize(padding, nd)
    window = (1, 1) + k
    strides = (1, 1) + s
    pads = ((0, 0), (0, 0)) + tuple((pi, pi) for pi in p)
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pads)
    count = 1
    for ki in k:
        count *= ki
    return summed / jnp.asarray(count, dtype=x.dtype)


def max_pool_nd(
    x: jax.Array,
    kernel_size: SizeArg = 2,
    stride: Optional[SizeArg] = None,
    padding: SizeArg = 0,
) -> jax.Array:
    nd = x.ndim - 2
    k = _normalize(kernel_size, nd)
    s = _normalize(stride if stride is not None else kernel_size, nd)
    p = _normalize(padding, nd)
    if k == s and all(pi == 0 for pi in p) and all(
        dim % ki == 0 for dim, ki in zip(x.shape[2:], k)
    ):
        # Non-overlapping pool: reshape + max. Same forward values as the
        # window reduce, but reverse-mode differentiable under lax.scan —
        # grad of reduce_window(max) fails to linearize inside scan bodies
        # (the trainers' grad-accumulation scan hits this through the
        # perceptual loss VGG pools).
        shape = list(x.shape[:2])
        axes = []
        for dim, ki in zip(x.shape[2:], k):
            shape.extend((dim // ki, ki))
            axes.append(len(shape) - 1)
        return jnp.max(x.reshape(shape), axis=tuple(axes))
    window = (1, 1) + k
    strides = (1, 1) + s
    pads = ((0, 0), (0, 0)) + tuple((pi, pi) for pi in p)
    neg_inf = jnp.asarray(-jnp.inf, dtype=x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, neg_inf, lax.max, window, strides, pads)


def resize_bilinear(x: jax.Array, size: Tuple[int, ...]) -> jax.Array:
    """Bilinear (linear per spatial dim) resize of channels-first tensors.

    Used by the data pipeline and the perceptual loss 224-resize path.
    """
    nd = x.ndim - 2
    method = "linear" if nd == 1 else ("bilinear" if nd == 2 else "trilinear")
    return jax.image.resize(x, x.shape[:2] + tuple(size), method=method)


def run_self_tests() -> None:
    """Embedded self-test mirroring reference upsampling.py:65-106 shapes."""
    import jax

    for nd, shape in {1: (2, 6, 33), 2: (2, 6, 33, 35), 3: (1, 4, 17, 21, 19)}.items():
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        up = upsample_nearest(x, 2)
        assert up.shape == shape[:2] + tuple(s * 2 for s in shape[2:])
        avg = avg_pool_nd(x, 2, 2)
        assert avg.shape == shape[:2] + tuple(s // 2 for s in shape[2:])
        mx = max_pool_nd(x, 2, 2)
        assert mx.shape == avg.shape
