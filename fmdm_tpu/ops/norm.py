"""
Normalization primitives for channels-first ND tensors.

Functional equivalents of the reference layers
(/root/reference/src/nn/ops/normalization.py:11-34). Statistics are always
computed in float32 regardless of input dtype (bf16-safe on TPU), then the
result is cast back — matching torch's float32-accumulation GroupNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def safe_num_groups(channels: int, groups: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= groups (reference
    normalization.py:11-19 fallback semantics)."""
    num_groups = min(groups, channels)
    while channels % num_groups != 0 and num_groups > 1:
        num_groups -= 1
    return num_groups


def group_norm_stats(x: jax.Array, num_groups: int):
    """Per-(batch, group) mean/variance in ONE pass over the activation.

    The textbook two-pass formulation (mean, then mean((x-mean)^2)) forces two
    full HBM reads of the activation because the second reduce depends on the
    first; on the bandwidth-bound UNet forward those stats passes were 43.7%
    of device time (BENCHMARKS.md op profile). Reducing sum and sum-of-squares
    together lets XLA multi-output-fuse both into a single read. Variance via
    E[x^2] - mean^2 in f32, clamped at 0 — cancellation only bites when
    |mean| >> std, far outside post-conv activation statistics, and the torch
    parity suite bounds the drift.
    """
    n = x.shape[0]
    xf = x.astype(jnp.float32).reshape(n, num_groups, -1)
    m = xf.shape[2]
    s1 = jnp.sum(xf, axis=2)
    s2 = jnp.sum(xf * xf, axis=2)
    mean = s1 / m
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    return mean, var


def group_norm(
    x: jax.Array,
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    *,
    num_groups: int,
    eps: float = 1e-5,
) -> jax.Array:
    """GroupNorm over (N, C, *spatial)."""
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    mean, var = group_norm_stats(x, num_groups)
    mean = mean.reshape(n, num_groups, 1, 1)
    var = var.reshape(n, num_groups, 1, 1)
    xf = x.astype(jnp.float32).reshape(n, num_groups, c // num_groups, -1)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, c, *spatial)
    if weight is not None:
        shape = (1, c) + (1,) * len(spatial)
        xf = xf * weight.astype(jnp.float32).reshape(shape)
        if bias is not None:
            xf = xf + bias.astype(jnp.float32).reshape(shape)
    return xf.astype(orig_dtype)


def rms_norm_nd(x: jax.Array, weight: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over all non-batch dims with per-channel scale
    (reference normalization.py:22-34)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    dims = tuple(range(1, x.ndim))
    rms = jnp.sqrt(jnp.mean(jnp.square(xf), axis=dims, keepdims=True) + eps)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    out = weight.astype(jnp.float32).reshape(shape) * xf / rms
    return out.astype(orig_dtype)


def layer_norm(x: jax.Array, weight, bias, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the trailing dim (used by attention variants)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def run_self_tests() -> None:
    """Embedded self-test: GN/RMS/LN statistics vs direct numpy."""
    import numpy as np

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 5, 5))
    y = np.asarray(group_norm(x, None, None, num_groups=4))
    ref = np.asarray(x, np.float64).reshape(2, 4, -1)
    ref = (ref - ref.mean(-1, keepdims=True)) / np.sqrt(ref.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(y, ref.reshape(y.shape), atol=2e-4)

    assert safe_num_groups(6, 32) == 6 and safe_num_groups(48, 32) == 24

    w = jnp.full((8,), 2.0)
    r = np.asarray(rms_norm_nd(x, w))
    xf = np.asarray(x, np.float64)
    rms = np.sqrt((xf ** 2).mean(axis=(1, 2, 3), keepdims=True) + 1e-6)
    np.testing.assert_allclose(r, 2.0 * xf / rms, atol=2e-4)

    ln = np.asarray(layer_norm(x, None, None))
    lref = (xf - xf.mean(-1, keepdims=True)) / np.sqrt(xf.var(-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(ln, lref, atol=2e-4)
