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


def group_norm_parts(
    parts,
    weight: Optional[jax.Array],
    bias: Optional[jax.Array],
    *,
    num_groups: int,
    eps: float = 1e-5,
):
    """GroupNorm over a channel-concat with statistics reduced per part.

    Numerically equivalent to ``group_norm(concat(parts, axis=1), ...)`` but
    the statistics are reduced per part: on the decoder skip-concat path the
    concatenated tensor's producer is a concat, which XLA cannot host a stats
    epilogue on — the profile shows those stats as standalone full-HBM reads
    (1.4 ms each at 256²x256ch, BENCHMARKS.md round-3 op profile). Per-part
    channel sums fuse into each part's producing conv instead; per-channel
    granularity keeps grouping exact even when a group straddles the part
    boundary (e.g. 128+256 ch under 32 groups). Returns the normalized
    CONCATENATED tensor: the apply chain runs on the concat so it keeps its
    pre-existing shape and folds into the consumer conv's prologue (applying
    per part was measured to break that fusion).
    """
    n = parts[0].shape[0]
    spatial = parts[0].shape[2:]
    c_total = sum(p.shape[1] for p in parts)
    if c_total % num_groups != 0:
        raise ValueError(f"channels {c_total} not divisible by groups {num_groups}")
    cg = c_total // num_groups
    m_spatial = 1
    for s in spatial:
        m_spatial *= s

    s1_parts, s2_parts = [], []
    for p in parts:
        pf = p.astype(jnp.float32).reshape(n, p.shape[1], -1)
        s1_parts.append(jnp.sum(pf, axis=2))
        s2_parts.append(jnp.sum(pf * pf, axis=2))
    s1 = jnp.concatenate(s1_parts, axis=1).reshape(n, num_groups, cg)
    s2 = jnp.concatenate(s2_parts, axis=1).reshape(n, num_groups, cg)
    m = cg * m_spatial
    mean = jnp.sum(s1, axis=2) / m
    var = jnp.maximum(jnp.sum(s2, axis=2) / m - mean * mean, 0.0)

    # Apply on the CONCATENATED tensor (not per part): the elementwise
    # normalize/affine chain then has exactly the pre-existing shape, so XLA
    # folds it into the consumer conv's prologue as before — applying per
    # part was measured to break that fusion and materialize the normalized
    # halves (round-3 profile). The concat is materialized by the caller for
    # the residual skip anyway.
    x = jnp.concatenate(parts, axis=1)
    c = x.shape[1]
    mean = mean.reshape(n, num_groups, 1, 1)
    var = var.reshape(n, num_groups, 1, 1)
    xf = x.astype(jnp.float32).reshape(n, num_groups, cg, -1)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, c, *spatial)
    if weight is not None:
        wshape = (1, c) + (1,) * len(spatial)
        xf = xf * weight.astype(jnp.float32).reshape(wshape)
        if bias is not None:
            xf = xf + bias.astype(jnp.float32).reshape(wshape)
    return xf.astype(x.dtype)


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

    # group_norm_parts == group_norm(concat(parts)) — including a group that
    # straddles the part boundary (5+7=12 channels under 4 groups of 3)
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 6, 6))
    b = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 6, 6))
    w = jax.random.normal(jax.random.PRNGKey(3), (12,))
    bb = jax.random.normal(jax.random.PRNGKey(4), (12,))
    got = np.asarray(group_norm_parts([a, b], w, bb, num_groups=4))
    want = np.asarray(group_norm(jnp.concatenate([a, b], axis=1), w, bb, num_groups=4))
    np.testing.assert_allclose(got, want, atol=2e-5)
