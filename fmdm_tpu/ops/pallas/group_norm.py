"""
Fused GroupNorm(+affine)(+FiLM scale-shift)(+SiLU) Pallas TPU kernel.

The UNet's hot elementwise path is GN -> [FiLM] -> SiLU -> conv
(ResBlockND, residual.py:95-118). The flagship 256² UNet moves ~11 GB of
activations per forward and is HBM-bandwidth bound (bench probe: f32 == bf16
throughput at batch 4); unfused GN costs an extra stats pass over the
activations. This kernel does ONE HBM read + ONE write per tensor: per
(sample, group) grid cell the group's activations live in VMEM, stats are
computed in f32 on the VPU, and normalize+affine+FiLM+SiLU are applied in
registers.

Differentiable everywhere: custom_vjp recomputes the XLA reference backward
from saved inputs, so the kernel is safe in both training and sampling.
Falls back to the XLA implementation off-TPU shapes that don't tile (spatial
product < 128 — tiny feature maps where fusion doesn't pay anyway).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from fmdm_tpu.ops.norm import group_norm as _xla_group_norm

# Default OFF: measured on v5e (BENCHMARKS.md), XLA's own GN fusion (stats
# pass + normalize fused into conv epilogues) beats this kernel on the
# flagship UNet — the pallas_call boundary blocks producer/consumer fusion
# (3.76 -> 1.62 samples/s at bf16 batch 8). Kept as an opt-in building block;
# revisit with a conv+GN megakernel rather than a standalone GN.
_ENABLED = False


def set_fused_group_norm(enabled: bool) -> None:
    global _ENABLED
    _ENABLED = bool(enabled)


def _xla_reference(x, weight, bias, scale, shift, num_groups, eps, act):
    out = _xla_group_norm(x, weight, bias, num_groups=num_groups, eps=eps)
    if scale is not None:
        nd = x.ndim - 2
        out = out * (1 + scale.reshape(scale.shape + (1,) * nd)) + shift.reshape(shift.shape + (1,) * nd)
    if act:
        out = jax.nn.silu(out)
    return out


def _kernel(x_ref, w_ref, b_ref, scale_ref, shift_ref, o_ref, *, cg: int, eps: float, act: bool,
            has_film: bool, num_groups: int):
    # x block: (1, R, 128) where R = cg * spatial/128 (channel-major rows).
    # w/b blocks: full (G, cg); scale/shift: full (N*G, cg). Indexed by pid
    # in-kernel (per-group blocks would violate the (8, 128) tiling rule).
    pid = pl.program_id(0)
    g = jax.lax.rem(pid, num_groups)
    xf = x_ref[0].astype(jnp.float32)
    r = xf.shape[0]
    rows_per_ch = r // cg
    mean = jnp.mean(xf)
    var = jnp.mean(jnp.square(xf)) - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # Per-channel row expansion via a static select loop: Mosaic rejects
    # sublane-dim repeat/broadcast-reshape of tiny vectors, but scalar reads
    # + vectorized where() lower cleanly (cg is small: C/num_groups).
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) // rows_per_ch
    w_rows = jnp.zeros((r, 1), jnp.float32)
    b_rows = jnp.zeros((r, 1), jnp.float32)
    for cidx in range(cg):
        sel = ch_ids == cidx
        w_rows = jnp.where(sel, w_ref[g, cidx].astype(jnp.float32), w_rows)
        b_rows = jnp.where(sel, b_ref[g, cidx].astype(jnp.float32), b_rows)
    y = (xf - mean) * inv * w_rows + b_rows
    if has_film:
        s_rows = jnp.zeros((r, 1), jnp.float32)
        t_rows = jnp.zeros((r, 1), jnp.float32)
        for cidx in range(cg):
            sel = ch_ids == cidx
            s_rows = jnp.where(sel, scale_ref[pid, cidx].astype(jnp.float32), s_rows)
            t_rows = jnp.where(sel, shift_ref[pid, cidx].astype(jnp.float32), t_rows)
        y = y * (1.0 + s_rows) + t_rows
    if act:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pallas_impl(x, weight, bias, scale, shift, num_groups, eps, act):
    n, c = x.shape[0], x.shape[1]
    spatial = int(math.prod(x.shape[2:]))
    cg = c // num_groups
    lanes = 128
    rows = cg * spatial // lanes
    x2 = x.reshape(n * num_groups, rows, lanes)
    # Mosaic only supports 32-bit scalar extracts; the tiny affine tables go
    # through in f32 regardless of the activation dtype.
    wg = weight.reshape(num_groups, cg).astype(jnp.float32)
    bg = bias.reshape(num_groups, cg).astype(jnp.float32)
    has_film = scale is not None
    if has_film:
        sg = scale.reshape(n, num_groups, cg).reshape(n * num_groups, cg).astype(jnp.float32)
        tg = shift.reshape(n, num_groups, cg).reshape(n * num_groups, cg).astype(jnp.float32)
    else:
        sg = jnp.zeros((1, cg), jnp.float32)
        tg = jnp.zeros((1, cg), jnp.float32)

    grid = (n * num_groups,)
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, cg=cg, eps=eps, act=act, has_film=has_film,
                          num_groups=num_groups),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0)),
            pl.BlockSpec(wg.shape, lambda i: (0, 0)),
            pl.BlockSpec(bg.shape, lambda i: (0, 0)),
            pl.BlockSpec(sg.shape, lambda i: (0, 0)),
            pl.BlockSpec(tg.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, lanes), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        interpret=interpret,
    )(x2, wg, bg, sg, tg)
    return out.reshape(x.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, weight, bias, scale, shift, num_groups, eps, act):
    return _pallas_impl(x, weight, bias, scale, shift, num_groups, eps, act)


def _fused_fwd(x, weight, bias, scale, shift, num_groups, eps, act):
    out = _pallas_impl(x, weight, bias, scale, shift, num_groups, eps, act)
    return out, (x, weight, bias, scale, shift)


def _fused_bwd(num_groups, eps, act, res, g):
    x, weight, bias, scale, shift = res
    if scale is None:
        _, vjp = jax.vjp(
            lambda x_, w_, b_: _xla_reference(x_, w_, b_, None, None, num_groups, eps, act),
            x, weight, bias,
        )
        dx, dw, db = vjp(g)
        return dx, dw, db, None, None
    _, vjp = jax.vjp(
        lambda x_, w_, b_, s_, t_: _xla_reference(x_, w_, b_, s_, t_, num_groups, eps, act),
        x, weight, bias, scale, shift,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_group_norm_act(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    *,
    num_groups: int,
    eps: float = 1e-5,
    act: bool = True,
    scale: Optional[jax.Array] = None,
    shift: Optional[jax.Array] = None,
) -> jax.Array:
    """GroupNorm + optional FiLM(h*(1+scale)+shift) + optional SiLU, fused.

    ``scale``/``shift``: (N, C) FiLM parameters (ResBlockND use_scale_shift_norm).
    Falls back to XLA when fusion is disabled or shapes don't tile.
    """
    c = x.shape[1]
    spatial = int(math.prod(x.shape[2:]))
    cg = c // max(num_groups, 1)
    usable = (
        _ENABLED
        and num_groups >= 1
        and c % num_groups == 0
        and cg <= 32  # select-loop unroll bound
        and spatial % 128 == 0  # channel boundaries must align to row tiles
        and (cg * spatial) // 128 >= 8
        and spatial * cg * 4 <= 8 * 1024 * 1024  # group block must fit VMEM
    )
    if not usable:
        return _xla_reference(x, weight, bias, scale, shift, num_groups, eps, act)
    return _fused(x, weight, bias, scale, shift, num_groups, eps, act)
