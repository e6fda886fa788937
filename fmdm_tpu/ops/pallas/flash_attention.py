"""
Pallas TPU flash-attention kernel.

Replaces the XLA softmax-attention chain for long flattened-spatial token
counts (the reference reaches these through SpatialSelfAttention /
DiffusersAttentionND over up-to-256² grids; attention.py:41-44 uses fused SDPA
on CUDA). Online-softmax tiling over KV blocks keeps the T×T score matrix out
of HBM: per (batch*head, q-block) grid cell we stream K/V tiles through VMEM
and carry running (max, sum, weighted-V) statistics — the standard
flash-attention recurrence, with f32 accumulation on the MXU.

Backward is a pair of Pallas kernels over the saved (q, k, v, out, logsumexp)
residuals — a dK/dV kernel gridded over KV blocks and a dQ kernel gridded over
Q blocks — recomputing probability tiles from the logsumexp so the T×T score
matrix never touches HBM in either direction (the round-2 backward
materialized it via XLA einsums, which capped long-token 3D training). A
full-materialization XLA formulation is kept behind
``set_flash_backward('xla')`` for debugging/parity checks.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int):
    # blocks: q (1, block_q, d); k/v (1, T, d); o (1, block_q, d); lse (1, block_q, 1)
    q = q_ref[0].astype(jnp.float32) * scale
    kv_len = k_ref.shape[1]
    num_kv = kv_len // block_k
    block_q, d = q.shape

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        correction = jnp.exp(m - m_new)
        l_new = l * correction + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * correction + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # lse broadcast across the 128-lane dim (a (bq, 1) block would violate
    # the TPU tile constraint); caller slices lane 0.
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (m.shape[0], 128)).astype(jnp.float32)


def _vma_of(*arrays) -> frozenset:
    """Varying-axes set of the inputs (non-empty only under shard_map with
    check_vma); pallas_call out_shapes must declare it or tracing fails when a
    kernel runs inside a manual-axes region (e.g. the ring-attention hop)."""
    vma = set()
    for a in arrays:
        try:
            vma |= set(jax.typeof(a).vma)
        except Exception:  # pragma: no cover - eager paths
            pass
    return frozenset(vma) or None  # None outside shard_map (the old default)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), size


def _flash_forward(q, k, v, scale, block_q, block_k):
    """q: (BH, Tq, D), k/v: (BH, Tk, D) -> (out, lse)."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    if tk % block_k != 0:
        # Padding K would corrupt the softmax (padded keys get finite scores);
        # callers fall back to the XLA path instead.
        raise ValueError("flash_attention requires block_k to divide the KV length")
    q, tq_real = _pad_to(q, 1, block_q)

    grid = (bh, q.shape[1] // block_q)
    interpret = jax.default_backend() != "tpu"
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, v.shape[-1]), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 128), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q.shape[1], d), q.dtype, vma=_vma_of(q, k, v)),
            jax.ShapeDtypeStruct((bh, q.shape[1], 128), jnp.float32, vma=_vma_of(q, k, v)),
        ],
        interpret=interpret,
    )(q, k, v)
    return out[:, :tq_real], lse[:, :tq_real, :1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_3d(q, k, v, scale, block_q, block_k):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_k):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


_FLASH_BWD = "pallas"  # "pallas" | "xla"
_LANES = 128


def set_flash_backward(name: str) -> None:
    global _FLASH_BWD
    if name not in ("pallas", "xla"):
        raise ValueError(f"Unknown flash backward '{name}'")
    _FLASH_BWD = name


def _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                          dk_ref, dv_ref, *, scale: float, block_q: int):
    # blocks: q/do (1, Tq, d) full; lse/delta (1, Tq, 128) lane-broadcast;
    # k/v/dk/dv (1, block_k, d).
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k = k.shape[0]
    tq = q_ref.shape[1]
    reps = block_k // _LANES

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]       # (bq, 128)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]   # (bq, 128)
        s = scale * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - jnp.tile(lse, (1, reps)))              # normalized probs
        dv = dv + jnp.dot(p.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.tile(delta, (1, reps)))
        dk = dk + scale * jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, tq // block_q, body, (dk0, dv0))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                         dq_ref, *, scale: float, block_k: int):
    # blocks: q/do/dq (1, block_q, d); lse/delta (1, block_q, 128); k/v (1, Tk, d).
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = jnp.tile(lse_ref[0], (1, block_k // _LANES))
    delta = jnp.tile(delta_ref[0], (1, block_k // _LANES))
    tk = k_ref.shape[1]

    def body(i, dq):
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = scale * jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + scale * jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, tk // block_k, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_backward_pallas(q, k, v, out, lse, g, scale, block_q, block_k):
    bh, tq_real, d = q.shape
    tk = k.shape[1]
    dv_dim = v.shape[-1]
    gf = g.astype(jnp.float32)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    # Pad Q-side tensors to a block_q multiple; padded rows get lse=+big so
    # their probability tiles are exactly zero and contribute nothing.
    q_p, _ = _pad_to(q, 1, block_q)
    do_p, _ = _pad_to(g, 1, block_q)
    tq_pad = q_p.shape[1]
    pad_rows = tq_pad - tq_real
    lse_b = jnp.broadcast_to(lse.astype(jnp.float32), (bh, tq_real, _LANES))
    delta_b = jnp.broadcast_to(delta, (bh, tq_real, _LANES))
    if pad_rows:
        lse_b = jnp.pad(lse_b, ((0, 0), (0, pad_rows), (0, 0)),
                        constant_values=1e30)
        delta_b = jnp.pad(delta_b, ((0, 0), (0, pad_rows), (0, 0)))
    interpret = jax.default_backend() != "tpu"

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, tk // block_k),
        in_specs=[
            pl.BlockSpec((1, tq_pad, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, tq_pad, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, tq_pad, _LANES), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, tq_pad, _LANES), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv_dim), lambda b, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, dv_dim), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype, vma=_vma_of(q_p, do_p, k, v)),
            jax.ShapeDtypeStruct(v.shape, v.dtype, vma=_vma_of(q_p, do_p, k, v)),
        ],
        interpret=interpret,
    )(q_p, do_p, lse_b, delta_b, k, v)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k),
        grid=(bh, tq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, tk, dv_dim), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq_pad, d), q.dtype,
                                       vma=_vma_of(q_p, do_p, k, v)),
        interpret=interpret,
    )(q_p, do_p, lse_b, delta_b, k, v)
    return dq[:, :tq_real], dk, dv


def _flash_bwd_rule(scale, block_q, block_k, res, g):
    q, k, v, out, lse = res
    # The Pallas bwd kernels build probability tiles via
    # jnp.tile(lse, (1, block_k // _LANES)), so they require
    # block_k % 128 == 0. The forward accepts any KV length <= block_k
    # (block_k_eff = tk), e.g. cross-attention contexts of length 77/320 —
    # those shapes must take the XLA formulation here, not crash at grad
    # trace (ADVICE r3: the failure would occur inside the custom_vjp bwd
    # rule, outside sdpa()'s try/except fallback).
    if _FLASH_BWD == "pallas" and block_k % _LANES == 0:
        return _flash_backward_pallas(q, k, v, out, lse, g, scale, block_q, block_k)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bqd,bkd->bqk", qf * scale, kf)
    p = jnp.exp(s - lse)  # exact softmax probabilities from saved lse
    dv = jnp.einsum("bqk,bqd->bkd", p, gf)
    dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
    delta = jnp.sum(gf * out.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - delta)
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_3d.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def pick_block_k(tk: int, cap: int = DEFAULT_BLOCK_K) -> int:
    """Largest KV block <= cap that divides tk (the kernels stream KV in
    whole blocks). Falls back to tk itself when tk <= cap."""
    if tk <= cap:
        return tk
    for cand in (cap, 384, 256, 128):
        if cand <= cap and tk % cand == 0:
            return cand
    return tk  # caller must handle (single oversized block)


def flash_forward_partials(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    *,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> Tuple[jax.Array, jax.Array]:
    """Forward flash attention over (..., T, D) returning (out, lse).

    The (out, lse) pair IS the flash partial triple in normalized form
    (lse = m + log l, out = acc / l): two chunks combine exactly via
    lse' = logaddexp(lse_a, lse_b), out' = out_a·e^{lse_a−lse'} +
    out_b·e^{lse_b−lse'} — the hop combiner ring attention needs
    (parallel/sequence.py). NOT differentiable on its own (pallas_call has no
    autodiff); the ring wraps the whole loop in a custom_vjp."""
    lead = q.shape[:-2]
    tq, d = q.shape[-2:]
    tk = k.shape[-2]
    bk = pick_block_k(tk, cap=block_k)
    if tk % bk != 0:
        raise ValueError("flash_forward_partials requires block_k | KV length")
    q3 = q.reshape((-1, tq, d))
    k3 = k.reshape((-1, tk, d))
    v3 = v.reshape((-1, tk, v.shape[-1]))
    out, lse = _flash_forward(q3, k3, v3, float(scale), int(min(block_q, tq)), int(bk))
    return (out.reshape(lead + (tq, v.shape[-1])),
            lse.reshape(lead + (tq, 1)))


def flash_backward_chunk(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    g: jax.Array,
    scale: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-chunk flash backward against GLOBAL (out, lse) residuals.

    p = exp(q·kᵀ·scale − lse) are the globally normalized probabilities of
    this KV chunk, so (dq_partial, dk_chunk, dv_chunk) from this call are the
    exact per-chunk contributions; summing dq over chunks and routing each
    (dk, dv) to its chunk's home completes the ring backward. Uses the Pallas
    kernels when the chunk length is 128-aligned, else the XLA formulation."""
    lead = q.shape[:-2]
    tq, d = q.shape[-2:]
    tk = k.shape[-2]
    q3 = q.reshape((-1, tq, d))
    k3 = k.reshape((-1, tk, d))
    v3 = v.reshape((-1, tk, v.shape[-1]))
    out3 = out.reshape((-1, tq, v.shape[-1]))
    lse3 = lse.reshape((-1, tq, 1)).astype(jnp.float32)
    g3 = g.reshape((-1, tq, v.shape[-1]))
    bk = pick_block_k(tk)
    if tk % bk == 0 and bk % _LANES == 0:
        dq, dk, dv = _flash_backward_pallas(
            q3, k3, v3, out3, lse3, g3, float(scale),
            int(min(DEFAULT_BLOCK_Q, tq)), int(bk))
    else:
        qf, kf, vf = (x.astype(jnp.float32) for x in (q3, k3, v3))
        gf = g3.astype(jnp.float32)
        s = jnp.einsum("bqd,bkd->bqk", qf * scale, kf)
        p = jnp.exp(s - lse3)
        dv = jnp.einsum("bqk,bqd->bkd", p, gf).astype(v.dtype)
        dp = jnp.einsum("bqd,bkd->bqk", gf, vf)
        delta = jnp.sum(gf * out3.astype(jnp.float32), axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dq = (jnp.einsum("bqk,bkd->bqd", ds, kf) * scale).astype(q.dtype)
        dk = (jnp.einsum("bqk,bqd->bkd", ds, qf) * scale).astype(k.dtype)
    return (dq.reshape(lead + (tq, d)),
            dk.reshape(lead + (tk, d)),
            dv.reshape(lead + (tk, v.shape[-1])))


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Flash attention over (..., T, D) tensors (leading dims flattened)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    lead = q.shape[:-2]
    tq, d = q.shape[-2:]
    tk = k.shape[-2]
    block_k_eff = min(block_k, tk)
    if tk % block_k_eff != 0:
        raise ValueError("flash_attention requires block_k to divide the KV length")
    q3 = q.reshape((-1, tq, d))
    k3 = k.reshape((-1, tk, d))
    v3 = v.reshape((-1, tk, v.shape[-1]))
    out = _flash_attention_3d(q3, k3, v3, float(scale), int(min(block_q, tq)), int(block_k_eff))
    return out.reshape(lead + (tq, d))


# ---------------------------------------------------------------------------
# Head-packed small-T attention
# ---------------------------------------------------------------------------
#
# The diffusers-parity UNet attention runs at tiny sequence length with many
# tiny heads (attention_head_dim=8 -> 64 heads of d=8 at 16², 256 tokens).
# XLA materializes the f32 (BH, T, T) score tensor in HBM three times over
# (QKᵀ write, softmax read+write, PV read) — ~20% of flagship forward device
# time for ~4 GFLOP of actual work. Below the flash threshold the fix is not
# an online softmax (T fits in VMEM whole) but score locality: one grid step
# loads a *pack* of heads and runs QKᵀ → softmax → PV per head entirely
# in VMEM, so scores never touch HBM.
#
# Backward falls back to the XLA formulation via custom_vjp (attention at
# these shapes is a negligible share of the training step; the win targeted
# here is the sampling path, which is forward-only).

def _mha_packed_batched_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # blocks: q/k/v/o (1, head_pack, T, d); ONE batched dot per stage so the
    # MXU pipeline is fed head_pack matmuls at once instead of an unrolled
    # per-head loop (the per-head variant is latency-bound at d=8).
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale                                            # (pack, T, T) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _mha_packed_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, head_pack: int):
    # blocks: q/k/v/o (1, head_pack, T, d); static unrolled head loop.
    # Dots take the inputs in their native dtype (bf16 on the sampling path —
    # MXU bf16 is ~2x its f32 rate) and accumulate f32; softmax stays f32.
    for h in range(head_pack):
        q = q_ref[0, h]                                  # (T, d)
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)                               # (T, T) f32 in VMEM
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32) / l
        o_ref[0, h] = o.astype(o_ref.dtype)


def _mha_packed_forward(q, k, v, scale, head_pack, batched=False):
    bh, t, d = q.shape
    packs = bh // head_pack
    q4 = q.reshape(packs, head_pack, t, d)
    k4 = k.reshape(packs, head_pack, t, d)
    v4 = v.reshape(packs, head_pack, t, v.shape[-1])
    kernel = (functools.partial(_mha_packed_batched_kernel, scale=scale) if batched
              else functools.partial(_mha_packed_kernel, scale=scale, head_pack=head_pack))
    out = pl.pallas_call(
        kernel,
        grid=(packs,),
        in_specs=[
            pl.BlockSpec((1, head_pack, t, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, head_pack, t, d), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((1, head_pack, t, v.shape[-1]), lambda b: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, head_pack, t, v.shape[-1]), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((packs, head_pack, t, v.shape[-1]), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(q4, k4, v4)
    return out.reshape(bh, t, v.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_packed_3d(q, k, v, scale, head_pack, batched=False):
    return _mha_packed_forward(q, k, v, scale, head_pack, batched)


def _mha_packed_fwd_rule(q, k, v, scale, head_pack, batched):
    return _mha_packed_forward(q, k, v, scale, head_pack, batched), (q, k, v)


def _mha_packed_bwd_rule(scale, head_pack, batched, res, g):
    q, k, v = res

    def ref_attn(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)

    _, vjp = jax.vjp(ref_attn, q, k, v)
    return vjp(g)


_mha_packed_3d.defvjp(_mha_packed_fwd_rule, _mha_packed_bwd_rule)


def mha_small_t(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    max_head_pack: int = 16,
    batched: bool = False,
) -> jax.Array:
    """Head-packed attention for small self-attention (T == S, T ≤ ~512)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    lead = q.shape[:-2]
    tq, d = q.shape[-2:]
    q3 = q.reshape((-1, tq, d))
    k3 = k.reshape((-1, tq, d))
    v3 = v.reshape((-1, tq, v.shape[-1]))
    bh = q3.shape[0]
    head_pack = 1
    for candidate in (max_head_pack, 8, 4, 2, 1):
        if candidate <= max_head_pack and bh % candidate == 0:
            head_pack = candidate
            break
    out = _mha_packed_3d(q3, k3, v3, float(scale), int(head_pack), bool(batched))
    return out.reshape(lead + (tq, v.shape[-1]))
