"""
Attention primitives.

Functional equivalents of the reference QKVAttention / LinearQKVAttention
(/root/reference/src/nn/blocks/attention.py:10-70). The default scaled-dot-
product path lets XLA fuse the matmul-softmax-matmul chain onto MXU+VPU; a
Pallas flash-attention kernel (``fmdm_tpu.ops.pallas.flash_attention``) can be
enabled for long token counts via ``set_sdpa_backend``/config.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# Default "pallas": measured 8-17x faster than the XLA softmax chain on v5e at
# >=1024 tokens (BENCHMARKS.md attention table); engages only on TPU and only
# above the token threshold, with transparent XLA fallback otherwise.
_SDPA_BACKEND = "pallas"  # "xla" | "pallas"
_PALLAS_MIN_TOKENS = 1024


def set_sdpa_backend(name: str) -> None:
    global _SDPA_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"Unknown sdpa backend '{name}'")
    _SDPA_BACKEND = name


def get_sdpa_backend() -> str:
    return _SDPA_BACKEND


# Sequence-parallel routing: when a trainer/engine sets a mesh with a token
# ("seq") axis, sdpa shards the token dim over it and runs the ppermute ring
# (parallel/sequence.py) — the reference has no analogue (single-GPU
# attention, src/nn/blocks/attention.py); this is how volumetric token counts
# outgrow one chip. GSPMD inserts the batch<->token resharding collectives at
# the shard_map boundary, so the surrounding convs keep full data-parallel
# batch sharding (Ulysses-style composition on ICI).
_SEQ_PARALLEL = None  # (mesh, seq_axis, min_tokens) | None


def set_sequence_parallel(mesh, axis: str = "seq", min_tokens: int = 512) -> None:
    """Route sdpa through ring attention over ``mesh[axis]`` for token counts
    that are >= min_tokens and divisible by the axis size."""
    global _SEQ_PARALLEL
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no '{axis}' axis (axes: {mesh.axis_names})")
    _SEQ_PARALLEL = (mesh, axis, int(min_tokens))


def clear_sequence_parallel() -> None:
    global _SEQ_PARALLEL
    _SEQ_PARALLEL = None


def get_sequence_parallel():
    return _SEQ_PARALLEL


class sequence_parallel_scope:
    """Temporarily install ``ctx`` ((mesh, axis, min_tokens) or None) as the
    sequence-parallel routing, restoring the previous value on exit.

    Sampling engines use this so their traces see exactly the routing that
    matches their own mesh — a trainer's process-global routing must not leak
    into a probe/engine jitted over a different device set (shard_map over a
    foreign mesh raises 'incompatible devices')."""

    def __init__(self, ctx):
        self._ctx = ctx

    def __enter__(self):
        global _SEQ_PARALLEL
        self._prev = _SEQ_PARALLEL
        _SEQ_PARALLEL = self._ctx

    def __exit__(self, *exc):
        global _SEQ_PARALLEL
        _SEQ_PARALLEL = self._prev
        return False


def _maybe_ring_sdpa(q, k, v, scale):
    """shard_map'd ring attention when the configured seq axis divides the
    token dims; None => caller falls through to the single-device path."""
    import functools

    from jax.sharding import PartitionSpec as P

    from fmdm_tpu.parallel.sequence import ring_attention

    mesh, axis, min_tokens = _SEQ_PARALLEL
    n = mesh.shape[axis]
    if n <= 1 or q.ndim < 3:
        return None
    t, s = q.shape[-2], k.shape[-2]
    if t < min_tokens or t % n != 0 or s % n != 0:
        return None  # e.g. short cross-attention context: stay local
    # batch dim rides whatever data axis the surrounding program uses, so the
    # boundary reshard is batch<->token all-to-all, not an all-gather
    data_axes = tuple(a for a in mesh.axis_names if a != axis)
    batch_part = None
    for cand in (data_axes, data_axes[:1]):
        size = math.prod(mesh.shape[a] for a in cand) if cand else 1
        if cand and q.shape[0] % size == 0:
            batch_part = cand if len(cand) > 1 else cand[0]
            break
    spec = P(batch_part, *([None] * (q.ndim - 3)), axis, None)
    # check_vma=False: the fused flash hop's pallas_call does not propagate
    # varying-axes typing through its kernel internals in interpret mode
    # (jax 0.9 limitation); semantics are unchanged — the ring's collectives
    # are explicit ppermutes.
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def sdpa_xla(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: Optional[float] = None) -> jax.Array:
    """softmax(q kᵀ · scale) v over the last two dims; f32 accumulation.

    Under bf16 inputs the (…, T, S) score tensor is materialized in bf16:
    at the diffusers-parity attention shape (64 heads × d=8 at 256 tokens)
    the scores dwarf q/k/v, and XLA writes them to HBM between the QKᵀ dot,
    the softmax fusion, and the PV dot — so score dtype sets the attention
    bandwidth bill (measured 3.34 → 2.27 ms per instance on v5e, relerr
    3.5e-3, consistent with the engine's bf16 compute policy). Softmax
    arithmetic stays f32 in-register either way; f32 inputs keep the fully
    exact path for the parity suites."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    dtype = q.dtype
    logits = jnp.einsum(
        "...td,...sd->...ts", q, k, preferred_element_type=jnp.float32
    ) * scale
    if dtype == jnp.bfloat16:
        logits = logits.astype(dtype)
        m = jnp.max(logits, axis=-1, keepdims=True)
        unnorm = jnp.exp((logits - m).astype(jnp.float32))
        weights = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(dtype)
    else:
        weights = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("...ts,...sd->...td", weights, v, preferred_element_type=jnp.float32).astype(dtype)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array, *, scale: Optional[float] = None) -> jax.Array:
    """Scaled dot-product attention; dispatches to the configured backend.

    Inputs are (..., T, d) / (..., S, d) / (..., S, d_v).
    """
    if _SEQ_PARALLEL is not None:
        out = _maybe_ring_sdpa(q, k, v, scale)
        if out is not None:
            return out
    if (
        _SDPA_BACKEND == "pallas"
        and q.shape[-2] >= _PALLAS_MIN_TOKENS
        and jax.default_backend() == "tpu"  # interpret mode off-TPU is slow
    ):
        from fmdm_tpu.ops.pallas.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale)
        except Exception:  # pragma: no cover - fall back on unsupported shapes
            pass
    return sdpa_xla(q, k, v, scale=scale)


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, eps: float = 1e-6) -> jax.Array:
    """O(N) softmax-factored linear attention (reference attention.py:63-70).

    k is softmaxed over tokens (dim -2), q over features (dim -1);
    context = kᵀ v normalized by per-feature key mass.
    """
    dtype = q.dtype
    k_soft = jax.nn.softmax(k.astype(jnp.float32), axis=-2)
    q_soft = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
    context = jnp.einsum("...nd,...ne->...de", k_soft, v.astype(jnp.float32))
    denom = jnp.sum(k_soft, axis=-2)[..., :, None] + eps  # (..., d, 1)
    context = context / denom
    out = jnp.einsum("...nd,...de->...ne", q_soft, context)
    return out.astype(dtype)
