"""
Sequence parallelism: ring attention over a mesh axis.

The reference tops out at single-GPU attention (src/nn/blocks/attention.py);
for volumetric/long-token models whose T×T score tiles and K/V streams
outgrow one chip, this shards the TOKEN axis over a mesh axis and rotates
K/V shards around the ring with ``ppermute`` while each device keeps only
its local Q shard — the RingAttention formulation (online-softmax carry
across ring hops), expressed with XLA collectives so the K/V transfer for
hop i+1 can overlap the attention compute of hop i on ICI.

Memory per device: O(T/n · d) activations and O(block_q · T/n) score tiles —
nothing global to T. Exactness: the online-softmax recurrence is the same as
flash attention's, so results match single-device SDPA to accumulation
order. Each ring hop currently computes its chunk with the XLA einsum chain
(materializing a (T/n × S/n) score tile per hop); fusing the Pallas flash
kernel into the hop — it would need to expose its (m, l, acc) partials — is
ROADMAP work, so at flash-eligible token counts compare one-chip flash vs
ring before enabling sequence_parallel for speed alone (the ring's win is
capacity: K/V streams and activations that outgrow one chip).

Entry points
- ``ring_attention(q, k, v, axis_name=...)`` — inside shard_map/pjit, local
  shards in, local out-shard back.
- ``sequence_parallel_sdpa(q, k, v, mesh, axis=...)`` — host-level wrapper:
  shard_maps global arrays over ``axis`` and runs ring_attention.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _chunk_attention(q, k, v, scale):
    """Unnormalized attention over one K/V chunk with f32 stats.

    Returns (m, l, acc): rowwise max of scaled logits, sum of exp, and
    exp-weighted V accumulation — the flash-attention partial triple.
    """
    s = jnp.einsum("...td,...sd->...ts", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("...ts,...sd->...td", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention with K/V rotated around the ``axis_name`` ring.

    Call inside shard_map with q/k/v sharded over their token dim (-2).
    Each of the n hops computes local-Q × current-K/V-shard attention and
    folds it into the running (max, denom, numerator) carry; ppermute moves
    the K/V shard one ring position per hop.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    # jax.shard_map's varying-axes typing: literal-constant carries must be
    # marked as varying over the same manual axes as the (data-derived, hence
    # varying) loop outputs — ALL axes q varies over, not just the ring axis
    # (e.g. a dp x sp mesh adds 'data' to q's varying set via batch sharding).
    try:
        vma = tuple({*jax.typeof(q).vma, *jax.typeof(k).vma, *jax.typeof(v).vma}) or (axis_name,)
    except Exception:  # pragma: no cover - eager/older tracing paths
        vma = (axis_name,)
    _vary = lambda x: jax.lax.pcast(x, vma, to="varying")
    m0 = _vary(jnp.full(q.shape[:-1] + (1,), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros(q.shape[:-1] + (1,), jnp.float32))
    acc0 = _vary(jnp.zeros(q.shape[:-1] + (v.shape[-1],), jnp.float32))

    def body(i, carry):
        m, l, acc, k_cur, v_cur = carry
        mc, lc, accc = _chunk_attention(q, k_cur, v_cur, scale)
        m_new = jnp.maximum(m, mc)
        c_old = jnp.exp(m - m_new)
        c_new = jnp.exp(mc - m_new)
        l = l * c_old + lc * c_new
        acc = acc * c_old + accc * c_new
        # rotate K/V for the next hop (last hop's rotate is dead code that
        # XLA cannot always elide inside fori_loop; n is tiny so keep it)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m_new, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(0, n, body, (m0, l0, acc0, k, v))
    return (acc / l).astype(q.dtype)


def sequence_parallel_sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> jax.Array:
    """Global-array wrapper: tokens sharded over ``axis``, ring under the hood.

    q/k/v are (..., T, D) with T divisible by the axis size. Leading dims are
    replicated; the token dim is sharded. Output shards match q's.
    """
    from jax import shard_map

    ndim = q.ndim
    spec = P(*([None] * (ndim - 2) + [axis, None]))
    fn = shard_map(
        functools.partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)


def run_self_tests() -> None:
    """Embedded self-test: ring == single-device SDPA on a CPU mesh."""
    import numpy as np

    devs = jax.devices("cpu")
    if len(devs) < 2:  # pragma: no cover - single-device CI fallback
        return
    n = 2
    mesh = Mesh(np.array(devs[:n]), ("data",))
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8 * n, 16))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8 * n, 16))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8 * n, 16))
    out = sequence_parallel_sdpa(q, k, v, mesh=mesh, axis="data")
    s = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(16)
    ref = jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
