"""Ring-attention hop benchmark (VERDICT r3 item 4 evidence).

One real chip is available, so an N-chip ring wall-clock cannot be measured
directly; what CAN be measured on hardware is the thing the fusion changed:
the PER-HOP compute. A ring over n devices at global token count T runs n
hops of local-Q (T/n) x K/V-shard (T/n) attention per device; this script
times exactly that hop at the shard shapes of 4096/8192/16384-token rings —
  einsum hop: the round-3 formulation (materializes the (T/n x S/n) score
              tile in HBM, unnormalized (m, l, acc) outputs)
  flash hop:  the fused kernel path (flash_forward_partials: score tile
              never leaves VMEM, normalized (out, lse) outputs)
Ring wall-clock ≈ n · t_hop + (n-1) · t_ppermute, and ppermute cost is
identical for both (same K/V bytes moved), so the hop ratio IS the ring
compute-speedup ratio. Results go to BENCHMARKS.md.

Usage: python scripts/bench_ring_hop.py [--heads 8] [--dim 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np


def einsum_hop(q, k, v, scale):
    """Round-3 ring hop: unnormalized flash partials via the XLA einsum chain
    (parallel/sequence.py::_chunk_attention)."""
    s = jnp.einsum("...td,...sd->...ts", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("...ts,...sd->...td", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return m, l, acc


def flash_hop(q, k, v, scale):
    from fmdm_tpu.ops.pallas.flash_attention import flash_forward_partials

    return flash_forward_partials(q, k, v, scale)


def time_fn(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # force host sync through the tunnel (BENCHMARKS.md pitfalls)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--ring", type=int, default=4, help="simulated ring size n")
    args = ap.parse_args()

    scale = 1.0 / np.sqrt(args.dim)
    print(f"device={jax.devices()[0]}  heads={args.heads} d={args.dim} "
          f"ring n={args.ring}  (hop shapes = T/n tokens per side)")
    print("| global T | hop tokens | einsum hop ms | flash hop ms | speedup |")
    print("|---|---|---|---|---|")
    for total_t in (4096, 8192, 16384, 32768):
        t_loc = total_t // args.ring
        shape = (args.batch * args.heads, t_loc, args.dim)
        key = jax.random.PRNGKey(total_t)
        q = jax.random.normal(key, shape, jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), shape, jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), shape, jnp.bfloat16)
        e_fn = jax.jit(lambda q, k, v: einsum_hop(q, k, v, scale))
        f_fn = jax.jit(lambda q, k, v: flash_hop(q, k, v, scale))
        te, _ = time_fn(e_fn, (q, k, v))
        tf, (out_f, lse_f) = time_fn(f_fn, (q, k, v))
        # exactness probe: both formulations normalize to the same attention
        m, l, acc = jax.jit(lambda q, k, v: einsum_hop(q, k, v, scale))(q, k, v)
        ref = np.asarray(acc / l, np.float32)
        got = np.asarray(out_f, np.float32)
        err = float(np.max(np.abs(ref - got)))
        print(f"| {total_t} | {t_loc} | {te*1e3:.2f} | {tf*1e3:.2f} "
              f"| {te/tf:.2f}x |  (max|diff| {err:.1e})")


if __name__ == "__main__":
    main()
