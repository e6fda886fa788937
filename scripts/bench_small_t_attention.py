"""Microbenchmark: small-T many-tiny-heads attention variants on the chip.

The flagship UNet's attention sits at the MXU-hostile diffusers-parity shape
(64 heads x d=8 at 256 tokens; reference src/nn/blocks/attention.py:10-44) and
costs ~10.4 ms of the 115.8 ms forward (BENCHMARKS.md op profile): the f32/bf16
(BH, T, T) score tensor makes three HBM round-trips between the QK/softmax/PV
fusions. This sweeps, at the real flagship shapes:

  - the XLA chain (sdpa_xla, current default below 1024 tokens),
  - the head-packed Pallas kernel (scores stay in VMEM) over head_pack in
    {4, 8, 16, 32}.

Timing: scan-amortized (lax.scan over N calls inside one jit) so per-call
dispatch overhead is excluded, matching the BENCHMARKS.md attention table.

Usage: python scripts/bench_small_t_attention.py
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

SCAN_LEN = 32


def timed(fn, q, k, v):
    # BENCHMARKS.md measurement protocol for the axon tunnel: amortize inside
    # one compiled lax.scan (data-dependent carry blocks CSE), vary inputs
    # between timed repeats (identical (fn, args) re-executions are served
    # from a remote cache), and sync via host readback (block_until_ready
    # does not synchronize through the tunnel).
    @jax.jit
    def scanned(q, k, v):
        def body(c, _):
            o = fn(q + c, k, v)
            return c + o[0, 0, 0, 0] * 1e-9, ()
        c, _ = jax.lax.scan(body, jnp.zeros((), q.dtype), None, length=SCAN_LEN)
        return c

    float(np.asarray(scanned(q, k, v)))
    best = float("inf")
    for rep in range(1, 4):
        qr = q + rep * 1e-6
        t0 = time.perf_counter()
        float(np.asarray(scanned(qr, k, v)))
        best = min(best, (time.perf_counter() - t0) / SCAN_LEN)
    return best * 1e3  # ms per call


def main():
    from fmdm_tpu.ops.attention import sdpa_xla
    from fmdm_tpu.ops.pallas.flash_attention import mha_small_t

    results = []
    for (b, h, t, d) in [(32, 64, 256, 8), (32, 64, 64, 8)]:
        for dtype in (jnp.bfloat16,):
            kq = jax.random.normal(jax.random.PRNGKey(0), (b, h, t, d)).astype(dtype)
            kk = jax.random.normal(jax.random.PRNGKey(1), (b, h, t, d)).astype(dtype)
            kv = jax.random.normal(jax.random.PRNGKey(2), (b, h, t, d)).astype(dtype)
            row = {"shape": [b, h, t, d], "dtype": str(dtype.__name__)}
            row["xla_ms"] = round(timed(sdpa_xla, kq, kk, kv), 3)
            for pack, batched in [(4, True), (8, True), (16, True), (32, True),
                                  (16, False)]:
                tag = f"pack{pack}" + ("" if batched else "_unrolled")
                fn = functools.partial(mha_small_t, max_head_pack=pack, batched=batched)
                try:
                    ms = timed(fn, kq, kk, kv)
                    # correctness guard at the benchmarked shape
                    ref = np.asarray(sdpa_xla(kq, kk, kv), np.float32)
                    got = np.asarray(fn(kq, kk, kv), np.float32)
                    err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
                    row[f"pallas_{tag}_ms"] = round(ms, 3)
                    row[f"pallas_{tag}_relerr"] = round(err, 5)
                except Exception as e:  # shapes a pack doesn't support
                    row[f"pallas_{tag}_ms"] = f"error:{type(e).__name__}"
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"results": results}))


if __name__ == "__main__":
    main()
