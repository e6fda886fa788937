"""Probe: does XLA:TPU lower int8 convolutions/matmuls to the v5e's 2x-rate
int8 MXU path? (v5e peak: 197 bf16 TFLOP/s vs 394 int8 TOP/s.)

If yes, a W8A8 quantized inference mode could cut the conv-dominated
(~84% of device time, ~90% MXU at bf16) flagship forward nearly in half.
This script times the flagship's dominant conv shapes and a square matmul
in bf16 vs int8 (int32 accumulation), scan-amortized to bury dispatch
latency, and prints a ratio table. Negative results are results.

Usage: python scripts/bench_int8_conv.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax import lax

STEPS = 30


def _time_scan(step, x0, w) -> float:
    """Seconds per application of `step`, amortized over a STEPS-long scan.

    The op's output is fed back as the next input (cast to the input dtype)
    so XLA cannot hoist or dead-code-eliminate it. Values saturate/overflow;
    only timing matters here.
    """

    def body(x, _):
        return step(x, w), ()

    @jax.jit
    def run(x, w):
        out, _ = lax.scan(body, x, None, length=STEPS)
        return out

    run(x0, w).block_until_ready()
    t0 = time.perf_counter()
    run(x0, w).block_until_ready()
    return (time.perf_counter() - t0) / STEPS


def time_conv(batch, cin, cout, hw, dtype):
    # cout >= cin for every probed shape, so the feedback slice is valid.
    x = jnp.ones((batch, cin, hw, hw), dtype)
    w = jnp.ones((cout, cin, 3, 3), dtype)
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def step(x, w):
        out = lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=acc,
        )
        return out[:, :cin].astype(dtype)

    return _time_scan(step, x, w)


def time_matmul(n, dtype):
    a = jnp.ones((n, n), dtype)
    b = jnp.ones((n, n), dtype)
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def step(a, b):
        out = lax.dot_general(a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)
        return out.astype(dtype)

    return _time_scan(step, a, b)


def main():
    print(f"devices: {jax.devices()}")
    n = 4096
    flops = 2 * n**3
    t_bf = time_matmul(n, jnp.bfloat16)
    t_i8 = time_matmul(n, jnp.int8)
    print(f"matmul {n}^3: bf16 {t_bf*1e3:.3f} ms ({flops/t_bf/1e12:.1f} T/s)  "
          f"int8 {t_i8*1e3:.3f} ms ({flops/t_i8/1e12:.1f} T/s)  speedup {t_bf/t_i8:.2f}x")

    # Flagship UNetDiffusersND conv shapes (block_out [128,128,256,256,512,512]
    # at 256..8 px), batch 32 = the sampling-bench protocol.
    shapes = [
        (32, 128, 128, 256),
        (32, 128, 128, 128),
        (32, 128, 256, 64),
        (32, 256, 256, 64),
        (32, 256, 256, 32),
        (32, 512, 512, 16),
        (32, 512, 512, 8),
    ]
    peak_bf16 = 197e12
    print(f"{'conv (B,Cin->Cout,@HW^2)':28s} {'bf16 ms':>9s} {'int8 ms':>9s} {'ratio':>6s} {'bf16 MXU%':>9s}")
    for b, cin, cout, hw in shapes:
        fl = 2 * b * cin * cout * 9 * hw * hw
        tb = time_conv(b, cin, cout, hw, jnp.bfloat16)
        ti = time_conv(b, cin, cout, hw, jnp.int8)
        label = f"B{b} {cin:4d}->{cout:4d} @{hw:3d}^2"
        print(f"{label:28s} {tb*1e3:9.3f} {ti*1e3:9.3f} {tb/ti:6.2f} {fl/tb/peak_bf16*100:8.1f}%")


if __name__ == "__main__":
    main()
