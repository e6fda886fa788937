"""Probe: does the dominant flagship conv leave MXU throughput on the table
because of its logical layout?

The round-4 int8 shape probe (scripts/bench_int8_conv.py) measured the
flagship's dominant conv (B32 128->128 @256², 3x3) at ~52% bf16 MXU
utilization through the production channels-first path. XLA:TPU assigns
physical layouts itself, but the *logical* orientation (NCHW vs NHWC) and the
formulation (direct conv vs im2col matmul) can still steer its tiling. This
script times the same math three ways, scan-amortized like the engine's
reverse process:

  a) nchw   — production path (ops/conv.py conv_nd, torch OIHW weights)
  b) nhwc   — lax.conv_general_dilated with NHWC/HWIO dimension numbers
  c) im2col — patch-extract + one (B*H*W, K*K*Cin) x (K*K*Cin, Cout) matmul

Equal-math verification against (a) at f32 precedes the timing. Run on the
real chip (serialized — the axon tunnel is single-client):

    python scripts/bench_conv_layouts.py [B] [C] [HW]
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.ops.conv import conv_nd

STEPS = 50  # scan length — amortizes dispatch like the sampling engine


def _time(fn, *args) -> float:
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(fn)(*args))
        best = min(best, time.perf_counter() - t0)
    return best / STEPS


def _scan(step, x0, w, b):
    def body(x, _):
        return step(x, w, b), None

    y, _ = jax.lax.scan(body, x0, None, length=STEPS)
    return y


def step_nchw(x, w, b):
    return jnp.tanh(conv_nd(x, w, b))  # tanh keeps values bounded across steps


def step_nhwc(x, w, b):
    # x: (B, H, W, C); w stored HWIO
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    return jnp.tanh(y + b)


def step_im2col(x, w, b):
    # x: (B, H, W, C); w: (K*K*C, Cout)
    B, H, W, C = x.shape
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(3, 3), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = patches.reshape(B * H * W, -1) @ w
    return jnp.tanh(y.reshape(B, H, W, -1) + b)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    HW = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    K = 3
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x_nchw = jnp.asarray(rng.standard_normal((B, C, HW, HW)) * 0.1, dt)
    w_oihw = jnp.asarray(rng.standard_normal((C, C, K, K)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.01, dt)

    x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
    w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))
    # conv_general_dilated_patches emits features ordered (C, KH, KW) —
    # depth-major — so the matmul weight must match that ordering.
    w_mat = jnp.transpose(w_oihw, (1, 2, 3, 0)).reshape(C * K * K, C)

    # equal-math check at f32 (single step)
    xf, wf, bf = (a.astype(jnp.float32) for a in (x_nchw, w_oihw, bias))
    ref = step_nchw(xf, wf, bf)
    got_nhwc = jnp.transpose(
        step_nhwc(jnp.transpose(xf, (0, 2, 3, 1)),
                  jnp.transpose(wf, (2, 3, 1, 0)), bf), (0, 3, 1, 2))
    got_im2col = jnp.transpose(
        step_im2col(jnp.transpose(xf, (0, 2, 3, 1)),
                    jnp.transpose(wf, (1, 2, 3, 0)).reshape(C * K * K, C), bf),
        (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(got_nhwc), np.asarray(ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_im2col), np.asarray(ref), atol=2e-4)
    print("math check OK (all three formulations agree at f32)")

    flops = 2.0 * B * HW * HW * K * K * C * C
    peak = 197e12  # v5e bf16
    rows = [
        ("nchw (production)", partial(_scan, step_nchw), x_nchw, w_oihw),
        ("nhwc", partial(_scan, step_nhwc), x_nhwc, w_hwio),
        ("im2col matmul", partial(_scan, step_im2col), x_nhwc, w_mat),
    ]
    print(f"conv B{B} {C}->{C} @{HW}² 3x3 bf16, scan x{STEPS}, best of 3:")
    for name, fn, x, w in rows:
        dt_s = _time(fn, x, w, bias)
        print(f"  {name:20s} {dt_s*1e3:7.3f} ms/step  "
              f"{flops/dt_s/1e12:6.1f} TFLOP/s  ({flops/dt_s/peak*100:4.1f}% peak)")


if __name__ == "__main__":
    main()
