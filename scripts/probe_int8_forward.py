"""Feasibility probe: flagship forward time with all convs run through an
int8 (W8A8, int32-accumulate) path vs the bf16 baseline.

Monkeypatches fmdm_tpu.ops.conv.conv_nd with a scale-1 int8 cast variant —
numerics are garbage (that's fine); the question is purely whether the
in-context XLA program gets the v5e int8 MXU rate after the cast/dequant
traffic, and by how much. Protocol matches bench.py (scan-amortized engine,
host-readback sync).

Usage: python scripts/probe_int8_forward.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import fmdm_tpu.ops.conv as conv_mod
from fmdm_tpu.ops.conv import _dim_numbers, _normalize

_orig_conv_nd = conv_mod.conv_nd

MIN_HW = 64  # overridden from argv in main()


def conv_nd_int8(x, weight, bias=None, *, stride=1, padding=None, dilation=1, groups=1):
    nd = x.ndim - 2
    kernel = weight.shape[2:]
    # Policy: only quantize convs where the isolated probe shows a win —
    # 3x3-ish kernels at spatial >= MIN_HW with enough input channels.
    spatial_ok = min(x.shape[2:]) >= MIN_HW
    if not (spatial_ok and x.shape[1] >= 64 and max(kernel) > 1):
        return _orig_conv_nd(x, weight, bias, stride=stride, padding=padding,
                             dilation=dilation, groups=groups)
    stride = _normalize(stride, nd)
    dilation = _normalize(dilation, nd)
    if padding is None:
        padding = tuple(k // 2 for k in kernel)
    else:
        padding = _normalize(padding, nd)
    pads = [(p, p) for p in padding]
    xq = jnp.clip(x.astype(jnp.float32) * 16.0, -127, 127).astype(jnp.int8)
    wq = jnp.clip(weight.astype(jnp.float32) * 16.0, -127, 127).astype(jnp.int8)
    out = lax.conv_general_dilated(
        xq, wq, window_strides=stride, padding=pads, rhs_dilation=dilation,
        feature_group_count=groups, dimension_numbers=_dim_numbers(nd),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(x.dtype) * (1.0 / 256.0)
    if bias is not None:
        out = out + bias.astype(out.dtype).reshape((1, -1) + (1,) * nd)
    return out


def timed_run(label):
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.schedulers import DPMSolverMultistepScheduler
    from fmdm_tpu.sample.engine import SamplingEngine
    from __graft_entry__ import FLAGSHIP_UNET

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    scheduler = DPMSolverMultistepScheduler.create(
        num_train_timesteps=1000, algorithm_type="dpmsolver++", solver_order=2,
        beta_start=0.0001, beta_end=0.02,
    )
    timesteps = scheduler.set_timesteps(50)
    engine = SamplingEngine(model, scheduler, timesteps, conditioning_mode="concatenate",
                            compute_dtype=jnp.bfloat16)
    shape = (32, 1, 256, 256)
    cond = jnp.full(shape, 0.5, jnp.float32)
    rng = jax.random.PRNGKey(1)

    def force(x):
        return float(np.asarray(x[0, 0, 0, 0]))

    for i in range(100, 102):
        force(engine(params, shape, jax.random.fold_in(rng, i), conditioning_batch=cond))
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        force(engine(params, shape, jax.random.fold_in(rng, i), conditioning_batch=cond))
        best = min(best, time.perf_counter() - t0)
    steps = 50 * 32 / best
    print(f"{label}: {best:.3f} s/batch  {best/50*1000:.2f} ms/step  {steps:.1f} sample-steps/s")
    return best


def main():
    global MIN_HW
    if len(sys.argv) > 1:
        MIN_HW = int(sys.argv[1])
    print(f"devices: {jax.devices()}  MIN_HW={MIN_HW}")
    t_bf16 = timed_run("bf16 baseline")
    conv_mod.conv_nd = conv_nd_int8
    # rebind in modules that imported the symbol directly
    import fmdm_tpu.nn.layers as layers_mod
    import fmdm_tpu.ops as ops_mod
    for m in (layers_mod, ops_mod):
        if hasattr(m, "conv_nd"):
            m.conv_nd = conv_nd_int8
    t_i8 = timed_run("int8 convs   ")
    print(f"speedup {t_bf16 / t_i8:.3f}x")


if __name__ == "__main__":
    main()
