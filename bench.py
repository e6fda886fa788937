"""
Benchmark: the BASELINE.json north-star metric — denoise steps/sec/chip for a
50-step DPM-Solver++ reverse process on the flagship 256² LDCT UNet
(configs/LDCT/LDCT_ddpm_diffusers_nd.json architecture, concatenate
conditioning), run on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
``vs_baseline`` normalizes against an ESTIMATED CUDA denominator — the
reference publishes no numbers and no CUDA hardware exists here, so
BENCHMARKS.md ("CUDA-baseline denominator") constructs one from the flagship's
measured FLOP cost (493 GFLOP/sample-step), A100 TF32 peak, a 25% eager-mode
utilization estimate, and the v5e/A100 compute-capacity ratio: ~50
sample-steps/s per v5e-equivalent. ``vs_baseline_basis: "estimated"`` marks it.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp

# Persistent compilation cache: the flagship program takes minutes to compile
# through the remote-compile tunnel; cached executables make re-benchmarks fast.
try:
    jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main() -> None:
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.schedulers import DPMSolverMultistepScheduler
    from fmdm_tpu.sample.engine import SamplingEngine
    from __graft_entry__ import FLAGSHIP_UNET

    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 32  # throughput sweet spot (BENCHMARKS.md)
    dtype_name = sys.argv[2] if len(sys.argv) > 2 else "bf16"
    # "int8" = post-training W8A8 quantized inference (ops/quant.py): eligible
    # convs on the 2x-rate int8 MXU, everything else bf16. Opt-in variant; the
    # driver metric of record stays exact bf16.
    compute_dtype = jnp.bfloat16 if dtype_name in ("bf16", "int8", "int8+linear") else None
    # Optional third arg: DeepCache spec "INTERVAL[:DEPTH[:SCHEDULE]]" (same
    # grammar as run_model --deep_cache) to bench serving-mode compositions
    # like `bench.py 32 int8 2:1:adaptive`. Omitted = exact sampling.
    deep_cache = None
    if len(sys.argv) > 3:
        from fmdm_tpu.run_model import _parse_deep_cache

        deep_cache = _parse_deep_cache(sys.argv[3])
    num_steps = 50

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = model.init(jax.random.PRNGKey(0))
    if dtype_name in ("int8", "int8+linear"):
        from fmdm_tpu.utils.quantize import quantize_model_params

        calib_x = jnp.concatenate(
            [jax.random.normal(jax.random.PRNGKey(2), (2, 1, 256, 256)),
             jnp.full((2, 1, 256, 256), 0.5)], axis=1)
        params = quantize_model_params(
            lambda p, x, t: model(p, x, t),
            params,
            [(calib_x, jnp.full((2,), t, jnp.int32)) for t in (999, 500, 0)],
            quantize_linear=(dtype_name == "int8+linear"),
        )
    params = jax.device_put(params)

    scheduler = DPMSolverMultistepScheduler.create(
        num_train_timesteps=1000, algorithm_type="dpmsolver++", solver_order=2,
        beta_start=0.0001, beta_end=0.02,
    )
    timesteps = scheduler.set_timesteps(num_steps)
    engine = SamplingEngine(model, scheduler, timesteps, conditioning_mode="concatenate",
                            compute_dtype=compute_dtype, deep_cache=deep_cache)

    shape = (batch_size, 1, 256, 256)
    cond = jnp.full(shape, 0.5, jnp.float32)
    rng = jax.random.PRNGKey(1)

    import numpy as np

    def force(x):
        # host readback — reliable sync through the remote-TPU tunnel, where
        # block_until_ready alone can be a no-op (BENCHMARKS.md pitfalls)
        return float(np.asarray(x[0, 0, 0, 0]))

    # Warmup: compile + 2 full executions (first executions after an idle
    # period run ~30% slow on this setup; see BENCHMARKS.md pitfalls)
    for i in range(100, 102):
        force(engine(params, shape, jax.random.fold_in(rng, i), conditioning_batch=cond))

    # Best-of-3 timed windows (inputs varied to defeat remote result caching)
    iters = 3
    best = float("inf")
    for i in range(iters):
        t0 = time.perf_counter()
        force(engine(params, shape, jax.random.fold_in(rng, i), conditioning_batch=cond))
        best = min(best, time.perf_counter() - t0)
    elapsed = best
    iters = 1

    # Batch-independent headline: (sample x solver-step) units per second per
    # chip — i.e. how many single-sample denoise steps of work the chip
    # retires each second. samples/s = value / num_steps regardless of batch.
    samples_per_sec = iters * batch_size / elapsed
    steps_per_sec = samples_per_sec * num_steps

    print(json.dumps({
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        # estimated CUDA denominator: 50 sample-steps/s v5e-capacity-equivalent
        # (BENCHMARKS.md "CUDA-baseline denominator"; 25% eager util on A100
        # TF32 scaled by 197/312 peak ratio). An estimate, not a measurement —
        # the honest claim is the INTERVAL in vs_baseline_range (README
        # "Benchmarks"); this midpoint is the 25%-central point of it.
        "vs_baseline": round(steps_per_sec / 50.0, 2),
        "vs_baseline_basis": ("estimated 25%-util central point; the claim is the "
                              "interval vs_baseline_range (BENCHMARKS.md sensitivity)"),
        # denominator sensitivity at 40%/15% assumed CUDA eager utilization
        # (BENCHMARKS.md "Sensitivity of the >=5x claim")
        "vs_baseline_range": [round(steps_per_sec / 79.9, 2), round(steps_per_sec / 30.0, 2)],
        "samples_per_sec": round(samples_per_sec, 3),
        "batch_size": batch_size,
        "num_inference_steps": num_steps,
        "scheduler": "dpmsolver++(order2)",
        "compute_dtype": dtype_name,
        "deep_cache": None if deep_cache is None else ":".join(map(str, deep_cache)),
        "resolution": 256,
        "seconds_per_sample": round(elapsed / (iters * batch_size), 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
