"""
DeepCache speed/quality datapoints.

Speed: flagship 256² LDCT UNet, 50-step DPM++ (same protocol as bench.py)
with engine deep_cache=(interval, depth) variants.
Quality: PSNR of cached vs exact sampling on a trained checkpoint is
measured separately through run_model/evaluate (BENCHMARKS.md).

Usage: python scripts/bench_deepcache.py [interval] [depth] [batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO.parent / ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main() -> None:
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.schedulers import DPMSolverMultistepScheduler
    from fmdm_tpu.sample.engine import SamplingEngine
    from __graft_entry__ import FLAGSHIP_UNET

    interval = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    num_steps = 50

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    scheduler = DPMSolverMultistepScheduler.create(
        num_train_timesteps=1000, algorithm_type="dpmsolver++", solver_order=2,
        beta_start=0.0001, beta_end=0.02)
    timesteps = scheduler.set_timesteps(num_steps)
    engine = SamplingEngine(model, scheduler, timesteps, conditioning_mode="concatenate",
                            compute_dtype=jnp.bfloat16,
                            deep_cache=(interval, depth) if interval > 1 else None)
    shape = (batch, 1, 256, 256)
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
    sps = batch / best
    print(json.dumps({
        "deep_cache_interval": interval, "depth": depth, "batch": batch,
        "samples_per_sec": round(sps, 3),
        "denoise_steps_per_sec_per_chip": round(sps * num_steps, 1),
        "seconds_per_sample": round(best / batch, 4),
    }))


if __name__ == "__main__":
    main()
