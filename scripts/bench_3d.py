"""3D EfficientUNetND on-chip benchmark (VERDICT r2 item 4 — the unserved
BASELINE configs[4] leg: windowed-LDCT 3D volumes on TPU).

Measures, on the real chip:
  - training steps/s and samples/s, remat off vs on, with compiled HBM
    (memory_analysis) for each;
  - 50-step DPM++ sampling throughput with the Pallas flash-attention path
    (engaged automatically at >=1024 tokens in the 3D middle block) vs the
    XLA softmax chain (set_sdpa_backend('xla')).

Shapes: window 8 x 128² volumes, channel_mult (1,2,4) => middle block at
(2, 32, 32) = 2048 flattened tokens — the first on-workload validation of the
flash kernel's >=1024-token claim (BENCHMARKS.md attention table).

Usage: python scripts/bench_3d.py [train_batch] [sample_batch]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

UNET_3D = {
    "unet_impl": "efficient_nd",
    "spatial_dims": 3,
    "in_channels": 1,
    "out_channels": 1,
    "model_channels": 64,
    "num_res_blocks": 2,
    "channel_mult": [1, 2, 4],
    "attention_resolutions": [4],
    "num_heads": 8,
    "dim_head": 32,
    "use_scale_shift_norm": True,
}
SHAPE_SP = (8, 128, 128)  # (D, H, W) — window_size 8 of 128² slices


def build(conditioning="concatenate"):
    from fmdm_tpu.models.factories import DiffusionUNetFactory

    model = DiffusionUNetFactory().build(UNET_3D, conditioning=conditioning, channels=1)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    return model, params


def hbm_of(compiled) -> float:
    try:
        m = compiled.memory_analysis()
        return round((m.temp_size_in_bytes + m.argument_size_in_bytes
                      + m.output_size_in_bytes) / 2**30, 2)
    except Exception:
        return float("nan")


def bench_train(batch: int, remat: bool):
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

    model, params = build()
    scheduler = DDPMScheduler.create(num_train_timesteps=1000)
    optimizer, _ = make_adamw(1e-4, 0.0, 100, 10_000)
    opt_state = jax.device_put(optimizer.init(params))
    step = make_denoise_train_step(
        model, scheduler, optimizer, variant="diffusion",
        conditioning_mode="concatenate", latent_norm=None,
        grad_accum=1, compute_dtype=jnp.bfloat16, mesh=None, remat=remat)
    shape = (batch, 1, *SHAPE_SP)
    bd = {"target": jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32),
          "image": jnp.full(shape, 0.25, jnp.float32),
          "valid": jnp.ones((batch,), jnp.float32)}
    t0 = time.perf_counter()
    try:
        compiled = step.lower(params, opt_state, bd, jax.random.PRNGKey(1)).compile()
    except Exception as e:
        return {"error": f"{type(e).__name__}", "batch": batch, "remat": remat}
    compile_s = time.perf_counter() - t0
    for i in range(2):
        params, opt_state, ls, ct = compiled(params, opt_state, bd,
                                             jax.random.fold_in(jax.random.PRNGKey(1), i))
    float(np.asarray(ls))
    losses = []
    t0 = time.perf_counter()
    iters = 8
    for i in range(iters):
        params, opt_state, ls, ct = compiled(params, opt_state, bd,
                                             jax.random.fold_in(jax.random.PRNGKey(1), 10 + i))
        losses.append(ls)
    [float(np.asarray(l)) for l in losses]
    dt = (time.perf_counter() - t0) / iters
    return {"batch": batch, "remat": remat, "ms_per_step": round(dt * 1e3, 1),
            "samples_per_s": round(batch / dt, 2), "hbm_gib": hbm_of(compiled),
            "compile_s": round(compile_s, 0)}


def bench_sample(batch: int, backend: str):
    from fmdm_tpu.ops.attention import set_sdpa_backend
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DPMSolverMultistepScheduler

    set_sdpa_backend(backend)
    try:
        model, params = build()
        sched = DPMSolverMultistepScheduler.create()
        ts = sched.set_timesteps(50)
        engine = SamplingEngine(model, sched, ts, conditioning_mode="concatenate",
                                compute_dtype=jnp.bfloat16)
        shape = (batch, 1, *SHAPE_SP)
        cond = jnp.full(shape, 0.5, jnp.float32)

        def run(i):
            out = engine(params, shape, jax.random.fold_in(jax.random.PRNGKey(2), i),
                         conditioning_batch=cond)
            return float(np.asarray(out[0, 0, 0, 0, 0]))

        run(0); run(1)
        t0 = time.perf_counter()
        run(2)
        dt = time.perf_counter() - t0
        return {"batch": batch, "attention": backend,
                "sample_steps_per_s_chip": round(batch * 50 / dt, 1),
                "samples_per_s": round(batch / dt, 3),
                "s_per_volume": round(dt / batch, 3)}
    finally:
        set_sdpa_backend("pallas")


def main():
    train_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sample_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {"config": UNET_3D, "spatial": SHAPE_SP, "results": []}
    for remat in (False, True):
        r = bench_train(train_batch, remat)
        print("train:", json.dumps(r), flush=True)
        out["results"].append({"kind": "train", **r})
    for backend in ("pallas", "xla"):
        r = bench_sample(sample_batch, backend)
        print("sample:", json.dumps(r), flush=True)
        out["results"].append({"kind": "sample", **r})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
