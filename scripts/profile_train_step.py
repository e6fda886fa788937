"""Op-level attribution of the flagship TRAINING step (VERDICT r2 item 3:
the forward got a profile; backward/optimizer did not).

Builds the production jitted denoise train step (flagship 256² UNet,
concatenate conditioning, bf16 compute, batch 16 — the BENCHMARKS.md training
configuration), dumps its optimized HLO, traces N executions on the TPU, and
joins durations with HLO metadata via scripts/attribute_profile.py machinery.

Usage:  python scripts/profile_train_step.py [batch] [iters]
Then:   python scripts/attribute_profile.py /tmp/trace_train /tmp/train_hlo.txt
(attribute_profile divides by 3 runs by default — pass iters=3.)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(REPO_ROOT / ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from fmdm_tpu.models.factories import DiffusionUNetFactory
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step
    from __graft_entry__ import FLAGSHIP_UNET

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    scheduler = DDPMScheduler.create(num_train_timesteps=1000)
    optimizer, _ = make_adamw(1e-4, 0.0, 500, 10_000)
    opt_state = jax.device_put(optimizer.init(params))
    step = make_denoise_train_step(
        model, scheduler, optimizer, variant="diffusion",
        conditioning_mode="concatenate", latent_norm=None,
        grad_accum=1, compute_dtype=jnp.bfloat16, mesh=None)

    shape = (batch, 1, 256, 256)
    batch_data = {
        "target": jnp.asarray(np.random.RandomState(0).rand(*shape), jnp.float32),
        "image": jnp.full(shape, 0.25, jnp.float32),
        "valid": jnp.ones((batch,), jnp.float32),
    }

    lowered = step.lower(params, opt_state, batch_data, jax.random.PRNGKey(1))
    compiled = lowered.compile()
    Path("/tmp/train_hlo.txt").write_text(compiled.as_text())
    print("HLO dumped to /tmp/train_hlo.txt")

    def run(i):
        nonlocal params, opt_state
        params, opt_state, loss_sum, count = compiled(
            params, opt_state, batch_data, jax.random.fold_in(jax.random.PRNGKey(1), i))
        return float(np.asarray(loss_sum))

    for i in range(2):
        run(i)
    t0 = time.perf_counter()
    for i in range(2, 2 + iters):
        run(i)
    dt = (time.perf_counter() - t0) / iters
    print(f"train step: {dt*1e3:.1f} ms -> {batch/dt:.1f} samples/s (batch {batch})")

    import shutil
    shutil.rmtree("/tmp/trace_train", ignore_errors=True)  # stale sessions skew attribution
    with jax.profiler.trace("/tmp/trace_train"):
        for i in range(10, 10 + iters):
            run(i)
    print("trace written to /tmp/trace_train; attribute with:")
    print("  python scripts/attribute_profile.py /tmp/trace_train /tmp/train_hlo.txt")


if __name__ == "__main__":
    main()
