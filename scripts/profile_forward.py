"""Op-level profile harness for the flagship FORWARD (the BENCHMARKS.md
"op-level profile of the flagship forward" protocol, now a checked-in script).

Builds the flagship 256² UNet forward at the bench configuration (bf16
compute, concatenate conditioning => 2 input channels, batch 32), dumps its
optimized HLO, and traces `iters` executions on the chip.

Usage:  python scripts/profile_forward.py [batch] [iters]
Then:   python scripts/attribute_profile.py /tmp/trace_fwd /tmp/fwd_hlo.txt
(attribute_profile divides durations by 3 runs by default — pass iters=3.)
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
    from __graft_entry__ import FLAGSHIP_UNET

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    model = DiffusionUNetFactory().build(FLAGSHIP_UNET, conditioning="concatenate", channels=1)
    params = jax.device_put(model.init(jax.random.PRNGKey(0)))
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    @jax.jit
    def forward(params, x, t):
        return model(params, x, t)

    x = jnp.asarray(np.random.RandomState(0).rand(batch, 2, 256, 256), jnp.bfloat16)
    t = jnp.full((batch,), 500, jnp.int32)

    lowered = forward.lower(params, x, t)
    compiled = lowered.compile()
    Path("/tmp/fwd_hlo.txt").write_text(compiled.as_text())
    print("HLO dumped to /tmp/fwd_hlo.txt")

    def run():
        return compiled(params, x, t).block_until_ready()

    run(); run()
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    print(f"forward: {dt*1e3:.1f} ms -> {batch/dt:.1f} samples/s (batch {batch})")

    import shutil
    shutil.rmtree("/tmp/trace_fwd", ignore_errors=True)  # stale sessions skew attribution
    with jax.profiler.trace("/tmp/trace_fwd"):
        for _ in range(iters):
            run()
    print("trace written to /tmp/trace_fwd; attribute with:")
    print("  python scripts/attribute_profile.py /tmp/trace_fwd /tmp/fwd_hlo.txt")


if __name__ == "__main__":
    main()
