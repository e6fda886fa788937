"""
Test bootstrap: run everything on a virtual 8-device CPU mesh so sharding
tests exercise real multi-device code paths without TPU hardware
(SURVEY.md §4 — the multi-device test path the reference lacks).
"""

import os
import sys

# Force CPU: the ambient environment may point JAX at a remote TPU (axon),
# which is slow for unit tests and numerically looser than f32 CPU. A
# sitecustomize hook may pre-register the TPU backend, so overriding the env
# var alone is not enough — override via jax.config before backends init.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles dozens of model variants;
# cached XLA executables cut reruns from ~15 min to ~2 min.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
