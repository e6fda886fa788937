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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
