"""
Persistent XLA compilation cache for CLI entrypoints.

Programs like the 50-step sampling scan take minutes to compile through the
remote-compile tunnel; caching executables on disk makes repeated
train.py/run_model.py invocations start in seconds. Opt out with
FMDM_NO_COMPILE_CACHE=1 or relocate with FMDM_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_compile_cache() -> None:
    if os.environ.get("FMDM_NO_COMPILE_CACHE") == "1":
        return
    import jax

    cache_dir = os.environ.get(
        "FMDM_COMPILE_CACHE_DIR",
        str(Path.home() / ".cache" / "fmdm_tpu" / "xla"),
    )
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
