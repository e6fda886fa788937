"""
Test harness (parity with the reference run_tests.py:27-113): import-smokes
every module under fmdm_tpu/, runs any module-level ``run_self_tests`` hooks,
then shells out to pytest. Import failures are reported as skips, not fatals.
"""

from __future__ import annotations

import importlib
import pkgutil
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def iter_modules() -> list[str]:
    import fmdm_tpu

    names = ["fmdm_tpu"]
    for mod in pkgutil.walk_packages(fmdm_tpu.__path__, prefix="fmdm_tpu."):
        names.append(mod.name)
    return names


def main() -> int:
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

    failures = 0
    skipped = []
    ran_hooks = 0
    for name in iter_modules():
        try:
            module = importlib.import_module(name)
        except Exception as exc:  # degrade gracefully like the reference
            skipped.append((name, repr(exc)))
            continue
        hook = getattr(module, "run_self_tests", None)
        if callable(hook):
            try:
                hook()
                ran_hooks += 1
                print(f"[self-test] {name}: OK")
            except Exception as exc:
                failures += 1
                print(f"[self-test] {name}: FAILED ({exc!r})")

    print(f"Imported {len(iter_modules())} modules, {len(skipped)} skipped, "
          f"{ran_hooks} self-test hooks ran, {failures} failed.")
    for name, err in skipped:
        print(f"  skipped {name}: {err}")

    result = subprocess.run([sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO_ROOT)
    return 1 if (failures or result.returncode) else 0


if __name__ == "__main__":
    raise SystemExit(main())
