"""Thin launcher for the run_model dispatcher (reference run_model.py:1-18)."""

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from fmdm_tpu.run_model import main

if __name__ == "__main__":
    main()
