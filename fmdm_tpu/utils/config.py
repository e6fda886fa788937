"""
Config IO, run-dir allocation, seeding, batch-size helpers.

Behavioral parity with /root/reference/src/utils/training_utils.py:39-109
(load_json_config injects __config_path__, allocate_run_dir picks _runN,
resolve_batch_size honors train_*/plain aliases).
"""

from __future__ import annotations

import json
import random
import re
from pathlib import Path
from typing import Optional

import numpy as np


def load_json_config(path) -> dict:
    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(f"Config not found: {path}")
    with path.open("r") as fh:
        cfg = json.load(fh)
    if isinstance(cfg, dict):
        cfg["__config_path__"] = str(path)
    return cfg


def save_json_config(path, cfg: dict) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as fh:
        json.dump(cfg, fh, indent=2)


def allocate_run_dir(base) -> Path:
    """checkpoints/mnist -> checkpoints/mnist_run1, _run2, ... (training_utils.py:57-74)."""
    base = Path(base)
    parent = base.parent
    stem = base.name
    parent.mkdir(parents=True, exist_ok=True)
    pattern = re.compile(rf"^{re.escape(stem)}_run(\d+)$")
    existing = []
    for entry in parent.iterdir():
        if entry.is_dir():
            m = pattern.match(entry.name)
            if m:
                existing.append(int(m.group(1)))
    next_id = (max(existing) + 1) if existing else 1
    return parent / f"{stem}_run{next_id}"


def set_seed(seed: Optional[int]) -> None:
    """Seed python/numpy (JAX randomness is explicit-key based; trainers derive
    their root key from this seed)."""
    if seed is None:
        return
    random.seed(seed)
    np.random.seed(seed)


def resolve_batch_size(training_cfg: dict, key: str, fallback: int) -> int:
    alt = key.replace("train_", "") if key.startswith("train_") else key
    value = training_cfg.get(key)
    if value is None:
        value = training_cfg.get(alt, fallback)
    return int(value)


def resolve_string_none(value):
    """Normalize the permissive string "None" convention (vaefactory.py:41-46)."""
    if isinstance(value, str) and value.lower() == "none":
        return None
    return value
