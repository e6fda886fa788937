"""
Model summary (parity with the reference's torchinfo-or-fallback summary,
training_utils.py:112-186): per-top-level-module parameter counts + totals,
printed at train start unless training.show_model_summary is false.
"""

from __future__ import annotations

import logging
from typing import Dict

import numpy as np

from fmdm_tpu.nn.module import Params


def _fmt(count: int) -> str:
    if count >= 1e9:
        return f"{count / 1e9:.2f}B"
    if count >= 1e6:
        return f"{count / 1e6:.2f}M"
    if count >= 1e3:
        return f"{count / 1e3:.2f}K"
    return str(count)


def _count(tree) -> int:
    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return int(np.prod(np.shape(tree)))


def summarize_model(params: Params, model_cfg: Dict, training_cfg: Dict, name: str = "model") -> int:
    show = training_cfg.get("show_model_summary", True)
    total = _count(params)
    if not show:
        return total
    lines = [f"{name} parameter summary:"]
    for key in sorted(params.keys()):
        lines.append(f"  {key:<24} {_fmt(_count(params[key])):>10}")
    lines.append(f"  {'TOTAL':<24} {_fmt(total):>10} ({total:,})")
    text = "\n".join(lines)
    logging.info("%s", text)
    print(text, flush=True)
    return total
