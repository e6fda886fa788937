"""
Model summary (parity with the reference's torchinfo-or-fallback summary,
training_utils.py:112-186): a per-module TREE of parameter counts — module
path, leaf tensor shapes, and per-subtree totals — printed at train start
unless training.show_model_summary is false. Depth is configurable via
training.summary_depth (default 3; <=0 means full depth), mirroring
torchinfo's `depth` argument; the reference's named-module fallback printed
one line per module, which the full-depth mode reproduces.
"""

from __future__ import annotations

import logging
from typing import Dict, List

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


def _leaf_shapes(tree) -> str:
    """Compact 'w (128,2,3,3), b (128,)' description of a module's own leaf
    tensors (non-dict children)."""
    parts = []
    for key, value in tree.items():
        if not isinstance(value, dict):
            parts.append(f"{key} {tuple(np.shape(value))}")
    return ", ".join(parts)


def _tree_lines(tree: Dict, prefix: str, depth: int, max_depth: int, lines: List[str]) -> None:
    keys = sorted(tree.keys(), key=lambda k: (not isinstance(tree[k], dict), k))
    dict_keys = [k for k in keys if isinstance(tree[k], dict)]
    for idx, key in enumerate(dict_keys):
        sub = tree[key]
        last = idx == len(dict_keys) - 1
        branch = "└─" if last else "├─"
        label = f"{prefix}{branch} {key}"
        total = _count(sub)
        if max_depth > 0 and depth >= max_depth:
            lines.append(f"{label:<52} {_fmt(total):>10}")
            continue
        shapes = _leaf_shapes(sub)
        detail = f"  [{shapes}]" if shapes and not any(
            isinstance(v, dict) for v in sub.values()) else ""
        lines.append(f"{label:<52} {_fmt(total):>10}{detail}")
        _tree_lines(sub, prefix + ("   " if last else "│  "), depth + 1, max_depth, lines)


def summarize_model(params: Params, model_cfg: Dict, training_cfg: Dict, name: str = "model") -> int:
    show = training_cfg.get("show_model_summary", True)
    total = _count(params)
    if not show:
        return total
    max_depth = int(training_cfg.get("summary_depth", 3))
    lines = [f"{name} parameter summary (depth {'full' if max_depth <= 0 else max_depth}):",
             f"{name:<55} {_fmt(total):>10}"]
    _tree_lines(params, "", 1, max_depth, lines)
    lines.append(f"{'TOTAL':<55} {_fmt(total):>10} ({total:,})")
    text = "\n".join(lines)
    logging.info("%s", text)
    print(text, flush=True)
    return total
