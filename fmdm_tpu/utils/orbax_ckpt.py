"""
Orbax checkpoint backend.

Alternative to the torch-interop container in ``utils/checkpoint.py`` — same
payload contract ({model, optimizer, epoch, best_metric, ...}, reference
training_utils.py:198-202) and the same run-dir layout (``diff_last.pt`` etc.),
but each checkpoint is an Orbax PyTree directory instead of a torch.save file.
Select with ``training.checkpoint_backend: "orbax"`` in the train config;
``load_checkpoint`` auto-detects the format (directory == orbax), so sampling,
eval and resume work identically across backends and a run can even mix them.

Why Orbax on TPU: tensor-parallel-sharded params can be saved without a host
gather (Orbax handles per-shard IO via TensorStore), and the OCDBT layout
amortizes many-small-leaf trees. The torch backend remains the default because
it is what the reference's tooling reads.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from fmdm_tpu.nn.module import flatten_params, unflatten_params
from fmdm_tpu.utils.checkpoint import numpy_map_to_tree, tree_to_numpy_map

_SCALARS = "__scalars__"  # non-array payload entries, stored as 0-d arrays


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(state: Dict[str, Any], path) -> None:
    """Write ``state`` as an Orbax PyTree directory at ``path``.

    Same semantics as checkpoint.save_checkpoint: ``model`` is flattened to
    torch state_dict names, optimizer-like subtrees go through
    tree_to_numpy_map, and python scalars are boxed as 0-d arrays.
    """
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    payload: Dict[str, Any] = {_SCALARS: {}}
    for key, value in state.items():
        if key == "model" and isinstance(value, dict):
            payload["model"] = {k: np.asarray(v) for k, v in flatten_params(value).items()}
        elif key in ("optimizer", "disc_optimizer", "lr_scheduler", "scaler", "extra_state") and value is not None:
            payload[key] = tree_to_numpy_map(value)
        elif isinstance(value, (int, float, bool, str)) or value is None:
            payload[_SCALARS][key] = np.frombuffer(repr(value).encode(), dtype=np.uint8).copy()
        else:
            payload[key] = np.asarray(value)
    if not payload[_SCALARS]:
        del payload[_SCALARS]
    import orbax.checkpoint as ocp

    # Orbax refuses to overwrite; stage to a sibling then swap like the torch
    # backend's .tmp dance so "last" updates are atomic-ish.
    tmp = path.with_name(path.name + ".orbax_tmp")
    if tmp.exists():
        import shutil

        shutil.rmtree(tmp)
    _checkpointer().save(tmp, payload)
    if path.exists():
        import shutil

        shutil.rmtree(path) if path.is_dir() else path.unlink()
    tmp.replace(path)


def load_checkpoint(path) -> Dict[str, Any]:
    """Inverse of save_checkpoint — returns the payload with ``model`` as a
    nested param dict, matching checkpoint.load_checkpoint's contract."""
    import ast

    path = Path(path).absolute()
    payload = _checkpointer().restore(path)
    out: Dict[str, Any] = {}
    for key, value in payload.items():
        if key == _SCALARS:
            for name, buf in value.items():
                out[name] = ast.literal_eval(bytes(np.asarray(buf)).decode())
        elif key == "model" and isinstance(value, dict):
            out["model"] = unflatten_params({k: np.asarray(v) for k, v in value.items()})
        elif isinstance(value, dict) and "__treedef__" in value:
            out[key] = numpy_map_to_tree(value)
        else:
            out[key] = value
    return out


def is_orbax_checkpoint(path) -> bool:
    """An orbax checkpoint is a directory (torch/pickle ones are files)."""
    return Path(path).is_dir()
