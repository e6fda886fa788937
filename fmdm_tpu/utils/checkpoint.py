"""
Checkpointing with the reference's layout contract *and* torch interop.

Layout parity (/root/reference SURVEY.md §5.4): run dirs contain
``{vae|diff|flow}_last.pt``, ``{vae|diff|flow}_best.pt``,
``epochs/epochXXXX/epoch.pt``; payload keys ``{model, optimizer, lr_scheduler,
scaler, epoch, best_metric}`` (training_utils.py:198-202).

Interop: because our parameter trees use torch ``state_dict`` names AND torch
tensor layouts (OIHW conv kernels, (out,in) linear weights — see nn/module.py),
``model`` is saved as a genuine torch state_dict via ``torch.save`` when torch
is importable. Reference checkpoints load directly and vice versa. Optimizer
state (optax pytree) is stored as a flattened numpy mapping under
``optimizer``. Without torch the same payload is written as ``.npz`` with the
identical filename.
"""

from __future__ import annotations

import io
import os
import pickle
import shutil
import tempfile
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from fmdm_tpu.nn.module import flatten_params, unflatten_params

try:
    import torch
except Exception:  # pragma: no cover - torch is baked into this image
    torch = None


# ---------------------------------------------------------------------------
# Optax-state <-> numpy mapping
# ---------------------------------------------------------------------------

def tree_to_numpy_map(tree) -> Dict[str, np.ndarray]:
    """Flatten an arbitrary pytree to {json_keypath: ndarray} (restorable)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    out = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    out["__treedef__"] = np.frombuffer(pickle.dumps(treedef), dtype=np.uint8)
    return out


def numpy_map_to_tree(mapping: Dict[str, np.ndarray]):
    treedef = pickle.loads(bytes(np.asarray(mapping["__treedef__"])))
    leaves = [np.asarray(mapping[f"leaf_{i}"]) for i in range(len(mapping) - 1)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------

# "torch" (default, reference-interop) or "orbax" (utils/orbax_ckpt.py), each
# with an "_async" variant that hands serialization + IO to a single
# background writer thread (zero-stall saves on long runs: the training loop
# only snapshots array references — JAX arrays are immutable, so the writer
# serializes a consistent state while training continues). Trainers set this
# from ``training.checkpoint_backend``.
_BACKEND = "torch"
_ASYNC = False
_WRITER = None
_PENDING: list = []


def set_checkpoint_backend(name: str) -> None:
    global _BACKEND, _ASYNC
    base, _, suffix = str(name).partition("_")
    if base not in ("torch", "orbax") or suffix not in ("", "async"):
        raise ValueError(f"Unknown checkpoint backend '{name}'")
    _BACKEND = base
    _ASYNC = suffix == "async"


def get_checkpoint_backend() -> str:
    return _BACKEND + ("_async" if _ASYNC else "")


def _writer():
    global _WRITER
    if _WRITER is None:
        import atexit
        from concurrent.futures import ThreadPoolExecutor

        _WRITER = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt-write")
        atexit.register(flush_checkpoint_writes)
    return _WRITER


def flush_checkpoint_writes() -> None:
    """Block until all pending async checkpoint saves have landed; re-raise
    the first writer error (a silently dropped checkpoint must not look like
    a successful save)."""
    global _PENDING
    pending, _PENDING = _PENDING, []
    for future in pending:
        future.result()


def save_checkpoint(state: Dict[str, Any], path, backend: Optional[str] = None) -> None:
    """state: {"model": params pytree, "optimizer": optax state | None,
    "epoch": int, "best_metric": float, ...}.

    The torch payload is built as a ZERO-COPY view of the caller's arrays
    (copying ~1.7 GB of flagship state measured ~80 s on this box). Under the
    ``*_async`` backends serialization happens later on the writer thread, so
    callers MUST NOT mutate ``state``'s leaves between enqueue and
    ``flush_checkpoint_writes()`` — pass freshly gathered host arrays (as
    ``mesh.to_host`` does each epoch), never a buffer you will update in
    place (ADVICE r3)."""
    backend = backend or get_checkpoint_backend()
    base, _, suffix = backend.partition("_")
    if suffix == "async":
        _PENDING.append(_writer().submit(save_checkpoint, state, path, base))
        return
    if base == "orbax":
        from fmdm_tpu.utils import orbax_ckpt

        orbax_ckpt.save_checkpoint(state, path)
        return
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload: Dict[str, Any] = {}
    for key, value in state.items():
        if key == "model" and isinstance(value, dict):
            flat = flatten_params(value)
            if torch is not None:
                # zero-copy view: the host arrays come from to_host (owned,
                # never mutated before the write below); copying 1.7 GB of
                # flagship state measured ~80 s on this box's memory bus.
                # Some leaves view read-only jax buffers — torch warns about
                # non-writable sources, but this payload is write-only.
                import warnings

                with warnings.catch_warnings():
                    warnings.filterwarnings("ignore", message=".*not writable.*")
                    payload["model"] = {
                        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                        for k, v in flat.items()
                    }
            else:
                payload["model"] = {k: np.asarray(v) for k, v in flat.items()}
        elif key in ("optimizer", "disc_optimizer", "lr_scheduler", "scaler", "extra_state") and value is not None:
            payload[key] = tree_to_numpy_map(value)
        else:
            payload[key] = value
    # Unique temp name per writer: a fixed '<name>.tmp' would race under
    # concurrent savers (multi-host or overlapping runs) — the same shared-tmp
    # hazard the tensor cache fixed in commit 6a76f77.
    fd, tmp_name = tempfile.mkstemp(
        prefix=path.name + ".", suffix=".tmp", dir=str(path.parent)
    )
    tmp = Path(tmp_name)
    try:
        if torch is not None:
            with os.fdopen(fd, "wb") as fh:
                torch.save(payload, fh)
        else:
            with os.fdopen(fd, "wb") as fh:
                pickle.dump(payload, fh)
        tmp.replace(path)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def clone_checkpoint(src, dst, backend: Optional[str] = None) -> None:
    """Duplicate an already-written checkpoint file without re-serializing.

    The trainers write identical payloads to last/best/epoch paths when the
    epoch improves; re-serializing 1.7 GB of flagship state costs minutes on
    a slow disk where a hardlink is free. Atomic like save_checkpoint:
    link (or copy, cross-device) to a unique temp name, then rename. Safe
    with later atomic overwrites of ``src`` — replace() swaps the inode, the
    clone keeps the old one. Under an async backend the clone is enqueued on
    the same single writer thread, so it observes the completed src write.
    """
    backend = backend or get_checkpoint_backend()
    base, _, suffix = backend.partition("_")
    if suffix == "async":
        _PENDING.append(_writer().submit(clone_checkpoint, src, dst, base))
        return
    src, dst = Path(src), Path(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp_name = tempfile.mkstemp(prefix=dst.name + ".", suffix=".tmp", dir=str(dst.parent))
    os.close(fd)
    tmp = Path(tmp_name)
    try:
        tmp.unlink()  # os.link needs the target path free
        try:
            os.link(src, tmp)
        except OSError:
            shutil.copyfile(src, tmp)
        tmp.replace(dst)
    except BaseException:
        tmp.unlink(missing_ok=True)
        raise


def save_checkpoint_with_mirrors(
    state: Dict[str, Any], primary, mirrors=(), backend: Optional[str] = None
) -> None:
    """Serialize ``state`` once to ``primary``, then hardlink-clone the file
    to each mirror path (last → best/epoch dedup). Orbax checkpoints are
    directories, so the orbax backend falls back to independent saves.

    Async backends enqueue save+clones as ONE writer task: if the save
    raises, the clones never run — otherwise a failed save would leave the
    previous epoch's surviving primary hardlinked under this epoch's
    best/epoch names."""
    backend = backend or get_checkpoint_backend()
    base, _, suffix = backend.partition("_")
    if suffix == "async":
        _PENDING.append(_writer().submit(
            save_checkpoint_with_mirrors, state, primary, tuple(mirrors), base))
        return
    save_checkpoint(state, primary, base)
    for mirror in mirrors:
        if base == "orbax":
            save_checkpoint(state, mirror, base)
        else:
            clone_checkpoint(primary, mirror, base)


def load_checkpoint(path) -> Dict[str, Any]:
    """Load a checkpoint saved by us or by the torch reference. Returns the
    payload with ``model`` as a nested JAX-style param dict."""
    path = Path(path)
    if path.is_dir():  # orbax checkpoints are directories; format auto-detect
        from fmdm_tpu.utils import orbax_ckpt

        return orbax_ckpt.load_checkpoint(path)
    payload = None
    if torch is not None:
        try:
            payload = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            payload = None
    if payload is None:
        with path.open("rb") as fh:
            payload = pickle.load(fh)

    out: Dict[str, Any] = {}
    for key, value in payload.items():
        if key == "model" and isinstance(value, dict):
            flat = {}
            for name, tensor in value.items():
                if torch is not None and isinstance(tensor, torch.Tensor):
                    flat[name] = np.asarray(tensor.detach().cpu().numpy())
                else:
                    flat[name] = np.asarray(tensor)
            out["model"] = unflatten_params(flat)
        elif isinstance(value, dict) and "__treedef__" in value:
            out[key] = numpy_map_to_tree(value)
        else:
            out[key] = value
    return out


def load_model_params(path, expected: Optional[dict] = None) -> dict:
    """Load just model params from a checkpoint (payload['model'] or a bare
    state_dict), optionally validating shapes against ``expected``."""
    payload = load_checkpoint(path)
    params = payload.get("model")
    if params is None:
        # bare state_dict file
        flat = {
            k: np.asarray(v.detach().cpu().numpy() if torch is not None and isinstance(v, torch.Tensor) else v)
            for k, v in payload.items()
            if not isinstance(v, dict)
        }
        params = unflatten_params(flat)
    if expected is not None:
        exp_flat = flatten_params(expected)
        got_flat = flatten_params(params)
        mismatched = [
            f"{k}: ckpt={got_flat[k].shape} model={exp_flat[k].shape}"
            for k in exp_flat
            if k in got_flat and tuple(got_flat[k].shape) != tuple(exp_flat[k].shape)
        ]
        missing = [k for k in exp_flat if k not in got_flat]
        if mismatched or missing:
            raise RuntimeError(
                f"Checkpoint mismatch: missing={missing[:10]} shape_mismatch={mismatched[:10]}"
            )
    return params


def maybe_load_checkpoint(path) -> Tuple[int, float, Dict[str, Any]]:
    """Generic resume helper (reference training_utils.py:235-256): returns
    (start_epoch, best_metric, payload) from a checkpoint path, or
    (1, inf, {}) when the path is falsy/missing."""
    if not path:
        return 1, float("inf"), {}
    path = Path(path)
    if not path.exists():
        return 1, float("inf"), {}
    payload = load_checkpoint(path)
    start_epoch = int(payload.get("epoch", 0)) + 1
    best_metric = float(payload.get("best_metric", float("inf")))
    return start_epoch, best_metric, payload


def latest_checkpoint(directory, prefix: str) -> Optional[Path]:
    """Pick {prefix}_best.pt over {prefix}_last.pt (sampling_utils.py:131-167)."""
    directory = Path(directory)
    best = directory / f"{prefix}_best.pt"
    last = directory / f"{prefix}_last.pt"
    if best.exists():
        return best
    if last.exists():
        return last
    return None
