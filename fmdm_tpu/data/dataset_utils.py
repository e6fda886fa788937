"""
Dataset configuration, cache handling and path resolution.

Behavioral parity with /root/reference/src/utils/dataset_utils.py (dataset.json
ancestor walk, 'module:Symbol' import with legacy 'datasets.*' aliases, ctor
kwargs mapping incl. tensor_cache_subdir->cache_subdir and
slice_count->window_size, mirrored cache tree '<stem>[_split_i].pt', atomic
cache writes, iter_batches, save_output_tensor, to_2d_image).
"""

from __future__ import annotations

import inspect
import json
import os
import pickle
from importlib import import_module
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from fmdm_tpu.data.io import load

try:
    import torch as _torch
except Exception:  # pragma: no cover
    _torch = None

# The reference aliases its packages top-level (src/__init__.py:16-19) so
# dataset.json files say e.g. "datasets.mnist:MNISTDataset". Keep those config
# strings working unchanged by mapping them onto our package.
MODULE_ALIASES = {
    "datasets.base": "fmdm_tpu.data.base",
    "datasets.mnist": "fmdm_tpu.data.mnist",
    "datasets.ldct": "fmdm_tpu.data.ldct",
    "datasets": "fmdm_tpu.data",
}


def _import_symbol(path: str):
    if ":" not in path:
        raise ValueError(f"Invalid dataset_class '{path}'. Use 'module:Symbol'.")
    module_name, symbol = path.split(":", 1)
    module_name = MODULE_ALIASES.get(module_name, module_name)
    module = import_module(module_name)
    if not hasattr(module, symbol):
        raise ImportError(f"Cannot find '{symbol}' in module '{module_name}'.")
    return getattr(module, symbol)


# ---------------------------------------------------------------------------
# Windowing / entry resolution
# ---------------------------------------------------------------------------

def consecutive_paths(directory: str, split: int = 3):
    directory_path = Path(directory)
    if not directory_path.exists():
        return []
    if directory_path.is_file():
        return [[str(directory_path)]]
    files = sorted(
        str(directory_path / f) for f in os.listdir(directory_path) if (directory_path / f).is_file()
    )
    if not files:
        return []
    if split < 0:
        split = max(len(files), 1)
    if split <= 1:
        return [[f] for f in files]
    return [files[i : i + split] for i in range(0, len(files) - split + 1)]


def absolute_path(root_path: Path, entry) -> Path:
    entry_path = Path(str(entry))
    return entry_path if entry_path.is_absolute() else root_path / entry_path


def maybe_unwrap(paths):
    if isinstance(paths, (list, tuple)) and len(paths) == 1:
        return paths[0]
    return paths


def resolve_entry(root_path: Path, entry, window_size: int) -> list:
    full_path = absolute_path(root_path, entry)
    if full_path.is_dir():
        return [paths for paths in consecutive_paths(str(full_path), window_size) if paths]
    return [[str(full_path)]]


def split_volume_entry(path: str, window_size: int) -> list:
    payload = load(path, id=None)
    image = payload.get("Image") if isinstance(payload, dict) else None
    if image is None:
        return [path]
    array = np.asarray(image)
    depth = array.shape[0] if array.ndim >= 3 else 1
    if window_size < 0 or depth <= 1:
        return [path]
    if window_size <= 1:
        return [
            {"path": path, "split_index": idx, "split_count": depth, "window": 1}
            for idx in range(depth)
        ]
    if depth < window_size:
        return [path]
    count = depth - window_size + 1
    return [
        {"path": path, "split_index": idx, "split_count": count, "window": window_size}
        for idx in range(count)
    ]


# ---------------------------------------------------------------------------
# Dataset builders (dataset.json discovery)
# ---------------------------------------------------------------------------

def build_dataset_from_config(training_cfg: dict, model_cfg: Optional[dict] = None,
                              train: bool = True, cfg_path: Optional[Path] = None):
    dataset_json = _find_dataset_json(cfg_path)
    if dataset_json is None:
        # run_model loads the FROZEN train_config.json inside the run dir,
        # whose ancestry usually doesn't contain the original dataset.json —
        # the data root itself is the natural durable home for it (the
        # reference instead falls back to name heuristics, which can't know
        # custom dataset classes like fmdm_tpu.data.latent:LatentDataset)
        data_root = (training_cfg or {}).get("data_root")
        if data_root:
            candidate = Path(data_root) / "dataset.json"
            if candidate.exists():
                dataset_json = candidate
    if dataset_json is None:
        dataset_class = _infer_dataset_class(training_cfg, model_cfg)
        if not dataset_class:
            raise ValueError("dataset.json not found in config directory or parents.")
        return _build_from_class(dataset_class, dict(training_cfg or {}), train)
    dataset_cfg = _read_dataset_config(dataset_json)
    dataset_class = dataset_cfg.get("dataset_class")
    if not dataset_class:
        raise ValueError(f"dataset.json missing 'dataset_class': {dataset_json}")
    merged_cfg = dict(training_cfg or {})
    merged_cfg.update({k: v for k, v in dataset_cfg.items() if k != "dataset_class"})
    return _build_from_class(dataset_class, merged_cfg, train)


def _infer_dataset_class(training_cfg: dict, model_cfg: Optional[dict] = None) -> Optional[str]:
    """Legacy class inference from names/heuristics (dataset_utils.py:204-227)."""
    model_cfg = model_cfg or {}
    dataset_name = str(training_cfg.get("dataset", "")).strip().lower()
    conditioning = str(training_cfg.get("conditioning", model_cfg.get("conditioning", ""))).strip().lower()
    split_file = str(training_cfg.get("split_file", ""))

    if dataset_name == "mnist":
        return "datasets.mnist:MNISTDataset"
    if dataset_name == "ldct":
        if conditioning == "attention" or "encodeddataset" in split_file.lower() or "pixelattention" in split_file.lower():
            return "datasets.ldct:LDCTAttentionDataset"
        return "datasets.ldct:LDCTDataset"
    if "mnist" in split_file.lower():
        return "datasets.mnist:MNISTDataset"
    if "ldct" in split_file.lower():
        if conditioning == "attention" or "encodeddataset" in split_file.lower() or "pixelattention" in split_file.lower():
            return "datasets.ldct:LDCTAttentionDataset"
        return "datasets.ldct:LDCTDataset"
    return None


def build_train_val_datasets(cfg: dict) -> Tuple[object, object]:
    training_cfg = cfg["training"]
    cfg_path_value = cfg.get("__config_path__") if isinstance(cfg, dict) else None
    cfg_path = Path(cfg_path_value) if cfg_path_value else None
    model_cfg = cfg.get("model", {}) if isinstance(cfg, dict) else {}
    train_ds = build_dataset_from_config(training_cfg, model_cfg, train=True, cfg_path=cfg_path)
    val_ds = build_dataset_from_config(training_cfg, model_cfg, train=False, cfg_path=cfg_path)
    return train_ds, val_ds


def _find_dataset_json(cfg_path: Optional[Path]) -> Optional[Path]:
    if cfg_path is None or not str(cfg_path):
        return None
    cursor = Path(cfg_path).parent
    while True:
        candidate = cursor / "dataset.json"
        if candidate.exists():
            return candidate
        if cursor.parent == cursor:
            return None
        cursor = cursor.parent


def _read_dataset_config(dataset_json: Path) -> dict:
    with Path(dataset_json).open("r") as fh:
        payload = json.load(fh)
    if not isinstance(payload, dict):
        raise ValueError(f"dataset.json must contain a JSON object: {dataset_json}")
    return payload


def _build_from_class(dataset_class: str, training_cfg: dict, train: bool):
    target = _import_symbol(dataset_class)
    if inspect.isclass(target):
        return _instantiate_dataset(target, training_cfg, train)
    if callable(target):
        return target(training_cfg, train)
    raise TypeError(f"dataset_class '{dataset_class}' is not callable.")


def _instantiate_dataset(cls, training_cfg: dict, train: bool):
    sig = inspect.signature(cls.__init__)
    kwargs = _build_dataset_kwargs(training_cfg, train, sig.parameters.keys())
    return cls(**kwargs)


def _build_dataset_kwargs(training_cfg: dict, train: bool, keys) -> dict:
    mapping = {
        "file_path": "data_root",
        "root": "data_root",
        "img_size": "img_size",
        "window_size": "window_size",
        "load_ldct": "load_ldct",
        "norm": "norm",
        "use_tensor_cache": "use_tensor_cache",
        "save_tensor_cache": "save_tensor_cache",
        "cache_subdir": "tensor_cache_subdir",
        "preprocess_kwargs": "preprocess_kwargs",
        "split_file": "split_file",
        "download": "download",
    }
    kwargs = {}
    for param in keys:
        if param == "self":
            continue
        if param == "train":
            kwargs["train"] = train
            continue
        if param == "conditioning":
            # conditioning in configs is a MODE string ("concatenate" /
            # "attention" / "none" / None); datasets take a bool ("load the
            # conditioning column"). Normalize here so a conditioned latent
            # model actually reads its conditioning column instead of the
            # base-class image := target fallback.
            raw = training_cfg.get("conditioning")
            if isinstance(raw, bool):
                kwargs[param] = raw
            else:
                kwargs[param] = str(raw or "").strip().lower() in {
                    "concatenate", "attention", "true", "1"}
            continue
        cfg_key = mapping.get(param, param)
        if cfg_key in training_cfg:
            kwargs[param] = training_cfg[cfg_key]
        elif param == "window_size" and "slice_count" in training_cfg:
            kwargs[param] = training_cfg["slice_count"]
    return kwargs


# ---------------------------------------------------------------------------
# Tensor cache (same mirrored-tree layout; .pt files, torch-readable)
# ---------------------------------------------------------------------------

def cache_path_for_entry(base_path: Path, cache_root: Path, entry,
                         split_index: Optional[int] = None, split_count: int = 1) -> Optional[Path]:
    if cache_root is None:
        return None
    if isinstance(entry, list):
        if not entry:
            return None
        base = entry[0]
    elif isinstance(entry, dict):
        base = entry.get("path")
        if base is None and isinstance(entry.get("paths"), (list, tuple)) and entry["paths"]:
            base = entry["paths"][0]
    else:
        base = entry
    if base is None:
        return None
    entry_path = Path(str(base))
    if entry_path.is_absolute():
        try:
            rel = entry_path.relative_to(base_path)
        except Exception:
            rel = Path(entry_path.name)
    else:
        rel = entry_path
    stem = Path(rel).stem
    parent = Path(rel).parent
    filename = f"{stem}_split_{split_index}.pt" if (split_count > 1 and split_index is not None) else f"{stem}.pt"
    return Path(cache_root) / parent / filename


def save_tensor_cache(array, cache_path: Path) -> None:
    """Atomic write (tmp + fsync + rename, dataset_utils.py:452-472); torch
    container so reference tooling can read our caches and vice versa."""
    if cache_path is None:
        return
    import tempfile

    cache_path = Path(cache_path)
    cache_path.parent.mkdir(parents=True, exist_ok=True)
    # Unique tmp per writer: the reference uses one fixed '<name>.tmp', which
    # concurrent DataLoader workers can interleave on; mkstemp removes that
    # window entirely while keeping the atomic-rename publish.
    fd, tmp_name = tempfile.mkstemp(prefix=cache_path.stem + ".", suffix=".tmp",
                                    dir=str(cache_path.parent))
    tmp_path = Path(tmp_name)
    try:
        with os.fdopen(fd, "wb") as fh:
            if _torch is not None:
                _torch.save(
                    _torch.from_numpy(np.ascontiguousarray(np.asarray(array, dtype=np.float32))), fh
                )
            else:
                pickle.dump(np.asarray(array, dtype=np.float32), fh)
            fh.flush()
            try:
                os.fsync(fh.fileno())
            except OSError:
                pass
        os.replace(tmp_path, cache_path)
    except BaseException:
        tmp_path.unlink(missing_ok=True)
        raise


def load_tensor_cache(cache_path: Path) -> np.ndarray:
    if _torch is not None:
        try:
            t = _torch.load(cache_path, map_location="cpu", weights_only=False)
            return t.numpy() if hasattr(t, "numpy") else np.asarray(t)
        except Exception:
            pass
    with Path(cache_path).open("rb") as fh:
        return np.asarray(pickle.load(fh))


# ---------------------------------------------------------------------------
# Batch iteration / output writing
# ---------------------------------------------------------------------------

def iter_batches(dataset, batch_size: int, indices=None):
    selected = list(range(len(dataset))) if indices is None else list(indices)
    total = len(selected)
    for start in range(0, total, batch_size):
        end = min(start + batch_size, total)
        batch_indices = selected[start:end]
        samples = [dataset[i] for i in batch_indices]
        yield batch_indices, samples


def save_output_tensor(dataset, row: dict, key: str, tensor, output_root: Path) -> None:
    entry = row.get(key)
    split_index, split_count = dataset._cache_info(entry, row, key)
    out_path = cache_path_for_entry(dataset.base_path, output_root, entry, split_index, split_count)
    if out_path is None:
        return
    writer = getattr(dataset, "save_output", None)
    if callable(writer):
        writer(row=row, key=key, tensor=tensor, output_root=output_root)
        return
    save_tensor_cache(tensor, out_path)


def to_2d_image(arr: np.ndarray) -> Optional[np.ndarray]:
    """[H,W] / [1,H,W] / [3,H,W] -> uint8 grayscale (dataset_utils.py:523-537)."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 2:
        img = arr
    elif arr.ndim == 3 and arr.shape[0] == 1:
        img = arr[0]
    elif arr.ndim == 3 and arr.shape[0] == 3:
        img = arr.mean(axis=0)
    else:
        return None
    img = np.clip(img, 0.0, 1.0)
    return np.round(img * 255.0).astype(np.uint8)


def run_self_tests() -> None:
    """Embedded self-test (reference dataset_utils.py self-test tier):
    windowing split, cache-path mapping, atomic tensor cache round-trip."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        vol = root / "vol.npy"
        np.save(vol, np.zeros((10, 4, 4), np.float32))
        parts = split_volume_entry(str(vol), 3)
        assert len(parts) == 8
        assert parts[0]["split_index"] == 0 and parts[-1]["split_index"] == 7
        assert all(p["window"] == 3 for p in parts)
        img = root / "img.npy"
        np.save(img, np.zeros((4, 4), np.float32))
        assert split_volume_entry(str(img), 0) == [str(img)]

        cache = cache_path_for_entry(root / "a" / "b.npy", root / "cache", "a/b.npy")
        assert str(cache).startswith(str(root / "cache"))
        arr = np.arange(12, dtype=np.float32).reshape(3, 4)
        save_tensor_cache(arr, cache)
        back = load_tensor_cache(cache)
        np.testing.assert_array_equal(back, arr)

    batches = list(iter_batches(list(range(7)), 3))
    assert [len(samples) for _, samples in batches] == [3, 3, 1]
    assert batches[0][0] == [0, 1, 2]
