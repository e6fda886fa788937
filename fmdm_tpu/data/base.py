"""
BaseDataset — generic image dataset with split files, optional conditioning
and a mirrored tensor cache.

Behavioral parity with /root/reference/src/datasets/base.py:16-386: tab-
separated train.txt/test.txt splits, [0,1] canonical image contract
(to_image/from_image), per-entry .pt cache read/write, windowed volume
slicing, save_output PNG-or-tensor writer. Samples are numpy float32 (the
TPU path feeds them to jax.device_put with NamedSharding; no torch in the
hot path).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from fmdm_tpu.data.dataset_utils import (
    cache_path_for_entry,
    load_tensor_cache,
    save_tensor_cache,
    to_2d_image,
)
from fmdm_tpu.data.io import load, resize_array

try:
    from PIL import Image as PILImage
except Exception:  # pragma: no cover
    PILImage = None


class BaseDataset:
    # __getitem__ is thread-safe: per-call numpy state only, atomic
    # (tmp+os.replace) cache writes, no global-RNG transforms. This opts the
    # whole family into epoch_batches' auto-threaded sample fetch; external
    # dataset classes stay serial unless they declare the same.
    thread_safe_getitem = True

    def __init__(
        self,
        file_path: str,
        train: bool = True,
        img_size=None,
        norm: bool = True,
        img_datatype=np.float32,
        transforms=None,
        conditioning: bool = False,
        id_key: Optional[str] = None,
        target_key: str = "target",
        conditioning_key: Optional[str] = "conditioning",
        split_names: Optional[Tuple[str, ...]] = None,
        split_file=None,
        use_tensor_cache: bool = True,
        save_tensor_cache: bool = False,
        cache_subdir: str = "cache",
        preprocess_kwargs: Optional[dict] = None,
    ):
        self.base_path = Path(file_path)
        self.train = train
        self.split_name = "train" if train else "test"
        self.id_key = id_key
        self.target_key = target_key
        self.conditioning_key = conditioning_key
        self.img_size = self._normalize_img_size(img_size)
        self.norm = bool(norm)
        self.img_datatype = img_datatype
        self.transforms = transforms
        self.conditioning = bool(conditioning)
        self.use_tensor_cache = bool(use_tensor_cache) or bool(save_tensor_cache)
        self.save_tensor_cache = bool(save_tensor_cache)
        self.cache_subdir = cache_subdir
        self.cache_root = self.base_path / self.cache_subdir
        self.preprocess_kwargs = dict(preprocess_kwargs) if preprocess_kwargs else {}
        self.split_file = Path(split_file) if split_file is not None else None

        self.data_root = self.base_path
        df = self._read_split_file(self.data_root, names=split_names)
        df = df.dropna().reset_index(drop=True)
        self.data = df.to_dict("records")
        self.size = len(self.data)
        assert self.size > 0, "Empty Dataset"
        logging.info("Creating %s dataset with %d examples.", self.split_name.capitalize(), self.size)

    # -- canonical [0,1] contract (base.py:94-126) ---------------------------
    def to_image(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img)
        if self.norm:
            if np.issubdtype(img.dtype, np.integer):
                max_val = np.iinfo(img.dtype).max
                if max_val > 0:
                    img = img / max_val
            else:
                img_min = float(np.min(img)) if img.size else 0.0
                img_max = float(np.max(img)) if img.size else 0.0
                if img_max > 1.0 or img_min < 0.0:
                    denom = (img_max - img_min) if img_max != img_min else 1.0
                    img = (img - img_min) / denom
        return np.clip(img, 0.0, 1.0).astype(self.img_datatype)

    def from_image(self, img) -> np.ndarray:
        return np.clip(np.asarray(img), 0.0, 1.0).astype(self.img_datatype)

    @staticmethod
    def _normalize_img_size(img_size):
        if img_size is None:
            return None
        if isinstance(img_size, int):
            return (img_size, img_size)
        return tuple(img_size)

    def __len__(self) -> int:
        return self.size

    def _read_split_file(self, root_path: Path, names=None):
        if self.split_file is not None:
            target_file = self.split_file
            if not target_file.is_absolute():
                target_file = root_path / target_file
        else:
            target_file = root_path / ("train.txt" if self.train else "test.txt")
        if not target_file.exists():
            raise FileNotFoundError(f"Annotations file not found: {target_file}")
        if names is None:
            return pd.read_csv(target_file, sep="\t")
        df = pd.read_csv(target_file, sep="\t", names=names)
        # LDCT split files are headerless 3-column TSVs (the reference reads
        # them with explicit names); tolerate files that carry a header row
        # matching the column names by dropping it.
        if len(df) and tuple(str(v) for v in df.iloc[0]) == tuple(names):
            df = df.iloc[1:].reset_index(drop=True)
        return df

    # -- preprocessing --------------------------------------------------------
    def preprocess(self, payload) -> np.ndarray:
        img = payload["Image"] if isinstance(payload, dict) else payload
        img = np.asarray(img)
        if self.img_size is not None:
            img = resize_array(img, self.img_size)
        return self.to_image(img)

    # -- sample access ---------------------------------------------------------
    def __getitem__(self, idx: int) -> dict:
        row = self.data[idx]
        item_id = row.get(self.id_key) if self.id_key else None
        tgt = self._load_target_tensor(row, item_id)

        img = None
        if self.conditioning:
            if self.conditioning_key is None:
                raise KeyError("Conditioning requested but no conditioning column provided.")
            img = self._load_conditioning_tensor(row, item_id)

        if self.transforms is not None:
            if self.train and not self.conditioning:
                tgt = self.transforms(tgt)
            else:
                img, tgt = self.transforms(img, tgt)

        if img is None:
            img = tgt

        return {
            "image": img,
            "target": tgt,
            "img_id": item_id,
            "img_path": self._resolve_img_path(row.get(self.target_key)),
            "img_size": self.img_size,
        }

    def _load_target_tensor(self, row, item_id):
        return self._load_entry_tensor(row, item_id, self.target_key, preprocess=True)

    def _load_conditioning_tensor(self, row, item_id):
        if self.conditioning_key is None:
            raise KeyError("Conditioning requested but no conditioning column provided.")
        return self._load_entry_tensor(row, item_id, self.conditioning_key, preprocess=True)

    def _load_entry_tensor(self, row, item_id, key: str, preprocess: bool) -> np.ndarray:
        entry = row[key]
        split_index, split_count = self._cache_info(entry, row, key)
        cache_path = cache_path_for_entry(self.base_path, self.cache_root, entry, split_index, split_count)
        if self.use_tensor_cache and cache_path is not None and cache_path.exists():
            return np.ascontiguousarray(load_tensor_cache(cache_path), dtype=np.float32)

        payload = self._load_entry(entry, item_id)
        if preprocess:
            try:
                tensor = (
                    self.preprocess(payload, **self.preprocess_kwargs)
                    if self.preprocess_kwargs
                    else self.preprocess(payload)
                )
            except TypeError as exc:
                raise TypeError(
                    f"Invalid preprocess kwargs for {self.__class__.__name__}: {self.preprocess_kwargs}"
                ) from exc
        else:
            tensor = payload.get("Image") if isinstance(payload, dict) else payload
        tensor = np.ascontiguousarray(np.asarray(tensor, dtype=np.float32))
        if self.save_tensor_cache and cache_path is not None and not cache_path.exists():
            # Fire-and-forget: the torch-container serialization holds the GIL
            # for tens of ms per sample, which would serialize the threaded
            # cold-cache fetch path; a single background writer keeps cache
            # population off the training critical path (writes are atomic
            # unique-tmp, and a dropped write just re-preprocesses next epoch).
            self._cache_writer().submit(save_tensor_cache, tensor, cache_path)
        return tensor

    def _cache_writer(self):
        writer = getattr(self, "_cache_writer_pool", None)
        if writer is None:
            from concurrent.futures import ThreadPoolExecutor

            writer = ThreadPoolExecutor(max_workers=1, thread_name_prefix="cache-write")
            object.__setattr__(self, "_cache_writer_pool", writer)
        return writer

    def flush_tensor_cache_writes(self) -> None:
        """Block until all pending asynchronous cache writes have landed."""
        writer = getattr(self, "_cache_writer_pool", None)
        if writer is not None:
            writer.submit(lambda: None).result()

    @staticmethod
    def _resolve_img_path(entry):
        if isinstance(entry, list):
            return entry[len(entry) // 2]
        if isinstance(entry, dict):
            return entry.get("path")
        return entry

    def _cache_info(self, entry, row, key: Optional[str]):
        return None, 1

    def _resolve_entry_path(self, path):
        """Resolve split-file entries relative to the dataset root (the
        reference resolves only in LDCT's index builder and silently depends
        on CWD for BaseDataset; we do the obviously-intended thing)."""
        p = Path(str(path))
        return p if p.is_absolute() else self.base_path / p

    def _load_entry(self, entry, item_id):
        if isinstance(entry, list):
            return load([self._resolve_entry_path(p) for p in entry], id=item_id)
        if isinstance(entry, dict):
            payload = load(self._resolve_entry_path(entry["path"]), id=item_id)
            window = int(entry.get("window", 1))
            start = int(entry.get("split_index", 0))
            return self._slice_payload(payload, start, window)
        return load(self._resolve_entry_path(entry), id=item_id)

    # -- output writer (base.py:341-362) ----------------------------------------
    def save_output(self, row: dict, key: str, tensor, output_root: Path) -> None:
        entry = row.get(key)
        split_index, split_count = self._cache_info(entry, row, key)
        out_path = cache_path_for_entry(self.base_path, output_root, entry, split_index, split_count)
        if out_path is None:
            return
        arr = np.asarray(tensor, dtype=np.float32)
        image2d = to_2d_image(arr)
        if image2d is not None and PILImage is not None:
            png_path = out_path.with_suffix(".png")
            png_path.parent.mkdir(parents=True, exist_ok=True)
            PILImage.fromarray(image2d, mode="L").save(png_path)
            return
        save_tensor_cache(arr, out_path)

    @staticmethod
    def _slice_payload(payload, start: int, window: int):
        image = payload.get("Image") if isinstance(payload, dict) else None
        if image is None or window <= 0:
            return payload
        array = np.asarray(image)
        sliced = array[start : start + window].copy()
        return {"Image": sliced, "Metadata": payload.get("Metadata"), "Id": payload.get("Id")}


def run_self_tests() -> None:
    """Embedded self-test (reference datasets/base.py self-test tier): split
    file discovery, [0,1] contract, sample dict schema."""
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        (root / "imgs").mkdir()
        names = []
        for i in range(4):
            p = root / "imgs" / f"s{i}.npy"
            np.save(p, np.random.RandomState(i).rand(8, 8).astype(np.float32))
            names.append(f"imgs/s{i}.npy")
        (root / "train.txt").write_text("target\n" + "\n".join(names[:3]) + "\n")
        (root / "test.txt").write_text("target\n" + names[3] + "\n")

        train_ds = BaseDataset(str(root), train=True)
        test_ds = BaseDataset(str(root), train=False)
        assert len(train_ds) == 3 and len(test_ds) == 1

        sample = train_ds[0]
        img = np.asarray(sample["target"])
        assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0  # [0,1] contract
        assert sample["image"] is not None  # unconditional: image mirrors target
        for key in ("image", "target", "img_id", "img_path", "img_size"):
            assert key in sample
