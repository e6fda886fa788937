"""
MNIST loader with the reference sample contract
(/root/reference/src/datasets/mnist.py:10-60): dict samples with
target==image, label, img_id, img_size; digits resized to img_size, [0, 1].

torchvision is not available (and the image has no egress), so this reads the
standard IDX files directly from ``<root>/MNIST/raw/`` (gzipped or raw). When
no files exist and ``download=True`` cannot fetch them, it falls back to a
deterministic synthetic digit-like dataset so training/visual smoke paths work
offline (documented deviation; real MNIST files drop in with no code change).
"""

from __future__ import annotations

import gzip
import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from fmdm_tpu.data.io import resize_array


def _read_idx(path: Path) -> np.ndarray:
    opener = gzip.open if path.suffix == ".gz" else open
    with opener(path, "rb") as fh:
        magic = struct.unpack(">I", fh.read(4))[0]
        ndim = magic & 0xFF
        shape = struct.unpack(">" + "I" * ndim, fh.read(4 * ndim))
        data = np.frombuffer(fh.read(), dtype=np.uint8)
    return data.reshape(shape)


def _find_idx(root: Path, stem: str) -> Optional[Path]:
    for candidate in (
        root / "MNIST" / "raw" / stem,
        root / "MNIST" / "raw" / (stem + ".gz"),
        root / "raw" / stem,
        root / "raw" / (stem + ".gz"),
        root / stem,
        root / (stem + ".gz"),
    ):
        if candidate.exists():
            return candidate
    return None


def _find_npz_under(root: Path) -> Optional[Path]:
    for candidate in (root / "mnist.npz", root / "MNIST" / "mnist.npz",
                      root / "MNIST" / "raw" / "mnist.npz"):
        if candidate.exists():
            return candidate
    return None


def _synthetic_digits(n: int, seed: int) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic digit-like 28x28 images: oriented strokes + blobs per
    class. Enough structure for smoke training/sampling without network."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, 10, size=n).astype(np.int64)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32) / 27.0
    images = np.zeros((n, 28, 28), dtype=np.float32)
    for i in range(n):
        d = labels[i]
        cx, cy = 0.5 + 0.08 * rng.randn(), 0.5 + 0.08 * rng.randn()
        angle = d * np.pi / 10.0
        u = (xx - cx) * np.cos(angle) + (yy - cy) * np.sin(angle)
        v = -(xx - cx) * np.sin(angle) + (yy - cy) * np.cos(angle)
        ring = np.exp(-((np.sqrt(u**2 + (1.6 * v) ** 2) - 0.22 - 0.015 * d) ** 2) / 0.004)
        bar = np.exp(-(u**2) / 0.004) * (np.abs(v) < (0.12 + 0.02 * d))
        img = ring if d % 2 == 0 else 0.3 * ring + bar
        img = img / max(img.max(), 1e-6)
        images[i] = img.astype(np.float32)
    return images, labels


class MNISTDataset:
    def __init__(self, root: str, train: bool = True, img_size: int = 32, download: bool = True) -> None:
        self.root = Path(root)
        self.train = train
        self.img_size = img_size

        stem_img = "train-images-idx3-ubyte" if train else "t10k-images-idx3-ubyte"
        stem_lbl = "train-labels-idx1-ubyte" if train else "t10k-labels-idx1-ubyte"
        img_path = _find_idx(self.root, stem_img)
        lbl_path = _find_idx(self.root, stem_lbl)
        npz_path = _find_npz_under(self.root)
        if img_path is not None and lbl_path is not None:
            self.images = _read_idx(img_path)
            self.labels = _read_idx(lbl_path).astype(np.int64)
            self.synthetic = False
        elif npz_path is not None:
            # keras-style mnist.npz (x_train/y_train/x_test/y_test) — the most
            # common offline MNIST artifact; drop it anywhere under data_root
            with np.load(npz_path) as payload:
                suffix = "train" if train else "test"
                self.images = np.asarray(payload[f"x_{suffix}"], np.uint8)
                self.labels = np.asarray(payload[f"y_{suffix}"], np.int64)
            self.synthetic = False
        else:
            n = 4096 if train else 512
            self.images, self.labels = _synthetic_digits(n, seed=0 if train else 1)
            self.images = (self.images * 255).astype(np.uint8)
            self.synthetic = True

        # Minimal row/writer surface so run_model --save works for MNIST too
        # (the reference's MNISTDataset lacks this and crashes on --save).
        split = "train" if train else "test"
        self.base_path = self.root
        self.target_key = "target"
        self.conditioning_key = None
        self.data = [
            {"target": f"{split}/{split}_{i}.png", "Case": None}
            for i in range(len(self.images))
        ]

    def _cache_info(self, entry, row, key):
        return None, 1

    def save_output(self, row, key, tensor, output_root):
        from fmdm_tpu.data.dataset_utils import cache_path_for_entry, save_tensor_cache, to_2d_image

        entry = row.get(key)
        out_path = cache_path_for_entry(self.base_path, output_root, entry)
        if out_path is None:
            return
        arr = np.asarray(tensor, dtype=np.float32)
        image2d = to_2d_image(arr)
        if image2d is not None:
            try:
                from PIL import Image as PILImage

                png_path = out_path.with_suffix(".png")
                png_path.parent.mkdir(parents=True, exist_ok=True)
                PILImage.fromarray(image2d, mode="L").save(png_path)
                return
            except Exception:
                pass
        save_tensor_cache(arr, out_path)

    def __len__(self) -> int:
        return len(self.images)

    def to_image(self, image):
        return np.asarray(image, dtype=np.float32) / 255.0

    def from_image(self, image):
        return np.clip(np.asarray(image), 0.0, 1.0) * 255.0

    def __getitem__(self, idx: int) -> dict:
        image = np.asarray(self.images[idx], dtype=np.float32)
        if (self.img_size, self.img_size) != image.shape:
            image = resize_array(image, (self.img_size, self.img_size))
        image = (image / 255.0).astype(np.float32)[None, :, :]  # (1, H, W)
        return {
            "target": image,
            "image": image,
            "label": int(self.labels[idx]),
            "img_id": f"{'train' if self.train else 'test'}_{idx}",
            "img_size": (self.img_size, self.img_size),
        }
