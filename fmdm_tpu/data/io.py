"""
IO loaders: DICOM (gated on pydicom), npy/npz, torch .pt/.pth, PIL images,
directory composites.

Behavioral parity with /root/reference/src/utils/io_utils.py:23-101
(payload dict {"Image", "Metadata", "Id"}; directories load as sorted stacks).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional

import numpy as np

try:
    import pydicom
except Exception:  # pragma: no cover - optional
    pydicom = None

try:
    from PIL import Image as PILImage
except Exception:  # pragma: no cover - optional
    PILImage = None

try:
    import torch as _torch
except Exception:  # pragma: no cover - optional
    _torch = None


def load_image(path, id=None) -> Dict[str, Any]:
    """Load one file into {"Image": ndarray, "Metadata": dict|None, "Id": id}."""
    path = Path(path)
    suffix = path.suffix.lower()
    metadata: Optional[dict] = None
    if suffix in (".dcm", ".ima", ".dicom"):
        if pydicom is None:
            raise RuntimeError("DICOM support requires pydicom (not installed in this image).")
        ds = pydicom.dcmread(str(path))
        image = ds.pixel_array
        # Only surface rescale tags that are actually present: the LDCT
        # preprocess falls back to slope=1/intercept=-1024 when a tag is
        # absent (ldct.py preprocess defaults); injecting a default of 0.0
        # here would shift HU by +1024 for headers lacking RescaleIntercept.
        metadata = {
            "PixelSpacing": list(getattr(ds, "PixelSpacing", []) or []),
            "SliceThickness": getattr(ds, "SliceThickness", None),
        }
        for tag in ("RescaleSlope", "RescaleIntercept"):
            value = getattr(ds, tag, None)
            if value is not None:
                metadata[tag] = float(value)
    elif suffix == ".npy":
        # Memory-map volumes: slice-level samples (LDCT window splitting)
        # touch only their own window's bytes instead of re-reading the full
        # multi-slice volume per sample — np.load of a 25 MB volume holds the
        # GIL ~15 ms and fully serialized the threaded cold-cache fetch path.
        # Downstream windowing/copy materializes real arrays.
        image = np.load(str(path), mmap_mode="r")
    elif suffix == ".npz":
        payload = np.load(str(path))
        image = payload[payload.files[0]]
    elif suffix in (".pt", ".pth"):
        if _torch is None:
            raise RuntimeError(".pt loading requires torch.")
        tensor = _torch.load(str(path), map_location="cpu", weights_only=False)
        image = tensor.numpy() if hasattr(tensor, "numpy") else np.asarray(tensor)
    else:
        if PILImage is None:
            raise RuntimeError("Image loading requires Pillow.")
        with PILImage.open(str(path)) as im:
            image = np.asarray(im)
    return {"Image": image, "Metadata": metadata, "Id": id}


def load_composite(paths: List, id=None, num_workers: Optional[int] = None) -> Dict[str, Any]:
    """Load a list of files as one stacked volume, sorted by filename.

    Deep stacks (per-slice DICOM dirs) fan the per-file decode over a thread
    pool — the reference fans the same work over a multiprocessing.Pool
    (io_utils.py:66-92); pydicom/PIL/numpy decoding releases the GIL, so
    threads get the same parallel decode without fork+pickle overhead.
    Serial for short lists where pool startup would dominate."""
    paths = sorted(str(p) for p in paths)
    if num_workers is None:
        import os

        num_workers = min(8, os.cpu_count() or 1) if len(paths) >= 8 else 0
    if num_workers and num_workers > 1 and len(paths) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_workers,
                                thread_name_prefix="composite") as pool:
            payloads = list(pool.map(lambda p: load_image(p, id=id), paths))
    else:
        payloads = [load_image(p, id=id) for p in paths]
    images = [np.asarray(p["Image"]) for p in payloads]
    stacked = np.stack(images, axis=0)
    metadata = payloads[0].get("Metadata")
    return {"Image": stacked, "Metadata": metadata, "Id": id}


def load(entry, id=None) -> Dict[str, Any]:
    """Dispatch: file path -> load_image; directory -> sorted composite;
    list -> composite (io_utils.py:95-101)."""
    if isinstance(entry, (list, tuple)):
        return load_composite(list(entry), id=id)
    path = Path(str(entry))
    if path.is_dir():
        files = sorted(p for p in path.iterdir() if p.is_file())
        return load_composite(files, id=id)
    return load_image(path, id=id)


def resize_array(img: np.ndarray, size, preserve_range: bool = True) -> np.ndarray:
    """Linear resize of the trailing len(size) dims (skimage.transform.resize
    replacement using scipy zoom)."""
    from scipy.ndimage import zoom

    img = np.asarray(img, dtype=np.float32)
    size = tuple(size)
    nd = len(size)
    if img.ndim < nd:
        raise ValueError(f"Cannot resize {img.shape} to {size}")
    factors = [1.0] * (img.ndim - nd) + [
        size[i] / img.shape[img.ndim - nd + i] for i in range(nd)
    ]
    if all(abs(f - 1.0) < 1e-9 for f in factors):
        return img
    return zoom(img, factors, order=1)
