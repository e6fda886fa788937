"""
Evaluation utilities: latent shapes, image grids, SSIM.

Behavioral parity with /root/reference/src/utils/evaluation_utils.py:12-91 and
indexing_utils.py:6-28. SSIM is a pure-numpy implementation of the skimage
default algorithm (uniform 7x7 window, data_range known) since skimage is not
installed in this image; it matches skimage.metrics.structural_similarity for
the defaults the reference uses.
"""

from __future__ import annotations

import logging
import random
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

try:
    from PIL import Image as PILImage
except Exception:  # pragma: no cover
    PILImage = None


def select_visual_indices(ds, count: int, seed: Optional[int] = None):
    """Per-Case stratified pick (indexing_utils.py:6-28)."""
    total = len(ds)
    if total <= 0:
        return []
    rng = random.Random(seed)
    indices = []
    if hasattr(ds, "data") and isinstance(getattr(ds, "data"), list):
        cases = {}
        for idx, row in enumerate(ds.data):
            case_id = row.get("Case") or row.get("case") or row.get("case_id")
            if case_id is None:
                continue
            cases.setdefault(case_id, []).append(idx)
        if cases:
            case_ids = list(cases.keys())
            rng.shuffle(case_ids)
            for case_id in case_ids[:count]:
                indices.append(rng.choice(cases[case_id]))
    if not indices:
        indices = list(range(total))
        rng.shuffle(indices)
        indices = indices[:count]
    return indices


def latent_shape(vae_cfg: dict) -> Tuple[int, ...]:
    """embed_dim + 2^(stages-1) downsampling (evaluation_utils.py:12-28)."""
    spatial_dims = vae_cfg.get("spatial_dims", 2)
    embed_dim = vae_cfg["embed_dim"]
    resolution = vae_cfg["resolution"]
    down_channels = vae_cfg.get("down_channels")
    if down_channels is not None:
        factor = 2 ** (len(tuple(down_channels)) - 1)
    else:
        ch_mult = tuple(vae_cfg["ch_mult"])
        factor = 2 ** (len(ch_mult) - 1)
    base_size = resolution // factor
    if spatial_dims == 3:
        return (embed_dim, base_size, base_size, base_size)
    if spatial_dims == 1:
        return (embed_dim, base_size)
    return (embed_dim, base_size, base_size)


def make_grid(batch: np.ndarray, rows: int, cols: int) -> np.ndarray:
    """(N, C, H, W) in [0,1] -> HxWx3 uint8 grid (evaluation_utils.py:30-45)."""
    batch = np.asarray(batch, dtype=np.float32)
    n, c, h, w = batch.shape
    if n < rows * cols:
        raise ValueError(f"Need at least {rows*cols} images to build the grid, found {n}")
    batch = batch[: rows * cols]
    if c == 1:
        batch = np.broadcast_to(batch, (rows * cols, 3, h, w))
        c = 3
    batch = np.clip(batch, 0.0, 1.0)
    batch = batch.reshape(rows, cols, c, h, w)
    grid = np.transpose(batch, (2, 0, 3, 1, 4)).reshape(c, rows * h, cols * w)
    grid_np = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    return np.transpose(grid_np, (1, 2, 0))


def save_image(array: np.ndarray, path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if PILImage is None:
        np.save(path.with_suffix(".npy"), array)
        return
    PILImage.fromarray(array).save(path)
    logging.info("Saved grid: %s", path)


def prepare_eval_batch(ds, count: int, seed: Optional[int] = None) -> np.ndarray:
    if ds is None or len(ds) == 0:
        raise RuntimeError("Dataset is empty; cannot prepare evaluation batch.")
    indices = select_visual_indices(ds, count, seed=seed)
    tensors = [np.asarray(ds[i]["target"], dtype=np.float32) for i in indices]
    if not tensors:
        raise RuntimeError("Failed to collect evaluation samples.")
    return np.stack(tensors, axis=0)


# ---------------------------------------------------------------------------
# SSIM (pure numpy, skimage-default-compatible)
# ---------------------------------------------------------------------------

def _uniform_filter(x: np.ndarray, size: int) -> np.ndarray:
    from scipy.ndimage import uniform_filter

    return uniform_filter(x, size=size, mode="reflect")


def ssim(im1: np.ndarray, im2: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """skimage.metrics.structural_similarity with default settings
    (uniform filter, K1=0.01, K2=0.03, sample covariance normalization)."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    if im1.shape != im2.shape:
        raise ValueError("ssim inputs must share a shape")
    if min(im1.shape) < win_size:
        win_size = max(3, min(im1.shape) // 2 * 2 - 1)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[crop].mean())


def compute_ssim_sample(pred: np.ndarray, tgt: np.ndarray) -> Optional[float]:
    """Per-channel-mean ND SSIM (evaluation_utils.py:64-91)."""
    pred = np.asarray(pred, dtype=np.float32)
    tgt = np.asarray(tgt, dtype=np.float32)
    if pred.shape != tgt.shape or pred.ndim < 2:
        return None
    if pred.ndim == 2:
        return ssim(pred, tgt, data_range=1.0)
    scores = []
    for ch in range(pred.shape[0]):
        if pred[ch].ndim < 2:
            continue
        scores.append(ssim(pred[ch], tgt[ch], data_range=1.0))
    if not scores:
        return None
    return float(np.mean(scores))


def psnr_from_mse(mse: float) -> float:
    """PSNR = 10 log10(1 / mse), data range [0,1] (diffusion_like.py:248)."""
    if mse <= 0:
        return float("inf")
    return float(10.0 * np.log10(1.0 / mse))
