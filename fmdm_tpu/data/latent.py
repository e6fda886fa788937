"""
Latent-space dataset: rows of pre-encoded VAE latents (.npy), loaded verbatim.

The reference composes latent diffusion by caching VAE-encoded tensors and
feeding them back through the data layer (LDCTAttentionDataset consumes a
latent tensor cache for conditioning, /root/reference/src/datasets/ldct.py:286-293;
AutoencoderKL owns the 0.18215 SD latent scaling, src/models/vae/kl.py:118-130).
This dataset is the target-side counterpart for a FULLY latent denoiser:
targets and conditioning are latents produced by
``scripts/latent_diffusion_sweep.py`` (or any `run_model --mode encode` dump),
so the [0,1] image contract and HU windowing of the pixel datasets must NOT
apply — latents are roughly unit-normal after scaling and must pass through
untouched in both directions.

Split files are tab-separated with a header row: ``Case\ttarget\tconditioning``
(paths relative to the dataset root), the BaseDataset convention.
"""

from __future__ import annotations

import numpy as np

from fmdm_tpu.data.base import BaseDataset


class LatentDataset(BaseDataset):
    """BaseDataset over raw latent tensors: identity pre/post processing."""

    def __init__(self, file_path, train=True, conditioning=False, **kwargs):
        # `conditioning` is EXPLICIT (not buried in **kwargs) so the config
        # builder's signature scan (dataset_utils._build_dataset_kwargs) can
        # pass it through: without it the base class falls back to
        # image := target (reference base.py:235-236) and a "conditioned"
        # latent model silently trains against its own ground truth.
        kwargs.setdefault("norm", False)
        kwargs.setdefault("target_key", "target")
        kwargs.setdefault("conditioning_key", "conditioning")
        super().__init__(file_path, train=train, conditioning=conditioning, **kwargs)

    # latents are not images: no resize, no [0,1] mapping, no clipping
    def preprocess(self, payload) -> np.ndarray:
        img = payload["Image"] if isinstance(payload, dict) else payload
        return np.asarray(img, self.img_datatype)

    def to_image(self, img) -> np.ndarray:
        return np.asarray(img, self.img_datatype)

    def from_image(self, img) -> np.ndarray:
        return np.asarray(img, self.img_datatype)


def dataset_from_config(training_cfg: dict, train: bool = True, **overrides):
    """Config factory (dataset.json ``dataset_class`` entry point)."""
    kwargs = dict(
        file_path=training_cfg.get("data_root", "."),
        train=train,
        use_tensor_cache=bool(training_cfg.get("use_tensor_cache", False)),
        save_tensor_cache=bool(training_cfg.get("save_tensor_cache", False)),
    )
    kwargs.update(overrides)
    return LatentDataset(**kwargs)


def run_self_tests() -> None:
    """Embedded self-test: latents round-trip the data layer unscaled."""
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        rng = np.random.RandomState(0)
        rows = []
        for i in range(3):
            z_t = rng.randn(4, 8, 8).astype(np.float32) * 3.0  # out of [0,1]
            z_c = rng.randn(4, 8, 8).astype(np.float32) * 3.0
            np.save(root / f"t{i}.npy", z_t)
            np.save(root / f"c{i}.npy", z_c)
            rows.append(f"case{i}\tt{i}.npy\tc{i}.npy")
        (root / "train.txt").write_text("Case\ttarget\tconditioning\n" + "\n".join(rows) + "\n")
        ds = LatentDataset(root, train=True, conditioning=True, use_tensor_cache=False)
        assert len(ds) == 3
        sample = ds[1]
        ref = np.load(root / "t1.npy")
        np.testing.assert_array_equal(sample["target"], ref)  # untouched
        assert sample["target"].min() < 0 or sample["target"].max() > 1
        np.testing.assert_array_equal(sample["image"], np.load(root / "c1.npy"))
