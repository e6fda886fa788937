"""Grain input pipeline: batch parity with common.epoch_batches + trainer
integration via ``training.data_loader: grain``."""

import json

import numpy as np
import pytest

pytest.importorskip("grain")

from fmdm_tpu.data.grain_pipeline import grain_epoch_batches
from fmdm_tpu.train.common import epoch_batches


class _ToyDS:
    def __init__(self, n=11, with_image=True):
        rng = np.random.RandomState(0)
        self.t = rng.randn(n, 1, 8, 8).astype(np.float32)
        self.c = rng.randn(n, 1, 8, 8).astype(np.float32)
        self.with_image = with_image

    def __len__(self):
        return len(self.t)

    def __getitem__(self, i):
        s = {"target": self.t[i], "img_id": f"s{i}"}
        s["image"] = self.c[i] if self.with_image else None
        return s


@pytest.mark.parametrize("with_image", [True, False])
def test_grain_batches_match_contract(with_image):
    ds = _ToyDS(with_image=with_image)
    batches = list(grain_epoch_batches(ds, 4, shuffle=False, seed=3, epoch=1))
    assert len(batches) == 3  # 11 samples -> 4+4+3(padded)
    for b in batches:
        assert b["target"].shape == (4, 1, 8, 8)
        assert (b["image"] is None) == (not with_image)
        assert b["valid"].shape == (4,)
    # unshuffled order and edge padding identical to the host batcher
    ref = list(epoch_batches(ds, 4, shuffle=False, seed=3, epoch=1))
    for g, r in zip(batches, ref):
        np.testing.assert_array_equal(g["target"], r["target"])
        np.testing.assert_array_equal(g["valid"], r["valid"])
        if with_image:
            np.testing.assert_array_equal(g["image"], r["image"])
    assert batches[-1]["valid"].sum() == 3


def test_grain_shuffles_per_epoch():
    ds = _ToyDS(n=16)
    e1 = np.concatenate([b["target"] for b in grain_epoch_batches(ds, 4, shuffle=True, seed=3, epoch=1)])
    e2 = np.concatenate([b["target"] for b in grain_epoch_batches(ds, 4, shuffle=True, seed=3, epoch=2)])
    e1b = np.concatenate([b["target"] for b in grain_epoch_batches(ds, 4, shuffle=True, seed=3, epoch=1)])
    assert not np.array_equal(e1, e2)       # reshuffles across epochs
    np.testing.assert_array_equal(e1, e1b)  # deterministic per (seed, epoch)
    # a shuffle is a permutation: same multiset of samples
    np.testing.assert_allclose(np.sort(e1, axis=None), np.sort(ds.t, axis=None))


def test_grain_sharding_partitions_dataset():
    ds = _ToyDS(n=16)
    parts = [
        np.concatenate([b["target"] for b in grain_epoch_batches(
            ds, 4, shuffle=True, seed=5, epoch=1, pad_to_full=False,
            process_index=i, process_count=2)])
        for i in range(2)
    ]
    assert parts[0].shape[0] + parts[1].shape[0] == 16
    merged = np.sort(np.concatenate(parts), axis=None)
    np.testing.assert_allclose(merged, np.sort(ds.t, axis=None))


def test_trainer_with_grain_loader(tmp_path):
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["data_loader"] = "grain"
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True)
    run_dir = train(ds, cfg_path)
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert len(metrics) == 3 and np.isfinite(float(metrics[-1].split(",")[1]))
