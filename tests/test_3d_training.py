"""3D volume path: EfficientUNetND training on windowed synthetic LDCT volumes
(the BASELINE.json configs[4] '3D EfficientUNetND volumes' capability)."""

import json
from pathlib import Path

import numpy as np
import pytest

from fmdm_tpu.data.ldct import LDCTDataset


def _make_volume_root(tmp_path, depth=8, size=16):
    data_dir = tmp_path / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    vol = (rng.rand(depth, size, size) * 4096 - 1024).astype(np.float32)
    np.save(data_dir / "sdct.npy", vol)
    np.save(data_dir / "ldct.npy", vol + rng.randn(depth, size, size).astype(np.float32) * 50)
    for split in ("train.txt", "test.txt"):
        (tmp_path / split).write_text("Case\tSDCT\tLDCT\nC1\tdata/sdct.npy\tdata/ldct.npy\n")
    return tmp_path


def test_3d_flow_matching_trains(tmp_path):
    from fmdm_tpu.train.flow_matching_lib import train

    root = _make_volume_root(tmp_path)
    # window_size=4 -> samples are (4, 16, 16) depth windows; the ND UNet
    # treats the window as 3D volume with 1 channel
    ds = LDCTDataset(file_path=str(root), window_size=4, use_tensor_cache=False, load_ldct=True)
    assert len(ds) == 5  # depth 8, window 4 -> 5 windows

    cfg = {
        "training": {
            "data_root": str(root),
            "dataset": "ldct",
            "output_dir": str(tmp_path / "run3d"),
            "train_batch_size": 2,
            "num_epochs": 1,
            "learning_rate": 1e-3,
            "scheduler": "flowmatch",
            "num_train_timesteps": 20,
            "num_inference_steps": 3,
            "conditioning": "concatenate",
            "channels": 1,
            "save_model_epochs": 1,
            "seed": 5,
            "save_images": False,
        },
        "model": {
            "unet": {
                "unet_impl": "efficient_nd",
                "spatial_dims": 3,
                "in_channels": 1,
                "out_channels": 1,
                "model_channels": 8,
                "num_res_blocks": 1,
                "channel_mult": [1, 2],
                "attention_resolutions": [2],
                "num_heads": 2,
                "dim_head": 4,
                "use_linear_attn": True,
            },
            "scheduler": {"name": "flowmatch", "num_train_timesteps": 20},
            "model_type": "flow_matching",
        },
    }
    cfg_path = tmp_path / "cfg3d.json"
    cfg_path.write_text(json.dumps(cfg))

    class Wrap3D:
        """Adds the channel dim so windows flow as (1, D, H, W) 3D volumes."""

        def __init__(self, ds):
            self.ds = ds
            self.data = ds.data
            self.target_key = ds.target_key
            self.conditioning_key = ds.conditioning_key

        def __len__(self):
            return len(self.ds)

        def __getitem__(self, i):
            s = self.ds[i]
            out = dict(s)
            # LDCT windows come out channel-first as (window, H, W); for the
            # 3D UNet that's (1, D, H, W)
            out["target"] = s["target"][None] if s["target"].ndim == 3 else s["target"]
            out["image"] = s["image"][None] if s["image"] is not None and s["image"].ndim == 3 else s["image"]
            return out

    run_dir = train(Wrap3D(ds), cfg_path)
    assert (run_dir / "flow_last.pt").exists()
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert len(metrics) == 2
    assert np.isfinite(float(metrics[1].split(",")[1]))
