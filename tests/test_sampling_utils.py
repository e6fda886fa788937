"""Regression tests mirroring the reference
tests/test_sampling_utils_regressions.py:24-78 plus legacy-config synthesis."""

import json
from pathlib import Path

import numpy as np
import pytest

from fmdm_tpu.data.dataset_utils import iter_batches
from fmdm_tpu.sample import sampling_utils as su


def test_resolve_sample_indices_deterministic():
    class DS:
        def __len__(self):
            return 100

    a = su.resolve_sample_indices(DS(), 10, seed=3)
    b = su.resolve_sample_indices(DS(), 10, seed=3)
    assert a == b and len(a) == 10
    assert su.resolve_sample_indices(DS(), None) == list(range(100))
    assert su.resolve_sample_indices(DS(), 200) == list(range(100))


def test_resolve_checkpoint_prefers_best(tmp_path):
    (tmp_path / "diff_last.pt").write_bytes(b"x")
    assert su.resolve_checkpoint(tmp_path, "diffusion").name == "diff_last.pt"
    (tmp_path / "diff_best.pt").write_bytes(b"x")
    assert su.resolve_checkpoint(tmp_path, "diffusion").name == "diff_best.pt"
    with pytest.raises(FileNotFoundError):
        su.resolve_checkpoint(tmp_path, "vae")


def test_build_sampling_dataset_eval_namespace(monkeypatch):
    captured = {}

    def fake_builder(training_cfg, model_cfg, train, cfg_path):
        captured.update(training_cfg)
        captured["train"] = train
        return "DS"

    monkeypatch.setattr(su, "build_dataset_from_config", fake_builder)
    cfg = {"training": {"tensor_cache_subdir": "cache", "split_file": "train.txt"},
           "model": {}, "__config_path__": "/tmp/cfg.json"}
    out = su.build_sampling_dataset(cfg, None, evaluate=True)
    assert out == "DS"
    assert captured["tensor_cache_subdir"] == "cache_eval"
    assert "split_file" not in captured  # dropped in evaluate mode
    assert captured["train"] is False

    captured.clear()
    su.build_sampling_dataset(cfg, "override.txt", evaluate=False)
    assert captured["split_file"] == "override.txt"
    assert captured["tensor_cache_subdir"] == "cache"


def test_iter_batches_shapes():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"target": np.zeros((1, 2, 2)), "img_id": i}

    batches = list(iter_batches(DS(), 4))
    assert [len(b[0]) for b in batches] == [4, 4, 2]


def test_load_run_config_and_experiment_dir(tmp_path):
    cfg_path = tmp_path / "train_config.json"
    cfg_path.write_text(json.dumps({"training": {"data_root": str(tmp_path)}, "model": {"model_type": "vae"}}))
    loaded = su.load_run_config(tmp_path)
    assert "__config_path__" in loaded
    assert su.resolve_output_root(tmp_path, None, True) == tmp_path / "outputs"
    assert su.resolve_output_root(tmp_path, None, False) is None
    exp = su.create_experiment_dir(tmp_path / "exp", "evaluate", "dpmsolver++", None, None, 50, 8, 42, 4)
    assert exp is not None and exp.exists()
    assert "dpmsolverpp" in exp.name and "steps50" in exp.name and "ns8" in exp.name
    assert su.create_experiment_dir(None, "evaluate", None, None, None, None, None, 0, 1) is None


def test_legacy_diffusers_folder_synthesis(tmp_path):
    (tmp_path / "scheduler").mkdir()
    (tmp_path / "unet").mkdir()
    (tmp_path / "model_index.json").write_text(json.dumps({"_class_name": "DDPMPipeline"}))
    (tmp_path / "scheduler" / "scheduler_config.json").write_text(json.dumps({
        "_class_name": "DDPMScheduler", "num_train_timesteps": 500,
        "beta_start": 0.0001, "beta_end": 0.02,
    }))
    (tmp_path / "unet" / "config.json").write_text(json.dumps({
        "sample_size": 64, "in_channels": 2, "out_channels": 1,
        "layers_per_block": 2, "block_out_channels": [32, 64],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
        "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
    }))
    cfg = su.load_run_config(tmp_path)
    assert cfg["model"]["model_type"] == "diffusion"
    assert cfg["training"]["conditioning"] == "concatenate"  # in > out
    assert cfg["model"]["scheduler"]["name"] == "ddpm"
    assert cfg["model"]["unet"]["in_channels_already_conditioned"] is True
    assert cfg["model"]["scheduler"]["params"]["beta_start"] == 0.0001
