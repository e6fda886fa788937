"""Auxiliary CLI surfaces: the legacy per-trainer entrypoint
(fmdm_tpu/legacy_train.py, reference src/train.py:15-57) and the
debug_visual_only path (reference diffusion_lib.py:254-326)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest


def _mnist_cfg(tmp_path, num_epochs=1):
    from tests.test_train_e2e import _write_cfg

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = num_epochs
    # point the dataset builder at the synthetic-fallback MNIST
    cfg["training"]["dataset"] = "mnist"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path, cfg


def test_legacy_train_overrides(tmp_path, monkeypatch):
    """Legacy CLI: dispatch + override dict land in the trainer config
    (the reference's version crashes on a stale signature; ours works)."""
    from fmdm_tpu import legacy_train

    cfg_path, _ = _mnist_cfg(tmp_path)

    seen = {}

    class FakeModule:
        @staticmethod
        def train(train_ds, json_path, val_dataset=None, resume=None):
            seen["cfg"] = json.loads(Path(json_path).read_text())
            seen["n"] = len(train_ds)
            return tmp_path / "out"

    monkeypatch.setattr(legacy_train, "import_module", lambda name: FakeModule)
    monkeypatch.setattr(
        sys, "argv",
        ["legacy_train", "diffusion", "--config", str(cfg_path),
         "--epochs", "3", "--batch_size", "2", "--img_size", "16"],
    )
    legacy_train.main()
    t = seen["cfg"]["training"]
    assert t["num_epochs"] == 3 and t["train_batch_size"] == 2 and t["img_size"] == 16
    assert seen["n"] > 0


def test_legacy_train_unknown_trainer(tmp_path, monkeypatch):
    from fmdm_tpu import legacy_train

    cfg_path, _ = _mnist_cfg(tmp_path)
    monkeypatch.setattr(sys, "argv", ["legacy_train", "nope", "--config", str(cfg_path)])
    with pytest.raises(SystemExit):
        legacy_train.main()


def test_debug_visual_only(tmp_path):
    """Train 1 epoch, then run the visual-probe-only path from the checkpoint."""
    from tests.test_train_e2e import TinyMNIST
    from fmdm_tpu.train.diffusion_lib import train
    from fmdm_tpu.train.denoise_lib import debug_visual_only

    cfg_path, _ = _mnist_cfg(tmp_path)
    ds = TinyMNIST(tmp_path / "data", train=True)
    run_dir = train(ds, cfg_path)

    out = debug_visual_only(
        ds, run_dir / "train_config.json", run_dir / "diff_last.pt",
        output_dir=tmp_path / "dbg", visual_samples=4, seed=3,
    )
    pngs = list(Path(out).rglob("*.png"))
    assert pngs, f"debug_visual_only wrote no images under {out}"


def test_run_tests_module_walk_and_hooks():
    """run_tests.py module walk covers the whole package; embedded
    run_self_tests hooks exist and pass."""
    import importlib

    sys.path.insert(0, "/root/repo")
    import run_tests

    names = run_tests.iter_modules()
    assert "fmdm_tpu.schedulers.registry" in names
    assert "fmdm_tpu.data.grain_pipeline" in names
    assert len(names) > 50
    # at least one embedded hook exists and passes
    mod = importlib.import_module("fmdm_tpu.schedulers.registry")
    mod.run_self_tests()
