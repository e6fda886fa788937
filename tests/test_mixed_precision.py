"""bf16 mixed-precision training path (`mixed_precision: bf16` — the AMP
replacement, SURVEY.md §2.2): losses stay finite, params stay f32."""

import json

import numpy as np

import jax


def test_bf16_training(tmp_path):
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train
    from fmdm_tpu.utils.checkpoint import load_checkpoint
    from fmdm_tpu.nn.module import flatten_params

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["mixed_precision"] = "bf16"
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=16)
    run_dir = train(ds, cfg_path)
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    loss = float(metrics[1].split(",")[1])
    assert np.isfinite(loss) and loss > 0
    payload = load_checkpoint(run_dir / "diff_last.pt")
    flat = flatten_params(payload["model"])
    # master params remain f32 (bf16 is a compute policy, not storage)
    assert all(np.asarray(v).dtype == np.float32 for v in flat.values())


def test_remat_training(tmp_path):
    """training.remat rematerializes the forward in backward (identical loss)."""
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["remat"] = True
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=16)
    run_dir = train(ds, cfg_path)
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert np.isfinite(float(metrics[1].split(",")[1]))
