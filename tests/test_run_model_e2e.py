"""End-to-end run_model flows against a freshly trained tiny model:
evaluate/sample/encode/build_tensor_cache on the real handler stack."""

import json
from pathlib import Path

import numpy as np
import pytest

from fmdm_tpu.sample.handlers import DiffusionHandler, VAEHandler


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    tmp_path = tmp_path_factory.mktemp("runmodel")
    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=16)
    run_dir = train(ds, cfg_path)
    return run_dir


def test_evaluate_writes_metrics(trained_run):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=4, seed=1, num_samples=8,
        num_inference_steps=3, save=False,
        data_txt=None, output_dir=None, device=None,
        save_input=False, save_conditioning=False,
        start_step=None, last_n_steps=None, scheduler="ddim",
        save_tensor_cache=False, timestep=None,
    )
    handler.evaluate()
    metrics = (trained_run / "eval_metrics.csv").read_text().strip().splitlines()
    header = metrics[0].split(",")
    assert header == ["samples", "mse", "psnr", "ssim", "ssim_enabled", "model_seconds",
                      "model_samples_per_second", "model_seconds_per_sample", "model_calls"]
    row = dict(zip(header, metrics[1].split(",")))
    assert int(row["samples"]) == 8
    assert float(row["mse"]) > 0
    assert float(row["model_seconds"]) > 0
    per_img = (trained_run / "eval_metrics_per_image.csv").read_text().strip().splitlines()
    assert per_img[0].split(",") == ["sample_index", "img_id", "img_path", "mse", "psnr", "ssim"]
    assert len(per_img) == 9


def test_evaluate_experiment_dir(trained_run, tmp_path):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=4, seed=1, num_samples=4,
        num_inference_steps=3, save=True, output_dir=str(tmp_path / "exp"),
        scheduler="dpmsolver++",
        data_txt=None, device=None, save_input=True, save_conditioning=False,
        start_step=None, last_n_steps=None, save_tensor_cache=False, timestep=None,
    )
    handler.evaluate()
    exp_dirs = list((tmp_path / "exp").iterdir())
    assert len(exp_dirs) == 1
    exp = exp_dirs[0]
    assert "dpmsolverpp" in exp.name
    assert (exp / "eval_metrics.csv").exists()
    assert (exp / "eval_metrics_per_image.csv").exists()
    assert (exp / "run_config.json").exists()
    assert (exp / "samples" / "predicted").exists() or (exp / "samples").exists()


def test_sample_and_partial_denoise(trained_run, tmp_path):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=4, seed=1, num_samples=4,
        num_inference_steps=5, last_n_steps=2, save=True,
        output_dir=str(tmp_path / "out"),
        data_txt=None, device=None, save_input=False, save_conditioning=False,
        start_step=None, scheduler=None, save_tensor_cache=False, timestep=None,
    )
    handler.sample()  # == decode with init_from_reference (last_n_steps set)
    assert (tmp_path / "out" / "predicted").exists()


def test_encode_mode(trained_run, tmp_path):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=4, seed=1, num_samples=4,
        timestep=10, save=True, output_dir=str(tmp_path / "enc"),
        data_txt=None, device=None, save_input=False, save_conditioning=False,
        num_inference_steps=None, start_step=None, last_n_steps=None,
        scheduler=None, save_tensor_cache=False,
    )
    handler.encode()
    assert any((tmp_path / "enc").rglob("*"))


def test_build_tensor_cache(trained_run):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=4, seed=1, num_samples=6,
        data_txt=None, save=False, output_dir=None, device=None,
        save_input=False, save_conditioning=False, num_inference_steps=None,
        start_step=None, last_n_steps=None, scheduler=None,
        save_tensor_cache=False, timestep=None,
    )
    assert handler.build_tensor_cache() == 6


def test_debug_compare(trained_run, tmp_path):
    handler = DiffusionHandler(
        ckpt_dir=trained_run, batch_size=1, seed=1, num_samples=1,
        num_inference_steps=3, output_dir=str(tmp_path / "dbg"),
        data_txt=None, save=False, device=None, save_input=False,
        save_conditioning=False, start_step=None, last_n_steps=None,
        scheduler=None, save_tensor_cache=False, timestep=None,
    )
    handler.debug_compare()
    stats = json.loads((tmp_path / "dbg" / "stats.json").read_text())
    assert stats["generated_clamped"]["present"]
    assert (tmp_path / "dbg" / "generated_raw.pt").exists()
