"""VAE run_model flows: evaluate/sample/encode/decode via VAEHandler against a
freshly trained tiny KL-VAE (the autoencoder_like engine e2e, incl. the
experiment-dir behavior the reference's evaluate() crashes on)."""

import json
from pathlib import Path

import numpy as np
import pytest

from fmdm_tpu.sample.handlers import VAEHandler


def _handler(run_dir, **over):
    kwargs = dict(
        ckpt_dir=run_dir, data_txt=None, save=False, output_dir=None,
        batch_size=4, device=None, seed=2, timestep=None, num_samples=6,
        save_input=False, save_conditioning=False, num_inference_steps=None,
        start_step=None, last_n_steps=None, scheduler=None, save_tensor_cache=False,
    )
    kwargs.update(over)
    return VAEHandler(**kwargs)


@pytest.fixture(scope="module")
def trained_vae(tmp_path_factory):
    from tests.test_vae import _vae_cfg
    from tests.test_train_e2e import TinyMNIST
    from fmdm_tpu.train.vae_lib import train

    tmp_path = tmp_path_factory.mktemp("vae_rm")
    cfg_path = _vae_cfg(tmp_path, "kl", extra_training={"epochs": 1, "gan_weight": 0.0,
                                                        "save_images": False})
    ds = TinyMNIST(tmp_path / "data", train=True, img_size=32, n=12)
    return train(ds, cfg_path)


def test_vae_evaluate(trained_vae, tmp_path):
    h = _handler(trained_vae, save=False, output_dir=str(tmp_path / "exp"))
    h.evaluate()
    exp_dirs = list((tmp_path / "exp").iterdir())
    assert len(exp_dirs) == 1
    exp = exp_dirs[0]
    metrics = (exp / "eval_metrics.csv").read_text().strip().splitlines()
    header = metrics[0].split(",")
    assert header[:4] == ["samples", "mse", "psnr", "ssim"]
    row = dict(zip(header, metrics[1].split(",")))
    assert int(row["samples"]) == 6
    assert float(row["psnr"]) > 0
    assert (exp / "eval_metrics_per_image.csv").exists()
    assert (exp / "run_config.json").exists()


def test_vae_sample_and_encode_decode(trained_vae, tmp_path):
    h = _handler(trained_vae, save=True, output_dir=str(tmp_path / "out"), num_samples=4)
    h.sample()
    assert (tmp_path / "out" / "predicted").exists()
    h2 = _handler(trained_vae, save=True, output_dir=str(tmp_path / "enc"), num_samples=4)
    h2.encode()  # creates an experiment dir with latents under samples/
    assert any((tmp_path / "enc").rglob("*.pt")) or any((tmp_path / "enc").rglob("*.png"))


def test_vae_debug_compare(trained_vae, tmp_path):
    h = _handler(trained_vae, num_samples=1, output_dir=str(tmp_path / "dbg"))
    h.debug_compare()
    stats = json.loads((tmp_path / "dbg" / "stats.json").read_text())
    assert stats["model_type"] == "vae"
    assert (tmp_path / "dbg" / "generated_clamped.pt").exists()


def test_vae_build_tensor_cache(trained_vae):
    h = _handler(trained_vae, num_samples=5)
    assert h.build_tensor_cache() == 5
