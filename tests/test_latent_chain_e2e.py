"""End-to-end latent-diffusion chain through the production stack
(VERDICT r3 item 5 wiring): LatentDataset -> latent-space denoiser training ->
run_model evaluate with --latent_vae (scan-denoise in latent space ->
VAE-decode -> pixel-space metrics).

Reference composition: /root/reference/src/models/vae/kl.py:118-136 (latent
scaling + decode) and the tensor-cache latent feedback of
src/datasets/ldct.py:286-293."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax

from fmdm_tpu.sample.handlers import DiffusionHandler

EMBED = 2
LAT = 8   # latent spatial size
PIX = 16  # pixel size (VAE downsamples 2x per stage, 1 stage here)


def _make_vae_run(tmp_path: Path):
    """A real (randomly initialized) AutoencoderKL run dir: train_config.json
    + vae_last.pt, resolvable by run_model's --latent_vae loader."""
    from fmdm_tpu.sample.vae_utils import build_vae_model
    from fmdm_tpu.utils.checkpoint import save_checkpoint

    vae_dir = tmp_path / "vae_run"
    vae_dir.mkdir(parents=True)
    cfg = {
        "training": {"recon_type": "l1", "seed": 0},
        "model": {"model_type": "vae", "latent_type": "kl", "in_channels": 1,
                  "out_channels": 1, "resolution": PIX, "base_ch": 8,
                  "down_channels": [8, 16], "num_res_blocks": 1,
                  "z_channels": EMBED, "embed_dim": EMBED, "double_z": True,
                  "use_attention": False},
    }
    (vae_dir / "train_config.json").write_text(json.dumps(cfg))
    loaded = json.loads((vae_dir / "train_config.json").read_text())
    loaded["__config_path__"] = str(vae_dir / "train_config.json")
    model, params = build_vae_model(loaded, rng=jax.random.PRNGKey(0))
    save_checkpoint({"model": params, "optimizer": None, "epoch": 1,
                     "best_metric": 0.0}, vae_dir / "vae_last.pt")
    return vae_dir, model, params


def _make_latent_root(tmp_path: Path, vae):
    """Latent dataset root: encode random pixel images through the VAE."""
    from fmdm_tpu.sample.vae_utils import encode_vae_batch

    _, model, params = vae
    root = tmp_path / "latents"
    (root / "data").mkdir(parents=True)
    rng = np.random.RandomState(0)
    scale = 2.0
    for split, n in (("train", 12), ("test", 6)):
        rows = []
        for i in range(n):
            img = rng.rand(1, 1, PIX, PIX).astype(np.float32)
            z = np.asarray(encode_vae_batch(model, params, img))[0] * scale
            cond = z + 0.1 * rng.randn(*z.shape).astype(np.float32)
            tp, cp = f"data/{split}_{i}_t.npy", f"data/{split}_{i}_c.npy"
            np.save(root / tp, z.astype(np.float32))
            np.save(root / cp, cond.astype(np.float32))
            rows.append(f"C{i}\t{tp}\t{cp}")
        (root / f"{split}.txt").write_text(
            "Case\ttarget\tconditioning\n" + "\n".join(rows) + "\n")
    (root / "dataset.json").write_text(json.dumps(
        {"dataset_class": "fmdm_tpu.data.latent:LatentDataset"}))
    return root, scale


@pytest.fixture(scope="module")
def latent_chain(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("latentchain")
    vae = _make_vae_run(tmp_path)
    latent_root, scale = _make_latent_root(tmp_path, vae)

    # train the latent denoiser through the real trainer + dataset builders
    from fmdm_tpu.data.dataset_utils import build_train_val_datasets
    from fmdm_tpu.train.diffusion_lib import train

    cfg = {
        "training": {
            "data_root": str(latent_root),
            "output_dir": str(tmp_path / "diff_run"),
            "train_batch_size": 4, "num_epochs": 1,
            "learning_rate": 1e-3, "weight_decay": 0.0, "lr_warmup_steps": 1,
            "scheduler": "ddpm", "num_train_timesteps": 50,
            "num_inference_steps": 4, "conditioning": "concatenate",
            "channels": EMBED, "img_size": LAT, "save_model_epochs": 1,
            "mixed_precision": "no", "seed": 3, "save_images": False,
            "use_tensor_cache": False,
        },
        "model": {
            "unet": {"unet_impl": "diffusers_nd", "sample_size": LAT,
                     "in_channels": EMBED, "out_channels": EMBED,
                     "layers_per_block": 1, "block_out_channels": [8, 8],
                     "down_block_types": ["DownBlock2D", "DownBlock2D"],
                     "up_block_types": ["UpBlock2D", "UpBlock2D"],
                     "norm_num_groups": 4},
            "scheduler": {"name": "ddpm", "num_train_timesteps": 50,
                          "num_inference_steps": 4},
            "model_type": "diffusion",
        },
    }
    cfg_path = latent_root / "configs" / "latent_diffusion.json"
    cfg_path.parent.mkdir(parents=True)
    cfg_path.write_text(json.dumps(cfg))
    from fmdm_tpu.utils.config import load_json_config

    train_ds, _ = build_train_val_datasets(load_json_config(cfg_path))
    # LatentDataset passed latents through untouched (no [0,1] clamp)
    sample = train_ds[0]
    assert sample["target"].shape == (EMBED, LAT, LAT)
    assert sample["target"].min() < 0.0
    run_dir = train(train_ds, cfg_path)
    return vae[0], latent_root, scale, run_dir


def test_latent_dataset_builds_through_config_walk(latent_chain):
    _, latent_root, _, run_dir = latent_chain
    assert (Path(run_dir) / "diff_last.pt").exists()


def test_latent_dataset_loads_real_conditioning_column(latent_chain):
    """Regression (r4): with training.conditioning='concatenate' the built
    LatentDataset must load the conditioning COLUMN — not fall back to the
    base class's image := target (which silently trains/evaluates a
    'conditioned' model against its own ground truth)."""
    from fmdm_tpu.sample.sampling_utils import build_sampling_dataset, load_run_config

    _, latent_root, _, run_dir = latent_chain
    cfg = load_run_config(Path(run_dir))
    for evaluate in (False, True):
        ds = build_sampling_dataset(cfg, None, evaluate=evaluate)
        assert getattr(ds, "conditioning", False) is True
        s = ds[0]
        assert s["image"].shape == s["target"].shape
        assert not np.allclose(s["image"], s["target"]), \
            "conditioning column not loaded: image == target (leakage)"


def test_evaluate_with_latent_vae_decodes_to_pixels(latent_chain, tmp_path):
    vae_dir, latent_root, scale, run_dir = latent_chain
    handler = DiffusionHandler(
        ckpt_dir=run_dir, batch_size=3, seed=1, num_samples=6,
        num_inference_steps=4, save=True, output_dir=str(tmp_path / "exp"),
        scheduler="dpmsolver++",
        latent_vae=f"{vae_dir}?scale={scale}",
        data_txt=None, device=None, save_input=False, save_conditioning=False,
        start_step=None, last_n_steps=None, save_tensor_cache=False, timestep=None,
    )
    handler.evaluate()
    exps = sorted((tmp_path / "exp").glob("**/eval_metrics.csv"))
    assert exps, "no eval metrics written"
    lines = exps[-1].read_text().strip().splitlines()
    row = dict(zip(lines[0].split(","), lines[1].split(",")))
    assert int(row["samples"]) == 6
    # pixel-space metrics are finite and bounded (decoded [0,1] images)
    assert 0.0 <= float(row["mse"]) <= 1.0
    assert np.isfinite(float(row["psnr"]))
    # predictions were DECODED before saving: pixel-shaped artifacts on disk
    preds = list((tmp_path / "exp").glob("**/predicted/**/*.*"))
    assert preds, "no predicted artifacts saved"


def test_latent_vae_rejects_unknown_param(latent_chain, tmp_path):
    vae_dir, _, _, run_dir = latent_chain
    handler = DiffusionHandler(
        ckpt_dir=run_dir, batch_size=3, seed=1, num_samples=3,
        num_inference_steps=4, save=False, output_dir=None,
        scheduler=None, latent_vae=f"{vae_dir}?scael=2.0",
        data_txt=None, device=None, save_input=False, save_conditioning=False,
        start_step=None, last_n_steps=None, save_tensor_cache=False, timestep=None,
    )
    with pytest.raises(ValueError, match="scael"):
        handler.evaluate()
