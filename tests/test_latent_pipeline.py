"""Full latent-conditioning pipeline (the LDCT PixelAttention workflow,
SURVEY.md §2.3 'configs corpus' attention family): train a tiny KL-VAE,
dump latents via the autoencoder engine, feed them as attention conditioning
(LDCTAttentionDataset semantics) into a cross-attention diffusion trainer,
then sample with attention conditioning."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_latent_conditioned_diffusion(tmp_path):
    from tests.test_train_e2e import TinyMNIST
    from fmdm_tpu.sample.vae_utils import build_vae_model, encode_vae_batch
    from fmdm_tpu.train.vae_lib import train as train_vae
    from fmdm_tpu.train.diffusion_lib import train as train_diff
    from fmdm_tpu.utils.config import load_json_config
    from tests.test_vae import _vae_cfg

    # 1. tiny KL-VAE
    vae_cfg_path = _vae_cfg(tmp_path, "kl", extra_training={
        "epochs": 1, "gan_weight": 0.0, "save_images": False,
    })
    ds = TinyMNIST(tmp_path / "data", train=True, img_size=32, n=12)
    vae_run = train_vae(ds, vae_cfg_path)

    # 2. encode targets to latents (posterior mode), the conditioning source
    cfg = load_json_config(vae_run / "train_config.json")
    model, params = build_vae_model(cfg, ckpt_path=vae_run / "vae_best.pt")
    targets = np.stack([np.asarray(ds[i]["target"], np.float32) for i in range(len(ds))])
    latents = np.asarray(encode_vae_batch(model, params, jnp.asarray(targets)))
    assert latents.shape == (12, 2, 16, 16)  # embed_dim 2, res/2

    # 3. attention-conditioned diffusion: image = raw latents (the
    #    LDCTAttentionDataset skips preprocessing for conditioning)
    class LatentCondDataset:
        def __init__(self, targets, latents):
            self.targets, self.latents = targets, latents
            self.data = [{"target": f"t{i}", "Case": None} for i in range(len(targets))]
            self.target_key = "target"
            self.conditioning_key = "conditioning"

        def __len__(self):
            return len(self.targets)

        def __getitem__(self, i):
            return {"target": self.targets[i], "image": self.latents[i],
                    "img_id": f"s{i}", "img_path": None, "img_size": (32, 32)}

    diff_cfg = {
        "training": {
            "data_root": str(tmp_path / "data"),
            "output_dir": str(tmp_path / "latent_diff"),
            "train_batch_size": 4,
            "num_epochs": 1,
            "learning_rate": 1e-3,
            "scheduler": "ddpm",
            "num_train_timesteps": 50,
            "num_inference_steps": 4,
            "conditioning": "attention",
            "latent_norm": "standardize",
            "channels": 1,
            "img_size": 32,
            "seed": 11,
            "save_images": False,
        },
        "model": {
            "unet": {
                "unet_impl": "diffusers_nd",
                "sample_size": 32,
                "in_channels": 1,
                "out_channels": 1,
                "layers_per_block": 1,
                "block_out_channels": [8, 16],
                "norm_num_groups": 4,
                "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
                "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
                "cross_attention_dim": 2,
            },
            "scheduler": {"name": "ddpm", "num_train_timesteps": 50},
            "model_type": "diffusion",
        },
    }
    cfg_path = tmp_path / "latent_diff.json"
    cfg_path.write_text(json.dumps(diff_cfg))
    lat_ds = LatentCondDataset(targets, latents)
    run_dir = train_diff(lat_ds, cfg_path)
    assert (run_dir / "diff_last.pt").exists()
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert np.isfinite(float(metrics[1].split(",")[1]))

    # 4. attention-conditioned sampling through the compiled engine
    from fmdm_tpu.sample.diffusion_utils import build_diffusion_model, decode_diffusion_batch
    from fmdm_tpu.utils.config import load_json_config as load_cfg

    run_cfg = load_cfg(run_dir / "train_config.json")
    dmodel, dparams = build_diffusion_model(run_cfg, ckpt_path=run_dir / "diff_last.pt")
    out = decode_diffusion_batch(
        dmodel, dparams, run_cfg["training"], run_cfg["model"],
        (4, 1, 32, 32), jnp.asarray(latents[:4]), rng=jax.random.PRNGKey(0),
    )
    assert out.shape == (4, 1, 32, 32)
    assert np.isfinite(np.asarray(out)).all()
