"""
Generate the JSON config corpus (same families/keys as the reference's 56
configs — configs/README.md + SURVEY.md §2.3 'Config corpus') so existing
reference workflows find every config family under configs/.

Run: python scripts/gen_configs.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "configs"

LDCT_PREPROCESS = {"MIN_B": -1024, "MAX_B": 3072, "slope": 1.0, "intersept": -1024}


def vae_training(output_dir, *, epochs=100, batch_size=4, img_size=256, data_root="data",
                 recon_type="l1", kl_weight=1e-6, reg_type="kl", perceptual_weight=0.0,
                 gan_weight=0.0, gan_start=0, codebook_weight=None, lr=1e-4, seed=42,
                 extra=None):
    cfg = {
        "output_dir": output_dir,
        "epochs": epochs,
        "batch_size": batch_size,
        "num_workers": 4,
        "learning_rate": lr,
        "weight_decay": 0.0,
        "kl_weight": kl_weight,
        "kl_anneal_steps": 0,
        "reg_type": reg_type,
        "recon_type": recon_type,
        "perceptual_weight": perceptual_weight,
        "gan_weight": gan_weight,
        "gan_start": gan_start,
        "disc_lr": None,
        "manual_device": None,
        "perceptual_device": None,
        "disc_device": None,
        "allow_microbatching": True,
        "use_amp": False,
        "save_every": 10,
        "seed": seed,
        "slice_count": 1,
        "img_size": img_size,
        "data_root": data_root,
        "save_images": True,
        "save_images_every": 1,
        "use_tensor_cache": True,
        "save_tensor_cache": False,
        "tensor_cache_subdir": "cache",
    }
    if reg_type == "vq":
        cfg.pop("kl_weight")
        cfg.pop("kl_anneal_steps")
        cfg["codebook_weight"] = codebook_weight if codebook_weight is not None else 1.0
    cfg.update(extra or {})
    return cfg


def kl_model(*, in_ch=3, resolution=256, base_ch=128, down_channels=(128, 256, 512, 512),
             z=4, embed=4, use_attention=True, num_res_blocks=2, extra=None):
    cfg = {
        "in_channels": in_ch,
        "out_channels": in_ch,
        "resolution": resolution,
        "base_ch": base_ch,
        "down_channels": list(down_channels),
        "num_res_blocks": num_res_blocks,
        "attn_resolutions": [],
        "z_channels": z,
        "embed_dim": embed,
        "dropout": 0.0,
        "use_attention": use_attention,
        "spatial_dims": 2,
        "emb_channels": None,
        "use_scale_shift_norm": False,
        "double_z": True,
        "attn_heads": 4,
        "attn_dim_head": 64,
        "latent_type": "kl",
        "ckpt_path": None,
        "model_type": "vae",
    }
    cfg.update(extra or {})
    return cfg


def vq_model(*, in_ch=3, resolution=256, base_ch=32, down_channels=(32, 64, 128, 256),
             z=256, embed=256, codebook_size=16384, quantizer_type="ema",
             discriminator_type="patchgan", extra=None):
    cfg = {
        "in_channels": in_ch,
        "out_channels": in_ch,
        "resolution": resolution,
        "base_ch": base_ch,
        "down_channels": list(down_channels),
        "num_res_blocks": 2,
        "attn_resolutions": [],
        "z_channels": z,
        "embed_dim": embed,
        "dropout": 0.0,
        "use_attention": False,
        "spatial_dims": 2,
        "emb_channels": None,
        "use_scale_shift_norm": False,
        "attn_heads": 1,
        "attn_dim_head": 64,
        "latent_type": "vq",
        "codebook_size": codebook_size,
        "vq_beta": 0.25,
        "vq_ema_decay": 0.99,
        "vq_ema_eps": 1e-5,
        "norm_type": "gn",
        "act": "silu",
        "ckpt_path": None,
        "model_type": "vae",
        "quantizer_type": quantizer_type,
        "discriminator_type": discriminator_type,
    }
    cfg.update(extra or {})
    return cfg


def denoise_training(output_dir, *, model_type, dataset="ldct", data_root="data/ldct",
                     img_size=256, channels=1, batch_size=8, epochs=100,
                     scheduler="ddpm", num_train=1000, num_inference=1000,
                     conditioning="concatenate", extra=None):
    cfg = {
        "data_root": data_root,
        "dataset": dataset,
        "output_dir": output_dir,
        "train_batch_size": batch_size,
        "batch_size": batch_size,
        "eval_batch_size": batch_size,
        "num_workers": 4,
        "num_epochs": epochs,
        "learning_rate": 1e-4,
        "weight_decay": 0.0,
        "gradient_accumulation_steps": 1,
        "lr_warmup_steps": 500,
        "scheduler": scheduler,
        "num_train_timesteps": num_train,
        "num_inference_steps": num_inference,
        "conditioning": conditioning,
        "channels": channels,
        "img_size": img_size,
        "norm": True,
        "save_model_epochs": 5,
        "mixed_precision": "no",
        "seed": 42,
        "save_images": True,
        "save_images_every": 10,
    }
    if dataset == "ldct":
        cfg["slice_count"] = 1
        cfg["load_ldct"] = True
        cfg["use_tensor_cache"] = True
    cfg.update(extra or {})
    return cfg


LDCT_UNET_DIFFUSERS = {
    "unet_impl": "diffusers_nd",
    "sample_size": 256,
    "in_channels": 1,
    "out_channels": 1,
    "layers_per_block": 2,
    "block_out_channels": [128, 128, 256, 256, 512, 512],
    "down_block_types": ["DownBlock2D", "DownBlock2D", "DownBlock2D",
                          "DownBlock2D", "AttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "AttnUpBlock2D", "UpBlock2D",
                        "UpBlock2D", "UpBlock2D", "UpBlock2D"],
    "attention_resolutions": [],
    "cross_attention_resolutions": [],
    "emb_activation_before_proj": False,
}

LDCT_UNET_COMPVIS = {
    "unet_impl": "efficient_nd",
    "sample_size": 256,
    "in_channels": 1,
    "out_channels": 1,
    "model_channels": 128,
    "num_res_blocks": 2,
    "channel_mult": [1, 1, 2, 2, 4, 4],
    "attention_resolutions": [16],
    "num_heads": 4,
    "dim_head": 64,
    "use_linear_attn": True,
    "use_scale_shift_norm": True,
}

MNIST_UNET_DIFFUSERS = {
    "unet_impl": "diffusers_nd",
    "sample_size": 32,
    "in_channels": 1,
    "out_channels": 1,
    "layers_per_block": 2,
    "block_out_channels": [64, 128, 128],
    "down_block_types": ["DownBlock2D", "AttnDownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "AttnUpBlock2D", "UpBlock2D"],
    "attention_resolutions": [16],
    "cross_attention_resolutions": [],
    "emb_activation_before_proj": False,
}

MNIST_UNET_COMPVIS = {
    "unet_impl": "efficient_nd",
    "sample_size": 32,
    "in_channels": 1,
    "out_channels": 1,
    "model_channels": 64,
    "num_res_blocks": 2,
    "channel_mult": [1, 2, 2],
    "attention_resolutions": [4],
    "num_heads": 4,
    "dim_head": 32,
    "use_linear_attn": True,
    "use_scale_shift_norm": True,
}


def sched_block(name, num_train=1000, num_inference=1000, params=None):
    return {
        "name": name,
        "num_train_timesteps": num_train,
        "num_inference_steps": num_inference,
        "params": params if params is not None else {"beta_start": 0.0001, "beta_end": 0.02},
    }


def denoise_cfg(training, unet, scheduler, model_type):
    return {"training": training, "model": {"unet": unet, "scheduler": scheduler, "model_type": model_type}}


def write(path: Path, payload: dict):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(payload, indent=2) + "\n")


def main():
    # ---- dataset.json selectors ------------------------------------------
    write(ROOT / "dataset.json", {"dataset_class": "datasets.base:BaseDataset"})
    write(ROOT / "MNIST" / "dataset.json", {"dataset_class": "datasets.mnist:MNISTDataset"})
    write(ROOT / "LDCT" / "dataset.json",
          {"dataset_class": "datasets.ldct:LDCTDataset", "preprocess_kwargs": LDCT_PREPROCESS})
    write(ROOT / "LDCT" / "PixelAttention" / "dataset.json",
          {"dataset_class": "datasets.ldct:LDCTAttentionDataset",
           "preprocess_kwargs": LDCT_PREPROCESS})
    write(ROOT / "diffusion" / "dataset.json", {"dataset_class": "datasets.ldct:LDCTDataset"})
    write(ROOT / "flow_matching" / "dataset.json", {"dataset_class": "datasets.ldct:LDCTDataset"})

    # ---- root VAE family --------------------------------------------------
    write(ROOT / "autoencoder_kl.json",
          {"training": vae_training("checkpoints/autoencoder_kl"), "model": kl_model()})
    write(ROOT / "autoencoder_kl_small.json",
          {"training": vae_training("checkpoints/autoencoder_kl_small"),
           "model": kl_model(base_ch=96, down_channels=(96, 192, 384, 384))})
    write(ROOT / "autoencoder_kl_bce_focal.json",
          {"training": vae_training("checkpoints/autoencoder_kl_bce_focal", recon_type="bce_focal"),
           "model": kl_model()})
    write(ROOT / "fmboost_autoencoder_kl.json",
          {"training": vae_training("checkpoints/fmboost_autoencoder_kl", perceptual_weight=1.0),
           "model": kl_model()})
    write(ROOT / "ldm_autoencoder_kl.json",
          {"training": vae_training("checkpoints/ldm_autoencoder_kl", perceptual_weight=1.0,
                                    gan_weight=0.5, gan_start=50),
           "model": kl_model()})
    write(ROOT / "vae" / "fmboost.json",
          {"training": vae_training("checkpoints/vae_fmboost", perceptual_weight=1.0),
           "model": kl_model()})
    write(ROOT / "vqvae.json",
          {"training": vae_training("checkpoints/vqvae_ema", reg_type="vq"),
           "model": vq_model(quantizer_type="ema")})
    write(ROOT / "vqvae_original.json",
          {"training": vae_training("checkpoints/vqvae_original", reg_type="vq"),
           "model": vq_model(quantizer_type="classic")})
    write(ROOT / "magvit_vqvae.json",
          {"training": vae_training("checkpoints/magvit_tokenizer", reg_type="vq"),
           "model": vq_model(quantizer_type="ema", discriminator_type="magvit")})

    # ---- LDCT VAE family ---------------------------------------------------
    ldct_kl = dict(in_ch=1)
    write(ROOT / "LDCT" / "LDCT_autoencoder_kl.json",
          {"training": vae_training("checkpoints/ldct_autoencoder_kl", data_root="data/ldct"),
           "model": kl_model(**ldct_kl)})
    write(ROOT / "LDCT" / "LDCT_autoencoder_kl_small.json",
          {"training": vae_training("checkpoints/ldct_autoencoder_kl_small", data_root="data/ldct"),
           "model": kl_model(base_ch=96, down_channels=(96, 192, 384, 384), **ldct_kl)})
    write(ROOT / "LDCT" / "LDCT_autoencoder_kl_bce_focal.json",
          {"training": vae_training("checkpoints/ldct_autoencoder_kl_bce_focal",
                                    data_root="data/ldct", recon_type="bce_focal"),
           "model": kl_model(**ldct_kl)})
    write(ROOT / "LDCT" / "LDCT_autoencoder_kl_test.json",
          {"training": vae_training("checkpoints/ldct_autoencoder_kl_test", data_root="data/ldct",
                                    epochs=2, batch_size=2, img_size=32),
           "model": kl_model(resolution=32, base_ch=16, down_channels=(16, 32), **ldct_kl)})
    write(ROOT / "LDCT" / "LDCT_fmboost_autoencoder_kl.json",
          {"training": vae_training("checkpoints/ldct_fmboost_autoencoder_kl",
                                    data_root="data/ldct", perceptual_weight=1.0),
           "model": kl_model(**ldct_kl)})
    write(ROOT / "LDCT" / "LDCT_vqvae.json",
          {"training": vae_training("checkpoints/ldct_vqvae_ema", data_root="data/ldct", reg_type="vq"),
           "model": vq_model(in_ch=1, quantizer_type="ema")})
    write(ROOT / "LDCT" / "LDCT_vqvae_original.json",
          {"training": vae_training("checkpoints/ldct_vqvae_original", data_root="data/ldct", reg_type="vq"),
           "model": vq_model(in_ch=1, quantizer_type="classic")})
    write(ROOT / "LDCT" / "LDCT_magvit_vqvae.json",
          {"training": vae_training("checkpoints/ldct_magvit_vqvae", data_root="data/ldct", reg_type="vq"),
           "model": vq_model(in_ch=1, quantizer_type="ema", discriminator_type="magvit")})

    # ---- MNIST VAE family ---------------------------------------------------
    mnist_vae_tr = dict(data_root="data/mnist", img_size=32, batch_size=128, epochs=15,
                        lr=1e-3, recon_type="bce", kl_weight=5e-4,
                        extra={"download": True})
    write(ROOT / "MNIST" / "mnist_autoencoder_kl.json",
          {"training": vae_training("checkpoints/mnist_autoencoder_kl", **mnist_vae_tr),
           "model": kl_model(in_ch=1, resolution=32, base_ch=64,
                             down_channels=(64, 128, 256), z=8, embed=8, use_attention=False)})
    write(ROOT / "MNIST" / "mnist_autoencoder_kl_mini.json",
          {"training": vae_training("checkpoints/mnist_autoencoder_kl_mini", **mnist_vae_tr),
           "model": kl_model(in_ch=1, resolution=32, base_ch=16,
                             down_channels=(16, 32), z=4, embed=4, use_attention=False)})
    mnist_vq_tr = dict(data_root="data/mnist", img_size=32, batch_size=128, epochs=15,
                       reg_type="vq", extra={"download": True})
    write(ROOT / "MNIST" / "mnist_vqvae.json",
          {"training": vae_training("checkpoints/mnist_vqvae", **mnist_vq_tr),
           "model": vq_model(in_ch=1, resolution=32, base_ch=16, down_channels=(16, 32, 64),
                             z=16, embed=16, codebook_size=512, quantizer_type="ema")})
    write(ROOT / "MNIST" / "mnist_vqvae_original.json",
          {"training": vae_training("checkpoints/mnist_vqvae_original", **mnist_vq_tr),
           "model": vq_model(in_ch=1, resolution=32, base_ch=16, down_channels=(16, 32, 64),
                             z=16, embed=16, codebook_size=512, quantizer_type="classic")})
    write(ROOT / "MNIST" / "mnist_magvit_vqvae.json",
          {"training": vae_training("checkpoints/mnist_magvit_vqvae", **mnist_vq_tr),
           "model": vq_model(in_ch=1, resolution=32, base_ch=16, down_channels=(16, 32, 64),
                             z=16, embed=16, codebook_size=512, quantizer_type="ema",
                             discriminator_type="magvit")})

    # ---- LDCT denoising family ----------------------------------------------
    for family, model_type, sched in (("ddpm", "diffusion", "ddpm"),
                                       ("flow_matching", "flow_matching", "flowmatch")):
        for impl, unet in (("diffusers_nd", LDCT_UNET_DIFFUSERS), ("compvis", LDCT_UNET_COMPVIS)):
            write(ROOT / "LDCT" / f"LDCT_{family}_{impl}.json", denoise_cfg(
                denoise_training(f"checkpoints/ldct_{family}_{impl}", model_type=model_type,
                                 scheduler=sched, epochs=500),
                unet, sched_block(sched), model_type))
        # tiny CPU smoke variant (e.g. LDCT_ddpm_test.json)
        tiny_unet = dict(LDCT_UNET_DIFFUSERS)
        tiny_unet.update({"sample_size": 32, "block_out_channels": [32, 64],
                          "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
                          "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
                          "layers_per_block": 1})
        write(ROOT / "LDCT" / f"LDCT_{family}_test.json", denoise_cfg(
            denoise_training(f"checkpoints/ldct_{family}_test", model_type=model_type,
                             scheduler=sched, epochs=2, batch_size=2, img_size=32,
                             num_train=100, num_inference=20),
            tiny_unet, sched_block(sched, 100, 20), model_type))

    # legacy diffusion/ + flow_matching/ directories
    for family, model_type, sched, subdir in (("ddpm", "diffusion", "ddpm", "diffusion"),
                                              ("flow_matching", "flow_matching", "flowmatch", "flow_matching")):
        write(ROOT / subdir / f"ldct_{family}.json", denoise_cfg(
            denoise_training(f"checkpoints/{subdir}", model_type=model_type, scheduler=sched),
            LDCT_UNET_DIFFUSERS, sched_block(sched), model_type))
        write(ROOT / subdir / f"ldct_{family}_diffusers_nd.json", denoise_cfg(
            denoise_training(f"checkpoints/{subdir}_diffusers_nd", model_type=model_type, scheduler=sched),
            LDCT_UNET_DIFFUSERS, sched_block(sched), model_type))
        write(ROOT / subdir / f"ldct_{family}_compvis.json", denoise_cfg(
            denoise_training(f"checkpoints/{subdir}_compvis", model_type=model_type, scheduler=sched),
            LDCT_UNET_COMPVIS, sched_block(sched), model_type))

    # ---- MNIST denoising family ----------------------------------------------
    for family, model_type, sched in (("ddpm", "diffusion", "ddpm"),
                                       ("flow_matching", "flow_matching", "flowmatch")):
        for impl, unet in (("diffusers_nd", MNIST_UNET_DIFFUSERS), ("compvis", MNIST_UNET_COMPVIS)):
            tr = denoise_training(
                f"checkpoints/mnist_{family}_{impl}", model_type=model_type,
                dataset="mnist", data_root="data/mnist", img_size=32,
                batch_size=32, epochs=50, scheduler=sched,
                extra={"save_model_epochs": 5},
            )
            params = {"beta_start": 0.00085, "beta_end": 0.012} if sched == "ddpm" else {}
            write(ROOT / "MNIST" / f"mnist_{family}_{impl}.json", denoise_cfg(
                tr, unet, sched_block(sched, params=params), model_type))

    # ---- PixelAttention family ------------------------------------------------
    for family, model_type, sched in (("ddpm", "diffusion", "ddpm"),
                                       ("flow_matching", "flow_matching", "flowmatch")):
        attn_tr = dict(
            conditioning="attention", epochs=500,
            extra={"latent_norm": "standardize",
                   "split_file": "data/ldct/AttentionDataset/train.txt"},
        )
        attn_unet_diff = dict(LDCT_UNET_DIFFUSERS)
        attn_unet_diff["cross_attention_dim"] = 4
        write(ROOT / "LDCT" / "PixelAttention" / f"LDCT_{family}_attention_diffusers_nd.json",
              denoise_cfg(denoise_training(f"checkpoints/ldct_{family}_attention_diffusers_nd",
                                           model_type=model_type, scheduler=sched, **attn_tr),
                          attn_unet_diff, sched_block(sched), model_type))
        attn_unet_compvis = dict(LDCT_UNET_COMPVIS)
        attn_unet_compvis.update({"cross_attention_dim": 4, "cross_attention_resolutions": [16],
                                  "cross_attention_in_middle": True})
        write(ROOT / "LDCT" / "PixelAttention" / f"LDCT_{family}_attention_compvis.json",
              denoise_cfg(denoise_training(f"checkpoints/ldct_{family}_attention_compvis",
                                           model_type=model_type, scheduler=sched, **attn_tr),
                          attn_unet_compvis, sched_block(sched), model_type))
        # default (efficient) alias without suffix
        write(ROOT / "LDCT" / "PixelAttention" / f"LDCT_{family}_attention.json",
              denoise_cfg(denoise_training(f"checkpoints/ldct_{family}_attention",
                                           model_type=model_type, scheduler=sched, **attn_tr),
                          attn_unet_compvis, sched_block(sched), model_type))
    # attention test variant
    attn_test_unet = {
        "unet_impl": "diffusers_nd", "sample_size": 32, "in_channels": 1, "out_channels": 1,
        "layers_per_block": 1, "block_out_channels": [16, 32], "norm_num_groups": 8,
        "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
        "cross_attention_dim": 4,
    }
    write(ROOT / "LDCT" / "PixelAttention" / "LDCT_ddpm_attention_test.json", denoise_cfg(
        denoise_training("checkpoints/ldct_ddpm_attention_test", model_type="diffusion",
                         scheduler="ddpm", conditioning="attention", epochs=2,
                         batch_size=2, img_size=32, num_train=100, num_inference=10,
                         extra={"latent_norm": "standardize"}),
        attn_test_unet, sched_block("ddpm", 100, 10), "diffusion"))

    print(f"Wrote configs under {ROOT}")


if __name__ == "__main__":
    main()
