"""On-chip latent-diffusion sweep (VERDICT r3 item 5; BASELINE.json configs[4]).

Full chain, all through the production CLIs:
  1. train an AutoencoderKL on synthetic 256² LDCT phantoms  (train.py)
  2. encode every slice to latents (posterior mode), scale to ~unit std,
     write a LatentDataset root (fmdm_tpu/data/latent.py)
  3. train a latent-space denoiser, concatenate-conditioned on the LDCT
     latent                                                   (train.py)
  4. sweep ddim / dpmsolver++ / unipc through
     run_model --mode evaluate --latent_vae '<vae_run>?scale=S'
     = scan-denoise in latent space -> VAE-decode -> pixel PSNR/SSIM
     (reference composition: /root/reference/src/models/vae/kl.py:118-136)

Also reports the VAE's own reconstruction PSNR (the chain's ceiling).

Usage: python scripts/latent_diffusion_sweep.py --root /tmp/latent_sweep \
           [--pixel-root /tmp/flagship_r4] [--vae-epochs 30] [--diff-epochs 300]
"""

from __future__ import annotations

import argparse
import csv
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))

from flagship_quality_sweep import gen_dataset, run  # noqa: E402

ALIASES = ["ddim", "dpmsolver++", "unipc"]
EMBED_DIM = 4


def write_vae_config(root: Path, pixel_root: Path, epochs: int) -> Path:
    cfg = {
        "training": {
            "data_root": str(pixel_root),
            "output_dir": str(root / "vae_run"),
            "batch_size": 16, "train_batch_size": 16,
            "epochs": epochs, "num_epochs": epochs,
            "learning_rate": 1e-4, "weight_decay": 0.0,
            "kl_weight": 1e-6, "reg_type": "kl", "recon_type": "l1",
            # surrogate-VGG perceptual and GAN off: keep the brief run clean
            "perceptual_weight": 0.0, "gan_weight": 0.0,
            "save_every": max(1, epochs), "checkpoint_every_epochs": max(1, epochs),
            "save_images": False, "seed": 42,
            "slice_count": 1, "img_size": 256, "load_ldct": True,
            "use_tensor_cache": True, "save_tensor_cache": True,
            "mixed_precision": "bf16",
        },
        "model": {
            "in_channels": 1, "out_channels": 1, "resolution": 256,
            "base_ch": 64, "down_channels": [64, 128, 256, 256],
            "num_res_blocks": 2, "attn_resolutions": [], "z_channels": EMBED_DIM,
            "embed_dim": EMBED_DIM, "dropout": 0.0, "use_attention": True,
            "spatial_dims": 2, "double_z": True, "latent_type": "kl",
            "model_type": "vae",
        },
    }
    cfg_dir = root / "configs"
    cfg_dir.mkdir(parents=True, exist_ok=True)
    (cfg_dir / "dataset.json").write_text(
        (REPO / "configs/LDCT/dataset.json").read_text())
    path = cfg_dir / "vae.json"
    path.write_text(json.dumps(cfg, indent=2))
    return path


def write_diff_config(root: Path, latent_root: Path, epochs: int) -> Path:
    cfg = {
        "training": {
            "data_root": str(latent_root),
            "output_dir": str(root / "diff_run"),
            "train_batch_size": 32, "batch_size": 32, "eval_batch_size": 32,
            "num_epochs": epochs,
            "learning_rate": 1e-4, "weight_decay": 0.0,
            "lr_warmup_steps": 200,
            "scheduler": "ddpm", "num_train_timesteps": 1000,
            "num_inference_steps": 50,
            "conditioning": "concatenate",
            "channels": EMBED_DIM, "img_size": 32,
            "save_model_epochs": max(1, epochs),
            "checkpoint_every_epochs": max(1, epochs),
            "mixed_precision": "bf16", "seed": 7,
            "save_images": False,
            "use_tensor_cache": False,
        },
        "model": {
            "unet": {
                "unet_impl": "diffusers_nd",
                "sample_size": 32,
                "in_channels": EMBED_DIM, "out_channels": EMBED_DIM,
                "layers_per_block": 2,
                "block_out_channels": [128, 256, 256],
                "down_block_types": ["DownBlock2D", "AttnDownBlock2D", "DownBlock2D"],
                "up_block_types": ["UpBlock2D", "AttnUpBlock2D", "UpBlock2D"],
            },
            "scheduler": {"name": "ddpm", "num_train_timesteps": 1000,
                          "num_inference_steps": 50,
                          "params": {"beta_start": 0.0001, "beta_end": 0.02}},
            "model_type": "diffusion",
        },
    }
    cfg_dir = latent_root / "configs"
    cfg_dir.mkdir(parents=True, exist_ok=True)
    # at the DATA ROOT top: run_model's dataset builder falls back to
    # <data_root>/dataset.json when the run-dir config walk finds nothing
    latent_root.mkdir(parents=True, exist_ok=True)
    (latent_root / "dataset.json").write_text(json.dumps(
        {"dataset_class": "fmdm_tpu.data.latent:LatentDataset"}))
    path = cfg_dir / "latent_diffusion.json"
    path.write_text(json.dumps(cfg, indent=2))
    return path


def newest_run(base: Path) -> Path:
    cands = sorted(base.parent.glob(base.name + "*"), key=lambda p: p.stat().st_mtime)
    if not cands:
        raise SystemExit(f"no run dir under {base}*")
    return cands[-1]


def encode_latents(vae_run: Path, pixel_root: Path, latent_root: Path) -> float:
    """Encode every (SDCT, LDCT) slice pair to latents; returns the stored
    scale S (stored = raw * S, S = 1/std of the raw train target latents)."""
    import jax
    import jax.numpy as jnp

    from fmdm_tpu.data.ldct import LDCTDataset
    from fmdm_tpu.sample.sampling_utils import load_run_config, resolve_checkpoint
    from fmdm_tpu.sample.vae_utils import build_vae_model, encode_vae_batch

    cfg = load_run_config(vae_run)
    vae_model, vae_params = build_vae_model(cfg, ckpt_path=resolve_checkpoint(vae_run, "vae"))
    encode = jax.jit(lambda p, x: encode_vae_batch(vae_model, p, x))

    data_dir = latent_root / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    preprocess_kwargs = {"MIN_B": -1024, "MAX_B": 3072, "slope": 1.0, "intersept": -1024}
    scale = None
    for split in ("train", "test"):
        ds = LDCTDataset(pixel_root, train=(split == "train"), img_size=256,
                         load_ldct=True, use_tensor_cache=False,
                         preprocess_kwargs=preprocess_kwargs)
        rows, targets, conds = [], [], []
        for i in range(len(ds)):
            s = ds[i]
            targets.append(np.asarray(s["target"], np.float32))
            conds.append(np.asarray(s["image"], np.float32))
            rows.append(i)
        z_t, z_c = [], []
        bs = 16
        for lo in range(0, len(rows), bs):
            z_t.append(np.asarray(encode(vae_params, jnp.asarray(np.stack(targets[lo:lo + bs])))))
            z_c.append(np.asarray(encode(vae_params, jnp.asarray(np.stack(conds[lo:lo + bs])))))
        z_t = np.concatenate(z_t)
        z_c = np.concatenate(z_c)
        if scale is None:  # from the TRAIN targets only
            scale = float(1.0 / max(np.std(z_t), 1e-6))
        lines = []
        for i in range(len(rows)):
            tp, cp = f"data/{split}_{i}_t.npy", f"data/{split}_{i}_c.npy"
            np.save(latent_root / tp, (z_t[i] * scale).astype(np.float32))
            np.save(latent_root / cp, (z_c[i] * scale).astype(np.float32))
            lines.append(f"{split.upper()}{i}\t{tp}\t{cp}")
        (latent_root / f"{split}.txt").write_text(
            "Case\ttarget\tconditioning\n" + "\n".join(lines) + "\n")
    (latent_root / "latent_scale.json").write_text(json.dumps({"scale": scale}))
    print(f"encoded latents, scale={scale:.4f}", flush=True)
    return scale


def vae_recon_psnr(vae_run: Path, pixel_root: Path, n: int = 64) -> float:
    """The chain ceiling: VAE recon PSNR on the test split."""
    import jax.numpy as jnp

    from fmdm_tpu.data.ldct import LDCTDataset
    from fmdm_tpu.sample.sampling_utils import load_run_config, resolve_checkpoint
    from fmdm_tpu.sample.vae_utils import build_vae_model, reconstruct_vae_batch

    cfg = load_run_config(vae_run)
    vae_model, vae_params = build_vae_model(cfg, ckpt_path=resolve_checkpoint(vae_run, "vae"))
    ds = LDCTDataset(pixel_root, train=False, img_size=256, use_tensor_cache=False,
                     preprocess_kwargs={"MIN_B": -1024, "MAX_B": 3072,
                                        "slope": 1.0, "intersept": -1024})
    psnrs = []
    for lo in range(0, min(n, len(ds)), 16):
        batch = np.stack([np.asarray(ds[i]["target"], np.float32)
                          for i in range(lo, min(lo + 16, min(n, len(ds))))])
        rec = np.asarray(reconstruct_vae_batch(vae_model, vae_params, jnp.asarray(batch)))
        mse = np.mean((rec - batch) ** 2, axis=(1, 2, 3))
        psnrs.extend(10.0 * np.log10(1.0 / np.clip(mse, 1e-12, None)))
    return float(np.mean(psnrs))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/latent_sweep"))
    ap.add_argument("--pixel-root", type=Path, default=None,
                    help="existing phantom dataset root (default: generate fresh)")
    ap.add_argument("--vae-epochs", type=int, default=30)
    ap.add_argument("--diff-epochs", type=int, default=300)
    ap.add_argument("--num-samples", type=int, default=144)
    ap.add_argument("--aliases", default=",".join(ALIASES))
    ap.add_argument("--skip-vae", action="store_true")
    ap.add_argument("--skip-encode", action="store_true")
    ap.add_argument("--skip-diff", action="store_true")
    args = ap.parse_args()
    root = args.root
    root.mkdir(parents=True, exist_ok=True)

    pixel_root = args.pixel_root
    if pixel_root is None:
        pixel_root = root / "pixels"
        if not (pixel_root / "train.txt").exists():
            gen_dataset(pixel_root, n_train_cases=16, n_test_cases=6)
            print("pixel dataset generated", flush=True)

    # each stage auto-skips when its artifact already exists (restart resilience)
    vae_cfg = write_vae_config(root, pixel_root, args.vae_epochs)
    have_vae = any(root.glob("vae_run*/vae_last.pt"))
    if not args.skip_vae and not have_vae:
        run([sys.executable, REPO / "train.py", "--config", vae_cfg],
            root / "train_vae.log")
    vae_run = newest_run(root / "vae_run")
    print("vae_run:", vae_run, flush=True)

    latent_root = root / "latents"
    if not args.skip_encode and not (latent_root / "latent_scale.json").exists():
        scale = encode_latents(vae_run, pixel_root, latent_root)
    else:
        scale = json.loads((latent_root / "latent_scale.json").read_text())["scale"]

    diff_cfg = write_diff_config(root, latent_root, args.diff_epochs)
    have_diff = any(root.glob("diff_run*/diff_last.pt"))
    if not args.skip_diff and not have_diff:
        run([sys.executable, REPO / "train.py", "--config", diff_cfg],
            root / "train_diff.log")
    diff_run = newest_run(root / "diff_run")
    print("diff_run:", diff_run, flush=True)

    ceiling = vae_recon_psnr(vae_run, pixel_root)
    print(f"VAE recon PSNR ceiling: {ceiling:.2f}", flush=True)

    results = {}
    for alias in args.aliases.split(","):
        out = root / "eval" / alias.replace("+", "p")
        out.mkdir(parents=True, exist_ok=True)
        run([sys.executable, REPO / "run_model.py",
             "--ckpt_dir", diff_run, "--mode", "evaluate",
             "--scheduler", alias, "--num_inference_steps", 50,
             "--num_samples", args.num_samples, "--batch_size", 16,
             "--latent_vae", f"{vae_run}?scale={scale}",
             "--output_dir", out, "--seed", 11],
            root / f"eval_{alias.replace('+', 'p')}.log")
        exps = sorted(out.glob("**/eval_metrics.csv"), key=lambda p: p.stat().st_mtime)
        if not exps:
            print(f"!! no eval_metrics.csv for {alias}")
            continue
        with open(exps[-1]) as fh:
            results[alias] = list(csv.DictReader(fh))[-1]
        print(alias, results[alias], flush=True)

    print(f"\nVAE recon ceiling: {ceiling:.2f} PSNR")
    print("| sampler | PSNR | SSIM | samples/s (model time) |")
    print("|---|---|---|---|")
    for alias, row in sorted(results.items(), key=lambda kv: -float(kv[1].get("psnr", 0))):
        print(f"| {alias} | {float(row['psnr']):.2f} | {float(row.get('ssim', 0) or 0):.3f} "
              f"| {float(row.get('model_samples_per_second', 0)):.1f} |")


if __name__ == "__main__":
    main()
