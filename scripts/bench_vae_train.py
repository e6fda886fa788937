"""VAE GAN training benchmark on TPU (VERDICT r2 item 7).

Runs a few epochs of the two hard VAE recipes through the REAL trainer
(fmdm_tpu/train/vae_impl.py — one jitted two-optimizer program, EMA codebook
state threaded functionally):

  1. magvit_vqvae: EMA codebook + MagvitDiscriminator GAN (gan_weight on),
  2. KL + PatchGAN + annealed KL (autoencoder_kl recipe, gan on),

on a synthetic 256² dataset, and reports train samples/s per epoch plus the
loss-curve tail — the first on-hardware datapoint for the GAN path
(reference: src/pipelines/train/vae_lib.py:198-358).

Usage: python scripts/bench_vae_train.py [--epochs 3] [--n 96] [--root /tmp/vae_bench]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


class SynthImages:
    thread_safe_getitem = True

    def __init__(self, n=96, size=256, channels=1, seed=0):
        rng = np.random.RandomState(seed)
        # smooth random fields in [0,1]: low-freq mixtures so recon is learnable
        base = rng.rand(n, channels, 8, 8).astype(np.float32)
        import jax  # local to keep module import light

        self.data = np.stack([
            np.clip(np.kron(b, np.ones((size // 8, size // 8), np.float32))
                    + 0.05 * rng.randn(channels, size, size), 0, 1)
            for b in base
        ]).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return {"target": self.data[i], "image": None, "img_id": f"s{i}",
                "img_path": f"s{i}.npy", "img_size": self.data[i].shape}


def cfg_magvit(root: Path, epochs: int) -> dict:
    cfg = json.loads((REPO / "configs/magvit_vqvae.json").read_text())
    cfg["model"].update({"in_channels": 1, "out_channels": 1})
    cfg["training"].update({
        "output_dir": str(root / "magvit_run"), "epochs": epochs,
        "batch_size": 8, "gan_weight": 0.1, "gan_start": 0,
        "save_images": False, "save_every": max(1, epochs),
        "checkpoint_every_epochs": max(1, epochs),
        "perceptual_weight": 0.0,
    })
    return cfg


def cfg_kl_gan(root: Path, epochs: int) -> dict:
    cfg = json.loads((REPO / "configs/autoencoder_kl_small.json").read_text())
    cfg["model"].update({"in_channels": 1, "out_channels": 1})
    cfg["training"].update({
        "output_dir": str(root / "klgan_run"), "epochs": epochs,
        "batch_size": 8, "gan_weight": 0.1, "gan_start": 0,
        "kl_weight": 1e-6, "kl_anneal_steps": 20,
        "save_images": False, "save_every": max(1, epochs),
        "checkpoint_every_epochs": max(1, epochs),
        "perceptual_weight": 0.0,
    })
    return cfg


def run_one(name: str, cfg: dict, root: Path, epochs: int, n: int):
    from fmdm_tpu.train import vae_impl

    cfg_path = root / f"{name}.json"
    cfg_path.write_text(json.dumps(cfg))
    channels = int(cfg["model"].get("in_channels", 1))
    ds = SynthImages(n=n, channels=channels)
    t0 = time.perf_counter()
    run_dir = vae_impl.train(ds, cfg_path, val_dataset=None)
    wall = time.perf_counter() - t0
    metrics = (Path(run_dir) / "metrics.csv").read_text().strip().splitlines()
    print(f"== {name}: {epochs} epochs x {n} samples in {wall:.0f}s "
          f"(incl. compile) -> run dir {run_dir}")
    print("   metrics.csv header:", metrics[0])
    for line in metrics[-3:]:
        print("   ", line)
    return {"name": name, "wall_s": round(wall, 1), "epochs": epochs,
            "samples": n, "metrics_tail": metrics[-2:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--root", type=Path, default=Path("/tmp/vae_bench"))
    args = ap.parse_args()
    args.root.mkdir(parents=True, exist_ok=True)

    results = []
    results.append(run_one("magvit_vqvae_gan", cfg_magvit(args.root, args.epochs),
                           args.root, args.epochs, args.n))
    results.append(run_one("kl_patchgan", cfg_kl_gan(args.root, args.epochs),
                           args.root, args.epochs, args.n))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
