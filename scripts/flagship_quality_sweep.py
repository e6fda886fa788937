"""Flagship-scale sampler-quality sweep (VERDICT r2 item 5).

Generates a synthetic LDCT-shaped dataset (256² ellipse phantoms in HU range,
low-dose = high-dose + structured noise), trains the FLAGSHIP 256²
concatenate-conditioned UNet on TPU through the real `train.py` CLI, then runs
`run_model.py --mode evaluate` for every scheduler alias — so the "recon PSNR"
north-star number exists at flagship scale through the production CLI path
(reference: src/pipelines/samplers/diffusion_like.py:149-338).

Usage:
  python scripts/flagship_quality_sweep.py --root /tmp/flagship_sweep \
      [--epochs 30] [--skip-train] [--aliases ddpm,ddim,...]
Prints a markdown table of per-alias PSNR/SSIM/throughput at the end.
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

ALIASES = ["ddpm", "ddim", "dpmsolver1", "dpmsolver2", "dpmsolver++",
           "dpmsolversde", "unipc", "flowmatch"]


def make_phantom(rng: np.random.RandomState, size=256) -> np.ndarray:
    """CT-like slice in raw pixel units (HU = px - 1024): water-ish ellipse
    body with random internal structures on an air background."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy, cx = size / 2 + rng.uniform(-10, 10), size / 2 + rng.uniform(-10, 10)
    ry, rx = rng.uniform(0.30, 0.42) * size, rng.uniform(0.34, 0.46) * size
    body = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) <= 1.0
    img = np.zeros((size, size), np.float32)            # air: 0 -> -1024 HU
    img[body] = 1024.0 + rng.uniform(-40, 40)           # ~water
    for _ in range(rng.randint(4, 9)):                  # organs/lesions/bone
        oy = cy + rng.uniform(-0.5, 0.5) * ry
        ox = cx + rng.uniform(-0.5, 0.5) * rx
        orr = rng.uniform(0.03, 0.18) * size
        dens = rng.choice([rng.uniform(900, 1100), rng.uniform(1300, 2800)])
        blob = (((yy - oy) / orr) ** 2 + ((xx - ox) / (orr * rng.uniform(0.6, 1.6))) ** 2) <= 1.0
        img[blob & body] = dens
    return img


def gen_dataset(root: Path, n_train_cases=16, n_test_cases=6, depth=24, seed=0):
    data = root / "data"
    data.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    rows_train, rows_test = [], []
    for split, n_cases, rows in (("train", n_train_cases, rows_train),
                                 ("test", n_test_cases, rows_test)):
        for c in range(n_cases):
            sdct = np.stack([make_phantom(rng) for _ in range(depth)])
            # low-dose: quantum mottle ~ sqrt(signal) + streaks
            noise = rng.randn(*sdct.shape).astype(np.float32) * (30.0 + 0.05 * sdct)
            ldct = np.clip(sdct + noise, 0.0, 4095.0).astype(np.float32)
            sp, lp = f"data/{split}_c{c}_sdct.npy", f"data/{split}_c{c}_ldct.npy"
            np.save(root / sp, sdct)
            np.save(root / lp, ldct)
            rows.append(f"{split.upper()}C{c}\t{sp}\t{lp}")
    (root / "train.txt").write_text("Case\tSDCT\tLDCT\n" + "\n".join(rows_train) + "\n")
    (root / "test.txt").write_text("Case\tSDCT\tLDCT\n" + "\n".join(rows_test) + "\n")


def write_config(root: Path, epochs: int, variant: str = "diffusion",
                 ckpt_every: int = 50) -> Path:
    src = ("configs/LDCT/LDCT_ddpm_diffusers_nd.json" if variant == "diffusion"
           else "configs/LDCT/LDCT_flow_matching_diffusers_nd.json")
    base = json.loads((REPO / src).read_text())
    tr = base["training"]
    tr.update({
        "data_root": str(root),
        "output_dir": str(root / "run"),
        "train_batch_size": 16, "batch_size": 16, "eval_batch_size": 16,
        "num_epochs": epochs,
        "mixed_precision": "bf16",
        "num_inference_steps": 50,
        "save_images": False,
        "save_model_epochs": ckpt_every,
        "lr_warmup_steps": 500,
        "use_tensor_cache": True,
        "save_tensor_cache": True,
        # host readback through the axon tunnel is ~7 MB/s; gathering the
        # 113M-param state every epoch would dominate wall time
        "checkpoint_every_epochs": ckpt_every,
        "visual_every": 1000,
    })
    # dataset.json walk needs an ancestor copy next to the config
    cfg_dir = root / "configs"
    cfg_dir.mkdir(exist_ok=True)
    (cfg_dir / "dataset.json").write_text(
        (REPO / "configs/LDCT/dataset.json").read_text())
    path = cfg_dir / f"flagship_sweep_{variant}.json"
    path.write_text(json.dumps(base, indent=2))
    return path


def run(cmd, log: Path):
    print("+", " ".join(map(str, cmd)), flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(list(map(str, cmd)), stdout=fh, stderr=subprocess.STDOUT)
    if rc != 0:
        print(Path(log).read_text()[-3000:])
        raise SystemExit(f"command failed rc={rc}: {cmd}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/flagship_sweep"))
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--flow-epochs", type=int, default=None,
                    help="epochs for the flow_matching variant (default: --epochs)")
    ap.add_argument("--train-cases", type=int, default=16)
    ap.add_argument("--test-cases", type=int, default=6)
    ap.add_argument("--ckpt-every", type=int, default=50,
                    help="checkpoint/snapshot cadence in epochs")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-data", action="store_true")
    ap.add_argument("--aliases", default=",".join(ALIASES))
    ap.add_argument("--num-samples", type=int, default=32)
    args = ap.parse_args()
    root = args.root
    root.mkdir(parents=True, exist_ok=True)

    if not args.skip_data:
        gen_dataset(root, n_train_cases=args.train_cases,
                    n_test_cases=args.test_cases)
        print("dataset generated", flush=True)

    # Two trained models: the diffusion (eps) flagship serves the 7 diffusion
    # aliases; flowmatch needs a velocity-target model (sampling an
    # eps-model with the flow-match scheduler is meaningless), so the
    # LDCT_flow_matching config trains its own.
    aliases = args.aliases.split(",")
    ckpt_dirs = {}
    for variant in ("diffusion", "flow_matching"):
        need = (any(a != "flowmatch" for a in aliases) if variant == "diffusion"
                else "flowmatch" in aliases)
        if not need:
            continue
        epochs = (args.flow_epochs if variant == "flow_matching"
                  and args.flow_epochs is not None else args.epochs)
        cfg = write_config(root, epochs, variant, ckpt_every=args.ckpt_every)
        run_dir = root / f"run_{variant}"
        json_cfg = json.loads(Path(cfg).read_text())
        json_cfg["training"]["output_dir"] = str(run_dir)
        Path(cfg).write_text(json.dumps(json_cfg, indent=2))
        if not args.skip_train:
            run([sys.executable, REPO / "train.py", "--config", cfg],
                root / f"train_{variant}.log")
        candidates = sorted(root.glob(f"run_{variant}*"), key=lambda p: p.stat().st_mtime)
        ckpt_dirs[variant] = candidates[-1] if candidates else run_dir
        print("ckpt_dir:", variant, ckpt_dirs[variant], flush=True)

    results = {}
    for alias in aliases:
        ckpt_dir = ckpt_dirs["flow_matching" if alias == "flowmatch" else "diffusion"]
        out = root / "eval" / alias.replace("+", "p")
        out.mkdir(parents=True, exist_ok=True)
        run([sys.executable, REPO / "run_model.py",
             "--ckpt_dir", ckpt_dir, "--mode", "evaluate",
             "--scheduler", alias, "--num_inference_steps", 50,
             "--num_samples", args.num_samples, "--batch_size", 16,
             "--output_dir", out, "--seed", 11],
            root / f"eval_{alias.replace('+', 'p')}.log")
        # newest experiment dir inside out
        exps = sorted(out.glob("**/eval_metrics.csv"), key=lambda p: p.stat().st_mtime)
        if not exps:
            print(f"!! no eval_metrics.csv for {alias}")
            continue
        with open(exps[-1]) as fh:
            row = list(csv.DictReader(fh))[-1]
        # 95% CI from the per-image CSV (VERDICT r3 weak #7: don't quote a
        # 2-decimal PSNR off a thin eval set without dispersion).
        per_img = exps[-1].parent / "eval_metrics_per_image.csv"
        if per_img.exists():
            with open(per_img) as fh:
                vals = [float(r["psnr"]) for r in csv.DictReader(fh) if r.get("psnr")]
            if len(vals) > 1:
                mean = float(np.mean(vals))
                ci = 1.96 * float(np.std(vals, ddof=1)) / np.sqrt(len(vals))
                row["psnr_ci95"] = f"{ci:.3f}"
                row["psnr_mean_check"] = f"{mean:.3f}"
        results[alias] = row
        print(alias, row, flush=True)

    print("\n| sampler | PSNR (±95% CI) | SSIM | samples/s (model time) |")
    print("|---|---|---|---|")
    for alias, row in sorted(results.items(), key=lambda kv: -float(kv[1].get("psnr", 0))):
        ci = f" ± {float(row['psnr_ci95']):.2f}" if row.get("psnr_ci95") else ""
        print(f"| {alias} | {float(row['psnr']):.2f}{ci} | {float(row.get('ssim', 0) or 0):.3f} "
              f"| {float(row.get('model_samples_per_second', 0)):.1f} |")


if __name__ == "__main__":
    main()
