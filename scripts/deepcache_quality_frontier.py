"""DeepCache quality-throughput frontier at flagship scale (VERDICT r2 item 6
closure: measured quality cost of the adaptive refresh schedule).

Runs `run_model --mode evaluate` on a trained flagship checkpoint for the
exact path and a grid of --deep_cache settings (interval x {uniform,
adaptive}), and prints the PSNR/throughput frontier as a markdown table.

Usage:
  python scripts/deepcache_quality_frontier.py --ckpt_dir /tmp/flagship_sweep/run_diffusion_run1 \
      [--root /tmp/deepcache_frontier] [--num-samples 32]
"""

from __future__ import annotations

import argparse
import csv
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

VARIANTS = [None, "2:1:uniform", "2:1:adaptive", "3:1:uniform", "3:1:adaptive",
            "4:1:adaptive", "5:1:adaptive"]


def run(cmd, log: Path):
    print("+", " ".join(map(str, cmd)), flush=True)
    with open(log, "w") as fh:
        rc = subprocess.call(list(map(str, cmd)), stdout=fh, stderr=subprocess.STDOUT)
    if rc != 0:
        print(Path(log).read_text()[-3000:])
        raise SystemExit(f"command failed rc={rc}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", type=Path, required=True)
    ap.add_argument("--root", type=Path, default=Path("/tmp/deepcache_frontier"))
    ap.add_argument("--num-samples", type=int, default=32)
    ap.add_argument("--scheduler", default="ddpm")
    args = ap.parse_args()
    args.root.mkdir(parents=True, exist_ok=True)

    results = {}
    for variant in VARIANTS:
        tag = "exact" if variant is None else variant.replace(":", "_")
        out = args.root / tag
        out.mkdir(parents=True, exist_ok=True)
        cmd = [sys.executable, REPO / "run_model.py",
               "--ckpt_dir", args.ckpt_dir, "--mode", "evaluate",
               "--scheduler", args.scheduler, "--num_inference_steps", 50,
               "--num_samples", args.num_samples, "--batch_size", 16,
               "--output_dir", out, "--seed", 11]
        if variant is not None:
            cmd += ["--deep_cache", variant]
        run(cmd, args.root / f"eval_{tag}.log")
        csvs = sorted(out.glob("**/eval_metrics.csv"), key=lambda p: p.stat().st_mtime)
        if not csvs:
            print(f"!! no eval_metrics.csv for {tag}")
            continue
        with open(csvs[-1]) as fh:
            results[tag] = list(csv.DictReader(fh))[-1]
        print(tag, results[tag], flush=True)

    print("\n| deep_cache | PSNR | SSIM | model samples/s | speedup |")
    print("|---|---|---|---|---|")
    base = float(results.get("exact", {}).get("model_samples_per_second", 0) or 0)
    for tag, row in results.items():
        sps = float(row.get("model_samples_per_second", 0) or 0)
        speed = f"{sps / base:.2f}x" if base else "-"
        print(f"| {tag} | {float(row['psnr']):.2f} | {float(row.get('ssim', 0) or 0):.3f} "
              f"| {sps:.2f} | {speed} |")


if __name__ == "__main__":
    main()
