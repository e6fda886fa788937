"""Quality-vs-epochs convergence curve for a flagship run (VERDICT r3 item 1).

For every epoch snapshot in <run_dir>/epochs/epochXXXX/epoch.pt, stage a
minimal eval dir (train_config.json + diff_last.pt hardlink) and run the
production `run_model --mode evaluate` for the requested scheduler aliases.
Output: a markdown table of PSNR/SSIM per (epoch, sampler) — the evidence for
"the metric-of-record quality number tracks convergence" (or for the ceiling
if it provably caps below the target).

Usage:
  python scripts/convergence_curve.py --run /tmp/flagship_r4/run_diffusion_run2 \
      [--aliases 'ddim,dpmsolver++,dpmsolver++?thresholding=true'] \
      [--num-samples 64] [--out /tmp/curve]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

DEFAULT_ALIASES = "ddim,dpmsolver++,dpmsolver++?thresholding=true"


def stage_epoch_dir(run_dir: Path, epoch_dir: Path, staging: Path) -> Path:
    """A run-dir facade for one snapshot: config copy + ckpt hardlink."""
    stage = staging / epoch_dir.name
    stage.mkdir(parents=True, exist_ok=True)
    cfg = stage / "train_config.json"
    if not cfg.exists():
        cfg.write_text((run_dir / "train_config.json").read_text())
    prefix = None
    for cand in ("diff", "flow", "vae"):
        if (run_dir / f"{cand}_last.pt").exists():
            prefix = cand
            break
    prefix = prefix or "diff"
    link = stage / f"{prefix}_last.pt"
    if not link.exists():
        os.link(epoch_dir / "epoch.pt", link)
    return stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=Path, required=True)
    ap.add_argument("--aliases", default=DEFAULT_ALIASES)
    ap.add_argument("--num-samples", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--epochs", default=None,
                    help="comma list of snapshot epochs to use (default: all)")
    args = ap.parse_args()
    run_dir = args.run.resolve()
    out_root = args.out or (run_dir / "convergence")
    out_root.mkdir(parents=True, exist_ok=True)

    epoch_dirs = sorted((run_dir / "epochs").glob("epoch*"))
    if args.epochs:
        wanted = {int(e) for e in args.epochs.split(",")}
        epoch_dirs = [d for d in epoch_dirs
                      if int(d.name.replace("epoch", "")) in wanted]
    if not epoch_dirs:
        raise SystemExit(f"no epoch snapshots under {run_dir}/epochs")

    results = {}  # (epoch, alias) -> row
    for epoch_dir in epoch_dirs:
        epoch = int(epoch_dir.name.replace("epoch", ""))
        stage = stage_epoch_dir(run_dir, epoch_dir, out_root / "staging")
        for alias in args.aliases.split(","):
            tag = alias.replace("+", "p").replace("?", "_").replace("=", "-")
            out = out_root / f"e{epoch:04d}_{tag}"
            out.mkdir(parents=True, exist_ok=True)
            log = out_root / f"e{epoch:04d}_{tag}.log"
            cmd = [sys.executable, str(REPO / "run_model.py"),
                   "--ckpt_dir", str(stage), "--mode", "evaluate",
                   "--scheduler", alias, "--num_inference_steps", str(args.steps),
                   "--num_samples", str(args.num_samples),
                   "--batch_size", str(args.batch_size),
                   "--output_dir", str(out), "--seed", str(args.seed)]
            print("+", " ".join(cmd), flush=True)
            with open(log, "w") as fh:
                rc = subprocess.call(cmd, stdout=fh, stderr=subprocess.STDOUT)
            if rc != 0:
                print(log.read_text()[-2000:])
                raise SystemExit(f"eval failed for epoch {epoch} alias {alias}")
            metrics = sorted(out.glob("**/eval_metrics.csv"),
                             key=lambda p: p.stat().st_mtime)
            with open(metrics[-1]) as fh:
                results[(epoch, alias)] = list(csv.DictReader(fh))[-1]
            print(epoch, alias, results[(epoch, alias)]["psnr"], flush=True)

    aliases = args.aliases.split(",")
    print("\n| epoch | " + " | ".join(f"{a} PSNR" for a in aliases) + " |")
    print("|" + "---|" * (len(aliases) + 1))
    for epoch_dir in epoch_dirs:
        epoch = int(epoch_dir.name.replace("epoch", ""))
        cells = []
        for a in aliases:
            row = results.get((epoch, a))
            cells.append(f"{float(row['psnr']):.2f}" if row else "-")
        print(f"| {epoch} | " + " | ".join(cells) + " |")
    (out_root / "curve.json").write_text(json.dumps(
        {f"{e}:{a}": r for (e, a), r in results.items()}, indent=1))


if __name__ == "__main__":
    main()
