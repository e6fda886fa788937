"""Round-4 end-to-end TPU pipeline (restart-resilient orchestrator).

The original round-4 flagship run lived in /tmp and was lost to a VM restart.
This orchestrator re-runs everything with state under the repo's gitignored
`.scratch/` (persistent across restarts) and resumes from the newest epoch
snapshot whenever a stage is interrupted, so a crash costs at most one
checkpoint cadence, not the run.

Stages (all sequential — the axon TPU tunnel is single-client):
  1. synthetic flagship dataset (16 train / 6 test cases, 256², 24 slices)
  2. diffusion flagship training, 800 epochs, snapshots every 100
  3. flow-matching flagship training, 300 epochs
  4. 12-alias sampler-quality sweep at 144 eval samples (VERDICT r3 item 1)
  5. convergence curve (epoch snapshots × 3 samplers)
  6. latent-diffusion chain sweep (VERDICT r3 item 5 / BASELINE configs[4])
  7. ring-hop bench + bench.py
  8. EMA continuation: resume the diffusion flagship +200 epochs with
     training.ema_decay=0.999, then evaluate live vs --use_ema weights
     (ddim / dpmsolver++ / thresholded, 144 samples)

Usage: python scripts/r4_pipeline.py [--stage N] (default: run all remaining)
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from flagship_quality_sweep import gen_dataset, write_config  # noqa: E402

ROOT = REPO / ".scratch" / "flagship_r4"
SWEEP_ALIASES = (
    "ddpm,ddim,dpmsolver1,dpmsolver2,dpmsolver++,dpmsolversde,unipc,flowmatch,"
    "dpmsolver++?thresholding=true,unipc?thresholding=true,"
    "dpmsolver++?use_karras_sigmas=true,dpmsolver++?solver_type=heun"
)


def sh(cmd, log: Path | None = None):
    cmd = list(map(str, cmd))
    print("+", " ".join(cmd), flush=True)
    if log:
        with open(log, "a") as fh:
            rc = subprocess.call(cmd, stdout=fh, stderr=subprocess.STDOUT)
    else:
        rc = subprocess.call(cmd)
    if rc != 0:
        if log and log.exists():
            print(log.read_text()[-4000:])
        raise SystemExit(f"stage failed rc={rc}: {cmd}")


def latest_run_dir(variant: str) -> Path | None:
    cands = sorted(ROOT.glob(f"run_{variant}*"), key=lambda p: p.stat().st_mtime)
    return cands[-1] if cands else None


def trained_epochs(run_dir: Path | None, prefix: str) -> int:
    """Highest epoch recorded in the run's last-checkpoint payload."""
    if run_dir is None:
        return 0
    import torch

    last = run_dir / f"{prefix}_last.pt"
    if not last.exists():
        return 0
    try:
        payload = torch.load(last, map_location="cpu", weights_only=False)
        return int(payload.get("epoch", 0))
    except Exception:
        return 0


def train_variant(variant: str, epochs: int, prefix: str):
    run_dir = latest_run_dir(variant)
    done = trained_epochs(run_dir, prefix)
    if done >= epochs:
        print(f"[{variant}] already trained to epoch {done} — skip", flush=True)
        return
    cfg = write_config(ROOT, epochs, variant, ckpt_every=100)
    j = json.loads(Path(cfg).read_text())
    j["training"]["output_dir"] = str(run_dir or (ROOT / f"run_{variant}"))
    Path(cfg).write_text(json.dumps(j, indent=2))
    cmd = [sys.executable, REPO / "train.py", "--config", cfg]
    if run_dir is not None and done > 0:
        cmd += ["--resume", run_dir / f"{prefix}_last.pt"]
        print(f"[{variant}] resuming from epoch {done}", flush=True)
    sh(cmd, ROOT / f"train_{variant}.log")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0, help="run only this stage")
    args = ap.parse_args()
    ROOT.mkdir(parents=True, exist_ok=True)
    only = args.stage

    def want(n):
        return only == 0 or only == n

    if want(1) and not (ROOT / "train.txt").exists():
        print("=== [1/7] dataset", flush=True)
        gen_dataset(ROOT, n_train_cases=16, n_test_cases=6)

    if want(2):
        print("=== [2/7] diffusion flagship (800 epochs)", flush=True)
        train_variant("diffusion", 800, "diff")

    if want(3):
        print("=== [3/7] flow-matching flagship (300 epochs)", flush=True)
        train_variant("flow_matching", 300, "flow")

    if want(4):
        print("=== [4/7] 12-alias sweep, 144 samples", flush=True)
        sh([sys.executable, REPO / "scripts/flagship_quality_sweep.py",
            "--root", ROOT, "--skip-data", "--skip-train",
            "--num-samples", 144, "--aliases", SWEEP_ALIASES],
           ROOT / "evals.log")
        print((ROOT / "evals.log").read_text()[-2500:])

    if want(5):
        print("=== [5/7] convergence curve", flush=True)
        sh([sys.executable, REPO / "scripts/convergence_curve.py",
            "--run", latest_run_dir("diffusion"), "--num-samples", 64,
            "--out", ROOT / "curve"],
           ROOT / "curve.log")
        print((ROOT / "curve.log").read_text()[-2500:])

    if want(6):
        print("=== [6/7] latent-diffusion sweep", flush=True)
        sh([sys.executable, REPO / "scripts/latent_diffusion_sweep.py",
            "--root", REPO / ".scratch" / "latent_sweep", "--pixel-root", ROOT],
           ROOT / "latent_sweep.log")
        print((ROOT / "latent_sweep.log").read_text()[-2500:])

    if want(7):
        print("=== [7/8] ring-hop bench + bench.py", flush=True)
        sh([sys.executable, REPO / "scripts/bench_ring_hop.py"],
           ROOT / "ring_hop.log")
        print((ROOT / "ring_hop.log").read_text()[-1500:])
        sh([sys.executable, REPO / "bench.py"], ROOT / "bench.log")
        print((ROOT / "bench.log").read_text()[-500:])

    if want(8):
        print("=== [8/8] EMA continuation (+200 epochs at ema_decay=0.999)", flush=True)
        run_dir = latest_run_dir("diffusion")
        if run_dir is None:
            raise SystemExit("stage 8 needs the stage-2 diffusion run")
        done = trained_epochs(run_dir, "diff")
        if done < 1000:
            cfg = write_config(ROOT, 1000, "diffusion", ckpt_every=100)
            j = json.loads(Path(cfg).read_text())
            j["training"]["output_dir"] = str(run_dir)
            j["training"]["ema_decay"] = 0.999
            ema_cfg = Path(cfg).with_name("flagship_ema_continuation.json")
            ema_cfg.write_text(json.dumps(j, indent=2))
            sh([sys.executable, REPO / "train.py", "--config", ema_cfg,
                "--resume", run_dir / "diff_last.pt"],
               ROOT / "train_ema.log")
        else:
            print(f"[ema] already trained to epoch {done} — skip", flush=True)
        for alias in ("ddim", "dpmsolver++", "dpmsolver++?thresholding=true"):
            for ema_flag in (False, True):
                tag = alias.replace("+", "p").replace("?", "_").replace("=", "-")
                tag += "_ema" if ema_flag else "_live"
                cmd = [sys.executable, REPO / "run_model.py",
                       "--ckpt_dir", run_dir, "--mode", "evaluate",
                       "--scheduler", alias, "--num_inference_steps", 50,
                       "--num_samples", 144, "--batch_size", 16,
                       "--output_dir", ROOT / "ema_eval" / tag, "--seed", 11]
                if ema_flag:
                    cmd.append("--use_ema")
                sh(cmd, ROOT / f"ema_eval_{tag}.log")
                import csv
                exps = sorted((ROOT / "ema_eval" / tag).glob("**/eval_metrics.csv"),
                              key=lambda p: p.stat().st_mtime)
                if exps:
                    with open(exps[-1]) as fh:
                        row = list(csv.DictReader(fh))[-1]
                    print(f"{tag}: psnr={row.get('psnr')} ssim={row.get('ssim')} "
                          f"ci95={row.get('psnr_ci95')}", flush=True)

    print("=== pipeline complete", flush=True)


if __name__ == "__main__":
    main()
