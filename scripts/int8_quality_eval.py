"""Int8 (W8A8) post-training quantization: flagship-scale quality delta.

Measures what `run_model --quantize int8` costs in PSNR/SSIM at the metric of
record: the 256² concatenate-conditioned flagship evaluated through the
production `run_model --mode evaluate` path, bf16 exact vs int8-quantized, same
checkpoint / seed / eval protocol as the round-4 convergence sweep
(144 samples, 50 steps, seed 11).

Uses the flow-matching flagship (converges in ~300 epochs — BENCHMARKS.md
round-4 sweep) so the whole experiment fits one TPU session. Restart-resilient:
state lives under .scratch/int8_eval and training resumes from the newest
snapshot (same scheme as scripts/r4_pipeline.py).

Stages:
  1. synthetic flagship dataset (16 train / 6 test cases, 256², 24 slices)
  2. flow-matching flagship training, 300 epochs
  3. evaluate {flowmatch, dpmsolver++} x {bf16, int8}, 144 samples
  4. serving composition: flowmatch x {bf16, int8} x DeepCache 2:1:adaptive

Usage: python scripts/int8_quality_eval.py [--stage N]
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from flagship_quality_sweep import gen_dataset, write_config  # noqa: E402
from r4_pipeline import sh, trained_epochs  # noqa: E402

ROOT = REPO / ".scratch" / "int8_eval"
EPOCHS = 300
PREFIX = "flow"


def resolve_run_dir() -> Path:
    """The trainer suffixes the run dir (_runN) on collision — find the
    newest actual run under ROOT rather than assuming the requested name."""
    cands = sorted((d for d in ROOT.glob("run_flow*")
                    if (d / "train_config.json").exists()),
                   key=lambda d: d.stat().st_mtime)
    return cands[-1] if cands else ROOT / "run_flow"


def train_flow():
    run_dir = resolve_run_dir()
    done = trained_epochs(run_dir if run_dir.exists() else None, PREFIX)
    if done >= EPOCHS:
        print(f"[train] already at epoch {done} — skip", flush=True)
        return run_dir
    cfg = write_config(ROOT, EPOCHS, "flow_matching", ckpt_every=100)
    j = json.loads(Path(cfg).read_text())
    j["training"]["output_dir"] = str(run_dir)
    Path(cfg).write_text(json.dumps(j, indent=2))
    cmd = [sys.executable, REPO / "train.py", "--config", cfg]
    if done > 0:
        cmd += ["--resume", run_dir / f"{PREFIX}_last.pt"]
        print(f"[train] resuming from epoch {done}", flush=True)
    sh(cmd, ROOT / "train_flow.log")
    return resolve_run_dir()


VARIANTS = [
    # (scheduler alias, --quantize, --deep_cache) — stage 3 is the int8 quality
    # delta; stage 4 composes the two serving levers (int8 x adaptive DeepCache).
    ("flowmatch", None, None),
    ("flowmatch", "int8", None),
    ("dpmsolver++", None, None),
    ("dpmsolver++", "int8", None),
]
VARIANTS_COMPOSED = [
    ("flowmatch", None, "2:1:adaptive"),
    ("flowmatch", "int8", "2:1:adaptive"),
]
# round-5 stage 5: quality-budget DeepCache autotune (run_model --deep_cache
# auto[:dPSNR]) at flagship scale through the production evaluate path
# (VERDICT r4 next #5), plus the int8+linear extension (next #6).
VARIANTS_R5 = [
    ("flowmatch", "int8", "auto:0.5"),
    ("flowmatch", "int8+linear", None),
]


def evaluate(run_dir: Path, variants=VARIANTS):
    results = {}
    for alias, quant, deep_cache in variants:
        tag = alias.replace("+", "p") + ("_" + quant.replace("+", "_") if quant else "_bf16")
        if deep_cache:
            tag += "_dc" + deep_cache.replace(":", "-")
        out = ROOT / "eval" / tag
        marker = out / "DONE"
        if not marker.exists():
            cmd = [sys.executable, REPO / "run_model.py",
                   "--ckpt_dir", run_dir, "--mode", "evaluate",
                   "--scheduler", alias, "--num_inference_steps", 50,
                   "--num_samples", 144, "--batch_size", 16,
                   "--output_dir", out, "--seed", 11]
            if quant:
                cmd += ["--quantize", quant]
            if deep_cache:
                cmd += ["--deep_cache", deep_cache]
            sh(cmd, ROOT / f"eval_{tag}.log")
        rows = sorted(out.glob("**/eval_metrics.csv"), key=lambda p: p.stat().st_mtime)
        if rows:
            # DONE only once metrics actually exist (ADVICE r4 #2): a
            # zero-exit run_model that produced no eval_metrics.csv must be
            # retried on the next invocation, not skipped forever.
            if not marker.exists():
                marker.write_text("ok")
            with open(rows[-1]) as fh:
                row = list(csv.DictReader(fh))[-1]
            results[tag] = row
            print(f"{tag}: psnr={row.get('psnr')} ssim={row.get('ssim')} "
                  f"ci95={row.get('psnr_ci95')}", flush=True)
        else:
            print(f"WARNING: {tag}: run_model produced NO eval_metrics.csv under {out} "
                  f"— variant left un-DONE for retry", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    args = ap.parse_args()
    only = args.stage

    def want(n):
        return only == 0 or only == n

    ROOT.mkdir(parents=True, exist_ok=True)
    if want(1) and not (ROOT / "train.txt").exists():
        print("=== [1/3] dataset", flush=True)
        gen_dataset(ROOT, n_train_cases=16, n_test_cases=6)
    run_dir = resolve_run_dir()
    if want(2):
        print("=== [2/3] flow-matching flagship (300 epochs)", flush=True)
        run_dir = train_flow()
    if want(3):
        print("=== [3/4] bf16 vs int8 evals", flush=True)
        evaluate(run_dir)
    if want(4):
        print("=== [4/5] serving composition: int8 x DeepCache 2:1:adaptive", flush=True)
        evaluate(run_dir, VARIANTS_COMPOSED)
    if want(5):
        print("=== [5/5] round-5: deep_cache auto budget + int8+linear", flush=True)
        evaluate(run_dir, VARIANTS_R5)
    print("=== int8 quality eval complete", flush=True)


if __name__ == "__main__":
    main()
