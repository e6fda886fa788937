#!/bin/bash
# Round-4 post-training pipeline. Run ONLY after the flagship diffusion
# training process has fully exited (the axon TPU tunnel is single-client:
# a second client wedges in-flight transfers — see memory/round-state.md).
# Everything here is sequential on the one chip.
set -e
cd /root/repo
ROOT=/tmp/flagship_r4

echo "=== [1/6] flow-matching flagship training (300 epochs)"
python - <<'EOF'
import json, sys
sys.path.insert(0, "scripts")
from pathlib import Path
from flagship_quality_sweep import write_config
root = Path("/tmp/flagship_r4")
cfg = write_config(root, 300, "flow_matching", ckpt_every=100)
j = json.loads(Path(cfg).read_text())
j["training"]["output_dir"] = str(root / "run_flow_matching")
Path(cfg).write_text(json.dumps(j, indent=2))
print("flow config:", cfg)
EOF
python train.py --config $ROOT/configs/flagship_sweep_flow_matching.json \
    > $ROOT/train_flow.log 2>&1

echo "=== [2/6] flagship sampler sweep (144 eval samples, all 8 aliases + thresholded)"
python scripts/flagship_quality_sweep.py --root $ROOT --skip-data --skip-train \
    --num-samples 144 \
    --aliases 'ddpm,ddim,dpmsolver1,dpmsolver2,dpmsolver++,dpmsolversde,unipc,flowmatch,dpmsolver++?thresholding=true,unipc?thresholding=true,dpmsolver++?use_karras_sigmas=true,dpmsolver++?solver_type=heun' \
    > $ROOT/evals.log 2>&1
tail -25 $ROOT/evals.log

echo "=== [3/6] convergence curve (epoch snapshots x 3 samplers, 64 samples)"
python scripts/convergence_curve.py --run $ROOT/run_diffusion_run2 \
    --num-samples 64 > $ROOT/curve.log 2>&1
tail -15 $ROOT/curve.log

echo "=== [4/6] latent-diffusion sweep (BASELINE configs[4])"
python scripts/latent_diffusion_sweep.py --root /tmp/latent_sweep \
    --pixel-root $ROOT > /tmp/latent_sweep.log 2>&1
tail -12 /tmp/latent_sweep.log

echo "=== [5/6] ring-hop bench (fused flash vs einsum hop on the chip)"
python scripts/bench_ring_hop.py > /tmp/ring_hop.log 2>&1
cat /tmp/ring_hop.log

echo "=== [6/6] bench.py"
python bench.py | tee /tmp/bench_r4.json

echo "=== pipeline complete"
