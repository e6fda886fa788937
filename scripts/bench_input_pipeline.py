"""
Input-pipeline benchmark: cold-cache vs warm-cache epoch throughput.

Generates a synthetic LDCT tree (raw 512² CT volumes on disk), then trains
the flagship flow-matching config for 2 epochs on the default device.
Epoch 1 pays the full preprocessing bill per sample (npy volume read, HU
rescale + windowing, 512→256 resize, tensor-cache write); epoch 2 reads the
tensor cache. With the threaded sample fetch (training.num_workers) the cold
epoch should stay within ~15% of the warm epoch — the TPU-side answer to the
reference's DataLoader(num_workers) worker processes
(/root/reference/src/pipelines/train/diffusion_lib.py:82-90).

Usage:  python scripts/bench_input_pipeline.py [num_volumes] [slices_per_vol]
Prints one JSON line {"cold_samples_per_sec", "warm_samples_per_sec", "ratio"}.
"""

from __future__ import annotations

import json
import re
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_ldct_tree(root: Path, num_volumes: int, slices: int) -> None:
    data_dir = root / "data"
    data_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    rows = ["Case\tSDCT\tLDCT"]
    for v in range(num_volumes):
        # raw CT pixel values (uint-like floats, HU after the -1024 fallback)
        vol = (rng.rand(slices, 512, 512) * 3000).astype(np.float32)
        np.save(data_dir / f"sdct_{v}.npy", vol)
        np.save(data_dir / f"ldct_{v}.npy", vol * 0.7)
        rows.append(f"C{v}\tdata/sdct_{v}.npy\tdata/ldct_{v}.npy")
    (root / "train.txt").write_text("\n".join(rows) + "\n")
    (root / "test.txt").write_text("\n".join(rows[:2]) + "\n")


def main() -> None:
    num_volumes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    slices = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    work = Path(tempfile.mkdtemp(prefix="ldct_bench_"))
    try:
        make_ldct_tree(work, num_volumes, slices)

        cfg = json.loads((REPO / "configs/LDCT/LDCT_flow_matching_diffusers_nd.json").read_text())
        cfg["training"].update({
            "data_root": str(work),
            "output_dir": str(work / "run"),
            "num_epochs": 2,
            "mixed_precision": "bf16",
            "save_images": False,
            "save_model_epochs": 99,
            "use_tensor_cache": True,
            "save_tensor_cache": True,
        })
        cfg_path = work / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))

        import io
        import logging

        from fmdm_tpu.data.dataset_utils import build_train_val_datasets
        from fmdm_tpu.utils.config import load_json_config
        from fmdm_tpu.train.flow_matching_lib import train

        log_buf = io.StringIO()
        handler = logging.StreamHandler(log_buf)
        logging.getLogger().addHandler(handler)

        full_cfg = load_json_config(cfg_path)
        train_ds, _ = build_train_val_datasets(full_cfg)
        train(train_ds, cfg_path)

        rates = [float(m) for m in re.findall(r"([0-9.]+) samples/s", log_buf.getvalue())]
        if len(rates) < 2:
            raise SystemExit(f"could not parse two epoch rates from logs: {rates}")
        cold, warm = rates[0], rates[1]
        print(json.dumps({
            "cold_samples_per_sec": round(cold, 2),
            "warm_samples_per_sec": round(warm, 2),
            "ratio": round(cold / warm, 3),
            "samples_per_epoch": num_volumes * slices,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
