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

Usage:
  python scripts/bench_input_pipeline.py [num_volumes] [slices_per_vol]
  # or split (keeps the timed phase inside one continuous window):
  python scripts/bench_input_pipeline.py prepare <workdir> [nv] [spv]
  python scripts/bench_input_pipeline.py measure <workdir>
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

import jax

# persistent executable cache so the measurement run pays no compile
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


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


def _write_cfg(work: Path) -> Path:
    cfg = json.loads((REPO / "configs/LDCT/LDCT_flow_matching_diffusers_nd.json").read_text())
    cfg["training"].update({
        "data_root": str(work),
        "output_dir": str(work / "run"),
        # same num_epochs in both passes: epochs*steps feeds the LR
        # schedule constants, so differing values would force a second
        # jit compile in the measurement pass
        "num_epochs": 2,
        "mixed_precision": "bf16",
        "save_images": False,
        "save_model_epochs": 99,
        "use_tensor_cache": True,
        "save_tensor_cache": True,
        "num_workers": 8,
    })
    cfg_path = work / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return cfg_path


def prepare(work: Path, num_volumes: int, slices: int) -> None:
    """Generate the tree, pay the jit compile, populate then delete the
    tensor cache — leaves `work` ready for a timed `measure` run."""
    from fmdm_tpu.data.dataset_utils import build_train_val_datasets
    from fmdm_tpu.utils.config import load_json_config
    from fmdm_tpu.train.flow_matching_lib import train

    make_ldct_tree(work, num_volumes, slices)
    cfg_path = _write_cfg(work)
    full_cfg = load_json_config(cfg_path)
    train_ds, _ = build_train_val_datasets(full_cfg)
    train(train_ds, cfg_path)
    shutil.rmtree(work / "cache", ignore_errors=True)
    print("prepared", work)


class _CacheDropAfterFirstEpoch:
    """Dataset proxy that deletes the tensor-cache tree once the first
    epoch's len(ds) accesses have been served — so within ONE train() run
    (one jit compile): epoch 1 = compile + populate (discarded), epoch 2 =
    cold cache, epoch 3 = warm cache. Single-process by construction, which
    sidesteps the remote-compile tunnel's unreliable cross-process
    executable cache."""

    def __init__(self, ds, cache_root: Path):
        import threading

        self._ds = ds
        self._cache_root = cache_root
        self._count = 0
        self._lock = threading.Lock()

    def __len__(self):
        return len(self._ds)

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def __getitem__(self, i):
        with self._lock:
            self._count += 1
            if self._count == len(self._ds) + 1:
                shutil.rmtree(self._cache_root, ignore_errors=True)
        return self._ds[i]


def measure(work: Path) -> None:
    import contextlib
    import io

    from fmdm_tpu.data.dataset_utils import build_train_val_datasets
    from fmdm_tpu.utils.config import load_json_config
    from fmdm_tpu.train.flow_matching_lib import train

    cfg_path = work / "cfg.json"
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["output_dir"] = str(work / "run_measure")
    cfg["training"]["num_epochs"] = 3
    cfg_path.write_text(json.dumps(cfg))
    full_cfg = load_json_config(cfg_path)
    train_ds, _ = build_train_val_datasets(full_cfg)
    train_ds = _CacheDropAfterFirstEpoch(train_ds, work / "cache")
    # train() calls logging.basicConfig(force=True), binding a fresh
    # StreamHandler to whatever sys.stderr is at that moment — so a
    # redirect here captures the epoch rate lines.
    log_buf = io.StringIO()
    with contextlib.redirect_stderr(log_buf):
        train(train_ds, cfg_path)
    rates = [float(m) for m in re.findall(r"([0-9.]+) samples/s", log_buf.getvalue())]
    if len(rates) < 3:
        raise SystemExit(f"could not parse three epoch rates from logs: {rates}")
    cold, warm = rates[1], rates[2]
    n = len(train_ds)
    print(json.dumps({
        "cold_samples_per_sec": round(cold, 2),
        "warm_samples_per_sec": round(warm, 2),
        "ratio": round(cold / warm, 3),
        "samples_per_epoch": n,
    }))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] in ("prepare", "measure"):
        work = Path(sys.argv[2])
        if sys.argv[1] == "prepare":
            work.mkdir(parents=True, exist_ok=True)
            prepare(work, int(sys.argv[3]) if len(sys.argv) > 3 else 6,
                    int(sys.argv[4]) if len(sys.argv) > 4 else 24)
        else:
            measure(work)
        return

    num_volumes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    slices = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    work = Path(tempfile.mkdtemp(prefix="ldct_bench_"))
    try:
        make_ldct_tree(work, num_volumes, slices)

        cfg = json.loads((REPO / "configs/LDCT/LDCT_flow_matching_diffusers_nd.json").read_text())
        cfg["training"].update({
            "data_root": str(work),
            "output_dir": str(work / "run"),
            # same num_epochs in both passes: epochs*steps feeds the LR
            # schedule constants, so differing values would force a second
            # jit compile in the measurement pass
            "num_epochs": 2,
            "mixed_precision": "bf16",
            "save_images": False,
            "save_model_epochs": 99,
            "use_tensor_cache": True,
            "save_tensor_cache": True,
            "num_workers": 8,
        })
        cfg_path = work / "cfg.json"
        cfg_path.write_text(json.dumps(cfg))

        import contextlib
        import io

        from fmdm_tpu.data.dataset_utils import build_train_val_datasets
        from fmdm_tpu.utils.config import load_json_config
        from fmdm_tpu.train.flow_matching_lib import train

        # Pass 1 (discarded): pays the jit compile (persistent-cached) and
        # populates the tensor cache — which we then delete, so pass 2's
        # first epoch is a true cold-cache epoch with a warm executable.
        full_cfg = load_json_config(cfg_path)
        train_ds, _ = build_train_val_datasets(full_cfg)
        train(train_ds, cfg_path)
        shutil.rmtree(work / "cache", ignore_errors=True)

        cfg["training"]["num_epochs"] = 2
        cfg["training"]["output_dir"] = str(work / "run2")
        cfg_path.write_text(json.dumps(cfg))
        full_cfg = load_json_config(cfg_path)
        train_ds, _ = build_train_val_datasets(full_cfg)
        # train() calls logging.basicConfig(force=True), binding a fresh
        # StreamHandler to whatever sys.stderr is at that moment — so a
        # redirect here captures the epoch rate lines.
        log_buf = io.StringIO()
        with contextlib.redirect_stderr(log_buf):
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
