"""
Shared helpers for sampling/encoding/decoding dispatchers.

Behavioral parity with /root/reference/src/utils/sampling_utils.py:17-390:
load_run_config with legacy diffusers-pipeline-folder synthesis, checkpoint
resolution (best > last > legacy safetensors), eval-mode dataset namespace
switching, deterministic subset selection, eval CSV writers, timestamped
experiment dirs.
"""

from __future__ import annotations

import csv
import json
import random
from datetime import datetime
from pathlib import Path
from typing import Optional

from fmdm_tpu.data.dataset_utils import build_dataset_from_config, iter_batches
from fmdm_tpu.utils.config import load_json_config


def _load_diffusers_legacy_run_config(ckpt_dir: Path) -> dict:
    """Synthesize a run config from a legacy diffusers pipeline folder
    (sampling_utils.py:17-103)."""
    model_index_path = ckpt_dir / "model_index.json"
    scheduler_cfg_path = ckpt_dir / "scheduler" / "scheduler_config.json"
    unet_cfg_path_json = ckpt_dir / "unet" / "config.json"
    unet_cfg_path_txt = ckpt_dir / "unet" / "config.txt"
    unet_cfg_path = unet_cfg_path_json if unet_cfg_path_json.exists() else unet_cfg_path_txt

    if not (model_index_path.exists() and scheduler_cfg_path.exists() and unet_cfg_path.exists()):
        raise FileNotFoundError(
            "Missing train_config.json and could not resolve a legacy diffusers folder layout."
        )

    model_index = json.loads(model_index_path.read_text())
    scheduler_cfg = json.loads(scheduler_cfg_path.read_text())
    unet_cfg = json.loads(unet_cfg_path.read_text())

    in_channels = int(unet_cfg.get("in_channels", 1))
    out_channels = int(unet_cfg.get("out_channels", 1))
    conditioning = "concatenate" if in_channels > out_channels else None

    return {
        "training": {
            "data_root": "/",
            "dataset": "ldct",
            "channels": out_channels,
            "img_size": int(unet_cfg.get("sample_size", 256)),
            "num_train_timesteps": int(scheduler_cfg.get("num_train_timesteps", 1000)),
            "num_inference_steps": int(scheduler_cfg.get("num_train_timesteps", 1000)),
            "conditioning": conditioning,
            "load_ldct": bool(conditioning in {"concatenate", "attention"}),
            "norm": True,
        },
        "model": {
            "model_type": "diffusion",
            "conditioning": conditioning,
            "scheduler": {
                "name": str(scheduler_cfg.get("_class_name", "DDPMScheduler")).replace("Scheduler", "").lower(),
                "num_train_timesteps": int(scheduler_cfg.get("num_train_timesteps", 1000)),
                "num_inference_steps": int(scheduler_cfg.get("num_train_timesteps", 1000)),
                "params": {
                    k: v for k, v in scheduler_cfg.items()
                    if k not in {"_class_name", "_diffusers_version", "num_train_timesteps",
                                 "num_inference_steps", "trained_betas"}
                },
            },
            "unet": {
                "unet_impl": "diffusers_nd",
                "in_channels_already_conditioned": True,
                "sample_size": unet_cfg.get("sample_size", 256),
                "in_channels": in_channels,
                "out_channels": out_channels,
                "layers_per_block": int(unet_cfg.get("layers_per_block", 2)),
                "block_out_channels": tuple(unet_cfg.get("block_out_channels", [128, 128, 256, 256, 512, 512])),
                "down_block_types": tuple(unet_cfg.get("down_block_types", [])),
                "up_block_types": tuple(unet_cfg.get("up_block_types", [])),
                "attention_head_dim": int(unet_cfg.get("attention_head_dim", 8)),
                "norm_num_groups": int(unet_cfg.get("norm_num_groups", 32)),
                "norm_eps": float(unet_cfg.get("norm_eps", 1e-5)),
                "flip_sin_to_cos": bool(unet_cfg.get("flip_sin_to_cos", True)),
                "freq_shift": int(unet_cfg.get("freq_shift", 0)),
                "center_input_sample": bool(unet_cfg.get("center_input_sample", False)),
                "resnet_time_scale_shift": str(unet_cfg.get("resnet_time_scale_shift", "default")),
                "add_attention": bool(unet_cfg.get("add_attention", True)),
                "load_legacy": True,
            },
            "legacy_source": {
                "model_index": model_index,
                "scheduler_config_path": str(scheduler_cfg_path),
                "unet_config_path": str(unet_cfg_path),
            },
        },
        "__config_path__": str(model_index_path),
    }


def load_run_config(ckpt_dir: Path) -> dict:
    ckpt_dir = Path(ckpt_dir)
    cfg_path = ckpt_dir / "train_config.json"
    if not cfg_path.exists():
        return _load_diffusers_legacy_run_config(ckpt_dir)
    cfg = load_json_config(cfg_path)
    existing_path = cfg.get("__config_path__")
    if existing_path:
        existing = Path(existing_path)
        if existing.exists():
            return cfg
    cfg["__config_path__"] = str(cfg_path)
    return cfg


def resolve_checkpoint(ckpt_dir: Path, model_type: str) -> Path:
    model_type = str(model_type).lower()
    ckpt_dir = Path(ckpt_dir)
    if model_type == "vae":
        candidates = ["vae_best.pt", "vae_last.pt"]
    elif model_type == "diffusion":
        candidates = ["diff_best.pt", "diff_last.pt"]
    elif model_type == "flow_matching":
        candidates = ["flow_best.pt", "flow_last.pt"]
    else:
        candidates = ["*.pt"]
    for name in candidates:
        path = ckpt_dir / name
        if path.exists():
            return path
    if model_type == "diffusion":
        legacy_unet_st = ckpt_dir / "unet" / "diffusion_pytorch_model.safetensors"
        if legacy_unet_st.exists():
            return legacy_unet_st
    if candidates == ["*.pt"]:
        pts = sorted(ckpt_dir.glob("*.pt"))
        if pts:
            return pts[-1]
    raise FileNotFoundError(f"No checkpoint found in {ckpt_dir}")


def _eval_cache_subdir(cache_subdir: Optional[str]) -> str:
    cache_name = str(cache_subdir or "cache")
    return cache_name if cache_name.endswith("_eval") else f"{cache_name}_eval"


def build_sampling_dataset(cfg: dict, data_txt: Optional[str], evaluate: bool = False,
                           save_tensor_cache_override: Optional[bool] = None):
    training_cfg = dict(cfg.get("training", {}))
    if save_tensor_cache_override is not None:
        training_cfg["save_tensor_cache"] = bool(save_tensor_cache_override)
    if evaluate:
        if data_txt:
            training_cfg["split_file"] = data_txt
        else:
            training_cfg.pop("split_file", None)
        training_cfg["tensor_cache_subdir"] = _eval_cache_subdir(training_cfg.get("tensor_cache_subdir"))
    elif data_txt:
        training_cfg["split_file"] = data_txt
    cfg_path = Path(cfg.get("__config_path__", "")) if cfg.get("__config_path__") else None
    return build_dataset_from_config(training_cfg, cfg.get("model", {}), train=False, cfg_path=cfg_path)


def resolve_output_root(ckpt_dir: Path, output_dir: Optional[str], save: bool) -> Optional[Path]:
    if not save:
        return None
    if output_dir:
        return Path(output_dir)
    return Path(ckpt_dir) / "outputs"


def resolve_sample_indices(dataset, num_samples: Optional[int], seed: int = 42):
    total = len(dataset)
    if total == 0:
        return []
    if num_samples is None or int(num_samples) <= 0 or int(num_samples) >= total:
        return list(range(total))
    rng = random.Random(seed)
    return rng.sample(list(range(total)), int(num_samples))


def progress_batches(dataset, batch_size: int, desc: str, indices=None):
    selected = list(range(len(dataset))) if indices is None else list(indices)
    total = len(selected)
    bs = max(int(batch_size), 1)
    total_batches = (total + bs - 1) // bs
    iterator = iter_batches(dataset, batch_size, indices=selected)
    try:
        from tqdm import tqdm

        iterator = tqdm(iterator, total=total_batches, desc=desc, leave=False, dynamic_ncols=True, disable=None)
    except Exception:
        pass
    return iterator


def build_tensor_cache_from_config(cfg: dict, data_txt: Optional[str], batch_size: int,
                                   seed: int, num_samples: Optional[int],
                                   desc: str = "build_tensor_cache", evaluate: bool = True) -> int:
    dataset = build_sampling_dataset(cfg, data_txt, evaluate=evaluate)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    total = 0
    for _, samples in progress_batches(dataset, batch_size, desc, indices=selected_indices):
        for sample in samples:
            _ = sample["target"]
            _ = sample.get("image")
        total += len(samples)
    return total


def append_eval_metrics(ckpt_dir: Path, row: dict) -> Path:
    out_path = Path(ckpt_dir) / "eval_metrics.csv"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    payload = {str(k): str(v) for k, v in row.items()}
    fieldnames = list(payload.keys())
    exists = out_path.exists()
    with out_path.open("a", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=fieldnames)
        if not exists:
            writer.writeheader()
        writer.writerow(payload)
    return out_path


def append_per_image_eval_metrics(ckpt_dir: Path, rows) -> Path:
    out_path = Path(ckpt_dir) / "eval_metrics_per_image.csv"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        if not out_path.exists():
            out_path.write_text("")
        return out_path
    fieldnames = []
    for row in rows:
        for key in row.keys():
            if key not in fieldnames:
                fieldnames.append(key)
    with out_path.open("w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=fieldnames)
        writer.writeheader()
        for row in rows:
            writer.writerow({k: row.get(k, "") for k in fieldnames})
    return out_path


def write_eval_metrics(ckpt_dir: Path, row: dict) -> Path:
    out_path = Path(ckpt_dir) / "eval_metrics.csv"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    payload = {str(k): str(v) for k, v in row.items()}
    with out_path.open("w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(payload.keys()))
        writer.writeheader()
        writer.writerow(payload)
    return out_path


def create_experiment_dir(output_dir, mode: str, scheduler: Optional[str],
                          last_n_steps: Optional[int], start_step: Optional[int],
                          num_inference_steps: Optional[int], num_samples: Optional[int],
                          seed: int, batch_size: int) -> Optional[Path]:
    if not output_dir:
        return None
    root = Path(output_dir)
    root.mkdir(parents=True, exist_ok=True)
    ts = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    sched = (scheduler or "default").replace("+", "pp")
    step_tag = (
        f"last{int(last_n_steps)}" if last_n_steps is not None
        else f"start{int(start_step)}" if start_step is not None
        else f"steps{int(num_inference_steps)}" if num_inference_steps is not None
        else "stepscfg"
    )
    ns = f"ns{num_samples}" if num_samples is not None else "nsall"
    name = f"{ts}_{mode}_{sched}_{step_tag}_{ns}_seed{int(seed)}_bs{int(batch_size)}"
    exp_dir = root / name
    exp_dir.mkdir(parents=True, exist_ok=False)
    return exp_dir
