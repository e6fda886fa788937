"""
Training entrypoint (CLI parity with the reference train.py:33-104).

Usage:
    python train.py --config path/to/config.json [--resume ckpt]
    python train.py --config cfg.json --debug_visual_only --ckpt run/diff_best.pt

Dispatches on model.model_type ∈ {vae, diffusion, flow_matching}.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path
from typing import Callable, Dict

REPO_ROOT = Path(__file__).resolve().parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from fmdm_tpu.data.dataset_utils import build_train_val_datasets
from fmdm_tpu.utils.config import load_json_config


def _trainers() -> Dict[str, Callable]:
    from fmdm_tpu.train.diffusion_lib import train as train_diffusion
    from fmdm_tpu.train.flow_matching_lib import train as train_flow_matching
    from fmdm_tpu.train.vae_lib import train as train_vae

    return {
        "vae": train_vae,
        "flow_matching": train_flow_matching,
        "diffusion": train_diffusion,
    }


def dispatch_train(cfg_path: Path, resume) -> None:
    cfg = load_json_config(cfg_path)
    model_cfg = cfg.get("model", {})
    model_type = str(model_cfg.get("model_type", "")).lower()
    trainers = _trainers()
    trainer = trainers.get(model_type)
    if trainer is None:
        available = ", ".join(trainers.keys())
        raise ValueError(f"Unsupported model_type '{model_type}'. Expected one of {{{available}}}.")
    train_ds, val_ds = build_train_val_datasets(cfg)
    trainer(train_ds, cfg_path, val_dataset=val_ds, resume=resume)


def main() -> None:
    from fmdm_tpu.utils.cache import enable_compile_cache
    from fmdm_tpu.parallel.mesh import maybe_initialize_distributed

    enable_compile_cache()
    # multi-host rendezvous (torchrun analogue): no-op unless
    # JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES are set or a pod runtime
    # already initialized the distributed client
    maybe_initialize_distributed()
    parser = argparse.ArgumentParser(description="Train models from JSON configs.")
    parser.add_argument("--config", type=Path, required=True, help="Path to JSON config.")
    parser.add_argument("--resume", type=str, default=None, help="Checkpoint path to resume from (optional).")
    parser.add_argument("--debug_visual_only", action="store_true",
                        help="Load checkpoint and save visual generations without training.")
    parser.add_argument("--ckpt", type=str, default=None, help="Checkpoint path for --debug_visual_only.")
    parser.add_argument("--visual_samples", type=int, default=10, help="Number of samples for --debug_visual_only.")
    parser.add_argument("--debug_split", type=str, choices=("train", "test"), default="test",
                        help="Split used by --debug_visual_only.")
    parser.add_argument("--output_dir", type=str, default=None, help="Output dir override for --debug_visual_only.")
    parser.add_argument("--seed", type=int, default=None, help="Seed override for --debug_visual_only.")
    args = parser.parse_args()

    if args.debug_visual_only:
        cfg = load_json_config(args.config)
        model_type = str(cfg.get("model", {}).get("model_type", "")).lower()
        if not args.ckpt:
            raise ValueError("--ckpt is required when using --debug_visual_only.")
        train_ds, val_ds = build_train_val_datasets(cfg)
        ds = train_ds if args.debug_split == "train" else val_ds
        kwargs = dict(output_dir=args.output_dir, visual_samples=args.visual_samples, seed=args.seed)
        if model_type == "diffusion":
            from fmdm_tpu.train.diffusion_lib import debug_visual_only
            debug_visual_only(ds, args.config, args.ckpt, **kwargs)
        elif model_type == "flow_matching":
            from fmdm_tpu.train.flow_matching_lib import debug_visual_only
            debug_visual_only(ds, args.config, args.ckpt, **kwargs)
        elif model_type == "vae":
            from fmdm_tpu.train.vae_lib import debug_visual_only
            debug_visual_only(ds, args.config, args.ckpt, **kwargs)
        else:
            raise ValueError(f"--debug_visual_only unsupported model_type '{model_type}'.")
        return
    dispatch_train(args.config, args.resume)


if __name__ == "__main__":
    main()
