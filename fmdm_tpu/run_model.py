"""
Unified dispatcher for sampling/encoding/decoding/evaluation workflows.

CLI-compatible with the reference's run_model entry point
(/root/reference/src/run_model.py:31-106): same 6 modes, same 17 flags, same
handler-registry keys, so shipped invocations work unchanged. The flag surface
is declared as a spec table below; --device is accepted but placement is
JAX-managed on TPU.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from fmdm_tpu.sample.handlers import DiffusionHandler, FlowMatchingHandler, VAEHandler
from fmdm_tpu.sample.sampling_utils import load_run_config

HANDLER_REGISTRY = {
    "vae": VAEHandler,
    "diffusion": DiffusionHandler,
    "flow_matching": FlowMatchingHandler,
}

MODES = ("sample", "encode", "decode", "evaluate", "build_tensor_cache", "debug_compare")

# (flag, kwargs) — every value flag below is also forwarded to the handler
# constructor under its own name; store_true flags forward as booleans.
_FLAG_SPEC = [
    ("--ckpt_dir", dict(type=Path, required=True,
                        help="Checkpoint directory containing train_config.json.")),
    ("--mode", dict(type=str, choices=MODES, default="sample")),
    ("--data_txt", dict(type=str, default=None, help="Optional override split file.")),
    ("--save", dict(action="store_true", help="Save outputs to disk.")),
    ("--output_dir", dict(type=str, default=None,
                          help="Output root directory (defaults to ckpt_dir/outputs).")),
    ("--batch_size", dict(type=int, default=4, help="Batch size for processing.")),
    ("--device", dict(type=str, default=None,
                      help="Accepted for CLI compat; placement is JAX-managed.")),
    ("--seed", dict(type=int, default=42, help="Random seed.")),
    ("--timestep", dict(type=int, default=None, help="Optional timestep for encode.")),
    ("--num_samples", dict(type=int, default=None, help="Random subset size to process.")),
    ("--num_inference_steps", dict(type=int, default=None,
                                   help="Override scheduler inference steps (diffusion/flow only).")),
    ("--start_step", dict(type=int, default=None,
                          help="Start denoising from this train-timestep index (e.g., 700 runs from t<=700).")),
    ("--last_n_steps", dict(type=int, default=None, help="Run only the last N denoising steps.")),
    ("--scheduler", dict(type=str, default=None,
                         help="Override scheduler at runtime (ddpm, ddim, dpmsolver1, dpmsolver2, "
                              "dpmsolver++, dpmsolversde, unipc, flowmatch). Optional query "
                              "params reach the scheduler config surface, e.g. "
                              "'dpmsolver++?thresholding=true' (dynamic thresholding — "
                              "stabilizes DPM-family solvers on imperfect pixel-space models).")),
    ("--save_input", dict(action="store_true",
                          help="Also save model inputs when --save is enabled.")),
    ("--save_conditioning", dict(action="store_true",
                                 help="Also save conditioning tensors when --save is enabled.")),
    ("--save_tensor_cache", dict(action="store_true",
                                 help="Force writing tensor cache files at runtime without editing train_config.json.")),
    ("--deep_cache", dict(type=str, default=None,
                          help="DeepCache acceleration 'INTERVAL[:DEPTH[:SCHEDULE]]' (e.g. 3, 3:1, "
                               "3:1:uniform): refresh the deep UNet levels on a schedule, recompute only "
                               "the shallow levels in between (~1.4x sampling throughput; see "
                               "BENCHMARKS.md for the measured quality trade). SCHEDULE 'adaptive' "
                               "(default) keeps the first/last denoise steps always-full, recovering "
                               "most of uniform caching's PSNR loss; 'uniform' is classic DeepCache. "
                               "Or 'auto[:dPSNR]' (evaluate mode only, default budget 0.5): probe "
                               "candidate intervals on the first reference batch and keep the fastest "
                               "within the PSNR budget of exact sampling. "
                               "Beyond-reference flag; omit for exact sampling.")),
    ("--latent_vae", dict(type=str, default=None,
                          help="Run dir (or config) of a trained VAE: treat the diffusion model's "
                               "samples as LATENTS and decode them through this VAE before "
                               "metrics/saving (full latent-diffusion chain: VAE-encode data -> "
                               "scan-denoise in latent space -> VAE-decode; reference composition "
                               "src/models/vae/kl.py:118-136). Targets are decoded the same way, "
                               "so evaluate metrics are pixel-space. Beyond-reference flag.")),
    ("--quantize", dict(type=str, default=None, choices=["int8", "int8+linear"],
                        help="Post-training quantized inference: 'int8' runs eligible "
                             "convolutions on the TPU's 2x-rate int8 MXU path (W8A8, "
                             "per-channel weight scales, activation scales calibrated on "
                             "the first batch); 'int8+linear' additionally quantizes the "
                             "attention to_q/to_k/to_v/to_out projections (token-gated "
                             "policy, utils/quantize.py). Measured speedup and quality "
                             "cost in BENCHMARKS.md. Beyond-reference flag.")),
    ("--use_ema", dict(action="store_true",
                       help="Load the EMA shadow weights ('ema' tree, written when "
                            "training.ema_decay > 0) instead of the live weights. "
                            "Fails loudly if the checkpoint has no EMA tree. "
                            "Beyond-reference flag.")),
    ("--no_dp_sampling", dict(action="store_true",
                              help="Disable automatic data-parallel sampling over local devices "
                                   "(batch-sharded reverse-process scan; on by default when more "
                                   "than one chip is visible). Beyond-reference flag.")),
]


def _parse_deep_cache(value):
    if value is None:
        return None
    parts = str(value).split(":")
    if parts[0] == "auto":
        # quality-budget autotune (beyond reference): probe candidates on the
        # first evaluate batch and keep the fastest within <dPSNR> of exact
        budget = float(parts[1]) if len(parts) > 1 and parts[1] else 0.5
        if budget <= 0:
            raise ValueError("--deep_cache auto:<dPSNR> needs a positive budget")
        return ("auto", budget)
    interval = int(parts[0])
    depth = int(parts[1]) if len(parts) > 1 and parts[1] else 1
    schedule = parts[2] if len(parts) > 2 and parts[2] else "adaptive"
    if schedule not in ("adaptive", "uniform"):
        raise ValueError(f"--deep_cache schedule must be 'adaptive' or 'uniform', got '{schedule}'")
    return (interval, depth, schedule)


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run sampling/encoding/decoding/eval/cache-build from a checkpoint dir."
    )
    for flag, kwargs in _FLAG_SPEC:
        parser.add_argument(flag, **kwargs)
    return parser


def _resolve_handler(model_type: str):
    key = str(model_type).lower()
    if key not in HANDLER_REGISTRY:
        raise ValueError(f"Unsupported model_type '{model_type}'.")
    return HANDLER_REGISTRY[key]


def main() -> None:
    from fmdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s | %(levelname)s | %(message)s", force=True)

    args = _build_parser().parse_args()

    cfg = load_run_config(args.ckpt_dir)
    handler_cls = _resolve_handler(cfg.get("model", {}).get("model_type", "vae"))

    handler_kwargs = {name.lstrip("-"): getattr(args, name.lstrip("-"))
                      for name, _ in _FLAG_SPEC if name != "--mode"}
    # engine-level runtime options, not part of the reference handler surface
    from fmdm_tpu.sample.diffusion_utils import (set_deep_cache, set_dp_sampling,
                                                 set_quantize, set_use_ema)

    set_deep_cache(_parse_deep_cache(handler_kwargs.pop("deep_cache", None)))
    set_dp_sampling(not handler_kwargs.pop("no_dp_sampling", False))
    set_use_ema(handler_kwargs.pop("use_ema", False))
    set_quantize(handler_kwargs.pop("quantize", None))
    handler = handler_cls(**handler_kwargs)

    # every mode maps 1:1 onto a handler method of the same name
    getattr(handler, args.mode)()


if __name__ == "__main__":
    main()
