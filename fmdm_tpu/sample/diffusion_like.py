"""
Sampling/encoding/decoding/evaluation engine for diffusion-like generators.

Behavioral parity with /root/reference/src/pipelines/samplers/diffusion_like.py:
_run_encode (forward-noising dump), _run_decode (full/partial reverse sampling
with init_from_reference + predicted/input/conditioning trees), _run_evaluate
(MSE/PSNR/SSIM + synced throughput, per-image + summary CSVs, run_config.json),
_run_debug_compare (single-sample artifact dump with no-cond probe + stats).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.data.dataset_utils import save_output_tensor
from fmdm_tpu.data.dataset_utils import save_tensor_cache as _write_tensor
from fmdm_tpu.schedulers import build_scheduler, resolve_conditioning_mode
from fmdm_tpu.sample.diffusion_utils import (
    build_diffusion_model,
    decode_diffusion_batch,
    encode_diffusion_batch,
)
from fmdm_tpu.sample.sampling_utils import (
    append_eval_metrics,
    append_per_image_eval_metrics,
    build_sampling_dataset,
    create_experiment_dir,
    load_run_config,
    progress_batches,
    resolve_checkpoint,
    resolve_output_root,
    resolve_sample_indices,
    write_eval_metrics,
)
from fmdm_tpu.utils.config import set_seed
from fmdm_tpu.utils.evaluation import compute_ssim_sample


def _stack(samples, key):
    vals = [s.get(key) for s in samples]
    if any(v is None for v in vals):
        return None
    return jnp.asarray(np.stack([np.asarray(v, np.float32) for v in vals], axis=0))


def _run_encode(*, ckpt_dir, model_type: str, data_txt=None, save: bool = False,
                output_dir=None, batch_size: int = 4, device=None, seed: int = 42,
                timestep=None, num_samples=None, save_tensor_cache: bool = False) -> None:
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    training_cfg, model_cfg = cfg["training"], cfg["model"]
    set_seed(seed)

    dataset = build_sampling_dataset(cfg, data_txt, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    output_root = resolve_output_root(ckpt_dir, output_dir, save)

    scheduler, _ = build_scheduler(model_cfg.get("scheduler", {}), training_cfg)
    rng = jax.random.PRNGKey(seed)

    for indices, samples in progress_batches(dataset, batch_size, f"{model_type} encode", indices=selected_indices):
        targets = _stack(samples, "target")
        rng, t_rng, n_rng = jax.random.split(rng, 3)
        if timestep is None:
            timesteps = jax.random.randint(t_rng, (targets.shape[0],), 0, scheduler.num_train_timesteps)
        else:
            timesteps = jnp.full((targets.shape[0],), int(timestep), jnp.int32)
        noisy = np.asarray(encode_diffusion_batch(scheduler, targets, timesteps, n_rng))
        if output_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, noisy[batch_idx], output_root)
    logging.info("%s encode completed for %d samples.", model_type.replace("_", "-").title(), len(selected_indices))


def _run_decode(*, ckpt_dir, model_type: str, data_txt=None, save: bool = False,
                output_dir=None, batch_size: int = 4, device=None, seed: int = 42,
                num_samples=None, save_input: bool = False, save_conditioning: bool = False,
                num_inference_steps=None, start_step=None, last_n_steps=None,
                scheduler=None, save_tensor_cache: bool = False,
                latent_vae=None) -> None:
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, model_type)
    training_cfg, model_cfg = cfg["training"], cfg["model"]
    set_seed(seed)

    dataset = build_sampling_dataset(cfg, data_txt, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    output_root = resolve_output_root(ckpt_dir, output_dir, save)

    model, params = build_diffusion_model(cfg, ckpt_path=ckpt_path)
    conditioning_mode = resolve_conditioning_mode(training_cfg.get("conditioning") or model_cfg.get("conditioning"))
    vae_decode = _load_latent_vae(latent_vae)
    rng = jax.random.PRNGKey(seed)

    predicted_root = output_root / "predicted" if output_root is not None else None
    for indices, samples in progress_batches(dataset, batch_size, f"{model_type} decode", indices=selected_indices):
        targets = _stack(samples, "target")
        cond = _stack(samples, "image") if conditioning_mode in {"concatenate", "attention"} else None
        rng, step_rng = jax.random.split(rng)
        generated = decode_diffusion_batch(
            model, params, training_cfg, model_cfg, tuple(targets.shape), cond,
            rng=step_rng,
            reference_batch=targets,
            init_from_reference=(start_step is not None) or (last_n_steps is not None),
            num_inference_steps=num_inference_steps,
            start_step=start_step, last_n_steps=last_n_steps,
            scheduler_override=scheduler,
        )
        if vae_decode is not None:
            generated = vae_decode(generated)
        generated = np.clip(np.asarray(generated), 0.0, 1.0)
        if predicted_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, generated[batch_idx], predicted_root)
                if save_input:
                    save_output_tensor(dataset, row, dataset.target_key, samples[batch_idx]["target"], output_root / "input")
                if save_conditioning and dataset.conditioning_key is not None:
                    save_output_tensor(dataset, row, dataset.conditioning_key, samples[batch_idx]["image"], output_root / "conditioning")
    logging.info("%s decode completed for %d samples.", model_type.replace("_", "-").title(), len(selected_indices))


def _load_latent_vae(latent_vae):
    """decode_fn for --latent_vae, or None.

    decode_fn maps latent batches -> [0,1] pixel images through the trained
    VAE (the reference's latent->image composition, src/models/vae/kl.py:118-136).
    Accepts '<run_dir>?scale=S' where S is the factor the STORED latents were
    multiplied by at encode time (e.g. 1/std of the train latents, the
    LATENT_SCALE generalization for a VAE whose raw latent scale differs from
    SD's); decode divides it back out before the VAE decoder."""
    if not latent_vae:
        return None
    from fmdm_tpu.sample.vae_utils import build_vae_model, decode_vae_batch

    path = str(latent_vae)
    scale = 1.0
    if "?" in path:
        path, _, qs = path.partition("?")
        for kv in filter(None, qs.split(",")):
            key, _, value = kv.partition("=")
            if key == "scale":
                scale = float(value)
            else:
                raise ValueError(f"Unknown --latent_vae param '{key}'")
    vae_dir = Path(path)
    vae_cfg = load_run_config(vae_dir)
    vae_ckpt = resolve_checkpoint(vae_dir, "vae")
    vae_model, vae_params = build_vae_model(vae_cfg, ckpt_path=vae_ckpt)
    recon_type = str(vae_cfg.get("training", {}).get("recon_type", "l1"))

    def decode_fn(latents):
        raw = jnp.asarray(np.asarray(latents)) / scale
        return np.asarray(decode_vae_batch(vae_model, vae_params, raw,
                                           recon_type=recon_type))

    return decode_fn


def _run_evaluate(*, ckpt_dir, model_type: str, data_txt=None, save: bool = False,
                  output_dir=None, batch_size: int = 4, device=None, seed: int = 42,
                  num_samples=None, save_input: bool = False, save_conditioning: bool = False,
                  num_inference_steps=None, start_step=None, last_n_steps=None,
                  scheduler=None, save_tensor_cache: bool = False,
                  latent_vae=None) -> None:
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, model_type)
    training_cfg, model_cfg = cfg["training"], cfg["model"]
    set_seed(seed)

    dataset = build_sampling_dataset(cfg, data_txt, evaluate=True, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    experiment_dir = create_experiment_dir(
        output_dir=output_dir, mode="evaluate", scheduler=scheduler,
        last_n_steps=last_n_steps, start_step=start_step,
        num_inference_steps=num_inference_steps, num_samples=num_samples,
        seed=seed, batch_size=batch_size,
    )
    output_root = (experiment_dir / "samples") if (save and experiment_dir is not None) else resolve_output_root(ckpt_dir, output_dir, save)
    model, params = build_diffusion_model(cfg, ckpt_path=ckpt_path)
    conditioning_mode = resolve_conditioning_mode(training_cfg.get("conditioning") or model_cfg.get("conditioning"))
    vae_decode = _load_latent_vae(latent_vae)

    # --deep_cache auto:<dPSNR>: resolve the quality budget to a concrete
    # (interval, depth, schedule) by probing the FIRST eval batch (which has
    # references) at this run's exact settings; the chosen engine is then
    # already compiled for the main loop. No-op without an auto spec.
    import fmdm_tpu.sample.diffusion_utils as _du
    if _du._deep_cache_is_auto(_du._DEEP_CACHE):
        probe_indices = selected_indices[:batch_size] if selected_indices is not None \
            else list(range(min(batch_size, len(dataset))))
        probe_samples = [dataset[i] for i in probe_indices]
        probe_targets = _stack(probe_samples, "target")
        probe_cond = (_stack(probe_samples, "image")
                      if conditioning_mode in {"concatenate", "attention"} else None)
        _du.resolve_auto_deep_cache(
            model, params, training_cfg, model_cfg,
            np.asarray(probe_targets), probe_cond,
            num_inference_steps=num_inference_steps,
            scheduler_override=scheduler,
            rng=jax.random.PRNGKey(seed + 1),
            postprocess=vae_decode,
        )

    total_mse = total_psnr = total_ssim = 0.0
    count = ssim_count = 0
    model_timing = {"model_seconds": 0.0, "model_calls": 0}
    per_image_rows = []
    rng = jax.random.PRNGKey(seed)

    predicted_root = output_root / "predicted" if output_root is not None else None
    batch_iter = progress_batches(dataset, batch_size, f"{model_type} evaluate", indices=selected_indices)
    for indices, samples in batch_iter:
        targets = _stack(samples, "target")
        cond = _stack(samples, "image") if conditioning_mode in {"concatenate", "attention"} else None
        rng, step_rng = jax.random.split(rng)
        generated = decode_diffusion_batch(
            model, params, training_cfg, model_cfg, tuple(targets.shape), cond,
            rng=step_rng, timing=model_timing,
            reference_batch=targets,
            init_from_reference=(start_step is not None) or (last_n_steps is not None),
            num_inference_steps=num_inference_steps,
            start_step=start_step, last_n_steps=last_n_steps,
            scheduler_override=scheduler,
        )
        if vae_decode is not None:
            # full latent-diffusion chain: the denoiser's samples/targets are
            # latents — decode BOTH through the VAE so metrics are pixel-space
            # (the target side therefore measures against the VAE recon of the
            # ground truth, i.e. the chain's actual reachable reference)
            generated = vae_decode(generated)
            targets_np = np.clip(vae_decode(targets), 0.0, 1.0)
        else:
            targets_np = np.clip(np.asarray(targets), 0.0, 1.0)
        generated = np.clip(np.asarray(generated), 0.0, 1.0)

        if predicted_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, generated[batch_idx], predicted_root)
                if save_input:
                    save_output_tensor(dataset, row, dataset.target_key, samples[batch_idx]["target"], output_root / "input")
                if save_conditioning and dataset.conditioning_key is not None:
                    save_output_tensor(dataset, row, dataset.conditioning_key, samples[batch_idx]["image"], output_root / "conditioning")

        reduce_dims = tuple(range(1, generated.ndim))
        mse = np.mean((generated - targets_np) ** 2, axis=reduce_dims)
        psnr_values = 10.0 * np.log10(1.0 / np.clip(mse, 1e-12, None))
        total_mse += float(mse.sum())
        total_psnr += float(psnr_values.sum())
        ssim_values = [None] * generated.shape[0]
        for idx in range(generated.shape[0]):
            value = compute_ssim_sample(generated[idx], targets_np[idx])
            if value is not None:
                total_ssim += value
                ssim_count += 1
                ssim_values[idx] = value
        for batch_idx, sample_idx in enumerate(indices):
            sample = samples[batch_idx]
            per_image_rows.append({
                "sample_index": sample_idx,
                "img_id": sample.get("img_id"),
                "img_path": sample.get("img_path"),
                "mse": f"{mse[batch_idx]:.8f}",
                "psnr": f"{psnr_values[batch_idx]:.6f}",
                "ssim": "" if ssim_values[batch_idx] is None else f"{ssim_values[batch_idx]:.6f}",
            })
        count += generated.shape[0]
        if hasattr(batch_iter, "set_postfix"):
            running = {
                "mse": f"{(total_mse / max(count, 1)):.6f}",
                "psnr": f"{(total_psnr / max(count, 1)):.3f}",
                "sps": f"{(count / max(model_timing.get('model_seconds', 1e-12), 1e-12)):.3f}",
            }
            if ssim_count > 0:
                running["ssim"] = f"{(total_ssim / ssim_count):.4f}"
            batch_iter.set_postfix(running)

    if count == 0:
        raise RuntimeError("No samples available for evaluation.")

    avg_mse = total_mse / count
    avg_psnr = total_psnr / count
    model_seconds = float(model_timing.get("model_seconds", 0.0))
    model_sps = count / model_seconds if model_seconds > 0 else 0.0
    model_s_per_sample = model_seconds / count if count else 0.0
    logging.info("Eval MSE: %.6f | PSNR: %.3f", avg_mse, avg_psnr)
    print(f"Eval MSE: {avg_mse:.6f} | PSNR: {avg_psnr:.3f}")
    print(
        f"Model throughput: {model_sps:.3f} samples/s | "
        f"{model_s_per_sample:.6f} s/sample | model time {model_seconds:.3f}s"
    )
    avg_ssim = None
    if ssim_count > 0:
        avg_ssim = total_ssim / ssim_count
        logging.info("Eval SSIM: %.4f", avg_ssim)
        print(f"Eval SSIM: {avg_ssim:.4f}")

    row = {
        "samples": count,
        "mse": f"{avg_mse:.8f}",
        "psnr": f"{avg_psnr:.6f}",
        "ssim": "" if avg_ssim is None else f"{avg_ssim:.6f}",
        "ssim_enabled": True,
        "model_seconds": f"{model_seconds:.6f}",
        "model_samples_per_second": f"{model_sps:.6f}",
        "model_seconds_per_sample": f"{model_s_per_sample:.8f}",
        "model_calls": model_timing.get("model_calls", 0),
    }
    metrics_root = experiment_dir if experiment_dir is not None else ckpt_dir
    metrics_path = write_eval_metrics(metrics_root, row) if experiment_dir is not None else append_eval_metrics(metrics_root, row)
    logging.info("Wrote eval metrics: %s", metrics_path)
    per_image_metrics_path = append_per_image_eval_metrics(metrics_root, per_image_rows)
    logging.info("Wrote per-image eval metrics: %s", per_image_metrics_path)
    if experiment_dir is not None:
        run_cfg = {
            "mode": "evaluate", "model_type": model_type, "ckpt_dir": str(ckpt_dir),
            "data_txt": data_txt, "scheduler": scheduler,
            "num_inference_steps": num_inference_steps, "start_step": start_step,
            "last_n_steps": last_n_steps, "num_samples": num_samples,
            "batch_size": batch_size, "seed": seed, "save": save,
            "save_input": save_input, "save_conditioning": save_conditioning,
            "latent_vae": None if latent_vae is None else str(latent_vae),
        }
        with (experiment_dir / "run_config.json").open("w") as fh:
            json.dump(run_cfg, fh, indent=2)


def _tensor_stats(name: str, tensor) -> dict:
    if tensor is None:
        return {"name": name, "present": False}
    t = np.asarray(tensor, np.float32)
    return {
        "name": name, "present": True, "shape": list(t.shape),
        "min": float(t.min()), "max": float(t.max()), "mean": float(t.mean()),
        "std": float(t.std(ddof=1)) if t.size > 1 else 0.0,
    }


def _run_debug_compare(*, ckpt_dir, model_type: str, data_txt=None, output_dir=None,
                       device=None, seed: int = 42, num_samples=None,
                       num_inference_steps=None, start_step=None, last_n_steps=None,
                       scheduler=None, save_tensor_cache: bool = False) -> None:
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, model_type)
    training_cfg, model_cfg = cfg["training"], cfg["model"]
    set_seed(seed)

    dataset = build_sampling_dataset(cfg, data_txt, evaluate=True, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    if not selected_indices:
        raise RuntimeError("No samples available for debug_compare.")
    sample_idx = int(selected_indices[0])
    sample = dataset[sample_idx]
    row = dataset.data[sample_idx]

    target = jnp.asarray(np.asarray(sample["target"], np.float32))[None]
    cond = sample.get("image")
    cond_batch = jnp.asarray(np.asarray(cond, np.float32))[None] if cond is not None else None

    model, params = build_diffusion_model(cfg, ckpt_path=ckpt_path)
    timing = {"model_seconds": 0.0, "model_calls": 0}
    rng = jax.random.PRNGKey(seed)
    generated_raw = decode_diffusion_batch(
        model, params, training_cfg, model_cfg, tuple(target.shape), cond_batch,
        rng=rng, timing=timing, reference_batch=target,
        init_from_reference=(start_step is not None) or (last_n_steps is not None),
        num_inference_steps=num_inference_steps, start_step=start_step,
        last_n_steps=last_n_steps, scheduler_override=scheduler,
    )
    generated_raw = np.asarray(generated_raw)
    generated_clamped = np.clip(generated_raw, 0.0, 1.0)

    conditioning_mode = resolve_conditioning_mode(training_cfg.get("conditioning") or model_cfg.get("conditioning"))
    generated_raw_no_cond = generated_clamped_no_cond = None
    no_cond_error = None
    if conditioning_mode == "concatenate":
        # no-cond probe requires a model that accepts fewer input channels —
        # concatenate UNets were built with cond channels, so feed zeros.
        zeros_cond = jnp.zeros_like(cond_batch) if cond_batch is not None else None
        generated_raw_no_cond = np.asarray(decode_diffusion_batch(
            model, params, training_cfg, model_cfg, tuple(target.shape),
            conditioning_batch=zeros_cond, rng=rng,
            num_inference_steps=num_inference_steps, start_step=start_step,
            last_n_steps=last_n_steps, scheduler_override=scheduler,
        ))
        generated_clamped_no_cond = np.clip(generated_raw_no_cond, 0.0, 1.0)
    elif conditioning_mode == "attention":
        no_cond_error = "Skipped no-cond probe: attention model requires context."

    debug_root = Path(output_dir) if output_dir else (ckpt_dir / "debug_compare")
    debug_root.mkdir(parents=True, exist_ok=True)

    _write_tensor(np.asarray(target), debug_root / "target.pt")
    if cond_batch is not None:
        _write_tensor(np.asarray(cond_batch), debug_root / "conditioning.pt")
    _write_tensor(generated_raw, debug_root / "generated_raw.pt")
    _write_tensor(generated_clamped, debug_root / "generated_clamped.pt")
    if generated_raw_no_cond is not None:
        _write_tensor(generated_raw_no_cond, debug_root / "generated_raw_no_cond.pt")
        _write_tensor(generated_clamped_no_cond, debug_root / "generated_clamped_no_cond.pt")

    save_output_tensor(dataset, row, dataset.target_key, generated_clamped[0], debug_root / "generated")
    save_output_tensor(dataset, row, dataset.target_key, np.asarray(target[0]), debug_root / "target")
    if dataset.conditioning_key is not None and cond is not None:
        save_output_tensor(dataset, row, dataset.conditioning_key, np.asarray(cond), debug_root / "conditioning_export")
    if generated_clamped_no_cond is not None:
        save_output_tensor(dataset, row, dataset.target_key, generated_clamped_no_cond[0], debug_root / "generated_no_cond")

    stats = {
        "model_type": model_type, "sample_index": sample_idx,
        "img_id": sample.get("img_id"), "img_path": sample.get("img_path"),
        "conditioning_mode": conditioning_mode, "timing": timing,
        "num_inference_steps": num_inference_steps, "start_step": start_step,
        "last_n_steps": last_n_steps, "scheduler_override": scheduler,
        "target": _tensor_stats("target", target),
        "conditioning": _tensor_stats("conditioning", cond_batch),
        "generated_raw": _tensor_stats("generated_raw", generated_raw),
        "generated_clamped": _tensor_stats("generated_clamped", generated_clamped),
        "generated_raw_no_cond": _tensor_stats("generated_raw_no_cond", generated_raw_no_cond),
        "generated_clamped_no_cond": _tensor_stats("generated_clamped_no_cond", generated_clamped_no_cond),
        "no_cond_note": no_cond_error,
    }
    with (debug_root / "stats.json").open("w") as fh:
        json.dump(stats, fh, indent=2)
    logging.info("Debug compare completed. Artifacts written to: %s", debug_root)
    print(f"Debug compare completed. Artifacts written to: {debug_root}")
