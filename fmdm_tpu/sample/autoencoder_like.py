"""
Sampling/encoding/decoding/evaluation engine for autoencoders.

Behavioral parity with /root/reference/src/pipelines/samplers/autoencoder_like.py
(encode latents via posterior mode, decode latents->images, sample=reconstruct,
evaluate with MSE/PSNR/SSIM + synced throughput, debug_compare). The reference's
evaluate() crashes on an unassigned experiment_dir (autoencoder_like.py:300) —
we implement the obviously-intended behavior (SURVEY.md §7.4).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.data.dataset_utils import save_output_tensor, save_tensor_cache
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
from fmdm_tpu.sample.vae_utils import (
    build_vae_model,
    decode_vae_batch,
    encode_vae_batch,
    reconstruct_vae_batch,
)
from fmdm_tpu.parallel.mesh import (
    create_mesh_for_batch,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
)
from fmdm_tpu.utils.config import set_seed
from fmdm_tpu.utils.evaluation import compute_ssim_sample


def _stack_targets(samples):
    return np.stack([np.asarray(s["target"], np.float32) for s in samples], axis=0)


def _make_dp_fn(core, params, batch_size):
    """Data-parallel runner for the VAE engines: shards the batch dim across a
    device mesh (params replicated, ragged final batches edge-padded to the
    mesh size), so encode/decode/sample/evaluate scale across chips instead of
    running replicated. Returns ``run(x) -> (device_out, real_count)``; crop
    with ``np.asarray(out)[:real]``. Single-device meshes degenerate to a plain
    jitted call."""
    mesh = create_mesh_for_batch(batch_size)
    ndev = mesh.devices.size
    if ndev > 1:
        params = replicate(mesh, params)
    fn = jax.jit(core)

    def run(x):
        x = np.asarray(x, np.float32)
        if ndev > 1:
            padded, real = pad_batch_to_multiple(x, ndev)
            return fn(params, shard_batch(mesh, jnp.asarray(padded))), real
        return fn(params, jnp.asarray(x)), x.shape[0]

    return run


def encode(ckpt_dir, data_txt=None, save=False, output_dir=None, batch_size=4,
           device=None, seed=42, timestep=None, num_samples=None, save_tensor_cache=False, **_):
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, "vae")
    set_seed(seed)
    dataset = build_sampling_dataset(cfg, data_txt, evaluate=True, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    experiment_dir = create_experiment_dir(
        output_dir=output_dir, mode="evaluate", scheduler="vae", last_n_steps=None,
        start_step=None, num_inference_steps=None, num_samples=num_samples,
        seed=seed, batch_size=batch_size,
    )
    output_root = (experiment_dir / "samples") if (save and experiment_dir is not None) else resolve_output_root(ckpt_dir, output_dir, save)
    model, params = build_vae_model(cfg, ckpt_path=ckpt_path)
    enc = _make_dp_fn(lambda p, x: encode_vae_batch(model, p, x), params, batch_size)

    for indices, samples in progress_batches(dataset, batch_size, "Autoencoder encode", indices=selected_indices):
        out, real = enc(_stack_targets(samples))
        latents = np.asarray(out)[:real]
        if output_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, latents[batch_idx], output_root)
    logging.info("Autoencoder encode completed for %d samples.", len(selected_indices))


def decode(ckpt_dir, data_txt=None, save=False, output_dir=None, batch_size=4,
           device=None, seed=42, num_samples=None, save_input=False,
           save_conditioning=False, save_tensor_cache=False, **_):
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, "vae")
    set_seed(seed)
    dataset = build_sampling_dataset(cfg, data_txt, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    output_root = resolve_output_root(ckpt_dir, output_dir, save)
    model, params = build_vae_model(cfg, ckpt_path=ckpt_path)
    recon_type = cfg.get("training", {}).get("recon_type", "l1")
    dec = _make_dp_fn(lambda p, z: decode_vae_batch(model, p, z, recon_type=recon_type), params, batch_size)

    predicted_root = output_root / "predicted" if output_root is not None else None
    for indices, samples in progress_batches(dataset, batch_size, "Autoencoder decode", indices=selected_indices):
        out, real = dec(_stack_targets(samples))
        recon = np.asarray(out)[:real]
        if predicted_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, recon[batch_idx], predicted_root)
                if save_input:
                    save_output_tensor(dataset, row, dataset.target_key, samples[batch_idx]["target"], output_root / "input")
                if save_conditioning and dataset.conditioning_key is not None:
                    save_output_tensor(dataset, row, dataset.conditioning_key, samples[batch_idx]["image"], output_root / "conditioning")
    logging.info("Autoencoder decode completed for %d samples.", len(selected_indices))


def sample(ckpt_dir, data_txt=None, save=False, output_dir=None, batch_size=4,
           device=None, seed=42, num_samples=None, save_input=False,
           save_conditioning=False, save_tensor_cache=False, **_):
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, "vae")
    set_seed(seed)
    dataset = build_sampling_dataset(cfg, data_txt, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    output_root = resolve_output_root(ckpt_dir, output_dir, save)
    model, params = build_vae_model(cfg, ckpt_path=ckpt_path)
    recon_type = cfg.get("training", {}).get("recon_type", "l1")
    rec_fn = _make_dp_fn(lambda p, x: reconstruct_vae_batch(model, p, x, recon_type=recon_type), params, batch_size)

    predicted_root = output_root / "predicted" if output_root is not None else None
    for indices, samples in progress_batches(dataset, batch_size, "Autoencoder sample", indices=selected_indices):
        out, real = rec_fn(_stack_targets(samples))
        recon = np.asarray(out)[:real]
        if predicted_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, recon[batch_idx], predicted_root)
                if save_input:
                    save_output_tensor(dataset, row, dataset.target_key, samples[batch_idx]["target"], output_root / "input")
                if save_conditioning and dataset.conditioning_key is not None:
                    save_output_tensor(dataset, row, dataset.conditioning_key, samples[batch_idx]["image"], output_root / "conditioning")
    logging.info("Autoencoder sample completed for %d samples.", len(selected_indices))


def evaluate(ckpt_dir, data_txt=None, save=False, output_dir=None, batch_size=4,
             device=None, seed=42, num_samples=None, save_input=False,
             save_conditioning=False, save_tensor_cache=False, **_):
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, "vae")
    set_seed(seed)
    dataset = build_sampling_dataset(cfg, data_txt, evaluate=True, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    experiment_dir = create_experiment_dir(
        output_dir=output_dir, mode="evaluate", scheduler="vae", last_n_steps=None,
        start_step=None, num_inference_steps=None, num_samples=num_samples,
        seed=seed, batch_size=batch_size,
    )
    output_root = (experiment_dir / "samples") if (save and experiment_dir is not None) else resolve_output_root(ckpt_dir, output_dir, save)
    model, params = build_vae_model(cfg, ckpt_path=ckpt_path)
    recon_type = cfg.get("training", {}).get("recon_type", "l1")
    rec_fn = _make_dp_fn(lambda p, x: reconstruct_vae_batch(model, p, x, recon_type=recon_type), params, batch_size)

    total_mse = total_psnr = total_ssim = 0.0
    count = ssim_count = 0
    timing = {"model_seconds": 0.0, "model_calls": 0}
    per_image_rows = []
    predicted_root = output_root / "predicted" if output_root is not None else None

    batch_iter = progress_batches(dataset, batch_size, "Autoencoder evaluate", indices=selected_indices)
    for indices, samples in batch_iter:
        targets = _stack_targets(samples)
        start = time.perf_counter()
        out, real = rec_fn(targets)
        jax.block_until_ready(out)
        timing["model_seconds"] += time.perf_counter() - start
        timing["model_calls"] += 1
        recon = np.clip(np.asarray(out)[:real], 0.0, 1.0)
        targets_np = np.clip(np.asarray(targets), 0.0, 1.0)

        if predicted_root is not None:
            for batch_idx, sample_idx in enumerate(indices):
                row = dataset.data[sample_idx]
                save_output_tensor(dataset, row, dataset.target_key, recon[batch_idx], predicted_root)
                if save_input:
                    save_output_tensor(dataset, row, dataset.target_key, samples[batch_idx]["target"], output_root / "input")
                if save_conditioning and dataset.conditioning_key is not None:
                    save_output_tensor(dataset, row, dataset.conditioning_key, samples[batch_idx]["image"], output_root / "conditioning")

        reduce_dims = tuple(range(1, recon.ndim))
        mse = np.mean((recon - targets_np) ** 2, axis=reduce_dims)
        psnr_values = 10.0 * np.log10(1.0 / np.clip(mse, 1e-12, None))
        total_mse += float(mse.sum())
        total_psnr += float(psnr_values.sum())
        ssim_values = [None] * recon.shape[0]
        for idx in range(recon.shape[0]):
            value = compute_ssim_sample(recon[idx], targets_np[idx])
            if value is not None:
                total_ssim += value
                ssim_count += 1
                ssim_values[idx] = value
        for batch_idx, sample_idx in enumerate(indices):
            sample_d = samples[batch_idx]
            per_image_rows.append({
                "sample_index": sample_idx,
                "img_id": sample_d.get("img_id"),
                "img_path": sample_d.get("img_path"),
                "mse": f"{mse[batch_idx]:.8f}",
                "psnr": f"{psnr_values[batch_idx]:.6f}",
                "ssim": "" if ssim_values[batch_idx] is None else f"{ssim_values[batch_idx]:.6f}",
            })
        count += recon.shape[0]

    if count == 0:
        raise RuntimeError("No samples available for evaluation.")
    avg_mse = total_mse / count
    avg_psnr = total_psnr / count
    model_seconds = timing["model_seconds"]
    model_sps = count / model_seconds if model_seconds > 0 else 0.0
    print(f"Eval MSE: {avg_mse:.6f} | PSNR: {avg_psnr:.3f}")
    print(f"Model throughput: {model_sps:.3f} samples/s | {model_seconds / max(count,1):.6f} s/sample | model time {model_seconds:.3f}s")
    avg_ssim = total_ssim / ssim_count if ssim_count else None
    if avg_ssim is not None:
        print(f"Eval SSIM: {avg_ssim:.4f}")

    row = {
        "samples": count,
        "mse": f"{avg_mse:.8f}",
        "psnr": f"{avg_psnr:.6f}",
        "ssim": "" if avg_ssim is None else f"{avg_ssim:.6f}",
        "ssim_enabled": True,
        "model_seconds": f"{model_seconds:.6f}",
        "model_samples_per_second": f"{model_sps:.6f}",
        "model_seconds_per_sample": f"{(model_seconds / count) if count else 0.0:.8f}",
        "model_calls": timing["model_calls"],
    }
    metrics_root = experiment_dir if experiment_dir is not None else ckpt_dir
    if experiment_dir is not None:
        write_eval_metrics(metrics_root, row)
    else:
        append_eval_metrics(metrics_root, row)
    append_per_image_eval_metrics(metrics_root, per_image_rows)
    if experiment_dir is not None:
        run_cfg = {
            "mode": "evaluate", "model_type": "vae", "ckpt_dir": str(ckpt_dir),
            "data_txt": data_txt, "num_samples": num_samples,
            "batch_size": batch_size, "seed": seed, "save": save,
        }
        with (experiment_dir / "run_config.json").open("w") as fh:
            json.dump(run_cfg, fh, indent=2)


def debug_compare(ckpt_dir, data_txt=None, output_dir=None, device=None, seed=42,
                  num_samples=None, save_tensor_cache=False, **_):
    """Single-sample VAE reconstruction dump (autoencoder_like.py:322-393)."""
    ckpt_dir = Path(ckpt_dir)
    cfg = load_run_config(ckpt_dir)
    ckpt_path = resolve_checkpoint(ckpt_dir, "vae")
    set_seed(seed)
    dataset = build_sampling_dataset(cfg, data_txt, evaluate=True, save_tensor_cache_override=save_tensor_cache)
    selected_indices = resolve_sample_indices(dataset, num_samples, seed=seed)
    if not selected_indices:
        raise RuntimeError("No samples available for debug_compare.")
    sample_idx = int(selected_indices[0])
    sample_d = dataset[sample_idx]
    row = dataset.data[sample_idx]

    model, params = build_vae_model(cfg, ckpt_path=ckpt_path)
    recon_type = cfg.get("training", {}).get("recon_type", "l1")
    target = jnp.asarray(np.asarray(sample_d["target"], np.float32))[None]
    recon = np.asarray(reconstruct_vae_batch(model, params, target, recon_type=recon_type))
    recon_clamped = np.clip(recon, 0.0, 1.0)

    debug_root = Path(output_dir) if output_dir else (ckpt_dir / "debug_compare")
    debug_root.mkdir(parents=True, exist_ok=True)
    save_tensor_cache_fn = save_tensor_cache_alias
    save_tensor_cache_fn(np.asarray(target), debug_root / "target.pt")
    save_tensor_cache_fn(recon, debug_root / "generated_raw.pt")
    save_tensor_cache_fn(recon_clamped, debug_root / "generated_clamped.pt")
    save_output_tensor(dataset, row, dataset.target_key, recon_clamped[0], debug_root / "generated")
    save_output_tensor(dataset, row, dataset.target_key, np.asarray(target[0]), debug_root / "target")

    stats = {
        "model_type": "vae", "sample_index": sample_idx,
        "img_id": sample_d.get("img_id"), "img_path": sample_d.get("img_path"),
        "target_min": float(np.min(np.asarray(target))), "target_max": float(np.max(np.asarray(target))),
        "recon_min": float(recon.min()), "recon_max": float(recon.max()),
        "recon_mean": float(recon.mean()),
    }
    with (debug_root / "stats.json").open("w") as fh:
        json.dump(stats, fh, indent=2)
    print(f"Debug compare completed. Artifacts written to: {debug_root}")


# alias to avoid shadowing by the kwarg named save_tensor_cache
save_tensor_cache_alias = save_tensor_cache
