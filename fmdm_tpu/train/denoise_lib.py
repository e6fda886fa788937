"""
Shared trainer for DDPM diffusion and flow matching.

Behavioral parity with /root/reference/src/pipelines/train/diffusion_lib.py:34-251
and flow_matching_lib.py (byte-identical skeleton, SURVEY.md §2.3): identical
config surface, run-dir artifacts (train_config.json, metrics.csv
'epoch,train_loss', {diff|flow}_last/_best.pt, epochs/epochXXXX/epoch.pt,
visuals/epochXXXX_{input,output,target}.png), resume semantics, rank-0 gating.

TPU-first differences (by design, SURVEY.md §7.1.6):
- the whole step (noise draw, add_noise, forward, backward, optimizer) is ONE
  jitted program; grad accumulation is a lax.scan over static micro-batches;
- true data parallelism: batches are sharded over the mesh 'data' axis and XLA
  all-reduces gradients (the reference never syncs grads — a latent bug we fix);
- bf16 mixed precision policy instead of AMP GradScaler.
"""

from __future__ import annotations

import logging
import math
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.parallel import mesh as mesh_lib
from fmdm_tpu.sample.diffusion_utils import (
    build_diffusion_model,
    decode_diffusion_batch,
    prepare_diffusion_visual_batch,
)
from fmdm_tpu.schedulers import build_scheduler, resolve_conditioning_mode
from fmdm_tpu.train.common import cfg_num_workers as _cfg_workers
from fmdm_tpu.train.common import epoch_batches, make_adamw, make_denoise_train_step
from fmdm_tpu.utils import config as config_utils
from fmdm_tpu.utils import checkpoint as ckpt_utils
from fmdm_tpu.utils.evaluation import make_grid, save_image

VARIANTS = {
    "diffusion": {"prefix": "diff", "model_type": "diffusion"},
    "flow_matching": {"prefix": "flow", "model_type": "flow_matching"},
}


def train(dataset, json_path, val_dataset=None, resume: Optional[str] = None,
          *, variant: str = "diffusion", max_steps_per_epoch: Optional[int] = None) -> Path:
    try:
        return _train_impl(dataset, json_path, val_dataset, resume,
                           variant=variant, max_steps_per_epoch=max_steps_per_epoch)
    finally:
        # training.sequence_parallel installs process-global attention
        # routing bound to the training mesh; never leak it past train()
        from fmdm_tpu.ops import attention as attention_ops

        attention_ops.clear_sequence_parallel()


def _train_impl(dataset, json_path, val_dataset=None, resume: Optional[str] = None,
                *, variant: str = "diffusion", max_steps_per_epoch: Optional[int] = None) -> Path:
    spec = VARIANTS[variant]
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s", force=True)
    cfg = config_utils.load_json_config(json_path)
    if "model" not in cfg:
        raise ValueError("Config does not declare a 'model' section.")
    model_block = cfg["model"]
    model_type = str(model_block.get("model_type", "")).lower()
    if model_type != spec["model_type"]:
        raise ValueError(f"Expected model_type '{spec['model_type']}', got '{model_type}'.")

    training_cfg = cfg["training"]
    scheduler_cfg = model_block.get("scheduler", {})

    config_utils.set_seed(training_cfg.get("seed"))
    seed = int(training_cfg.get("seed") or 0)

    batch_size = config_utils.resolve_batch_size(training_cfg, "train_batch_size", training_cfg.get("batch_size", 4))
    epochs = int(training_cfg.get("num_epochs", training_cfg.get("epochs", 1)))
    lr = float(training_cfg.get("learning_rate", 1e-4))
    weight_decay = float(training_cfg.get("weight_decay", 0.0))
    conditioning_mode = resolve_conditioning_mode(
        training_cfg.get("conditioning") or model_block.get("conditioning")
    )
    save_model_epochs = int(training_cfg.get("save_model_epochs", training_cfg.get("save_every", 5)))
    # How often to gather state off-device and write last/best checkpoints.
    # Default 1 = reference parity (every epoch, training_utils.py save flow);
    # raising it matters on remote-attached accelerators where the host
    # readback is slow (~7 MB/s through the axon tunnel -> minutes per save
    # of a 113M-param model+optimizer). The final epoch always saves.
    checkpoint_every = int(training_cfg.get("checkpoint_every_epochs", 1))
    if checkpoint_every > 1 and save_model_epochs % checkpoint_every != 0:
        # epoch snapshots only happen when state was gathered this epoch, so a
        # save_model_epochs finer than checkpoint_every_epochs silently yields
        # fewer snapshots than configured (ADVICE r3)
        logging.warning(
            "save_model_epochs=%d is finer than checkpoint_every_epochs=%d: "
            "epoch snapshots are only written on gather epochs (every %d), so "
            "off-cadence snapshots will be skipped.",
            save_model_epochs, checkpoint_every, checkpoint_every,
        )
    grad_accum = max(1, int(training_cfg.get("gradient_accumulation_steps", 1)))
    # Beyond-reference: exponential moving average of the model weights
    # (training.ema_decay in (0,1); 0/absent = off = reference behavior).
    # Sampling from the shadow weights is the standard diffusion quality
    # lever the torch reference lacks (it EMAs only VQ codebooks,
    # /root/reference/src/nn/modules/vae/codebook.py).
    ema_decay = float(training_cfg.get("ema_decay", 0.0) or 0.0)
    lr_warmup = int(training_cfg.get("lr_warmup_steps", 500))
    latent_norm = training_cfg.get("latent_norm")
    mixed = str(training_cfg.get("mixed_precision", "no")).lower()
    compute_dtype = jnp.bfloat16 if mixed in {"fp16", "bf16", "true"} else jnp.float32
    ckpt_utils.set_checkpoint_backend(str(training_cfg.get("checkpoint_backend", "torch")))

    base_output_dir = Path(training_cfg.get("output_dir", f"checkpoints/{variant}"))
    # rank 0 allocates the _runN dir; everyone else adopts it (the _runN
    # probe would race across hosts otherwise)
    if mesh_lib.is_main_process():
        output_dir = config_utils.allocate_run_dir(base_output_dir) if resume is None else base_output_dir
    else:
        output_dir = base_output_dir
    output_dir = Path(mesh_lib.broadcast_string(str(output_dir)))
    training_cfg["output_dir"] = str(output_dir)
    if mesh_lib.is_main_process():
        output_dir.mkdir(parents=True, exist_ok=True)
        cfg_path = output_dir / "train_config.json"
        if not cfg_path.exists():
            config_utils.save_json_config(cfg_path, cfg)

    tp = int(training_cfg.get("tensor_parallel", 1) or 1)
    sp = int(training_cfg.get("sequence_parallel", 1) or 1)
    if sp > 1 and (tp > 1 or bool(training_cfg.get("fsdp", False))):
        raise ValueError("sequence_parallel composes with plain DP only (set tensor_parallel=1, fsdp=false)")
    if sp > 1:
        # dp x sp mesh: batch shards over both axes for the convs; attention
        # reshards tokens over 'seq' and runs the ppermute ring
        # (parallel/sequence.py) — for volumetric token counts whose score
        # tiles / K-V streams outgrow one chip. Multi-host (since r4): the
        # ring axis stays intra-process (hops on ICI), the data axis spans
        # processes (create_dp_sp_mesh_global).
        from fmdm_tpu.ops import attention as attention_ops

        mesh = mesh_lib.create_dp_sp_mesh_global(batch_size, sp)
        attention_ops.set_sequence_parallel(
            mesh, "seq", min_tokens=int(training_cfg.get("sequence_parallel_min_tokens", 512)))
        _place_params = lambda p: mesh_lib.replicate(mesh, p)
        _place_opt = lambda s, p: mesh_lib.replicate(mesh, s)
    elif tp > 1 and bool(training_cfg.get("fsdp", False)):
        # 2-D pod layout (tp × fsdp, r4): TP slices output channels over the
        # intra-host 'model' axis; FSDP slices a DIFFERENT dim of every
        # tensor (and its moments) over the 'data' axis, so per-device state
        # drops ~(tp×dp)-fold while the batch rides 'data' as usual.
        from fmdm_tpu.parallel import fsdp as fsdp_lib
        from fmdm_tpu.parallel import tp as tp_lib

        mesh = tp_lib.create_dp_tp_mesh_global(batch_size, tp)
        _place_params = lambda p: fsdp_lib.shard_params_fsdp_tp(p, mesh)
        _place_opt = lambda s, p: fsdp_lib.shard_opt_state_fsdp_tp(s, p, mesh)
    elif tp > 1:
        # dp x tp mesh: GSPMD output-channel sharding (parallel/tp.py).
        # Single-host: the data axis is the largest batch divisor the
        # remaining devices allow. Multi-host (since r4): the model axis is
        # intra-process (weight collectives on ICI) and the data axis spans
        # processes — each feeds its own batch_size rows, true-DDP style.
        from fmdm_tpu.parallel import tp as tp_lib

        mesh = tp_lib.create_dp_tp_mesh_global(batch_size, tp)
        _place_params = lambda p: tp_lib.shard_params_tp(p, mesh)
        _place_opt = lambda s, p: tp_lib.shard_opt_state_tp(s, p, mesh)
    elif bool(training_cfg.get("fsdp", False)):
        # ZeRO-3-style fully-sharded DP (parallel/fsdp.py): parameters and
        # optimizer moments live sliced over the data axis; XLA inserts the
        # just-in-time weight all-gathers and gradient reduce-scatters.
        # Multi-host: the data axis spans processes (the flagship's realistic
        # pod configuration — state shards across ALL hosts' devices; each
        # process feeds its own batch rows; checkpoint gathers go through
        # mesh_lib.to_host's process_allgather path).
        from fmdm_tpu.parallel import fsdp as fsdp_lib

        mesh = mesh_lib.create_data_mesh(batch_size)
        _place_params = lambda p: fsdp_lib.shard_params_fsdp(p, mesh)
        _place_opt = lambda s, p: fsdp_lib.shard_opt_state_fsdp(s, p, mesh)
    else:
        # global data mesh: in multi-host runs every process feeds its own
        # batch_size rows and the jitted step sees the concatenated global
        # batch (process_count x batch_size) — true DDP semantics.
        mesh = mesh_lib.create_data_mesh(batch_size)
        _place_params = lambda p: mesh_lib.replicate(mesh, p)
        _place_opt = lambda s, p: mesh_lib.replicate(mesh, s)
    model, params = build_diffusion_model(cfg, ckpt_path=None, rng=jax.random.PRNGKey(seed))
    from fmdm_tpu.utils.summary import summarize_model

    summarize_model(params, model_block, training_cfg, name=variant)
    params = _place_params(params)

    scheduler, num_inference_steps = build_scheduler(scheduler_cfg, training_cfg)
    # optimizer steps per epoch = per-process batches (every process steps in
    # lockstep on the shared global batch)
    num_train_steps = epochs * math.ceil(
        math.ceil(len(dataset) / jax.process_count()) / batch_size)
    optimizer, _ = make_adamw(lr, weight_decay, lr_warmup, num_train_steps)
    opt_state = _place_opt(optimizer.init(params), params)
    # shadow weights start as a copy of the live params (same shardings)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None

    def _build_train_step(accum: int):
        return make_denoise_train_step(
            model, scheduler, optimizer,
            variant=variant, conditioning_mode=conditioning_mode, latent_norm=latent_norm,
            grad_accum=accum, compute_dtype=compute_dtype, mesh=mesh,
            remat=bool(training_cfg.get("remat", False)),
            ema_decay=ema_decay,
        )

    def _trial_compile(step, _accum):
        # abstract batch with the real mesh shardings: TPU compile performs
        # HBM budgeting, so an oversized micro-batch fails here, not mid-epoch
        probe_sample = dataset[0]
        batch_sh = mesh_lib.batch_sharding(mesh)

        def _aval(value):
            shape = np.asarray(value).shape
            return jax.ShapeDtypeStruct((global_bs, *shape), jnp.float32, sharding=batch_sh)

        global_bs = batch_size * (jax.process_count() if mesh_lib.spans_processes(mesh) else 1)
        cond_value = probe_sample.get("image") if conditioning_mode in {"concatenate", "attention"} else None
        probe = {
            "target": _aval(probe_sample["target"]),
            "image": _aval(cond_value) if cond_value is not None else None,
            "valid": jax.ShapeDtypeStruct((global_bs,), jnp.float32, sharding=batch_sh),
        }
        if ema_decay:
            step.lower(params, opt_state, ema_params, probe, jax.random.PRNGKey(0)).compile()
        else:
            step.lower(params, opt_state, probe, jax.random.PRNGKey(0)).compile()

    from fmdm_tpu.train.common import autotune_grad_accum

    grad_accum, train_step = autotune_grad_accum(
        _build_train_step, _trial_compile,
        batch_size=batch_size, grad_accum=grad_accum,
        allow_microbatching=bool(training_cfg.get("allow_microbatching", True)),
        what=f"{variant} train step",
    )

    visual_enabled = bool(training_cfg.get("save_images", False))
    visual_every = int(training_cfg.get("save_images_every", 10))
    visual_targets = visual_cond = None
    if visual_enabled and mesh_lib.is_main_process():
        eval_source = val_dataset if val_dataset is not None else dataset
        visual_count = int(training_cfg.get("visual_samples", 8))
        visual_targets, visual_cond = prepare_diffusion_visual_batch(
            eval_source, visual_count, seed=training_cfg.get("seed")
        )
        if conditioning_mode in {"concatenate", "attention"} and visual_cond is None:
            logging.warning(
                "%s config requested conditioning but dataset samples did not expose 'image'.",
                variant.capitalize(),
            )

    metrics_path = output_dir / "metrics.csv"
    if mesh_lib.is_main_process() and not metrics_path.exists():
        metrics_path.write_text("epoch,train_loss\n")

    resume_flag = Path(resume) if resume else None
    if resume_flag is None:
        resume_from_cfg = training_cfg.get("resume")
        if isinstance(resume_from_cfg, str) and resume_from_cfg.lower() != "none":
            resume_flag = Path(resume_from_cfg)
    start_epoch, best_metric = 1, float("inf")
    if resume_flag:
        payload = ckpt_utils.load_checkpoint(resume_flag)
        params = jax.tree_util.tree_map(jnp.asarray, payload["model"])
        params = _place_params(params)
        if payload.get("optimizer") is not None:
            opt_state = _place_opt(payload["optimizer"], params)
        if ema_decay:
            # checkpoints written without EMA (or pre-EMA runs) restart the
            # shadow from the resumed live weights
            ema_tree = payload.get("ema")
            ema_params = (_place_params(jax.tree_util.tree_map(jnp.asarray, ema_tree))
                          if ema_tree is not None
                          else jax.tree_util.tree_map(jnp.copy, params))
        start_epoch = int(payload.get("epoch", 0)) + 1
        best_metric = float(payload.get("best_metric", float("inf")))
        logging.info("Resumed from %s at epoch %d", resume_flag, start_epoch)

    rng = jax.random.PRNGKey(seed + 17)
    prefix = spec["prefix"]

    profile_dir = training_cfg.get("profile_dir")

    for epoch in range(start_epoch, epochs + 1):
        epoch_loss = 0.0
        num_samples = 0
        t0 = time.perf_counter()
        n_steps = 0
        from fmdm_tpu.train.common import prefetch

        if profile_dir and epoch == start_epoch:
            jax.profiler.start_trace(str(profile_dir))

        if str(training_cfg.get("data_loader", "threads")).lower() == "grain":
            from fmdm_tpu.data.grain_pipeline import grain_epoch_batches

            batch_iter = grain_epoch_batches(
                dataset, batch_size, shuffle=True, seed=seed, epoch=epoch,
                process_index=jax.process_index(), process_count=jax.process_count(),
                num_workers=int(training_cfg.get("num_workers", 0)),
            )
        else:
            batch_iter = prefetch(epoch_batches(
                dataset, batch_size, shuffle=True, seed=seed, epoch=epoch,
                process_index=jax.process_index(), process_count=jax.process_count(),
                num_workers=_cfg_workers(training_cfg),
            ))
        try:
            from tqdm import tqdm

            total_b = math.ceil(math.ceil(len(dataset) / jax.process_count()) / batch_size)
            # disable=None lets tqdm auto-disable on non-TTY stderr (keeps
            # redirected logs clean); non-main processes always disable.
            batch_iter = tqdm(batch_iter, total=total_b, desc=f"Train {epoch}/{epochs}",
                              leave=False, dynamic_ncols=True,
                              disable=(True if not mesh_lib.is_main_process() else None))
        except ImportError:
            pass

        # Deferred loss readback: blocking on float(loss_sum) every step
        # serializes dispatch with execution and costs ~25% wall time per
        # step on this setup (BENCHMARKS.md training profile). Keep one step
        # in flight and read step i-1's metrics while step i executes.
        pending = []

        def _drain_one():
            nonlocal epoch_loss, num_samples
            ls, ct = pending.pop(0)
            epoch_loss += float(ls)
            num_samples += int(ct)

        for batch in batch_iter:
            if not (conditioning_mode in {"concatenate", "attention"}):
                batch = dict(batch)
                batch["image"] = None
            # host numpy in: multi-host meshes assemble the global batch from
            # every process's rows (shard_batch)
            placed = {
                "target": mesh_lib.shard_batch(mesh, batch["target"]),
                "image": mesh_lib.shard_batch(mesh, batch["image"]) if batch.get("image") is not None else None,
                "valid": mesh_lib.shard_batch(mesh, batch["valid"]),
            }
            rng, step_rng = jax.random.split(rng)
            if ema_decay:
                params, opt_state, ema_params, loss_sum, count = train_step(
                    params, opt_state, ema_params, placed, step_rng)
            else:
                params, opt_state, loss_sum, count = train_step(params, opt_state, placed, step_rng)
            pending.append((loss_sum, count))
            if len(pending) > 1:
                _drain_one()
            n_steps += 1
            if hasattr(batch_iter, "set_postfix"):
                # lagged by the one in-flight step — the running average the
                # reference shows is itself cumulative, so this is invisible
                batch_iter.set_postfix(loss=f"{epoch_loss / max(num_samples, 1):.4f}")
            if max_steps_per_epoch is not None and n_steps >= max_steps_per_epoch:
                break
        while pending:
            _drain_one()

        if profile_dir and epoch == start_epoch:
            jax.profiler.stop_trace()

        avg_loss = epoch_loss / max(num_samples, 1)
        if mesh_lib.is_main_process():
            logging.info(
                "%s Epoch %03d | loss %.6f | %.1f samples/s",
                variant.capitalize(), epoch, avg_loss,
                num_samples / max(time.perf_counter() - t0, 1e-9),
            )

        current_metric = avg_loss
        # "best" is tracked at checkpoint granularity: lowering best_metric on
        # an unsaved off-cadence epoch would leave {prefix}_best.pt
        # permanently stale (a later epoch beating every SAVED state would
        # fail the improved test against an unsaved minimum).
        improved = False
        state = None
        if epoch % checkpoint_every == 0 or epoch == epochs:
            improved = current_metric < best_metric
            best_metric = min(best_metric, current_metric)
            # mesh_lib.to_host gathers globally sharded (multi-process FSDP)
            # leaves before the numpy conversion
            state = {
                "model": mesh_lib.to_host(params),
                "optimizer": mesh_lib.to_host(opt_state),
                "lr_scheduler": {"last_epoch": epoch},
                "scaler": None,
                "epoch": epoch,
                "best_metric": best_metric,
            }
            if ema_decay:
                state["ema"] = mesh_lib.to_host(ema_params)

        if mesh_lib.is_main_process() and state is not None:
            # one serialization; best/epoch copies are hardlink clones
            mirrors = []
            if improved:
                mirrors.append(output_dir / f"{prefix}_best.pt")
            if epoch % save_model_epochs == 0 or epoch == epochs:
                mirrors.append(output_dir / "epochs" / f"epoch{epoch:04d}" / "epoch.pt")
            ckpt_utils.save_checkpoint_with_mirrors(state, output_dir / f"{prefix}_last.pt", mirrors)
            if improved:
                logging.info("New best %s loss %.6f -> %s", variant, best_metric, output_dir / f"{prefix}_best.pt")

        visual_epoch = visual_enabled and (epoch % visual_every == 0 or epoch == epochs)
        # to_host on globally sharded (multi-host FSDP) params is a COLLECTIVE
        # (process_allgather): every rank must join, so the gather cannot live
        # inside the rank-0-gated branch below. The cadence is deterministic
        # across ranks; only the use of the result is rank-gated.
        host_params_for_visuals = None
        if visual_epoch and state is None and mesh_lib.spans_processes(mesh):
            host_params_for_visuals = mesh_lib.to_host(ema_params if ema_decay else params)
        # Split the host RNG on EVERY rank on visual epochs (the cadence is
        # deterministic across ranks) — splitting inside the rank-0-gated
        # branch would advance rank 0's stream only, feeding divergent
        # step_rng values into the global-mesh train_step on later epochs.
        vis_rng = None
        if visual_epoch:
            rng, vis_rng = jax.random.split(rng)
        save_samples = (
            visual_epoch
            and mesh_lib.is_main_process()
            and visual_targets is not None
        )
        if save_samples:
            # host copy of the params (state['model'], or the EMA shadow when
            # enabled — that is what sampling will use): the visual probe runs
            # rank-0-only, so it must not touch the global training mesh
            if state is not None:
                host_params = state["ema"] if ema_decay else state["model"]
            elif host_params_for_visuals is not None:
                host_params = host_params_for_visuals
            else:
                host_params = mesh_lib.to_host(ema_params if ema_decay else params)
            outputs = decode_diffusion_batch(
                model, host_params, training_cfg, cfg["model"],
                tuple(visual_targets.shape),
                visual_cond if conditioning_mode in {"concatenate", "attention"} else None,
                rng=vis_rng,
            )
            vis = np.clip(np.asarray(outputs), 0.0, 1.0)
            input_vis = np.asarray(visual_cond) if visual_cond is not None else np.asarray(visual_targets)
            rows = max(1, int(math.sqrt(vis.shape[0])))
            cols = max(1, vis.shape[0] // rows)
            save_image(make_grid(input_vis, rows, cols), output_dir / "visuals" / f"epoch{epoch:04d}_input.png")
            save_image(make_grid(vis, rows, cols), output_dir / "visuals" / f"epoch{epoch:04d}_output.png")
            save_image(make_grid(np.asarray(visual_targets), rows, cols), output_dir / "visuals" / f"epoch{epoch:04d}_target.png")

        if mesh_lib.is_main_process():
            with metrics_path.open("a") as handle:
                handle.write(f"{epoch},{avg_loss:.6f}\n")

    # drain async checkpoint writes so callers (eval, resume, tests) see
    # final files on disk the moment train() returns
    ckpt_utils.flush_checkpoint_writes()
    return output_dir


def debug_visual_only(dataset, json_path, ckpt_path, *, output_dir=None,
                      visual_samples: int = 10, seed: Optional[int] = None,
                      variant: str = "diffusion") -> Path:
    """Load a checkpoint and run train-like visual generation only
    (reference diffusion_lib.py:254-326)."""
    from fmdm_tpu.data.dataset_utils import save_output_tensor

    spec = VARIANTS[variant]
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s", force=True)
    cfg = config_utils.load_json_config(json_path)
    model_block = cfg.get("model")
    if model_block is None:
        raise ValueError("Config does not declare a 'model' section.")
    if str(model_block.get("model_type", "")).lower() != spec["model_type"]:
        raise ValueError(f"Expected model_type '{spec['model_type']}'.")

    training_cfg = cfg["training"]
    conditioning_mode = resolve_conditioning_mode(
        training_cfg.get("conditioning") or model_block.get("conditioning")
    )
    use_seed = seed if seed is not None else training_cfg.get("seed")
    config_utils.set_seed(use_seed)

    model, params = build_diffusion_model(cfg, ckpt_path=Path(ckpt_path))
    output_root = Path(output_dir) if output_dir is not None else (
        Path(training_cfg.get("output_dir", f"checkpoints/{variant}")) / "debug_train_like"
    )
    output_root.mkdir(parents=True, exist_ok=True)

    indices = select_visual_indices_list(dataset, int(visual_samples), use_seed)
    visual_targets, visual_cond = prepare_diffusion_visual_batch(dataset, int(visual_samples), seed=use_seed)
    if conditioning_mode in {"concatenate", "attention"} and visual_cond is None:
        logging.warning("Config requested conditioning but dataset samples did not expose 'image'.")

    outputs = decode_diffusion_batch(
        model, params, training_cfg, cfg["model"], tuple(visual_targets.shape),
        visual_cond if conditioning_mode in {"concatenate", "attention"} else None,
        rng=jax.random.PRNGKey(int(use_seed or 0)),
    )
    vis = np.clip(np.asarray(outputs), 0.0, 1.0)

    rows = max(1, int(math.sqrt(vis.shape[0])))
    cols = max(1, vis.shape[0] // rows)
    input_vis = np.asarray(visual_cond) if visual_cond is not None else np.asarray(visual_targets)
    save_image(make_grid(input_vis, rows, cols), output_root / "grid_input.png")
    save_image(make_grid(vis, rows, cols), output_root / "grid_output.png")
    save_image(make_grid(np.asarray(visual_targets), rows, cols), output_root / "grid_target.png")

    for b, idx in enumerate(indices):
        row = dataset.data[idx] if hasattr(dataset, "data") else None
        if row is None:
            break
        save_output_tensor(dataset, row, dataset.target_key, np.asarray(visual_targets[b]), output_root / "target")
        save_output_tensor(dataset, row, dataset.target_key, vis[b], output_root / "generated")
        if getattr(dataset, "conditioning_key", None) is not None and visual_cond is not None:
            save_output_tensor(dataset, row, dataset.conditioning_key, np.asarray(visual_cond[b]), output_root / "conditioning")

    logging.info("Debug visual-only generation completed for %d samples. Output: %s", len(indices), output_root)
    print(f"Debug visual-only generation completed for {len(indices)} samples.")
    print(f"Output directory: {output_root}")
    return output_root


def select_visual_indices_list(dataset, count, seed):
    from fmdm_tpu.utils.evaluation import select_visual_indices

    return select_visual_indices(dataset, count, seed=seed)
