"""
Shared training machinery: LR schedules, batching, jitted train steps.

TPU-first replacements for the reference trainer plumbing:
- diffusers' get_cosine_schedule_with_warmup -> optax schedule with identical
  per-step values (diffusion_lib.py:74-80)
- DataLoader + DistributedSampler -> host-side shuffled batcher feeding
  jax.device_put with batch sharding over the mesh ``data`` axis; ragged final
  batches are padded to static shape with a validity mask (SURVEY.md §7.3
  item 3), so one compiled train step serves every batch.
- AMP GradScaler -> native bf16 compute policy (no loss scaling on TPU).
- grad accumulation -> lax.scan over static micro-batches
  (diffusion_lib.py:146-184 semantics: per-chunk fresh noise/timesteps).
"""

from __future__ import annotations

import logging
import math
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fmdm_tpu.parallel.mesh import shard_batch


def cosine_warmup_schedule(base_lr: float, num_warmup_steps: int, num_training_steps: int):
    """Per-step LR identical to diffusers.get_cosine_schedule_with_warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(1.0, num_training_steps - num_warmup_steps)
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return base_lr * jnp.where(step < num_warmup_steps, warm, cos)

    return schedule


def make_adamw(base_lr: float, weight_decay: float, num_warmup_steps: int, num_training_steps: int):
    schedule = cosine_warmup_schedule(base_lr, num_warmup_steps, num_training_steps)
    # torch.optim.AdamW defaults: betas=(0.9, 0.999), eps=1e-8, decay on all params
    return optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay), schedule


# ---------------------------------------------------------------------------
# Host-side batching
# ---------------------------------------------------------------------------

def _stack_key(samples: List[dict], key: str) -> Optional[np.ndarray]:
    values = [s.get(key) for s in samples]
    if any(v is None for v in values):
        return None
    return np.stack([np.asarray(v, dtype=np.float32) for v in values], axis=0)


def prefetch(iterator, depth: int = 2):
    """Background-thread prefetch over a host batch iterator — the TPU
    replacement for DataLoader worker processes (num_workers): sample loading
    and numpy stacking overlap device execution."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as exc:  # propagate into the consumer
            err.append(exc)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def _default_fetch_workers() -> int:
    import os

    return min(8, os.cpu_count() or 1)


def cfg_num_workers(training_cfg: Dict[str, Any]) -> Optional[int]:
    """training.num_workers → fetch-thread count; absent/None means auto."""
    value = training_cfg.get("num_workers")
    if value in (None, "None", ""):
        return None
    return int(value)


def epoch_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    epoch: int,
    pad_to_full: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: Optional[int] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield {'target', 'image', 'valid'} numpy batches of a STATIC batch size.

    Multi-host sharding: each process strides over the (identically shuffled)
    index list — the TPU analogue of DistributedSampler
    (diffusion_lib.py:82-90).

    ``num_workers`` threads fetch the batch's samples concurrently; threaded
    fetching requires ``dataset.__getitem__`` to be thread-safe (no shared
    mutable state, no global-RNG transforms). Our BaseDataset family is
    audited thread-safe and declares ``thread_safe_getitem = True``; with
    ``num_workers=None`` (auto) external dataset classes that don't make that
    declaration get the serial path, and an explicit ``training.num_workers``
    always wins. Cold-cache preprocessing (DICOM decode, HU windowing,
    resize) is numpy-bound and releases the GIL, so thread fan-out here plays
    the role of the reference's DataLoader worker *processes*. 0 = serial.
    Batch contents and ordering are identical at any worker count."""
    n = len(dataset)
    order = np.arange(n)
    if shuffle:
        rng = np.random.RandomState((seed or 0) * 100003 + epoch)
        rng.shuffle(order)
    if process_count > 1 and n % process_count != 0:
        # pad to a multiple of process_count (repeating leading indices, like
        # DistributedSampler) so every process yields the SAME number of
        # batches — unequal counts would leave some hosts blocked in a
        # collective while others exit the epoch loop.
        pad = process_count - n % process_count
        order = np.concatenate([order, order[:pad]])
    order = order[process_index::process_count]
    if num_workers is None:
        workers = (
            _default_fetch_workers()
            if getattr(dataset, "thread_safe_getitem", False)
            else 0
        )
    else:
        workers = int(num_workers)
    pool = None
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=workers, thread_name_prefix="fetch")
    try:
        yield from _batches_over(dataset, order, batch_size, pad_to_full, pool)
    finally:
        if pool is not None:
            pool.shutdown(wait=False, cancel_futures=True)


def _batches_over(dataset, order, batch_size, pad_to_full, pool) -> Iterator[Dict[str, np.ndarray]]:
    for start in range(0, len(order), batch_size):
        idx = order[start : start + batch_size]
        if pool is not None:
            samples = list(pool.map(lambda i: dataset[int(i)], idx))
        else:
            samples = [dataset[int(i)] for i in idx]
        target = _stack_key(samples, "target")
        image = _stack_key(samples, "image")
        valid = np.ones((len(idx),), dtype=np.float32)
        if pad_to_full and len(idx) < batch_size:
            pad = batch_size - len(idx)
            target = np.concatenate([target, np.repeat(target[-1:], pad, axis=0)], axis=0)
            if image is not None:
                image = np.concatenate([image, np.repeat(image[-1:], pad, axis=0)], axis=0)
            valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
        yield {"target": target, "image": image, "valid": valid}


# ---------------------------------------------------------------------------
# Jitted denoising train step (diffusion + flow matching)
# ---------------------------------------------------------------------------

def make_denoise_train_step(
    model,
    scheduler,
    optimizer,
    *,
    variant: str,                    # "diffusion" | "flow_matching"
    conditioning_mode: Optional[str],
    latent_norm: Optional[str],
    grad_accum: int = 1,
    compute_dtype=jnp.float32,
    mesh=None,
    remat: bool = False,
    ema_decay: float = 0.0,
) -> Callable:
    """Build the jitted train step.

    ema_decay > 0 (beyond-reference; the torch reference tracks EMA only for
    VQ codebooks, never model weights) switches the step signature to
    ``(params, opt_state, ema, batch, rng) -> (params, opt_state, ema,
    loss_sum, count)``: after the optimizer update the shadow weights follow
    ``ema += (1 - decay) * (params - ema)`` — elementwise, so it preserves
    whatever sharding (DP/TP/FSDP) the live params carry.

    Per accumulation chunk (reference diffusion_lib.py:153-179 /
    flow_matching_lib.py:150-177):
      diffusion:      t ~ U{0..N-1};  noisy = add_noise(x0, eps, t); target = eps
      flow matching:  t ~ U(0,1);     x_t = (1-t) x0 + t eps;       target = eps - x0;
                      model gets discrete (t*(N-1)) timesteps
    Loss: per-element MSE, masked by sample validity, sample-weighted like the
    reference's epoch accounting.
    """
    from fmdm_tpu.sample.engine import normalize_latent_conditioning, prepare_attention_context

    num_train_timesteps = scheduler.num_train_timesteps
    model_apply = (lambda p, x, t, context_ca=None: model(p, x, t, context_ca=context_ca))
    if remat:
        # trade FLOPs for HBM: rematerialize the UNet forward in the backward
        # pass (training.remat: true) — enables larger per-chip batches.
        model_apply = jax.checkpoint(model_apply)

    def chunk_loss(params, x0, cond, valid, rng):
        rng_noise, rng_t = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, x0.shape, jnp.float32)
        if variant == "diffusion":
            t = jax.random.randint(rng_t, (x0.shape[0],), 0, num_train_timesteps)
            noisy = scheduler.add_noise(x0, noise, t)
            target = noise
            model_t = t
        else:
            tc = jax.random.uniform(rng_t, (x0.shape[0],), jnp.float32)
            tb = tc.reshape((-1,) + (1,) * (x0.ndim - 1))
            noisy = (1.0 - tb) * x0 + tb * noise
            target = noise - x0
            model_t = (tc * (num_train_timesteps - 1)).astype(jnp.int32)

        model_input = noisy.astype(compute_dtype)
        ctx = None
        if conditioning_mode == "concatenate" and cond is not None:
            model_input = jnp.concatenate([model_input, cond.astype(compute_dtype)], axis=1)
        elif conditioning_mode == "attention" and cond is not None:
            ctx = prepare_attention_context(normalize_latent_conditioning(cond, latent_norm))
            ctx = ctx.astype(compute_dtype)

        pred = model_apply(params, model_input, model_t, context_ca=ctx).astype(jnp.float32)
        per_sample = jnp.mean(
            jnp.square(pred - target), axis=tuple(range(1, x0.ndim))
        )
        loss_sum = jnp.sum(per_sample * valid)
        count = jnp.sum(valid)
        # normalized loss for grads (masked mean, matching F.mse_loss over the chunk)
        loss = loss_sum / jnp.maximum(count, 1.0)
        return loss, (loss_sum, count)

    grad_fn = jax.value_and_grad(chunk_loss, has_aux=True)

    def train_step(params, opt_state, batch, rng):
        x0 = batch["target"]
        cond = batch.get("image")
        valid = batch["valid"]
        bs = x0.shape[0]
        chunk = max(1, math.ceil(bs / grad_accum))
        n_chunks = math.ceil(bs / chunk)
        usable = n_chunks * chunk

        def reshape_chunks(a):
            if a is None:
                return None
            pad = usable - a.shape[0]
            if pad:
                a = jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
            return a.reshape((n_chunks, chunk) + a.shape[1:])

        if n_chunks == 1:
            # no accumulation: skip the lax.scan wrapper entirely (the while
            # loop would hide fusion opportunities and add loop overhead)
            (loss, (loss_sum, count)), grads = grad_fn(params, x0, cond, valid, rng)
            grads = jax.tree_util.tree_map(
                lambda g: g.astype(jnp.float32), grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss_sum, count

        x0c = reshape_chunks(x0)
        condc = reshape_chunks(cond)
        validc = reshape_chunks(valid)
        rngs = jax.random.split(rng, n_chunks)

        def body(acc, inp):
            grads_acc, loss_sum_acc, count_acc = acc
            if condc is None:
                xc, vc, r = inp
                cc = None
            else:
                xc, cc, vc, r = inp
            (loss, (loss_sum, count)), grads = grad_fn(params, xc, cc, vc, r)
            grads = jax.tree_util.tree_map(
                lambda a, g: a + g * count, grads_acc, grads
            )
            return (grads, loss_sum_acc + loss_sum, count_acc + count), None

        zero_grads = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        xs = (x0c, validc, rngs) if condc is None else (x0c, condc, validc, rngs)
        (grads, loss_sum, count), _ = jax.lax.scan(
            body, (zero_grads, jnp.float32(0.0), jnp.float32(0.0)), xs
        )
        grads = jax.tree_util.tree_map(lambda g: g / jnp.maximum(count, 1.0), grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss_sum, count

    if ema_decay:
        decay = float(ema_decay)
        if not 0.0 < decay < 1.0:
            raise ValueError(f"ema_decay must be in (0, 1), got {decay}")

        def train_step_ema(params, opt_state, ema, batch, rng):
            params, opt_state, loss_sum, count = train_step(params, opt_state, batch, rng)
            ema = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - decay) * (p.astype(e.dtype) - e), ema, params)
            return params, opt_state, ema, loss_sum, count

        return jax.jit(train_step_ema, donate_argnums=(0, 1, 2))

    return jax.jit(train_step, donate_argnums=(0, 1))


def device_put_batch(mesh, batch: Dict[str, Any]):
    arrays = {k: v for k, v in batch.items() if v is not None}
    placed = shard_batch(mesh, arrays)
    placed["image"] = placed.get("image")
    return placed


# ---------------------------------------------------------------------------
# Startup micro-batch auto-tuning (SURVEY §7.1.6)
# ---------------------------------------------------------------------------

def is_memory_error(err: BaseException) -> bool:
    """Does this exception look like device-memory exhaustion? TPU programs
    have static HBM footprints, so exhaustion surfaces at compile/lowering
    time as RESOURCE_EXHAUSTED — the static analogue of the reference's
    runtime CUDA OOM (vae_lib.py:347-358)."""
    text = f"{type(err).__name__}: {err}".lower()
    return any(tag in text for tag in (
        "resource_exhausted", "out of memory", "exceeds the hbm", "hbm capacity",
        "memory space hbm", "allocating", "oom",
    )) and not isinstance(err, (TypeError, ValueError))


def autotune_grad_accum(
    build_step: Callable[[int], Callable],
    trial_compile: Callable[[Callable, int], None],
    *,
    batch_size: int,
    grad_accum: int,
    allow_microbatching: bool = True,
    what: str = "train step",
) -> Tuple[int, Callable]:
    """Pick the largest micro-batch that fits at startup by trial compile.

    Replaces the reference's mid-epoch OOM-halving (vae_lib.py:347-358) with a
    jit-compatible startup probe: build the jitted step for the configured
    accumulation, trial-compile it (TPU compile performs HBM budgeting), and
    on memory exhaustion halve the micro-batch (doubling accumulation) until
    it fits or the micro-batch is 1. Returns (grad_accum, step).
    """
    accum = max(1, int(grad_accum))
    while True:
        step = build_step(accum)
        try:
            trial_compile(step, accum)
            if accum != max(1, int(grad_accum)):
                logging.warning(
                    "Auto-tuned %s to gradient_accumulation_steps=%d "
                    "(micro-batch %d) to fit device memory.",
                    what, accum, -(-batch_size // accum),
                )
            return accum, step
        except Exception as err:  # noqa: BLE001 - classified below
            chunk = -(-batch_size // accum)
            if not (allow_microbatching and is_memory_error(err)) or chunk <= 1:
                raise
            new_chunk = max(1, chunk // 2)
            accum = min(batch_size, -(-batch_size // new_chunk))
            logging.warning(
                "%s does not fit with micro-batch %d (%s); retrying with "
                "micro-batch %d (accum=%d).",
                what, chunk, type(err).__name__, new_chunk, accum,
            )
