"""
VAE trainer (KL + VQ recipes, perceptual + GAN losses).

Behavioral parity with /root/reference/src/pipelines/train/vae_lib.py:61-607:
identical config surface (recon_type l1/mse/bce/bce_focal, perceptual_weight,
gan_weight + gan_start/gan_start_steps gating, annealed kl_weight,
codebook_weight, StepLR/Cosine/Exponential schedulers), artifact layout
(metrics.csv with conditional columns, vae_last/vae_best,
epochs/epochXXXX/{epoch.pt,input.png,recon.png,gen.png}), validation loop
mirroring train losses, resume.

TPU-first differences (SURVEY.md §7.3 items 4-5):
- generator and discriminator updates are one jitted program with two optax
  states; the discriminator's activation gate switches between two compiled
  variants host-side (static shapes, no in-graph branching on config).
- The reference's dynamic OOM-halving micro-batching cannot exist under jit;
  `gradient_accumulation_steps` selects a static micro-batch count
  (`allow_microbatching` is accepted as a no-op key).
- EMA codebook buffers are functional state threaded through the step and
  excluded from AdamW (torch keeps them as buffers).
- Standard GAN gradient separation: generator loss updates only generator
  params (the reference leaks g_gan grads into the discriminator because it
  steps disc_optimizer on them — capability-parity, not bug-parity).
"""

from __future__ import annotations

import logging
import math
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from fmdm_tpu.nn.losses import (
    PerceptualLoss,
    bce_focal_loss,
    discriminator_hinge_loss,
    generator_hinge_loss,
)
from fmdm_tpu.parallel import mesh as mesh_lib
from fmdm_tpu.sample.vae_utils import build_vae_model
from fmdm_tpu.utils import config as config_utils
from fmdm_tpu.utils import checkpoint as ckpt_utils
from fmdm_tpu.utils.evaluation import latent_shape, make_grid, prepare_eval_batch, save_image
from fmdm_tpu.train import common
from fmdm_tpu.train.common import cfg_num_workers as _cfg_workers
from fmdm_tpu.train.common import epoch_batches

EMA_KEYS = ("embedding", "ema_cluster_size", "ema_w")


def _make_lr_schedule(base_lr: float, cfg: Dict[str, Any], epochs: int, steps_per_epoch: int):
    """StepLR/CosineAnnealingLR/ExponentialLR, stepped per-epoch like the
    reference (vae_lib.py:29-43, 485-486). Returns lr(step)."""
    sched_cfg = cfg.get("scheduler")
    if not sched_cfg:
        return lambda step: base_lr
    name = (sched_cfg.get("name") or "").lower()
    params = sched_cfg.get("params", {})
    spe = max(1, steps_per_epoch)
    if name == "steplr":
        step_size = int(params.get("step_size", 1))
        gamma = float(params.get("gamma", 0.1))
        return lambda step: base_lr * gamma ** (jnp.asarray(step, jnp.int32) // (step_size * spe))
    if name == "cosineannealinglr":
        t_max = int(params.get("T_max", epochs))
        eta_min = float(params.get("eta_min", 0.0))
        def cos_sched(step):
            e = jnp.asarray(step, jnp.float32) / spe
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * jnp.minimum(e, t_max) / t_max))
        return cos_sched
    if name == "exponentiallr":
        gamma = float(params.get("gamma", 0.9))
        return lambda step: base_lr * gamma ** (jnp.asarray(step, jnp.int32) // spe)
    if name == "":
        return lambda step: base_lr
    raise ValueError(f"Unsupported scheduler '{name}'.")


def _disc_is_active(has_disc: bool, gan_weight: float, gan_start: int,
                    gan_start_steps: Optional[int], epoch: int, global_step: int) -> bool:
    if not has_disc or gan_weight <= 0:
        return False
    if gan_start_steps is not None:
        return global_step >= gan_start_steps
    return epoch >= gan_start


def _split_ema(params: dict, is_ema: bool):
    if not is_ema:
        return params, None
    trainable = dict(params)
    cb = dict(trainable["codebook"])
    ema_state = {k: cb.pop(k) for k in EMA_KEYS}
    trainable["codebook"] = cb
    return trainable, ema_state


def _merge_ema(trainable: dict, ema_state: Optional[dict]):
    if ema_state is None:
        return trainable
    merged = dict(trainable)
    cb = dict(merged.get("codebook", {}))
    cb.update(ema_state)
    merged["codebook"] = cb
    return merged


def train(dataset, json_path, val_dataset=None, resume: Optional[str] = None,
          *, max_steps_per_epoch: Optional[int] = None) -> Path:
    try:
        return _train_impl(dataset, json_path, val_dataset, resume,
                           max_steps_per_epoch=max_steps_per_epoch)
    finally:
        # training.sequence_parallel installs process-global attention
        # routing bound to the training mesh; never leak it past train()
        from fmdm_tpu.ops import attention as attention_ops

        attention_ops.clear_sequence_parallel()


def _train_impl(dataset, json_path, val_dataset=None, resume: Optional[str] = None,
                *, max_steps_per_epoch: Optional[int] = None) -> Path:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s", force=True)
    cfg = config_utils.load_json_config(json_path)
    training_cfg = cfg["training"]
    config_utils.set_seed(training_cfg.get("seed"))
    seed = int(training_cfg.get("seed") or 0)
    ckpt_utils.set_checkpoint_backend(str(training_cfg.get("checkpoint_backend", "torch")))

    batch_size = int(training_cfg.get("batch_size", 4))
    epochs = int(training_cfg.get("epochs", 1))
    lr = float(training_cfg.get("learning_rate", 1e-4))
    weight_decay = float(training_cfg.get("weight_decay", 0.0))
    reg_type = str(training_cfg.get("reg_type", "kl")).lower()
    recon_type = training_cfg.get("recon_type", "l1")
    perceptual_weight = float(training_cfg.get("perceptual_weight", 0.0))
    gan_weight = float(training_cfg.get("gan_weight", 0.0))
    gan_start = int(training_cfg.get("gan_start", 0))
    gan_start_steps = training_cfg.get("gan_start_steps")
    if gan_start_steps is not None:
        gan_start_steps = int(gan_start_steps)
    kl_weight = float(training_cfg.get("kl_weight", 0.0))
    kl_anneal_steps = int(training_cfg.get("kl_anneal_steps", 0))
    codebook_weight = float(training_cfg.get("codebook_weight", 1.0))
    save_every = int(training_cfg.get("save_every", 1))
    # gather/save cadence for last/best checkpoints (default 1 = reference
    # parity); see denoise_lib — host readback off a remote-attached chip is
    # the cost, not the disk write. The final epoch always saves.
    checkpoint_every = int(training_cfg.get("checkpoint_every_epochs", 1))
    if checkpoint_every > 1 and save_every % checkpoint_every != 0:
        # see denoise_lib: snapshots only happen on gather epochs (ADVICE r3)
        logging.warning(
            "save_every=%d is finer than checkpoint_every_epochs=%d: epoch "
            "snapshots are only written on gather epochs (every %d), so "
            "off-cadence snapshots will be skipped.",
            save_every, checkpoint_every, checkpoint_every,
        )
    grad_accum = max(1, int(training_cfg.get("gradient_accumulation_steps", 1)))

    base_output_dir = Path(training_cfg.get("output_dir", "checkpoints/vae"))
    # rank 0 allocates the _runN dir; everyone else adopts it (the _runN
    # probe would race across hosts otherwise — same as denoise_lib)
    if mesh_lib.is_main_process():
        output_dir = config_utils.allocate_run_dir(base_output_dir) if resume is None else base_output_dir
    else:
        output_dir = base_output_dir
    output_dir = Path(mesh_lib.broadcast_string(str(output_dir)))
    training_cfg["output_dir"] = str(output_dir)
    if mesh_lib.is_main_process():
        output_dir.mkdir(parents=True, exist_ok=True)
        train_cfg_path = output_dir / "train_config.json"
        if not train_cfg_path.exists():
            config_utils.save_json_config(train_cfg_path, cfg)

    best_metric = float("inf")
    metrics_path = output_dir / "metrics.csv"
    metrics_keys = ["loss", "recon"]
    if reg_type == "kl" or kl_weight > 0:
        metrics_keys.append("kl")
    if reg_type == "vq" or codebook_weight > 0:
        metrics_keys.append("vq")
    if perceptual_weight > 0:
        metrics_keys.append("perceptual")
    if gan_weight > 0:
        metrics_keys.extend(["g_gan", "d_gan"])
    if mesh_lib.is_main_process() and not metrics_path.exists():
        metrics_path.write_text("epoch," + ",".join(metrics_keys) + "\n")

    # Multi-host (r4; beyond reference — vae_lib.py has no DistributedSampler,
    # SURVEY.md §2.3): global data mesh, every process feeds its own
    # batch_size rows per step (true-DDP semantics, same as denoise_lib).
    mesh = mesh_lib.create_data_mesh(batch_size)
    model, params = build_vae_model(cfg, ckpt_path=None, rng=jax.random.PRNGKey(seed))
    model_cfg = cfg.get("model", {})
    latent_type = str(model_cfg.get("latent_type", "kl")).lower()
    codebook_active = latent_type == "vq" or reg_type == "vq"
    effective_codebook_weight = codebook_weight if codebook_active else 0.0
    is_vq = hasattr(model, "codebook")
    is_ema = is_vq and getattr(model, "quantizer_type", "") == "ema"
    from fmdm_tpu.utils.summary import summarize_model

    summarize_model(params, model_cfg, training_cfg, name="vae")

    # per-process optimizer steps (every process steps in lockstep on the
    # shared global batch)
    steps_per_epoch = math.ceil(
        math.ceil(len(dataset) / jax.process_count()) / batch_size)
    lr_schedule = _make_lr_schedule(lr, training_cfg, epochs, steps_per_epoch)
    optimizer = optax.adamw(lr_schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay)

    gen_params, ema_state = _split_ema(params, is_ema)
    opt_state = optimizer.init(gen_params)

    perceptual = PerceptualLoss(resize=True) if perceptual_weight > 0 else None
    perceptual_params = perceptual.load_params() if perceptual is not None else None
    if perceptual is not None and not perceptual.enabled:
        logging.warning("PerceptualLoss disabled: no VGG16 weights available (FMDM_VGG16_WEIGHTS unset); contributes 0.")

    discriminator = model.make_discriminator() if gan_weight > 0 else None
    disc_params = discriminator.init(jax.random.PRNGKey(seed + 1)) if discriminator else None
    disc_lr_cfg = training_cfg.get("disc_lr")
    disc_lr = float(disc_lr_cfg) if disc_lr_cfg is not None else lr
    disc_optimizer = optax.adamw(disc_lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0) if discriminator else None
    disc_opt_state = disc_optimizer.init(disc_params) if discriminator else None

    tp = int(training_cfg.get("tensor_parallel", 1) or 1)
    sp = int(training_cfg.get("sequence_parallel", 1) or 1)
    if sp > 1 and tp > 1:
        raise ValueError("sequence_parallel composes with plain DP only (set tensor_parallel=1)")
    if sp > 1:
        # dp x sp: batch rides both axes for the conv trunk; the VAE
        # mid-block attention (1024 tokens at 256², more for volumes)
        # reshards tokens onto 'seq' and runs the ppermute ring. Multi-host:
        # the ring axis stays intra-process (create_dp_sp_mesh_global).
        from fmdm_tpu.ops import attention as attention_ops

        mesh = mesh_lib.create_dp_sp_mesh_global(batch_size, sp)
        attention_ops.set_sequence_parallel(
            mesh, "seq", min_tokens=int(training_cfg.get("sequence_parallel_min_tokens", 512)))
        _place_gen = lambda p: mesh_lib.replicate(mesh, p)
        _place_gen_opt = lambda s, p: mesh_lib.replicate(mesh, s)
        _place_disc = _place_gen
        _place_disc_opt = _place_gen_opt
    elif tp > 1:
        # dp x tp (GSPMD output-channel sharding, parallel/tp.py) for both
        # the generator and the discriminator; EMA codebook state replicates.
        # Multi-host: model axis intra-process (create_dp_tp_mesh_global).
        from fmdm_tpu.parallel import tp as tp_lib

        mesh = tp_lib.create_dp_tp_mesh_global(batch_size, tp)
        _place_gen = lambda p: tp_lib.shard_params_tp(p, mesh)
        _place_gen_opt = lambda s, p: tp_lib.shard_opt_state_tp(s, p, mesh)
        _place_disc = _place_gen
        _place_disc_opt = _place_gen_opt
    elif bool(training_cfg.get("fsdp", False)):
        # ZeRO-3-style FSDP (parallel/fsdp.py) for generator AND
        # discriminator state — AdamW moments are 3x params, so the VAE+GAN
        # pair benefits the most; EMA codebook state replicates.
        from fmdm_tpu.parallel import fsdp as fsdp_lib

        _place_gen = lambda p: fsdp_lib.shard_params_fsdp(p, mesh)
        _place_gen_opt = lambda s, p: fsdp_lib.shard_opt_state_fsdp(s, p, mesh)
        _place_disc = _place_gen
        _place_disc_opt = _place_gen_opt
    else:
        _place_gen = lambda p: mesh_lib.replicate(mesh, p)
        _place_gen_opt = lambda s, p: mesh_lib.replicate(mesh, s)
        _place_disc = _place_gen
        _place_disc_opt = _place_gen_opt
    gen_params = _place_gen(gen_params)
    opt_state = _place_gen_opt(opt_state, gen_params)
    ema_state = mesh_lib.replicate(mesh, ema_state) if ema_state is not None else None
    if disc_params is not None:
        disc_params = _place_disc(disc_params)
        disc_opt_state = _place_disc_opt(disc_opt_state, disc_params)

    logging.info(
        "Data: train_samples=%d%s | batch_size=%d | grad_accum=%d | epochs=%d",
        len(dataset), f", val_samples={len(val_dataset)}" if val_dataset is not None else "",
        batch_size, grad_accum, epochs,
    )

    sample_count = int(training_cfg.get("visual_samples", 20))
    visual_enabled = bool(training_cfg.get("save_images", True))
    visual_every = int(training_cfg.get("save_images_every", 1))
    sample_dataset = val_dataset if val_dataset is not None else dataset
    sample_batch = prepare_eval_batch(sample_dataset, sample_count, seed=training_cfg.get("seed"))
    latent_shape_ = latent_shape(model_cfg)

    # ------------------------------------------------------------------ losses
    def recon_loss_fn(rec, rec_img, raw, valid):
        mask = valid.reshape((-1,) + (1,) * (raw.ndim - 1))
        denom = jnp.maximum(jnp.sum(valid), 1.0) * math.prod(raw.shape[1:])
        if recon_type == "l1":
            return jnp.sum(jnp.abs(rec_img - raw) * mask) / denom
        if recon_type == "mse":
            return jnp.sum(jnp.square(rec_img - raw) * mask) / denom
        if recon_type == "bce":
            bce = jnp.maximum(rec, 0) - rec * raw + jnp.log1p(jnp.exp(-jnp.abs(rec)))
            return jnp.sum(bce * mask) / denom
        if recon_type in ("focal", "bce_focal"):
            per = bce_focal_loss(rec, raw, alpha=0.25, gamma=2.0, reduction="none")
            return jnp.sum(per * mask) / denom
        raise ValueError(f"Unsupported recon_type '{recon_type}'.")

    def forward_losses(gen_p, ema_s, disc_p, raw, valid, rng, kl_scale, disc_active, train_mode):
        merged = _merge_ema(gen_p, ema_s)
        inputs = model.image_to_model_range(raw)
        new_ema = None
        if is_vq:
            rec, aux = model(merged, inputs, train=train_mode)
            vq_loss = aux["vq_loss"]
            kl_term = jnp.zeros((), jnp.float32)
            new_ema = aux.get("ema_update")
        else:
            rec, posterior = model(merged, inputs, sample_posterior=train_mode, rng=rng)
            vq_loss = jnp.zeros((), jnp.float32)
            kl_term = jnp.mean(posterior.kl())
        rec_img = model.raw_output_to_image(rec, recon_type=recon_type)
        recon = recon_loss_fn(rec, rec_img, raw, valid)
        if perceptual is not None and perceptual.enabled:
            perc = perceptual(perceptual_params, rec_img, raw)
        else:
            perc = jnp.zeros((), jnp.float32)
        if disc_active:
            fake_pred = discriminator(disc_p, rec_img, train=train_mode)
            g_gan = generator_hinge_loss(fake_pred)
        else:
            g_gan = jnp.zeros((), jnp.float32)
        total = (
            recon + perceptual_weight * perc + kl_scale * kl_term
            + effective_codebook_weight * vq_loss + gan_weight * g_gan
        )
        metrics = {"loss": total, "recon": recon, "perceptual": perc, "kl": kl_term,
                   "vq": vq_loss, "g_gan": g_gan}
        return total, (metrics, rec_img, new_ema)

    gen_grad = jax.value_and_grad(forward_losses, argnums=0, has_aux=True)

    def disc_loss_fn(disc_p, rec_img, raw):
        real_pred = discriminator(disc_p, raw, train=True)
        fake_pred = discriminator(disc_p, jax.lax.stop_gradient(rec_img), train=True)
        return discriminator_hinge_loss(real_pred, fake_pred)

    disc_grad = jax.value_and_grad(disc_loss_fn) if discriminator else None

    def _train_step_impl(gen_p, ema_s, opt_s, disc_p, disc_s, raw, valid, rng, kl_scale,
                         *, disc_active, n_chunks):
        # ceil-divide and pad so no sample is dropped when batch % accum != 0
        # (mirrors the denoise trainer's valid=0 padding); pad rows wrap-repeat
        # real samples so the unmasked aux terms never see synthetic zeros,
        # while valid=0 excludes them from the recon loss and all counts.
        chunk = max(1, -(-raw.shape[0] // n_chunks))
        pad = n_chunks * chunk - raw.shape[0]
        if pad:
            wrap = jnp.arange(pad) % raw.shape[0]
            raw = jnp.concatenate([raw, jnp.take(raw, wrap, axis=0)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), valid.dtype)])

        def reshape_chunks(a):
            return a.reshape((n_chunks, chunk) + a.shape[1:])

        rawc, validc = reshape_chunks(raw), reshape_chunks(valid)
        rngs = jax.random.split(rng, n_chunks)

        zero_g = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), gen_p)
        zero_d = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), disc_p) if disc_p is not None else None
        zero_m = {k: jnp.zeros((), jnp.float32) for k in ("loss", "recon", "perceptual", "kl", "vq", "g_gan", "d_gan")}

        def body(carry, inp):
            g_acc, d_acc, m_acc, ema_cur, count_acc = carry
            rc, vc, r = inp
            (total, (metrics, rec_img, new_ema)), grads = gen_grad(
                gen_p, ema_cur, disc_p, rc, vc, r, kl_scale, disc_active, True
            )
            count = jnp.sum(vc)
            g_acc = jax.tree_util.tree_map(lambda a, g: a + g * count, g_acc, grads)
            d_gan = jnp.zeros((), jnp.float32)
            if disc_active:
                d_loss, d_grads = disc_grad(disc_p, rec_img, rc)
                d_acc_new = jax.tree_util.tree_map(lambda a, g: a + g * count, d_acc, d_grads)
                d_gan = d_loss
            else:
                d_acc_new = d_acc
            metrics = dict(metrics)
            metrics["d_gan"] = d_gan
            m_acc = {k: m_acc[k] + metrics[k] * count for k in m_acc}
            if new_ema is not None:
                ema_cur = new_ema
            return (g_acc, d_acc_new, m_acc, ema_cur, count_acc + count), None

        (g_acc, d_acc, m_acc, ema_new, count), _ = jax.lax.scan(
            body, (zero_g, zero_d, zero_m, ema_s, jnp.float32(0.0)), (rawc, validc, rngs)
        )
        g_acc = jax.tree_util.tree_map(lambda g: g / jnp.maximum(count, 1.0), g_acc)
        updates, opt_s = optimizer.update(g_acc, opt_s, gen_p)
        gen_p = optax.apply_updates(gen_p, updates)
        if disc_active:
            d_acc = jax.tree_util.tree_map(lambda g: g / jnp.maximum(count, 1.0), d_acc)
            d_updates, disc_s = disc_optimizer.update(d_acc, disc_s, disc_p)
            disc_p = optax.apply_updates(disc_p, d_updates)
        return gen_p, ema_new, opt_s, disc_p, disc_s, m_acc, count

    def _build_train_step(accum: int):
        def step(gen_p, ema_s, opt_s, disc_p, disc_s, raw, valid, rng, kl_scale, *, disc_active):
            return _train_step_impl(gen_p, ema_s, opt_s, disc_p, disc_s, raw, valid, rng,
                                    kl_scale, disc_active=disc_active, n_chunks=accum)
        return jax.jit(step, static_argnames=("disc_active",))

    def _trial_compile(step, _accum):
        batch_sh = mesh_lib.batch_sharding(mesh)
        sample_shape = np.asarray(dataset[0]["target"]).shape
        # the jitted step sees the GLOBAL batch (process_count x batch_size)
        # when the mesh spans processes
        global_bs = batch_size * (jax.process_count()
                                  if mesh_lib.spans_processes(mesh) else 1)
        raw_aval = jax.ShapeDtypeStruct((global_bs, *sample_shape), jnp.float32, sharding=batch_sh)
        valid_aval = jax.ShapeDtypeStruct((global_bs,), jnp.float32, sharding=batch_sh)
        kl_aval = jax.ShapeDtypeStruct((), jnp.float32)
        # compile both generator-only and GAN-active programs up front, so an
        # oversized discriminator path fails at startup rather than mid-run
        variants = [False] + ([True] if discriminator is not None and gan_weight > 0 else [])
        for active in variants:
            step.lower(gen_params, ema_state, opt_state, disc_params, disc_opt_state,
                       raw_aval, valid_aval, jax.random.PRNGKey(0), kl_aval,
                       disc_active=active).compile()

    grad_accum, train_step = common.autotune_grad_accum(
        _build_train_step, _trial_compile,
        batch_size=batch_size, grad_accum=grad_accum,
        allow_microbatching=bool(training_cfg.get("allow_microbatching", True)),
        what="vae train step",
    )

    def eval_step(gen_p, ema_s, disc_p, raw, valid, kl_scale, *, disc_active):
        total, (metrics, rec_img, _) = forward_losses(
            gen_p, ema_s, disc_p, raw, valid, jax.random.PRNGKey(0), kl_scale, disc_active, False
        )
        d_gan = jnp.zeros((), jnp.float32)
        if disc_active:
            d_gan = disc_loss_fn(disc_p, rec_img, raw)
        metrics = dict(metrics)
        metrics["d_gan"] = d_gan
        count = jnp.sum(valid)
        return {k: v * count for k, v in metrics.items()}, count

    eval_step = jax.jit(eval_step, static_argnames=("disc_active",))

    # ------------------------------------------------------------------ resume
    resume_flag = resume if resume is not None else training_cfg.get("resume")
    if isinstance(resume_flag, str) and resume_flag.lower() == "none":
        resume_flag = None
    start_epoch = 1
    if resume_flag:
        ckpt_path = Path(resume_flag)
        if ckpt_path.exists():
            payload = ckpt_utils.load_checkpoint(ckpt_path)
            full = jax.tree_util.tree_map(jnp.asarray, payload["model"])
            gen_params, ema_state = _split_ema(full, is_ema)
            gen_params = _place_gen(gen_params)
            ema_state = mesh_lib.replicate(mesh, ema_state) if ema_state is not None else None
            if payload.get("optimizer") is not None:
                opt_state = _place_gen_opt(payload["optimizer"], gen_params)
            if payload.get("extra_state") is not None and discriminator is not None:
                disc_params = _place_disc(jax.tree_util.tree_map(
                    jnp.asarray, payload["extra_state"].get("disc_params", disc_params)))
            if payload.get("disc_optimizer") is not None and disc_opt_state is not None:
                disc_opt_state = _place_disc_opt(payload["disc_optimizer"], disc_params)
            best_metric = float(payload.get("best_metric", best_metric))
            start_epoch = int(payload.get("epoch", 0)) + 1
            logging.info("Resumed from %s (epoch %d)", ckpt_path, start_epoch - 1)

    global_step = 0
    rng = jax.random.PRNGKey(seed + 23)

    for epoch in range(start_epoch, epochs + 1):
        totals = {k: 0.0 for k in ("loss", "recon", "kl", "perceptual", "g_gan", "d_gan", "vq")}
        num_samples = 0
        n_steps = 0
        pending_metrics = []
        if str(training_cfg.get("data_loader", "threads")).lower() == "grain":
            from fmdm_tpu.data.grain_pipeline import grain_epoch_batches

            _batches = grain_epoch_batches(
                dataset, batch_size, shuffle=True, seed=seed, epoch=epoch,
                process_index=jax.process_index(), process_count=jax.process_count(),
                num_workers=int(training_cfg.get("num_workers", 0)),
            )
        else:
            _batches = epoch_batches(
                dataset, batch_size, shuffle=True, seed=seed, epoch=epoch,
                process_index=jax.process_index(), process_count=jax.process_count(),
                num_workers=_cfg_workers(training_cfg),
            )
        try:
            from tqdm import tqdm

            _batches = tqdm(_batches, total=steps_per_epoch,
                            desc=f"VAE {epoch}/{epochs}", leave=False, dynamic_ncols=True,
                            disable=(True if not mesh_lib.is_main_process() else None))
        except ImportError:
            pass
        t_epoch = t_batch = time.perf_counter()
        for batch in _batches:
            disc_active = _disc_is_active(discriminator is not None, gan_weight, gan_start,
                                          gan_start_steps, epoch, global_step)
            kl_scale = kl_weight
            if kl_anneal_steps > 0:
                kl_scale = kl_weight * min(1.0, max(1, global_step + 1) / max(1, kl_anneal_steps))
            rng, step_rng = jax.random.split(rng)
            raw = mesh_lib.shard_batch(mesh, jnp.asarray(batch["target"]))
            valid = mesh_lib.shard_batch(mesh, jnp.asarray(batch["valid"]))
            gen_params, ema_state, opt_state, disc_params, disc_opt_state, m, count = train_step(
                gen_params, ema_state, opt_state, disc_params, disc_opt_state,
                raw, valid, step_rng, jnp.float32(kl_scale), disc_active=disc_active,
            )
            # deferred readback: keep one step in flight (see denoise_lib)
            pending_metrics.append((m, count))
            if len(pending_metrics) > 1:
                pm, pc = pending_metrics.pop(0)
                for k in totals:
                    totals[k] += float(pm[k])
                num_samples += int(pc)
            global_step += 1
            n_steps += 1
            if hasattr(_batches, "set_postfix"):
                # running loss + per-batch wall time, the reference's tqdm
                # contract (vae_lib.py:319-334); loss lags the in-flight step
                now = time.perf_counter()
                _batches.set_postfix(
                    loss=f"{totals['loss'] / max(num_samples, 1):.4f}",
                    bt=f"{now - t_batch:.3f}s")
                t_batch = now
            if max_steps_per_epoch is not None and n_steps >= max_steps_per_epoch:
                break
        for pm, pc in pending_metrics:
            for k in totals:
                totals[k] += float(pm[k])
            num_samples += int(pc)

        averaged = {k: v / max(1, num_samples) for k, v in totals.items()}
        logging.info(
            "Epoch %03d | loss %.6f (recon %.6f, perc %.6f, kl %.6f, vq %.6f, g_gan %.6f, d_gan %.6f) | %.1f samples/s",
            epoch, averaged["loss"], averaged["recon"], averaged["perceptual"],
            averaged["kl"], averaged["vq"], averaged["g_gan"], averaged["d_gan"],
            num_samples / max(time.perf_counter() - t_epoch, 1e-9),
        )

        # -------- validation (mirrors train losses, vae_lib.py:373-483)
        val_avg = None
        if val_dataset is not None:
            val_totals = {k: 0.0 for k in totals}
            val_samples = 0
            disc_active = _disc_is_active(discriminator is not None, gan_weight, gan_start,
                                          gan_start_steps, epoch, global_step)
            kl_scale = kl_weight
            if kl_anneal_steps > 0:
                kl_scale = kl_weight * min(1.0, max(1, global_step + 1) / max(1, kl_anneal_steps))
            # process-strided batches + mesh sharding: under multi-host every
            # rank feeds its own rows and the jitted reductions psum the
            # metrics globally, so val_totals agree on every rank (single
            # host this is a plain device_put).
            for batch in epoch_batches(dataset=val_dataset, batch_size=batch_size,
                                       shuffle=False, seed=seed, epoch=epoch,
                                       process_index=jax.process_index(),
                                       process_count=jax.process_count()):
                raw = mesh_lib.shard_batch(mesh, jnp.asarray(batch["target"]))
                valid = mesh_lib.shard_batch(mesh, jnp.asarray(batch["valid"]))
                m, count = eval_step(gen_params, ema_state, disc_params, raw, valid,
                                     jnp.float32(kl_scale), disc_active=disc_active)
                for k in val_totals:
                    val_totals[k] += float(m[k])
                val_samples += int(count)
            val_avg = {k: v / max(1, val_samples) for k, v in val_totals.items()}
            logging.info(
                "Epoch %03d | val_loss %.6f (recon %.6f, perc %.6f, kl %.6f, vq %.6f, g_gan %.6f, d_gan %.6f)",
                epoch, val_avg["loss"], val_avg["recon"], val_avg["perceptual"],
                val_avg["kl"], val_avg["vq"], val_avg["g_gan"], val_avg["d_gan"],
            )

        current_metric = val_avg["loss"] if val_avg is not None else averaged["loss"]
        # "best" is tracked at checkpoint granularity: lowering best_metric on
        # a gathered-but-unsaved off-cadence epoch would leave vae_best.pt
        # permanently stale (a later epoch beating every SAVED state would
        # fail the improved test against an unsaved minimum).
        improved = False
        state = None
        if epoch % checkpoint_every == 0 or epoch == epochs:
            improved = current_metric < best_metric
            best_metric = min(best_metric, current_metric)
            full_params = _merge_ema(gen_params, ema_state)
            state = {
                "model": mesh_lib.to_host(full_params),
                "optimizer": mesh_lib.to_host(opt_state),
                "disc_optimizer": mesh_lib.to_host(disc_opt_state) if disc_opt_state is not None else None,
                "scheduler": {"last_epoch": epoch},
                "scaler": None,
                "epoch": epoch,
                "best_metric": best_metric,
            }
            if disc_params is not None:
                state["extra_state"] = {"disc_params": mesh_lib.to_host(disc_params)}

        # rank-0 writes only (params are replicated; denoise_lib gates the
        # same way) — every host saving would race on the shared filesystem.
        # One serialization; best/epoch copies are hardlink clones.
        should_save = (epoch % save_every == 0 or epoch == epochs) and state is not None
        if mesh_lib.is_main_process() and state is not None:
            mirrors = []
            if improved:
                mirrors.append(output_dir / "vae_best.pt")
            if should_save:
                mirrors.append(output_dir / "epochs" / f"epoch{epoch:04d}" / "epoch.pt")
            ckpt_utils.save_checkpoint_with_mirrors(state, output_dir / "vae_last.pt", mirrors)
            if improved:
                logging.info("New best (%.6f) -> %s", best_metric, output_dir / "vae_best.pt")
            if should_save:
                logging.info("Saved epoch checkpoint: %s", output_dir / "epochs" / f"epoch{epoch:04d}" / "epoch.pt")

        if mesh_lib.is_main_process():
            denom = max(num_samples, 1)
            metric_values = {k: totals[k] / denom for k in totals}
            row = [f"{epoch}"]
            for key in metrics_keys:
                value = metric_values.get(key)
                row.append("" if value is None else f"{value:.6f}")
            with metrics_path.open("a") as handle:
                handle.write(",".join(row) + "\n")

        if should_save:
            epoch_dir = output_dir / "epochs" / f"epoch{epoch:04d}"
            if visual_enabled and (epoch % visual_every == 0 or epoch == epochs):
                # split unconditionally so rng evolution stays identical on
                # every process; only rank 0 runs the probe and writes PNGs.
                # The host param gather (state["model"], built on every rank)
                # is what makes the rank-gated probe collective-safe when the
                # mesh spans processes — global arrays never enter the gate.
                rng, gen_rng = jax.random.split(rng)
                if mesh_lib.is_main_process():
                    full = jax.tree_util.tree_map(jnp.asarray, state["model"])
                    inputs = model.image_to_model_range(jnp.asarray(sample_batch))
                    if is_vq:
                        rec, _aux = model(full, inputs)
                    else:
                        rec, _post = model(full, inputs, sample_posterior=False)
                    rec_vis = np.asarray(model.raw_output_to_image(rec, recon_type=recon_type))
                    input_vis = np.clip(np.asarray(sample_batch), 0.0, 1.0)
                    if sample_count >= 20:
                        rows_, cols_ = 4, 5
                    else:
                        rows_ = max(1, int(math.sqrt(sample_count)))
                        cols_ = max(1, sample_count // rows_)
                    save_image(make_grid(input_vis, rows_, cols_), epoch_dir / "input.png")
                    save_image(make_grid(np.clip(rec_vis, 0, 1), rows_, cols_), epoch_dir / "recon.png")
                    noise = jax.random.normal(gen_rng, (sample_count, *latent_shape_), jnp.float32)
                    gen = model.decode(full, noise)
                    gen_vis = np.clip(np.asarray(model.raw_output_to_image(gen, recon_type=recon_type)), 0, 1)
                    save_image(make_grid(gen_vis, rows_, cols_), epoch_dir / "gen.png")

    # drain async checkpoint writes so callers (eval, resume, tests) see
    # final files on disk the moment train() returns
    ckpt_utils.flush_checkpoint_writes()
    return output_dir


def debug_visual_only(dataset, json_path, ckpt_path, *, output_dir=None,
                      visual_samples: int = 10, seed: Optional[int] = None) -> Path:
    """Reference vae_lib.py:555-607."""
    from fmdm_tpu.data.dataset_utils import save_output_tensor
    from fmdm_tpu.utils.evaluation import select_visual_indices

    logging.basicConfig(level=logging.INFO, format="%(asctime)s | %(levelname)s | %(message)s", force=True)
    cfg = config_utils.load_json_config(json_path)
    model_cfg = cfg.get("model", {})
    if str(model_cfg.get("model_type", "")).lower() != "vae":
        raise ValueError(f"Expected model_type 'vae', got '{model_cfg.get('model_type')}'.")
    training_cfg = cfg["training"]
    use_seed = seed if seed is not None else training_cfg.get("seed")
    config_utils.set_seed(use_seed)
    model, params = build_vae_model(cfg, ckpt_path=Path(ckpt_path))
    recon_type = training_cfg.get("recon_type", "l1")

    out_root = Path(output_dir) if output_dir is not None else (
        Path(training_cfg.get("output_dir", "checkpoints/vae")) / "debug_train_like"
    )
    out_root.mkdir(parents=True, exist_ok=True)

    indices = select_visual_indices(dataset, int(visual_samples), seed=use_seed)
    batch = jnp.asarray(np.stack([np.asarray(dataset[idx]["target"], np.float32) for idx in indices]))
    model_inputs = model.image_to_model_range(batch)
    if hasattr(model, "codebook"):
        rec, _ = model(params, model_inputs)
    else:
        rec, _ = model(params, model_inputs, sample_posterior=False)
    rec_vis = np.clip(np.asarray(model.raw_output_to_image(rec, recon_type=recon_type)), 0.0, 1.0)
    input_vis = np.clip(np.asarray(batch), 0.0, 1.0)

    rows = max(1, int(math.sqrt(rec_vis.shape[0])))
    cols = max(1, rec_vis.shape[0] // rows)
    save_image(make_grid(input_vis, rows, cols), out_root / "grid_input.png")
    save_image(make_grid(rec_vis, rows, cols), out_root / "grid_output.png")
    save_image(make_grid(input_vis, rows, cols), out_root / "grid_target.png")

    for b, idx in enumerate(indices):
        if not hasattr(dataset, "data"):
            break
        row = dataset.data[idx]
        save_output_tensor(dataset, row, dataset.target_key, input_vis[b], out_root / "target")
        save_output_tensor(dataset, row, dataset.target_key, rec_vis[b], out_root / "generated")
        if getattr(dataset, "conditioning_key", None) is not None and dataset[idx].get("image") is not None:
            save_output_tensor(dataset, row, dataset.conditioning_key,
                               np.asarray(dataset[idx]["image"]), out_root / "conditioning")

    logging.info("VAE debug visual-only generation completed for %d samples. Output: %s", len(indices), out_root)
    print(f"VAE debug visual-only generation completed for {len(indices)} samples.")
    print(f"Output directory: {out_root}")
    return out_root
