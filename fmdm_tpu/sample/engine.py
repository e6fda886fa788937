"""
The compiled denoising loop.

Replaces the reference's Python-driven ``sample_with_scheduler``
(/root/reference/src/pipelines/utils.py:163-220) with a single jitted
``jax.lax.scan`` over the (statically shaped) selected-timestep array —
the BASELINE.json north-star loop. ``start_step`` / ``last_n_steps`` filtering
happens host-side on the static timestep array, so no dynamic shapes reach XLA.

Conditioning helpers mirror pipelines/utils.py:110-160
(_align_conditioning batch repeat, normalize_latent_conditioning,
_prepare_attention_context).
"""

from __future__ import annotations

import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.schedulers.base import Scheduler


# ---------------------------------------------------------------------------
# Conditioning helpers
# ---------------------------------------------------------------------------

def align_conditioning(condition: Optional[jax.Array], target_batch: int) -> Optional[jax.Array]:
    if condition is None:
        return None
    if condition.shape[0] == target_batch:
        return condition
    repeats = math.ceil(target_batch / condition.shape[0])
    if repeats > 1:
        condition = jnp.concatenate([condition] * repeats, axis=0)
    return condition[:target_batch]


def normalize_latent_conditioning(condition: Optional[jax.Array], mode: Optional[str]) -> Optional[jax.Array]:
    if condition is None:
        return None
    mode_value = str(mode or "none").lower()
    if mode_value in {"none", "false", "off"}:
        return condition
    eps = 1e-6
    axes = tuple(range(2, condition.ndim))
    if mode_value == "standardize":
        mean = jnp.mean(condition, axis=axes, keepdims=True)
        # torch .std() uses the unbiased (ddof=1) estimator — match it.
        std = jnp.std(condition, axis=axes, keepdims=True, ddof=1)
        return (condition - mean) / (std + eps)
    if mode_value == "minmax":
        minv = jnp.min(condition, axis=axes, keepdims=True)
        maxv = jnp.max(condition, axis=axes, keepdims=True)
        return (condition - minv) / (maxv - minv + eps)
    raise ValueError(f"Unknown latent_norm mode: {mode}")


def prepare_attention_context(condition: Optional[jax.Array]) -> Optional[jax.Array]:
    if condition is None:
        return None
    if condition.ndim >= 3:
        return condition
    raise ValueError(f"Unsupported conditioning shape for attention: {tuple(condition.shape)}")


def deep_cache_refresh_mask(
    n: int,
    interval: int,
    schedule: str = "adaptive",
    warm_frac: float = 0.15,
    tail_frac: float = 0.10,
) -> np.ndarray:
    """Which scan steps run the FULL UNet under DeepCache.

    'uniform': every `interval`-th step (classic DeepCache).
    'adaptive': uniform backbone PLUS always-full head/tail windows — deep
    features change fastest at the start (structure forms) and the end
    (detail lands) of the reverse process, which is where uniform caching
    loses most of its PSNR (BENCHMARKS.md DeepCache table). Timestep-aware
    caching recovers that at a modest refresh-count increase."""
    mask = np.zeros((n,), bool)
    mask[::max(1, int(interval))] = True
    if schedule == "adaptive":
        warm = max(1, int(round(n * warm_frac)))
        tail = max(1, int(round(n * tail_frac)))
        mask[:warm] = True
        mask[n - tail:] = True
    elif schedule != "uniform":
        raise ValueError(f"Unknown deep_cache schedule '{schedule}'")
    mask[0] = True  # first step must populate the cache
    return mask


def select_timesteps(
    timesteps: np.ndarray,
    start_step: Optional[int] = None,
    last_n_steps: Optional[int] = None,
) -> np.ndarray:
    """Host-side start_step/last_n filtering (pipelines/utils.py:184-194)."""
    if start_step is not None:
        start_step = int(start_step)
        if start_step < 0:
            raise ValueError("start_step must be >= 0.")
        timesteps = timesteps[timesteps <= start_step]
    if last_n_steps is not None:
        last_n_steps = int(last_n_steps)
        if last_n_steps <= 0:
            raise ValueError("last_n_steps must be > 0.")
        timesteps = timesteps[-last_n_steps:]
    if timesteps.size == 0:
        raise ValueError("No timesteps selected after applying start_step/last_n_steps.")
    return timesteps


# ---------------------------------------------------------------------------
# Sampling engine (cached jitted scan)
# ---------------------------------------------------------------------------

class SamplingEngine:
    """Builds and caches one jitted reverse-process scan per
    (scheduler, timesteps, conditioning-mode) configuration."""

    def __init__(
        self,
        model,
        scheduler: Scheduler,
        timesteps: np.ndarray,
        conditioning_mode: Optional[str] = None,
        latent_norm: Optional[str] = None,
        compute_dtype=None,
        mesh=None,
        deep_cache: Optional[Tuple[int, int]] = None,
    ):
        self.model = model
        self.scheduler = scheduler
        # let positional-table schedulers (DPMSolverSDE) veto slicings they
        # cannot start from (e.g. mid-ancestral-pair parity after
        # start_step/last_n filtering)
        self.timesteps = np.asarray(scheduler.align_sliced_timesteps(np.asarray(timesteps)))
        self.conditioning_mode = conditioning_mode
        self.latent_norm = latent_norm
        # Optional DeepCache-style inference acceleration
        # (interval, depth[, schedule]): refresh steps run the full UNet and
        # capture the deep sub-network's output; the steps between recompute
        # only the shallow high-res levels and splice the cached deep feature
        # back in (models/unet_diffusers.py __call__ docstring). The refresh
        # pattern comes from deep_cache_refresh_mask (adaptive by default:
        # always-full head/tail windows + uniform backbone). interval=1 is
        # numerically identical to the uncached engine. Beyond-reference
        # capability — off by default.
        self.deep_cache = tuple(deep_cache) if deep_cache else None
        # Optional data-parallel sampling: batch sharded over the mesh 'data'
        # axis, params replicated; XLA partitions the whole scan SPMD. A mesh
        # with a 'seq' axis additionally routes the UNet's attention through
        # the ppermute ring (ops/attention.py sequence-parallel routing) —
        # volumetric token counts whose scores outgrow one chip.
        self.mesh = mesh
        # bf16 model compute with f32 scheduler math: the UNet runs on the MXU
        # in bf16 (2x matmul throughput + half the HBM traffic on v5e); the
        # sample itself and all scheduler tables stay f32 so multistep solver
        # state keeps full precision.
        self.compute_dtype = compute_dtype
        self._jitted: Optional[Callable] = None
        # AOT-compiled executables per argument shape, so compilation happens
        # OUTSIDE the timed region (the reference's timing dict measures model
        # execution only, pipelines/utils.py:211-217 — torch eager has no
        # compile to accidentally include; we must exclude ours explicitly).
        self._compiled: Dict[Any, Any] = {}
        # One-entry placed-params cache: (id(src), strong ref to src, placed).
        # Residency discipline — a host tree (e.g. a freshly quantized int8
        # tree before utils/quantize.py returned device leaves) handed to the
        # jitted scan re-uploads EVERY leaf on EVERY call; replicate() per
        # call had the same cost on a mesh. Place once, reuse by identity.
        # The strong ref makes the id() key safe against address reuse.
        self._placed: Optional[Tuple[int, Any, Any]] = None

    def _build(self):
        scheduler = self.scheduler
        model = self.model
        timesteps_const = jnp.asarray(self.timesteps)
        is_int_t = np.issubdtype(self.timesteps.dtype, np.integer)
        mode = self.conditioning_mode
        compute_dtype = self.compute_dtype

        deep_cache = self.deep_cache

        def sample_fn(params, init, cond, rng):
            n = timesteps_const.shape[0]
            state = scheduler.init_state(timesteps_const, init)
            step_rngs = jax.random.split(rng, n)
            if compute_dtype is not None:
                from fmdm_tpu.nn.module import cast_floating

                params = cast_floating(params, compute_dtype)
                if cond is not None:
                    cond = cond.astype(compute_dtype)

            def model_input_for(x, i):
                t = timesteps_const[i]
                t_b = jnp.broadcast_to(t.astype(jnp.int32) if is_int_t else t, (x.shape[0],))
                # sigma-space schedulers (DPMSolverSDE) scale the model input;
                # identity for the VP schedulers (diffusers API surface)
                model_input = scheduler.scale_model_input(x, i, timesteps_const)
                if compute_dtype is not None:
                    model_input = model_input.astype(compute_dtype)
                ctx = None
                if mode == "concatenate" and cond is not None:
                    model_input = jnp.concatenate([model_input, cond], axis=1)
                elif mode == "attention" and cond is not None:
                    ctx = cond
                return model_input, t_b, ctx

            if deep_cache is None:

                def body(carry, inp):
                    state, x = carry
                    i, step_rng = inp
                    model_input, t_b, ctx = model_input_for(x, i)
                    pred = model(params, model_input, t_b, context_ca=ctx).astype(jnp.float32)
                    state, x = scheduler.step(state, pred, i, x, timesteps_const, rng=step_rng)
                    return (state, x), None

                (state, x), _ = jax.lax.scan(
                    body, (state, init), (jnp.arange(n), step_rngs)
                )
                return x

            interval, depth = deep_cache[0], deep_cache[1]
            schedule = deep_cache[2] if len(deep_cache) > 2 else "adaptive"
            refresh_const = jnp.asarray(deep_cache_refresh_mask(
                int(timesteps_const.shape[0]), interval, schedule))
            # deep-feature buffer shape via abstract eval of the capturing pass
            mi0, tb0, ctx0 = model_input_for(init, jnp.int32(0))
            _, feat_shape = jax.eval_shape(
                lambda p, m, t, c: model(p, m, t, context_ca=c,
                                         cache_depth=depth, return_deep_feature=True),
                params, mi0, tb0, ctx0,
            )
            cache0 = jnp.zeros(feat_shape.shape, feat_shape.dtype)

            def body(carry, inp):
                state, x, cache = carry
                i, step_rng = inp
                model_input, t_b, ctx = model_input_for(x, i)

                def full(operand):
                    mi, _ = operand
                    out, feat = model(params, mi, t_b, context_ca=ctx,
                                      cache_depth=depth, return_deep_feature=True)
                    return out, feat

                def shallow(operand):
                    mi, cached = operand
                    out = model(params, mi, t_b, context_ca=ctx,
                                deep_cache=cached, cache_depth=depth)
                    return out, cached

                pred, cache = jax.lax.cond(
                    refresh_const[i], full, shallow, (model_input, cache)
                )
                state, x = scheduler.step(state, pred.astype(jnp.float32), i, x,
                                          timesteps_const, rng=step_rng)
                return (state, x, cache), None

            (state, x, _), _ = jax.lax.scan(
                body, (state, init, cache0), (jnp.arange(n), step_rngs)
            )
            return x

        return jax.jit(sample_fn)

    def __call__(
        self,
        params,
        sample_shape: Tuple[int, ...],
        rng: jax.Array,
        conditioning_batch: Optional[jax.Array] = None,
        init_sample: Optional[jax.Array] = None,
        timing: Optional[Dict[str, Any]] = None,
    ) -> jax.Array:
        from fmdm_tpu.ops import attention as attention_ops

        # Scope the attention routing to THIS engine's mesh for the whole
        # call (tracing happens here, at lower() or first execution): a
        # 'seq'-axis mesh engages the ring (honoring a caller-installed
        # context for the same mesh, e.g. a tuned min_tokens); any other
        # mesh — or none — must not inherit a trainer's process-global
        # routing, which would shard_map over a foreign device set.
        current_ctx = attention_ops.get_sequence_parallel()
        if self.mesh is not None and "seq" in self.mesh.axis_names:
            seq_ctx = (current_ctx if current_ctx is not None and current_ctx[0] == self.mesh
                       else (self.mesh, "seq", 512))
        else:
            seq_ctx = None
        with attention_ops.sequence_parallel_scope(seq_ctx):
            return self._call_scoped(params, sample_shape, rng, conditioning_batch,
                                     init_sample, timing)

    def _placed_params(self, params):
        """Device-place a params tree ONCE per tree object (by identity).

        Repeated eval batches pass the same tree; caching the placed result
        means the weight H2D transfer happens on the first call only — the
        regression the int8 production path hit (VERDICT r4 Weak #1: host
        quantized tree re-uploaded every batch made --quantize int8 4x
        slower than bf16 on the chip). Already-device trees cost a no-op
        device_put on the first call and a dict hit afterwards. During
        training visual probes params change every call — each new tree is
        placed fresh (device leaves: free), so staleness is impossible.
        """
        hit = self._placed
        if hit is not None and hit[0] == id(params) and hit[1] is params:
            return hit[2]
        if self.mesh is not None:
            from fmdm_tpu.parallel.mesh import replicate

            placed = replicate(self.mesh, params)
        else:
            placed = jax.device_put(params)
        self._placed = (id(params), params, placed)
        return placed

    def _call_scoped(self, params, sample_shape, rng, conditioning_batch,
                     init_sample, timing) -> jax.Array:
        if self._jitted is None:
            self._jitted = self._build()

        rng_init, rng_steps = jax.random.split(rng)
        del rng  # consumed
        # pure-noise start enters at the first *selected* call's sigma
        # (== init_noise_sigma for unsliced schedules)
        current = init_sample if init_sample is not None else jax.random.normal(
            rng_init, sample_shape, dtype=jnp.float32
        ) * self.scheduler.init_noise_scale(self.timesteps)
        cond = align_conditioning(conditioning_batch, current.shape[0])
        if self.conditioning_mode == "attention":
            cond = normalize_latent_conditioning(cond, self.latent_norm)
            cond = prepare_attention_context(cond)

        if self.mesh is not None:
            from fmdm_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
            current = jax.device_put(current, sharding)
            if cond is not None:
                cond = jax.device_put(cond, sharding)
        else:
            # Place batch inputs BEFORE the timed window. The reference's
            # timing dict (pipelines/utils.py:211-217) times _forward_model
            # with the batch already resident on the device (moved upstream);
            # a host numpy `cond` here would otherwise be transferred inside
            # the jitted call and counted as model time — ~0.6 s/batch of
            # pure H2D through this TPU tunnel, not model compute.
            current = jax.device_put(current)
            if cond is not None:
                cond = jax.device_put(cond)
        params = self._placed_params(params)

        # Ensure the executable exists before starting the clock: AOT-lower and
        # compile once per argument-shape signature.
        shape_key = (
            tuple(current.shape), str(current.dtype),
            None if cond is None else (tuple(cond.shape), str(cond.dtype)),
        )
        if shape_key not in self._compiled and timing is not None:
            self._compiled[shape_key] = self._jitted.lower(params, current, cond, rng_steps).compile()
        fn = self._compiled.get(shape_key, self._jitted)

        start = time.perf_counter()
        out = fn(params, current, cond, rng_steps)
        out = jax.block_until_ready(out)
        if timing is not None:
            # Parity with the reference timing dict (pipelines/utils.py:211-217):
            # device-synced seconds around model execution; the compiled scan
            # fuses scheduler math into the same program (its cost is noise).
            timing["model_seconds"] = timing.get("model_seconds", 0.0) + (time.perf_counter() - start)
            timing["model_calls"] = timing.get("model_calls", 0) + int(self.timesteps.shape[0])
        return out


def sample_with_scheduler(
    model,
    params,
    scheduler: Scheduler,
    num_inference_steps: int,
    sample_shape: Tuple[int, ...],
    rng: jax.Array,
    conditioning_mode: Optional[str] = None,
    conditioning_batch: Optional[jax.Array] = None,
    latent_norm: Optional[str] = None,
    timing: Optional[Dict[str, Any]] = None,
    start_step: Optional[int] = None,
    last_n_steps: Optional[int] = None,
    init_sample: Optional[jax.Array] = None,
) -> jax.Array:
    """One-shot functional facade over SamplingEngine (reference signature,
    pipelines/utils.py:163-220)."""
    timesteps = select_timesteps(scheduler.set_timesteps(num_inference_steps), start_step, last_n_steps)
    engine = SamplingEngine(model, scheduler, timesteps, conditioning_mode, latent_norm)
    return engine(
        params, sample_shape, rng,
        conditioning_batch=conditioning_batch, init_sample=init_sample, timing=timing,
    )
