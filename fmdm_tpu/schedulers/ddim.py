"""
DDIM scheduler, numerically matching diffusers.DDIMScheduler defaults
(eta=0 deterministic, leading spacing, clip_sample=True, epsilon prediction).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.schedulers.base import (
    Scheduler,
    check_unimplemented_kwargs,
    dynamic_threshold,
    make_beta_schedule,
    spaced_timesteps,
)

# diffusers.DDIMScheduler ctor params recognized but NOT implemented
_UNIMPLEMENTED = frozenset({"trained_betas", "rescale_betas_zero_snr"})


@dataclasses.dataclass(frozen=True)
class DDIMScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    final_alpha_cumprod: float = 1.0
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    prediction_type: str = "epsilon"
    eta: float = 0.0
    use_clipped_model_output: bool = False
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    timestep_spacing: str = "leading"
    steps_offset: int = 0
    num_inference_steps: Optional[int] = None

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        clip_sample: bool = True,
        clip_sample_range: float = 1.0,
        set_alpha_to_one: bool = True,
        prediction_type: str = "epsilon",
        eta: float = 0.0,
        use_clipped_model_output: bool = False,
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        **extra,
    ) -> "DDIMScheduler":
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        if timestep_spacing not in ("linspace", "leading", "trailing"):
            raise ValueError(f"Unknown timestep_spacing '{timestep_spacing}'")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        final = 1.0 if set_alpha_to_one else float(alphas_cumprod[0])
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            final_alpha_cumprod=final,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            prediction_type=prediction_type,
            eta=eta,
            use_clipped_model_output=use_clipped_model_output,
            thresholding=thresholding,
            dynamic_thresholding_ratio=dynamic_thresholding_ratio,
            sample_max_value=sample_max_value,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
        )

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        return jnp.sqrt(acp).reshape(shape) * x0 + jnp.sqrt(1 - acp).reshape(shape) * noise

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        object.__setattr__(self, "num_inference_steps", num_inference_steps)
        return spaced_timesteps(
            self.timestep_spacing, self.num_train_timesteps,
            num_inference_steps, self.steps_offset, ddim_conventions=True)

    @property
    def needs_noise(self) -> bool:
        return self.eta > 0

    def step(
        self,
        state: Dict[str, Any],
        model_output: jax.Array,
        index,
        sample: jax.Array,
        timesteps: jax.Array,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, Any], jax.Array]:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)
        n = timesteps.shape[0]
        num_inference = self.num_inference_steps or n
        t = timesteps[index]
        prev_t = t - self.num_train_timesteps // num_inference

        alpha_prod_t = acp[t]
        alpha_prod_prev = jnp.where(
            prev_t >= 0, acp[jnp.maximum(prev_t, 0)], jnp.float32(self.final_alpha_cumprod)
        )
        beta_prod_t = 1.0 - alpha_prod_t

        x32 = sample.astype(jnp.float32)
        out32 = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            pred_x0 = (x32 - jnp.sqrt(beta_prod_t) * out32) / jnp.sqrt(alpha_prod_t)
            eps = out32
        elif self.prediction_type == "sample":
            pred_x0 = out32
            eps = (x32 - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)
        elif self.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(alpha_prod_t) * x32 - jnp.sqrt(beta_prod_t) * out32
            eps = jnp.sqrt(alpha_prod_t) * out32 + jnp.sqrt(beta_prod_t) * x32
        else:
            raise ValueError(f"Unknown prediction_type '{self.prediction_type}'")

        if self.thresholding:
            # diffusers order: thresholding takes precedence over clip_sample
            pred_x0 = dynamic_threshold(pred_x0, self.dynamic_thresholding_ratio,
                                        self.sample_max_value)
        elif self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.clip_sample_range, self.clip_sample_range)
        if self.use_clipped_model_output:
            # diffusers only re-derives eps from the (possibly clipped) x0 when
            # step(..., use_clipped_model_output=True) — the reference pipeline
            # never passes it, so the default keeps the raw eps even when x0
            # was clipped (Glide-style recompute stays opt-in).
            eps = (x32 - jnp.sqrt(alpha_prod_t) * pred_x0) / jnp.sqrt(beta_prod_t)

        # sigma_t for eta > 0 (ancestral blend)
        variance = (1 - alpha_prod_prev) / (1 - alpha_prod_t) * (1 - alpha_prod_t / alpha_prod_prev)
        std_dev = self.eta * jnp.sqrt(jnp.clip(variance, 0.0, None))

        dir_xt = jnp.sqrt(jnp.clip(1.0 - alpha_prod_prev - std_dev**2, 0.0, None)) * eps
        prev_sample = jnp.sqrt(alpha_prod_prev) * pred_x0 + dir_xt
        if self.eta > 0:
            if rng is None:
                raise ValueError("DDIM with eta > 0 requires an rng key.")
            prev_sample = prev_sample + std_dev * jax.random.normal(rng, sample.shape, jnp.float32)
        return state, prev_sample.astype(sample.dtype)
