"""
DDPM scheduler (ancestral sampling), numerically matching
diffusers.DDPMScheduler for the configurations the reference uses
(epsilon prediction, fixed_small variance, leading timestep spacing).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.schedulers.base import (
    Scheduler,
    broadcast_to_sample,
    check_unimplemented_kwargs,
    dynamic_threshold,
    make_beta_schedule,
    spaced_timesteps,
)

# diffusers.DDPMScheduler ctor params recognized but NOT implemented
_UNIMPLEMENTED = frozenset({"trained_betas", "rescale_betas_zero_snr"})


@dataclasses.dataclass(frozen=True)
class DDPMScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    betas: np.ndarray = None
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    variance_type: str = "fixed_small"
    prediction_type: str = "epsilon"
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
        variance_type: str = "fixed_small",
        prediction_type: str = "epsilon",
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        timestep_spacing: str = "leading",
        steps_offset: int = 0,
        **extra,
    ) -> "DDPMScheduler":
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        if variance_type not in ("fixed_small", "fixed_large"):
            # diffusers also accepts fixed_small_log / fixed_large_log /
            # learned / learned_range — recognized values we have not
            # implemented; same loud-failure policy as unknown kwargs.
            raise NotImplementedError(
                f"DDPMScheduler: variance_type '{variance_type}' is part of "
                f"the diffusers surface but not implemented here; use "
                f"'fixed_small' or 'fixed_large'")
        if timestep_spacing not in ("linspace", "leading", "trailing"):
            raise ValueError(f"Unknown timestep_spacing '{timestep_spacing}'")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            betas=betas,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            variance_type=variance_type,
            prediction_type=prediction_type,
            thresholding=thresholding,
            dynamic_thresholding_ratio=dynamic_thresholding_ratio,
            sample_max_value=sample_max_value,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
        )

    # -- forward process ----------------------------------------------------
    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        sqrt_acp = broadcast_to_sample(jnp.sqrt(acp), x0)
        sqrt_1m = broadcast_to_sample(jnp.sqrt(1.0 - acp), x0)
        return sqrt_acp * x0 + sqrt_1m * noise

    # -- reverse process ------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        object.__setattr__(self, "num_inference_steps", num_inference_steps)
        return spaced_timesteps(
            self.timestep_spacing, self.num_train_timesteps,
            num_inference_steps, self.steps_offset, ddim_conventions=True)

    @property
    def needs_noise(self) -> bool:
        return True

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
        t = timesteps[index]
        # prev_t follows diffusers: t - num_train // num_inference
        step_ratio = self.num_train_timesteps // n if self.num_inference_steps is None else (
            self.num_train_timesteps // self.num_inference_steps
        )
        prev_t = t - step_ratio

        alpha_prod_t = acp[t]
        alpha_prod_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)], jnp.float32(1.0))
        beta_prod_t = 1.0 - alpha_prod_t
        beta_prod_prev = 1.0 - alpha_prod_prev
        current_alpha = alpha_prod_t / alpha_prod_prev
        current_beta = 1.0 - current_alpha

        x32 = sample.astype(jnp.float32)
        eps32 = model_output.astype(jnp.float32)
        if self.prediction_type == "epsilon":
            pred_x0 = (x32 - jnp.sqrt(beta_prod_t) * eps32) / jnp.sqrt(alpha_prod_t)
        elif self.prediction_type == "sample":
            pred_x0 = eps32
        elif self.prediction_type == "v_prediction":
            pred_x0 = jnp.sqrt(alpha_prod_t) * x32 - jnp.sqrt(beta_prod_t) * eps32
        else:
            raise ValueError(f"Unknown prediction_type '{self.prediction_type}'")

        if self.thresholding:
            # diffusers order: thresholding takes precedence over clip_sample
            pred_x0 = dynamic_threshold(pred_x0, self.dynamic_thresholding_ratio,
                                        self.sample_max_value)
        elif self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.clip_sample_range, self.clip_sample_range)

        pred_x0_coeff = jnp.sqrt(alpha_prod_prev) * current_beta / beta_prod_t
        current_coeff = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod_t
        prev_sample = pred_x0_coeff * pred_x0 + current_coeff * x32

        # fixed_small variance, only added while t > 0 (diffusers semantics)
        variance = jnp.clip(beta_prod_prev / beta_prod_t * current_beta, 1e-20, None)
        if self.variance_type == "fixed_large":
            variance = jnp.clip(current_beta, 1e-20, None)
        if rng is None:
            raise ValueError("DDPMScheduler.step requires an rng key (ancestral sampling).")
        noise = jax.random.normal(rng, sample.shape, dtype=jnp.float32)
        prev_sample = prev_sample + jnp.where(t > 0, jnp.sqrt(variance), 0.0) * noise
        return state, prev_sample.astype(sample.dtype)
