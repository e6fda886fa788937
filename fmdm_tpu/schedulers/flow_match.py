"""
FlowMatchEulerDiscrete scheduler, matching diffusers'
FlowMatchEulerDiscreteScheduler (static shift variant):

  sigma(t) = t / num_train;  with shift s: sigma <- s*sigma / (1 + (s-1)*sigma)
  x_sigma  = (1 - sigma) * x0 + sigma * noise
  step:      x_prev = x + (sigma_next - sigma) * v,   v = model(x, t)

The reference's flow-matching trainer regresses v = eps - x0 on the linear
interpolant (flow_matching_lib.py:150-167), which is exactly d x_sigma / d sigma,
so Euler integration over descending sigmas recovers x0.
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
)

# diffusers.FlowMatchEulerDiscreteScheduler ctor params recognized but NOT
# implemented (see base.check_unimplemented_kwargs)
_UNIMPLEMENTED = frozenset({
    "use_dynamic_shifting", "base_shift", "max_shift", "base_image_seq_len",
    "max_image_seq_len", "invert_sigmas", "shift_terminal", "time_shift_type",
    "use_karras_sigmas", "use_exponential_sigmas", "use_beta_sigmas",
    "stochastic_sampling",
})


@dataclasses.dataclass(frozen=True)
class FlowMatchEulerDiscreteScheduler(Scheduler):
    num_train_timesteps: int = 1000
    shift: float = 1.0
    _sigmas: Optional[np.ndarray] = None  # per selected timestep + trailing 0

    @classmethod
    def create(cls, num_train_timesteps: int = 1000, shift: float = 1.0, **extra):
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        return cls(num_train_timesteps=num_train_timesteps, shift=shift)

    # -- sigma math ----------------------------------------------------------
    def _shift_sigma(self, sigma):
        if self.shift == 1.0:
            return sigma
        return self.shift * sigma / (1 + (self.shift - 1) * sigma)

    def sigma_for_timestep(self, t: jax.Array) -> jax.Array:
        """Timesteps live in *shifted*-sigma space (diffusers convention:
        set_timesteps returns shifted_sigma * N), so sigma is recovered by a
        plain division — applying the shift map here again would double-shift
        timesteps that came from set_timesteps (step() and diffusers'
        scale_noise both divide directly)."""
        return t.astype(jnp.float32) / self.num_train_timesteps

    # -- forward process (scale_noise in diffusers) ---------------------------
    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sigma = broadcast_to_sample(self.sigma_for_timestep(t), x0)
        return (1.0 - sigma) * x0 + sigma * noise

    # -- reverse process -------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        # diffusers: timesteps = linspace(sigma_max*N, sigma_min*N, steps)
        sigma_max = self._shift_sigma_np(1.0)
        sigma_min = self._shift_sigma_np(1.0 / self.num_train_timesteps)
        timesteps = np.linspace(
            sigma_max * self.num_train_timesteps,
            sigma_min * self.num_train_timesteps,
            num_inference_steps,
            dtype=np.float64,
        )
        sigmas = timesteps / self.num_train_timesteps
        sigmas = np.concatenate([sigmas, [0.0]])
        object.__setattr__(self, "_sigmas", sigmas.astype(np.float32))
        return timesteps.astype(np.float32)

    def _shift_sigma_np(self, sigma: float) -> float:
        if self.shift == 1.0:
            return sigma
        return self.shift * sigma / (1 + (self.shift - 1) * sigma)

    def step(
        self,
        state: Dict[str, Any],
        model_output: jax.Array,
        index,
        sample: jax.Array,
        timesteps: jax.Array,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, Any], jax.Array]:
        # sigma per selected step; sliced timestep arrays (start_step/last_n)
        # recompute sigma directly from the timestep values, with final sigma 0.
        sigmas = timesteps.astype(jnp.float32) / self.num_train_timesteps
        sigmas = jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])
        sigma = sigmas[index]
        sigma_next = sigmas[index + 1]
        x32 = sample.astype(jnp.float32)
        prev = x32 + (sigma_next - sigma) * model_output.astype(jnp.float32)
        return state, prev.astype(sample.dtype)
