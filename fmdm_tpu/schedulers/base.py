"""
Scheduler core: pure-JAX, stateless step functions composable inside
``jax.lax.scan``.

Replaces the diffusers scheduler classes used by the reference
(/root/reference/src/pipelines/utils.py:22-30) with a functional API:

  sched = DDPMScheduler.create(num_train_timesteps=1000, ...)
  timesteps = sched.set_timesteps(50)            # static numpy array, host side
  state = sched.init_state(timesteps)            # fixed-size carried state
  noisy = sched.add_noise(x0, noise, t)          # forward process
  state, prev = sched.step(state, model_output, i, sample, timesteps, rng)
                                                  # i = static-position scan index

All tables (betas, sigmas, lambdas) are precomputed host-side in float64/32 and
baked into the jitted program as constants; ``step`` takes the *index into the
selected timestep array* so the whole reverse process is one ``lax.scan`` with
static shapes (BASELINE.json north-star: compiled denoising loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    num_train_timesteps: int,
    beta_start: float,
    beta_end: float,
) -> np.ndarray:
    """Beta schedules with diffusers semantics."""
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    if schedule == "squaredcos_cap_v2":
        # Glide cosine schedule
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        betas = []
        for i in range(num_train_timesteps):
            t1 = i / num_train_timesteps
            t2 = (i + 1) / num_train_timesteps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise ValueError(f"Unknown beta schedule '{schedule}'")


def spaced_timesteps_leading(num_train: int, num_inference: int) -> np.ndarray:
    """'leading' spacing (diffusers DDPM/DDIM default): descending int array."""
    step_ratio = num_train // num_inference
    t = (np.arange(0, num_inference) * step_ratio).round()[::-1].copy()
    return t.astype(np.int64)


def spaced_timesteps_linspace(num_train: int, num_inference: int) -> np.ndarray:
    """'linspace' spacing (DPM-Solver/UniPC default)."""
    return (
        np.linspace(0, num_train - 1, num_inference + 1).round()[::-1][:-1].copy().astype(np.int64)
    )


def spaced_timesteps_trailing(num_train: int, num_inference: int) -> np.ndarray:
    """'trailing' spacing (diffusers): descending from num_train-1."""
    step_ratio = num_train / num_inference
    t = np.arange(num_train, 0, -step_ratio).round().astype(np.int64) - 1
    return t.copy()


def spaced_timesteps(
    spacing: str, num_train: int, num_inference: int, steps_offset: int = 0,
    ddim_conventions: bool = False,
) -> np.ndarray:
    """Dispatch on diffusers `timestep_spacing`; `steps_offset` applies to
    'leading' only (diffusers semantics: linspace/trailing ignore it).

    diffusers has TWO spacing-convention FAMILIES for linspace AND leading:
    the DDPM/DDIM family (`ddim_conventions=True`) samples n points (linspace
    includes the endpoint; leading uses ratio N//n); the DPM-Solver/UniPC
    family samples n+1 points and drops the last (linspace over [0, N-1];
    leading uses ratio N//(n+1)). 'trailing' is identical in both."""
    if spacing == "linspace":
        if ddim_conventions:
            return np.linspace(0, num_train - 1, num_inference).round()[::-1].copy().astype(np.int64)
        return spaced_timesteps_linspace(num_train, num_inference)
    if spacing == "leading":
        if ddim_conventions:
            return spaced_timesteps_leading(num_train, num_inference) + int(steps_offset)
        ratio = num_train // (num_inference + 1)
        t = (np.arange(0, num_inference + 1) * ratio).round()[::-1][:-1].copy()
        return t.astype(np.int64) + int(steps_offset)
    if spacing == "trailing":
        return spaced_timesteps_trailing(num_train, num_inference)
    raise ValueError(
        f"Unknown timestep_spacing '{spacing}' (diffusers surface: "
        f"linspace, leading, trailing)")


def karras_sigmas(sigma_min: float, sigma_max: float, num_inference: int,
                  rho: float = 7.0) -> np.ndarray:
    """Karras et al. (2022) noise schedule (diffusers `_convert_to_karras`):
    rho-space ramp from sigma_max down to sigma_min, float64 host-side."""
    ramp = np.linspace(0, 1, num_inference)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


def sigma_to_t(sigmas: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Continuous timestep for each sigma by log-space interpolation into the
    training sigma table (diffusers `_sigma_to_t`), vectorized."""
    log_sigma = np.log(np.maximum(sigmas, 1e-10))  # (n,)
    dists = log_sigma[None, :] - log_sigmas[:, None]  # (N, n)
    low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(
        max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


def check_unimplemented_kwargs(name: str, extra: Dict[str, Any],
                               recognized: frozenset) -> None:
    """The reference passes any config key matching the diffusers ctor
    signature straight into diffusers, where it CHANGES NUMERICS
    (/root/reference/src/pipelines/utils.py:55-62). A key we recognize from
    that surface but have not implemented must therefore fail LOUDLY — a
    config carrying it would otherwise run and silently produce different
    samples. Keys diffusers itself would not accept are dropped with a
    warning (the reference's signature filter drops them silently)."""
    import logging

    for key in extra:
        if key in recognized:
            raise NotImplementedError(
                f"{name}: diffusers parameter '{key}' is recognized but not "
                f"implemented here; refusing to run with silently different "
                f"numerics. Drop the key or use an implemented knob.")
        logging.warning(
            "%s: ignoring unknown scheduler parameter '%s' (not part of the "
            "diffusers ctor surface; the reference would drop it silently)",
            name, key)


@dataclasses.dataclass(frozen=True)
class Scheduler:
    """Base scheduler; concrete schedulers are frozen dataclasses with numpy
    tables + config, and pure step functions."""

    num_train_timesteps: int = 1000

    # ---- API -----------------------------------------------------------
    @classmethod
    def create(cls, num_train_timesteps: int = 1000, **params) -> "Scheduler":
        raise NotImplementedError

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        raise NotImplementedError

    def init_state(self, timesteps: np.ndarray, sample: Optional[jax.Array] = None) -> Dict[str, Any]:
        """Fixed-size carried state for lax.scan; default: empty.

        ``sample`` is a shape/dtype template for multistep history buffers."""
        return {}

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        raise NotImplementedError

    def step(
        self,
        state: Dict[str, Any],
        model_output: jax.Array,
        index,
        sample: jax.Array,
        timesteps: jax.Array,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, Any], jax.Array]:
        raise NotImplementedError

    def scale_model_input(self, sample: jax.Array, index, timesteps) -> jax.Array:
        """Pre-model input scaling (diffusers API). Identity for the
        variance-preserving schedulers; sigma-space schedulers (DPMSolverSDE)
        divide by sqrt(sigma²+1)."""
        return sample

    # initial-noise magnitude (diffusers API): 1.0 for VP schedulers,
    # sigma_max for sigma-space schedulers (set during set_timesteps)
    init_noise_sigma: float = 1.0

    def align_sliced_timesteps(self, timesteps: np.ndarray) -> np.ndarray:
        """Hook for schedulers whose step tables have positional structure:
        given a (possibly start_step/last_n-sliced) suffix of the full
        schedule, return the nearest suffix the scheduler can start from.
        Identity for memoryless/VP schedulers; DPMSolverSDE trims a leading
        midpoint call so the scan never starts mid-ancestral-pair."""
        return timesteps

    def init_noise_scale(self, timesteps: np.ndarray) -> float:
        """Magnitude for pure-noise initialization given the *selected*
        timesteps. Defaults to the full-schedule ``init_noise_sigma``;
        sigma-space schedulers override to enter a sliced schedule at the
        first kept call's sigma rather than sigma_max."""
        return float(getattr(self, "init_noise_sigma", 1.0))

    # ---- helpers ---------------------------------------------------------
    @property
    def needs_noise(self) -> bool:
        """Whether step() draws random noise (DDPM ancestral / SDE variants)."""
        return False


def broadcast_to_sample(coeff: jax.Array, sample: jax.Array) -> jax.Array:
    """(B,) -> (B, 1, 1, ...) matching sample rank."""
    return coeff.reshape(coeff.shape + (1,) * (sample.ndim - coeff.ndim)).astype(sample.dtype)


def dynamic_threshold(x0: "jax.Array", ratio: float, max_value: float) -> "jax.Array":
    """Imagen-style dynamic thresholding, diffusers `_threshold_sample` exact
    (diffusers/schedulers/scheduling_dpmsolver_multistep.py): per-sample
    quantile s of |x0| at `ratio`, clamped to [1, max_value]; x0 is clipped
    to [-s, s] and rescaled by s. Stabilizes pixel-space models whose x0
    predictions drift out of range (the measured failure mode of the DPM
    family on undertrained flagship models, BENCHMARKS.md round-3 sweep).
    Computed in f32; shape-polymorphic over ND samples."""
    b = x0.shape[0]
    flat = jnp.abs(x0.astype(jnp.float32)).reshape(b, -1)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((b,) + (1,) * (x0.ndim - 1))
    return (jnp.clip(x0.astype(jnp.float32), -s, s) / s).astype(x0.dtype)
