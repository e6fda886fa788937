"""
DPMSolverSDEScheduler: the stochastic second-order (midpoint) ancestral
solver of k-diffusion's ``sample_dpmpp_sde``, as packaged by diffusers'
``DPMSolverSDEScheduler`` — the class the reference binds to its ``dpm_sde``
registry entry (/root/reference/src/pipelines/utils.py:17,26,80).

Structure (diffusers scheduling_dpmsolver_sde.py semantics):

- ``set_timesteps(n)`` returns an INTERLEAVED float schedule of length 2n-1:
  main timesteps at even positions, log-sigma-space midpoints at odd
  positions. The model is evaluated at every entry, so a "step count" of n
  costs 2n-1 model calls — exactly like diffusers.
- Each main→main advance is an ancestral pair: the even call moves the
  sample to the midpoint sigma (storing the pair's start sample), the odd
  call completes the move from the *stored* start using the midpoint
  denoisement. Noise enters with the ancestral ``sigma_up`` magnitude.
- This is a k-diffusion sigma-space scheduler: samples live at scale
  ``x0 + sigma·eps``, so ``scale_model_input`` divides by sqrt(sigma²+1)
  and ``init_noise_sigma`` is sigma_max. The reference's sampling loop
  feeds unscaled samples (pipelines/utils.py:163-220 never calls
  scale_model_input and draws unscaled init noise — a latent defect that
  makes its dpm_sde output garbage at scale); our engine applies both,
  matching how diffusers pipelines drive this scheduler.

TPU form: every per-call scalar (sigma at evaluation, ancestral blend
coefficients, noise magnitude, first/second-order parity) is precomputed
host-side in float64 into flat tables indexed by the scan position, so the
whole reverse process stays one ``lax.scan`` with a single sample-shaped
carry buffer. Noise is counter-based JAX RNG — distribution-level
equivalence with diffusers' Brownian-tree sampler (cross-framework RNG
streams cannot match bitwise; the tree only matters for adaptive-step
solvers, which this fixed-schedule form is not).
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
    make_beta_schedule,
)

# diffusers.DPMSolverSDEScheduler ctor params recognized but NOT implemented.
# noise_sampler_seed is deliberately NOT here: it selects a noise stream, not
# an update rule — this stack's RNG discipline (explicit JAX keys) is
# documented as distribution-level equivalent, so the knob is accepted as a
# no-op below rather than rejected.
_UNIMPLEMENTED = frozenset({"trained_betas", "timestep_spacing", "steps_offset"})


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Fractional training timestep whose log-sigma interpolates to
    ``sigma`` (diffusers _sigma_to_t)."""
    log_sigma = np.log(np.asarray(sigma, np.float64))
    dists = log_sigma[..., None] - log_sigmas[None, :]
    low_idx = np.cumsum((dists >= 0), axis=-1).argmax(axis=-1).clip(max=log_sigmas.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


def _karras_sigmas(in_sigmas: np.ndarray, rho: float = 7.0) -> np.ndarray:
    sigma_min, sigma_max = in_sigmas[-1], in_sigmas[0]
    ramp = np.linspace(0, 1, len(in_sigmas))
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


@dataclasses.dataclass(frozen=True)
class DPMSolverSDEScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    prediction_type: str = "epsilon"
    use_karras_sigmas: bool = False
    s_noise: float = 1.0
    num_inference_steps: Optional[int] = None
    init_noise_sigma: float = 1.0

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        prediction_type: str = "epsilon",
        use_karras_sigmas: bool = False,
        s_noise: float = 1.0,
        noise_sampler_seed: Optional[int] = None,  # accepted no-op (see above)
        **extra,
    ) -> "DPMSolverSDEScheduler":
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            prediction_type=prediction_type,
            use_karras_sigmas=use_karras_sigmas,
            s_noise=s_noise,
        )

    # ---- schedule construction -----------------------------------------
    def _train_sigmas(self) -> np.ndarray:
        acp = np.asarray(self.alphas_cumprod, np.float64)
        return np.sqrt((1.0 - acp) / acp)

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        n = int(num_inference_steps)
        object.__setattr__(self, "num_inference_steps", n)
        sigmas_train = self._train_sigmas()
        log_sigmas = np.log(sigmas_train)

        # 'linspace' spacing over float training timesteps, sigma linearly
        # interpolated at each (diffusers DPMSolverSDE set_timesteps)
        timesteps_f = np.linspace(0, self.num_train_timesteps - 1, n, dtype=np.float64)[::-1].copy()
        sigmas = np.interp(timesteps_f, np.arange(self.num_train_timesteps), sigmas_train)
        if self.use_karras_sigmas:
            sigmas = _karras_sigmas(sigmas)
            timesteps_f = _sigma_to_t(sigmas, log_sigmas)

        # log-sigma-space midpoints of each consecutive main pair
        t_main = -np.log(sigmas)
        t_mid = t_main[:-1] + 0.5 * (t_main[1:] - t_main[:-1])
        sig_mid = np.exp(-t_mid)
        timesteps_mid = _sigma_to_t(sig_mid, log_sigmas)

        # interleave: [t0, m0, t1, m1, ..., t_{n-1}]  (length 2n-1)
        L = 2 * n - 1
        interleaved = np.empty((L,), np.float64)
        interleaved[0::2] = timesteps_f
        interleaved[1::2] = timesteps_mid

        # per-call tables, float64 host-side
        sigma_call = np.empty((L,), np.float64)   # sigma the model sees
        blend_a = np.zeros((L,), np.float64)      # prev = a·X + b·denoised + up·z
        blend_b = np.ones((L,), np.float64)
        noise_up = np.zeros((L,), np.float64)
        is_second = np.zeros((L,), bool)
        sigma_call[0::2] = sigmas
        sigma_call[1::2] = sig_mid
        is_second[1::2] = True

        def ancestral(frm, to):
            up = min(to, np.sqrt(to**2 * (frm**2 - to**2) / frm**2))
            down = np.sqrt(to**2 - up**2)
            a = down / frm
            b = -np.expm1(np.log(down) - np.log(frm))
            return a, b, up

        for m in range(n - 1):
            # even call 2m: ancestral move s_m -> midpoint
            a, b, up = ancestral(sigmas[m], sig_mid[m])
            blend_a[2 * m], blend_b[2 * m], noise_up[2 * m] = a, b, up
            # odd call 2m+1: stored start sample, full move s_m -> s_{m+1}
            a, b, up = ancestral(sigmas[m], sigmas[m + 1])
            blend_a[2 * m + 1], blend_b[2 * m + 1], noise_up[2 * m + 1] = a, b, up
        # final call (even, sigma_next = 0): Euler from s_{n-1} to 0 lands
        # exactly on the denoisement: prev = denoised (a=0, b=1, up=0 defaults)

        object.__setattr__(self, "_sigma_call", jnp.asarray(sigma_call, jnp.float32))
        object.__setattr__(self, "_blend_a", jnp.asarray(blend_a, jnp.float32))
        object.__setattr__(self, "_blend_b", jnp.asarray(blend_b, jnp.float32))
        object.__setattr__(self, "_noise_up", jnp.asarray(noise_up, jnp.float32))
        object.__setattr__(self, "_is_second", jnp.asarray(is_second))
        object.__setattr__(self, "_full_len", L)
        object.__setattr__(self, "init_noise_sigma", float(sigmas[0]))
        return interleaved.astype(np.float32)

    def _offset(self, timesteps) -> int:
        # tail slicing (start_step / last_n_steps keeps a suffix of the
        # descending schedule): scan index i maps to table index i + offset
        return self._full_len - int(np.asarray(timesteps).shape[0])

    def align_sliced_timesteps(self, timesteps: np.ndarray) -> np.ndarray:
        """The interleaved table alternates first-order (even table index,
        which stores the ancestral anchor) and second-order (odd, which READS
        it) calls. A sliced suffix with odd offset would start on a
        second-order call whose anchor was never stored — silently blending
        against zeros. Trim the leading midpoint entry so the scan always
        starts on a first-order call (the anchor-storing parity)."""
        timesteps = np.asarray(timesteps)
        if self._offset(timesteps) % 2 == 1 and timesteps.shape[0] > 1:
            timesteps = timesteps[1:]
        return timesteps

    def init_noise_scale(self, timesteps: np.ndarray) -> float:
        """Pure-noise entry into a sliced schedule happens at the first kept
        call's sigma, not the full-schedule sigma_max."""
        return float(np.asarray(self._sigma_call)[self._offset(timesteps)])

    # ---- engine API -----------------------------------------------------
    def init_state(self, timesteps: np.ndarray, sample: Optional[jax.Array] = None) -> Dict[str, Any]:
        if sample is None:
            raise ValueError("DPMSolverSDEScheduler.init_state needs a sample template")
        return {"stored": jnp.zeros(sample.shape, jnp.float32)}

    def scale_model_input(self, sample: jax.Array, i: jax.Array, timesteps) -> jax.Array:
        sigma = self._sigma_call[i + self._offset(timesteps)]
        return sample / jnp.sqrt(sigma**2 + 1.0)

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        sigmas_train = jnp.asarray(self._train_sigmas(), jnp.float32)
        sigma = sigmas_train[jnp.asarray(t, jnp.int32)]
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim))
        return x0 + sigma * noise

    def _denoised(self, model_output: jax.Array, sample: jax.Array, sigma: jax.Array) -> jax.Array:
        if self.prediction_type == "epsilon":
            return sample - sigma * model_output
        if self.prediction_type == "v_prediction":
            return model_output * (-sigma / jnp.sqrt(sigma**2 + 1.0)) + sample / (sigma**2 + 1.0)
        if self.prediction_type == "sample":
            return model_output
        raise ValueError(f"Unknown prediction_type '{self.prediction_type}'")

    def step(
        self,
        state: Dict[str, Any],
        model_output: jax.Array,
        i: jax.Array,
        sample: jax.Array,
        timesteps,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, Any], jax.Array]:
        j = i + self._offset(timesteps)
        sigma = self._sigma_call[j]
        denoised = self._denoised(model_output.astype(jnp.float32), sample.astype(jnp.float32), sigma)
        # first-order calls act on (and store) the incoming sample; second-
        # order calls act on the pair's stored start sample
        anchor = jnp.where(self._is_second[j], state["stored"], sample.astype(jnp.float32))
        z = jax.random.normal(rng, sample.shape, jnp.float32)
        prev = self._blend_a[j] * anchor + self._blend_b[j] * denoised \
            + (self.s_noise * self._noise_up[j]) * z
        return {"stored": anchor}, prev
