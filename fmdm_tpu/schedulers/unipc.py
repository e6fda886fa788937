"""
UniPC multistep scheduler (predictor-corrector, order <= 2, bh2 variant),
matching diffusers.UniPCMultistepScheduler defaults used by the reference's
"unipc" alias (/root/reference/src/pipelines/utils.py:81): predict_x0=True,
solver_type="bh2", lower_order_final=True, linspace spacing, final sigma zero.

Scan-form state: converted model output at the previous step (m_s0), at the
step before that (m_s1), the pre-predictor sample (for the corrector), and an
order ramp counter — all fixed-size, so UniPC compiles into one lax.scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.schedulers.base import (
    Scheduler,
    make_beta_schedule,
    spaced_timesteps_linspace,
)


@dataclasses.dataclass(frozen=True)
class UniPCMultistepScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    solver_order: int = 2
    predict_x0: bool = True
    prediction_type: str = "epsilon"
    lower_order_final: bool = True
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    num_inference_steps: Optional[int] = None

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        solver_order: int = 2,
        predict_x0: bool = True,
        prediction_type: str = "epsilon",
        lower_order_final: bool = True,
        solver_type: str = "bh2",
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
        **_unused,
    ) -> "UniPCMultistepScheduler":
        if solver_order not in (1, 2):
            raise NotImplementedError("UniPC implemented for solver_order <= 2")
        if solver_type != "bh2":
            raise NotImplementedError("UniPC implemented for solver_type='bh2' (diffusers default)")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            solver_order=solver_order,
            predict_x0=predict_x0,
            prediction_type=prediction_type,
            lower_order_final=lower_order_final,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
        )

    # -- shared sigma helpers (same convention as DPM-Solver) -----------------
    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        return jnp.sqrt(acp).reshape(shape) * x0 + jnp.sqrt(1 - acp).reshape(shape) * noise

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        object.__setattr__(self, "num_inference_steps", num_inference_steps)
        return spaced_timesteps_linspace(self.num_train_timesteps, num_inference_steps)

    def init_state(self, timesteps: np.ndarray, sample: Optional[jax.Array] = None) -> Dict[str, Any]:
        if sample is None:
            raise ValueError("UniPCMultistepScheduler.init_state needs a sample template")
        z = jnp.zeros(sample.shape, jnp.float32)
        return {
            "m_s0": z,
            "m_s1": z,
            "last_sample": z,
            "order_count": jnp.zeros((), jnp.int32),
        }

    def _sigmas_for(self, timesteps: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
        sigmas = jnp.sqrt((1.0 - acp) / acp)
        return jnp.concatenate([sigmas, jnp.zeros((1,), jnp.float32)])

    @staticmethod
    def _alpha_sigma(sigma):
        alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        return alpha_t, sigma * alpha_t

    def _lambda(self, sigma):
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        return jnp.log(alpha_t) - jnp.log(jnp.maximum(sigma_t, 1e-10))

    def _convert(self, model_output, sample, sigma):
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        if self.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
            eps = model_output
        elif self.prediction_type == "sample":
            x0, eps = model_output, (sample - alpha_t * model_output) / sigma_t
        elif self.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
            eps = alpha_t * model_output + sigma_t * sample
        else:
            raise ValueError(f"Unknown prediction_type '{self.prediction_type}'")
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0 if self.predict_x0 else eps

    def _bh2_coeffs(self, h, r0):
        """b vector of the bh2 variant for order 2 and the order-2 corrector
        solution rhos_c = solve([[1,1],[r0,1]], b)."""
        hh = -h if self.predict_x0 else h
        h_phi_1 = jnp.expm1(hh)
        B_h = jnp.expm1(hh)  # bh2
        h_phi_k1 = h_phi_1 / hh - 1.0           # phi_2 * 1!
        b1 = h_phi_k1 * 1.0 / B_h
        h_phi_k2 = h_phi_k1 / hh - 0.5           # phi_3 * 2!
        b2 = h_phi_k2 * 2.0 / B_h
        denom = jnp.where(r0 == 1.0, 1.0, 1.0 - r0)
        rho0 = (b1 - b2) / denom
        rho1 = b1 - rho0
        return h_phi_1, B_h, b1, (rho0, rho1)

    def step(
        self,
        state: Dict[str, Any],
        model_output: jax.Array,
        index,
        sample: jax.Array,
        timesteps: jax.Array,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Dict[str, Any], jax.Array]:
        n = timesteps.shape[0]
        sigmas = self._sigmas_for(timesteps)
        sigma_s0 = sigmas[index]                       # current
        sigma_t = sigmas[index + 1]                    # next (target)
        sigma_sm1 = sigmas[jnp.maximum(index - 1, 0)]  # previous
        sigma_sm2 = sigmas[jnp.maximum(index - 2, 0)]  # before previous

        x32 = sample.astype(jnp.float32)
        m_t = self._convert(model_output.astype(jnp.float32), x32, sigma_s0)
        m_s0, m_s1 = state["m_s0"], state["m_s1"]
        last_sample = state["last_sample"]
        order_count = state["order_count"]

        lam_t = self._lambda(sigma_t)
        lam_s0 = self._lambda(sigma_s0)
        lam_sm1 = self._lambda(sigma_sm1)
        lam_sm2 = self._lambda(sigma_sm2)

        # ---- corrector: refine the current sample using m_t ----------------
        # (uni_c over the transition s_{-1} -> s_0; diffusers applies it before
        # storing m_t and running the predictor.)
        hc = lam_s0 - lam_sm1
        r0c = jnp.where(hc == 0, 1.0, (lam_sm2 - lam_sm1) / jnp.where(hc == 0, 1.0, hc))
        h_phi_1c, B_hc, b1c, (rho0c, rho1c) = self._bh2_coeffs(hc, r0c)
        alpha_s0, sigma_s0_ = self._alpha_sigma(sigma_s0)
        alpha_sm1, sigma_sm1_ = self._alpha_sigma(sigma_sm1)
        if self.predict_x0:
            xc_ = (sigma_s0_ / jnp.maximum(sigma_sm1_, 1e-10)) * last_sample - alpha_s0 * h_phi_1c * m_s0
            D1s_c = (m_s1 - m_s0) / jnp.where(r0c == 0, 1.0, r0c)
            D1_t = m_t - m_s0
            # order-1 corrector uses rho_c = 0.5; order-2 solves the 2x2 system
            corr2 = xc_ - alpha_s0 * B_hc * (rho0c * D1s_c + rho1c * D1_t)
            corr1 = xc_ - alpha_s0 * B_hc * (0.5 * D1_t)
        else:
            xc_ = (alpha_s0 / alpha_sm1) * last_sample - sigma_s0_ * h_phi_1c * m_s0
            D1s_c = (m_s1 - m_s0) / jnp.where(r0c == 0, 1.0, r0c)
            D1_t = m_t - m_s0
            corr2 = xc_ - sigma_s0_ * B_hc * (rho0c * D1s_c + rho1c * D1_t)
            corr1 = xc_ - sigma_s0_ * B_hc * (0.5 * D1_t)
        corr_order = jnp.minimum(order_count, self.solver_order)
        corrected = jnp.where(corr_order >= 2, corr2, corr1)
        x_cur = jnp.where(order_count > 0, corrected, x32)
        # m_t must be re-derived from the corrected sample? diffusers converts
        # from the *pre-corrector* sample, so keep m_t as computed above.

        # ---- predictor: advance s_0 -> t -----------------------------------
        this_order = jnp.minimum(order_count + 1, self.solver_order)
        if self.lower_order_final:
            this_order = jnp.minimum(this_order, n - index)
        hp = lam_t - lam_s0
        r0p = jnp.where(hp == 0, 1.0, (lam_sm1 - lam_s0) / jnp.where(hp == 0, 1.0, hp))
        h_phi_1p, B_hp, b1p, _ = self._bh2_coeffs(hp, r0p)
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        if self.predict_x0:
            xp_ = (sigma_t_ / jnp.maximum(sigma_s0_, 1e-10)) * x_cur - alpha_t * h_phi_1p * m_t
            D1s_p = (m_s0 - m_t) / jnp.where(r0p == 0, 1.0, r0p)
            pred2 = xp_ - alpha_t * B_hp * (0.5 * D1s_p)  # rhos_p = [0.5] for order 2
            pred1 = xp_
        else:
            xp_ = (alpha_t / alpha_s0) * x_cur - sigma_t_ * h_phi_1p * m_t
            D1s_p = (m_s0 - m_t) / jnp.where(r0p == 0, 1.0, r0p)
            pred2 = xp_ - sigma_t_ * B_hp * (0.5 * D1s_p)
            pred1 = xp_
        prev_sample = jnp.where(this_order >= 2, pred2, pred1)

        new_state = {
            "m_s0": m_t,
            "m_s1": m_s0,
            "last_sample": x_cur,
            "order_count": jnp.minimum(order_count + 1, jnp.int32(self.solver_order)),
        }
        return new_state, prev_sample.astype(sample.dtype)
