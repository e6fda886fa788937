"""
UniPC multistep scheduler (predictor-corrector, orders 1-3, bh1/bh2),
matching diffusers.UniPCMultistepScheduler semantics for the reference's
"unipc" alias (/root/reference/src/pipelines/utils.py:81) and the wider
diffusers config surface: predict_x0, solver_type in {bh1, bh2},
lower_order_final, linspace spacing, final sigma zero.

Scan-form state: the last three converted model outputs, the pre-predictor
sample (for the corrector), the warmup counter, and the order the previous
predictor actually used (the corrector of step i runs at that order, exactly
as diffusers' ``self.this_order``) — all fixed-size, so UniPC compiles into
one ``lax.scan``. The diffusers R-matrix linear solves appear here as their
closed forms: the order-3 corrector is a 3x3 Cramer solve on scan scalars.
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
    karras_sigmas,
    make_beta_schedule,
    sigma_to_t,
    spaced_timesteps,
)

# diffusers.UniPCMultistepScheduler ctor params recognized but NOT implemented
# (see base.check_unimplemented_kwargs)
_UNIMPLEMENTED = frozenset({
    "trained_betas", "disable_corrector", "solver_p",
    "use_exponential_sigmas", "use_beta_sigmas", "use_flow_sigmas",
    "flow_shift", "rescale_betas_zero_snr",
})


def _solve2(r1, r2, b1, b2):
    """[[1,1],[r1,r2]] @ [x0,x1] = [b1,b2]."""
    den = r2 - r1
    den = jnp.where(den == 0, 1.0, den)
    return (b1 * r2 - b2) / den, (b2 - b1 * r1) / den


def _solve3(r1, r2, b1, b2, b3):
    """[[1,1,1],[r1,r2,1],[r1^2,r2^2,1]] @ x = [b1,b2,b3] via Cramer."""
    a11, a12, a13 = 1.0, 1.0, 1.0
    a21, a22, a23 = r1, r2, 1.0
    a31, a32, a33 = r1 * r1, r2 * r2, 1.0

    def det(m11, m12, m13, m21, m22, m23, m31, m32, m33):
        return (m11 * (m22 * m33 - m23 * m32)
                - m12 * (m21 * m33 - m23 * m31)
                + m13 * (m21 * m32 - m22 * m31))

    d = det(a11, a12, a13, a21, a22, a23, a31, a32, a33)
    d = jnp.where(d == 0, 1.0, d)
    x0 = det(b1, a12, a13, b2, a22, a23, b3, a32, a33) / d
    x1 = det(a11, b1, a13, a21, b2, a23, a31, b3, a33) / d
    x2 = det(a11, a12, b1, a21, a22, b2, a31, a32, b3) / d
    return x0, x1, x2


@dataclasses.dataclass(frozen=True)
class UniPCMultistepScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    solver_order: int = 2
    predict_x0: bool = True
    prediction_type: str = "epsilon"
    lower_order_final: bool = True
    solver_type: str = "bh2"
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    use_karras_sigmas: bool = False
    timestep_spacing: str = "linspace"
    steps_offset: int = 0
    final_sigmas_type: str = "zero"
    num_inference_steps: Optional[int] = None
    _karras_sigmas: Optional[np.ndarray] = None

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
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        use_karras_sigmas: bool = False,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        final_sigmas_type: str = "zero",
        **extra,
    ) -> "UniPCMultistepScheduler":
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        if solver_order not in (1, 2, 3):
            raise ValueError(
                f"UniPC solver_order must be 1, 2 or 3 (diffusers surface); got {solver_order}")
        if solver_type not in ("bh1", "bh2"):
            raise ValueError(f"UniPC solver_type must be 'bh1' or 'bh2'; got '{solver_type}'")
        if timestep_spacing not in ("linspace", "leading", "trailing"):
            raise ValueError(f"Unknown timestep_spacing '{timestep_spacing}'")
        if final_sigmas_type not in ("zero", "sigma_min"):
            raise ValueError(f"Unknown final_sigmas_type '{final_sigmas_type}'")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            solver_order=solver_order,
            predict_x0=predict_x0,
            prediction_type=prediction_type,
            lower_order_final=lower_order_final,
            solver_type=solver_type,
            clip_sample=clip_sample,
            clip_sample_range=clip_sample_range,
            thresholding=thresholding,
            dynamic_thresholding_ratio=dynamic_thresholding_ratio,
            sample_max_value=sample_max_value,
            use_karras_sigmas=use_karras_sigmas,
            timestep_spacing=timestep_spacing,
            steps_offset=steps_offset,
            final_sigmas_type=final_sigmas_type,
        )

    # -- shared sigma helpers (same convention as DPM-Solver) -----------------
    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        return jnp.sqrt(acp).reshape(shape) * x0 + jnp.sqrt(1 - acp).reshape(shape) * noise

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        object.__setattr__(self, "num_inference_steps", num_inference_steps)
        timesteps = spaced_timesteps(
            self.timestep_spacing, self.num_train_timesteps,
            num_inference_steps, self.steps_offset)
        if self.use_karras_sigmas:
            # same Karras remap as DPM-Solver multistep (see dpm.py):
            # full-table sigma extremes, not the selected schedule's
            acp = np.asarray(self.alphas_cumprod, np.float64)
            all_sigmas = np.sqrt((1.0 - acp) / acp)
            sigmas = karras_sigmas(float(all_sigmas[0]), float(all_sigmas[-1]),
                                   num_inference_steps)
            timesteps = sigma_to_t(sigmas, np.log(all_sigmas)).round().astype(np.int64)
            object.__setattr__(self, "_karras_sigmas", sigmas)
        else:
            object.__setattr__(self, "_karras_sigmas", None)
        return timesteps

    def init_state(self, timesteps: np.ndarray, sample: Optional[jax.Array] = None) -> Dict[str, Any]:
        if sample is None:
            raise ValueError("UniPCMultistepScheduler.init_state needs a sample template")
        z = jnp.zeros(sample.shape, jnp.float32)
        state = {
            "m_s0": z,
            "m_s1": z,
            "last_sample": z,
            "order_count": jnp.zeros((), jnp.int32),
            "prev_this_order": jnp.ones((), jnp.int32),
        }
        if self.solver_order >= 3:
            state["m_s2"] = z
        return state

    def _sigmas_for(self, timesteps: jax.Array) -> jax.Array:
        if self.use_karras_sigmas:
            if self._karras_sigmas is None:
                raise ValueError(
                    "use_karras_sigmas requires set_timesteps() before step()")
            n_passed = int(timesteps.shape[0])
            stored = np.asarray(self._karras_sigmas, np.float32)
            if n_passed > stored.shape[0]:
                raise ValueError("timesteps longer than the Karras schedule")
            # slicing keeps a schedule SUFFIX; align by trailing length
            sigmas = jnp.asarray(stored[stored.shape[0] - n_passed:], jnp.float32)
        else:
            acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
            sigmas = jnp.sqrt((1.0 - acp) / acp)
        if self.final_sigmas_type == "sigma_min":
            a0 = jnp.float32(self.alphas_cumprod[0])
            final = jnp.sqrt((1.0 - a0) / a0)[None]
        else:
            final = jnp.zeros((1,), jnp.float32)
        return jnp.concatenate([sigmas, final])

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
        if self.thresholding:
            from fmdm_tpu.schedulers.base import dynamic_threshold

            x0 = dynamic_threshold(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        elif self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return x0 if self.predict_x0 else eps

    def _b_coeffs(self, h):
        """(h_phi_1, B_h, b1, b2, b3) of the diffusers b-vector recursion."""
        hh = -h if self.predict_x0 else h
        h_phi_1 = jnp.expm1(hh)
        B_h = hh if self.solver_type == "bh1" else jnp.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1.0
        b1 = h_phi_k * 1.0 / B_h
        h_phi_k = h_phi_k / hh - 0.5
        b2 = h_phi_k * 2.0 / B_h
        h_phi_k = h_phi_k / hh - 1.0 / 6.0
        b3 = h_phi_k * 6.0 / B_h
        return h_phi_1, B_h, b1, b2, b3

    @staticmethod
    def _safe(v):
        return jnp.where(v == 0, 1.0, v)

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
        order = self.solver_order
        sigmas = self._sigmas_for(timesteps)
        sigma_s0 = sigmas[index]                       # current
        sigma_t = sigmas[index + 1]                    # next (target)
        sigma_sm1 = sigmas[jnp.maximum(index - 1, 0)]  # previous
        sigma_sm2 = sigmas[jnp.maximum(index - 2, 0)]
        sigma_sm3 = sigmas[jnp.maximum(index - 3, 0)]

        x32 = sample.astype(jnp.float32)
        m_t = self._convert(model_output.astype(jnp.float32), x32, sigma_s0)
        m_s0, m_s1 = state["m_s0"], state["m_s1"]
        m_s2 = state.get("m_s2", m_s1)
        last_sample = state["last_sample"]
        order_count = state["order_count"]
        prev_this_order = state["prev_this_order"]

        lam_t = self._lambda(sigma_t)
        lam_s0 = self._lambda(sigma_s0)
        lam_sm1 = self._lambda(sigma_sm1)
        lam_sm2 = self._lambda(sigma_sm2)
        lam_sm3 = self._lambda(sigma_sm3)

        alpha_s0, sigma_s0_ = self._alpha_sigma(sigma_s0)
        alpha_sm1, sigma_sm1_ = self._alpha_sigma(sigma_sm1)
        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)

        # ---- corrector: refine the arrived sample using m_t -----------------
        # (uni_c over the transition s_{-1} -> s_0, run at the order the
        # PREVIOUS predictor used — diffusers' self.this_order.)
        hc = lam_s0 - lam_sm1
        safe_hc = self._safe(hc)
        r1c = (lam_sm2 - lam_sm1) / safe_hc
        r2c = (lam_sm3 - lam_sm1) / safe_hc
        h_phi_1c, B_hc, b1c, b2c, b3c = self._b_coeffs(hc)
        D1_t = m_t - m_s0
        D1s0_c = (m_s1 - m_s0) / self._safe(r1c)
        D1s1_c = (m_s2 - m_s0) / self._safe(r2c)
        if self.predict_x0:
            xc_ = (sigma_s0_ / jnp.maximum(sigma_sm1_, 1e-10)) * last_sample \
                - alpha_s0 * h_phi_1c * m_s0
            coeff_c = alpha_s0 * B_hc
        else:
            xc_ = (alpha_s0 / alpha_sm1) * last_sample - sigma_s0_ * h_phi_1c * m_s0
            coeff_c = sigma_s0_ * B_hc
        corr1 = xc_ - coeff_c * (0.5 * D1_t)
        rho0c2, rho1c2 = _solve2(r1c, jnp.float32(1.0), b1c, b2c)
        corr2 = xc_ - coeff_c * (rho0c2 * D1s0_c + rho1c2 * D1_t)
        if order >= 3:
            rho0c3, rho1c3, rho2c3 = _solve3(r1c, r2c, b1c, b2c, b3c)
            corr3 = xc_ - coeff_c * (rho0c3 * D1s0_c + rho1c3 * D1s1_c + rho2c3 * D1_t)
            corrected = jnp.where(
                prev_this_order >= 3, corr3,
                jnp.where(prev_this_order >= 2, corr2, corr1))
        elif order == 2:
            corrected = jnp.where(prev_this_order >= 2, corr2, corr1)
        else:
            corrected = corr1
        x_cur = jnp.where(order_count > 0, corrected, x32)
        # m_t stays as converted from the PRE-corrector sample (diffusers
        # converts before running uni_c).

        # ---- predictor: advance s_0 -> t ------------------------------------
        this_order = jnp.minimum(order_count + 1, order)
        if self.lower_order_final:
            this_order = jnp.minimum(this_order, n - index)
        hp = lam_t - lam_s0
        safe_hp = self._safe(hp)
        r1p = (lam_sm1 - lam_s0) / safe_hp
        r2p = (lam_sm2 - lam_s0) / safe_hp
        h_phi_1p, B_hp, b1p, b2p, _b3p = self._b_coeffs(hp)
        D1s0_p = (m_s0 - m_t) / self._safe(r1p)
        D1s1_p = (m_s1 - m_t) / self._safe(r2p)
        if self.predict_x0:
            xp_ = (sigma_t_ / jnp.maximum(sigma_s0_, 1e-10)) * x_cur - alpha_t * h_phi_1p * m_t
            coeff_p = alpha_t * B_hp
        else:
            xp_ = (alpha_t / alpha_s0) * x_cur - sigma_t_ * h_phi_1p * m_t
            coeff_p = sigma_t_ * B_hp
        pred1 = xp_
        pred2 = xp_ - coeff_p * (0.5 * D1s0_p)  # diffusers hardcodes rhos_p=[0.5]
        if order >= 3:
            rho0p3, rho1p3 = _solve2(r1p, r2p, b1p, b2p)
            pred3 = xp_ - coeff_p * (rho0p3 * D1s0_p + rho1p3 * D1s1_p)
            prev_sample = jnp.where(
                this_order >= 3, pred3,
                jnp.where(this_order >= 2, pred2, pred1))
        elif order == 2:
            prev_sample = jnp.where(this_order >= 2, pred2, pred1)
        else:
            prev_sample = pred1

        new_state = {
            "m_s0": m_t,
            "m_s1": m_s0,
            "last_sample": x_cur,
            "order_count": jnp.minimum(order_count + 1, jnp.int32(order)),
            "prev_this_order": this_order.astype(jnp.int32),
        }
        if order >= 3:
            new_state["m_s2"] = m_s1
        return new_state, prev_sample.astype(sample.dtype)
