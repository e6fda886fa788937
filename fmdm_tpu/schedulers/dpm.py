"""
DPM-Solver multistep scheduler (orders 1/2/3, algorithm 'dpmsolver' and
'dpmsolver++'), matching diffusers.DPMSolverMultistepScheduler semantics for
the reference's CLI aliases dpmsolver1/dpmsolver2/dpmsolver++
(/root/reference/src/pipelines/utils.py:74-84) and the wider diffusers config
surface: linspace timestep spacing, midpoint solver, lower_order_final, final
sigma zero, epsilon prediction.

The multistep history is carried as fixed-size scan state (up to two previous
converted model outputs + validity counter), so 50-step DPM++ compiles to a
single lax.scan — the BASELINE.json north-star loop.
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

# diffusers.DPMSolverMultistepScheduler ctor params we recognize but have NOT
# implemented — create() refuses them loudly (reference semantics would pass
# them into diffusers and change numerics, pipelines/utils.py:55-62).
_UNIMPLEMENTED = frozenset({
    "trained_betas", "use_lu_lambdas", "use_exponential_sigmas",
    "use_beta_sigmas", "use_flow_sigmas", "flow_shift", "lambda_min_clipped",
    "variance_type", "rescale_betas_zero_snr",
})


@dataclasses.dataclass(frozen=True)
class DPMSolverMultistepScheduler(Scheduler):
    num_train_timesteps: int = 1000
    alphas_cumprod: np.ndarray = None
    solver_order: int = 2
    algorithm_type: str = "dpmsolver++"
    solver_type: str = "midpoint"
    prediction_type: str = "epsilon"
    lower_order_final: bool = True
    euler_at_final: bool = False
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    use_karras_sigmas: bool = False
    timestep_spacing: str = "linspace"
    steps_offset: int = 0
    # None -> diffusers-compatible auto: "zero" for the x0-space algorithms,
    # "sigma_min" for eps-space 'dpmsolver' (which rejects zero)
    final_sigmas_type: Optional[str] = None
    num_inference_steps: Optional[int] = None
    # stash filled by set_timesteps when use_karras_sigmas (per-step sigmas are
    # no longer a pure function of the integer timesteps)
    _karras_sigmas: Optional[np.ndarray] = None

    @classmethod
    def create(
        cls,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        solver_order: int = 2,
        algorithm_type: str = "dpmsolver++",
        solver_type: str = "midpoint",
        prediction_type: str = "epsilon",
        lower_order_final: bool = True,
        euler_at_final: bool = False,
        clip_sample: bool = False,
        clip_sample_range: float = 1.0,
        thresholding: bool = False,
        dynamic_thresholding_ratio: float = 0.995,
        sample_max_value: float = 1.0,
        use_karras_sigmas: bool = False,
        timestep_spacing: str = "linspace",
        steps_offset: int = 0,
        final_sigmas_type: Optional[str] = None,
        **extra,
    ) -> "DPMSolverMultistepScheduler":
        check_unimplemented_kwargs(cls.__name__, extra, _UNIMPLEMENTED)
        if solver_order not in (1, 2, 3):
            raise ValueError(
                f"solver_order must be 1, 2 or 3 (diffusers surface); got {solver_order}")
        if algorithm_type not in ("dpmsolver", "dpmsolver++", "sde-dpmsolver++"):
            raise ValueError(f"Unknown algorithm_type '{algorithm_type}'")
        if solver_type not in ("midpoint", "heun"):
            raise ValueError(
                f"solver_type must be 'midpoint' or 'heun' (diffusers surface); "
                f"got '{solver_type}'")
        if timestep_spacing not in ("linspace", "leading", "trailing"):
            raise ValueError(f"Unknown timestep_spacing '{timestep_spacing}'")
        if solver_order == 3 and algorithm_type == "sde-dpmsolver++":
            raise ValueError("sde-dpmsolver++ supports solver_order <= 2 (as in diffusers)")
        if thresholding and algorithm_type == "dpmsolver":
            # diffusers raises here too: thresholding operates on predicted x0,
            # which the eps-space 'dpmsolver' update never consumes — accepting
            # the flag would silently produce unthresholded samples.
            raise ValueError(
                "thresholding=True does not work with algorithm_type 'dpmsolver' "
                "(diffusers parity); use 'dpmsolver++'")
        if final_sigmas_type is not None:
            if final_sigmas_type not in ("zero", "sigma_min"):
                raise ValueError(f"Unknown final_sigmas_type '{final_sigmas_type}'")
            if final_sigmas_type == "zero" and algorithm_type == "dpmsolver":
                # diffusers: `final_sigmas_type zero is not supported for
                # algorithm_type dpmsolver` (lambda(0) is -inf in eps space)
                raise ValueError(
                    "final_sigmas_type='zero' is not supported with "
                    "algorithm_type 'dpmsolver' (diffusers parity)")
        betas = make_beta_schedule(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        return cls(
            num_train_timesteps=num_train_timesteps,
            alphas_cumprod=alphas_cumprod,
            solver_order=solver_order,
            algorithm_type=algorithm_type,
            solver_type=solver_type,
            prediction_type=prediction_type,
            lower_order_final=lower_order_final,
            euler_at_final=euler_at_final,
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

    @property
    def needs_noise(self) -> bool:
        return self.algorithm_type == "sde-dpmsolver++"

    # -- forward process ----------------------------------------------------
    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        shape = acp.shape + (1,) * (x0.ndim - acp.ndim)
        return jnp.sqrt(acp).reshape(shape) * x0 + jnp.sqrt(1 - acp).reshape(shape) * noise

    # -- reverse process -------------------------------------------------------
    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        object.__setattr__(self, "num_inference_steps", num_inference_steps)
        timesteps = spaced_timesteps(
            self.timestep_spacing, self.num_train_timesteps,
            num_inference_steps, self.steps_offset)
        if self.use_karras_sigmas:
            # diffusers: replace the table sigmas at the spaced timesteps by a
            # Karras rho-7 ramp between the FULL training table's extremes
            # (set_timesteps flips the whole sigma table into
            # _convert_to_karras, so sigma_min/max are sigma(t=0)/sigma(t=N-1),
            # NOT the selected schedule's extremes — unlike DPMSolverSDE, which
            # interpolates first), then map each Karras sigma back to a
            # (rounded) integer timestep for model conditioning. The continuous
            # sigmas are stashed — step() must use them, not the table values
            # at the rounded timesteps.
            acp = np.asarray(self.alphas_cumprod, np.float64)
            all_sigmas = np.sqrt((1.0 - acp) / acp)
            log_sigmas = np.log(all_sigmas)
            sigmas = karras_sigmas(float(all_sigmas[0]), float(all_sigmas[-1]),
                                   num_inference_steps)
            timesteps = sigma_to_t(sigmas, log_sigmas).round().astype(np.int64)
            object.__setattr__(self, "_karras_sigmas", sigmas)
        else:
            object.__setattr__(self, "_karras_sigmas", None)
        return timesteps

    def init_state(self, timesteps: np.ndarray, sample: Optional[jax.Array] = None) -> Dict[str, Any]:
        if sample is None:
            raise ValueError("DPMSolverMultistepScheduler.init_state needs a sample template")
        state = {
            "prev_m": jnp.zeros(sample.shape, jnp.float32),
            "order_count": jnp.zeros((), jnp.int32),
        }
        if self.solver_order >= 3:
            state["prev_m2"] = jnp.zeros(sample.shape, jnp.float32)
        return state

    def _final_sigmas_type_resolved(self) -> str:
        if self.final_sigmas_type is not None:
            return self.final_sigmas_type
        # diffusers default is "zero", but it rejects zero for the eps-space
        # 'dpmsolver' (0*inf); the reference's dpmsolver1/2 aliases therefore
        # run with sigma_min.
        return "sigma_min" if self.algorithm_type == "dpmsolver" else "zero"

    def _sigmas_for(self, timesteps: jax.Array) -> jax.Array:
        """Per-selected-timestep sigma + trailing final sigma.

        With use_karras_sigmas the per-step sigmas are the continuous Karras
        ramp stashed by set_timesteps (NOT the table values at the rounded
        timesteps); slicing (start_step/last_n_steps) keeps a SUFFIX of the
        schedule, so the stash is aligned by trailing length."""
        if self.use_karras_sigmas:
            if self._karras_sigmas is None:
                raise ValueError(
                    "use_karras_sigmas requires set_timesteps() before step()")
            n_passed = int(timesteps.shape[0])
            stored = np.asarray(self._karras_sigmas, np.float32)
            if n_passed > stored.shape[0]:
                raise ValueError("timesteps longer than the Karras schedule")
            sigmas = jnp.asarray(stored[stored.shape[0] - n_passed:], jnp.float32)
        else:
            acp = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[timesteps]
            sigmas = jnp.sqrt((1.0 - acp) / acp)
        if self._final_sigmas_type_resolved() == "sigma_min":
            a0 = jnp.float32(self.alphas_cumprod[0])
            final = jnp.sqrt((1.0 - a0) / a0)[None]
        else:
            final = jnp.zeros((1,), jnp.float32)
        return jnp.concatenate([sigmas, final])

    @staticmethod
    def _alpha_sigma(sigma: jax.Array) -> Tuple[jax.Array, jax.Array]:
        alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
        return alpha_t, sigma * alpha_t

    def _convert_model_output(self, model_output, sample, sigma):
        """epsilon/sample/v -> x0 (dpmsolver++) or eps (dpmsolver)."""
        alpha_t, sigma_t = self._alpha_sigma(sigma)
        if self.prediction_type == "epsilon":
            x0 = (sample - sigma_t * model_output) / alpha_t
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - alpha_t * x0) / sigma_t
        elif self.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
            eps = alpha_t * model_output + sigma_t * sample
        else:
            raise ValueError(f"Unknown prediction_type '{self.prediction_type}'")
        if self.thresholding:
            # diffusers-parity dynamic thresholding (applies to the x0-space
            # algorithms only, as in diffusers)
            from fmdm_tpu.schedulers.base import dynamic_threshold

            x0 = dynamic_threshold(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        elif self.clip_sample:
            # optional x0 stabilizer (off by default; diffusers' DPM solvers
            # don't clip — DDIM's clip_sample is why it is far more robust on
            # imperfect models, see BENCHMARKS.md sampler comparison)
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        return eps if self.algorithm_type == "dpmsolver" else x0

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
        # Guard the trailing sigma=0: lambda would be -inf; clamp like diffusers'
        # final_sigmas_type="zero" (h stays finite through where-masking below).
        sigma_s0 = sigmas[index]
        sigma_t = sigmas[index + 1]
        sigma_s1 = sigmas[jnp.maximum(index - 1, 0)]

        x32 = sample.astype(jnp.float32)
        m0 = self._convert_model_output(model_output.astype(jnp.float32), x32, sigma_s0)

        prev_m = state["prev_m"]
        order_count = state["order_count"]

        alpha_t, sigma_t_ = self._alpha_sigma(sigma_t)
        alpha_s0, sigma_s0_ = self._alpha_sigma(sigma_s0)
        alpha_s1, sigma_s1_ = self._alpha_sigma(sigma_s1)
        # lambda = log(alpha) - log(sigma); guard sigma_t == 0 at final step
        safe = lambda s: jnp.maximum(s, 1e-10)
        lam_t = jnp.log(alpha_t) - jnp.log(safe(sigma_t_))
        lam_s0 = jnp.log(alpha_s0) - jnp.log(safe(sigma_s0_))
        lam_s1 = jnp.log(alpha_s1) - jnp.log(safe(sigma_s1_))
        h = lam_t - lam_s0
        h_0 = lam_s0 - lam_s1
        r0 = h_0 / jnp.where(h == 0, 1.0, h)

        D0 = m0
        D1 = (m0 - prev_m) / jnp.where(r0 == 0, 1.0, r0)

        heun = self.solver_type == "heun"
        safe_h2 = jnp.where(h == 0, 1.0, h)
        if self.algorithm_type == "dpmsolver++":
            # x_t = (sigma_t/sigma_s0) x - alpha_t (e^{-h} - 1) D0
            #   midpoint: - 0.5 alpha_t (e^{-h}-1) D1
            #   heun:     + alpha_t ((e^{-h}-1)/h + 1) D1
            ratio = sigma_t_ / safe(sigma_s0_)
            phi = jnp.expm1(-h)
            first = ratio * x32 - alpha_t * phi * D0
            if heun:
                second = first + alpha_t * (phi / safe_h2 + 1.0) * D1
            else:
                second = first - 0.5 * alpha_t * phi * D1
        elif self.algorithm_type == "sde-dpmsolver++":
            # Stochastic DPM-Solver++, one model eval per step:
            # x_t = (σ_t/σ_s0) e^{-h} x + α_t(1-e^{-2h}) D0 + σ_t √(1-e^{-2h}) ξ
            #   midpoint: + 0.5 α_t(1-e^{-2h}) D1
            #   heun:     + α_t((1-e^{-2h})/(-2h) + 1) D1
            if rng is None:
                raise ValueError("sde-dpmsolver++ requires an rng key.")
            ratio = (sigma_t_ / safe(sigma_s0_)) * jnp.exp(-h)
            phi = -jnp.expm1(-2.0 * h)  # 1 - e^{-2h}
            noise = jax.random.normal(rng, sample.shape, jnp.float32)
            base = ratio * x32 + sigma_t_ * jnp.sqrt(jnp.clip(phi, 0.0, None)) * noise
            first = base + alpha_t * phi * D0
            if heun:
                second = first + alpha_t * (phi / (-2.0 * safe_h2) + 1.0) * D1
            else:
                second = first + 0.5 * alpha_t * phi * D1
        else:
            # dpmsolver (eps space): x_t = (alpha_t/alpha_s0) x - sigma_t (e^{h} - 1) D0
            #   midpoint: - 0.5 sigma_t (e^{h}-1) D1
            #   heun:     - sigma_t ((e^{h}-1)/h - 1) D1
            ratio = alpha_t / alpha_s0
            phi = jnp.expm1(h)
            first = ratio * x32 - sigma_t_ * phi * D0
            if heun:
                second = first - sigma_t_ * (phi / safe_h2 - 1.0) * D1
            else:
                second = first - 0.5 * sigma_t_ * phi * D1

        use_first = order_count < 1
        lower_order_second = jnp.bool_(False)
        if self.solver_order == 1:
            use_first = jnp.bool_(True)
        else:
            # diffusers forces a first-order FINAL step when any of:
            #   euler_at_final, lower_order_final and n < 15,
            #   final_sigmas_type == "zero" (the default for every ++ variant).
            # The zero-final-sigma term is essential: at sigma_t = 0 the clamped
            # lambda makes h ~ 23 - lam_s0, so r0 = h_0/h collapses and
            # D1 = (m0 - m1)/r0 explodes ~h/h_0× — a second-order final step
            # wrecks the sample (the round-1 DPM++ quality-gap bug).
            final_sigma_zero = self._final_sigmas_type_resolved() == "zero"
            if (self.euler_at_final or final_sigma_zero
                    or (self.lower_order_final and n < 15)):
                use_first = jnp.logical_or(use_first, index == n - 1)
            if self.lower_order_final and n < 15:
                lower_order_second = index == n - 2

        if self.solver_order < 3:
            prev_sample = jnp.where(use_first, first, second)
        else:
            # third order (diffusers multistep_dpm_solver_third_order_update):
            # one extra history slot; selection mirrors diffusers'
            # order==2-or-warmup-or-tail branch exactly.
            prev_m2 = state["prev_m2"]
            sigma_s2 = sigmas[jnp.maximum(index - 2, 0)]
            alpha_s2, sigma_s2_ = self._alpha_sigma(sigma_s2)
            lam_s2 = jnp.log(alpha_s2) - jnp.log(safe(sigma_s2_))
            h_1 = lam_s1 - lam_s2
            r1 = h_1 / jnp.where(h == 0, 1.0, h)
            safe_r = lambda r: jnp.where(r == 0, 1.0, r)
            D1_0 = (m0 - prev_m) / safe_r(r0)
            D1_1 = (prev_m - prev_m2) / safe_r(r1)
            rsum = safe_r(r0 + r1)
            D1c = D1_0 + (r0 / rsum) * (D1_0 - D1_1)
            D2 = (D1_0 - D1_1) / rsum
            safe_h = jnp.where(h == 0, 1.0, h)
            if self.algorithm_type == "dpmsolver++":
                phi = jnp.expm1(-h)
                third = (
                    (sigma_t_ / safe(sigma_s0_)) * x32
                    - alpha_t * phi * D0
                    + alpha_t * (phi / safe_h + 1.0) * D1c
                    - alpha_t * ((phi + h) / safe_h**2 - 0.5) * D2
                )
            else:  # dpmsolver (eps space)
                phi = jnp.expm1(h)
                third = (
                    (alpha_t / alpha_s0) * x32
                    - sigma_t_ * phi * D0
                    - sigma_t_ * (phi / safe_h - 1.0) * D1c
                    - sigma_t_ * ((phi - h) / safe_h**2 - 0.5) * D2
                )
            use_second = jnp.logical_or(order_count < 2, lower_order_second)
            prev_sample = jnp.where(
                use_first, first, jnp.where(use_second, second, third))

        new_state = {
            "prev_m": m0,
            "order_count": jnp.minimum(order_count + 1, self.solver_order),
        }
        if self.solver_order >= 3:
            new_state["prev_m2"] = state["prev_m"]
        return new_state, prev_sample.astype(sample.dtype)
