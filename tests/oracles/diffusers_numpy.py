"""Independent numpy re-derivations of the diffusers scheduler algorithms.

Test-only oracles. diffusers itself is not installable in this image, so these
classes re-state the published update rules of the scheduler classes the
reference instantiates (/root/reference/src/pipelines/utils.py:22-90) in plain
sequential numpy — mutable step_index, model-output history lists, float64
math, `np.linalg.solve` for the UniPC systems — i.e. a deliberately different
*expression* of the math than fmdm_tpu's fixed-state scan-form steppers.
A step-for-step trajectory match between the two implementations is the
strongest parity evidence obtainable without network egress: a sign or
coefficient error would have to be introduced identically in two independent
derivations to survive.

Algorithms restated here (with the diffusers defaults the reference relies on):
  - DDPMScheduler          (leading spacing, fixed_small variance, x0 clip)
  - DDIMScheduler          (leading spacing, eta, set_alpha_to_one,
                            use_clipped_model_output semantics)
  - DPMSolverMultistepScheduler
                           (linspace spacing, orders 1/2, midpoint solver,
                            algorithm dpmsolver / dpmsolver++ / sde-dpmsolver++,
                            lower_order_final, final sigma zero for x0-space
                            algorithms and sigma_min for eps-space)
  - UniPCMultistepScheduler (bh2, predictor-corrector, lower_order_final)
  - FlowMatchEulerDiscreteScheduler (linspace in sigma space, final sigma 0)
"""

from __future__ import annotations

import numpy as np


def _betas(schedule: str, n: int, start: float, end: float) -> np.ndarray:
    if schedule == "linear":
        return np.linspace(start, end, n, dtype=np.float64)
    if schedule == "scaled_linear":
        return np.linspace(start**0.5, end**0.5, n, dtype=np.float64) ** 2
    if schedule == "squaredcos_cap_v2":
        f = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        i = np.arange(n, dtype=np.float64)
        return np.minimum(1.0 - f((i + 1) / n) / f(i / n), 0.999)
    raise ValueError(schedule)


def _spaced_timesteps(spacing, N, n, steps_offset=0, linspace_endpoint=True):
    # diffusers timestep_spacing dispatch (leading default for DDPM/DDIM).
    # linspace_endpoint=True is the DDPM/DDIM n-point convention for BOTH
    # linspace and leading; DPM-Solver/UniPC use the n+1-points-drop-last
    # convention for both.
    if spacing == "linspace":
        if not linspace_endpoint:
            return np.linspace(0, N - 1, n + 1).round()[::-1][:-1].copy().astype(np.int64)
        return np.linspace(0, N - 1, n).round()[::-1].copy().astype(np.int64)
    if spacing == "leading":
        if not linspace_endpoint:
            ratio = N // (n + 1)
            return (np.arange(n + 1) * ratio).round()[::-1][:-1].astype(np.int64) + steps_offset
        ratio = N // n
        return (np.arange(n) * ratio).round()[::-1].astype(np.int64) + steps_offset
    if spacing == "trailing":
        return np.arange(N, 0, -N / n).round().astype(np.int64) - 1
    raise ValueError(spacing)


class NpDDPM:
    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear", clip_sample=True, clip_sample_range=1.0,
                 variance_type="fixed_small", prediction_type="epsilon",
                 thresholding=False, dynamic_thresholding_ratio=0.995,
                 sample_max_value=1.0, timestep_spacing="leading", steps_offset=0):
        self.N = num_train_timesteps
        self.acp = np.cumprod(1.0 - _betas(beta_schedule, num_train_timesteps, beta_start, beta_end))
        self.clip_sample = clip_sample
        self.clip_range = clip_sample_range
        self.variance_type = variance_type
        self.prediction_type = prediction_type
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset

    def set_timesteps(self, n):
        self.n = n
        self.timesteps = _spaced_timesteps(self.timestep_spacing, self.N, n,
                                           self.steps_offset)
        return self.timesteps

    def add_noise(self, x0, noise, t):
        a = self.acp[np.asarray(t)].reshape((-1,) + (1,) * (x0.ndim - 1))
        return np.sqrt(a) * x0 + np.sqrt(1 - a) * noise

    def step(self, model_output, t, sample, noise):
        t = int(t)
        prev_t = t - self.N // self.n
        a_t = self.acp[t]
        a_prev = self.acp[prev_t] if prev_t >= 0 else 1.0
        b_t, b_prev = 1.0 - a_t, 1.0 - a_prev
        cur_alpha = a_t / a_prev
        cur_beta = 1.0 - cur_alpha

        if self.prediction_type == "epsilon":
            x0 = (sample - b_t**0.5 * model_output) / a_t**0.5
        elif self.prediction_type == "sample":
            x0 = model_output
        elif self.prediction_type == "v_prediction":
            x0 = a_t**0.5 * sample - b_t**0.5 * model_output
        else:
            raise ValueError(self.prediction_type)
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        elif self.clip_sample:
            x0 = np.clip(x0, -self.clip_range, self.clip_range)

        prev = (a_prev**0.5 * cur_beta / b_t) * x0 + (cur_alpha**0.5 * b_prev / b_t) * sample
        if t > 0:
            if self.variance_type == "fixed_small":
                var = max(b_prev / b_t * cur_beta, 1e-20)
            elif self.variance_type == "fixed_large":
                var = max(cur_beta, 1e-20)
            else:
                raise ValueError(self.variance_type)
            prev = prev + var**0.5 * noise
        return prev


class NpDDIM:
    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear", clip_sample=True, clip_sample_range=1.0,
                 set_alpha_to_one=True, prediction_type="epsilon", eta=0.0,
                 use_clipped_model_output=False, thresholding=False,
                 dynamic_thresholding_ratio=0.995, sample_max_value=1.0,
                 timestep_spacing="leading", steps_offset=0):
        self.N = num_train_timesteps
        self.acp = np.cumprod(1.0 - _betas(beta_schedule, num_train_timesteps, beta_start, beta_end))
        self.final_acp = 1.0 if set_alpha_to_one else float(self.acp[0])
        self.clip_sample = clip_sample
        self.clip_range = clip_sample_range
        self.prediction_type = prediction_type
        self.eta = eta
        self.use_clipped_model_output = use_clipped_model_output
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset

    def set_timesteps(self, n):
        self.n = n
        self.timesteps = _spaced_timesteps(self.timestep_spacing, self.N, n,
                                           self.steps_offset)
        return self.timesteps

    def add_noise(self, x0, noise, t):
        a = self.acp[np.asarray(t)].reshape((-1,) + (1,) * (x0.ndim - 1))
        return np.sqrt(a) * x0 + np.sqrt(1 - a) * noise

    def step(self, model_output, t, sample, noise=None):
        t = int(t)
        prev_t = t - self.N // self.n
        a_t = self.acp[t]
        a_prev = self.acp[prev_t] if prev_t >= 0 else self.final_acp
        b_t = 1.0 - a_t

        if self.prediction_type == "epsilon":
            x0 = (sample - b_t**0.5 * model_output) / a_t**0.5
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - a_t**0.5 * x0) / b_t**0.5
        elif self.prediction_type == "v_prediction":
            x0 = a_t**0.5 * sample - b_t**0.5 * model_output
            eps = a_t**0.5 * model_output + b_t**0.5 * sample
        else:
            raise ValueError(self.prediction_type)
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        elif self.clip_sample:
            x0 = np.clip(x0, -self.clip_range, self.clip_range)

        var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
        std = self.eta * var**0.5
        if self.use_clipped_model_output:
            eps = (sample - a_t**0.5 * x0) / b_t**0.5
        prev = a_prev**0.5 * x0 + max(1 - a_prev - std**2, 0.0) ** 0.5 * eps
        if self.eta > 0:
            prev = prev + std * noise
        return prev


def _sigma_to_alpha_sigma_t(sigma):
    alpha_t = 1.0 / np.sqrt(sigma**2 + 1.0)
    return alpha_t, sigma * alpha_t


def _linspace_timesteps(num_train, n):
    return np.linspace(0, num_train - 1, n + 1).round()[::-1][:-1].copy().astype(np.int64)


def _threshold_sample(x0, ratio, max_value):
    # diffusers _threshold_sample (Imagen dynamic thresholding), float64
    b = x0.shape[0]
    flat = np.abs(x0).reshape(b, -1)
    s = np.quantile(flat, ratio, axis=1)
    s = np.clip(s, 1.0, max_value).reshape((b,) + (1,) * (x0.ndim - 1))
    return np.clip(x0, -s, s) / s


def _karras_ramp(sigma_min, sigma_max, n, rho=7.0):
    # diffusers _convert_to_karras, float64
    ramp = np.linspace(0, 1, n)
    min_inv_rho = sigma_min ** (1 / rho)
    max_inv_rho = sigma_max ** (1 / rho)
    return (max_inv_rho + ramp * (min_inv_rho - max_inv_rho)) ** rho


def _np_sigma_to_t(sigma, log_sigmas):
    # diffusers _sigma_to_t (scalar), float64
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma - log_sigmas[:, None] if np.ndim(sigma) else log_sigma - log_sigmas
    if np.ndim(sigma):
        low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(
            max=log_sigmas.shape[0] - 2)
    else:
        low_idx = int(np.cumsum((dists >= 0)).argmax().clip(max=log_sigmas.shape[0] - 2))
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


class NpDPMSolverMultistep:
    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear", solver_order=2, algorithm_type="dpmsolver++",
                 solver_type="midpoint", prediction_type="epsilon",
                 lower_order_final=True, euler_at_final=False,
                 thresholding=False, dynamic_thresholding_ratio=0.995,
                 sample_max_value=1.0, use_karras_sigmas=False,
                 timestep_spacing="linspace", steps_offset=0):
        self.N = num_train_timesteps
        self.acp = np.cumprod(1.0 - _betas(beta_schedule, num_train_timesteps, beta_start, beta_end))
        self.solver_order = solver_order
        self.algorithm_type = algorithm_type
        self.solver_type = solver_type
        self.prediction_type = prediction_type
        self.lower_order_final = lower_order_final
        self.euler_at_final = euler_at_final
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.use_karras_sigmas = use_karras_sigmas
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        # diffusers rejects final_sigmas_type="zero" for eps-space dpmsolver;
        # the reference's dpmsolver1/2 aliases therefore run with sigma_min.
        self.final_sigmas_type = "sigma_min" if algorithm_type == "dpmsolver" else "zero"

    def set_timesteps(self, n):
        self.timesteps = _spaced_timesteps(self.timestep_spacing, self.N, n,
                                           self.steps_offset,
                                           linspace_endpoint=False)
        all_sigmas = ((1 - self.acp) / self.acp) ** 0.5
        sigmas = all_sigmas[self.timesteps]
        if self.use_karras_sigmas:
            # diffusers: Karras rho-7 ramp between the FULL table's extremes
            # (the whole flipped sigma table goes into _convert_to_karras);
            # timesteps re-derived by log-sigma interpolation
            sigmas = _karras_ramp(float(all_sigmas[0]), float(all_sigmas[-1]), n)
            log_sigmas = np.log(all_sigmas)
            self.timesteps = np.array(
                [_np_sigma_to_t(s, log_sigmas) for s in sigmas]).round().astype(np.int64)
        last = all_sigmas[0] if self.final_sigmas_type == "sigma_min" else 0.0
        self.sigmas = np.concatenate([sigmas, [last]])
        self.model_outputs = [None] * self.solver_order
        self.lower_order_nums = 0
        self.step_index = 0
        return self.timesteps

    def add_noise(self, x0, noise, t):
        a = self.acp[np.asarray(t)].reshape((-1,) + (1,) * (x0.ndim - 1))
        return np.sqrt(a) * x0 + np.sqrt(1 - a) * noise

    def _convert(self, model_output, sample):
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma)
        if self.prediction_type == "epsilon":
            x0, eps = (sample - sigma_t * model_output) / alpha_t, model_output
        elif self.prediction_type == "sample":
            x0, eps = model_output, (sample - alpha_t * model_output) / sigma_t
        elif self.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
            eps = alpha_t * model_output + sigma_t * sample
        else:
            raise ValueError(self.prediction_type)
        if self.thresholding:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        return eps if self.algorithm_type == "dpmsolver" else x0

    def _first_order(self, m0, sample, noise):
        with np.errstate(divide="ignore"):
            sigma_t, sigma_s = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
            alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma_t)
            alpha_s, sigma_s = _sigma_to_alpha_sigma_t(sigma_s)
            lam_t = np.log(alpha_t) - np.log(sigma_t)
            lam_s = np.log(alpha_s) - np.log(sigma_s)
            h = lam_t - lam_s
            if self.algorithm_type == "dpmsolver++":
                return (sigma_t / sigma_s) * sample - alpha_t * np.expm1(-h) * m0
            if self.algorithm_type == "dpmsolver":
                return (alpha_t / alpha_s) * sample - sigma_t * np.expm1(h) * m0
            # sde-dpmsolver++
            return ((sigma_t / sigma_s) * np.exp(-h) * sample
                    + alpha_t * (1 - np.exp(-2.0 * h)) * m0
                    + sigma_t * np.sqrt(1 - np.exp(-2.0 * h)) * noise)

    def _second_order(self, sample, noise):
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_t = self.sigmas[self.step_index + 1]
            sigma_s0 = self.sigmas[self.step_index]
            sigma_s1 = self.sigmas[self.step_index - 1]
            m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
            alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma_t)
            alpha_s0, sigma_s0 = _sigma_to_alpha_sigma_t(sigma_s0)
            alpha_s1, sigma_s1 = _sigma_to_alpha_sigma_t(sigma_s1)
            lam_t = np.log(alpha_t) - np.log(sigma_t)
            lam_s0 = np.log(alpha_s0) - np.log(sigma_s0)
            lam_s1 = np.log(alpha_s1) - np.log(sigma_s1)
            h, h_0 = lam_t - lam_s0, lam_s0 - lam_s1
            r0 = h_0 / h
            D0, D1 = m0, (1.0 / r0) * (m0 - m1)
            heun = self.solver_type == "heun"
            if self.algorithm_type == "dpmsolver++":
                base = (sigma_t / sigma_s0) * sample - alpha_t * np.expm1(-h) * D0
                if heun:
                    return base + alpha_t * (np.expm1(-h) / h + 1.0) * D1
                return base - 0.5 * alpha_t * np.expm1(-h) * D1
            if self.algorithm_type == "dpmsolver":
                base = (alpha_t / alpha_s0) * sample - sigma_t * np.expm1(h) * D0
                if heun:
                    return base - sigma_t * (np.expm1(h) / h - 1.0) * D1
                return base - 0.5 * sigma_t * np.expm1(h) * D1
            base = ((sigma_t / sigma_s0) * np.exp(-h) * sample
                    + alpha_t * (1 - np.exp(-2.0 * h)) * D0
                    + sigma_t * np.sqrt(1 - np.exp(-2.0 * h)) * noise)
            if heun:
                return base + alpha_t * ((1 - np.exp(-2.0 * h)) / (-2.0 * h) + 1.0) * D1
            return base + 0.5 * alpha_t * (1 - np.exp(-2.0 * h)) * D1

    def _third_order(self, sample):
        """diffusers multistep_dpm_solver_third_order_update (no SDE variant)."""
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_t = self.sigmas[self.step_index + 1]
            sigma_s0 = self.sigmas[self.step_index]
            sigma_s1 = self.sigmas[self.step_index - 1]
            sigma_s2 = self.sigmas[self.step_index - 2]
            m0, m1, m2 = self.model_outputs[-1], self.model_outputs[-2], self.model_outputs[-3]
            alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma_t)
            alpha_s0, sigma_s0 = _sigma_to_alpha_sigma_t(sigma_s0)
            alpha_s1, sigma_s1 = _sigma_to_alpha_sigma_t(sigma_s1)
            alpha_s2, sigma_s2 = _sigma_to_alpha_sigma_t(sigma_s2)
            lam_t = np.log(alpha_t) - np.log(sigma_t)
            lam_s0 = np.log(alpha_s0) - np.log(sigma_s0)
            lam_s1 = np.log(alpha_s1) - np.log(sigma_s1)
            lam_s2 = np.log(alpha_s2) - np.log(sigma_s2)
            h, h_0, h_1 = lam_t - lam_s0, lam_s0 - lam_s1, lam_s1 - lam_s2
            r0, r1 = h_0 / h, h_1 / h
            D0 = m0
            D1_0 = (1.0 / r0) * (m0 - m1)
            D1_1 = (1.0 / r1) * (m1 - m2)
            D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
            D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
            if self.algorithm_type == "dpmsolver++":
                return ((sigma_t / sigma_s0) * sample
                        - alpha_t * np.expm1(-h) * D0
                        + alpha_t * (np.expm1(-h) / h + 1.0) * D1
                        - alpha_t * ((np.expm1(-h) + h) / h**2 - 0.5) * D2)
            if self.algorithm_type == "dpmsolver":
                return ((alpha_t / alpha_s0) * sample
                        - sigma_t * np.expm1(h) * D0
                        - sigma_t * (np.expm1(h) / h - 1.0) * D1
                        - sigma_t * ((np.expm1(h) - h) / h**2 - 0.5) * D2)
            raise NotImplementedError("sde-dpmsolver++ has no third-order update")

    def step(self, model_output, t, sample, noise=None):
        n = len(self.timesteps)
        final_step = self.step_index == n - 1
        lower_order_final = final_step and (
            self.euler_at_final
            or (self.lower_order_final and n < 15)
            or self.final_sigmas_type == "zero"
        )
        lower_order_second = (self.step_index == n - 2) and self.lower_order_final and n < 15

        converted = self._convert(model_output, sample)
        self.model_outputs = self.model_outputs[1:] + [converted]

        if self.solver_order == 1 or self.lower_order_nums < 1 or lower_order_final:
            prev = self._first_order(converted, sample, noise)
        elif self.solver_order == 2 or self.lower_order_nums < 2 or lower_order_second:
            prev = self._second_order(sample, noise)
        else:
            prev = self._third_order(sample)

        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


class NpUniPC:
    """UniPC bh2 predictor-corrector, restated with the general R-matrix /
    linear-solve formulation (diffusers' order>2 path, which reduces to its
    order<=2 closed forms) — deliberately NOT the closed-form used in
    fmdm_tpu/schedulers/unipc.py, so agreement is meaningful."""

    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear", solver_order=2, predict_x0=True,
                 prediction_type="epsilon", lower_order_final=True,
                 solver_type="bh2", thresholding=False,
                 dynamic_thresholding_ratio=0.995, sample_max_value=1.0,
                 use_karras_sigmas=False, timestep_spacing="linspace",
                 steps_offset=0, final_sigmas_type="zero"):
        self.N = num_train_timesteps
        self.acp = np.cumprod(1.0 - _betas(beta_schedule, num_train_timesteps, beta_start, beta_end))
        self.solver_order = solver_order
        self.predict_x0 = predict_x0
        self.prediction_type = prediction_type
        self.lower_order_final = lower_order_final
        self.solver_type = solver_type
        self.thresholding = thresholding
        self.dynamic_thresholding_ratio = dynamic_thresholding_ratio
        self.sample_max_value = sample_max_value
        self.use_karras_sigmas = use_karras_sigmas
        self.timestep_spacing = timestep_spacing
        self.steps_offset = steps_offset
        self.final_sigmas_type = final_sigmas_type

    def set_timesteps(self, n):
        self.timesteps = _spaced_timesteps(self.timestep_spacing, self.N, n,
                                           self.steps_offset,
                                           linspace_endpoint=False)
        all_sigmas = ((1 - self.acp) / self.acp) ** 0.5
        sigmas = all_sigmas[self.timesteps]
        if self.use_karras_sigmas:
            # full-table extremes, as in NpDPMSolverMultistep
            sigmas = _karras_ramp(float(all_sigmas[0]), float(all_sigmas[-1]), n)
            log_sigmas = np.log(all_sigmas)
            self.timesteps = np.array(
                [_np_sigma_to_t(s, log_sigmas) for s in sigmas]).round().astype(np.int64)
        last = all_sigmas[0] if self.final_sigmas_type == "sigma_min" else 0.0
        self.sigmas = np.concatenate([sigmas, [last]])
        self.model_outputs = [None] * self.solver_order
        self.lower_order_nums = 0
        self.step_index = 0
        self.last_sample = None
        self.this_order = None
        return self.timesteps

    def add_noise(self, x0, noise, t):
        a = self.acp[np.asarray(t)].reshape((-1,) + (1,) * (x0.ndim - 1))
        return np.sqrt(a) * x0 + np.sqrt(1 - a) * noise

    def _convert(self, model_output, sample):
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma)
        if self.prediction_type == "epsilon":
            x0, eps = (sample - sigma_t * model_output) / alpha_t, model_output
        elif self.prediction_type == "sample":
            x0, eps = model_output, (sample - alpha_t * model_output) / sigma_t
        elif self.prediction_type == "v_prediction":
            x0 = alpha_t * sample - sigma_t * model_output
            eps = alpha_t * model_output + sigma_t * sample
        else:
            raise ValueError(self.prediction_type)
        if self.thresholding and self.predict_x0:
            x0 = _threshold_sample(x0, self.dynamic_thresholding_ratio,
                                   self.sample_max_value)
        return x0 if self.predict_x0 else eps

    def _lam(self, sigma):
        # clamped like the scan-form implementation: keeps bh1 finite at the
        # final sigma=0 step (bh2's expm1(-inf) = -1 hides the issue; bh1's
        # B_h = hh would otherwise be -inf and poison the 0-residual product)
        alpha_t, sigma_t = _sigma_to_alpha_sigma_t(sigma)
        return np.log(alpha_t) - np.log(np.maximum(sigma_t, 1e-10))

    def _uni_p(self, sample, order):
        """Predictor: advance step_index -> step_index+1 using m0 and history."""
        m0 = self.model_outputs[-1]
        sigma_t, sigma_s0 = self.sigmas[self.step_index + 1], self.sigmas[self.step_index]
        alpha_t, sigma_t_ = _sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0_ = _sigma_to_alpha_sigma_t(sigma_s0)
        lam_t, lam_s0 = self._lam(sigma_t), self._lam(sigma_s0)
        h = lam_t - lam_s0

        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - i
            mi = self.model_outputs[-(i + 1)]
            lam_si = self._lam(self.sigmas[si])
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)

        hh = -h if self.predict_x0 else h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        B_h = hh if self.solver_type == "bh1" else np.expm1(hh)
        R, b = [], []
        factorial_i = 1
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        R, b = np.stack(R), np.array(b)

        if len(D1s) > 0:
            D1s = np.stack(D1s, axis=1)  # (B, K, ...)
            if order == 2:
                rhos_p = np.array([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred_res = np.einsum("k,bk...->b...", rhos_p, D1s)
        else:
            pred_res = 0.0

        if self.predict_x0:
            x_t_ = (sigma_t_ / sigma_s0_) * sample - alpha_t * h_phi_1 * m0
            return x_t_ - alpha_t * B_h * pred_res
        x_t_ = (alpha_t / alpha_s0) * sample - sigma_t_ * h_phi_1 * m0
        return x_t_ - sigma_t_ * B_h * pred_res

    def _uni_c(self, this_model_output, last_sample, this_sample, order):
        """Corrector: refine this_sample (at step_index) using the new output."""
        m0 = self.model_outputs[-1]  # previous step's converted output
        sigma_t, sigma_s0 = self.sigmas[self.step_index], self.sigmas[self.step_index - 1]
        alpha_t, sigma_t_ = _sigma_to_alpha_sigma_t(sigma_t)
        alpha_s0, sigma_s0_ = _sigma_to_alpha_sigma_t(sigma_s0)
        lam_t, lam_s0 = self._lam(sigma_t), self._lam(sigma_s0)
        h = lam_t - lam_s0

        rks, D1s = [], []
        for i in range(1, order):
            si = self.step_index - (i + 1)
            mi = self.model_outputs[-(i + 1)]
            lam_si = self._lam(self.sigmas[si])
            rk = (lam_si - lam_s0) / h
            rks.append(rk)
            D1s.append((mi - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)

        hh = -h if self.predict_x0 else h
        h_phi_1 = np.expm1(hh)
        h_phi_k = h_phi_1 / hh - 1
        B_h = hh if self.solver_type == "bh1" else np.expm1(hh)
        R, b = [], []
        factorial_i = 1
        for i in range(1, order + 1):
            R.append(rks ** (i - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= i + 1
            h_phi_k = h_phi_k / hh - 1 / factorial_i
        R, b = np.stack(R), np.array(b)

        if order == 1:
            rhos_c = np.array([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)

        D1_t = this_model_output - m0
        if len(D1s) > 0:
            D1s = np.stack(D1s, axis=1)
            corr_res = np.einsum("k,bk...->b...", rhos_c[:-1], D1s)
        else:
            corr_res = 0.0

        if self.predict_x0:
            x_t_ = (sigma_t_ / sigma_s0_) * last_sample - alpha_t * h_phi_1 * m0
            return x_t_ - alpha_t * B_h * (corr_res + rhos_c[-1] * D1_t)
        x_t_ = (alpha_t / alpha_s0) * last_sample - sigma_t_ * h_phi_1 * m0
        return x_t_ - sigma_t_ * B_h * (corr_res + rhos_c[-1] * D1_t)

    def step(self, model_output, t, sample):
        converted = self._convert(model_output, sample)
        if self.step_index > 0 and self.last_sample is not None:
            sample = self._uni_c(converted, self.last_sample, sample, self.this_order)
        self.model_outputs = self.model_outputs[1:] + [converted]

        n = len(self.timesteps)
        if self.lower_order_final:
            this_order = min(self.solver_order, n - self.step_index)
        else:
            this_order = self.solver_order
        self.this_order = min(this_order, self.lower_order_nums + 1)

        self.last_sample = sample
        prev = self._uni_p(sample, self.this_order)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


class NpFlowMatchEuler:
    """shift=1 semantics (every shipped config); sigma(t) = t/N, final sigma 0."""

    def __init__(self, num_train_timesteps=1000, shift=1.0):
        self.N = num_train_timesteps
        self.shift = shift

    def _shifted(self, sigma):
        return self.shift * sigma / (1 + (self.shift - 1) * sigma)

    def set_timesteps(self, n):
        smax, smin = self._shifted(1.0), self._shifted(1.0 / self.N)
        ts = np.linspace(smax * self.N, smin * self.N, n, dtype=np.float64)
        self.timesteps = ts
        self.sigmas = np.concatenate([ts / self.N, [0.0]])
        self.step_index = 0
        return ts

    def add_noise(self, x0, noise, t):
        # timesteps are already in shifted-sigma space (set_timesteps returns
        # shifted_sigma * N), so sigma is a plain division — diffusers'
        # scale_noise looks the sigma up from the same shifted table
        sigma = np.asarray(t, np.float64).reshape((-1,) + (1,) * (x0.ndim - 1)) / self.N
        return (1 - sigma) * x0 + sigma * noise

    def step(self, model_output, t, sample):
        sigma = self.sigmas[self.step_index]
        sigma_next = self.sigmas[self.step_index + 1]
        self.step_index += 1
        return sample + (sigma_next - sigma) * model_output


class NpDPMSolverSDE:
    """Sequential float64 oracle for diffusers' DPMSolverSDEScheduler,
    expressed with the mutable first/second-order state machine of
    scheduling_dpmsolver_sde.py (sample stored across the pair, midpoint
    sigma cached) rather than precomputed per-call tables."""

    def __init__(self, num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
                 beta_schedule="linear", prediction_type="epsilon", use_karras_sigmas=False):
        betas = _betas(beta_schedule, num_train_timesteps, beta_start, beta_end)
        self.acp = np.cumprod(1.0 - betas)
        self.N = num_train_timesteps
        self.prediction_type = prediction_type
        self.use_karras_sigmas = use_karras_sigmas

    def _sigma_to_t(self, sigma, log_sigmas):
        log_sigma = np.log(np.float64(sigma))
        dists = log_sigma - log_sigmas
        low_idx = np.cumsum((dists >= 0)).argmax().clip(max=log_sigmas.shape[0] - 2)
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return (1 - w) * low_idx + w * high_idx

    def set_timesteps(self, n):
        sig_train = np.sqrt((1 - self.acp) / self.acp)
        log_sigmas = np.log(sig_train)
        timesteps = np.linspace(0, self.N - 1, n, dtype=np.float64)[::-1].copy()
        sigmas = np.interp(timesteps, np.arange(self.N), sig_train)
        if self.use_karras_sigmas:
            smin, smax = sigmas[-1], sigmas[0]
            ramp = np.linspace(0, 1, len(sigmas))
            sigmas = (smax ** (1 / 7.0) + ramp * (smin ** (1 / 7.0) - smax ** (1 / 7.0))) ** 7.0
            timesteps = np.array([self._sigma_to_t(s, log_sigmas) for s in sigmas])
        # second-order (midpoint) timesteps as diffusers computes them
        t = -np.log(sigmas)
        t_proposed = t[:-1] + 0.5 * (t[1:] - t[:-1])
        mids = np.array([self._sigma_to_t(np.exp(-tp), log_sigmas) for tp in t_proposed])
        sigmas = np.concatenate([sigmas, [0.0]])
        self.sigmas = np.concatenate([sigmas[:1], np.repeat(sigmas[1:-1], 2), sigmas[-1:]])
        inter = np.concatenate([timesteps[:1], np.repeat(timesteps[1:], 2)])
        inter[1::2] = mids
        self.timesteps = inter
        self.sample = None
        self.mid_point_sigma = None
        self.step_index = 0
        self.init_noise_sigma = sigmas[0]
        self.sig_train = sig_train
        return inter

    @property
    def state_in_first_order(self):
        return self.sample is None

    def scale_model_input(self, sample, t=None):
        sigma = self.sigmas[self.step_index]
        sigma_input = sigma if self.state_in_first_order else self.mid_point_sigma
        return sample / np.sqrt(sigma_input**2 + 1)

    def add_noise(self, x0, noise, t):
        sigma = self.sig_train[np.asarray(t, np.int64)]
        sigma = sigma.reshape(sigma.shape + (1,) * (x0.ndim - sigma.ndim))
        return x0 + sigma * noise

    def step(self, model_output, t, sample, noise):
        def sigma_fn(_t):
            return np.exp(-_t)

        def t_fn(_sigma):
            return -np.log(_sigma)

        if self.state_in_first_order:
            sigma = self.sigmas[self.step_index]
            sigma_next = self.sigmas[self.step_index + 1]
        else:
            sigma = self.sigmas[self.step_index - 1]
            sigma_next = self.sigmas[self.step_index]
        self.step_index += 1

        t_cur, t_next = t_fn(sigma), t_fn(sigma_next)
        t_proposed = t_cur + 0.5 * (t_next - t_cur)

        sigma_input = sigma if self.state_in_first_order else sigma_fn(t_proposed)
        if self.prediction_type == "epsilon":
            denoised = sample - sigma_input * model_output
        elif self.prediction_type == "v_prediction":
            denoised = model_output * (-sigma_input / np.sqrt(sigma_input**2 + 1)) \
                + sample / (sigma_input**2 + 1)
        else:
            raise ValueError(self.prediction_type)

        if sigma_next == 0:
            derivative = (sample - denoised) / sigma
            prev = sample + derivative * (sigma_next - sigma)
        else:
            if self.state_in_first_order:
                t_next = t_proposed
            else:
                sample = self.sample
            sigma_from = sigma_fn(t_cur)
            sigma_to = sigma_fn(t_next)
            sigma_up = min(sigma_to, np.sqrt(sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2))
            sigma_down = np.sqrt(sigma_to**2 - sigma_up**2)
            ancestral_t = t_fn(sigma_down)
            prev = (sigma_fn(ancestral_t) / sigma_fn(t_cur)) * sample \
                - np.expm1(t_cur - ancestral_t) * denoised
            prev = prev + noise * sigma_up
            if self.state_in_first_order:
                self.sample = sample
                self.mid_point_sigma = sigma_fn(t_next)
            else:
                self.sample = None
                self.mid_point_sigma = None
        return prev
