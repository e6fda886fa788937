"""Scheduler-knob policy (VERDICT r3 item 2).

The reference passes any config param matching the diffusers ctor signature
into diffusers, where it changes numerics
(/root/reference/src/pipelines/utils.py:55-62). Policy here:

- implemented knobs work with oracle-pinned numerics
  (tests/test_scheduler_oracle_parity.py),
- recognized-but-unimplemented diffusers params raise loudly (never silently
  produce different samples),
- params diffusers itself would not accept are dropped with a warning
  (matching the reference's signature filter, which drops them silently).

This file enumerates the reject list per scheduler and pins all three
behaviors, including through the CLI '?param=value' override path.
"""

import logging

import numpy as np
import pytest

from fmdm_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    DPMSolverSDEScheduler,
    FlowMatchEulerDiscreteScheduler,
    UniPCMultistepScheduler,
    build_scheduler,
    resolve_scheduler_override,
)

# the full reject surface: diffusers ctor params we recognize but refuse
REJECTED = {
    DPMSolverMultistepScheduler: [
        "trained_betas", "use_lu_lambdas", "use_exponential_sigmas",
        "use_beta_sigmas", "use_flow_sigmas", "flow_shift",
        "lambda_min_clipped", "variance_type", "rescale_betas_zero_snr",
    ],
    UniPCMultistepScheduler: [
        "trained_betas", "disable_corrector", "solver_p",
        "use_exponential_sigmas", "use_beta_sigmas", "use_flow_sigmas",
        "flow_shift", "rescale_betas_zero_snr",
    ],
    DDPMScheduler: ["trained_betas", "rescale_betas_zero_snr"],
    DDIMScheduler: ["trained_betas", "rescale_betas_zero_snr"],
    DPMSolverSDEScheduler: ["trained_betas", "timestep_spacing", "steps_offset"],
    FlowMatchEulerDiscreteScheduler: [
        "use_dynamic_shifting", "base_shift", "max_shift",
        "base_image_seq_len", "max_image_seq_len", "invert_sigmas",
        "shift_terminal", "time_shift_type", "use_karras_sigmas",
        "use_exponential_sigmas", "use_beta_sigmas", "stochastic_sampling",
    ],
}


@pytest.mark.parametrize("cls", sorted(REJECTED, key=lambda c: c.__name__),
                         ids=lambda c: c.__name__)
def test_recognized_unimplemented_params_raise(cls):
    for key in REJECTED[cls]:
        with pytest.raises(NotImplementedError, match=key):
            cls.create(num_train_timesteps=100, **{key: True})


def test_unknown_params_warn_but_run(monkeypatch):
    seen = []
    monkeypatch.setattr(logging, "warning",
                        lambda msg, *a, **k: seen.append(msg % a))
    sched = DPMSolverMultistepScheduler.create(num_train_timesteps=100,
                                               not_a_diffusers_key=1)
    assert sched is not None
    assert any("not_a_diffusers_key" in m for m in seen)


def test_cli_override_reaches_policy():
    """'?param=value' overrides flow through build_scheduler into create()."""
    tcfg = {"num_train_timesteps": 100}
    # implemented knob: works and changes the schedule
    sched, _ = build_scheduler(
        resolve_scheduler_override("dpmsolver++?use_karras_sigmas=true"), tcfg)
    assert sched.use_karras_sigmas is True
    sched2, _ = build_scheduler(
        resolve_scheduler_override("dpmsolver++?solver_type=heun"), tcfg)
    assert sched2.solver_type == "heun"
    # recognized-unimplemented knob: loud failure, not silent divergence
    with pytest.raises(NotImplementedError, match="use_lu_lambdas"):
        build_scheduler(
            resolve_scheduler_override("dpmsolver++?use_lu_lambdas=true"), tcfg)


def test_ddpm_unimplemented_variance_types_raise():
    for vt in ("fixed_small_log", "fixed_large_log", "learned", "learned_range"):
        with pytest.raises(NotImplementedError, match=vt):
            DDPMScheduler.create(num_train_timesteps=100, variance_type=vt)


def test_dpm_final_sigmas_zero_rejected_for_eps_space():
    with pytest.raises(ValueError, match="final_sigmas_type"):
        DPMSolverMultistepScheduler.create(
            num_train_timesteps=100, algorithm_type="dpmsolver",
            final_sigmas_type="zero")
    # explicit sigma_min is fine for ++
    sched = DPMSolverMultistepScheduler.create(
        num_train_timesteps=100, final_sigmas_type="sigma_min")
    assert sched._final_sigmas_type_resolved() == "sigma_min"


def test_sde_noise_sampler_seed_accepted_noop():
    """noise_sampler_seed selects a noise stream, not an update rule — RNG
    parity here is documented distribution-level, so it is accepted."""
    sched = DPMSolverSDEScheduler.create(num_train_timesteps=100,
                                         noise_sampler_seed=42)
    assert sched is not None


def test_karras_sliced_suffix_alignment():
    """start_step/last_n slicing keeps a schedule suffix; the stashed Karras
    sigmas must align by trailing length."""
    import jax.numpy as jnp

    sched = DPMSolverMultistepScheduler.create(num_train_timesteps=1000,
                                               use_karras_sigmas=True)
    ts = sched.set_timesteps(20)
    full = np.asarray(sched._sigmas_for(jnp.asarray(ts)))
    tail = np.asarray(sched._sigmas_for(jnp.asarray(ts[-7:])))
    np.testing.assert_allclose(tail, full[-8:], rtol=1e-6)  # 7 sigmas + final
