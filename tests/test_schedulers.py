"""
Scheduler correctness tests.

Strategy (diffusers is not installed in this image): oracle-model tests. For a
single-point data distribution {x0}, the exact epsilon-predictor is
eps(x_t, t) = (x_t - sqrt(acp_t) x0) / sqrt(1 - acp_t) and the exact velocity
field for the linear flow interpolant is v(x_s, s) = (x_s - x0) / s. A correct
sampler driven by the oracle must recover x0 (exactly for deterministic
solvers, up to the residual noise floor for ancestral ones).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    DPMSolverSDEScheduler,
    FlowMatchEulerDiscreteScheduler,
    SCHEDULER_REGISTRY,
    UniPCMultistepScheduler,
    build_scheduler,
    resolve_scheduler_override,
)

KEY = jax.random.PRNGKey(0)
X0 = jnp.tile(jnp.linspace(-0.8, 0.8, 16).reshape(1, 1, 4, 4), (2, 1, 1, 1))


def _oracle_eps(sched):
    acp = jnp.asarray(sched.alphas_cumprod, dtype=jnp.float32)

    def model(x, t):
        a = acp[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * X0) / jnp.sqrt(1 - a)

    return model


def _run_sampler(sched, model, num_steps, seed=0, init=None):
    timesteps = jnp.asarray(sched.set_timesteps(num_steps))
    x = init if init is not None else jax.random.normal(jax.random.PRNGKey(seed), X0.shape)
    state = sched.init_state(timesteps, x)
    rngs = jax.random.split(jax.random.PRNGKey(seed + 1), timesteps.shape[0])
    for i in range(timesteps.shape[0]):
        t = jnp.broadcast_to(timesteps[i].astype(jnp.int32), (x.shape[0],))
        pred = model(x, t)
        state, x = sched.step(state, pred, i, x, timesteps, rng=rngs[i])
    return x


def test_add_noise_formula_ddpm():
    sched = DDPMScheduler.create(num_train_timesteps=1000, beta_start=0.0001, beta_end=0.02)
    t = jnp.array([0, 500, 999])
    x0 = jnp.ones((3, 1, 2, 2))
    noise = jnp.full((3, 1, 2, 2), 2.0)
    out = np.asarray(sched.add_noise(x0, noise, t))
    acp = sched.alphas_cumprod[np.array([0, 500, 999])]
    expected = np.sqrt(acp)[:, None, None, None] * 1.0 + np.sqrt(1 - acp)[:, None, None, None] * 2.0
    np.testing.assert_allclose(out, np.broadcast_to(expected, out.shape), rtol=1e-5)


def test_leading_spacing_matches_diffusers_convention():
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    ts = sched.set_timesteps(50)
    assert ts[0] == 980 and ts[-1] == 0 and len(ts) == 50
    assert all(np.diff(ts) == -20)


def test_linspace_spacing_matches_diffusers_convention():
    sched = DPMSolverMultistepScheduler.create(num_train_timesteps=1000)
    ts = sched.set_timesteps(50)
    assert ts[0] == 999 and len(ts) == 50
    assert ts[-1] > 0  # linspace drops the trailing 0 ([::-1][:-1])


def test_ddim_oracle_recovers_x0():
    sched = DDIMScheduler.create(num_train_timesteps=1000, clip_sample=True)
    out = _run_sampler(sched, _oracle_eps(sched), 50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=5e-3)


def test_ddpm_oracle_converges_to_x0():
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    out = _run_sampler(sched, _oracle_eps(sched), 1000)
    # ancestral sampling leaves the final-step noise floor (beta_1 ~ 1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=5e-2)


@pytest.mark.parametrize("algorithm,order", [
    ("dpmsolver", 1), ("dpmsolver", 2), ("dpmsolver++", 2),
])
def test_dpm_oracle_recovers_x0(algorithm, order):
    sched = DPMSolverMultistepScheduler.create(
        num_train_timesteps=1000, algorithm_type=algorithm, solver_order=order
    )
    out = _run_sampler(sched, _oracle_eps(sched), 50)
    # eps-space 'dpmsolver' stops at the sigma_min noise floor, x0-space hits 0
    atol = 5e-2 if algorithm == "dpmsolver" else 2e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=atol)


def test_dpm_sde_oracle_converges_to_x0():
    # sigma-space scheduler (k-diffusion family): init noise at sigma_max,
    # model input scaled by 1/sqrt(sigma^2+1), eps oracle in sigma space.
    # With an exact eps oracle every denoisement equals X0, so the final
    # Euler-to-zero step lands on X0 exactly despite the per-step ancestral
    # noise injections.
    sched = DPMSolverSDEScheduler.create(num_train_timesteps=1000)
    timesteps = jnp.asarray(sched.set_timesteps(50))
    x = jax.random.normal(KEY, X0.shape) * sched.init_noise_sigma
    state = sched.init_state(timesteps, x)
    rngs = jax.random.split(jax.random.PRNGKey(1), timesteps.shape[0])
    assert timesteps.shape[0] == 2 * 50 - 1  # interleaved midpoints
    for i in range(timesteps.shape[0]):
        scaled = sched.scale_model_input(x, jnp.asarray(i), timesteps)
        assert bool(jnp.all(jnp.isfinite(scaled)))
        sigma = sched._sigma_call[i]
        pred = (x - X0) / sigma  # exact eps for a sigma-space sample
        state, x = sched.step(state, pred, i, x, timesteps, rng=rngs[i])
    np.testing.assert_allclose(np.asarray(x), np.asarray(X0), atol=1e-3)


def test_unipc_oracle_recovers_x0():
    sched = UniPCMultistepScheduler.create(num_train_timesteps=1000)
    out = _run_sampler(sched, _oracle_eps(sched), 50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=2e-2)


def test_flow_match_oracle_recovers_x0():
    sched = FlowMatchEulerDiscreteScheduler.create(num_train_timesteps=1000)

    def velocity_model(x, t):
        sigma = (t.astype(jnp.float32) / 1000.0).reshape(-1, 1, 1, 1)
        return (x - X0) / jnp.maximum(sigma, 1e-8)

    timesteps = jnp.asarray(sched.set_timesteps(50))
    x = jax.random.normal(KEY, X0.shape)
    state = sched.init_state(timesteps, x)
    for i in range(timesteps.shape[0]):
        t = jnp.broadcast_to(timesteps[i], (x.shape[0],))
        pred = velocity_model(x, t)
        state, x = sched.step(state, pred, i, x, timesteps)
    np.testing.assert_allclose(np.asarray(x), np.asarray(X0), atol=1e-3)


def test_flow_match_add_noise_is_linear_interpolant():
    sched = FlowMatchEulerDiscreteScheduler.create(num_train_timesteps=1000)
    x0 = jnp.zeros((2, 1, 2, 2))
    noise = jnp.ones((2, 1, 2, 2))
    t = jnp.array([500, 1000])
    out = np.asarray(sched.add_noise(x0, noise, t))
    np.testing.assert_allclose(out[0], 0.5, atol=1e-6)
    np.testing.assert_allclose(out[1], 1.0, atol=1e-6)


def test_registry_and_aliases():
    assert set(SCHEDULER_REGISTRY) == {
        "ddpm", "ddim", "dpm_multistep", "dpm_sde", "unipc", "flow_match_euler", "flowmatch",
    }
    ov = resolve_scheduler_override("dpmsolver++")
    assert ov == {"name": "dpm_multistep", "params": {"solver_order": 2, "algorithm_type": "dpmsolver++"}}
    assert resolve_scheduler_override(None) is None
    with pytest.raises(ValueError):
        resolve_scheduler_override("nope")
    sched, n = build_scheduler(
        {"name": "ddpm", "num_train_timesteps": 100, "num_inference_steps": 10,
         "params": {"beta_start": 0.001, "beta_end": 0.01, "not_a_param": 3}},
        {},
    )
    assert isinstance(sched, DDPMScheduler)
    assert n == 10 and sched.num_train_timesteps == 100
    assert abs(sched.betas[0] - 0.001) < 1e-9


def test_build_scheduler_training_fallbacks():
    sched, n = build_scheduler({}, {"scheduler": "flowmatch", "num_train_timesteps": 200,
                                    "num_inference_steps": 25})
    assert isinstance(sched, FlowMatchEulerDiscreteScheduler)
    assert n == 25


def test_sampling_loop_under_scan():
    """The whole reverse process must compile into a single lax.scan."""
    sched = DPMSolverMultistepScheduler.create(num_train_timesteps=1000)
    model = _oracle_eps(sched)
    timesteps = jnp.asarray(sched.set_timesteps(20))

    @jax.jit
    def sample(x):
        state = sched.init_state(timesteps, x)

        def body(carry, i):
            state, x = carry
            t = jnp.broadcast_to(timesteps[i].astype(jnp.int32), (x.shape[0],))
            pred = model(x, t)
            state, x = sched.step(state, pred, i, x, timesteps)
            return (state, x), None

        (state, x), _ = jax.lax.scan(body, (state, x), jnp.arange(timesteps.shape[0]))
        return x

    x = jax.random.normal(KEY, X0.shape)
    out = sample(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=2e-2)


def test_ddim_eta_ancestral():
    """eta > 0 draws noise but still converges with the oracle."""
    sched = DDIMScheduler.create(num_train_timesteps=1000, eta=0.5)
    out = _run_sampler(sched, _oracle_eps(sched), 50)
    np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=5e-2)


def test_v_prediction_paths():
    """v-prediction oracle: v = sqrt(acp)*eps - sqrt(1-acp)*x0."""
    for cls in (DDIMScheduler, DPMSolverMultistepScheduler):
        sched = cls.create(num_train_timesteps=1000, prediction_type="v_prediction",
                           clip_sample=False) if cls is DDIMScheduler else cls.create(
            num_train_timesteps=1000, prediction_type="v_prediction")
        acp = jnp.asarray(sched.alphas_cumprod, dtype=jnp.float32)

        def model(x, t):
            a = acp[t].reshape(-1, 1, 1, 1)
            eps = (x - jnp.sqrt(a) * X0) / jnp.sqrt(1 - a)
            return jnp.sqrt(a) * eps - jnp.sqrt(1 - a) * X0

        out = _run_sampler(sched, model, 50)
        np.testing.assert_allclose(np.asarray(out), np.asarray(X0), atol=2e-2)
