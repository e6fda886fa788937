"""Frozen scheduler numerics: 3-step trajectories + add_noise outputs recorded
from the reviewed implementations (oracle-verified in test_schedulers). Guards
future refactors against silent numerical drift."""

from pathlib import Path

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
    UniPCMultistepScheduler,
)

FIXTURES = np.load(Path(__file__).parent / "fixtures_scheduler_golden.npz")

SCHEDULERS = {
    "ddpm": lambda: DDPMScheduler.create(num_train_timesteps=100),
    "ddim": lambda: DDIMScheduler.create(num_train_timesteps=100),
    "dpmpp": lambda: DPMSolverMultistepScheduler.create(num_train_timesteps=100),
    "unipc": lambda: UniPCMultistepScheduler.create(num_train_timesteps=100),
    "sde": lambda: DPMSolverSDEScheduler.create(num_train_timesteps=100),
    "flow": lambda: FlowMatchEulerDiscreteScheduler.create(num_train_timesteps=100),
}


def _inputs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32))
    pred = jnp.asarray(rng.randn(2, 1, 4, 4).astype(np.float32))
    return x, pred


@pytest.mark.parametrize("name", sorted(SCHEDULERS))
def test_trajectory_frozen(name):
    sched = SCHEDULERS[name]()
    x, pred = _inputs()
    ts = jnp.asarray(sched.set_timesteps(10))
    state = sched.init_state(ts, x)
    traj = []
    for i in range(3):
        state, x = sched.step(state, pred, i, x, ts, rng=jax.random.PRNGKey(7 + i))
        traj.append(np.asarray(x))
    # sde runs sigma-space math at sigma ~ O(150): f32 rounding differences
    # between XLA fusion variants amplify to ~1e-5 absolute, so its freeze
    # tolerance is wider (still far below any algorithmic change).
    rtol, atol = (2e-4, 5e-5) if name == "sde" else (1e-5, 1e-6)
    np.testing.assert_allclose(np.stack(traj), FIXTURES[f"{name}_traj"], rtol=rtol, atol=atol)


@pytest.mark.parametrize("name", sorted(SCHEDULERS))
def test_add_noise_frozen(name):
    sched = SCHEDULERS[name]()
    x, pred = _inputs()
    ts = jnp.asarray(sched.set_timesteps(10))
    t = jnp.broadcast_to(ts[0], (2,))
    if name != "flow":
        t = t.astype(jnp.int32)
    out = np.asarray(sched.add_noise(x, pred, t))
    np.testing.assert_allclose(out, FIXTURES[f"{name}_addnoise"], rtol=1e-5, atol=1e-6)
