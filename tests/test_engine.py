"""Sampling engine behaviors: timestep selection, conditioning helpers,
partial-denoise math, bf16 compute, timing contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.sample.engine import (
    SamplingEngine,
    align_conditioning,
    normalize_latent_conditioning,
    prepare_attention_context,
    sample_with_scheduler,
    select_timesteps,
)
from fmdm_tpu.schedulers import DDIMScheduler, DDPMScheduler


def test_select_timesteps():
    ts = np.array([980, 800, 600, 400, 200, 0])
    np.testing.assert_array_equal(select_timesteps(ts, start_step=700), [600, 400, 200, 0])
    np.testing.assert_array_equal(select_timesteps(ts, last_n_steps=2), [200, 0])
    np.testing.assert_array_equal(select_timesteps(ts, start_step=700, last_n_steps=2), [200, 0])
    with pytest.raises(ValueError):
        select_timesteps(ts, start_step=-1)
    with pytest.raises(ValueError):
        select_timesteps(ts, last_n_steps=0)
    with pytest.raises(ValueError):
        select_timesteps(np.array([900]), start_step=100)


def test_align_conditioning_repeats():
    cond = jnp.ones((2, 1, 4, 4))
    out = align_conditioning(cond, 5)
    assert out.shape == (5, 1, 4, 4)
    assert align_conditioning(None, 3) is None
    assert align_conditioning(cond, 2) is cond


def test_normalize_latent_conditioning_modes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8)) * 5 + 2
    std = normalize_latent_conditioning(x, "standardize")
    np.testing.assert_allclose(np.asarray(jnp.mean(std, axis=(2, 3))), 0.0, atol=1e-5)
    mm = normalize_latent_conditioning(x, "minmax")
    assert float(jnp.min(mm)) >= 0.0 and float(jnp.max(mm)) <= 1.0 + 1e-5
    assert normalize_latent_conditioning(x, None) is x
    with pytest.raises(ValueError):
        normalize_latent_conditioning(x, "bogus")
    with pytest.raises(ValueError):
        prepare_attention_context(jnp.ones((2, 3)))


class _OracleModel:
    """eps-oracle for a single-point data distribution (see test_schedulers)."""

    def __init__(self, sched, x0):
        self.acp = jnp.asarray(sched.alphas_cumprod, jnp.float32)
        self.x0 = x0

    def __call__(self, params, x, t, context_ca=None):
        # concatenate-mode engines feed (x | cond); the oracle only sees x
        x = x[:, : self.x0.shape[1]]
        a = self.acp[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(a) * self.x0) / jnp.sqrt(1 - a)


def test_engine_recovers_x0_and_times():
    x0 = jnp.tile(jnp.linspace(0.1, 0.9, 16).reshape(1, 1, 4, 4), (2, 1, 1, 1))
    sched = DDIMScheduler.create(num_train_timesteps=100)
    model = _OracleModel(sched, x0)
    timing = {}
    out = sample_with_scheduler(
        model, {}, sched, 20, (2, 1, 4, 4), jax.random.PRNGKey(0), timing=timing,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)
    assert timing["model_calls"] == 20
    assert timing["model_seconds"] > 0


def test_engine_partial_denoise_from_reference():
    """init_sample at a small start_step stays close to the reference batch."""
    x0 = jnp.full((1, 1, 4, 4), 0.5)
    sched = DDIMScheduler.create(num_train_timesteps=100)
    model = _OracleModel(sched, x0)
    ts = select_timesteps(sched.set_timesteps(20), last_n_steps=3)
    assert len(ts) == 3
    rng = jax.random.PRNGKey(1)
    init = sched.add_noise(x0, jax.random.normal(rng, x0.shape), jnp.array([int(ts[0])]))
    engine = SamplingEngine(model, sched, ts)
    out = engine({}, (1, 1, 4, 4), rng, init_sample=init)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-2)


def test_engine_bf16_compute():
    x0 = jnp.full((2, 1, 4, 4), 0.25)
    sched = DDPMScheduler.create(num_train_timesteps=50)
    model = _OracleModel(sched, x0)
    ts = sched.set_timesteps(50)
    engine = SamplingEngine(model, sched, ts, compute_dtype=jnp.bfloat16)
    out = engine({}, (2, 1, 4, 4), jax.random.PRNGKey(0))
    assert out.dtype == jnp.float32  # scheduler math stays f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=0.1)


def test_engine_concatenate_conditioning():
    x0 = jnp.full((2, 1, 4, 4), 0.5)
    sched = DDIMScheduler.create(num_train_timesteps=100)
    model = _OracleModel(sched, x0)
    ts = sched.set_timesteps(10)
    engine = SamplingEngine(model, sched, ts, conditioning_mode="concatenate")
    cond = jnp.ones((1, 1, 4, 4))  # batch 1, aligned to 2 via repeat
    out = engine({}, (2, 1, 4, 4), jax.random.PRNGKey(0), conditioning_batch=cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=5e-3)
