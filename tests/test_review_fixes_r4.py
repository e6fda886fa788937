"""Regression tests for the round-4 self-review findings (code-review of
2d49446..HEAD): flash block_k divisibility fallback, engine-cache fingerprint
content-hashing, diffusers karras full-table extremes, DPM/UniPC 'leading'
spacing convention, multi-host visual-epoch RNG split."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.ops.attention import sdpa_xla
from fmdm_tpu.ops.pallas.flash_attention import (
    flash_backward_chunk,
    flash_forward_partials,
    pick_block_k,
)


# -- finding 1+5: pick_block_k must apply the divisibility fallback ----------

def test_pick_block_k_fallback_chain():
    assert pick_block_k(768, 512) == 384      # not 512 (768 % 512 != 0)
    assert pick_block_k(640, 512) == 128      # only 128 divides
    assert pick_block_k(1024, 512) == 512
    assert pick_block_k(512, 512) == 512
    assert pick_block_k(320, 512) == 320      # tk <= cap: single block


def test_flash_forward_partials_768_kv():
    """A 128-aligned KV shard not divisible by 512 (e.g. T=3072 over a
    4-device seq axis) must take the fallback block size, not crash."""
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (2, 128, 16))
    k = jax.random.normal(kk, (2, 768, 16))
    v = jax.random.normal(kv, (2, 768, 16))
    scale = 1.0 / math.sqrt(16)
    out, lse = flash_forward_partials(q, k, v, scale)
    ref = sdpa_xla(q, k, v, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # lse is the true log-sum-exp of the scaled scores
    s = np.einsum("bqd,bkd->bqk", np.asarray(q) * scale, np.asarray(k))
    ref_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1, keepdims=True)) \
        + s.max(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, rtol=2e-5, atol=2e-5)


def test_flash_backward_chunk_768_kv_matches_xla():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv, kg = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (2, 128, 16))
    k = jax.random.normal(kk, (2, 768, 16))
    v = jax.random.normal(kv, (2, 768, 16))
    g = jax.random.normal(kg, (2, 128, 16))
    scale = 1.0 / math.sqrt(16)

    def f(q, k, v):
        return sdpa_xla(q, k, v, scale=scale)

    out = f(q, k, v)
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k)
    lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)
    dq, dk, dv = flash_backward_chunk(q, k, v, out, lse, g, scale)
    rq, rk, rv = jax.vjp(f, q, k, v)[1](g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=2e-4, atol=2e-4)


def test_ring_flash_768_shard_end_to_end():
    """The exact crash repro: fused ring over 4 devices with a 768-token
    per-device shard (T=3072). impl='flash' forces the fused path."""
    import functools
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    from fmdm_tpu.parallel.sequence import ring_attention, _flash_hop_eligible

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]), ("data",))
    shape = (1, 1, 3072, 16)
    q = jax.random.normal(jax.random.PRNGKey(2), shape)
    k = jax.random.normal(jax.random.PRNGKey(3), shape)
    v = jax.random.normal(jax.random.PRNGKey(4), shape)
    assert _flash_hop_eligible(q[:, :, :768], k[:, :, :768])  # auto would fuse
    spec = P(None, None, "data", None)
    ring = shard_map(
        functools.partial(ring_attention, axis_name="data", impl="flash"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)  # pallas interpret can't carry vma typing
    out = jax.jit(ring)(q, k, v)
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


# -- finding 2: engine-cache fingerprint must hash derived tables ------------

def test_scheduler_fingerprint_distinguishes_beta_overrides():
    from fmdm_tpu.sample.diffusion_utils import _scheduler_fingerprint
    from fmdm_tpu.schedulers.ddpm import DDPMScheduler

    a = DDPMScheduler.create(num_train_timesteps=1000)
    b = DDPMScheduler.create(num_train_timesteps=1000, beta_end=0.012)
    assert _scheduler_fingerprint(a) != _scheduler_fingerprint(b)
    # and it stays stable for an identical config (cache hits still work)
    a2 = DDPMScheduler.create(num_train_timesteps=1000)
    assert _scheduler_fingerprint(a) == _scheduler_fingerprint(a2)


# -- finding 3: karras ramp spans the FULL training table --------------------

@pytest.mark.parametrize("make", [
    lambda: __import__("fmdm_tpu.schedulers.dpm", fromlist=["x"])
    .DPMSolverMultistepScheduler.create(num_train_timesteps=1000,
                                        use_karras_sigmas=True),
    lambda: __import__("fmdm_tpu.schedulers.unipc", fromlist=["x"])
    .UniPCMultistepScheduler.create(num_train_timesteps=1000,
                                    use_karras_sigmas=True),
])
def test_karras_full_table_extremes(make):
    s = make()
    s.set_timesteps(20)
    ks = np.asarray(s._karras_sigmas, np.float64)
    acp = np.asarray(s.alphas_cumprod, np.float64)
    table = np.sqrt((1.0 - acp) / acp)
    # diffusers passes the full flipped table into _convert_to_karras, so the
    # ramp endpoints are sigma(t=N-1) and sigma(t=0) — for default betas,
    # sigma_min = 0.0100005, 17.6x below the selected-extremes value 0.176
    np.testing.assert_allclose(ks[0], table[-1], rtol=1e-10)
    np.testing.assert_allclose(ks[-1], table[0], rtol=1e-10)
    assert ks[-1] < 0.02


# -- finding 4: DPM/UniPC 'leading' is the n+1-points-drop-last family -------

def test_leading_spacing_conventions():
    from fmdm_tpu.schedulers.base import spaced_timesteps

    # DPM/UniPC family: ratio N//(n+1) over n+1 points, last dropped
    np.testing.assert_array_equal(
        spaced_timesteps("leading", 1000, 10),
        np.array([900, 810, 720, 630, 540, 450, 360, 270, 180, 90]))
    # DDPM/DDIM family: ratio N//n over n points
    np.testing.assert_array_equal(
        spaced_timesteps("leading", 1000, 10, ddim_conventions=True),
        np.array([900, 800, 700, 600, 500, 400, 300, 200, 100, 0]))


def test_dpm_set_timesteps_leading_matches_diffusers_values():
    from fmdm_tpu.schedulers.dpm import DPMSolverMultistepScheduler

    s = DPMSolverMultistepScheduler.create(num_train_timesteps=1000,
                                           timestep_spacing="leading")
    np.testing.assert_array_equal(
        s.set_timesteps(10),
        np.array([900, 810, 720, 630, 540, 450, 360, 270, 180, 90]))


# -- finding 6: visual-epoch RNG split must happen on every rank -------------

def test_visual_epoch_rng_split_is_rank_uniform():
    """The host RNG stream feeding train_step must advance identically on
    every rank; the split therefore gates on visual_epoch (deterministic
    cadence) alone, never on is_main_process. Source-level guard: the split
    must not live inside a save_samples/is_main_process-gated block."""
    import inspect
    import re
    from fmdm_tpu.train import denoise_lib

    src = inspect.getsource(denoise_lib)
    i = src.index("vis_rng = jax.random.split(rng)")
    window = src[max(0, i - 400):i]
    assert "if visual_epoch:" in window
    gate = re.search(r"save_samples\s*=", window)
    assert gate is None, "rng split must precede the rank-gated branch"
