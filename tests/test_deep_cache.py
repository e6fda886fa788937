"""DeepCache-style deep-feature caching (models/unet_diffusers.py splice +
engine (interval, depth) scan). Beyond-reference inference acceleration from
the block-caching family ("Cache Me if You Can" / DeepCache): cache the deep
sub-network's slowly-varying output, recompute only the shallow high-res
levels between refreshes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.models.factories import DiffusionUNetFactory

UNET = {
    "unet_impl": "diffusers_nd", "sample_size": 16, "in_channels": 1,
    "out_channels": 1, "layers_per_block": 1, "norm_num_groups": 4,
    "block_out_channels": [8, 16, 16],
    "down_block_types": ["DownBlock2D", "DownBlock2D", "AttnDownBlock2D"],
    "up_block_types": ["AttnUpBlock2D", "UpBlock2D", "UpBlock2D"],
}


@pytest.fixture(scope="module")
def model_and_params():
    model = DiffusionUNetFactory().build(UNET, conditioning=None, channels=1)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.mark.parametrize("depth", [1, 2])
def test_splice_reproduces_full_forward(model_and_params, depth):
    """A shallow pass fed the deep feature captured at the SAME (x, t) must
    equal the full forward — the split is exact, approximation enters only
    through cache staleness across steps."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 16))
    t = jnp.array([7, 3])

    full = model(params, x, t)
    full2, feat = model(params, x, t, cache_depth=depth, return_deep_feature=True)
    np.testing.assert_allclose(np.asarray(full2), np.asarray(full), atol=1e-6)
    assert feat.shape[0] == 2

    spliced = model(params, x, t, deep_cache=feat, cache_depth=depth)
    np.testing.assert_allclose(np.asarray(spliced), np.asarray(full), atol=1e-6)


def test_invalid_depth_raises(model_and_params):
    model, params = model_and_params
    x = jnp.zeros((1, 1, 16, 16))
    t = jnp.array([0])
    with pytest.raises(ValueError):
        model(params, x, t, cache_depth=3, return_deep_feature=True)
    with pytest.raises(ValueError):
        model(params, x, t, deep_cache=x, cache_depth=0)


def test_engine_interval_one_matches_uncached(model_and_params):
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DDIMScheduler

    model, params = model_and_params
    sched = DDIMScheduler.create(num_train_timesteps=50)
    ts = sched.set_timesteps(8)
    base = SamplingEngine(model, sched, ts)
    cached = SamplingEngine(model, sched, ts, deep_cache=(1, 1))
    rng = jax.random.PRNGKey(5)
    out_base = np.asarray(base(params, (2, 1, 16, 16), rng))
    out_cached = np.asarray(cached(params, (2, 1, 16, 16), rng))
    np.testing.assert_allclose(out_cached, out_base, atol=1e-5)


def test_engine_cached_sampling_is_close(model_and_params):
    """interval=3: cached trajectories stay finite and near the exact ones on
    this tiny model (quality-at-scale is measured on TPU, BENCHMARKS.md)."""
    from fmdm_tpu.sample.engine import SamplingEngine
    from fmdm_tpu.schedulers import DDIMScheduler

    model, params = model_and_params
    sched = DDIMScheduler.create(num_train_timesteps=50)
    ts = sched.set_timesteps(9)
    base = SamplingEngine(model, sched, ts)
    cached = SamplingEngine(model, sched, ts, deep_cache=(3, 1))
    rng = jax.random.PRNGKey(5)
    out_base = np.asarray(base(params, (2, 1, 16, 16), rng))
    out_cached = np.asarray(cached(params, (2, 1, 16, 16), rng))
    assert np.all(np.isfinite(out_cached))
    assert np.abs(out_cached - out_base).mean() < 0.5 * np.abs(out_base).std() + 0.1


def test_run_model_deep_cache_flag_parsing():
    from fmdm_tpu.run_model import _parse_deep_cache

    assert _parse_deep_cache(None) is None
    assert _parse_deep_cache("3") == (3, 1, "adaptive")
    assert _parse_deep_cache("5:2") == (5, 2, "adaptive")
    assert _parse_deep_cache("3:1:uniform") == (3, 1, "uniform")
    with pytest.raises(ValueError):
        _parse_deep_cache("3:1:sometimes")


def test_refresh_mask_schedules():
    from fmdm_tpu.sample.engine import deep_cache_refresh_mask

    uni = deep_cache_refresh_mask(50, 3, "uniform")
    assert uni.sum() == 17 and uni[0] and not uni[1]
    ada = deep_cache_refresh_mask(50, 3, "adaptive")
    # head (15%) and tail (10%) windows are always-full
    assert ada[:8].all() and ada[45:].all()
    # uniform backbone in between
    assert ada[::3].all()
    assert ada.sum() > uni.sum()
    # interval 1 == every step full, both schedules
    assert deep_cache_refresh_mask(10, 1, "uniform").all()
    assert deep_cache_refresh_mask(10, 1, "adaptive").all()


def test_decode_path_honors_deep_cache(model_and_params, monkeypatch):
    """decode_diffusion_batch builds a cached engine when set_deep_cache is
    active, and ignores it (with a warning) for models without the split."""
    from fmdm_tpu.sample import diffusion_utils as du

    model, params = model_and_params
    training_cfg = {"num_train_timesteps": 50, "num_inference_steps": 6,
                    "scheduler": "ddim", "conditioning": None}
    try:
        du.set_deep_cache((3, 1))
        out = du.decode_diffusion_batch(
            model, params, training_cfg, {}, (2, 1, 16, 16), None,
            rng=jax.random.PRNGKey(0))
        assert np.all(np.isfinite(np.asarray(out)))
        # deep_cache sits second-to-last in the cache key (the quantize mode
        # slot was appended after it — see decode_diffusion_batch cache_key)
        key = next(k for k in du._ENGINE_CACHE if k[0] == id(model) and k[-2] == (3, 1))
        assert du._ENGINE_CACHE[key].deep_cache == (3, 1)
    finally:
        du.set_deep_cache(None)
