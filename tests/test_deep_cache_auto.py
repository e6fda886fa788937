"""DeepCache quality-budget autotune (`run_model --deep_cache auto:<dPSNR>`,
VERDICT r4 item #5): flag grammar, budget-ordered candidate selection, the
unresolved-auto guard, and the evaluate-mode end-to-end hook."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.models.factories import DiffusionUNetFactory
from fmdm_tpu.run_model import _parse_deep_cache
from fmdm_tpu.sample import diffusion_utils as du

UNET = {
    "unet_impl": "diffusers_nd", "sample_size": 16, "in_channels": 1,
    "out_channels": 1, "layers_per_block": 1, "norm_num_groups": 4,
    "block_out_channels": [8, 16],
    "down_block_types": ["DownBlock2D", "DownBlock2D"],
    "up_block_types": ["UpBlock2D", "UpBlock2D"],
}


@pytest.fixture
def tiny():
    model = DiffusionUNetFactory().build(UNET, conditioning=None, channels=1)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(autouse=True)
def _reset_deep_cache():
    yield
    du.set_deep_cache(None)


def test_auto_flag_grammar():
    assert _parse_deep_cache("auto") == ("auto", 0.5)
    assert _parse_deep_cache("auto:1.5") == ("auto", 1.5)
    assert _parse_deep_cache("auto:") == ("auto", 0.5)
    with pytest.raises(ValueError):
        _parse_deep_cache("auto:0")
    with pytest.raises(ValueError):
        _parse_deep_cache("auto:-1")


def test_unresolved_auto_refuses_to_decode(tiny):
    """Reference-less modes can't probe; the decode path must fail loudly
    instead of silently sampling exact (or worse, crashing in the engine)."""
    model, params = tiny
    du.set_deep_cache(("auto", 0.5))
    with pytest.raises(RuntimeError, match="deep_cache auto"):
        du.decode_diffusion_batch(
            model, params, {"num_train_timesteps": 10},
            {"scheduler": {"name": "ddim"}}, (1, 1, 16, 16),
            rng=jax.random.PRNGKey(0), num_inference_steps=2)


def _fake_decoder(drops):
    """decode_diffusion_batch stand-in: exact (deep_cache None) returns the
    targets (infinite PSNR -> clipped to 120 by the probe's mse floor);
    candidates return targets + noise scaled to cost ~drops[interval] dB."""

    def fake(model, params, tcfg, mcfg, shape, cond=None, rng=None, **kw):
        t = np.full(shape, 0.5, np.float32)
        setting = du._DEEP_CACHE
        if setting is None:
            return jnp.asarray(t)
        interval = setting[0]
        # PSNR(base)=120 (mse floor 1e-12); make the candidate's PSNR
        # 120 - drop by direct construction: mse = 10^-(psnr/10)
        mse = 10.0 ** (-(120.0 - drops[interval]) / 10.0)
        delta = np.sqrt(mse)
        noisy = t + delta * np.sign(
            np.random.default_rng(0).standard_normal(shape))
        return jnp.asarray(noisy.astype(np.float32))

    return fake


def test_auto_picks_most_aggressive_within_budget(tiny, monkeypatch):
    model, params = tiny
    targets = np.full((2, 1, 16, 16), 0.5, np.float32)
    # interval -> PSNR cost: 5 and 4 bust a 1.0 budget, 3 fits
    monkeypatch.setattr(du, "decode_diffusion_batch",
                        _fake_decoder({5: 5.0, 4: 2.0, 3: 0.8, 2: 0.2}))
    du.set_deep_cache(("auto", 1.0))
    chosen = du.resolve_auto_deep_cache(
        model, params, {"num_train_timesteps": 10},
        {"scheduler": {"name": "ddim"}}, targets)
    assert chosen == (3, 1, "adaptive")
    assert du._DEEP_CACHE == (3, 1, "adaptive")


def test_auto_falls_back_to_exact_when_nothing_fits(tiny, monkeypatch):
    model, params = tiny
    targets = np.full((2, 1, 16, 16), 0.5, np.float32)
    monkeypatch.setattr(du, "decode_diffusion_batch",
                        _fake_decoder({5: 5.0, 4: 4.0, 3: 3.0, 2: 2.0}))
    du.set_deep_cache(("auto", 0.5))
    chosen = du.resolve_auto_deep_cache(
        model, params, {"num_train_timesteps": 10},
        {"scheduler": {"name": "ddim"}}, targets)
    assert chosen is None
    assert du._DEEP_CACHE is None


def test_auto_resolves_real_probe_on_tiny_model(tiny):
    """No mocks: with a huge budget the very first (most aggressive)
    candidate must be accepted, through real engine probes."""
    model, params = tiny
    targets = np.random.default_rng(0).random((2, 1, 16, 16)).astype(np.float32)
    du.set_deep_cache(("auto", 99.0))
    chosen = du.resolve_auto_deep_cache(
        model, params, {"num_train_timesteps": 10},
        {"scheduler": {"name": "ddim"}}, targets,
        num_inference_steps=3)
    assert chosen == du._AUTO_CANDIDATES[0]
    assert du._DEEP_CACHE == chosen


def test_evaluate_mode_resolves_auto_end_to_end(tmp_path):
    """The production evaluate handler must resolve an installed auto spec
    on its first reference batch and finish the run with a concrete
    schedule (run_model --mode evaluate --deep_cache auto:<x>)."""
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train
    from fmdm_tpu.sample.handlers import DiffusionHandler

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=16)
    run_dir = train(ds, cfg_path)

    du.set_deep_cache(("auto", 99.0))
    try:
        handler = DiffusionHandler(
            ckpt_dir=run_dir, batch_size=4, seed=1, num_samples=4,
            num_inference_steps=3, save=False,
            data_txt=None, output_dir=None, device=None,
            save_input=False, save_conditioning=False,
            start_step=None, last_n_steps=None, scheduler="ddim",
            save_tensor_cache=False, timestep=None,
        )
        handler.evaluate()
        assert not du._deep_cache_is_auto(du._DEEP_CACHE)
        assert du._DEEP_CACHE == du._AUTO_CANDIDATES[0]  # budget 99 -> first
    finally:
        du.set_deep_cache(None)
    assert (run_dir / "eval_metrics.csv").exists()
