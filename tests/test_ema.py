"""Weight-EMA (training.ema_decay / run_model --use_ema) — beyond-reference
quality lever; the torch reference EMAs only VQ codebooks
(/root/reference/src/nn/modules/vae/codebook.py), never model weights."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fmdm_tpu.schedulers import build_scheduler
from fmdm_tpu.train.common import make_denoise_train_step


def _tree_np(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x, np.float64), tree)


def test_ema_recurrence_matches_numpy():
    """ema_k = decay*ema_{k-1} + (1-decay)*params_k over the live trajectory."""
    decay = 0.8
    model = lambda p, x, t, context_ca=None: x * p["w"] + p["b"]
    params = {"w": jnp.ones((1,), jnp.float32) * 0.5, "b": jnp.zeros((1,), jnp.float32)}
    scheduler, _ = build_scheduler({"name": "ddpm", "num_train_timesteps": 10}, {})
    optimizer = optax.sgd(0.1)
    opt_state = optimizer.init(params)
    step = make_denoise_train_step(
        model, scheduler, optimizer, variant="diffusion",
        conditioning_mode=None, latent_norm=None, ema_decay=decay)

    ema = jax.tree_util.tree_map(jnp.copy, params)
    expected = _tree_np(params)
    rng = jax.random.PRNGKey(0)
    for k in range(4):
        batch = {
            "target": jnp.ones((2, 1, 4, 4), jnp.float32) * (k + 1) / 4.0,
            "image": None,
            "valid": jnp.ones((2,), jnp.float32),
        }
        rng, sk = jax.random.split(rng)
        params, opt_state, ema, loss_sum, count = step(params, opt_state, ema, batch, sk)
        live = _tree_np(params)
        expected = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, expected, live)

    np.testing.assert_allclose(np.asarray(ema["w"]), expected["w"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ema["b"]), expected["b"], rtol=1e-5)
    # the shadow lags the live weights (they moved every step)
    assert not np.allclose(np.asarray(ema["w"]), np.asarray(params["w"]))


def test_ema_decay_validation():
    model = lambda p, x, t, context_ca=None: x
    scheduler, _ = build_scheduler({"name": "ddpm", "num_train_timesteps": 10}, {})
    with pytest.raises(ValueError, match="ema_decay"):
        make_denoise_train_step(
            model, scheduler, optax.sgd(0.1), variant="diffusion",
            conditioning_mode=None, latent_norm=None, ema_decay=1.5)


@pytest.fixture(scope="module")
def ema_run(tmp_path_factory):
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    tmp_path = tmp_path_factory.mktemp("ema")
    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 2
    cfg["training"]["save_images"] = False
    cfg["training"]["ema_decay"] = 0.9
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=16)
    run_dir = train(ds, cfg_path)
    return tmp_path, cfg_path, ds, run_dir


def test_checkpoint_carries_ema_tree(ema_run):
    from fmdm_tpu.utils.checkpoint import load_checkpoint

    _, _, _, run_dir = ema_run
    payload = load_checkpoint(run_dir / "diff_last.pt")
    assert "ema" in payload
    live = jax.tree_util.tree_leaves(payload["model"])
    shadow = jax.tree_util.tree_leaves(payload["ema"])
    assert len(live) == len(shadow)
    assert all(np.shape(a) == np.shape(b) for a, b in zip(live, shadow))
    # two epochs of SGD moved the live weights away from the lagging shadow
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(live, shadow))


def test_resume_preserves_ema(ema_run):
    from fmdm_tpu.train.diffusion_lib import train
    from fmdm_tpu.utils.checkpoint import load_checkpoint

    tmp_path, cfg_path, ds, run_dir = ema_run
    cfg = json.loads(Path(cfg_path).read_text())
    cfg["training"]["num_epochs"] = 3
    cfg["training"]["output_dir"] = str(run_dir)
    cfg_path.write_text(json.dumps(cfg))
    run_dir2 = train(ds, cfg_path, resume=str(run_dir / "diff_last.pt"))
    payload = load_checkpoint(Path(run_dir2) / "diff_last.pt")
    assert payload["epoch"] == 3 and "ema" in payload


def test_build_model_selects_ema_tree(ema_run):
    from fmdm_tpu.sample import diffusion_utils as du
    from fmdm_tpu.utils.checkpoint import load_checkpoint

    _, cfg_path, _, run_dir = ema_run
    cfg = json.loads(Path(cfg_path).read_text())
    payload = load_checkpoint(run_dir / "diff_last.pt")
    du.set_use_ema(True)
    try:
        _, params = du.build_diffusion_model(cfg, ckpt_path=run_dir / "diff_last.pt")
    finally:
        du.set_use_ema(False)
    from fmdm_tpu.sample.diffusion_utils import flatten_params

    got = flatten_params(jax.tree_util.tree_map(np.asarray, params))
    want = flatten_params(payload["ema"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], np.asarray(want[k]), rtol=1e-6)


def test_use_ema_without_ema_tree_fails_loudly(tmp_path):
    from fmdm_tpu.sample import diffusion_utils as du
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True, n=8)
    run_dir = train(ds, cfg_path)
    du.set_use_ema(True)
    try:
        with pytest.raises(ValueError, match="ema"):
            du.build_diffusion_model(cfg, ckpt_path=run_dir / "diff_last.pt")
    finally:
        du.set_use_ema(False)


def test_handler_samples_from_ema(ema_run, tmp_path):
    from fmdm_tpu.sample import diffusion_utils as du
    from fmdm_tpu.sample.handlers import DiffusionHandler

    _, _, _, run_dir = ema_run
    kwargs = dict(
        ckpt_dir=run_dir, batch_size=4, seed=1, num_samples=4,
        num_inference_steps=3, save=True,
        data_txt=None, device=None, save_input=False, save_conditioning=False,
        start_step=None, last_n_steps=None, scheduler=None,
        save_tensor_cache=False, timestep=None,
    )
    du.set_use_ema(True)
    try:
        DiffusionHandler(output_dir=str(tmp_path / "ema_out"), **kwargs).sample()
    finally:
        du.set_use_ema(False)
    assert (tmp_path / "ema_out" / "predicted").exists()
