"""Every shipped config must load and build its model through the factories
(the 'existing configs work unchanged' contract, BASELINE.json targets)."""

import json
from pathlib import Path

import pytest

import jax

from fmdm_tpu.models.factories import DiffusionUNetFactory, VAEFactory
from fmdm_tpu.schedulers import build_scheduler, resolve_conditioning_mode

CONFIG_ROOT = Path(__file__).resolve().parent.parent / "configs"
ALL_CONFIGS = sorted(p for p in CONFIG_ROOT.rglob("*.json") if p.name != "dataset.json")


@pytest.mark.parametrize("cfg_path", ALL_CONFIGS, ids=lambda p: str(p.relative_to(CONFIG_ROOT)))
def test_config_builds_model(cfg_path):
    cfg = json.loads(cfg_path.read_text())
    assert "training" in cfg and "model" in cfg
    model_type = str(cfg["model"].get("model_type", "")).lower()
    assert model_type in {"vae", "diffusion", "flow_matching"}

    if model_type == "vae":
        model = VAEFactory().build_from_json(cfg_path)
        assert model is not None
    else:
        training_cfg = cfg["training"]
        conditioning = resolve_conditioning_mode(
            training_cfg.get("conditioning") or cfg["model"].get("conditioning")
        )
        channels = int(training_cfg.get("channels", 1))
        model = DiffusionUNetFactory().build(cfg["model"].get("unet", {}), conditioning, channels)
        assert model is not None
        sched, n = build_scheduler(cfg["model"].get("scheduler", {}), training_cfg)
        assert n > 0


@pytest.mark.parametrize("cfg_name", [
    "MNIST/mnist_ddpm_test.json",
    "LDCT/LDCT_ddpm_test.json",
    "LDCT/LDCT_flow_matching_test.json",
    "LDCT/PixelAttention/LDCT_ddpm_attention_test.json",
])
def test_tiny_config_forward(cfg_name):
    """Tiny *_test configs must produce a working forward pass."""
    import jax.numpy as jnp

    cfg = json.loads((CONFIG_ROOT / cfg_name).read_text())
    training_cfg = cfg["training"]
    conditioning = resolve_conditioning_mode(training_cfg.get("conditioning"))
    channels = int(training_cfg.get("channels", 1))
    model = DiffusionUNetFactory().build(cfg["model"]["unet"], conditioning, channels)
    params = model.init(jax.random.PRNGKey(0))
    size = int(training_cfg.get("img_size", 32))
    in_ch = model.in_channels if hasattr(model, "in_channels") else channels
    x = jnp.zeros((1, in_ch, size, size))
    ctx = jnp.zeros((1, 4, size, size)) if conditioning == "attention" else None
    y = model(params, x, jnp.array([1]), context_ca=ctx)
    assert y.shape == (1, channels, size, size)
