"""
VAE model construction + batch encode/decode/reconstruct.

Behavioral parity with /root/reference/src/utils/model_utils/vae_utils.py:14-105.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fmdm_tpu.models.factories import VAEFactory
from fmdm_tpu.nn.module import flatten_params, unflatten_params
from fmdm_tpu.utils.checkpoint import load_checkpoint


def build_vae_model(cfg: dict, ckpt_path=None, rng: Optional[jax.Array] = None):
    """Build (model, params) from a full config dict with __config_path__
    (vae_utils.py:14-51). Loads payload['model'] or a bare state_dict."""
    cfg_path = cfg.get("__config_path__")
    if not cfg_path:
        raise ValueError("Config missing __config_path__; load it via load_json_config.")
    model = VAEFactory().build_from_json(cfg_path)
    seed = int(cfg.get("training", {}).get("seed") or 0)
    params = model.init(rng if rng is not None else jax.random.PRNGKey(seed))
    if ckpt_path is not None:
        payload = load_checkpoint(ckpt_path)
        tree = payload.get("model", payload)
        flat = {k: np.asarray(v) for k, v in flatten_params(tree).items()}
        expected = flatten_params(params)
        missing = [k for k in expected if k not in flat]
        if missing:
            raise RuntimeError(f"VAE checkpoint missing keys: {missing[:10]}")
        params = unflatten_params({k: flat[k] for k in expected})
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params


def encode_vae_batch(model, params, batch: jax.Array) -> jax.Array:
    """images [0,1] -> latents via posterior mode (vae_utils.py:54-68)."""
    inputs = model.image_to_model_range(batch)
    out = model.encode(params, inputs)
    if hasattr(out, "mode"):
        return out.mode()
    return out


def decode_vae_batch(model, params, latents: jax.Array, recon_type: str = "l1") -> jax.Array:
    """latents -> images in [0,1] (vae_utils.py:71-85)."""
    rec = model.decode(params, latents)
    return jnp.clip(model.raw_output_to_image(rec, recon_type=recon_type), 0.0, 1.0)


def reconstruct_vae_batch(model, params, batch: jax.Array, recon_type: str = "l1") -> jax.Array:
    """images -> recon images (vae_utils.py:88-105)."""
    inputs = model.image_to_model_range(batch)
    if hasattr(model, "codebook"):
        rec, _ = model(params, inputs)
    else:
        rec, _ = model(params, inputs, sample_posterior=False)
    return jnp.clip(model.raw_output_to_image(rec, recon_type=recon_type), 0.0, 1.0)


def run_self_tests() -> None:
    """Embedded self-test (reference model_utils/vae_utils.py self-test tier):
    config-driven VAE build + encode/decode round-trip shapes."""
    import json
    import tempfile

    cfg = {"model": {"model_type": "vae", "latent_type": "kl", "in_channels": 1,
                     "out_channels": 1, "resolution": 16, "base_ch": 8,
                     "ch_mult": [1, 2], "num_res_blocks": 1, "z_channels": 2,
                     "embed_dim": 2, "use_attention": False},
           "training": {}}
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump(cfg, fh)
        cfg["__config_path__"] = fh.name
    model, params = build_vae_model(cfg, rng=jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 16, 16))
    z = encode_vae_batch(model, params, x)
    assert z.shape[0] == 2 and z.shape[1] == 2
    rec = decode_vae_batch(model, params, z)
    assert rec.shape == x.shape
    rt = reconstruct_vae_batch(model, params, x)
    assert rt.shape == x.shape and bool(jnp.all(jnp.isfinite(rt)))
