"""UNet model tests mirroring the reference self-test variants
(unet.py:329-420) plus UNetDiffusersND forward/jit checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.models import DiffusionUNetFactory, EfficientUNetND, UNetDiffusersND
from fmdm_tpu.nn.module import flatten_params, param_count

KEY = jax.random.PRNGKey(0)

EFFICIENT_VARIANTS = [
    dict(
        name="1d_linear_conv", spatial_dims=1, in_channels=3, model_channels=8,
        out_channels=3, attention_resolutions=(1,), channel_mult=(1, 2),
        conv_resample=True, dim_head=16, num_heads=2, use_linear_attn=True,
        pool_factor=1, input_shape=(2, 3, 64),
    ),
    dict(
        name="2d_no_conv_nonlinear", spatial_dims=2, in_channels=3, model_channels=16,
        out_channels=3, attention_resolutions=(1, 2), channel_mult=(1, 2, 4),
        conv_resample=False, dim_head=32, num_heads=2, use_linear_attn=False,
        pool_factor=1, input_shape=(2, 3, 48, 48),
    ),
    dict(
        name="2d_cross_attention", spatial_dims=2, in_channels=3, model_channels=8,
        out_channels=3, attention_resolutions=(1,), cross_attention_resolutions=(1,),
        channel_mult=(1, 2), conv_resample=True, dim_head=16, num_heads=2,
        use_linear_attn=False, pool_factor=1, cross_attention_dim=4,
        input_shape=(2, 3, 32, 32), context_shape=(2, 4, 32, 32),
    ),
    dict(
        name="3d_pooled_linear", spatial_dims=3, in_channels=2, model_channels=8,
        out_channels=2, attention_resolutions=(1, 2), channel_mult=(1, 2),
        conv_resample=True, dim_head=16, num_heads=2, use_linear_attn=True,
        pool_factor=2, input_shape=(1, 2, 32, 32, 32),
    ),
]


@pytest.mark.parametrize("cfg", EFFICIENT_VARIANTS, ids=lambda c: c["name"])
def test_efficient_unet_variants(cfg):
    kwargs = {k: v for k, v in cfg.items() if k not in {"name", "input_shape", "context_shape"}}
    model = EfficientUNetND(num_res_blocks=1, dropout=0.0, use_scale_shift_norm=True, **kwargs)
    params = model.init(KEY)
    x = jax.random.normal(KEY, cfg["input_shape"])
    t = jax.random.uniform(KEY, (cfg["input_shape"][0],))
    if "context_shape" in cfg:
        ctx = jax.random.normal(KEY, cfg["context_shape"])
        y = model(params, x, t, context_ca=ctx)
    else:
        y = model(params, x, t)
    assert y.shape == (cfg["input_shape"][0], cfg["out_channels"], *cfg["input_shape"][2:])


def _small_diffusers_unet(**over):
    kwargs = dict(
        spatial_dims=2, in_channels=1, out_channels=1,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16, 16), layers_per_block=1, norm_num_groups=4,
    )
    kwargs.update(over)
    return UNetDiffusersND(**kwargs)


def test_unet_diffusers_forward_and_jit():
    model = _small_diffusers_unet()
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 1, 32, 32))
    y = model(params, x, jnp.array([5, 10]))
    assert y.shape == x.shape
    # scalar timestep broadcast (base.py:15-20)
    y2 = model(params, x, 7)
    assert y2.shape == x.shape
    jitted = jax.jit(lambda p, x, t: model(p, x, t))
    y3 = jitted(params, x, jnp.array([5, 10]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y3), rtol=2e-4, atol=2e-4)


def test_unet_diffusers_param_names_match_torch_layout():
    model = _small_diffusers_unet()
    flat = flatten_params(model.init(KEY))
    expected = [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "time_embedding.linear_2.bias",
        "down_blocks.0.resnets.0.conv1.conv.weight",
        "down_blocks.0.resnets.0.emb_layers.weight",
        "down_blocks.0.downsamplers.0.op.conv.weight",
        "down_blocks.1.attentions.0.to_q.weight",
        "down_blocks.1.attentions.0.to_out.0.weight",
        "mid_block.resnets.0.norm1.weight",
        "mid_block.attentions.0.to_k.weight",
        "up_blocks.1.upsamplers.0.conv.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]
    for name in expected:
        assert name in flat, f"missing {name}"


def test_unet_diffusers_cross_attention():
    model = _small_diffusers_unet(
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D", "CrossAttnUpBlock2D"),
        mid_block_type="UNetMidBlock2DCrossAttn",
        cross_attention_dim=4,
    )
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 1, 32, 32))
    ctx = jax.random.normal(KEY, (2, 4, 32, 32))
    y = model(params, x, jnp.array([1, 2]), context_ca=ctx)
    assert y.shape == x.shape


def test_factory_mnist_config_shapes():
    # Mirrors configs/MNIST/mnist_ddpm_diffusers_nd.json model.unet
    unet_cfg = {
        "unet_impl": "diffusers_nd",
        "sample_size": 32,
        "in_channels": 1,
        "out_channels": 1,
        "layers_per_block": 2,
        "block_out_channels": [64, 128, 128],
        "down_block_types": ["DownBlock2D", "AttnDownBlock2D", "DownBlock2D"],
        "up_block_types": ["UpBlock2D", "AttnUpBlock2D", "UpBlock2D"],
    }
    model = DiffusionUNetFactory().build(unet_cfg, conditioning="concatenate", channels=1)
    # concatenate conditioning adds channels (diffusionfactory.py:90-92)
    assert model.in_channels == 2
    params = model.init(KEY)
    x = jax.random.normal(KEY, (2, 1, 32, 32))
    cond = jax.random.normal(KEY, (2, 1, 32, 32))
    y = model(params, jnp.concatenate([x, cond], axis=1), jnp.array([3, 4]))
    assert y.shape == (2, 1, 32, 32)


def test_factory_efficient_defaults():
    model = DiffusionUNetFactory().build({"model_channels": 8, "channel_mult": [1, 2],
                                          "num_res_blocks": 1, "attention_resolutions": [2]},
                                         conditioning=None, channels=1)
    assert isinstance(model, EfficientUNetND)
    params = model.init(KEY)
    x = jax.random.normal(KEY, (1, 1, 16, 16))
    y = model(params, x, 3)
    assert y.shape == x.shape
