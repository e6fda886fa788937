"""Shape/behavior tests for blocks, mirroring the reference self-test matrices
(residual.py:160-219, attention.py:277-341, upsampling.py:65-106)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.nn import (
    DiffusersAttentionND,
    DownsampleND,
    PoolND,
    ResBlockND,
    SpatialCrossAttention,
    SpatialSelfAttention,
    UnPoolND,
    UpsampleND,
)
from fmdm_tpu.nn.module import flatten_params, unflatten_params

KEY = jax.random.PRNGKey(0)

SPATIAL_SHAPES = {1: (1, 32, 33), 2: (1, 32, 33, 33), 3: (1, 16, 17, 17, 17)}

RES_CONFIGS = [
    dict(out_channels=None, use_conv=False, use_scale_shift_norm=False),
    dict(out_channels=None, use_conv=False, use_scale_shift_norm=True),
    dict(out_channels=64, use_conv=False, use_scale_shift_norm=False),
    dict(out_channels=64, use_conv=False, use_scale_shift_norm=True),
    dict(out_channels=64, use_conv=True, use_scale_shift_norm=False),
    dict(out_channels=64, use_conv=True, use_scale_shift_norm=True),
]


@pytest.mark.parametrize("spatial_dims", [1, 2, 3])
@pytest.mark.parametrize("cfg_idx", range(len(RES_CONFIGS)))
def test_resblock_shapes(spatial_dims, cfg_idx):
    cfg = RES_CONFIGS[cfg_idx]
    shape = SPATIAL_SHAPES[spatial_dims]
    x = jax.random.normal(KEY, shape)
    emb = jax.random.normal(KEY, (1, 32))
    block = ResBlockND(
        spatial_dims=spatial_dims, channels=shape[1], emb_channels=32, dropout=0.1, **cfg
    )
    params = block.init(KEY)
    out = block(params, x, emb)
    expected_c = cfg["out_channels"] or shape[1]
    assert out.shape[1] == expected_c
    assert out.shape[2:] == x.shape[2:]


def test_resblock_unconditional():
    x = jax.random.normal(KEY, (1, 32, 16, 16))
    block = ResBlockND(spatial_dims=2, channels=32, emb_channels=None, dropout=0.0)
    params = block.init(KEY)
    out = block(params, x)
    assert out.shape == x.shape


def test_resblock_zero_init_is_identity_plus_skip():
    # zero_init_last_conv=True means at init the block output == skip(x).
    x = jax.random.normal(KEY, (2, 8, 12, 12))
    block = ResBlockND(spatial_dims=2, channels=8, emb_channels=None, dropout=0.0, zero_init_last_conv=True)
    params = block.init(KEY)
    np.testing.assert_allclose(np.asarray(block(params, x)), np.asarray(x), atol=1e-6)


def test_resblock_scale_shift_matches_additive_difference():
    # FiLM path should differ from additive path (sanity that flags route).
    x = jax.random.normal(KEY, (2, 8, 12, 12))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    film = ResBlockND(spatial_dims=2, channels=8, emb_channels=16, dropout=0.0,
                      use_scale_shift_norm=True, zero_init_last_conv=False)
    add = ResBlockND(spatial_dims=2, channels=8, emb_channels=16, dropout=0.0,
                     use_scale_shift_norm=False, add_embedding_to_hidden=True,
                     zero_init_last_conv=False)
    p1 = film.init(KEY)
    y1 = film(p1, x, emb)
    p2 = add.init(KEY)
    y2 = add(p2, x, emb)
    assert y1.shape == y2.shape == x.shape
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.mark.parametrize("channels,spatial,use_linear", [
    (32, (8, 8), False),
    (32, (8, 8), True),
    (16, (4, 8, 8), False),
    (16, (4, 8, 8), True),
])
def test_spatial_self_attention(channels, spatial, use_linear):
    x = jax.random.normal(KEY, (1, channels, *spatial))
    block = SpatialSelfAttention(dim=channels, heads=4, dim_head=channels // 4, use_linear=use_linear)
    params = block.init(KEY)
    y = block(params, x)
    assert y.shape == x.shape
    # zero-init proj_out => output == input at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_spatial_cross_attention():
    x = jax.random.normal(KEY, (2, 16, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    block = SpatialCrossAttention(dim=16, context_dim=4, heads=4, dim_head=4)
    params = block.init(KEY)
    y = block(params, x, ctx)
    assert y.shape == x.shape


def test_spatial_cross_attention_token_context():
    x = jax.random.normal(KEY, (2, 16, 8, 8))
    block = SpatialCrossAttention(dim=16, context_dim=4, heads=4, dim_head=4)
    params = block.init(KEY)
    # (B, T, C) token layout should also be accepted (attention.py:163-171)
    ctx_tokens = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 4))
    y = block(params, x, ctx_tokens)
    assert y.shape == x.shape


@pytest.mark.parametrize("context_dim", [None, 4])
def test_diffusers_attention(context_dim):
    x = jax.random.normal(KEY, (2, 32, 8, 8))
    block = DiffusersAttentionND(32, heads=4, context_dim=context_dim)
    params = block.init(KEY)
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 8)) if context_dim else None
    y = block(params, x, context=ctx)
    assert y.shape == x.shape
    flat = flatten_params(params)
    assert "to_q.weight" in flat and "to_out.0.weight" in flat


@pytest.mark.parametrize("spatial_dims", [1, 2, 3])
def test_up_down_sample(spatial_dims):
    shapes = {1: (2, 6, 33), 2: (2, 6, 33, 35), 3: (1, 4, 17, 21, 19)}
    x = jax.random.normal(KEY, shapes[spatial_dims])
    c = x.shape[1]
    for use_conv in (False, True):
        up = UpsampleND(spatial_dims, c, use_conv=use_conv)
        y = up(up.init(KEY), x)
        assert y.shape == x.shape[:2] + tuple(s * 2 for s in x.shape[2:])
        down = DownsampleND(spatial_dims, c, use_conv=use_conv)
        z = down(down.init(KEY), x)
        if use_conv:
            expected = tuple((s + 1) // 2 for s in x.shape[2:])
        else:
            expected = tuple(s // 2 for s in x.shape[2:])
        assert z.shape == x.shape[:2] + expected


@pytest.mark.parametrize("spatial_dims", [1, 2, 3])
def test_pool_unpool_roundtrip_shapes(spatial_dims):
    size = 16
    x = jax.random.normal(KEY, (2, 3) + (size,) * spatial_dims)
    pool = PoolND(spatial_dims, 3, 8, 2)
    z = pool(pool.init(KEY), x)
    assert z.shape == (2, 8) + (size // 2,) * spatial_dims
    unpool = UnPoolND(spatial_dims, 8, 3, 2)
    y = unpool(unpool.init(KEY), z)
    assert y.shape == x.shape


def test_flatten_unflatten_roundtrip():
    block = ResBlockND(spatial_dims=2, channels=8, emb_channels=16, dropout=0.0, out_channels=12)
    params = block.init(KEY)
    flat = flatten_params(params)
    # Reference state_dict naming (residual.py:57-82)
    for name in ["norm1.weight", "conv1.conv.weight", "emb_layers.weight",
                 "norm2.bias", "conv2.conv.bias", "skip_connection.conv.weight"]:
        assert name in flat, f"missing {name}"
    rebuilt = unflatten_params(flat)
    x = jax.random.normal(KEY, (1, 8, 8, 8))
    emb = jax.random.normal(KEY, (1, 16))
    np.testing.assert_allclose(
        np.asarray(block(params, x, emb)), np.asarray(block(rebuilt, x, emb))
    )
