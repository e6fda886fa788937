"""Fused GroupNorm+FiLM+SiLU Pallas kernel vs the XLA reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.ops.norm import group_norm
from fmdm_tpu.ops.pallas.group_norm import fused_group_norm_act


def _ref(x, w, b, groups, eps, act, scale=None, shift=None):
    out = group_norm(x, w, b, num_groups=groups, eps=eps)
    if scale is not None:
        out = out * (1 + scale[..., None, None]) + shift[..., None, None]
    if act:
        out = jax.nn.silu(out)
    return out


import fmdm_tpu.ops.pallas.group_norm as gn_mod


@pytest.fixture(autouse=True)
def _enable_fused():
    gn_mod.set_fused_group_norm(True)
    yield
    gn_mod.set_fused_group_norm(False)


@pytest.mark.parametrize("shape,groups", [
    ((2, 32, 16, 16), 8),   # cg*S = 4*256 = 1024 -> tiles
    ((1, 64, 32, 32), 32),  # cg*S = 2*1024
    ((2, 8, 64, 64), 4),
])
def test_fused_matches_xla(shape, groups):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    c = shape[1]
    w = jax.random.normal(jax.random.PRNGKey(1), (c,)) * 0.1 + 1.0
    b = jax.random.normal(jax.random.PRNGKey(2), (c,)) * 0.1
    ours = np.asarray(fused_group_norm_act(x, w, b, num_groups=groups, act=True))
    ref = np.asarray(_ref(x, w, b, groups, 1e-5, True))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_fused_with_film():
    shape, groups = (2, 32, 16, 16), 8
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    w = jnp.ones((32,))
    b = jnp.zeros((32,))
    scale = jax.random.normal(jax.random.PRNGKey(3), (2, 32)) * 0.2
    shift = jax.random.normal(jax.random.PRNGKey(4), (2, 32)) * 0.2
    ours = np.asarray(fused_group_norm_act(x, w, b, num_groups=groups, act=True,
                                           scale=scale, shift=shift))
    ref = np.asarray(_ref(x, w, b, groups, 1e-5, True, scale, shift))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_xla():
    shape, groups = (1, 16, 16, 16), 4
    x = jax.random.normal(jax.random.PRNGKey(5), shape)
    w = jnp.ones((16,)) * 1.1
    b = jnp.zeros((16,)) + 0.1

    def loss_fused(x, w, b):
        return jnp.sum(fused_group_norm_act(x, w, b, num_groups=groups, act=True) ** 2)

    def loss_ref(x, w, b):
        return jnp.sum(_ref(x, w, b, groups, 1e-5, True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), rtol=5e-4, atol=5e-5)


def test_small_shapes_fall_back():
    # spatial too small to tile: must still be exact (XLA path)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 4, 4))
    w, b = jnp.ones((8,)), jnp.zeros((8,))
    ours = np.asarray(fused_group_norm_act(x, w, b, num_groups=4, act=True))
    ref = np.asarray(_ref(x, w, b, 4, 1e-5, True))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_resblock_uses_fusion_and_stays_exact():
    """ResBlockND output must be identical with fusion on/off."""
    from fmdm_tpu.nn.blocks import ResBlockND
    from fmdm_tpu.ops.pallas.group_norm import set_fused_group_norm

    block = ResBlockND(channels=16, emb_channels=32, dropout=0.0, out_channels=16,
                       use_scale_shift_norm=True, zero_init_last_conv=False, norm_groups=8)
    params = block.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    try:
        set_fused_group_norm(True)
        y_fused = np.asarray(block(params, x, emb))
        set_fused_group_norm(False)
        y_plain = np.asarray(block(params, x, emb))
    finally:
        set_fused_group_norm(False)
    np.testing.assert_allclose(y_fused, y_plain, rtol=2e-4, atol=2e-5)
