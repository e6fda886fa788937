"""Golden tests for ND primitive ops against torch-CPU references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from fmdm_tpu.ops import (  # noqa: E402
    avg_pool_nd,
    conv_nd,
    conv_transpose_nd,
    group_norm,
    linear_attention,
    max_pool_nd,
    rms_norm_nd,
    sdpa_xla,
    timestep_embedding,
    upsample_nearest,
)

RNG = np.random.RandomState(0)


def _rand(*shape):
    return RNG.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("nd,shape,kernel", [
    (1, (2, 3, 17), 3),
    (2, (2, 3, 9, 11), 3),
    (2, (2, 4, 8, 8), 1),
    (3, (1, 2, 5, 6, 7), 3),
])
def test_conv_nd_matches_torch(nd, shape, kernel):
    x = _rand(*shape)
    w = _rand(5, shape[1], *([kernel] * nd))
    b = _rand(5)
    ours = np.asarray(conv_nd(jnp.array(x), jnp.array(w), jnp.array(b), padding=kernel // 2))
    fn = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[nd]
    theirs = fn(torch.tensor(x), torch.tensor(w), torch.tensor(b), padding=kernel // 2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nd,stride", [(1, 2), (2, 2), (3, 2), (2, 3)])
def test_conv_nd_strided(nd, stride):
    x = _rand(2, 3, *([13] * nd))
    w = _rand(4, 3, *([3] * nd))
    ours = np.asarray(conv_nd(jnp.array(x), jnp.array(w), None, stride=stride, padding=1))
    fn = {1: F.conv1d, 2: F.conv2d, 3: F.conv3d}[nd]
    theirs = fn(torch.tensor(x), torch.tensor(w), None, stride=stride, padding=1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_conv_nd_groups():
    x = _rand(2, 6, 10, 10)
    w = _rand(8, 3, 3, 3)
    ours = np.asarray(conv_nd(jnp.array(x), jnp.array(w), None, groups=2, padding=1))
    theirs = F.conv2d(torch.tensor(x), torch.tensor(w), None, groups=2, padding=1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nd,k,s,p,op", [
    (1, 2, 2, 0, 0),
    (2, 2, 2, 0, 0),
    (2, 4, 2, 1, 0),
    (2, 3, 2, 1, 1),
    (3, 2, 2, 0, 0),
])
def test_conv_transpose_nd_matches_torch(nd, k, s, p, op):
    x = _rand(2, 3, *([7] * nd))
    w = _rand(3, 4, *([k] * nd))
    b = _rand(4)
    ours = np.asarray(
        conv_transpose_nd(jnp.array(x), jnp.array(w), jnp.array(b), stride=s, padding=p, output_padding=op)
    )
    fn = {1: F.conv_transpose1d, 2: F.conv_transpose2d, 3: F.conv_transpose3d}[nd]
    theirs = fn(torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=s, padding=p, output_padding=op).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("groups,channels", [(32, 64), (8, 8), (2, 6), (1, 3)])
def test_group_norm_matches_torch(groups, channels):
    x = _rand(2, channels, 5, 7)
    w, b = _rand(channels), _rand(channels)
    ours = np.asarray(group_norm(jnp.array(x), jnp.array(w), jnp.array(b), num_groups=groups, eps=1e-5))
    theirs = F.group_norm(torch.tensor(x), groups, torch.tensor(w), torch.tensor(b), eps=1e-5).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_rms_norm_matches_reference_formula():
    # Reference RMSNormND normalizes over ALL non-batch dims (normalization.py:22-34).
    x = _rand(2, 4, 5, 5)
    w = _rand(4)
    ours = np.asarray(rms_norm_nd(jnp.array(x), jnp.array(w), eps=1e-6))
    xt = torch.tensor(x)
    rms = torch.sqrt(torch.mean(xt.pow(2), dim=(1, 2, 3), keepdim=True) + 1e-6)
    theirs = (torch.tensor(w).view(1, -1, 1, 1) * xt / rms).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("nd", [1, 2, 3])
def test_pools_match_torch(nd):
    x = _rand(2, 3, *([8] * nd))
    a_ours = np.asarray(avg_pool_nd(jnp.array(x), 2, 2))
    m_ours = np.asarray(max_pool_nd(jnp.array(x), 2, 2))
    afn = {1: F.avg_pool1d, 2: F.avg_pool2d, 3: F.avg_pool3d}[nd]
    mfn = {1: F.max_pool1d, 2: F.max_pool2d, 3: F.max_pool3d}[nd]
    np.testing.assert_allclose(a_ours, afn(torch.tensor(x), 2, 2).numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(m_ours, mfn(torch.tensor(x), 2, 2).numpy(), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("nd", [1, 2, 3])
def test_upsample_nearest_matches_torch(nd):
    x = _rand(2, 3, *([5] * nd))
    ours = np.asarray(upsample_nearest(jnp.array(x), 2))
    theirs = F.interpolate(torch.tensor(x), scale_factor=2, mode="nearest").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dim,flip,shift", [(64, True, 0), (64, False, 0), (65, True, 0), (32, True, 1)])
def test_timestep_embedding_matches_reference_formula(dim, flip, shift):
    # Mirrors /root/reference/src/nn/ops/time_embedding.py:4-32 math exactly.
    import math

    t = np.array([0.0, 1.0, 10.0, 999.0], dtype=np.float32)
    ours = np.asarray(timestep_embedding(jnp.array(t), dim, flip_sin_to_cos=flip, freq_shift=shift))
    half = dim // 2
    exponent = -math.log(10000) * np.arange(half, dtype=np.float32) / max(half - shift, 1)
    args = t[:, None] * np.exp(exponent)[None, :]
    emb = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
    if flip:
        emb = np.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2:
        emb = np.concatenate([emb, np.zeros_like(emb[:, :1])], axis=-1)
    # f32 exp rounding differs slightly between XLA and numpy; tolerance reflects that.
    np.testing.assert_allclose(ours, emb, rtol=5e-4, atol=5e-5)


def test_sdpa_matches_torch():
    q, k, v = _rand(2, 4, 8, 16), _rand(2, 4, 8, 16), _rand(2, 4, 8, 16)
    ours = np.asarray(sdpa_xla(jnp.array(q), jnp.array(k), jnp.array(v)))
    theirs = F.scaled_dot_product_attention(torch.tensor(q), torch.tensor(k), torch.tensor(v)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_linear_attention_matches_reference_formula():
    # Mirrors /root/reference/src/nn/blocks/attention.py:63-70.
    q, k, v = _rand(2, 4, 8, 16), _rand(2, 4, 8, 16), _rand(2, 4, 8, 16)
    ours = np.asarray(linear_attention(jnp.array(q), jnp.array(k), jnp.array(v)))
    qt, kt, vt = torch.tensor(q), torch.tensor(k), torch.tensor(v)
    k_soft = torch.softmax(kt, dim=-2)
    q_soft = torch.softmax(qt, dim=-1)
    context = torch.einsum("...nd,...ne->...de", k_soft, vt)
    context = context / (k_soft.sum(dim=-2).unsqueeze(-1) + 1e-6)
    theirs = torch.einsum("...nd,...de->...ne", q_soft, context).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
