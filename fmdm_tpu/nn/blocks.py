"""
Reusable blocks (L2 of the layer map, SURVEY.md §1).

Functional re-implementations of the reference blocks with identical parameter
structure/naming:
 - ResBlockND                 (/root/reference/src/nn/blocks/residual.py:13-140)
 - SpatialSelfAttention       (attention.py:82-117)
 - SpatialCrossAttention      (attention.py:120-189)
 - DiffusersAttentionND       (attention.py:192-274)
 - UpsampleND / DownsampleND  (ops/upsampling.py:8-62)
 - PoolND / UnPoolND          (ops/pooling.py:10-109)
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Identity, Module, Params
from fmdm_tpu.nn.layers import (
    Conv,
    ConvND,
    ConvTransposeND,
    GroupNorm,
    Linear,
    RMSNormND,
    dropout,
    make_activation,
    make_group_norm,
)
from fmdm_tpu.ops.attention import linear_attention, sdpa
from fmdm_tpu.ops.resample import avg_pool_nd, upsample_nearest


# ---------------------------------------------------------------------------
# Residual block
# ---------------------------------------------------------------------------

class ResBlockND(Module):
    """Residual block with optional timestep conditioning (FiLM or additive).

    Parameter paths match the reference exactly: norm1, conv1.conv, emb_layers,
    norm2, conv2.conv, skip_connection[.conv] (residual.py:57-82).
    """

    def __init__(
        self,
        channels: int,
        emb_channels: Optional[int],
        dropout: float,
        out_channels: Optional[int] = None,
        use_conv: bool = False,
        use_scale_shift_norm: bool = False,
        spatial_dims: int = 2,
        norm_type: str = "gn",
        act: str = "silu",
        norm_groups: int = 32,
        norm_eps: float = 1e-5,
        zero_init_last_conv: bool = True,
        emb_activation_before_proj: bool = False,
        add_embedding_to_hidden: bool = False,
    ):
        super().__init__()
        self.channels = channels
        self.out_channels = out_channels or channels
        self.dropout_rate = dropout
        self.use_scale_shift_norm = use_scale_shift_norm and emb_channels is not None
        self.uses_embedding = emb_channels is not None
        self.emb_activation_before_proj = emb_activation_before_proj
        self.add_embedding_to_hidden = add_embedding_to_hidden
        if emb_channels is None and use_scale_shift_norm:
            raise ValueError("use_scale_shift_norm requires emb_channels to be provided.")

        self.act = make_activation(act)
        self.norm1 = self._make_norm(norm_type, channels, norm_groups, norm_eps)
        self.conv1 = ConvND(spatial_dims, channels, self.out_channels, 3, padding=1)
        if self.uses_embedding:
            self.emb_layers = Linear(
                emb_channels,
                2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            )
        self.norm2 = self._make_norm(norm_type, self.out_channels, norm_groups, norm_eps)
        self.conv2 = ConvND(spatial_dims, self.out_channels, self.out_channels, 3, padding=1, zero_init=zero_init_last_conv)

        if self.out_channels == channels:
            self.skip_connection = Identity()
        elif use_conv:
            self.skip_connection = ConvND(spatial_dims, channels, self.out_channels, 3, padding=1)
        else:
            self.skip_connection = ConvND(spatial_dims, channels, self.out_channels, 1)

    @staticmethod
    def _make_norm(norm_type: str, channels: int, norm_groups: int, norm_eps: float) -> Module:
        norm_type = norm_type.lower()
        if norm_type == "gn":
            return make_group_norm(channels, groups=norm_groups, eps=norm_eps)
        if norm_type == "rmsnorm":
            return RMSNormND(channels)
        raise ValueError(f"Unsupported norm_type '{norm_type}'")

    def _gn_act(self, norm: Module, p: Params, x: jax.Array,
                scale=None, shift=None) -> jax.Array:
        """GroupNorm(+FiLM)+SiLU via the fused Pallas kernel when applicable
        (ops/pallas/group_norm.py); exact XLA fallback otherwise."""
        if isinstance(norm, GroupNorm) and self.act is jax.nn.silu:
            from fmdm_tpu.ops.pallas.group_norm import fused_group_norm_act

            return fused_group_norm_act(
                x, p["weight"], p["bias"], num_groups=norm.num_groups, eps=norm.eps,
                act=True, scale=scale, shift=shift,
            )
        h = norm(p, x)
        if scale is not None:
            nd = x.ndim - 2
            h = h * (1 + scale.reshape(scale.shape + (1,) * nd)) + shift.reshape(shift.shape + (1,) * nd)
        return self.act(h)

    def _gn_act_parts(self, p: Params, parts) -> jax.Array:
        """GN+act over an implicit concat, stats reduced per part."""
        if isinstance(self.norm1, GroupNorm):
            from fmdm_tpu.ops.norm import group_norm_parts

            out = group_norm_parts(
                parts, p.get("weight"), p.get("bias"),
                num_groups=self.norm1.num_groups, eps=self.norm1.eps,
            )
            return self.act(out)
        return self._gn_act(self.norm1, p, jnp.concatenate(parts, axis=1))

    def __call__(
        self,
        params: Params,
        x: jax.Array,
        emb: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        if isinstance(x, (tuple, list)):
            # decoder skip-concat path: normalize the parts BEFORE the concat
            # so the GN stats reduce per part and fuse into each producer conv
            # (a concat cannot host a stats epilogue — ops/norm.py
            # group_norm_parts). Numerics identical to GN(concat(parts)).
            parts = tuple(x)
            x = jnp.concatenate(parts, axis=1)
            h = self._gn_act_parts(params["norm1"], parts)
        else:
            h = self._gn_act(self.norm1, params["norm1"], x)
        h = self.conv1(params["conv1"], h)

        scale = shift = None
        if self.uses_embedding:
            if emb is None:
                raise ValueError("ResBlockND expects `emb` when emb_channels is set.")
            e = self.act(emb) if self.emb_activation_before_proj else emb
            emb_out = self.emb_layers(params["emb_layers"], e).astype(h.dtype)
            if self.use_scale_shift_norm:
                scale, shift = jnp.split(emb_out, 2, axis=1)  # (N, C) each
            elif self.add_embedding_to_hidden:
                h = h + emb_out.reshape(emb_out.shape + (1,) * (h.ndim - emb_out.ndim))

        h = self._gn_act(self.norm2, params["norm2"], h, scale=scale, shift=shift)
        h = dropout(h, self.dropout_rate, rng=rng, train=train)
        h = self.conv2(params["conv2"], h)
        return self.skip_connection(params.get("skip_connection", {}), x) + h


# ---------------------------------------------------------------------------
# Attention blocks
# ---------------------------------------------------------------------------

class SpatialSelfAttention(Module):
    """Flatten-spatial MHSA with residual + zero-init out projection
    (attention.py:82-117). Params: norm, qkv (Conv1d), proj_out (Conv1d)."""

    def __init__(self, dim: int, heads: int = 4, dim_head: int = 64,
                 use_linear: bool = False, use_efficient_attn: bool = True):
        super().__init__()
        self.dim = dim
        self.heads = heads
        self.inner_dim = dim_head * heads
        self.use_linear = use_linear
        self.norm = GroupNorm(max(1, math.gcd(dim, 32)), dim)
        self.qkv = Conv(1, dim, self.inner_dim * 3, kernel_size=1, padding=0)
        self.proj_out = Conv(1, self.inner_dim, dim, kernel_size=1, padding=0, zero_init=True)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        b, c = x.shape[:2]
        spatial = x.shape[2:]
        x_flat = x.reshape(b, c, -1)  # (b, c, T)
        qkv = self.qkv(params["qkv"], self.norm(params["norm"], x_flat))  # (b, 3*inner, T)
        # Reference reshape (attention.py:112-113): (b, heads, T, 3*head_dim) then
        # chunk on the last axis -> q,k,v each (b, heads, T, head_dim).
        qkv = qkv.reshape(b, self.heads, qkv.shape[-1], -1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        h = linear_attention(q, k, v) if self.use_linear else sdpa(q, k, v)
        h = h.reshape(b, self.inner_dim, -1)
        h = self.proj_out(params["proj_out"], h)
        return (x_flat + h).reshape(b, c, *spatial)


class SpatialCrossAttention(Module):
    """x attends to a flattened context (attention.py:120-189).

    Params: norm, context_norm, q_proj, kv_proj, proj_out."""

    def __init__(
        self,
        dim: int,
        context_dim: int,
        heads: int = 4,
        dim_head: int = 64,
        use_linear: bool = False,
        use_efficient_attn: bool = True,
    ):
        super().__init__()
        self.dim = dim
        self.context_dim = context_dim
        self.heads = heads
        self.inner_dim = dim_head * heads
        self.use_linear = use_linear
        self.norm = GroupNorm(max(1, math.gcd(dim, 32)), dim)
        self.context_norm = GroupNorm(max(1, math.gcd(context_dim, 32)), context_dim)
        self.q_proj = Conv(1, dim, self.inner_dim, kernel_size=1, padding=0)
        self.kv_proj = Conv(1, context_dim, self.inner_dim * 2, kernel_size=1, padding=0)
        self.proj_out = Conv(1, self.inner_dim, dim, kernel_size=1, padding=0, zero_init=True)

    def __call__(self, params: Params, x: jax.Array, context: Optional[jax.Array] = None, **kwargs) -> jax.Array:
        if context is None:
            raise ValueError("SpatialCrossAttention requires a non-empty context tensor.")
        b, c = x.shape[:2]
        spatial = x.shape[2:]
        x_flat = x.reshape(b, c, -1)

        if context.ndim == 3:
            if context.shape[1] == self.context_dim:
                ctx_flat = context
            elif context.shape[-1] == self.context_dim:
                ctx_flat = jnp.swapaxes(context, 1, 2)
            else:
                raise ValueError(f"Context channels mismatch: expected {self.context_dim}, got {context.shape}.")
        else:
            if context.shape[1] != self.context_dim:
                raise ValueError(f"Context channels mismatch: expected {self.context_dim}, got {context.shape}.")
            ctx_flat = context.reshape(context.shape[0], context.shape[1], -1)

        q = self.q_proj(params["q_proj"], self.norm(params["norm"], x_flat))
        kv = self.kv_proj(params["kv_proj"], self.context_norm(params["context_norm"], ctx_flat))
        q = q.reshape(b, self.heads, q.shape[-1], -1)
        kv = kv.reshape(b, self.heads, kv.shape[-1], -1)
        k, v = jnp.split(kv, 2, axis=-1)
        h = linear_attention(q, k, v) if self.use_linear else sdpa(q, k, v)
        h = h.reshape(b, self.inner_dim, -1)
        h = self.proj_out(params["proj_out"], h)
        return (x_flat + h).reshape(b, c, *spatial)


class DiffusersAttentionND(Module):
    """Diffusers-style attention with to_q/to_k/to_v/to_out naming for
    checkpoint compatibility (attention.py:192-274)."""

    def __init__(
        self,
        channels: int,
        heads: int = 1,
        context_dim: Optional[int] = None,
        norm_num_groups: int = 32,
        eps: float = 1e-5,
        dropout: float = 0.0,
        use_efficient_attn: bool = True,
    ):
        super().__init__()
        self.channels = channels
        self.heads = max(1, heads)
        self.head_dim = channels // self.heads
        self.context_dim = int(context_dim) if context_dim is not None else None
        self.dropout_rate = dropout
        self.group_norm = GroupNorm(max(1, math.gcd(channels, norm_num_groups)), channels, eps=eps)
        self.to_q = Linear(channels, channels)
        if self.context_dim is None:
            self.to_k = Linear(channels, channels)
            self.to_v = Linear(channels, channels)
        else:
            self.context_norm = GroupNorm(
                max(1, math.gcd(self.context_dim, norm_num_groups)), self.context_dim, eps=eps
            )
            self.to_k = Linear(self.context_dim, channels)
            self.to_v = Linear(self.context_dim, channels)
        # to_out is a ModuleList [Linear, Dropout] in the reference -> "to_out.0"
        self.to_out = _ToOut(channels)

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        context: Optional[jax.Array] = None,
        *,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        b, c = hidden_states.shape[:2]
        spatial = hidden_states.shape[2:]
        x = hidden_states.reshape(b, c, -1)
        x = jnp.swapaxes(self.group_norm(params["group_norm"], x), 1, 2)  # (B, T, C)

        q = self.to_q(params["to_q"], x)
        if self.context_dim is None:
            kv_source = x
        else:
            if context is None:
                raise ValueError("DiffusersAttentionND cross-attention requires a non-empty context tensor.")
            if context.ndim == 3:
                if context.shape[1] == self.context_dim:
                    ctx = context
                elif context.shape[-1] == self.context_dim:
                    ctx = jnp.swapaxes(context, 1, 2)
                else:
                    raise ValueError(
                        f"Context channels mismatch: expected {self.context_dim}, got {tuple(context.shape)}."
                    )
            else:
                if context.shape[1] != self.context_dim:
                    raise ValueError(
                        f"Context channels mismatch: expected {self.context_dim}, got {tuple(context.shape)}."
                    )
                ctx = context.reshape(context.shape[0], context.shape[1], -1)
            ctx = jnp.swapaxes(self.context_norm(params["context_norm"], ctx), 1, 2)
            kv_source = ctx

        k = self.to_k(params["to_k"], kv_source)
        v = self.to_v(params["to_v"], kv_source)

        def split_heads(t):
            return jnp.swapaxes(t.reshape(b, -1, self.heads, self.head_dim), 1, 2)

        out = sdpa(split_heads(q), split_heads(k), split_heads(v))
        out = jnp.swapaxes(out, 1, 2).reshape(b, -1, c)
        out = self.to_out(params["to_out"], out, train=train, rng=rng, rate=self.dropout_rate)
        out = jnp.swapaxes(out, 1, 2).reshape(b, c, *spatial)
        return out + hidden_states


class _ToOut(Module):
    """Mirrors the reference's ModuleList([Linear, Dropout]) under ``to_out``."""

    def __init__(self, channels: int):
        super().__init__()
        self.add_child("0", Linear(channels, channels))

    def __call__(self, params: Params, x, *, train=False, rng=None, rate=0.0, **kwargs):
        x = self._children["0"](params["0"], x)
        return dropout(x, rate, rng=rng, train=train)


# ---------------------------------------------------------------------------
# Resampling blocks
# ---------------------------------------------------------------------------

class UpsampleND(Module):
    """Nearest x2 upsample + optional 3x3 conv (upsampling.py:8-30).
    Params: conv.conv.*"""

    def __init__(self, spatial_dims: int, channels: int, use_conv: bool = True):
        super().__init__()
        self.use_conv = use_conv
        if use_conv:
            self.conv = ConvND(spatial_dims, channels, channels, kernel_size=3, padding=1)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        x = upsample_nearest(x, 2)
        if self.use_conv:
            x = self.conv(params["conv"], x)
        return x


class DownsampleND(Module):
    """Stride-2 conv or 2x avg-pool downsample (upsampling.py:32-62).
    Params: op.conv.* when use_conv."""

    def __init__(self, spatial_dims: int, channels: int, use_conv: bool = True):
        super().__init__()
        self.use_conv = use_conv
        if use_conv:
            self.op = ConvND(spatial_dims, channels, channels, kernel_size=3, stride=2, padding=1)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        if self.use_conv:
            return self.op(params["op"], x)
        return avg_pool_nd(x, 2, 2)


class PoolND(Module):
    """Patchify: conv with kernel=stride=factor (pooling.py:10-30).
    Params: down.conv.*"""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, pool_factor=2):
        super().__init__()
        self.is_identity = pool_factor == 1 or (
            isinstance(pool_factor, (tuple, list)) and all(p == 1 for p in pool_factor)
        )
        if not self.is_identity:
            self.down = ConvND(
                spatial_dims, in_channels, out_channels,
                kernel_size=pool_factor, stride=pool_factor, padding=0,
            )

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        if self.is_identity:
            return x
        return self.down(params["down"], x)


class UnPoolND(Module):
    """Unpatchify: transposed conv with kernel=stride=factor (pooling.py:89-109).
    Params: up.convT.*"""

    def __init__(self, spatial_dims: int, in_channels: int, out_channels: int, pool_factor=2):
        super().__init__()
        self.is_identity = pool_factor == 1 or (
            isinstance(pool_factor, (tuple, list)) and all(p == 1 for p in pool_factor)
        )
        if not self.is_identity:
            self.up = ConvTransposeND(
                spatial_dims, in_channels, out_channels,
                kernel_size=pool_factor, stride=pool_factor, padding=0,
            )

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        if self.is_identity:
            return x
        return self.up(params["up"], x)


def run_self_tests() -> None:
    """Embedded self-test (reference residual.py:344 / attention.py self-test
    tier, SURVEY.md §4): block shapes + residual identity at zero-init."""
    import numpy as np

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16, 16))
    emb = jax.random.normal(key, (2, 32))

    for scale_shift in (False, True):
        block = ResBlockND(8, 32, dropout=0.0, out_channels=8,
                           use_scale_shift_norm=scale_shift, norm_groups=4)
        p = block.init(key)
        y = block(p, x, emb=emb)
        assert y.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(y)))

    attn = SpatialSelfAttention(8, heads=2, dim_head=4)
    y = attn(attn.init(key), x)
    assert y.shape == x.shape

    up = UpsampleND(2, 8, use_conv=False)
    assert up(up.init(key), x).shape == (2, 8, 32, 32)
    down = DownsampleND(2, 8, use_conv=True)
    assert down(down.init(key), x).shape == (2, 8, 8, 8)

    pool = PoolND(2, 8, 8, pool_factor=2)
    unpool = UnPoolND(2, 8, 8, pool_factor=2)
    pooled = pool(pool.init(key), x)
    assert pooled.shape == (2, 8, 8, 8)
    assert unpool(unpool.init(key), pooled).shape == x.shape
    np.testing.assert_array_equal(
        np.asarray(PoolND(2, 8, 8, pool_factor=1)({}, x)), np.asarray(x))
