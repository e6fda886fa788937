"""
EfficientUNetND — the ND UNet with optional linear attention, cross-attention
and input patchify pooling.

Structural parity with the reference
(/root/reference/src/models/unet/unet.py:42-326): TimestepEmbedSequential
routing (emb -> ResBlockND, context -> SpatialCrossAttention), time MLP of
4x model_channels stored as Sequential indices 0/2, encoder levels per
channel_mult with self-attn at `attention_resolutions` downsample factors,
middle res+self-attn(+cross)+res, decoder with skip-concat and
num_res_blocks+1 blocks per level, zero-init output conv (or unpool head when
pool_factor > 1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Identity, Module, ModuleList, Params
from fmdm_tpu.nn.layers import Activation, ConvND, Linear, Sequential, make_group_norm
from fmdm_tpu.nn.blocks import (
    DownsampleND,
    PoolND,
    ResBlockND,
    SpatialCrossAttention,
    SpatialSelfAttention,
    UnPoolND,
    UpsampleND,
)
from fmdm_tpu.models.unet_diffusers import normalize_timesteps
from fmdm_tpu.ops.time_embed import timestep_embedding


class TimestepEmbedSequential(Sequential):
    """Sequential that routes `emb` to ResBlockND children and `context` to
    SpatialCrossAttention children (reference unet.py:18-39)."""

    def __call__(self, params: Params, x, emb=None, context=None, **kwargs):
        for i, layer in enumerate(self._items):
            p = params.get(str(i), {})
            if isinstance(layer, ResBlockND):
                x = layer(p, x, emb, **kwargs)
            elif isinstance(layer, SpatialCrossAttention):
                x = layer(p, x, context, **kwargs)
            else:
                x = layer(p, x, **kwargs)
        return x


class EfficientUNetND(Module):
    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        model_channels: int,
        out_channels: int,
        num_res_blocks: int,
        attention_resolutions: Sequence[int],
        dropout: float = 0.0,
        channel_mult: Tuple[int, ...] = (1, 2, 3, 4),
        conv_resample: bool = True,
        dim_head: int = 64,
        num_heads: int = 4,
        use_linear_attn: bool = True,
        use_scale_shift_norm: bool = True,
        pool_factor: int = 1,
        cross_attention_resolutions: Optional[Sequence[int]] = None,
        cross_attention_dim: int = 4,
        cross_attention_in_middle: bool = False,
        emb_activation_before_proj: bool = False,
    ):
        super().__init__()
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")

        self.spatial_dims = spatial_dims
        self.in_channels = in_channels
        self.model_channels = model_channels
        self.out_channels = out_channels
        self.attention_resolutions = tuple(attention_resolutions)
        self.cross_attention_resolutions = tuple(cross_attention_resolutions or ())
        self.cross_attention_in_middle = cross_attention_in_middle
        self.pool_factor = pool_factor

        time_embed_dim = model_channels * 4
        self.time_embed = Sequential([
            Linear(model_channels, time_embed_dim),
            Activation("silu"),
            Linear(time_embed_dim, time_embed_dim),
        ])

        if pool_factor > 1:
            self.pool = PoolND(spatial_dims, in_channels, model_channels, pool_factor)
            start_channels = model_channels
        else:
            self.pool = Identity()
            start_channels = in_channels

        def resblock(ch, out_ch=None):
            return ResBlockND(
                spatial_dims=spatial_dims,
                channels=ch,
                emb_channels=time_embed_dim,
                out_channels=out_ch,
                dropout=dropout,
                use_scale_shift_norm=use_scale_shift_norm,
                emb_activation_before_proj=emb_activation_before_proj,
            )

        def self_attn(ch, linear, in_middle=False):
            return SpatialSelfAttention(
                dim=ch, heads=num_heads, dim_head=dim_head,
                use_linear=linear, use_efficient_attn=True,
            )

        def cross_attn(ch, linear):
            return SpatialCrossAttention(
                dim=ch, context_dim=cross_attention_dim, heads=num_heads,
                dim_head=dim_head, use_linear=linear, use_efficient_attn=True,
            )

        # --- encoder ---
        self.input_blocks = ModuleList([
            TimestepEmbedSequential([ConvND(spatial_dims, start_channels, model_channels, 3, padding=1)])
        ])
        input_block_chans = [model_channels]
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                layers = [resblock(ch, mult * model_channels)]
                ch = mult * model_channels
                if ds in self.attention_resolutions:
                    layers.append(self_attn(ch, use_linear_attn))
                if ds in self.cross_attention_resolutions:
                    layers.append(cross_attn(ch, use_linear_attn))
                self.input_blocks.append(TimestepEmbedSequential(layers))
                input_block_chans.append(ch)
            if level != len(channel_mult) - 1:
                self.input_blocks.append(
                    TimestepEmbedSequential([DownsampleND(spatial_dims, ch, use_conv=conv_resample)])
                )
                input_block_chans.append(ch)
                ds *= 2

        # --- middle (self-attn never linear here, unet.py:201-207) ---
        middle_layers = [resblock(ch), self_attn(ch, False)]
        if cross_attention_in_middle or ds in self.cross_attention_resolutions:
            middle_layers.append(cross_attn(ch, False))
        middle_layers.append(resblock(ch))
        self.middle_block = TimestepEmbedSequential(middle_layers)

        # --- decoder ---
        self.output_blocks = ModuleList()
        for level, mult in list(enumerate(channel_mult))[::-1]:
            for i in range(num_res_blocks + 1):
                layers = [resblock(ch + input_block_chans.pop(), model_channels * mult)]
                ch = model_channels * mult
                if ds in self.attention_resolutions:
                    layers.append(self_attn(ch, use_linear_attn))
                if ds in self.cross_attention_resolutions:
                    layers.append(cross_attn(ch, use_linear_attn))
                if level and i == num_res_blocks:
                    layers.append(UpsampleND(spatial_dims, ch, use_conv=conv_resample))
                    ds //= 2
                self.output_blocks.append(TimestepEmbedSequential(layers))

        # --- output head ---
        if pool_factor > 1:
            self.out = Sequential([
                make_group_norm(ch, groups=32),
                Activation("silu"),
                ConvND(spatial_dims, model_channels, model_channels, 3, padding=1),
            ])
            self.unpool = UnPoolND(spatial_dims, model_channels, out_channels, pool_factor)
        else:
            self.out = Sequential([
                make_group_norm(ch, groups=32),
                Activation("silu"),
                ConvND(spatial_dims, model_channels, out_channels, 3, padding=1, zero_init=True),
            ])
            self.unpool = Identity()

    def __call__(
        self,
        params: Params,
        x: jax.Array,
        t,
        context: Optional[jax.Array] = None,
        context_ca: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        if context_ca is not None and not (self.cross_attention_resolutions or self.cross_attention_in_middle):
            raise ValueError("context_ca provided but cross-attention is disabled.")
        if context is not None:
            x = jnp.concatenate([x, context], axis=1)

        t = normalize_timesteps(t, x.shape[0])
        t_feat = timestep_embedding(t, self.model_channels, flip_sin_to_cos=False, freq_shift=0).astype(x.dtype)
        emb = self.time_embed(params["time_embed"], t_feat)

        x = self.pool(params.get("pool", {}), x)
        hs = []
        h = x
        in_params = params.get("input_blocks", {})
        out_params = params.get("output_blocks", {})
        for i, block in enumerate(self.input_blocks):
            h = block(in_params.get(str(i), {}), h, emb=emb, context=context_ca, **kwargs)
            hs.append(h)
        h = self.middle_block(params["middle_block"], h, emb=emb, context=context_ca, **kwargs)
        for i, block in enumerate(self.output_blocks):
            # parts tuple: the leading ResBlockND normalizes per part so GN
            # stats fuse into each producer conv (nn/blocks.py _gn_act_parts)
            h = block(out_params.get(str(i), {}), (h, hs.pop()), emb=emb, context=context_ca, **kwargs)
        h = self.out(params["out"], h)
        h = self.unpool(params.get("unpool", {}), h)
        return h
