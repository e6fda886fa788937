"""
UNetDiffusersND — diffusers-`UNet2DModel`-compatible ND UNet.

Structural parity with the reference
(/root/reference/src/models/unet/unet_diffusers_nd.py:19-195): conv_in (raw
conv), TimestepEmbedding MLP (linear_1/linear_2 naming), down/mid/up compat
blocks selected by *_block_types strings (incl. CrossAttn variants),
center_input_sample, positional time embedding with flip_sin_to_cos/freq_shift,
diffusers skip bookkeeping, GN→SiLU→conv_out head.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Module, ModuleList, Params
from fmdm_tpu.nn.layers import Conv, Linear, make_group_norm
from fmdm_tpu.nn.unet_blocks import DownBlock2DCompat, UNetMidBlock2DCompat, UpBlock2DCompat
from fmdm_tpu.ops.time_embed import timestep_embedding


class TimestepEmbedding(Module):
    """Two-layer timestep MLP (reference models/unet/utils.py:9-25)."""

    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.linear_1 = Linear(in_channels, out_channels)
        self.linear_2 = Linear(out_channels, out_channels)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        x = self.linear_1(params["linear_1"], x)
        x = jax.nn.silu(x)
        return self.linear_2(params["linear_2"], x)


def normalize_timesteps(t, batch: int) -> jax.Array:
    """Scalar/0-d/1-d timesteps -> (B,) (reference models/unet/base.py:15-20)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    return jnp.broadcast_to(t, (batch,))


class UNetDiffusersND(Module):
    def __init__(
        self,
        spatial_dims: int = 2,
        sample_size=None,
        in_channels: int = 3,
        out_channels: int = 3,
        center_input_sample: bool = False,
        time_embedding_type: str = "positional",
        freq_shift: int = 0,
        flip_sin_to_cos: bool = True,
        down_block_types: Sequence[str] = ("DownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D"),
        mid_block_type: Optional[str] = "UNetMidBlock2D",
        up_block_types: Sequence[str] = ("AttnUpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        block_out_channels: Sequence[int] = (224, 448, 672, 896),
        layers_per_block: int = 2,
        downsample_padding: int = 1,
        dropout: float = 0.0,
        attention_head_dim: int = 8,
        norm_num_groups: int = 32,
        norm_eps: float = 1e-5,
        resnet_time_scale_shift: str = "default",
        add_attention: bool = True,
        cross_attention_dim: Optional[int] = None,
        **_kwargs,
    ):
        super().__init__()
        if time_embedding_type != "positional":
            raise ValueError("UNetDiffusersND currently supports positional time embedding only for strict compat.")
        self.center_input_sample = center_input_sample
        self.sample_size = sample_size
        self.flip_sin_to_cos = flip_sin_to_cos
        self.freq_shift = freq_shift
        self.block_out_channels = tuple(block_out_channels)
        self.cross_attention_dim = int(cross_attention_dim) if cross_attention_dim is not None else None
        self.has_mid = mid_block_type is not None
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.spatial_dims = spatial_dims

        time_embed_dim = self.block_out_channels[0] * 4
        self.time_proj_dim = self.block_out_channels[0]
        self.conv_in = Conv(spatial_dims, in_channels, self.block_out_channels[0], kernel_size=3, padding=1)
        self.time_embedding = TimestepEmbedding(self.time_proj_dim, time_embed_dim)

        self.down_blocks = ModuleList()
        output_channel = self.block_out_channels[0]
        for i, down_block_type in enumerate(down_block_types):
            input_channel = output_channel
            output_channel = self.block_out_channels[i]
            is_final = i == len(self.block_out_channels) - 1
            if down_block_type not in {"DownBlock2D", "AttnDownBlock2D", "CrossAttnDownBlock2D"}:
                raise ValueError(f"Unsupported down block type in compat model: {down_block_type}")
            self.down_blocks.append(
                DownBlock2DCompat(
                    spatial_dims=spatial_dims,
                    num_layers=layers_per_block,
                    in_channels=input_channel,
                    out_channels=output_channel,
                    temb_channels=time_embed_dim,
                    add_downsample=not is_final,
                    eps=norm_eps,
                    groups=norm_num_groups,
                    dropout=dropout,
                    time_scale_shift=resnet_time_scale_shift,
                    with_attention=down_block_type in {"AttnDownBlock2D", "CrossAttnDownBlock2D"},
                    attention_head_dim=attention_head_dim,
                    cross_attention_dim=self.cross_attention_dim if down_block_type == "CrossAttnDownBlock2D" else None,
                )
            )

        if self.has_mid:
            self.mid_block = UNetMidBlock2DCompat(
                spatial_dims=spatial_dims,
                in_channels=self.block_out_channels[-1],
                temb_channels=time_embed_dim,
                eps=norm_eps,
                groups=norm_num_groups,
                dropout=dropout,
                time_scale_shift=resnet_time_scale_shift,
                add_attention=add_attention,
                attention_head_dim=attention_head_dim,
                cross_attention_dim=self.cross_attention_dim if mid_block_type == "UNetMidBlock2DCrossAttn" else None,
            )

        self.up_blocks = ModuleList()
        reversed_channels = list(reversed(self.block_out_channels))
        output_channel = reversed_channels[0]
        for i, up_block_type in enumerate(up_block_types):
            prev_output_channel = output_channel
            output_channel = reversed_channels[i]
            input_channel = reversed_channels[min(i + 1, len(self.block_out_channels) - 1)]
            is_final = i == len(self.block_out_channels) - 1
            if up_block_type not in {"UpBlock2D", "AttnUpBlock2D", "CrossAttnUpBlock2D"}:
                raise ValueError(f"Unsupported up block type in compat model: {up_block_type}")
            self.up_blocks.append(
                UpBlock2DCompat(
                    spatial_dims=spatial_dims,
                    num_layers=layers_per_block + 1,
                    in_channels=input_channel,
                    out_channels=output_channel,
                    prev_output_channel=prev_output_channel,
                    temb_channels=time_embed_dim,
                    add_upsample=not is_final,
                    eps=norm_eps,
                    groups=norm_num_groups,
                    dropout=dropout,
                    time_scale_shift=resnet_time_scale_shift,
                    with_attention=up_block_type in {"AttnUpBlock2D", "CrossAttnUpBlock2D"},
                    attention_head_dim=attention_head_dim,
                    cross_attention_dim=self.cross_attention_dim if up_block_type == "CrossAttnUpBlock2D" else None,
                )
            )

        self.conv_norm_out = make_group_norm(self.block_out_channels[0], groups=norm_num_groups, eps=norm_eps)
        self.conv_out = Conv(spatial_dims, self.block_out_channels[0], out_channels, kernel_size=3, padding=1)

    def __call__(
        self,
        params: Params,
        x: jax.Array,
        t,
        context: Optional[jax.Array] = None,
        context_ca: Optional[jax.Array] = None,
        deep_cache: Optional[jax.Array] = None,
        cache_depth: Optional[int] = None,
        return_deep_feature: bool = False,
        **kwargs,
    ) -> jax.Array:
        """Standard full forward, plus an optional DeepCache-style split
        ("Cache Me if You Can" / DeepCache: the deep sub-network's output
        changes slowly across adjacent denoising steps, so it can be cached
        and reused while only the shallow high-res levels are recomputed).

        - ``return_deep_feature=True`` (with ``cache_depth=D``): full forward
          that also returns the feature entering up block ``n_up - D`` — the
          deep sub-network's output.
        - ``deep_cache=<that feature>`` (with ``cache_depth=D``): recompute
          only conv_in + down blocks 0..D-1 and up blocks n_up-D.., splicing
          the cached deep feature in place of the skipped deep levels.
        With a cache captured at the SAME (x, t), the spliced forward
        reproduces the full forward exactly (tests pin this)."""
        if context is not None:
            x = jnp.concatenate([x, context], axis=1)
        if self.center_input_sample:
            x = 2 * x - 1.0

        t = normalize_timesteps(t, x.shape[0])
        t_emb = timestep_embedding(
            t, self.time_proj_dim, max_period=10000,
            flip_sin_to_cos=self.flip_sin_to_cos, freq_shift=self.freq_shift,
        ).astype(x.dtype)
        emb = self.time_embedding(params["time_embedding"], t_emb)

        n_up = len(self.up_blocks)
        shallow_only = deep_cache is not None
        if (shallow_only or return_deep_feature) and not (
            cache_depth is not None and 1 <= cache_depth < n_up
        ):
            raise ValueError(f"cache_depth must be in [1, {n_up - 1}]")

        sample = self.conv_in(params["conv_in"], x)
        down_block_res_samples = (sample,)
        n_down = len(self.down_blocks) if not shallow_only else cache_depth
        for i in range(n_down):
            sample, res_samples = self.down_blocks[i](
                params["down_blocks"][str(i)], sample, emb, context=context_ca, **kwargs
            )
            down_block_res_samples += res_samples

        deep_feature = None
        if shallow_only:
            # splice: skip deep down blocks, mid block, and deep up blocks
            sample = deep_cache
            first_up = n_up - cache_depth
            # the deepest shallow down block's downsampler output feeds a
            # SKIPPED up block — keep only the entries the shallow up blocks
            # actually consume (they pop from the end, shallowest last)
            needed = sum(len(self.up_blocks[i].resnets) for i in range(first_up, n_up))
            down_block_res_samples = down_block_res_samples[:needed]
        else:
            if self.has_mid:
                sample = self.mid_block(params["mid_block"], sample, emb, context=context_ca, **kwargs)
            for i, up_block in enumerate(self.up_blocks):
                if return_deep_feature and i == n_up - cache_depth:
                    deep_feature = sample
                n_res = len(up_block.resnets)
                res_samples = down_block_res_samples[-n_res:]
                down_block_res_samples = down_block_res_samples[:-n_res]
                sample = up_block(
                    params["up_blocks"][str(i)], sample, res_samples, emb, context=context_ca, **kwargs
                )
            first_up = n_up  # all consumed above

        for i in range(first_up, n_up):
            up_block = self.up_blocks[i]
            n_res = len(up_block.resnets)
            res_samples = down_block_res_samples[-n_res:]
            down_block_res_samples = down_block_res_samples[:-n_res]
            sample = up_block(
                params["up_blocks"][str(i)], sample, res_samples, emb, context=context_ca, **kwargs
            )

        sample = self.conv_norm_out(params["conv_norm_out"], sample)
        sample = jax.nn.silu(sample)
        sample = self.conv_out(params["conv_out"], sample)
        if return_deep_feature:
            return sample, deep_feature
        return sample


# Backward-compatible alias (reference unet_diffusers_nd.py:195)
UNetExactND = UNetDiffusersND
