"""
Diffusers-compatible UNet down/up/mid blocks.

Structure and parameter naming parity with the reference compat blocks
(/root/reference/src/nn/blocks/legacy_unet.py:11-231): resnets / attentions /
downsamplers / upsamplers ModuleLists; ResBlocks are created with the
diffusers-matching flags (zero_init_last_conv=False,
emb_activation_before_proj=True, add_embedding_to_hidden=True).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Module, ModuleList, Params
from fmdm_tpu.nn.blocks import DiffusersAttentionND, DownsampleND, ResBlockND, UpsampleND


def _make_resblock(spatial_dims, in_ch, out_ch, temb, dropout, eps, groups, time_scale_shift):
    return ResBlockND(
        spatial_dims=spatial_dims,
        channels=in_ch,
        emb_channels=temb,
        out_channels=out_ch,
        dropout=dropout,
        use_conv=False,
        use_scale_shift_norm=(time_scale_shift == "scale_shift"),
        norm_type="gn",
        norm_groups=groups,
        norm_eps=eps,
        zero_init_last_conv=False,
        emb_activation_before_proj=True,
        add_embedding_to_hidden=True,
    )


class DownBlock2DCompat(Module):
    def __init__(
        self,
        spatial_dims: int,
        num_layers: int,
        in_channels: int,
        out_channels: int,
        temb_channels: int,
        add_downsample: bool,
        eps: float,
        groups: int,
        dropout: float,
        time_scale_shift: str,
        with_attention: bool = False,
        attention_head_dim: int = 8,
        cross_attention_dim: Optional[int] = None,
    ):
        super().__init__()
        self.with_attention = with_attention
        self.add_downsample = add_downsample
        self.resnets = ModuleList()
        if with_attention:
            self.attentions = ModuleList()
        ch = in_channels
        heads = max(1, out_channels // max(attention_head_dim, 1))
        for _ in range(num_layers):
            self.resnets.append(
                _make_resblock(spatial_dims, ch, out_channels, temb_channels, dropout, eps, groups, time_scale_shift)
            )
            if with_attention:
                self.attentions.append(
                    DiffusersAttentionND(
                        out_channels, heads=heads, context_dim=cross_attention_dim,
                        eps=eps, norm_num_groups=groups,
                    )
                )
            ch = out_channels
        if add_downsample:
            self.downsamplers = ModuleList([DownsampleND(spatial_dims, out_channels, use_conv=True)])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        temb: jax.Array,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
        output_states = ()
        for idx, resnet in enumerate(self.resnets):
            hidden_states = resnet(params["resnets"][str(idx)], hidden_states, temb, **kwargs)
            if self.with_attention:
                hidden_states = self.attentions[idx](params["attentions"][str(idx)], hidden_states, context=context, **kwargs)
            output_states = output_states + (hidden_states,)
        if self.add_downsample:
            hidden_states = self.downsamplers[0](params["downsamplers"]["0"], hidden_states)
            output_states = output_states + (hidden_states,)
        return hidden_states, output_states


class UpBlock2DCompat(Module):
    def __init__(
        self,
        spatial_dims: int,
        num_layers: int,
        in_channels: int,
        out_channels: int,
        prev_output_channel: int,
        temb_channels: int,
        add_upsample: bool,
        eps: float,
        groups: int,
        dropout: float,
        time_scale_shift: str,
        with_attention: bool = False,
        attention_head_dim: int = 8,
        cross_attention_dim: Optional[int] = None,
    ):
        super().__init__()
        self.with_attention = with_attention
        self.add_upsample = add_upsample
        self.resnets = ModuleList()
        if with_attention:
            self.attentions = ModuleList()
        heads = max(1, out_channels // max(attention_head_dim, 1))
        for i in range(num_layers):
            res_skip_channels = in_channels if i == num_layers - 1 else out_channels
            resnet_in_channels = prev_output_channel if i == 0 else out_channels
            self.resnets.append(
                _make_resblock(
                    spatial_dims, resnet_in_channels + res_skip_channels, out_channels,
                    temb_channels, dropout, eps, groups, time_scale_shift,
                )
            )
            if with_attention:
                self.attentions.append(
                    DiffusersAttentionND(
                        out_channels, heads=heads, context_dim=cross_attention_dim,
                        eps=eps, norm_num_groups=groups,
                    )
                )
        if add_upsample:
            self.upsamplers = ModuleList([UpsampleND(spatial_dims, out_channels, use_conv=True)])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        res_hidden_states_tuple,
        temb: jax.Array,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        for idx, resnet in enumerate(self.resnets):
            res_hidden_states = res_hidden_states_tuple[-1]
            res_hidden_states_tuple = res_hidden_states_tuple[:-1]
            # pass the parts unconcatenated: ResBlockND normalizes per part so
            # the GN stats fuse into the producers (see _gn_act_parts)
            hidden_states = resnet(
                params["resnets"][str(idx)], (hidden_states, res_hidden_states), temb, **kwargs)
            if self.with_attention:
                hidden_states = self.attentions[idx](params["attentions"][str(idx)], hidden_states, context=context, **kwargs)
        if self.add_upsample:
            hidden_states = self.upsamplers[0](params["upsamplers"]["0"], hidden_states)
        return hidden_states


class UNetMidBlock2DCompat(Module):
    def __init__(
        self,
        spatial_dims: int,
        in_channels: int,
        temb_channels: int,
        eps: float,
        groups: int,
        dropout: float,
        time_scale_shift: str,
        add_attention: bool = True,
        attention_head_dim: int = 8,
        cross_attention_dim: Optional[int] = None,
    ):
        super().__init__()
        self.add_attention = add_attention
        heads = max(1, in_channels // max(attention_head_dim, 1))
        self.resnets = ModuleList([
            _make_resblock(spatial_dims, in_channels, in_channels, temb_channels, dropout, eps, groups, time_scale_shift),
            _make_resblock(spatial_dims, in_channels, in_channels, temb_channels, dropout, eps, groups, time_scale_shift),
        ])
        if add_attention:
            self.attentions = ModuleList([
                DiffusersAttentionND(
                    in_channels, heads=heads, context_dim=cross_attention_dim,
                    eps=eps, norm_num_groups=groups,
                )
            ])

    def __call__(
        self,
        params: Params,
        hidden_states: jax.Array,
        temb: jax.Array,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        hidden_states = self.resnets[0](params["resnets"]["0"], hidden_states, temb, **kwargs)
        if self.add_attention:
            hidden_states = self.attentions[0](params["attentions"]["0"], hidden_states, context=context, **kwargs)
        hidden_states = self.resnets[1](params["resnets"]["1"], hidden_states, temb, **kwargs)
        return hidden_states
