"""
VAE model assemblies: AutoencoderKL and VQVAE.

Structural parity with /root/reference/src/models/vae/kl.py:19-136, vq.py:21-183
and autoencoder/base.py:18-29 (range mapping), with identical parameter paths
(encoder/decoder/quant_conv/post_quant_conv/codebook) and the SD latent-scale
convention (0.18215).

Functional differences on TPU: encode returns a DiagonalGaussian value object
(pure), decode/forward take explicit rng; VQ forward returns (rec, aux) where
aux carries the EMA state update for the trainer to apply.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Module, Params
from fmdm_tpu.nn.layers import ConvND
from fmdm_tpu.nn.vae_modules import (
    Decoder,
    DiagonalGaussian,
    Encoder,
    MagvitDiscriminatorND,
    PatchDiscriminator,
    VectorQuantizer,
    VectorQuantizerEMA,
)

LATENT_SCALE: float = 0.18215


class BaseAutoencoder(Module):
    """Range mapping helpers (reference autoencoder/base.py:18-29)."""

    @staticmethod
    def image_to_model_range(x):
        return x * 2.0 - 1.0

    @staticmethod
    def model_to_image_range(x):
        return (x + 1.0) / 2.0

    @staticmethod
    def raw_output_to_image(x, recon_type: str = "l1"):
        if recon_type in ("bce", "bce_focal", "focal"):
            return jax.nn.sigmoid(x)
        return (x + 1.0) / 2.0


class AutoencoderKL(BaseAutoencoder):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        resolution: int = 256,
        base_ch: int = 128,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
        down_channels: Optional[Tuple[int, ...]] = None,
        num_res_blocks: int = 2,
        attn_resolutions: Tuple[int, ...] = (),
        z_channels: int = 4,
        embed_dim: int = 4,
        dropout: float = 0.0,
        use_attention: bool = True,
        attn_heads: int = 4,
        attn_dim_head: int = 64,
        spatial_dims: int = 2,
        emb_channels: Optional[int] = None,
        use_scale_shift_norm: bool = False,
        norm_groups: Optional[int] = None,
        codebook_size: Optional[int] = None,
        num_embeddings: Optional[int] = None,
        ckpt_path: Optional[str] = None,
        double_z: bool = True,
        block_factory=None,
        block_norm_type: str = "gn",
        block_act: str = "silu",
        **_unused,
    ) -> None:
        super().__init__()
        self.spatial_dims = spatial_dims
        self.out_channels = out_channels
        if block_factory is None and (block_norm_type != "gn" or block_act != "silu"):
            from fmdm_tpu.nn.blocks import ResBlockND

            def block_factory(**kwargs):
                return ResBlockND(norm_type=block_norm_type, act=block_act, **kwargs)

        common = dict(
            base_ch=base_ch, ch_mult=tuple(ch_mult),
            down_channels=tuple(down_channels) if down_channels is not None else None,
            num_res_blocks=num_res_blocks, attn_resolutions=tuple(attn_resolutions),
            resolution=resolution, z_channels=z_channels, dropout=dropout,
            use_attention=use_attention, attn_heads=attn_heads, attn_dim_head=attn_dim_head,
            spatial_dims=spatial_dims, emb_channels=emb_channels,
            use_scale_shift_norm=use_scale_shift_norm, norm_groups=norm_groups,
            block_factory=block_factory,
        )
        self.encoder = Encoder(in_channels=in_channels, double_z=double_z, **common)
        self.decoder = Decoder(out_ch=out_channels, tanh_out=False, **common)
        self.quant_conv = ConvND(spatial_dims, 2 * z_channels, 2 * embed_dim, 1, padding=0)
        self.post_quant_conv = ConvND(spatial_dims, embed_dim, z_channels, 1, padding=0)
        self.embed_dim = embed_dim
        self.num_embeddings = num_embeddings
        self.codebook_size = codebook_size
        self.ckpt_path = ckpt_path
        if not ckpt_path:
            logging.debug("[AutoencoderKL] No checkpoint provided. Random initialization.")

    def make_discriminator(self) -> PatchDiscriminator:
        return PatchDiscriminator(in_channels=self.decoder.final_channels, spatial_dims=self.spatial_dims)

    def encode(self, params: Params, x: jax.Array, normalize: bool = False, **kwargs):
        h = self.encoder(params["encoder"], x, **kwargs)
        moments = self.quant_conv(params["quant_conv"], h)
        posterior = DiagonalGaussian(moments)
        if normalize:
            return posterior.mode() * LATENT_SCALE
        return posterior

    def decode(self, params: Params, z: jax.Array, denorm: bool = False, **kwargs) -> jax.Array:
        if denorm:
            z = z / LATENT_SCALE
        z = self.post_quant_conv(params["post_quant_conv"], z)
        return self.decoder(params["decoder"], z, **kwargs)

    def __call__(self, params: Params, x: jax.Array, sample_posterior: bool = True,
                 rng: Optional[jax.Array] = None, **kwargs):
        posterior = self.encode(params, x, normalize=False, **kwargs)
        if sample_posterior:
            if rng is None:
                raise ValueError("sample_posterior=True requires rng")
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        rec = self.decode(params, z, denorm=False, **kwargs)
        return rec, posterior


class VQVAE(BaseAutoencoder):
    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        resolution: int = 256,
        base_ch: int = 128,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
        down_channels: Optional[Tuple[int, ...]] = None,
        num_res_blocks: int = 2,
        attn_resolutions: Tuple[int, ...] = (),
        z_channels: int = 4,
        embed_dim: int = 4,
        dropout: float = 0.0,
        use_attention: bool = True,
        attn_heads: int = 4,
        attn_dim_head: int = 64,
        spatial_dims: int = 2,
        emb_channels: Optional[int] = None,
        use_scale_shift_norm: bool = False,
        ckpt_path: Optional[str] = None,
        codebook_size: int = 1024,
        vq_beta: float = 0.25,
        vq_ema_decay: float = 0.99,
        vq_ema_eps: float = 1e-5,
        quantizer_type: str = "ema",
        discriminator_type: str = "patchgan",
        block_factory=None,
        block_norm_type: str = "gn",
        block_act: str = "silu",
        **_unused,
    ) -> None:
        super().__init__()
        self.spatial_dims = spatial_dims
        self.out_channels = out_channels
        self.quantizer_type = str(quantizer_type).lower()
        self.discriminator_type = str(discriminator_type).lower() if discriminator_type is not None else "patchgan"
        if block_factory is None and (block_norm_type != "gn" or block_act != "silu"):
            from fmdm_tpu.nn.blocks import ResBlockND

            def block_factory(**kwargs):
                return ResBlockND(norm_type=block_norm_type, act=block_act, **kwargs)

        common = dict(
            base_ch=base_ch, ch_mult=tuple(ch_mult),
            down_channels=tuple(down_channels) if down_channels is not None else None,
            num_res_blocks=num_res_blocks, attn_resolutions=tuple(attn_resolutions),
            resolution=resolution, z_channels=z_channels, dropout=dropout,
            use_attention=use_attention, attn_heads=attn_heads, attn_dim_head=attn_dim_head,
            spatial_dims=spatial_dims, emb_channels=emb_channels,
            use_scale_shift_norm=use_scale_shift_norm, block_factory=block_factory,
        )
        self.encoder = Encoder(in_channels=in_channels, double_z=False, **common)
        self.decoder = Decoder(out_ch=out_channels, tanh_out=False, **common)
        self.quant_conv = ConvND(spatial_dims, z_channels, embed_dim, 1, padding=0)
        self.post_quant_conv = ConvND(spatial_dims, embed_dim, z_channels, 1, padding=0)
        self.embed_dim = embed_dim
        self.ckpt_path = ckpt_path

        if self.quantizer_type in {"classic", "vq"}:
            self.codebook = VectorQuantizer(
                num_embeddings=codebook_size, embedding_dim=embed_dim, commitment_cost=vq_beta
            )
        elif self.quantizer_type == "ema":
            self.codebook = VectorQuantizerEMA(
                num_embeddings=codebook_size, embedding_dim=embed_dim,
                commitment_cost=vq_beta, decay=vq_ema_decay, eps=vq_ema_eps,
            )
        else:
            raise ValueError(
                f"Unknown quantizer_type '{self.quantizer_type}'. Expected 'classic' or 'ema'."
            )

    def init(self, key):
        params = super().init(key)
        if self.quantizer_type == "ema":
            # torch clones embedding into ema_w at init (codebook.py:113-115)
            params["codebook"]["ema_w"] = params["codebook"]["embedding"]
        return params

    def make_discriminator(self):
        if self.discriminator_type in {"patchgan", "default"}:
            return PatchDiscriminator(in_channels=self.decoder.final_channels, spatial_dims=self.spatial_dims)
        if self.discriminator_type == "magvit":
            return MagvitDiscriminatorND(in_channels=self.decoder.final_channels, spatial_dims=self.spatial_dims)
        raise ValueError(
            f"Unknown discriminator_type '{self.discriminator_type}'. Expected 'patchgan' or 'magvit'."
        )

    def encode(self, params: Params, x: jax.Array, normalize: bool = False, **kwargs) -> jax.Array:
        h = self.encoder(params["encoder"], x, **kwargs)
        quant_in = self.quant_conv(params["quant_conv"], h)
        if normalize:
            return quant_in * LATENT_SCALE
        return quant_in

    def decode(self, params: Params, z: jax.Array, denorm: bool = False, **kwargs) -> jax.Array:
        if denorm:
            z = z / LATENT_SCALE
        z = self.post_quant_conv(params["post_quant_conv"], z)
        return self.decoder(params["decoder"], z, **kwargs)

    def __call__(self, params: Params, x: jax.Array, *, train: bool = False, **kwargs):
        quant_in = self.encode(params, x, normalize=False, **kwargs)
        out = self.codebook(params["codebook"], quant_in, train=train)
        rec = self.decode(params, out.quantized, denorm=False, **kwargs)
        aux = {
            "vq_loss": out.vq_loss,
            "perplexity": out.perplexity,
            "codes": out.codes,
            "ema_update": out.new_state,
        }
        return rec, aux
