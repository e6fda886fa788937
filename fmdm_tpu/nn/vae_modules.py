"""
VAE building blocks: SD-style hierarchical Encoder/Decoder, DiagonalGaussian,
vector quantizers (classic + EMA) and discriminators.

Structural parity with /root/reference/src/nn/modules/vae/ (encoder.py:19-158,
decoder.py:19-160, reparameterizer.py:13-55, codebook.py:12-137,
discriminators.py:13-49) with identical parameter paths: conv_in,
downs.N.blocks.M / downs.N.attns.M / downs.N.down, mid_block1/mid_attn/
mid_block2, norm_out, conv_out; ups mirror-ordered.

TPU-first difference: the EMA codebook's in-forward buffer mutation becomes
explicit functional state threaded through the train step and psum-able under
data parallelism (SURVEY.md §7.3 item 5).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from fmdm_tpu.nn.module import Identity, Module, ModuleList, Params
from fmdm_tpu.nn.layers import Conv, ConvND, GroupNorm
from fmdm_tpu.nn.blocks import DownsampleND, ResBlockND, SpatialSelfAttention, UpsampleND


def _default_block_factory(**kwargs):
    return ResBlockND(**kwargs)


class _Stage(Module):
    """Named container matching the reference's per-stage nn.Module holder."""

    def __init__(self, blocks, attns, resample: Optional[Module], resample_name: str):
        super().__init__()
        self.blocks = ModuleList(blocks)
        self.attns = ModuleList(attns)
        self.resample_name = resample_name if resample is not None else None
        if resample is not None:
            self.add_child(resample_name, resample)

    def __call__(self, params: Params, x, emb=None, **kwargs):
        for i, block in enumerate(self.blocks):
            x = block(params["blocks"][str(i)], x, emb, **kwargs)
            if i < len(self.attns):
                x = self.attns[i](params["attns"][str(i)], x, **kwargs)
        if self.resample_name is not None:
            x = self._children[self.resample_name](params[self.resample_name], x)
        return x


def _build_attention_layer(channels: int, attn_heads, attn_dim_head) -> SpatialSelfAttention:
    heads = attn_heads if attn_heads is not None else 1
    if attn_dim_head is not None:
        dim_head = attn_dim_head
    elif heads == 1:
        dim_head = channels
    else:
        dim_head = max(1, channels // heads)
    return SpatialSelfAttention(dim=channels, heads=heads, dim_head=dim_head,
                                use_linear=False, use_efficient_attn=True)


class Encoder(Module):
    def __init__(
        self,
        in_channels: int = 3,
        base_ch: int = 128,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
        down_channels: Optional[Tuple[int, ...]] = None,
        num_res_blocks: int = 2,
        attn_resolutions: Tuple[int, ...] = (),
        resolution: int = 256,
        z_channels: int = 4,
        dropout: float = 0.0,
        use_attention: bool = True,
        attn_heads: Optional[int] = None,
        attn_dim_head: Optional[int] = None,
        double_z: bool = True,
        spatial_dims: int = 2,
        emb_channels: Optional[int] = None,
        use_scale_shift_norm: bool = False,
        norm_groups: Optional[int] = None,
        block_factory=None,
    ) -> None:
        super().__init__()
        self.double_z = double_z
        self.z_channels = z_channels
        self.emb_channels = emb_channels
        use_ssn = use_scale_shift_norm and emb_channels is not None
        if emb_channels is None and use_scale_shift_norm:
            raise ValueError("use_scale_shift_norm requires emb_channels to be provided.")
        factory = block_factory or _default_block_factory

        channels = tuple(down_channels) if down_channels is not None else tuple(base_ch * m for m in ch_mult)
        self.conv_in = ConvND(spatial_dims, in_channels, base_ch, 3, padding=1)

        curr_res = resolution
        in_ch = base_ch
        stages = []
        for idx, out_ch in enumerate(channels):
            blocks, attns = [], []
            for _ in range(num_res_blocks):
                blocks.append(factory(
                    channels=in_ch, emb_channels=emb_channels, dropout=dropout,
                    out_channels=out_ch, use_conv=False,
                    use_scale_shift_norm=use_ssn, spatial_dims=spatial_dims,
                ))
                in_ch = out_ch
                if use_attention and (curr_res in tuple(attn_resolutions)):
                    attns.append(_build_attention_layer(in_ch, attn_heads, attn_dim_head))
            down = DownsampleND(spatial_dims, in_ch, use_conv=True) if idx != len(channels) - 1 else None
            if down is not None:
                curr_res //= 2
            stages.append(_Stage(blocks, attns, down, "down"))
        self.downs = ModuleList(stages)

        def mid_block():
            return ResBlockND(channels=in_ch, emb_channels=emb_channels, dropout=dropout,
                              out_channels=in_ch, use_conv=False,
                              use_scale_shift_norm=use_ssn, spatial_dims=spatial_dims)

        self.mid_block1 = mid_block()
        self.mid_attn = _build_attention_layer(in_ch, attn_heads, attn_dim_head) if use_attention else Identity()
        self.mid_block2 = mid_block()

        computed_groups = max(1, math.gcd(in_ch, 32))
        groups = norm_groups if norm_groups is not None else computed_groups
        self.norm_out = GroupNorm(groups, in_ch)
        self.out_channels = 2 * z_channels if double_z else z_channels
        self.conv_out = ConvND(spatial_dims, in_ch, self.out_channels, 3, padding=1)

    def __call__(self, params: Params, x: jax.Array, **kwargs) -> jax.Array:
        emb = None
        if self.emb_channels is not None:
            emb = jnp.zeros((x.shape[0], self.emb_channels), dtype=x.dtype)
        h = self.conv_in(params["conv_in"], x)
        for i, stage in enumerate(self.downs):
            h = stage(params["downs"][str(i)], h, emb, **kwargs)
        h = self.mid_block1(params["mid_block1"], h, emb, **kwargs)
        h = self.mid_attn(params.get("mid_attn", {}), h, **kwargs)
        h = self.mid_block2(params["mid_block2"], h, emb, **kwargs)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        return self.conv_out(params["conv_out"], h)


class Decoder(Module):
    def __init__(
        self,
        out_ch: int = 3,
        base_ch: int = 128,
        ch_mult: Tuple[int, ...] = (1, 2, 4, 4),
        down_channels: Optional[Tuple[int, ...]] = None,
        num_res_blocks: int = 2,
        attn_resolutions: Tuple[int, ...] = (),
        resolution: int = 256,
        z_channels: int = 4,
        dropout: float = 0.0,
        use_attention: bool = True,
        attn_heads: Optional[int] = None,
        attn_dim_head: Optional[int] = None,
        tanh_out: bool = False,
        spatial_dims: int = 2,
        emb_channels: Optional[int] = None,
        use_scale_shift_norm: bool = False,
        norm_groups: Optional[int] = None,
        block_factory=None,
    ) -> None:
        super().__init__()
        self.tanh_out = tanh_out
        self.emb_channels = emb_channels
        use_ssn = use_scale_shift_norm and emb_channels is not None
        if emb_channels is None and use_scale_shift_norm:
            raise ValueError("use_scale_shift_norm requires emb_channels to be provided.")
        factory = block_factory or _default_block_factory

        channels = tuple(down_channels) if down_channels is not None else tuple(base_ch * m for m in ch_mult)
        lowest_res = resolution // (2 ** (len(channels) - 1))
        block_in = channels[-1]
        self.conv_in = ConvND(spatial_dims, z_channels, block_in, 3, padding=1)

        def mid_block(ch):
            return ResBlockND(channels=ch, emb_channels=emb_channels, dropout=dropout,
                              out_channels=ch, use_conv=False,
                              use_scale_shift_norm=use_ssn, spatial_dims=spatial_dims)

        self.mid_block1 = mid_block(block_in)
        self.mid_attn = _build_attention_layer(block_in, attn_heads, attn_dim_head) if use_attention else Identity()
        self.mid_block2 = mid_block(block_in)

        # Reference builds stages in reverse order but *inserts at index 0*
        # (decoder.py:116-117), so ups[0] is the shallowest stage and the
        # forward pass iterates reversed(ups) (deepest first).
        stages = []
        in_ch = block_in
        curr_res = lowest_res
        for idx, out_ch_stage in enumerate(reversed(channels)):
            blocks, attns = [], []
            for _ in range(num_res_blocks + 1):
                blocks.append(factory(
                    channels=in_ch, emb_channels=emb_channels, dropout=dropout,
                    out_channels=out_ch_stage, use_conv=False,
                    use_scale_shift_norm=use_ssn, spatial_dims=spatial_dims,
                ))
                in_ch = out_ch_stage
                if use_attention and (curr_res in tuple(attn_resolutions)):
                    attns.append(_build_attention_layer(in_ch, attn_heads, attn_dim_head))
            up = UpsampleND(spatial_dims, in_ch, use_conv=True) if idx != len(channels) - 1 else None
            if up is not None:
                curr_res *= 2
            stages.insert(0, _Stage(blocks, attns, up, "up"))
        self.ups = ModuleList(stages)
        self.final_channels = out_ch

        computed_groups = max(1, math.gcd(in_ch, 32))
        groups = norm_groups if norm_groups is not None else computed_groups
        self.norm_out = GroupNorm(groups, in_ch)
        self.conv_out = ConvND(spatial_dims, in_ch, out_ch, 3, padding=1)

    def __call__(self, params: Params, z: jax.Array, **kwargs) -> jax.Array:
        emb = None
        if self.emb_channels is not None:
            emb = jnp.zeros((z.shape[0], self.emb_channels), dtype=z.dtype)
        h = self.conv_in(params["conv_in"], z)
        h = self.mid_block1(params["mid_block1"], h, emb, **kwargs)
        h = self.mid_attn(params.get("mid_attn", {}), h, **kwargs)
        h = self.mid_block2(params["mid_block2"], h, emb, **kwargs)
        for i in reversed(range(len(self.ups))):
            h = self.ups[i](params["ups"][str(i)], h, emb, **kwargs)
        h = jax.nn.silu(self.norm_out(params["norm_out"], h))
        h = self.conv_out(params["conv_out"], h)
        return jnp.tanh(h) if self.tanh_out else h


# ---------------------------------------------------------------------------
# Diagonal Gaussian posterior (pure functions of the moment tensor)
# ---------------------------------------------------------------------------

class DiagonalGaussian:
    """q(z|x) utilities (reparameterizer.py:13-55); logvar clamped [-30, 20]."""

    def __init__(self, parameters: jax.Array, deterministic: bool = False):
        mu, logvar = jnp.split(parameters, 2, axis=1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        self.mu = mu
        self.logvar = logvar
        self.deter = deterministic
        if deterministic:
            self.std = jnp.zeros_like(mu)
            self.var = jnp.zeros_like(mu)
        else:
            self.std = jnp.exp(0.5 * logvar)
            self.var = jnp.exp(logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        if self.deter:
            return self.mu
        return self.mu + self.std * jax.random.normal(rng, self.mu.shape, self.mu.dtype)

    def mode(self) -> jax.Array:
        return self.mu

    def kl(self, other: Optional["DiagonalGaussian"] = None, reduce_dims=None) -> jax.Array:
        if self.deter:
            return jnp.zeros((1,), self.mu.dtype)
        if reduce_dims is None:
            reduce_dims = tuple(range(1, self.mu.ndim))
        if other is None:
            return 0.5 * jnp.sum(self.mu**2 + self.var - 1.0 - self.logvar, axis=tuple(reduce_dims))
        return 0.5 * jnp.sum(
            (self.mu - other.mu) ** 2 / other.var + self.var / other.var - 1.0 - self.logvar + other.logvar,
            axis=tuple(reduce_dims),
        )

    def nll(self, x: jax.Array, reduce_dims=None) -> jax.Array:
        if reduce_dims is None:
            reduce_dims = tuple(range(1, self.mu.ndim))
        logtwopi = math.log(2.0 * math.pi)
        return 0.5 * jnp.sum(logtwopi + self.logvar + (x - self.mu) ** 2 / self.var, axis=tuple(reduce_dims))


# ---------------------------------------------------------------------------
# Vector quantizers
# ---------------------------------------------------------------------------

class QuantizerOutput(NamedTuple):
    quantized: jax.Array
    vq_loss: jax.Array
    perplexity: jax.Array
    codes: jax.Array
    new_state: Optional[dict]  # EMA state updates (None for classic)


def _flatten_channels_last(z: jax.Array):
    perm = list(range(z.ndim))
    channel_dim = perm.pop(1)
    perm.append(channel_dim)
    z_perm = jnp.transpose(z, perm)
    flat = z_perm.reshape(-1, z_perm.shape[-1])
    inverse = [0] * len(perm)
    for i, p in enumerate(perm):
        inverse[p] = i
    return flat, tuple(perm), tuple(inverse), z_perm.shape


def _nearest_codes(flat_z: jax.Array, embedding: jax.Array):
    z_sq = jnp.sum(flat_z**2, axis=1, keepdims=True)
    e_sq = jnp.sum(embedding**2, axis=1)
    distances = z_sq + e_sq - 2.0 * flat_z @ embedding.T
    indices = jnp.argmin(distances, axis=1)
    encodings = jax.nn.one_hot(indices, embedding.shape[0], dtype=flat_z.dtype)
    return indices, encodings


class VectorQuantizer(Module):
    """Classic VQ-VAE quantizer with direct codebook gradients
    (codebook.py:58-84). Param: embedding (num, dim)."""

    def __init__(self, num_embeddings: int, embedding_dim: int, commitment_cost: float = 0.25):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.commitment_cost = commitment_cost
        self.param("embedding", lambda k: jax.random.normal(k, (num_embeddings, embedding_dim), jnp.float32))

    def __call__(self, params: Params, z: jax.Array, *, train: bool = False, **kwargs) -> QuantizerOutput:
        embedding = params["embedding"].astype(z.dtype)
        flat_z, perm, inverse, perm_shape = _flatten_channels_last(z)
        indices, encodings = _nearest_codes(flat_z, embedding)
        quantized_flat = encodings @ embedding
        quantized_perm = quantized_flat.reshape(perm_shape)
        quantized = jnp.transpose(quantized_perm, inverse)
        # straight-through estimator
        st_quantized = z + jax.lax.stop_gradient(quantized - z)

        commitment_loss = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2)
        codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(z)) ** 2)
        vq_loss = codebook_loss + self.commitment_cost * commitment_loss

        avg_probs = jnp.mean(encodings, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-5)))
        codes = jnp.transpose(indices.reshape(perm_shape[:-1]), _codes_inverse(inverse))
        return QuantizerOutput(st_quantized, vq_loss, perplexity, codes, None)


def _codes_inverse(inverse_with_channel):
    """codes have one fewer dim (no channel); drop channel from inverse permute."""
    # perm moved channel (pos 1) to the end; codes correspond to perm[:-1].
    # Re-derive inverse for ndim-1 dims: positions 0, 2, 3, ... map to 0..n-2.
    n = len(inverse_with_channel)
    order = [p for p in range(n) if p != 1]  # original dims except channel
    # codes dims currently in perm[:-1] order == order; want original order
    inv = [0] * (n - 1)
    for new_pos, orig_dim in enumerate(order):
        target = orig_dim if orig_dim < 1 else orig_dim - 1
        inv[target] = new_pos
    return tuple(inv)


class VectorQuantizerEMA(Module):
    """EMA codebook quantizer (codebook.py:87-137). Buffers (embedding,
    ema_cluster_size, ema_w) live in params like torch registered buffers; the
    functional update is returned in QuantizerOutput.new_state and applied by
    the trainer (psum'd over the data mesh first under DP)."""

    def __init__(self, num_embeddings: int, embedding_dim: int, commitment_cost: float = 0.25,
                 decay: float = 0.99, eps: float = 1e-5):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.commitment_cost = commitment_cost
        self.decay = decay
        self.eps = eps

        def init_embed(k):
            return jax.random.normal(k, (num_embeddings, embedding_dim), jnp.float32)

        self.param("embedding", init_embed)
        self.param("ema_cluster_size", lambda k: jnp.zeros((num_embeddings,), jnp.float32))
        # ema_w initialized to a copy of embedding: share the same key stream by
        # folding — matches the torch clone() semantics statistically; exact
        # equality is restored by the trainer right after init (see vae_impl).
        self.param("ema_w", init_embed)

    def __call__(self, params: Params, z: jax.Array, *, train: bool = False, **kwargs) -> QuantizerOutput:
        embedding = params["embedding"].astype(z.dtype)
        flat_z, perm, inverse, perm_shape = _flatten_channels_last(z)
        indices, encodings = _nearest_codes(flat_z, embedding)
        quantized_flat = encodings @ embedding

        new_state = None
        if train and self.decay > 0.0:
            encodings_sum = jnp.sum(encodings, axis=0)
            dw = encodings.T @ flat_z
            ema_cluster_size = params["ema_cluster_size"] * self.decay + encodings_sum * (1 - self.decay)
            ema_w = params["ema_w"] * self.decay + dw * (1 - self.decay)
            n = jnp.sum(ema_cluster_size)
            cluster_size = (ema_cluster_size + self.eps) / (n + self.num_embeddings * self.eps) * n
            new_embedding = ema_w / cluster_size[:, None]
            new_state = {
                "embedding": new_embedding,
                "ema_cluster_size": ema_cluster_size,
                "ema_w": ema_w,
            }

        quantized_perm = quantized_flat.reshape(perm_shape)
        quantized = jnp.transpose(quantized_perm, inverse)
        st_quantized = z + jax.lax.stop_gradient(quantized - z)

        commitment_loss = jnp.mean((jax.lax.stop_gradient(quantized) - z) ** 2)
        vq_loss = self.commitment_cost * commitment_loss

        avg_probs = jnp.mean(encodings, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + self.eps)))
        codes = jnp.transpose(indices.reshape(perm_shape[:-1]), _codes_inverse(inverse))
        return QuantizerOutput(st_quantized, vq_loss, perplexity, codes, new_state)


# ---------------------------------------------------------------------------
# Discriminators
# ---------------------------------------------------------------------------

class _LeakyReLU(Module):
    def __call__(self, params, x, **kwargs):
        return jax.nn.leaky_relu(x, 0.2)


class PatchDiscriminator(Module):
    """4-down-conv PatchGAN head (losses/vae.py:75-101). Params under model.N."""

    def __init__(self, in_channels: int = 1, base_channels: int = 64, spatial_dims: int = 2):
        super().__init__()
        from fmdm_tpu.nn.layers import BatchNorm, Sequential

        ch = base_channels
        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")
        self.model = Sequential([
            ConvND(spatial_dims, in_channels, ch, 4, 2, 1),
            _LeakyReLU(),
            ConvND(spatial_dims, ch, ch * 2, 4, 2, 1),
            BatchNorm(ch * 2),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 2, ch * 4, 4, 2, 1),
            BatchNorm(ch * 4),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 4, ch * 8, 4, 2, 1),
            BatchNorm(ch * 8),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 8, 1, 3, padding=1),
        ])

    def __call__(self, params: Params, x, *, train: bool = False, **kwargs):
        return self.model(params["model"], x, train=train)


class MagvitDiscriminatorND(Module):
    """MAGVIT-style 5-conv discriminator (discriminators.py:13-43)."""

    def __init__(self, in_channels: int = 3, base_channels: int = 64, spatial_dims: int = 2):
        super().__init__()
        from fmdm_tpu.nn.layers import BatchNorm, Sequential

        if spatial_dims not in (1, 2, 3):
            raise ValueError("spatial_dims must be 1, 2 or 3")
        ch = base_channels
        self.model = Sequential([
            ConvND(spatial_dims, in_channels, ch, 4, 2, 1),
            _LeakyReLU(),
            ConvND(spatial_dims, ch, ch * 2, 4, 2, 1),
            BatchNorm(ch * 2),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 2, ch * 4, 4, 2, 1),
            BatchNorm(ch * 4),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 4, ch * 8, 4, 1, 1),
            BatchNorm(ch * 8),
            _LeakyReLU(),
            ConvND(spatial_dims, ch * 8, 1, 4, 1, 0),
        ])

    def __call__(self, params: Params, x, *, train: bool = False, **kwargs):
        return self.model(params["model"], x, train=train)


class MagvitDiscriminator(MagvitDiscriminatorND):
    def __init__(self, in_channels: int = 3, base_channels: int = 64):
        super().__init__(in_channels=in_channels, base_channels=base_channels, spatial_dims=2)
