"""Functional blocks layer (L2). See SURVEY.md §1."""

from fmdm_tpu.nn.module import (
    Identity,
    Module,
    ModuleList,
    cast_floating,
    flatten_params,
    param_count,
    unflatten_params,
)
from fmdm_tpu.nn.layers import (
    Activation,
    BatchNorm,
    Conv,
    ConvND,
    ConvTranspose,
    ConvTransposeND,
    GroupNorm,
    Linear,
    RMSNormND,
    Sequential,
    dropout,
    make_activation,
    make_group_norm,
)
from fmdm_tpu.nn.blocks import (
    DiffusersAttentionND,
    DownsampleND,
    PoolND,
    ResBlockND,
    SpatialCrossAttention,
    SpatialSelfAttention,
    UnPoolND,
    UpsampleND,
)
from fmdm_tpu.nn.unet_blocks import DownBlock2DCompat, UNetMidBlock2DCompat, UpBlock2DCompat
from fmdm_tpu.nn.compat import (
    AvgPoolND,
    ContextBlock,
    LinearQKVAttention,
    MaxPoolND,
    QKVAttention,
    TimestepBlock,
    build_resblock_gn_silu,
    build_resblock_gn_swish,
    build_resblock_rmsnorm_silu,
    build_resblock_rmsnorm_swish,
    zero_module,
)
from fmdm_tpu.nn.vae_modules import (
    Decoder,
    DiagonalGaussian,
    Encoder,
    MagvitDiscriminator,
    MagvitDiscriminatorND,
    PatchDiscriminator,
    VectorQuantizer,
    VectorQuantizerEMA,
)
from fmdm_tpu.nn.losses import (
    PerceptualLoss,
    bce_focal_loss,
    discriminator_hinge_loss,
    focal_loss,
    generator_hinge_loss,
    vq_regularizer,
)
