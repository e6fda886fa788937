"""
Numerical parity vs the reference PyTorch implementation (when mounted).

Builds the reference torch models from /root/reference/src, copies their
state_dicts into our parameter trees (identical key paths + tensor layouts by
design), and asserts forward outputs match within float32 tolerance — the
'samples match the PyTorch reference within numerical tolerance' target
(BASELINE.json). Skips cleanly when the reference isn't mounted.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_SRC = Path("/root/reference/src")
if not REF_SRC.exists():
    pytest.skip("reference repo not mounted", allow_module_level=True)

if str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))

try:
    import src  # registers nn/models/... aliases (reference src/__init__.py:16-19)
except Exception:
    import importlib
    sys.path.insert(0, str(REF_SRC.parent))
    src = importlib.import_module("src")

from fmdm_tpu.nn.module import unflatten_params  # noqa: E402


def _to_jax_params(torch_module):
    flat = {k: np.asarray(v.detach().cpu().numpy()) for k, v in torch_module.state_dict().items()}
    return unflatten_params(flat)


@pytest.mark.parametrize("use_scale_shift", [False, True])
def test_resblock_parity(use_scale_shift):
    from nn.blocks.residual import ResBlockND as RefResBlock
    from fmdm_tpu.nn.blocks import ResBlockND

    torch.manual_seed(0)
    ref = RefResBlock(channels=8, emb_channels=16, dropout=0.0, out_channels=12,
                      use_scale_shift_norm=use_scale_shift, zero_init_last_conv=False,
                      emb_activation_before_proj=True, add_embedding_to_hidden=True)
    ref.eval()
    ours = ResBlockND(channels=8, emb_channels=16, dropout=0.0, out_channels=12,
                      use_scale_shift_norm=use_scale_shift, zero_init_last_conv=False,
                      emb_activation_before_proj=True, add_embedding_to_hidden=True)
    params = _to_jax_params(ref)

    x = np.random.RandomState(1).randn(2, 8, 10, 10).astype(np.float32)
    emb = np.random.RandomState(2).randn(2, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(emb)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(emb)))
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=2e-5)


def test_diffusers_attention_parity():
    from nn.blocks.attention import DiffusersAttentionND as RefAttn
    from fmdm_tpu.nn.blocks import DiffusersAttentionND

    torch.manual_seed(0)
    ref = RefAttn(16, heads=4, norm_num_groups=8)
    ref.eval()
    ours = DiffusersAttentionND(16, heads=4, norm_num_groups=8)
    params = _to_jax_params(ref)
    x = np.random.RandomState(3).randn(2, 16, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=2e-5)


def test_spatial_self_attention_parity():
    from nn.blocks.attention import SpatialSelfAttention as RefAttn
    from fmdm_tpu.nn.blocks import SpatialSelfAttention

    torch.manual_seed(0)
    ref = RefAttn(dim=16, heads=4, dim_head=8, use_linear=False)
    ref.eval()
    # zero-init proj_out makes outputs trivially equal; randomize it
    with torch.no_grad():
        ref.proj_out.weight.normal_()
        ref.proj_out.bias.normal_()
    ours = SpatialSelfAttention(dim=16, heads=4, dim_head=8, use_linear=False)
    params = _to_jax_params(ref)
    x = np.random.RandomState(4).randn(2, 16, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=2e-4, atol=2e-5)


def test_linear_attention_block_parity():
    from nn.blocks.attention import SpatialSelfAttention as RefAttn
    from fmdm_tpu.nn.blocks import SpatialSelfAttention

    torch.manual_seed(0)
    ref = RefAttn(dim=16, heads=2, dim_head=8, use_linear=True)
    ref.eval()
    with torch.no_grad():
        ref.proj_out.weight.normal_()
    ours = SpatialSelfAttention(dim=16, heads=2, dim_head=8, use_linear=True)
    params = _to_jax_params(ref)
    x = np.random.RandomState(5).randn(1, 16, 5, 5).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=3e-4, atol=3e-5)


def test_unet_diffusers_full_parity():
    """Full forward pass parity of the diffusers-compat UNet."""
    from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
    from fmdm_tpu.models.unet_diffusers import UNetDiffusersND

    kwargs = dict(
        in_channels=1, out_channels=1,
        down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16, 16), layers_per_block=1, norm_num_groups=4,
    )
    torch.manual_seed(0)
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = UNetDiffusersND(**kwargs)
    params = _to_jax_params(ref)

    x = np.random.RandomState(6).randn(2, 1, 32, 32).astype(np.float32)
    t = np.array([5, 900], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(t)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(t)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_efficient_unet_full_parity():
    from models.unet.unet import EfficientUNetND as RefUNet
    from fmdm_tpu.models.unet_efficient import EfficientUNetND

    kwargs = dict(
        spatial_dims=2, in_channels=1, model_channels=8, out_channels=1,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        conv_resample=True, dim_head=8, num_heads=2, use_linear_attn=False,
        use_scale_shift_norm=True, dropout=0.0,
    )
    torch.manual_seed(0)
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = EfficientUNetND(**kwargs)
    params = _to_jax_params(ref)

    x = np.random.RandomState(7).randn(2, 1, 16, 16).astype(np.float32)
    t = np.array([0.1, 0.9], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(t)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(t)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_vae_encoder_decoder_parity():
    from nn.modules.vae.encoder import Encoder as RefEncoder
    from nn.modules.vae.decoder import Decoder as RefDecoder
    from fmdm_tpu.nn.vae_modules import Decoder, Encoder

    enc_kwargs = dict(in_channels=1, base_ch=8, ch_mult=(1, 2), num_res_blocks=1,
                      resolution=16, z_channels=2, double_z=True, use_attention=True)
    torch.manual_seed(0)
    ref_enc = RefEncoder(**enc_kwargs)
    ref_enc.eval()
    ours_enc = Encoder(**enc_kwargs)
    params = _to_jax_params(ref_enc)
    x = np.random.RandomState(8).randn(1, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_enc(torch.tensor(x)).numpy()
    our_out = np.asarray(ours_enc(params, jnp.array(x)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)

    dec_kwargs = dict(out_ch=1, base_ch=8, ch_mult=(1, 2), num_res_blocks=1,
                      resolution=16, z_channels=2, use_attention=True)
    ref_dec = RefDecoder(**dec_kwargs)
    ref_dec.eval()
    ours_dec = Decoder(**dec_kwargs)
    params = _to_jax_params(ref_dec)
    z = np.random.RandomState(9).randn(1, 2, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_dec(torch.tensor(z)).numpy()
    our_out = np.asarray(ours_dec(params, jnp.array(z)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_quantizer_parity():
    """NOTE: the reference quantizer's _stats permutes the 3-D codes tensor
    with a 4-D ordering and crashes on any (N, C, *spatial) input
    (codebook.py:54) — the reference VQ forward path is broken. We patch the
    broken stats out to compare the quantization math, and separately assert
    our codes have the obviously-intended (N, *spatial) shape (capability-
    parity, not bug-parity — SURVEY.md §7.4)."""
    from nn.modules.vae import codebook as ref_codebook
    from fmdm_tpu.nn.vae_modules import VectorQuantizer

    torch.manual_seed(0)
    ref = ref_codebook.VectorQuantizer(num_embeddings=16, embedding_dim=4)
    ref.eval()
    ours = VectorQuantizer(num_embeddings=16, embedding_dim=4)
    params = _to_jax_params(ref)
    z = np.random.RandomState(10).randn(2, 4, 6, 6).astype(np.float32)

    orig_stats = ref_codebook._VectorQuantizerBase._stats
    try:
        ref_codebook._VectorQuantizerBase._stats = (
            lambda self, enc, idx, z_, perm, inv, eps=1e-5: (torch.tensor(0.0), idx)
        )
        with torch.no_grad():
            q_ref, loss_ref, _perp, _codes = ref(torch.tensor(z))
    finally:
        ref_codebook._VectorQuantizerBase._stats = orig_stats

    out = ours(params, jnp.array(z))
    np.testing.assert_allclose(np.asarray(out.quantized), q_ref.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(out.vq_loss), float(loss_ref), rtol=2e-4)
    assert out.codes.shape == (2, 6, 6)


def test_checkpoint_cross_load():
    """A checkpoint saved by the torch reference loads into our model and
    produces identical outputs (the SURVEY.md §7.3 item 2 contract)."""
    import tempfile

    from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
    from fmdm_tpu.models.unet_diffusers import UNetDiffusersND
    from fmdm_tpu.utils.checkpoint import load_model_params

    kwargs = dict(
        in_channels=1, out_channels=1,
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 8), layers_per_block=1, norm_num_groups=4,
    )
    torch.manual_seed(1)
    ref = RefUNet(**kwargs)
    ref.eval()
    with tempfile.TemporaryDirectory() as tmp:
        ckpt = Path(tmp) / "diff_last.pt"
        torch.save({"model": ref.state_dict(), "epoch": 3, "best_metric": 0.1}, ckpt)
        ours = UNetDiffusersND(**kwargs)
        expected = ours.init(jax.random.PRNGKey(0))
        params = load_model_params(ckpt, expected=expected)
    x = np.random.RandomState(11).randn(1, 1, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor([7])).numpy()
    our_out = np.asarray(ours(jax.tree_util.tree_map(jnp.asarray, params), jnp.array(x), jnp.array([7])))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_efficient_unet_pooled_parity():
    """pool_factor patchify/unpatchify path parity."""
    from models.unet.unet import EfficientUNetND as RefUNet
    from fmdm_tpu.models.unet_efficient import EfficientUNetND

    kwargs = dict(
        spatial_dims=2, in_channels=2, model_channels=8, out_channels=2,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
        conv_resample=True, dim_head=8, num_heads=2, use_linear_attn=True,
        use_scale_shift_norm=True, dropout=0.0, pool_factor=2,
    )
    torch.manual_seed(2)
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = EfficientUNetND(**kwargs)
    params = _to_jax_params(ref)
    x = np.random.RandomState(12).randn(1, 2, 16, 16).astype(np.float32)
    t = np.array([0.3], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(t)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(t)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_efficient_unet_cross_attention_parity():
    from models.unet.unet import EfficientUNetND as RefUNet
    from fmdm_tpu.models.unet_efficient import EfficientUNetND

    kwargs = dict(
        spatial_dims=2, in_channels=1, model_channels=8, out_channels=1,
        num_res_blocks=1, attention_resolutions=(1,),
        cross_attention_resolutions=(1,), cross_attention_dim=4,
        channel_mult=(1, 2), conv_resample=True, dim_head=8, num_heads=2,
        use_linear_attn=False, use_scale_shift_norm=True, dropout=0.0,
    )
    torch.manual_seed(3)
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = EfficientUNetND(**kwargs)
    params = _to_jax_params(ref)
    x = np.random.RandomState(13).randn(2, 1, 16, 16).astype(np.float32)
    ctx = np.random.RandomState(14).randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([0.1, 0.7], dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(t), context_ca=torch.tensor(ctx)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(t), context_ca=jnp.array(ctx)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)


def test_unet_diffusers_cross_attention_parity():
    from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
    from fmdm_tpu.models.unet_diffusers import UNetDiffusersND

    kwargs = dict(
        in_channels=1, out_channels=1,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        mid_block_type="UNetMidBlock2DCrossAttn",
        block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
        cross_attention_dim=4,
    )
    torch.manual_seed(4)
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = UNetDiffusersND(**kwargs)
    params = _to_jax_params(ref)
    x = np.random.RandomState(15).randn(2, 1, 16, 16).astype(np.float32)
    ctx = np.random.RandomState(16).randn(2, 4, 16, 16).astype(np.float32)
    t = np.array([3, 40], dtype=np.int64)
    with torch.no_grad():
        ref_out = ref(torch.tensor(x), torch.tensor(t), context_ca=torch.tensor(ctx)).numpy()
    our_out = np.asarray(ours(params, jnp.array(x), jnp.array(t), context_ca=jnp.array(ctx)))
    np.testing.assert_allclose(our_out, ref_out, rtol=5e-4, atol=5e-5)
