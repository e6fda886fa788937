"""Full-surface sample-chain parity matrix vs the PyTorch reference stack.

Extends tests/test_full_chain_sample_parity.py (2 solver spot-checks) into the
complete north-star property: for EVERY run_model scheduler alias
(/root/reference/src/run_model.py:56-61), on BOTH UNet families
(/root/reference/src/models/unet/unet_diffusers_nd.py, unet.py), under every
conditioning mode the reference supports (unconditioned / channel-concatenate
/ cross-attention + latent_norm, src/pipelines/train/diffusion_lib.py:161-165),
the production jitted ``lax.scan`` engine produces the same final samples as
the reference's torch UNet driven step-by-step through the independent numpy
scheduler oracles — the shape of the reference's ``sample_with_scheduler``
loop (/root/reference/src/pipelines/utils.py:163-220).

Stochastic solvers (ddpm, dpmsolversde) share one injected noise stream: the
torch loop consumes the exact per-step normal draws the jax engine's
counter-based RNG will produce, so trajectories are comparable elementwise.

Also covers the two remaining chain families VERDICT r2 called out:
- VAE chain: torch AutoencoderKL encode(mode)->decode vs ours on cross-loaded
  weights (/root/reference/src/models/vae/kl.py:118-136);
- latent-diffusion chain: VAE-encode -> DPM++ denoise -> VAE-decode through
  both stacks end-to-end.
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
    import src  # noqa: F401  (registers the reference's package aliases)
except Exception:
    import importlib
    sys.path.insert(0, str(REF_SRC.parent))
    importlib.import_module("src")

from fmdm_tpu.nn.module import unflatten_params  # noqa: E402
from fmdm_tpu.sample.engine import sample_with_scheduler  # noqa: E402
from fmdm_tpu.schedulers import (  # noqa: E402
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverMultistepScheduler,
    DPMSolverSDEScheduler,
    FlowMatchEulerDiscreteScheduler,
    UniPCMultistepScheduler,
)
from oracles.diffusers_numpy import (  # noqa: E402
    NpDDIM,
    NpDDPM,
    NpDPMSolverMultistep,
    NpDPMSolverSDE,
    NpFlowMatchEuler,
    NpUniPC,
)

N_STEPS = 8
SHAPE = (2, 1, 16, 16)

# The 8 run_model --scheduler aliases (src/run_model.py:56-61 ->
# pipelines/utils.py:65-90), each as (jax factory, oracle factory, stochastic).
ALIASES = {
    "ddpm": (lambda: DDPMScheduler.create(),
             lambda: NpDDPM(), True),
    "ddim": (lambda: DDIMScheduler.create(),
             lambda: NpDDIM(), False),
    "dpmsolver1": (lambda: DPMSolverMultistepScheduler.create(
                       solver_order=1, algorithm_type="dpmsolver"),
                   lambda: NpDPMSolverMultistep(
                       solver_order=1, algorithm_type="dpmsolver"), False),
    "dpmsolver2": (lambda: DPMSolverMultistepScheduler.create(
                       solver_order=2, algorithm_type="dpmsolver"),
                   lambda: NpDPMSolverMultistep(
                       solver_order=2, algorithm_type="dpmsolver"), False),
    "dpmsolver++": (lambda: DPMSolverMultistepScheduler.create(
                        solver_order=2, algorithm_type="dpmsolver++"),
                    lambda: NpDPMSolverMultistep(
                        solver_order=2, algorithm_type="dpmsolver++"), False),
    "dpmsolversde": (lambda: DPMSolverSDEScheduler.create(),
                     lambda: NpDPMSolverSDE(), True),
    "unipc": (lambda: UniPCMultistepScheduler.create(),
              lambda: NpUniPC(), False),
    "flowmatch": (lambda: FlowMatchEulerDiscreteScheduler.create(),
                  lambda: NpFlowMatchEuler(), False),
}

DIFFUSERS_KWARGS = dict(
    in_channels=1, out_channels=1,
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
)
DIFFUSERS_ATTN_KWARGS = dict(
    in_channels=1, out_channels=1,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    mid_block_type="UNetMidBlock2DCrossAttn",
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    cross_attention_dim=4,
)
EFFICIENT_KWARGS = dict(
    spatial_dims=2, in_channels=1, model_channels=8, out_channels=1,
    num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 2),
    conv_resample=True, dim_head=8, num_heads=2, use_linear_attn=False,
    use_scale_shift_norm=True, dropout=0.0,
)
EFFICIENT_ATTN_KWARGS = dict(
    EFFICIENT_KWARGS, cross_attention_resolutions=(1,), cross_attention_dim=4,
)


def _to_jax_params(torch_module):
    flat = {k: np.asarray(v.detach().cpu().numpy())
            for k, v in torch_module.state_dict().items()}
    return unflatten_params(flat)


def _build_pair(model_kind: str, conditioning: str):
    """(torch reference model, our model, cross-loaded params)."""
    torch.manual_seed(0)
    if model_kind == "diffusers":
        from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
        from fmdm_tpu.models.unet_diffusers import UNetDiffusersND as OurUNet

        kwargs = dict(DIFFUSERS_ATTN_KWARGS if conditioning == "attention"
                      else DIFFUSERS_KWARGS)
        if conditioning == "concatenate":
            kwargs["in_channels"] = 2
    else:
        from models.unet.unet import EfficientUNetND as RefUNet
        from fmdm_tpu.models.unet_efficient import EfficientUNetND as OurUNet

        kwargs = dict(EFFICIENT_ATTN_KWARGS if conditioning == "attention"
                      else EFFICIENT_KWARGS)
        if conditioning == "concatenate":
            kwargs["in_channels"] = 2
    ref = RefUNet(**kwargs)
    ref.eval()
    ours = OurUNet(**kwargs)
    return ref, ours, _to_jax_params(ref)


def _engine_noise_stream(seed: int, n_calls: int, shape):
    """The exact per-step normal draws the production engine will consume:
    engine.__call__ splits its rng into (init, steps) and the jitted scan
    splits `steps` into one key per call (sample/engine.py)."""
    _, rng_steps = jax.random.split(jax.random.PRNGKey(seed))
    keys = jax.random.split(rng_steps, n_calls)
    return np.stack([np.asarray(jax.random.normal(k, shape, jnp.float32))
                     for k in keys]).astype(np.float64)


def _standardize(c: np.ndarray) -> np.ndarray:
    """normalize_latent_conditioning('standardize') with torch ddof=1 std
    (reference pipelines/utils.py:122-150)."""
    axes = tuple(range(2, c.ndim))
    mean = c.mean(axis=axes, keepdims=True)
    std = c.std(axis=axes, keepdims=True, ddof=1)
    return (c - mean) / (std + 1e-6)


def _torch_reverse_loop(ref, oracle, ts, x_init, *, noises=None,
                        conditioning=None, cond=None, ctx=None):
    is_int_t = np.issubdtype(np.asarray(ts).dtype, np.integer)
    x = np.asarray(x_init, np.float64)
    with torch.no_grad():
        for i, t in enumerate(ts):
            xin = (oracle.scale_model_input(x)
                   if hasattr(oracle, "scale_model_input") else x)
            model_in = torch.tensor(np.asarray(xin), dtype=torch.float32)
            if conditioning == "concatenate":
                model_in = torch.cat(
                    [model_in, torch.tensor(cond, dtype=torch.float32)], dim=1)
            if is_int_t:
                tt = torch.full((x.shape[0],), int(t), dtype=torch.int64)
            else:
                tt = torch.full((x.shape[0],), float(t), dtype=torch.float32)
            if conditioning == "attention":
                eps = ref(model_in, tt,
                          context_ca=torch.tensor(ctx, dtype=torch.float32))
            else:
                eps = ref(model_in, tt)
            kwargs = {}
            if noises is not None:
                kwargs["noise"] = noises[i]
            x = np.asarray(
                oracle.step(eps.numpy().astype(np.float64), t, x, **kwargs),
                np.float64)
    return x.astype(np.float32)


@pytest.mark.parametrize("conditioning", [None, "concatenate", "attention"])
@pytest.mark.parametrize("model_kind", ["diffusers", "efficient"])
@pytest.mark.parametrize("alias", sorted(ALIASES))
def test_chain_matrix(alias, model_kind, conditioning):
    sched_f, oracle_f, stochastic = ALIASES[alias]
    ref, ours, params = _build_pair(model_kind, conditioning)

    sched = sched_f()
    oracle = oracle_f()
    ts_jax = sched.set_timesteps(N_STEPS)
    ts_oracle = oracle.set_timesteps(N_STEPS)
    np.testing.assert_allclose(
        np.asarray(ts_jax, np.float64), np.asarray(ts_oracle, np.float64),
        rtol=1e-5, atol=1e-4)
    n_calls = len(ts_jax)

    rs = np.random.RandomState(17)
    x_init = rs.randn(*SHAPE).astype(np.float32) * float(
        getattr(oracle, "init_noise_sigma", 1.0))
    cond = ctx = None
    cond_batch = latent_norm = None
    if conditioning == "concatenate":
        cond = rs.rand(SHAPE[0], 1, *SHAPE[2:]).astype(np.float32)
        cond_batch = jnp.asarray(cond)
    elif conditioning == "attention":
        raw_ctx = rs.randn(SHAPE[0], 4, *SHAPE[2:]).astype(np.float32)
        ctx = _standardize(raw_ctx.astype(np.float64)).astype(np.float32)
        cond_batch = jnp.asarray(raw_ctx)
        latent_norm = "standardize"

    seed = 23
    noises = _engine_noise_stream(seed, n_calls, SHAPE) if stochastic else None

    torch_final = _torch_reverse_loop(
        ref, oracle, ts_oracle, x_init, noises=noises,
        conditioning=conditioning, cond=cond, ctx=ctx)
    jax_final = np.asarray(sample_with_scheduler(
        ours, params, sched, N_STEPS, SHAPE, jax.random.PRNGKey(seed),
        conditioning_mode=conditioning, conditioning_batch=cond_batch,
        latent_norm=latent_norm, init_sample=jnp.asarray(x_init),
    ))

    assert np.isfinite(jax_final).all()
    rms = float(np.sqrt((torch_final**2).mean()))
    max_abs = float(np.abs(jax_final - torch_final).max())
    assert max_abs < 0.02 * max(rms, 1.0), (
        f"{alias}/{model_kind}/{conditioning}: final samples diverge — "
        f"max|diff|={max_abs:.5f}, torch rms={rms:.4f}")


# ---------------------------------------------------------------------------
# VAE + latent-diffusion chains
# ---------------------------------------------------------------------------

VAE_KWARGS = dict(
    in_channels=1, out_channels=1, resolution=16, base_ch=8, ch_mult=(1, 2),
    num_res_blocks=1, attn_resolutions=(), z_channels=2, embed_dim=2,
    use_attention=True,
)


def _build_vae_pair():
    from models.vae.kl import AutoencoderKL as RefVAE
    from fmdm_tpu.models.vae import AutoencoderKL as OurVAE

    torch.manual_seed(1)
    ref = RefVAE(**VAE_KWARGS)
    ref.eval()
    ours = OurVAE(**VAE_KWARGS)
    return ref, ours, _to_jax_params(ref)


def test_vae_chain_parity():
    """encode(mode) -> decode through both stacks on cross-loaded weights
    (reference src/models/vae/kl.py:118-136)."""
    ref, ours, params = _build_vae_pair()
    image = np.random.RandomState(2).rand(2, 1, 16, 16).astype(np.float32)
    x = image * 2.0 - 1.0  # image_to_model_range (autoencoder/base.py:18-23)

    with torch.no_grad():
        post_ref = ref.encode(torch.tensor(x))
        z_ref = post_ref.mode().numpy()
        rec_ref = ref.decode(torch.tensor(z_ref)).numpy()
        z_norm_ref = ref.encode(torch.tensor(x), normalize=True).numpy()

    post = ours.encode(params, jnp.asarray(x))
    z = np.asarray(post.mode())
    rec = np.asarray(ours.decode(params, jnp.asarray(z)))
    z_norm = np.asarray(ours.encode(params, jnp.asarray(x), normalize=True))

    np.testing.assert_allclose(z, z_ref, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(z_norm, z_norm_ref, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(rec, rec_ref, rtol=5e-4, atol=2e-4)


def test_latent_diffusion_chain_parity():
    """VAE-encode -> DPM++ reverse process in latent space -> VAE-decode,
    the reference's latent-diffusion composition (LDCT PixelAttention family),
    end-to-end through both stacks."""
    vae_ref, vae_ours, vae_params = _build_vae_pair()

    # latent-space UNet: embed_dim=2 channels at 8x8
    torch.manual_seed(3)
    from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
    from fmdm_tpu.models.unet_diffusers import UNetDiffusersND as OurUNet

    unet_kwargs = dict(
        in_channels=2, out_channels=2,
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    )
    unet_ref = RefUNet(**unet_kwargs)
    unet_ref.eval()
    unet_ours = OurUNet(**unet_kwargs)
    unet_params = _to_jax_params(unet_ref)

    image = np.random.RandomState(4).rand(2, 1, 16, 16).astype(np.float32)
    x = image * 2.0 - 1.0
    lat_shape = (2, 2, 8, 8)
    x_init = np.random.RandomState(5).randn(*lat_shape).astype(np.float32)

    # torch chain: encode (SD latent scaling) -> oracle-driven DPM++ -> decode
    oracle = NpDPMSolverMultistep()
    ts = oracle.set_timesteps(N_STEPS)
    with torch.no_grad():
        z_ref = vae_ref.encode(torch.tensor(x), normalize=True).numpy()
    # denoise from the encoded latent perturbed by shared noise (an
    # init_from_reference-style start, diffusion_utils.py:214-227)
    lat_ref = _torch_reverse_loop(unet_ref, oracle, ts, z_ref + 0.1 * x_init)
    with torch.no_grad():
        out_ref = vae_ref.decode(torch.tensor(lat_ref), denorm=True).numpy()

    # jax chain through the production engine
    z = np.asarray(vae_ours.encode(vae_params, jnp.asarray(x), normalize=True))
    np.testing.assert_allclose(z, z_ref, rtol=5e-4, atol=5e-5)
    sched = DPMSolverMultistepScheduler.create()
    lat = np.asarray(sample_with_scheduler(
        unet_ours, unet_params, sched, N_STEPS, lat_shape,
        jax.random.PRNGKey(0), init_sample=jnp.asarray(z + 0.1 * x_init),
    ))
    out = np.asarray(vae_ours.decode(vae_params, jnp.asarray(lat), denorm=True))

    rms = float(np.sqrt((out_ref**2).mean()))
    max_abs = float(np.abs(out - out_ref).max())
    assert max_abs < 0.02 * max(rms, 1.0), (
        f"latent chain diverges — max|diff|={max_abs:.5f}, rms={rms:.4f}")
