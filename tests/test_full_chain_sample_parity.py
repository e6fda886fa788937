"""Full-chain reverse-process parity vs the PyTorch reference stack.

The BASELINE.json north star — "generated samples match the PyTorch reference
within numerical tolerance" — as a test, not an inference:

  torch side: the reference UNet (/root/reference/src, eval mode) driven by the
      independent sequential numpy scheduler oracles
      (tests/oracles/diffusers_numpy.py) in a plain Python loop — the shape of
      the reference's sample_with_scheduler hot loop
      (/root/reference/src/pipelines/utils.py:163-220);
  jax side: the SAME weights cross-loaded into fmdm_tpu's UNet and run through
      the real production engine — fmdm_tpu/sample/engine.py's single jitted
      lax.scan — with the matching fmdm_tpu scheduler.

Both start from the same Gaussian init; final samples must agree. Covers the
deterministic solvers (DDIM and the 50-step DPM++ headline config).
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
from fmdm_tpu.schedulers import DDIMScheduler, DPMSolverMultistepScheduler  # noqa: E402
from oracles.diffusers_numpy import NpDDIM, NpDPMSolverMultistep  # noqa: E402

UNET_KWARGS = dict(
    in_channels=1, out_channels=1,
    down_block_types=("DownBlock2D", "AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D", "UpBlock2D"),
    block_out_channels=(8, 16, 16), layers_per_block=1, norm_num_groups=4,
)
SHAPE = (2, 1, 32, 32)


def _build_pair():
    from models.unet.unet_diffusers_nd import UNetDiffusersND as RefUNet
    from fmdm_tpu.models.unet_diffusers import UNetDiffusersND

    torch.manual_seed(0)
    ref = RefUNet(**UNET_KWARGS)
    ref.eval()
    ours = UNetDiffusersND(**UNET_KWARGS)
    flat = {k: np.asarray(v.detach().cpu().numpy()) for k, v in ref.state_dict().items()}
    return ref, ours, unflatten_params(flat)


def _torch_reverse_loop(ref, oracle, n_steps, x_init):
    ts = oracle.set_timesteps(n_steps)
    x = torch.tensor(x_init, dtype=torch.float32)
    with torch.no_grad():
        for t in ts:
            tt = torch.full((x.shape[0],), int(t), dtype=torch.int64)
            eps = ref(x, tt)
            x = torch.tensor(
                oracle.step(eps.numpy().astype(np.float64), t, x.numpy().astype(np.float64)),
                dtype=torch.float32,
            )
    return x.numpy()


CASES = {
    "ddim50": (lambda: DDIMScheduler.create(num_train_timesteps=1000),
               lambda: NpDDIM()),
    "dpmpp50": (lambda: DPMSolverMultistepScheduler.create(num_train_timesteps=1000),
                lambda: NpDPMSolverMultistep()),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_full_reverse_process_matches_reference_stack(name):
    sched_f, oracle_f = CASES[name]
    ref, ours, params = _build_pair()

    n_steps = 50
    x_init = np.asarray(jax.random.normal(jax.random.PRNGKey(11), SHAPE, jnp.float32))

    torch_final = _torch_reverse_loop(ref, oracle_f(), n_steps, x_init)
    jax_final = np.asarray(sample_with_scheduler(
        ours, params, sched_f(), n_steps, SHAPE,
        jax.random.PRNGKey(0), init_sample=jnp.asarray(x_init),
    ))

    assert np.isfinite(jax_final).all()
    # 50 UNet evaluations with feedback: per-eval f32 cross-framework noise
    # (~5e-4 rtol on forwards, test_reference_parity.py) compounds through the
    # loop; a scheduler/math error produces O(1) divergence.
    rms = float(np.sqrt((torch_final**2).mean()))
    max_abs = float(np.abs(jax_final - torch_final).max())
    assert max_abs < 0.02 * max(rms, 1.0), (
        f"{name}: final samples diverge — max|diff|={max_abs:.4f}, torch rms={rms:.4f}"
    )
