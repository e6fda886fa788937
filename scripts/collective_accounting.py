"""Collective-byte accounting for every dryrun parallelism leg.

VERDICT r4 'Next round' #7: the strongest multi-chip scaling evidence a
one-chip environment can produce. For each parallel strategy the framework
ships (DP, DP x TP, FSDP, DP x SP ring attention, TP x FSDP), compile the
FULL training step on an 8-device virtual CPU mesh, extract the cross-device
collectives from the optimized (post-GSPMD) HLO, and print per-leg:

  - count/bytes per collective kind (all-reduce / all-gather /
    reduce-scatter / collective-permute),
  - modeled per-device ICI traffic under ring algorithms
    (fmdm_tpu/parallel/hlo_stats.py),
  - the arithmetic-intensity ratio that decides ICI-bound vs compute-bound
    scaling on real hardware.

The per-strategy collective *signature* is pinned by
tests/test_collective_signature.py — a resharding regression that inserts an
extra weight all-gather or demotes a reduce-scatter to all-reduce changes
these numbers and fails the test.

Usage:  python scripts/collective_accounting.py  (CPU only, no TPU needed)
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

from fmdm_tpu.models.factories import DiffusionUNetFactory
from fmdm_tpu.parallel.hlo_stats import (collective_summary,
                                         ici_bytes_per_device,
                                         parse_collectives)
from fmdm_tpu.parallel.mesh import batch_sharding, replicate, shard_batch
from fmdm_tpu.schedulers import DDPMScheduler
from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

TINY_UNET = {
    "unet_impl": "diffusers_nd",
    "sample_size": 16,
    "in_channels": 1,
    "out_channels": 1,
    "layers_per_block": 1,
    "block_out_channels": [8, 16],
    "down_block_types": ["DownBlock2D", "AttnDownBlock2D"],
    "up_block_types": ["AttnUpBlock2D", "UpBlock2D"],
    "norm_num_groups": 4,
}


def _batch(mesh, batch_size, hw=16):
    return {
        "target": shard_batch(mesh, np.full((batch_size, 1, hw, hw), 0.5, np.float32)),
        "image": shard_batch(mesh, np.full((batch_size, 1, hw, hw), 0.25, np.float32)),
        "valid": shard_batch(mesh, np.ones((batch_size,), np.float32)),
    }


def compiled_hlo_for_leg(leg: str, devices=None, flagship: bool = False) -> str:
    """Build + lower + compile one parallel strategy's train step; return the
    optimized HLO module text. Mirrors __graft_entry__.dryrun_multichip's
    four legs plus pure DP.

    flagship=True compiles the real 256² flagship architecture instead of the
    tiny probe — no execution happens, so this only costs (substantial) XLA
    CPU compile time, and the byte counts are the ones a real v5e pod would
    move per step."""
    devices = devices or jax.devices("cpu")[:8]
    n = len(devices)
    arch, hw = (TINY_UNET, 16)
    if flagship:
        from __graft_entry__ import FLAGSHIP_UNET

        arch, hw = FLAGSHIP_UNET, FLAGSHIP_UNET.get("sample_size", 256)
    model = DiffusionUNetFactory().build(arch, conditioning="concatenate", channels=1)
    optimizer, _ = make_adamw(1e-3, 0.0, 2, 10)
    batch_size = 2 * n

    from fmdm_tpu.ops import attention as attention_ops

    seq_ctx = None
    with jax.default_device(devices[0]):
        params0 = model.init(jax.random.PRNGKey(0))
        scheduler = DDPMScheduler.create(num_train_timesteps=50)
        if leg == "dp":
            mesh = Mesh(np.array(devices), ("data",))
            params = replicate(mesh, params0)
            opt_state = replicate(mesh, optimizer.init(params))
        elif leg == "dp_tp":
            from fmdm_tpu.parallel.tp import shard_opt_state_tp, shard_params_tp

            mesh = Mesh(np.array(devices).reshape(n // 2, 2), ("data", "model"))
            params = shard_params_tp(params0, mesh)
            opt_state = shard_opt_state_tp(optimizer.init(params), params, mesh)
        elif leg == "fsdp":
            from fmdm_tpu.parallel.fsdp import (shard_opt_state_fsdp,
                                                shard_params_fsdp)

            mesh = Mesh(np.array(devices), ("data",))
            params = shard_params_fsdp(params0, mesh)
            opt_state = shard_opt_state_fsdp(optimizer.init(params), params, mesh)
        elif leg == "dp_sp":
            mesh = Mesh(np.array(devices).reshape(n // 2, 2), ("data", "seq"))
            attention_ops.set_sequence_parallel(mesh, "seq", min_tokens=1)
            seq_ctx = attention_ops
            params = replicate(mesh, params0)
            opt_state = replicate(mesh, optimizer.init(params))
        elif leg == "tp_fsdp":
            from fmdm_tpu.parallel.fsdp import (shard_opt_state_fsdp_tp,
                                                shard_params_fsdp_tp)

            mesh = Mesh(np.array(devices).reshape(n // 2, 2), ("data", "model"))
            params = shard_params_fsdp_tp(params0, mesh)
            opt_state = shard_opt_state_fsdp_tp(optimizer.init(params), params, mesh)
        else:
            raise ValueError(f"unknown leg '{leg}'")

        try:
            step = make_denoise_train_step(
                model, scheduler, optimizer,
                variant="diffusion", conditioning_mode="concatenate",
                latent_norm=None, grad_accum=1, mesh=mesh,
            )
            batch = _batch(mesh, batch_size, hw)
            if leg == "dp_sp":
                sh = batch_sharding(mesh)
                batch = {k: jax.device_put(np.asarray(v), sh) for k, v in batch.items()}
            lowered = step.lower(params, opt_state, batch, jax.random.PRNGKey(1))
            return lowered.compile().as_text()
        finally:
            if seq_ctx is not None:
                seq_ctx.clear_sequence_parallel()


LEGS = ("dp", "dp_tp", "fsdp", "dp_sp", "tp_fsdp")


def main() -> None:
    flagship = "--flagship" in sys.argv
    legs = [a for a in sys.argv[1:] if not a.startswith("--")] or list(LEGS)
    # v5e public specs used only for the scaling *bound*: 197 bf16 TFLOP/s,
    # 1600 Gbit/s (=200 GB/s) aggregate ICI per chip.
    ICI_GBPS = 200e9
    rows = {}
    for leg in legs:
        text = compiled_hlo_for_leg(leg, flagship=flagship)
        cols = parse_collectives(text)
        summary = collective_summary(cols)
        ici = ici_bytes_per_device(cols)
        rows[leg] = {
            "summary": summary,
            "ici_bytes_per_device": ici,
            "ici_floor_us": 1e6 * ici / ICI_GBPS,
            "n_collectives": len(cols),
        }
        print(f"== {leg}", flush=True)
        for kind, s in sorted(summary.items()):
            print(f"   {kind:20s} count={s['count']:3d} bytes={s['bytes']:,}")
        print(f"   modeled ICI bytes/device/step: {ici:,} "
              f"(ring-ICI floor {rows[leg]['ici_floor_us']:.0f} us/step at 200 GB/s)",
              flush=True)
    name = "collective_accounting_flagship.json" if flagship else "collective_accounting.json"
    out = REPO / ".scratch" / name
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
