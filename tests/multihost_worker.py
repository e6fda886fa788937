"""Worker process for tests/test_multihost.py.

Each worker is one JAX process of a 2-process x 4-virtual-CPU-device cluster
(jax.distributed.initialize against a localhost coordinator) — the TPU-native
analogue of one torchrun rank (/root/reference/src/utils/training_utils.py:209-232).

Modes:
  gradcheck  one jitted denoise train step over the GLOBAL data mesh with a
             deterministic per-process batch; prints the updated-parameter
             checksum so the test can assert cross-process agreement and
             equality with a single-process run on the concatenated batch.
  batches    per-process epoch_batches count (pad-to-equal proof).
  train      the real diffusion trainer end-to-end (2 epochs), optionally
             resuming — run-dir layout, rank-0 gating, and resume semantics
             execute under true multi-process conditions.
"""

import argparse
import json
import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


class SynthDS:
    """Deterministic synthetic dataset, identical in every process."""

    def __init__(self, n=21, size=16):
        import numpy as np

        rng = np.random.RandomState(5)
        self.data = rng.rand(n, 1, size, size).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return {
            "target": self.data[i], "image": None,
            "img_id": f"s{i}", "img_path": f"s{i}.npy",
            "img_size": self.data[i].shape,
        }


def tiny_cfg(tmp: Path, epochs: int) -> dict:
    return {
        "training": {
            "output_dir": str(tmp / "run"),
            "train_batch_size": 4,
            "num_epochs": epochs,
            "learning_rate": 1e-3,
            "weight_decay": 0.0,
            "lr_warmup_steps": 2,
            "num_train_timesteps": 50,
            "num_inference_steps": 5,
            "save_model_epochs": 1,
            "mixed_precision": "no",
            "seed": 7,
            "save_images": False,
        },
        "model": {
            "unet": {
                "unet_impl": "diffusers_nd",
                "sample_size": 16,
                "in_channels": 1,
                "out_channels": 1,
                "layers_per_block": 1,
                "block_out_channels": [8, 8],
                "down_block_types": ["DownBlock2D", "DownBlock2D"],
                "up_block_types": ["UpBlock2D", "UpBlock2D"],
                "norm_num_groups": 4,
            },
            "scheduler": {"name": "ddpm", "num_train_timesteps": 50,
                          "num_inference_steps": 5},
            "model_type": "diffusion",
        },
    }


def tiny_vae_cfg(tmp: Path, epochs: int, fsdp: bool) -> dict:
    return {
        "training": {
            "output_dir": str(tmp / "vrun"),
            "batch_size": 4,
            "epochs": epochs,
            "learning_rate": 1e-3,
            "recon_type": "l1",
            "kl_weight": 1e-4,
            "gan_weight": 0.1,
            "gan_start": 1,
            "save_every": 1,
            "save_images": False,
            "img_size": 16,
            "seed": 3,
            **({"fsdp": True} if fsdp else {}),
        },
        "model": {
            "in_channels": 1, "out_channels": 1, "resolution": 16,
            "base_ch": 8, "ch_mult": [1, 2], "num_res_blocks": 1,
            "z_channels": 2, "embed_dim": 2, "use_attention": False,
            "latent_type": "kl", "model_type": "vae",
        },
    }


def gradcheck_step(per_process_batch: int, fsdp: bool = False, tp: int = 1,
                   sp: int = 1):
    """Build model/optimizer/step exactly as the test's single-process
    simulation does, returning the post-step parameter checksum. With
    ``fsdp`` the parameters/moments live sliced over the global data axis
    (multi-host ZeRO-3); with ``tp`` > 1 weights slice over an intra-process
    model axis (multi-host dp × tp); with ``sp`` > 1 the batch rides a
    dp × seq mesh whose ring axis is intra-process. Every layout must be
    numerically identical to replicated DP."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fmdm_tpu.parallel import mesh as mesh_lib
    from fmdm_tpu.sample.diffusion_utils import build_diffusion_model
    from fmdm_tpu.schedulers import DDPMScheduler
    from fmdm_tpu.train.common import make_adamw, make_denoise_train_step

    cfg = tiny_cfg(Path("/tmp"), 1)
    model, params = build_diffusion_model(cfg, ckpt_path=None, rng=jax.random.PRNGKey(0))
    scheduler = DDPMScheduler.create(num_train_timesteps=50)
    optimizer, _ = make_adamw(1e-3, 0.0, 0, 10)
    if tp > 1:
        from fmdm_tpu.parallel import tp as tp_lib

        mesh = tp_lib.create_dp_tp_mesh_global(per_process_batch, tp)
        params = tp_lib.shard_params_tp(params, mesh)
        opt_state = tp_lib.shard_opt_state_tp(optimizer.init(params), params, mesh)
    elif sp > 1:
        mesh = mesh_lib.create_dp_sp_mesh_global(per_process_batch, sp)
        params = mesh_lib.replicate(mesh, params)
        opt_state = mesh_lib.replicate(mesh, optimizer.init(params))
    elif fsdp:
        from fmdm_tpu.parallel import fsdp as fsdp_lib

        mesh = mesh_lib.create_data_mesh(per_process_batch)
        params = fsdp_lib.shard_params_fsdp(params, mesh)
        opt_state = fsdp_lib.shard_opt_state_fsdp(optimizer.init(params), params, mesh)
    else:
        mesh = mesh_lib.create_data_mesh(per_process_batch)
        params = mesh_lib.replicate(mesh, params)
        opt_state = mesh_lib.replicate(mesh, optimizer.init(params))
    step = make_denoise_train_step(
        model, scheduler, optimizer, variant="diffusion",
        conditioning_mode=None, latent_norm=None, grad_accum=1,
        compute_dtype=jnp.float32, mesh=mesh)

    global_batch = np.random.RandomState(3).rand(8, 1, 16, 16).astype(np.float32)
    lo = jax.process_index() * per_process_batch
    local = global_batch[lo: lo + per_process_batch] \
        if jax.process_count() > 1 else global_batch
    placed = {
        "target": mesh_lib.shard_batch(mesh, local),
        "image": None,
        "valid": mesh_lib.shard_batch(mesh, np.ones((local.shape[0],), np.float32)),
    }
    params, opt_state, loss_sum, count = step(params, opt_state, placed,
                                              jax.random.PRNGKey(42))
    host = mesh_lib.to_host(params)
    checksum = float(sum(np.float64(np.abs(leaf).sum())
                         for leaf in jax.tree_util.tree_leaves(host)))
    return checksum, float(loss_sum), float(count)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", required=True,
                    choices=("gradcheck", "gradcheck_fsdp", "gradcheck_tp",
                             "gradcheck_sp", "batches", "train", "train_fsdp",
                             "train_tp", "train_sp", "train_vae",
                             "train_vae_fsdp"))
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--tmp", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--resume", default=None)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nproc, process_id=args.pid)
    assert jax.process_count() == args.nproc
    assert len(jax.devices()) == 4 * args.nproc

    import numpy as np  # noqa: F401

    tmp = Path(args.tmp)
    if args.mode in ("gradcheck", "gradcheck_fsdp", "gradcheck_tp",
                     "gradcheck_sp"):
        checksum, loss, count = gradcheck_step(
            per_process_batch=4, fsdp=args.mode == "gradcheck_fsdp",
            tp=2 if args.mode == "gradcheck_tp" else 1,
            sp=2 if args.mode == "gradcheck_sp" else 1)
        print(f"RESULT checksum={checksum!r} loss={loss!r} count={count!r}",
              flush=True)
    elif args.mode == "batches":
        from fmdm_tpu.train.common import epoch_batches

        ds = SynthDS(n=21)
        batches = list(epoch_batches(
            ds, 4, shuffle=True, seed=7, epoch=1,
            process_index=jax.process_index(),
            process_count=jax.process_count()))
        n_valid = sum(int(b["valid"].sum()) for b in batches)
        print(f"RESULT n_batches={len(batches)} n_valid={n_valid}", flush=True)
    elif args.mode in ("train_vae", "train_vae_fsdp"):
        from fmdm_tpu.train import vae_impl

        cfg = tiny_vae_cfg(tmp, args.epochs, fsdp=args.mode == "train_vae_fsdp")
        cfg_path = tmp / f"vae_cfg_p{args.pid}.json"
        cfg_path.write_text(json.dumps(cfg))
        ds = SynthDS(n=21, size=16)
        run_dir = vae_impl.train(ds, cfg_path, val_dataset=SynthDS(n=9, size=16))
        print(f"RESULT run_dir={run_dir}", flush=True)
    else:  # train / train_fsdp / train_tp / train_sp
        from fmdm_tpu.train import denoise_lib

        cfg = tiny_cfg(tmp, args.epochs)
        if args.mode == "train_fsdp":
            cfg["training"]["fsdp"] = True
        elif args.mode == "train_tp":
            cfg["training"]["tensor_parallel"] = 2
        elif args.mode == "train_sp":
            cfg["training"]["sequence_parallel"] = 2
        if args.resume:
            cfg["training"]["output_dir"] = str(Path(args.resume).parent)
        cfg_path = tmp / f"cfg_p{args.pid}.json"
        cfg_path.write_text(json.dumps(cfg))
        ds = SynthDS(n=21)
        run_dir = denoise_lib.train(ds, cfg_path, val_dataset=None,
                                    resume=args.resume, variant="diffusion")
        print(f"RESULT run_dir={run_dir}", flush=True)


if __name__ == "__main__":
    main()
