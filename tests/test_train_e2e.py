"""End-to-end smoke: MNIST DDPM + flow matching train -> artifacts -> resume ->
sample. The minimum slice of SURVEY.md §7.2 step 7, on the CPU mesh."""

import json
import shutil
from pathlib import Path

import numpy as np
import pytest

import jax

from fmdm_tpu.data.mnist import MNISTDataset
from fmdm_tpu.utils.checkpoint import load_checkpoint


class TinyMNIST(MNISTDataset):
    """Small subset for fast smoke runs."""

    def __init__(self, root, train=True, img_size=16, download=True, n=24):
        super().__init__(root, train=train, img_size=img_size, download=download)
        self.images = self.images[:n]
        self.labels = self.labels[:n]


def _write_cfg(tmp_path: Path, model_type: str, sched: str) -> Path:
    cfg = {
        "training": {
            "data_root": str(tmp_path / "data"),
            "dataset": "mnist",
            "output_dir": str(tmp_path / f"ckpt_{model_type}"),
            "train_batch_size": 8,
            "num_epochs": 2,
            "learning_rate": 1e-3,
            "weight_decay": 0.0,
            "gradient_accumulation_steps": 2,
            "lr_warmup_steps": 2,
            "scheduler": sched,
            "num_train_timesteps": 50,
            "num_inference_steps": 5,
            "conditioning": "concatenate",
            "channels": 1,
            "img_size": 16,
            "save_model_epochs": 1,
            "mixed_precision": "no",
            "seed": 7,
            "save_images": True,
            "save_images_every": 2,
            "visual_samples": 4,
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
            "scheduler": {"name": sched, "num_train_timesteps": 50, "num_inference_steps": 5},
            "model_type": model_type,
        },
    }
    path = tmp_path / f"{model_type}.json"
    path.write_text(json.dumps(cfg, indent=2))
    return path


@pytest.mark.parametrize("model_type,sched,prefix", [
    ("diffusion", "ddpm", "diff"),
    ("flow_matching", "flow_match_euler", "flow"),
])
def test_train_end_to_end(tmp_path, model_type, sched, prefix):
    if model_type == "diffusion":
        from fmdm_tpu.train.diffusion_lib import train
    else:
        from fmdm_tpu.train.flow_matching_lib import train

    cfg_path = _write_cfg(tmp_path, model_type, sched)
    ds = TinyMNIST(tmp_path / "data", train=True)
    val = TinyMNIST(tmp_path / "data", train=False, n=8)

    run_dir = train(ds, cfg_path, val_dataset=val)

    # Run-dir layout contract (SURVEY.md §5.4)
    assert (run_dir / "train_config.json").exists()
    assert (run_dir / f"{prefix}_last.pt").exists()
    assert (run_dir / f"{prefix}_best.pt").exists()
    assert (run_dir / "epochs" / "epoch0002" / "epoch.pt").exists()
    metrics = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert metrics[0] == "epoch,train_loss"
    assert len(metrics) == 3
    loss1 = float(metrics[1].split(",")[1])
    loss2 = float(metrics[2].split(",")[1])
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert (run_dir / "visuals" / "epoch0002_output.png").exists()

    # checkpoint payload contract
    payload = load_checkpoint(run_dir / f"{prefix}_last.pt")
    assert payload["epoch"] == 2
    assert "model" in payload and "optimizer" in payload
    flat_names = []

    def collect(d, prefix_=""):
        for k, v in d.items():
            if isinstance(v, dict):
                collect(v, prefix_ + k + ".")
            else:
                flat_names.append(prefix_ + k)

    collect(payload["model"])
    assert any(n.startswith("down_blocks.0.resnets.0.conv1.conv.weight") for n in flat_names)

    # resume: continues from epoch 3 without error
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 3
    cfg["training"]["output_dir"] = str(run_dir)
    cfg_path.write_text(json.dumps(cfg))
    run_dir2 = train(ds, cfg_path, val_dataset=val, resume=str(run_dir / f"{prefix}_last.pt"))
    metrics = (run_dir2 / "metrics.csv").read_text().strip().splitlines()
    assert metrics[-1].startswith("3,")


def test_checkpoint_torch_interop(tmp_path):
    """Our checkpoints must be loadable as genuine torch state_dicts."""
    torch = pytest.importorskip("torch")
    from fmdm_tpu.models import UNetDiffusersND
    from fmdm_tpu.utils.checkpoint import save_checkpoint

    model = UNetDiffusersND(
        in_channels=1, out_channels=1, block_out_channels=(8, 8),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
    )
    params = model.init(jax.random.PRNGKey(0))
    save_checkpoint({"model": params, "epoch": 1, "best_metric": 0.5}, tmp_path / "m.pt")
    payload = torch.load(tmp_path / "m.pt", map_location="cpu", weights_only=False)
    sd = payload["model"]
    assert isinstance(sd["conv_in.weight"], torch.Tensor)
    assert sd["conv_in.weight"].shape == (8, 1, 3, 3)  # torch OIHW layout


def test_checkpoint_every_epochs_gates_saves(tmp_path):
    """training.checkpoint_every_epochs skips the state gather + last/best
    writes on off-epochs; the final epoch always saves."""
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["num_epochs"] = 3
    cfg["training"]["checkpoint_every_epochs"] = 2
    cfg["training"]["save_model_epochs"] = 1
    cfg["training"]["save_images"] = False
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True)

    run_dir = train(ds, cfg_path)
    # epoch-dir saves only land on gather epochs (2) and the final epoch (3)
    assert not (run_dir / "epochs" / "epoch0001" / "epoch.pt").exists()
    assert (run_dir / "epochs" / "epoch0002" / "epoch.pt").exists()
    assert (run_dir / "epochs" / "epoch0003" / "epoch.pt").exists()
    payload = load_checkpoint(run_dir / "diff_last.pt")
    assert payload["epoch"] == 3
    assert (run_dir / "diff_best.pt").exists()
    # "best" is tracked at checkpoint granularity: diff_best.pt must hold a
    # gathered (cadence or final) epoch, and the recorded best_metric must be
    # achievable by a SAVED state — never a minimum from an unsaved off-epoch
    # (which would leave diff_best.pt permanently stale).
    best_payload = load_checkpoint(run_dir / "diff_best.pt")
    assert best_payload["epoch"] % 2 == 0 or best_payload["epoch"] == 3
    rows = (run_dir / "metrics.csv").read_text().strip().splitlines()[1:]
    losses = {int(r.split(",")[0]): float(r.split(",")[1]) for r in rows}
    gathered = [losses[e] for e in (2, 3)]
    assert best_payload["best_metric"] == pytest.approx(min(gathered), rel=1e-6)
