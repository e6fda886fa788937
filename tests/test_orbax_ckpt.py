"""Orbax checkpoint backend: payload round-trip + trainer integration with
``training.checkpoint_backend: orbax`` (ROADMAP item; same run-dir layout)."""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import optax
import pytest

pytest.importorskip("orbax.checkpoint")

from fmdm_tpu.utils import checkpoint as ckpt_utils
from fmdm_tpu.utils import orbax_ckpt


@pytest.fixture(autouse=True)
def _reset_backend():
    yield
    ckpt_utils.set_checkpoint_backend("torch")


def _params():
    return {
        "conv": {"weight": np.random.randn(4, 2, 3, 3).astype(np.float32),
                 "bias": np.zeros((4,), np.float32)},
        "norm": {"weight": np.ones((4,), np.float32)},
    }


def test_orbax_roundtrip(tmp_path):
    params = _params()
    opt = optax.adamw(1e-3)
    opt_state = opt.init(params)
    state = {"model": params, "optimizer": opt_state, "epoch": 3,
             "best_metric": 0.25, "note": "hello"}
    path = tmp_path / "diff_last.pt"
    orbax_ckpt.save_checkpoint(state, path)
    assert path.is_dir() and orbax_ckpt.is_orbax_checkpoint(path)

    # generic loader auto-detects the orbax format
    out = ckpt_utils.load_checkpoint(path)
    assert out["epoch"] == 3 and isinstance(out["epoch"], int)
    assert out["best_metric"] == 0.25
    assert out["note"] == "hello"
    np.testing.assert_array_equal(out["model"]["conv"]["weight"], params["conv"]["weight"])
    # optimizer tree restores with the same structure (usable for resume)
    restored = out["optimizer"]
    import jax

    assert jax.tree_util.tree_structure(restored) == jax.tree_util.tree_structure(opt_state)


def test_orbax_overwrite(tmp_path):
    path = tmp_path / "ck.pt"
    orbax_ckpt.save_checkpoint({"model": _params(), "epoch": 1}, path)
    orbax_ckpt.save_checkpoint({"model": _params(), "epoch": 2}, path)
    assert ckpt_utils.load_checkpoint(path)["epoch"] == 2


def test_backend_dispatch(tmp_path):
    state = {"model": _params(), "epoch": 1, "best_metric": 1.0}
    ckpt_utils.save_checkpoint(state, tmp_path / "a.pt", backend="orbax")
    assert (tmp_path / "a.pt").is_dir()
    ckpt_utils.set_checkpoint_backend("orbax")
    ckpt_utils.save_checkpoint(state, tmp_path / "b.pt")
    assert (tmp_path / "b.pt").is_dir()
    ckpt_utils.set_checkpoint_backend("torch")
    ckpt_utils.save_checkpoint(state, tmp_path / "c.pt")
    assert (tmp_path / "c.pt").is_file()
    with pytest.raises(ValueError):
        ckpt_utils.set_checkpoint_backend("nope")


def test_trainer_with_orbax_backend(tmp_path):
    """Full train -> orbax run dir -> resume -> sample through run_model."""
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"]["checkpoint_backend"] = "orbax"
    cfg_path.write_text(json.dumps(cfg))

    ds = TinyMNIST(tmp_path / "data", train=True)
    run_dir = train(ds, cfg_path)

    last = run_dir / "diff_last.pt"
    assert last.is_dir(), "orbax backend should write checkpoint directories"
    payload = ckpt_utils.load_checkpoint(last)
    assert payload["epoch"] == 2

    # resume from the orbax checkpoint (auto-detected) for one more epoch
    cfg["training"]["num_epochs"] = 3
    (run_dir / "train_config.json").write_text(json.dumps(cfg))
    run_dir2 = train(ds, run_dir / "train_config.json", resume=last)
    assert ckpt_utils.load_checkpoint(run_dir2 / "diff_last.pt")["epoch"] == 3

    # model-param loading path used by samplers works on orbax dirs
    params = ckpt_utils.load_model_params(run_dir2 / "diff_last.pt")
    assert "conv_in" in params or len(params) > 0


@pytest.mark.parametrize("backend", ["torch_async", "orbax_async"])
def test_async_backend_roundtrip(tmp_path, backend):
    """Async saves land after flush with identical payloads, order preserved
    (the 'last' checkpoint must be the last save)."""
    from fmdm_tpu.utils import checkpoint as ck

    old = ck.get_checkpoint_backend()
    try:
        ck.set_checkpoint_backend(backend)
        assert ck.get_checkpoint_backend() == backend
        path = tmp_path / ("ck.pt" if backend.startswith("torch") else "ck")
        for epoch in (1, 2, 3):  # successive saves to the same path
            ck.save_checkpoint({"model": {"w": jnp.full((2, 2), float(epoch))},
                                "epoch": epoch}, path)
        ck.flush_checkpoint_writes()
        payload = ck.load_checkpoint(path)
        assert payload["epoch"] == 3
        np.testing.assert_allclose(np.asarray(payload["model"]["w"]), 3.0)
    finally:
        ck.set_checkpoint_backend(old)


def test_clone_checkpoint_survives_src_overwrite(tmp_path):
    """clone = hardlink to the inode; a later atomic overwrite of src swaps
    the inode and must not change the clone."""
    src, dst = tmp_path / "last.pt", tmp_path / "best.pt"
    ckpt_utils.save_checkpoint({"model": {"w": np.ones((2,))}, "epoch": 1}, src)
    ckpt_utils.clone_checkpoint(src, dst)
    assert src.stat().st_ino == dst.stat().st_ino  # no second serialization
    ckpt_utils.save_checkpoint({"model": {"w": np.zeros((2,))}, "epoch": 2}, src)
    assert ckpt_utils.load_checkpoint(dst)["epoch"] == 1
    np.testing.assert_allclose(np.asarray(ckpt_utils.load_checkpoint(dst)["model"]["w"]), 1.0)
    assert ckpt_utils.load_checkpoint(src)["epoch"] == 2


@pytest.mark.parametrize("backend", ["torch", "torch_async", "orbax"])
def test_save_checkpoint_with_mirrors(tmp_path, backend):
    state = {"model": {"w": np.full((3,), 7.0, np.float32)}, "epoch": 5, "best_metric": 0.5}
    primary = tmp_path / "diff_last.pt"
    mirrors = [tmp_path / "diff_best.pt", tmp_path / "epochs" / "epoch0005" / "epoch.pt"]
    ckpt_utils.save_checkpoint_with_mirrors(state, primary, mirrors, backend=backend)
    ckpt_utils.flush_checkpoint_writes()
    for path in [primary] + mirrors:
        payload = ckpt_utils.load_checkpoint(path)
        assert payload["epoch"] == 5 and payload["best_metric"] == 0.5
        np.testing.assert_allclose(np.asarray(payload["model"]["w"]), 7.0)
    if backend == "orbax":
        assert primary.is_dir() and mirrors[0].is_dir()
    else:
        assert primary.stat().st_ino == mirrors[0].stat().st_ino


def test_async_flush_reraises_writer_errors(tmp_path):
    from fmdm_tpu.utils import checkpoint as ck

    old = ck.get_checkpoint_backend()
    try:
        ck.set_checkpoint_backend("torch_async")
        blocked = tmp_path / "no_dir_here"
        blocked.write_text("a file where the save wants a directory")
        ck.save_checkpoint({"model": {"w": jnp.zeros((1,))}, "epoch": 1},
                           blocked / "sub" / "ck.pt")
        with pytest.raises(Exception):
            ck.flush_checkpoint_writes()
    finally:
        ck.set_checkpoint_backend(old)
