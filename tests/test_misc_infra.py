"""Infrastructure odds and ends: prefetch semantics, distributed init no-op,
legacy CLI, compile-cache helper."""

import json
import sys

import numpy as np
import pytest


def test_prefetch_preserves_order_and_propagates_errors():
    from fmdm_tpu.train.common import prefetch

    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)


def test_maybe_initialize_distributed_noop(monkeypatch):
    from fmdm_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    maybe_initialize_distributed()  # single process: must be a no-op


def test_enable_compile_cache_opt_out(monkeypatch, tmp_path):
    from fmdm_tpu.utils.cache import enable_compile_cache

    monkeypatch.setenv("FMDM_NO_COMPILE_CACHE", "1")
    enable_compile_cache()  # no-op, no exception
    monkeypatch.delenv("FMDM_NO_COMPILE_CACHE")
    monkeypatch.setenv("FMDM_COMPILE_CACHE_DIR", str(tmp_path / "cc"))
    enable_compile_cache()
    assert (tmp_path / "cc").exists()


def test_legacy_train_cli(tmp_path, monkeypatch):
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    import fmdm_tpu.legacy_train as legacy

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    # pre-create the tiny dataset files so the legacy CLI's builder finds data
    TinyMNIST(tmp_path / "data", train=True, n=8)

    # the legacy CLI builds datasets via build_train_val_datasets; synthetic
    # MNIST fallback makes that work with the plain config (dataset: mnist)
    monkeypatch.setattr(sys, "argv", [
        "legacy_train", "diffusion", "--config", str(cfg_path),
        "--epochs", "1", "--batch_size", "8",
    ])
    legacy.main()
    runs = list((tmp_path / "ckpt_diffusion").parent.glob("ckpt_diffusion_run*"))
    assert runs, "legacy CLI did not produce a run dir"
    metrics = (runs[0] / "metrics.csv").read_text().strip().splitlines()
    assert len(metrics) == 2
    assert np.isfinite(float(metrics[1].split(",")[1]))


def test_autotune_grad_accum_halves_until_fit():
    from fmdm_tpu.train.common import autotune_grad_accum, is_memory_error

    class FakeOOM(Exception):
        pass

    built = []

    def build(accum):
        built.append(accum)
        return f"step_accum_{accum}"

    def trial(step, accum):
        # pretend only micro-batches <= 4 fit (batch 32 -> accum >= 8)
        if 32 // accum > 4:
            raise FakeOOM("RESOURCE_EXHAUSTED: out of memory while allocating")

    accum, step = autotune_grad_accum(
        build, trial, batch_size=32, grad_accum=1, allow_microbatching=True)
    assert accum == 8 and step == "step_accum_8"
    assert built == [1, 2, 4, 8]


def test_autotune_grad_accum_respects_disable_and_reraises():
    import pytest
    from fmdm_tpu.train.common import autotune_grad_accum

    def build(accum):
        return accum

    def trial_oom(step, accum):
        raise RuntimeError("RESOURCE_EXHAUSTED: hbm capacity")

    with pytest.raises(RuntimeError):
        autotune_grad_accum(build, trial_oom, batch_size=8, grad_accum=1,
                            allow_microbatching=False)

    def trial_other(step, accum):
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError):
        autotune_grad_accum(build, trial_other, batch_size=8, grad_accum=1,
                            allow_microbatching=True)


def test_epoch_batches_threaded_fetch_matches_serial():
    """num_workers only changes WHO fetches dataset[i], never batch content:
    threaded (default) and serial epochs must be bit-identical, and slow,
    out-of-order sample arrival must not reorder within a batch."""
    import time

    import numpy as np

    from fmdm_tpu.train.common import epoch_batches

    class SlowDS:
        def __init__(self, n=11):
            rng = np.random.RandomState(7)
            self.t = rng.randn(n, 1, 4, 4).astype(np.float32)

        def __len__(self):
            return len(self.t)

        def __getitem__(self, i):
            time.sleep(0.01 * (i % 3))  # jitter completion order
            return {"target": self.t[i], "image": None}

    ds = SlowDS()
    kw = dict(shuffle=True, seed=3, epoch=2)
    serial = list(epoch_batches(ds, 4, num_workers=0, **kw))
    threaded = list(epoch_batches(ds, 4, num_workers=4, **kw))
    auto = list(epoch_batches(ds, 4, **kw))  # default: auto thread count
    assert len(serial) == len(threaded) == len(auto) == 3
    for s, t, a in zip(serial, threaded, auto):
        np.testing.assert_array_equal(s["target"], t["target"])
        np.testing.assert_array_equal(s["target"], a["target"])
        np.testing.assert_array_equal(s["valid"], t["valid"])


def test_epoch_batches_threaded_fetch_propagates_errors():
    import numpy as np

    from fmdm_tpu.train.common import epoch_batches

    class BoomDS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise RuntimeError("bad sample")
            return {"target": np.zeros((1, 4, 4), np.float32), "image": None}

    import pytest

    with pytest.raises(RuntimeError, match="bad sample"):
        list(epoch_batches(BoomDS(), 4, shuffle=False, seed=0, epoch=0, num_workers=4))
