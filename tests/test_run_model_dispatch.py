"""CLI contract test for run_model (mirrors the reference
tests/test_run_model_dispatch.py:20-67): mode routing + flag forwarding with a
dummy handler, no model built."""

import sys
from pathlib import Path

import pytest

import fmdm_tpu.run_model as run_model_mod


class _DummyHandler:
    instances = []

    def __init__(self, **kwargs):
        self.kwargs = kwargs
        self.calls = []
        _DummyHandler.instances.append(self)

    def __getattr__(self, name):
        if name in {"sample", "encode", "decode", "evaluate", "build_tensor_cache", "debug_compare"}:
            def call():
                self.calls.append(name)
            return call
        raise AttributeError(name)


@pytest.fixture(autouse=True)
def _patch(monkeypatch):
    _DummyHandler.instances = []
    monkeypatch.setattr(run_model_mod, "load_run_config", lambda d: {"model": {"model_type": "vae"}})
    monkeypatch.setattr(run_model_mod, "HANDLER_REGISTRY", {"vae": _DummyHandler})
    yield


@pytest.mark.parametrize("mode,method", [
    ("sample", "sample"),
    ("encode", "encode"),
    ("decode", "decode"),
    ("evaluate", "evaluate"),
    ("build_tensor_cache", "build_tensor_cache"),
    ("debug_compare", "debug_compare"),
])
def test_mode_routing(monkeypatch, mode, method):
    monkeypatch.setattr(sys, "argv", ["run_model.py", "--ckpt_dir", "/tmp/x", "--mode", mode])
    run_model_mod.main()
    handler = _DummyHandler.instances[-1]
    assert handler.calls == [method]


def test_flag_forwarding(monkeypatch):
    monkeypatch.setattr(sys, "argv", [
        "run_model.py", "--ckpt_dir", "/tmp/x", "--mode", "sample",
        "--batch_size", "7", "--num_samples", "3", "--save", "--save_input",
        "--save_conditioning", "--scheduler", "dpmsolver++", "--num_inference_steps", "25",
        "--start_step", "700", "--last_n_steps", "5", "--seed", "9",
    ])
    run_model_mod.main()
    kw = _DummyHandler.instances[-1].kwargs
    assert kw["batch_size"] == 7
    assert kw["num_samples"] == 3
    assert kw["save"] and kw["save_input"] and kw["save_conditioning"]
    assert kw["scheduler"] == "dpmsolver++"
    assert kw["num_inference_steps"] == 25
    assert kw["start_step"] == 700
    assert kw["last_n_steps"] == 5
    assert kw["seed"] == 9
