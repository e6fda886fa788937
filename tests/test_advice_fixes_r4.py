"""Regression tests for the round-3 advisor findings (ADVICE.md):

1. (medium) The Pallas flash backward requires block_k % 128 == 0 (its
   probability tiles are built via jnp.tile(lse, (1, block_k // 128))). The
   forward accepts any KV length <= 512, e.g. cross-attention contexts of
   length 77/320 — the bwd rule must fall back to the XLA formulation for
   those shapes instead of failing at grad trace inside the custom_vjp.
2. (low) The sampling-engine cache must distinguish two same-class,
   same-timesteps schedulers whose configs differ (e.g. the
   '?thresholding=true' query override) — keying on the class name alone
   silently reused the first engine's scheduler.
3. (low) save_model_epochs finer than checkpoint_every_epochs silently
   yields 1/Nth of the expected snapshots; the trainers now log a one-time
   warning at startup.
"""

import json
import logging
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1: flash backward falls back to XLA when block_k % 128 != 0
# ---------------------------------------------------------------------------

def _reference_attention(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


@pytest.mark.parametrize("tk", [320, 77])
def test_flash_backward_non_multiple_of_128_kv(tk):
    """Cross-attention shapes the forward accepts must have a working grad."""
    from fmdm_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(0)
    d = 32
    tq = 256
    q = jnp.asarray(rng.randn(2, tq, d), jnp.float32)
    k = jnp.asarray(rng.randn(2, tk, d), jnp.float32)
    v = jnp.asarray(rng.randn(2, tk, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, scale) ** 2)

    # previously: shape-mismatch crash while tracing the custom_vjp bwd rule
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_flash_backward_multiple_of_128_still_pallas_eligible():
    """block_k % 128 == 0 shapes keep taking the Pallas backward."""
    import importlib

    fa = importlib.import_module("fmdm_tpu.ops.pallas.flash_attention")

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 256, 16), jnp.float32)
    k = jnp.asarray(rng.randn(1, 256, 16), jnp.float32)
    v = jnp.asarray(rng.randn(1, 256, 16), jnp.float32)

    g = jax.grad(lambda q: jnp.sum(fa.flash_attention(q, k, v) ** 2))(q)
    g_ref = jax.grad(
        lambda q: jnp.sum(_reference_attention(q, k, v, 0.25) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# 2: engine cache distinguishes scheduler configs
# ---------------------------------------------------------------------------

def test_scheduler_fingerprint_distinguishes_query_overrides():
    from fmdm_tpu.sample.diffusion_utils import _scheduler_fingerprint
    from fmdm_tpu.schedulers import build_scheduler, resolve_scheduler_override

    tcfg = {"num_train_timesteps": 50}
    plain, _ = build_scheduler(resolve_scheduler_override("dpmsolver++"), tcfg)
    thresh, _ = build_scheduler(
        resolve_scheduler_override("dpmsolver++?thresholding=true"), tcfg)
    assert plain.__class__ is thresh.__class__
    assert _scheduler_fingerprint(plain) != _scheduler_fingerprint(thresh)
    # same config -> same fingerprint (the cache must still hit)
    plain2, _ = build_scheduler(resolve_scheduler_override("dpmsolver++"), tcfg)
    assert _scheduler_fingerprint(plain) == _scheduler_fingerprint(plain2)
    # fingerprints are usable as dict keys
    hash((_scheduler_fingerprint(plain), _scheduler_fingerprint(thresh)))


# ---------------------------------------------------------------------------
# 3: cadence-interaction warning
# ---------------------------------------------------------------------------

def _run_tiny_train_capturing_warnings(tmp_path, monkeypatch, save_model_epochs,
                                       checkpoint_every):
    # caplog can't be used here: the trainer calls
    # logging.basicConfig(force=True), which strips caplog's root handler.
    from tests.test_train_e2e import TinyMNIST, _write_cfg
    from fmdm_tpu.train.diffusion_lib import train

    cfg_path = _write_cfg(tmp_path, "diffusion", "ddpm")
    cfg = json.loads(cfg_path.read_text())
    cfg["training"].update({
        "num_epochs": 2,
        "save_model_epochs": save_model_epochs,
        "checkpoint_every_epochs": checkpoint_every,
        "save_images": False,
    })
    cfg_path.write_text(json.dumps(cfg))
    ds = TinyMNIST(tmp_path / "data", train=True)
    warnings_seen = []
    real_warning = logging.warning

    def spy(msg, *args, **kwargs):
        warnings_seen.append(msg % args if args else str(msg))
        real_warning(msg, *args, **kwargs)

    monkeypatch.setattr(logging, "warning", spy)
    train(ds, cfg_path)
    return warnings_seen


def test_snapshot_cadence_warning(tmp_path, monkeypatch):
    seen = _run_tiny_train_capturing_warnings(
        tmp_path, monkeypatch, save_model_epochs=1, checkpoint_every=2)
    assert any("finer than checkpoint_every_epochs" in m for m in seen)


def test_no_cadence_warning_when_aligned(tmp_path, monkeypatch):
    seen = _run_tiny_train_capturing_warnings(
        tmp_path, monkeypatch, save_model_epochs=2, checkpoint_every=2)
    assert not any("finer than checkpoint_every_epochs" in m for m in seen)
