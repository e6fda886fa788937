"""Regression tests for the round-2 advisor findings (ADVICE.md):

1. (medium) DPMSolverSDE tail slicing must never start the scan on a
   second-order call — its ancestral anchor would be the zero-initialized
   carry. The scheduler trims sliced schedules to first-order parity.
2. Sliced pure-noise starts enter at the first kept call's sigma, not the
   full-schedule sigma_max (engine init-noise scaling).
3. grain sharding yields equal per-process record counts even when
   len(dataset) % process_count != 0 (multi-host collective deadlock guard).
4. epoch_batches auto-threads sample fetch only for datasets that declare
   ``thread_safe_getitem``; unknown dataset classes stay serial.
5. Globally sharded checkpoint leaves are gathered before numpy conversion
   (parallel/mesh.py::to_host) — multi-process FSDP save path.
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fmdm_tpu.sample.engine import SamplingEngine, select_timesteps
from fmdm_tpu.schedulers import DPMSolverSDEScheduler
from fmdm_tpu.train.common import epoch_batches


# ---------------------------------------------------------------------------
# 1+2: DPM-SDE slicing parity
# ---------------------------------------------------------------------------

def test_dpm_sde_sliced_schedule_starts_first_order():
    sched = DPMSolverSDEScheduler.create()
    full = sched.set_timesteps(10)  # 19 interleaved calls
    assert full.shape == (19,)
    for last_n in range(1, 19):
        sliced = sched.align_sliced_timesteps(full[-last_n:])
        off = sched._offset(sliced)
        # even table offset == the scan starts on an anchor-STORING call
        assert off % 2 == 0, f"last_n={last_n} starts on a second-order call"
        assert not bool(np.asarray(sched._is_second)[off])
        # at most one leading midpoint entry is trimmed
        assert sliced.shape[0] in (last_n, last_n - 1)


def test_dpm_sde_sliced_init_noise_scale_is_first_kept_sigma():
    sched = DPMSolverSDEScheduler.create()
    full = sched.set_timesteps(10)
    # unsliced: matches init_noise_sigma (sigma_max)
    np.testing.assert_allclose(
        sched.init_noise_scale(full), sched.init_noise_sigma, rtol=1e-6)
    sliced = sched.align_sliced_timesteps(full[-7:])
    off = sched._offset(sliced)
    expected = float(np.asarray(sched._sigma_call)[off])
    np.testing.assert_allclose(sched.init_noise_scale(sliced), expected, rtol=1e-6)
    assert sched.init_noise_scale(sliced) < sched.init_noise_sigma


def test_engine_aligns_dpm_sde_sliced_timesteps():
    sched = DPMSolverSDEScheduler.create()
    full = sched.set_timesteps(6)  # 11 calls
    sliced = select_timesteps(full, last_n_steps=4)  # offset 7 -> odd
    assert sched._offset(sliced) % 2 == 1

    def model(params, x, t, context_ca=None):
        return x * 0.1

    engine = SamplingEngine(model, sched, sliced)
    assert sched._offset(engine.timesteps) % 2 == 0
    out = engine({}, (2, 1, 4, 4), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_sde_sliced_suffix_matches_full_run_tail():
    """A sliced run seeded with the full run's intermediate sample must
    reproduce the full run's remaining trajectory exactly (the zero-anchor
    bug broke this for odd offsets)."""
    sched = DPMSolverSDEScheduler.create()
    full = sched.set_timesteps(5)  # 9 calls
    shape = (1, 1, 4, 4)
    rng = np.random.RandomState(0)
    outputs = rng.randn(9, *shape).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), 9)

    def run(timesteps, x0, out_slice, key_slice):
        ts = jnp.asarray(timesteps)
        x = jnp.asarray(x0, jnp.float32)
        state = sched.init_state(ts, x)
        for i in range(len(timesteps)):
            state, x = sched.step(
                state, jnp.asarray(out_slice[i]), jnp.asarray(i), x, ts,
                rng=key_slice[i])
        return np.asarray(x)

    x_init = rng.randn(*shape).astype(np.float32) * float(sched.init_noise_sigma)
    # full trajectory, recording the sample entering each call
    ts = jnp.asarray(full)
    x = jnp.asarray(x_init)
    state = sched.init_state(ts, x)
    entering = []
    for i in range(9):
        entering.append(np.asarray(x))
        state, x = sched.step(state, jnp.asarray(outputs[i]), jnp.asarray(i), x, ts, rng=keys[i])
    x_full = np.asarray(x)

    # resume from an even-offset suffix (aligned slicing guarantees this)
    sliced = sched.align_sliced_timesteps(full[-5:])  # offset 5 odd -> trims to 4-suffix? no: len 5, offset 4
    off = sched._offset(sliced)
    assert off % 2 == 0
    x_resume = run(sliced, entering[off], outputs[off:], keys[off:])
    np.testing.assert_allclose(x_resume, x_full, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# 3: grain equal per-process record counts
# ---------------------------------------------------------------------------

class _ToyDS:
    def __init__(self, n=10):
        self.t = np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1) * np.ones(
            (n, 1, 4, 4), np.float32)

    def __len__(self):
        return len(self.t)

    def __getitem__(self, i):
        return {"target": self.t[i], "image": None, "img_id": f"s{i}"}


def test_grain_sharding_equal_counts():
    pytest.importorskip("grain")
    from fmdm_tpu.data.grain_pipeline import grain_epoch_batches

    ds = _ToyDS(10)
    counts, seen = [], []
    for p in range(3):
        batches = list(grain_epoch_batches(
            ds, 2, shuffle=False, seed=1, epoch=0,
            process_index=p, process_count=3))
        counts.append(sum(int(b["valid"].sum()) for b in batches))
        for b in batches:
            seen.extend(b["target"][b["valid"] > 0, 0, 0, 0].tolist())
    # every process yields the same number of batches AND records
    assert len(set(counts)) == 1, counts
    assert counts[0] == 4  # ceil(10/3)*3 = 12 -> 4 per process
    # all 10 real records appear; the 2 pads wrap onto leading records
    assert set(np.unique(np.asarray(seen)).astype(int)) == set(range(10))


# ---------------------------------------------------------------------------
# 4: threaded fetch opt-in
# ---------------------------------------------------------------------------

class _ThreadRecordingDS:
    thread_safe_getitem = True

    def __init__(self, n=16):
        self.n = n
        self.threads = set()
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        with self._lock:
            self.threads.add(threading.current_thread().name)
        return {"target": np.zeros((1, 4, 4), np.float32), "image": None}


class _UnsafeDS(_ThreadRecordingDS):
    thread_safe_getitem = False


def test_auto_threaded_fetch_requires_opt_in():
    safe = _ThreadRecordingDS()
    list(epoch_batches(safe, 4, shuffle=False, seed=0, epoch=0))
    unsafe = _UnsafeDS()
    list(epoch_batches(unsafe, 4, shuffle=False, seed=0, epoch=0))
    # non-declaring datasets are fetched on the calling thread only
    assert all("fetch" not in name for name in unsafe.threads)
    # explicit num_workers always wins, either direction
    unsafe2 = _UnsafeDS()
    list(epoch_batches(unsafe2, 4, shuffle=False, seed=0, epoch=0, num_workers=4))
    assert any("fetch" in name for name in unsafe2.threads)
    safe2 = _ThreadRecordingDS()
    list(epoch_batches(safe2, 4, shuffle=False, seed=0, epoch=0, num_workers=0))
    assert all("fetch" not in name for name in safe2.threads)


# ---------------------------------------------------------------------------
# 5: checkpoint host-gather of sharded leaves
# ---------------------------------------------------------------------------

def test_to_host_on_sharded_tree():
    from fmdm_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.create_mesh()
    tree = {
        "w": jax.device_put(jnp.arange(16.0).reshape(8, 2),
                            mesh_lib.batch_sharding(mesh)),
        "b": np.ones((3,), np.float32),
        "n": 4,
    }
    host = mesh_lib.to_host(tree)
    assert isinstance(host["w"], np.ndarray)
    np.testing.assert_array_equal(host["w"], np.arange(16.0).reshape(8, 2))
    np.testing.assert_array_equal(host["b"], np.ones((3,)))
