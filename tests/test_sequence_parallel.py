"""Sequence-parallel (ring) attention vs single-device SDPA on the virtual
CPU mesh (conftest forces 8 host devices)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fmdm_tpu.ops.attention import sdpa_xla
from fmdm_tpu.parallel.sequence import ring_attention, sequence_parallel_sdpa


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("data",))


@pytest.mark.parametrize("n,shape", [
    (8, (2, 4, 64, 32)),   # (B, H, T, D), T sharded 8-way
    (4, (1, 2, 128, 16)),
    (2, (3, 1, 16, 8)),
])
def test_ring_matches_sdpa(n, shape):
    mesh = _mesh(n)
    q = jax.random.normal(jax.random.PRNGKey(1), shape)
    k = jax.random.normal(jax.random.PRNGKey(2), shape)
    v = jax.random.normal(jax.random.PRNGKey(3), shape)
    out = sequence_parallel_sdpa(q, k, v, mesh=mesh, axis="data")
    ref = sdpa_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_bf16():
    mesh = _mesh(4)
    shape = (2, 2, 64, 16)
    q = jax.random.normal(jax.random.PRNGKey(4), shape).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(5), shape).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(6), shape).astype(jnp.bfloat16)
    out = np.asarray(sequence_parallel_sdpa(q, k, v, mesh=mesh, axis="data"), np.float32)
    ref = np.asarray(sdpa_xla(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, rtol=3e-2, atol=3e-2)


def test_ring_custom_scale():
    mesh = _mesh(2)
    shape = (1, 1, 32, 8)
    q = jax.random.normal(jax.random.PRNGKey(7), shape)
    k = jax.random.normal(jax.random.PRNGKey(8), shape)
    v = jax.random.normal(jax.random.PRNGKey(9), shape)
    out = sequence_parallel_sdpa(q, k, v, mesh=mesh, axis="data", scale=0.25)
    ref = sdpa_xla(q, k, v, scale=0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_gradients_match():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    import functools

    mesh = _mesh(4)
    shape = (1, 2, 32, 16)
    q = jax.random.normal(jax.random.PRNGKey(10), shape)
    k = jax.random.normal(jax.random.PRNGKey(11), shape)
    v = jax.random.normal(jax.random.PRNGKey(12), shape)

    spec = P(None, None, "data", None)
    ring = shard_map(
        functools.partial(ring_attention, axis_name="data"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)

    def loss_ring(q, k, v):
        return jnp.sum(jnp.sin(ring(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa_xla(q, k, v)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5)


def test_self_test_hook():
    from fmdm_tpu.parallel.sequence import run_self_tests
    run_self_tests()
