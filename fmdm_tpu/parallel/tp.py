"""
Tensor parallelism via GSPMD parameter sharding.

The reference has no TP (SURVEY.md §2.2 — DP only); this is TPU-native
headroom for models that outgrow one chip's HBM. Approach: annotate every
weight's *output-channel* dim with a ``model`` mesh axis and let XLA's SPMD
partitioner propagate shardings through the network and insert the ICI
collectives — no manual collective calls, the idiomatic JAX recipe
(pick a mesh → annotate → let XLA partition).

Layout rules (matching our torch-layout param trees, nn/module.py):
- conv kernels  (O, I, *k)  → P("model", None, ...)   [output channels]
- linear/1x1    (out, in)   → P("model", None)
- 1-D params    (C,)        → P("model")              [bias / norm affine]
- anything whose leading dim doesn't divide the axis → replicated P()

Entry points:
- ``tp_param_specs(params, mesh, axis="model")`` → pytree of PartitionSpec
- ``shard_params_tp(params, mesh)`` → device_put with those specs
- Batches stay sharded over the ``data`` axis (parallel/mesh.py); a 2-D
  Mesh(("data", "model")) composes dp × tp in one jitted step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_dp_tp_mesh(n_data: int, n_model: int) -> Mesh:
    devices = np.array(jax.devices()[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def create_dp_tp_mesh_global(batch_size: int, tp: int) -> Mesh:
    """dp × tp mesh for trainers, multi-host aware.

    Single process: data axis = the largest batch divisor the remaining
    devices allow (the historical trainer behavior). Multi-host: each
    process's local devices split into (local_data, tp) rows with the MODEL
    axis intra-process — weight-gather collectives ride ICI, never DCN —
    and the data axis concatenates processes' rows; every process feeds
    ``batch_size`` rows per step (create_data_mesh semantics)."""
    if jax.process_count() == 1:
        n_dev = len(jax.devices())
        if n_dev % tp != 0:
            raise ValueError(f"tensor_parallel={tp} must divide the device count {n_dev}")
        n_data = n_dev // tp
        while n_data > 1 and batch_size % n_data != 0:
            n_data -= 1
        return create_dp_tp_mesh(n_data, tp)
    n_local = len(jax.local_devices())
    if n_local % tp != 0:
        raise ValueError(
            f"tensor_parallel={tp} must divide the per-process device count {n_local}")
    n_ld = n_local // tp
    while n_ld > 1 and batch_size % n_ld != 0:
        n_ld -= 1
    rows = []
    for p in range(jax.process_count()):
        procd = [d for d in jax.devices() if d.process_index == p][: n_ld * tp]
        rows.append(np.array(procd).reshape(n_ld, tp))
    return Mesh(np.concatenate(rows, axis=0), ("data", "model"))


def _leaf_spec(path_leaf_name: str, shape, axis_size: int, axis: str) -> P:
    if len(shape) == 0:
        return P()
    lead = shape[0]
    if lead % axis_size != 0:
        return P()  # not divisible -> replicate (e.g. 1-channel conv_out)
    if len(shape) == 1:
        return P(axis)
    return P(axis, *([None] * (len(shape) - 1)))


def tp_param_specs(params, mesh: Mesh, axis: str = "model"):
    """PartitionSpec pytree: shard each weight's leading (output) dim over
    ``axis`` when divisible, otherwise replicate."""
    axis_size = mesh.shape[axis]

    def spec(leaf):
        return _leaf_spec("", np.shape(leaf), axis_size, axis)

    return jax.tree_util.tree_map(spec, params)


def shard_params_tp(params, mesh: Mesh, axis: str = "model"):
    """device_put the param tree with output-channel sharding over ``axis``
    (other mesh axes replicate the params — DP replicas share weights)."""
    from fmdm_tpu.parallel.mesh import put_with_spec

    specs = tp_param_specs(params, mesh, axis)
    return jax.tree_util.tree_map(
        lambda x, s: put_with_spec(x, mesh, s), params, specs
    )


def shard_opt_state_tp(opt_state, params, mesh: Mesh, axis: str = "model"):
    """Shard optimizer state like its mirrored params: any state leaf whose
    shape equals a param's shape gets that param's spec (optax adamw mu/nu
    mirror the tree); scalars/counters replicate."""
    from fmdm_tpu.parallel.mesh import put_with_spec

    param_leaves = [np.shape(x) for x in jax.tree_util.tree_leaves(params)]
    shapes = set(param_leaves)
    axis_size = mesh.shape[axis]

    def place(leaf):
        shape = np.shape(leaf)
        if shape in shapes:
            s = _leaf_spec("", shape, axis_size, axis)
        else:
            s = P()
        return put_with_spec(leaf, mesh, s)

    return jax.tree_util.tree_map(place, opt_state)
