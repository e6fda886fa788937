"""
Fully-sharded data parallelism (ZeRO-3 style) via GSPMD parameter sharding.

The reference scales only by replicated DDP (SURVEY.md §2.2); TP
(parallel/tp.py) shards compute. FSDP shards *state*: every parameter and
optimizer moment lives sliced across the ``data`` axis, and XLA's SPMD
partitioner inserts the all-gathers that materialize a weight just-in-time
for its op and the reduce-scatters that keep gradients/updates sharded —
the standard JAX recipe (annotate shardings, let the partitioner place
collectives on ICI). Per-device state memory drops ~N× on an N-way mesh,
which is what lets optimizer-heavy (AdamW: 3× params) models train on
small-HBM chips.

Sharding rule: slice each tensor's largest dimension that the axis size
divides (conv kernels usually slice the output-channel dim; embeddings the
vocab dim); tensors with no divisible dim stay replicated. Elementwise
optimizer math then runs fully sharded with zero communication; only the
per-use gathers and grad reduce-scatters touch the interconnect.

Composition: batches stay sharded over the same ``data`` axis (ordinary
data parallelism), so ``training.fsdp: true`` is a drop-in on the existing
1-D data mesh — and composes with ``tensor_parallel`` (params slice over
``model`` first via tp.py; FSDP then slices a *different* dim over
``data``).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fmdm_tpu.parallel.mesh import put_with_spec as _put_with_spec


def fsdp_leaf_spec(shape, axis_size: int, axis: str = "data") -> P:
    """Slice the largest axis-divisible dim over ``axis``; else replicate."""
    if len(shape) == 0:
        return P()
    candidates = [d for d in range(len(shape)) if shape[d] % axis_size == 0 and shape[d] >= axis_size]
    if not candidates:
        return P()
    dim = max(candidates, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[dim] = axis
    return P(*spec)


def fsdp_param_specs(params, mesh: Mesh, axis: str = "data"):
    axis_size = mesh.shape[axis]

    def spec(leaf):
        return fsdp_leaf_spec(np.shape(leaf), axis_size, axis)

    return jax.tree_util.tree_map(spec, params)


def _put(leaf, mesh: Mesh, spec: P):
    """Multi-host-aware placement — shared helper in parallel/mesh.py."""
    return _put_with_spec(leaf, mesh, spec)


def shard_params_fsdp(params, mesh: Mesh, axis: str = "data"):
    specs = fsdp_param_specs(params, mesh, axis)
    return jax.tree_util.tree_map(
        lambda leaf, s: _put(leaf, mesh, s), params, specs
    )


def shard_opt_state_fsdp(opt_state, params, mesh: Mesh, axis: str = "data"):
    """Optimizer moments mirror their parameter's sharding; step counters and
    other non-param-shaped leaves replicate."""
    shapes = {np.shape(leaf) for leaf in jax.tree_util.tree_leaves(params)}
    axis_size = mesh.shape[axis]

    def place(leaf):
        shape = np.shape(leaf)
        spec = fsdp_leaf_spec(shape, axis_size, axis) if shape in shapes else P()
        return _put(leaf, mesh, spec)

    return jax.tree_util.tree_map(place, opt_state)


def fsdp_tp_leaf_spec(shape, data_size: int, model_size: int,
                      data_axis: str = "data", model_axis: str = "model") -> P:
    """2-D pod layout for one tensor: TP slices the leading (output-channel)
    dim over ``model_axis`` when divisible (tp.py's rule), then FSDP slices
    the largest REMAINING divisible dim over ``data_axis``. A dim never
    carries both axes; tensors with no second divisible dim stay FSDP-
    replicated (TP-only), and tensors TP can't slice fall back to pure FSDP."""
    if len(shape) == 0:
        return P()
    spec = [None] * len(shape)
    if shape[0] % model_size == 0:
        spec[0] = model_axis
    candidates = [d for d in range(len(shape))
                  if spec[d] is None and shape[d] % data_size == 0
                  and shape[d] >= data_size]
    if candidates:
        dim = max(candidates, key=lambda d: shape[d])
        spec[dim] = data_axis
    return P(*spec)


def fsdp_tp_param_specs(params, mesh: Mesh,
                        data_axis: str = "data", model_axis: str = "model"):
    data_size = mesh.shape[data_axis]
    model_size = mesh.shape[model_axis]

    def spec(leaf):
        return fsdp_tp_leaf_spec(np.shape(leaf), data_size, model_size,
                                 data_axis, model_axis)

    return jax.tree_util.tree_map(spec, params)


def shard_params_fsdp_tp(params, mesh: Mesh,
                         data_axis: str = "data", model_axis: str = "model"):
    specs = fsdp_tp_param_specs(params, mesh, data_axis, model_axis)
    return jax.tree_util.tree_map(
        lambda leaf, s: _put(leaf, mesh, s), params, specs
    )


def shard_opt_state_fsdp_tp(opt_state, params, mesh: Mesh,
                            data_axis: str = "data", model_axis: str = "model"):
    """Moments mirror their parameter's 2-D sharding; counters replicate."""
    shapes = {np.shape(leaf) for leaf in jax.tree_util.tree_leaves(params)}
    data_size = mesh.shape[data_axis]
    model_size = mesh.shape[model_axis]

    def place(leaf):
        shape = np.shape(leaf)
        spec = (fsdp_tp_leaf_spec(shape, data_size, model_size,
                                  data_axis, model_axis)
                if shape in shapes else P())
        return _put(leaf, mesh, spec)

    return jax.tree_util.tree_map(place, opt_state)
