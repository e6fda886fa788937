"""
Device mesh and sharding helpers (the TPU replacement for the reference's
torch.distributed DP path, SURVEY.md §2.2/§5.8).

One logical mesh with a ``data`` axis spanning all local+remote devices; the
jitted train step consumes batches sharded along it and computes global
gradients via jnp mean under pjit — XLA inserts the ICI all-reduces the
reference *omits* (its DDP never syncs grads; we do true data parallelism).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """PROCESS-LOCAL mesh (identical to the global mesh in single-process
    runs). Host-local work — sampling engines, rank-0 visual probes — must
    never jit over remote devices, or the other processes would have to
    participate in the program and rank-gated code paths would deadlock."""
    devices = jax.local_devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def create_mesh_for_batch(batch_size: int, axis_name: str = "data") -> Mesh:
    """Process-local data mesh over the largest device count that divides the
    batch size (batch-dim sharding requires divisibility; small smoke configs
    may use fewer devices than are available)."""
    n = len(jax.local_devices())
    while n > 1 and batch_size % n != 0:
        n -= 1
    return create_mesh(n, axis_name)


def create_data_mesh(batch_size: int, axis_name: str = "data") -> Mesh:
    """GLOBAL data mesh for trainers (the torchrun/DistributedSampler
    analogue, SURVEY.md §5.8): every process contributes ``batch_size``
    process-local rows per step, assembled into a global batch of
    ``process_count * batch_size`` via
    ``jax.make_array_from_process_local_data`` (see shard_batch). Uses the
    largest per-process device count that divides the per-process batch, the
    same count on every (homogeneous) host."""
    if jax.process_count() == 1:
        return create_mesh_for_batch(batch_size, axis_name)
    n_local = len(jax.local_devices())
    while n_local > 1 and batch_size % n_local != 0:
        n_local -= 1
    devices = []
    for p in range(jax.process_count()):
        devices.extend([d for d in jax.devices() if d.process_index == p][:n_local])
    return Mesh(np.array(devices), (axis_name,))


def spans_processes(mesh: Optional[Mesh]) -> bool:
    """Does this mesh include devices of other processes (multi-host)?"""
    if mesh is None:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim across the mesh.

    On a dp x sp mesh the batch rides BOTH axes so convs/projections keep
    full-device data parallelism; only attention reshards tokens onto the
    'seq' axis (ops/attention.py sequence-parallel routing). 'seq' is a
    RESERVED axis name carrying that contract — don't name an unrelated mesh
    axis 'seq'."""
    if "seq" in mesh.axis_names:
        return NamedSharding(mesh, P((axis_name, "seq")))
    return NamedSharding(mesh, P(axis_name))


def create_dp_sp_mesh(batch_size: int, sp: int, axis_name: str = "data") -> Mesh:
    """dp x sp mesh for sequence-parallel attention (single-host): 'seq' is
    the token ring axis; batch shards over (data, seq) jointly, so the
    per-step batch must divide data*seq."""
    devices = jax.local_devices()
    n_dev = len(devices)
    if n_dev % sp != 0:
        raise ValueError(f"sequence_parallel={sp} must divide the device count {n_dev}")
    n_data = n_dev // sp
    while n_data > 1 and batch_size % (n_data * sp) != 0:
        n_data -= 1
    if batch_size % (n_data * sp) != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by sequence_parallel={sp} "
            "(batch shards over the data x seq mesh)"
        )
    return Mesh(np.array(devices[: n_data * sp]).reshape(n_data, sp), (axis_name, "seq"))


def create_dp_sp_mesh_global(batch_size: int, sp: int, axis_name: str = "data") -> Mesh:
    """dp × sp mesh for trainers, multi-host aware (mirrors
    tp.create_dp_tp_mesh_global): the 'seq' ring axis stays INTRA-process —
    every ppermute hop rides ICI, never DCN — while the data axis
    concatenates processes' rows; every process feeds ``batch_size`` rows
    per step. Single-process delegates to create_dp_sp_mesh."""
    if jax.process_count() == 1:
        return create_dp_sp_mesh(batch_size, sp, axis_name)
    n_local = len(jax.local_devices())
    if n_local % sp != 0:
        raise ValueError(
            f"sequence_parallel={sp} must divide the per-process device count {n_local}")
    n_ld = n_local // sp
    # batch rides BOTH axes (see batch_sharding): the per-process batch must
    # divide this process's (data_rows x sp) device block
    while n_ld > 1 and batch_size % (n_ld * sp) != 0:
        n_ld -= 1
    if batch_size % (n_ld * sp) != 0:
        raise ValueError(
            f"batch_size={batch_size} must be divisible by sequence_parallel={sp} "
            "(batch shards over the data x seq mesh)")
    rows = []
    for p in range(jax.process_count()):
        procd = [d for d in jax.devices() if d.process_index == p][: n_ld * sp]
        rows.append(np.array(procd).reshape(n_ld, sp))
    return Mesh(np.concatenate(rows, axis=0), (axis_name, "seq"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], batch):
    """Device-put a host batch with batch-dim sharding (HBM-resident batches).

    On a multi-host mesh the input is the PROCESS-LOCAL slice: the global
    array is assembled from every process's rows
    (jax.make_array_from_process_local_data), so a global batch is the
    concatenation of the per-process batches along the data axis — the true
    DistributedSampler semantic the reference approximates
    (diffusion_lib.py:82-90)."""
    if mesh is None:
        return jax.tree_util.tree_map(jax.device_put, batch)
    sharding = batch_sharding(mesh)
    if spans_processes(mesh):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Optional[Mesh], tree):
    """Fully replicate a pytree over the mesh. On a multi-host mesh every
    process must hold the SAME host values (same-seed init or same checkpoint
    file); each contributes its addressable replicas."""
    if mesh is None:
        return tree
    sharding = replicated_sharding(mesh)
    if spans_processes(mesh):
        def _rep(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])

        return jax.tree_util.tree_map(_rep, tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def put_with_spec(leaf, mesh: Mesh, spec) -> jax.Array:
    """Place a value with the given PartitionSpec, multi-host aware.

    On a multi-host mesh plain device_put cannot target non-addressable
    shards. Host values: every process holds the SAME copy (same-seed init or
    same checkpoint file — the replicate() contract above), so each process
    materializes its addressable shards from its local copy. Already-global
    jax.Arrays (e.g. optimizer moments created by optax init on sharded
    params): reshard through an identity jit — a collective all ranks run in
    lockstep."""
    sharding = NamedSharding(mesh, spec)
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        return jax.jit(lambda x: x, out_shardings=sharding)(leaf)
    if spans_processes(mesh):
        x = np.asarray(leaf)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx, x=x: x[idx])
    return jax.device_put(leaf, sharding)


def pad_batch_to_multiple(arrays, multiple: int):
    """Pad the leading dim so it divides the mesh size; returns (padded, real_count).

    Static-shape strategy for ragged final batches (SURVEY.md §7.3 item 3)."""
    import numpy as np

    real = arrays[0].shape[0] if isinstance(arrays, (list, tuple)) else arrays.shape[0]
    pad = (-real) % multiple
    if pad == 0:
        return arrays, real

    def _pad(a):
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths, mode="edge")

    if isinstance(arrays, (list, tuple)):
        return type(arrays)(_pad(a) for a in arrays), real
    return _pad(arrays), real


def to_host(tree):
    """Materialize a (possibly globally sharded) pytree as host numpy arrays.

    Checkpoint payloads call ``np.asarray`` on every leaf; with multi-process
    FSDP the parameters are globally sharded (non-fully-addressable) and
    ``np.asarray`` raises. Gather those through
    ``multihost_utils.process_allgather`` (every host receives the full
    value) before converting; fully-addressable leaves convert directly."""
    def _replicated_local(x):
        # fully replicated over a multi-host mesh: the local replica IS the
        # full value — no collective needed
        if isinstance(x, jax.Array) and not x.is_fully_addressable and x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        return x

    tree = jax.tree_util.tree_map(_replicated_local, tree)
    leaves = jax.tree_util.tree_leaves(tree)
    if any(
        isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
        for leaf in leaves
    ):
        from jax.experimental import multihost_utils

        # Gather ONLY the non-addressable (globally sharded) leaves, and with
        # tiled=True — for a global array that returns the full value on every
        # host; the default tiled=False refuses non-fully-addressable inputs,
        # and gathering addressable leaves would wrongly concatenate the
        # per-process copies of replicated values. tree_map order is identical
        # on every process, so the per-leaf collectives stay in lockstep.
        def _gather(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return multihost_utils.process_allgather(x, tiled=True)
            return x

        tree = jax.tree_util.tree_map(_gather, tree)
    # ONE batched device->host transfer for the whole tree: leaf-by-leaf
    # np.asarray pays a full round trip per leaf, which on a remote-attached
    # accelerator (axon tunnel, ~125 ms RTT) turns a 1.7 GB checkpoint
    # gather into ~30 minutes; jax.device_get pipelines all leaves at link
    # bandwidth (~10 MB/s here).
    tree = jax.device_get(tree)
    return jax.tree_util.tree_map(np.asarray, tree)


def maybe_initialize_distributed() -> None:
    """Multi-host init (the torch.distributed/torchrun analogue,
    SURVEY.md §5.8): call jax.distributed.initialize() when a coordinator is
    configured via env (JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES or a TPU
    pod runtime); single-process runs are a no-op."""
    import os

    if jax.process_count() > 1:
        return  # already initialized by the runtime
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if coord and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("JAX_PROCESS_ID", 0)),
        )


def broadcast_string(value: str, max_len: int = 1024) -> str:
    """Agree on a host-side string across processes (process 0 wins) — used
    for run-dir allocation, where every process must write/log under the
    directory rank 0 allocated (_runN suffixing races otherwise)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils

    data = np.zeros((max_len,), np.uint8)
    raw = value.encode("utf-8")[:max_len]
    data[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(data))
    return bytes(out.tobytes()).rstrip(b"\x00").decode("utf-8")


def is_main_process() -> bool:
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()
