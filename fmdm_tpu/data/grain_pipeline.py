"""Grain-backed input pipeline (``training.data_loader: grain``).

An alternative to :func:`fmdm_tpu.train.common.epoch_batches` built on
``grain.python.DataLoader``: per-epoch deterministic shuffling via
``IndexSampler``, per-process sharding via ``ShardOptions``, and optional
multi-process sample loading (``num_workers``) — the TPU-side analogue of the
reference's ``torch.utils.data.DataLoader(num_workers=...)`` construction
(reference: src/pipelines/diffusion_lib.py:82-90).

Batches keep the exact contract of the host batcher so trainers switch with a
single config key: static-size ``{"target", "image", "valid"}`` dicts, the
final partial batch edge-padded (repeat of its last sample) with ``valid`` 0
on the padding rows.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np


class _MapSource:
    """grain ``RandomAccessDataSource`` view of any ``__len__/__getitem__``
    dataset (our BaseDataset family).

    ``pad_to`` rounds the advertised length up, wrapping the extra indices
    onto leading records (DistributedSampler-style padding): with it set to a
    multiple of ``process_count`` every shard holds the same record count, so
    every process yields the same number of batches — unequal counts would
    deadlock multi-host collectives on the final batch of an epoch."""

    def __init__(self, dataset, pad_to: Optional[int] = None):
        self._dataset = dataset
        self._len = len(dataset)
        self._padded_len = max(self._len, int(pad_to or 0))

    def __len__(self) -> int:
        return self._padded_len

    def __getitem__(self, index: int):
        return self._dataset[int(index) % self._len]


def _stack(samples, key) -> Optional[np.ndarray]:
    values = [s.get(key) for s in samples]
    if any(v is None for v in values):
        return None
    return np.stack([np.asarray(v, dtype=np.float32) for v in values], axis=0)


def grain_epoch_batches(
    dataset,
    batch_size: int,
    *,
    shuffle: bool,
    seed: int,
    epoch: int,
    pad_to_full: bool = True,
    process_index: int = 0,
    process_count: int = 1,
    num_workers: int = 0,
) -> Iterator[Dict[str, Optional[np.ndarray]]]:
    """Yield ``{"target", "image", "valid"}`` numpy batches through grain.

    Sample fetching (the ``dataset[i]`` calls — DICOM reads, windowing,
    resizing) runs inside grain, in ``num_workers`` worker processes when
    requested; stacking and the static-shape edge padding stay on this thread
    so the batch contract is bit-identical to ``epoch_batches``.

    Shuffling is deterministic per ``(seed, epoch)`` and reshuffles across
    epochs (DistributedSampler.set_epoch semantics); sharding partitions the
    record set across processes via grain ``ShardOptions``.
    """
    import grain.python as gp

    n = len(dataset)
    procs = max(1, int(process_count))
    source = _MapSource(dataset, pad_to=-(-n // procs) * procs)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shard_options=gp.ShardOptions(
            shard_index=int(process_index),
            shard_count=int(process_count),
            drop_remainder=False,
        ),
        shuffle=bool(shuffle),
        num_epochs=1,
        # mix the epoch into the seed the way epoch_batches does, so each
        # epoch is a fresh deterministic permutation.
        seed=(int(seed) or 0) * 100003 + int(epoch),
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        worker_count=max(0, int(num_workers)),
    )

    pending = []
    for sample in loader:
        pending.append(sample)
        if len(pending) == batch_size:
            yield _finalize(pending, batch_size, pad_to_full)
            pending = []
    if pending:
        yield _finalize(pending, batch_size, pad_to_full)


def _finalize(samples, batch_size: int, pad_to_full: bool) -> Dict[str, Optional[np.ndarray]]:
    target = _stack(samples, "target")
    image = _stack(samples, "image")
    valid = np.ones((len(samples),), dtype=np.float32)
    if pad_to_full and len(samples) < batch_size:
        pad = batch_size - len(samples)
        target = np.concatenate([target, np.repeat(target[-1:], pad, axis=0)], axis=0)
        if image is not None:
            image = np.concatenate([image, np.repeat(image[-1:], pad, axis=0)], axis=0)
        valid = np.concatenate([valid, np.zeros((pad,), np.float32)])
    return {"target": target, "image": image, "valid": valid}
