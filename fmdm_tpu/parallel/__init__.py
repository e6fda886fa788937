"""Device mesh / sharding helpers."""

from fmdm_tpu.parallel.sequence import ring_attention, sequence_parallel_sdpa
from fmdm_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    is_main_process,
    pad_batch_to_multiple,
    process_count,
    replicate,
    replicated_sharding,
    shard_batch,
)
