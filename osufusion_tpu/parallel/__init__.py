from osufusion_tpu.parallel.distributed import (
    is_main_process,
    make_global_batch,
    maybe_initialize,
    process_count,
    process_index,
)
from osufusion_tpu.parallel.mesh import batch_sharding, make_mesh, param_shardings, replicated
from osufusion_tpu.parallel.ring import ring_attention, ring_available
from osufusion_tpu.parallel.sequence import seq_parallel_available, sequence_parallel_attention

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "ring_attention",
    "ring_available",
    "sequence_parallel_attention",
    "seq_parallel_available",
    "maybe_initialize",
    "is_main_process",
    "make_global_batch",
    "process_count",
    "process_index",
]
