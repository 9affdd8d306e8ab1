from amg_tpu.parallel.partition import assign_levels_to_devices, compute_level_work
from amg_tpu.parallel.dist import (
    make_row_mesh,
    shard_hierarchy,
    shard_vector,
)

__all__ = [
    "compute_level_work",
    "assign_levels_to_devices",
    "make_row_mesh",
    "shard_hierarchy",
    "shard_vector",
]
