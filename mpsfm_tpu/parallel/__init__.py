from mpsfm_tpu.parallel.dist_ba import (
    make_mesh,
    partition_ba_data,
    solve_ba_block_sharded,
    unpartition_points,
)

__all__ = [
    "make_mesh",
    "partition_ba_data",
    "solve_ba_block_sharded",
    "unpartition_points",
]
