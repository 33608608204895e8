from mpsfm_tpu.parallel.dist_ba import make_mesh, shard_ba_data, solve_ba_sharded

__all__ = ["make_mesh", "shard_ba_data", "solve_ba_sharded"]
