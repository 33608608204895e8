from mpsfm_tpu.ba.solver import BAData, solve_ba
from mpsfm_tpu.ba.problem import build_ba_data, apply_ba_result, BAProblem

__all__ = ["BAData", "solve_ba", "build_ba_data", "apply_ba_result", "BAProblem"]
