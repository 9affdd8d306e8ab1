from amg_tpu.utils.config import SolverOptions
from amg_tpu.utils.stats import SolveStats

__all__ = ["SolverOptions", "SolveStats"]
