from amg_tpu.solve.cycles import (
    CycleConfig,
    CycleType,
    additive_correction,
    mult_vcycle,
    sync_additive_cycle,
)
from amg_tpu.solve.driver import SolveResult, solve

__all__ = [
    "CycleConfig",
    "CycleType",
    "mult_vcycle",
    "additive_correction",
    "sync_additive_cycle",
    "SolveResult",
    "solve",
]
