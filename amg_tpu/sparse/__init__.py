from amg_tpu.sparse.bsr import BSRMatrix, bsr_fill_stats, bsr_from_csr
from amg_tpu.sparse.csr import CSRMatrix
from amg_tpu.sparse.ell import ELLMatrix
from amg_tpu.sparse.stencil import StencilOperator

__all__ = [
    "BSRMatrix",
    "CSRMatrix",
    "ELLMatrix",
    "StencilOperator",
    "bsr_fill_stats",
    "bsr_from_csr",
]
