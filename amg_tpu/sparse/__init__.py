from amg_tpu.sparse.csr import CSRMatrix
from amg_tpu.sparse.ell import ELLMatrix
from amg_tpu.sparse.stencil import StencilOperator

__all__ = ["CSRMatrix", "ELLMatrix", "StencilOperator"]
