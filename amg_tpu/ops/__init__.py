from amg_tpu.ops.vector import axpy, dot, ivaxpy, l1_norm, l2_norm

__all__ = ["axpy", "dot", "ivaxpy", "l1_norm", "l2_norm"]
