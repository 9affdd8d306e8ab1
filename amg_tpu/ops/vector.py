"""Dense vector ops used throughout the solvers.

TPU analogs of the reference's vector helpers: hypre axpy/inner-product and the
CUDA `hypreDevice_IVAXPY` elementwise-scaled axpy (reference:
src/DMEM_Misc.cpp:469-582). All are trivially XLA-fused; they exist as named
functions so solver code reads like the algorithm.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(x, y):
    return jnp.dot(x, y)


def l2_norm(x):
    return jnp.sqrt(jnp.dot(x, x))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def axpy(alpha, x, y):
    """y + alpha*x."""
    return y + alpha * x


def ivaxpy(x, scale, y):
    """x + y/scale elementwise — the reference's IVAXPY
    (reference: src/DMEM_Misc.cpp:477-492)."""
    return x + y / scale


def residual(A, u, f):
    """r = f - A u, dispatched to the operator's fused residual kernel when
    it has one (DIA device operators stream f through the matvec launch);
    reference: hypre_ParCSRMatrixMatvecOutOfPlace residual form
    (src/DMEM_Mult.cpp:134-141)."""
    if hasattr(A, "residual"):
        return A.residual(u, f)
    return f - (A @ u)
