"""Dtype policy.

The reference is all-double (C++ `double` everywhere). On TPU, float64 is
software-emulated and slow, so the policy is:
  * host-side setup: always float64 (numpy).
  * device solve path: float64 on CPU backends (tests / parity runs),
    float32 on TPU (perf path) unless explicitly overridden.
  * index arrays: always int32 (TPU-friendly; n < 2^31 per shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

INDEX_DTYPE = np.int32
SETUP_DTYPE = np.float64


def default_solve_dtype() -> jnp.dtype:
    """float64 on CPU (parity with the all-double reference), float32 on TPU."""
    if jax.default_backend() == "cpu":
        return jnp.float64
    return jnp.float32
