"""Outer Chebyshev / Richardson acceleration and eigenvalue estimation.

Reference semantics: the cycle produces an additive correction u; the
accelerated direction d follows the Chebyshev three-term recurrence

    cycle 0: d = u
    else:    c_{k+1} = 2 mu c_k - c_{k-1};  omega = 2 mu c_k / c_{k+1}
             d = (omega - 1) d + omega * delta * u
    x += d

with mu = (beta+alpha)/(beta-alpha), delta = 2/(beta+alpha) from eigenvalue
bounds [alpha, beta] of the preconditioned operator M^-1 A; Richardson uses the
fixed omega = 2/(1+sqrt(1-mu^-2)) (reference: DMEM_ChebyUpdate,
src/DMEM_Misc.cpp:612-666; setup src/DMEM_Setup.cpp:1901-1914).

Eigenvalue estimation mirrors DMEM_PowerMult (reference: src/DMEM_Eig.cpp:
10-104): power iteration on M^-1 A where M is one AMG cycle, then a shifted
second run for the smallest eigenvalue.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class ChebyCoeffs(NamedTuple):
    alpha: float  # lambda_min bound
    beta: float  # lambda_max bound
    mu: float
    delta: float


def make_cheby_coeffs(alpha: float, beta: float) -> ChebyCoeffs:
    return ChebyCoeffs(
        alpha=alpha,
        beta=beta,
        mu=(beta + alpha) / (beta - alpha),
        delta=2.0 / (beta + alpha),
    )


class ChebyState(NamedTuple):
    d: jnp.ndarray
    c: jnp.ndarray  # Chebyshev polynomial values T_k(mu)
    c_prev: jnp.ndarray
    k: jnp.ndarray  # cycle counter


def cheby_init(n: int, dtype) -> ChebyState:
    return ChebyState(
        d=jnp.zeros(n, dtype=dtype),
        c=jnp.asarray(1.0, dtype=dtype),
        c_prev=jnp.asarray(1.0, dtype=dtype),
        k=jnp.asarray(0, dtype=jnp.int32),
    )


def cheby_update(
    state: ChebyState, u: jnp.ndarray, coeffs: ChebyCoeffs, richardson: bool = False
) -> ChebyState:
    """One accelerated-direction update (branch-free under jit).

    Recurrence seeds follow the Chebyshev polynomials exactly (T_0 = 1,
    T_1 = mu, omega_k = 2 mu T_k / T_{k+1}; the reference seeds
    c_prev = 1, c = mu at setup, src/DMEM_Setup.cpp:1909-1910): the k = 0
    copy step leaves c = T_1 = mu behind, so the first accelerated update
    uses omega = 2 mu^2/(2 mu^2 - 1) — rounds 1-4 seeded c = 1 and ran
    every subsequent omega off the optimal polynomial."""
    c_new = 2.0 * coeffs.mu * state.c - state.c_prev
    if richardson:
        omega = 2.0 / (1.0 + (1.0 - 1.0 / (coeffs.mu * coeffs.mu)) ** 0.5)
    else:
        omega = 2.0 * coeffs.mu * state.c / c_new
    d_acc = (omega - 1.0) * state.d + omega * coeffs.delta * u
    first = state.k == 0
    d = jnp.where(first, u, d_acc)
    mu_t = jnp.asarray(coeffs.mu, dtype=state.c.dtype)
    return ChebyState(
        d=d,
        c=jnp.where(first, mu_t, c_new),
        c_prev=jnp.where(first, state.c_prev, state.c),
        k=state.k + 1,
    )


def estimate_cycle_eigs(
    apply_MinvA,
    n: int,
    dtype,
    num_iters: int = 20,
    seed: int = 0,
    range_start: bool = False,
    operand=None,
) -> ChebyCoeffs:
    """Eigenvalue bounds of the cycle-preconditioned operator M^-1 A by power
    iteration + shifted power iteration (one jitted loop).

    range_start=True starts iterates inside range(op) (one extra apply) so the
    smallest-eigenvalue run finds the smallest NONZERO eigenvalue of a
    singular operator — needed for the (semidefinite) extended BPX system.

    operand: optional pytree passed as the first argument to apply_MinvA
    (i.e. apply_MinvA(operand, u)). Required when the operator's arrays are
    sharded over a multi-process mesh — jit cannot close over global arrays
    that span non-addressable devices."""
    rng = np.random.default_rng(seed)

    def apply(op, u):
        return apply_MinvA(u) if operand is None else apply_MinvA(op, u)

    @functools.partial(jax.jit, static_argnames=())
    def run(op, u1, u2):
        if range_start:
            u1 = apply(op, u1)
            u2 = apply(op, u2)

        def body_max(i, carry):
            u, _ = carry
            u = u / jnp.linalg.norm(u)
            v = apply(op, u)
            return (v, jnp.dot(u, v))

        _, lam_max = jax.lax.fori_loop(
            0, num_iters, body_max, (u1, jnp.asarray(1.0, dtype))
        )
        lam_max = jnp.abs(lam_max)

        def body_min(i, carry):
            u, _ = carry
            u = u / jnp.linalg.norm(u)
            v = lam_max * u - apply(op, u)
            return (v, jnp.dot(u, v))

        _, rho = jax.lax.fori_loop(
            0, num_iters, body_min, (u2, jnp.asarray(0.0, dtype))
        )
        lam_min = jnp.maximum(lam_max - jnp.abs(rho), 1e-12)
        return lam_max, lam_min

    u1 = jnp.asarray(rng.random(n), dtype=dtype)
    u2 = jnp.asarray(rng.random(n), dtype=dtype)
    lam_max, lam_min = run(operand, u1, u2)
    # mild safety margins (the reference shifts its estimates similarly)
    return make_cheby_coeffs(
        alpha=0.95 * float(lam_min), beta=1.05 * float(lam_max)
    )


def estimate_eigs_lobpcg(
    apply_op, n: int, dtype, num_iters: int = 12, block: int = 4,
    seed: int = 0, range_start: bool = False,
) -> ChebyCoeffs:
    """Eigenvalue bounds via block LOBPCG (the native equivalent of the
    reference's -cheby_eig hypre_lobpcg path, src/SMEM_Cheby.cpp:255-408,
    which injects the MG-preconditioned matvec into hypre's LOBPCG):
    Rayleigh-Ritz over the locally-optimal subspace span[X, R, P] with the
    Ritz block tracking BOTH ends of the spectrum, so one run yields
    (lambda_min, lambda_max).

    range_start=True starts (and keeps, by symmetry) the block inside
    range(op) so a semidefinite operator's zero eigenvalue is excluded and
    the lower bound is the smallest NONZERO eigenvalue — same contract as
    estimate_cycle_eigs(range_start=True)."""
    rng = np.random.default_rng(seed)
    b = max(2, min(block, n // 2))
    apply_j = jax.jit(apply_op)
    try:
        applym = jax.jit(jax.vmap(apply_op, in_axes=1, out_axes=1))
        applym(jnp.zeros((n, 1), dtype)).block_until_ready()
    except Exception:  # operator not vmappable: apply column-wise
        def applym(Xm):
            return jnp.stack(
                [apply_j(Xm[:, i]) for i in range(Xm.shape[1])], axis=1
            )

    X = jnp.asarray(rng.standard_normal((n, b)), dtype=dtype)
    if range_start:
        X = applym(X)
    X, _ = jnp.linalg.qr(X)
    P = None
    lam_lo, lam_hi = 1.0, 1.0
    lo_sel = b // 2  # Ritz vectors kept at the low end; rest at the high end
    for _ in range(num_iters):
        AX = applym(X)
        T = X.T @ AX
        T = (T + T.T) / 2
        R = AX - X @ T  # block residual of the current Ritz approximation
        S = jnp.concatenate([X, R] + ([P] if P is not None else []), axis=1)
        Q, _ = jnp.linalg.qr(S)
        AQ = applym(Q)
        Tq = Q.T @ AQ
        Tq = (Tq + Tq.T) / 2
        evals, W = jnp.linalg.eigh(Tq)
        lam_lo, lam_hi = float(evals[0]), float(evals[-1])
        m = Tq.shape[0]
        sel = jnp.asarray(
            list(range(lo_sel)) + list(range(m - (b - lo_sel), m))
        )
        P = X  # previous iterate block = the locally-optimal direction
        X = Q @ W[:, sel]
    lam_lo = max(lam_lo, 1e-12)
    return make_cheby_coeffs(alpha=0.95 * lam_lo, beta=1.05 * lam_hi)


def estimate_eigs_lanczos(
    apply_op, n: int, dtype, num_iters: int = 30, seed: int = 0,
    range_start: bool = False,
) -> ChebyCoeffs:
    """Eigenvalue bounds via Lanczos (the native analog of the reference's
    LOBPCG/Arnoldi eigensolvers, src/SMEM_Cheby.cpp:62-408): run the Lanczos
    recurrence on the (symmetric) operator, take the extreme Ritz values of
    the tridiagonal matrix. Sharper than power iteration at equal cost —
    both ends of the spectrum from one run."""
    import numpy as np
    from scipy.linalg import eigh_tridiagonal

    rng = np.random.default_rng(seed)
    apply_j = jax.jit(apply_op)
    v = jnp.asarray(rng.random(n), dtype=dtype)
    if range_start:
        v = apply_j(v)
    v = v / jnp.linalg.norm(v)
    alphas, betas = [], []
    v_prev = jnp.zeros_like(v)
    beta = 0.0
    for _ in range(num_iters):
        w = apply_j(v)
        alpha = float(jnp.dot(v, w))
        w = w - alpha * v - beta * v_prev
        # full reorthogonalization is overkill for bounds; one step against
        # the previous two vectors suffices for extreme Ritz values
        beta_new = float(jnp.linalg.norm(w))
        alphas.append(alpha)
        if beta_new < 1e-14:
            break
        betas.append(beta_new)
        v_prev = v
        v = w / beta_new
        beta = beta_new
    if len(alphas) == 1:
        lam_min = lam_max = alphas[0]
    else:
        evals = eigh_tridiagonal(
            np.asarray(alphas), np.asarray(betas[: len(alphas) - 1]),
            eigvals_only=True,
        )
        lam_min, lam_max = float(evals[0]), float(evals[-1])
    lam_min = max(lam_min, 1e-12)
    return make_cheby_coeffs(alpha=0.95 * lam_min, beta=1.05 * lam_max)
