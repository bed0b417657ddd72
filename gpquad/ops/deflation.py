"""Deflation (dense-head + Jacobi-tail) preconditioner for the EFGP
Gram system.

The reference preconditions its large-grid CG solves with the diagonal
``c |w|^2 + sigma^2`` family only (reference create_jacobi_precond,
efgpnd.py:1619-1631; the sweep benchmark_cg_preconditioning_realdata.py
picks ``c``).  On the hard small-lengthscale regimes that still costs
hundreds of iterations (best gamma=0.3: 374 iters on the bench hard
config) because the diagonal cannot see the coupling between the
large-weight low-frequency modes.

TPU-first observation: the ill-conditioning of ``A = D T D + sigma^2 I``
concentrates in the ``k`` modes with the largest quadrature weights —
exactly the modes the dense factor-solve (ops/dense_solve.py) handles
for small grids.  So for ``M > DENSE_SOLVER_MAX_M`` we deflate: gather
the principal ``k x k`` submatrix of ``A`` on the top-``k`` weight modes
straight from the Toeplitz lag table, invert it once on the MXU, and
precondition with

    P^{-1} = inv(A[B, B])  on the head block B,
             1 / (diag_scale |w|^2 + sigma^2)  on the tail,

a Hermitian-PD block-diagonal operator.  Measured on the bench hard
config (mtot=107, M=11449, n=1e5, f32): 374 -> 59 iterations at k=2048.
Every solver that shares ``A`` (mean solve, trace probes, df64 iterative
refinement) amortizes the one O(k^3) build.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from .chol import hpd_inverse

__all__ = ["deflation_block", "make_deflation_precond",
           "make_block_precond"]


def deflation_block(ws: jnp.ndarray, v: jnp.ndarray, sigmasq, *,
                    mtot: int, d: int, rank: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the top-``rank`` modes by |ws| and build ``inv(A[B, B])``.

    ``v`` is the Toeplitz lag table of shape ``(2*mtot-1,)*d`` (the
    convolution vector); ``A[B, B]`` is gathered from it directly —
    ``A[j, k] = ws_j conj(ws_k) v[lag(j, k)] + sigma^2 delta_jk`` (the
    same identity ops/dense_solve.dense_gram materializes for the full
    grid).  Returns ``(idx, P_BB)`` with ``idx`` (rank,) mode indices and
    ``P_BB`` the (rank, rank) inverse.
    """
    M = mtot ** d
    k = min(int(rank), M)
    cdtype = ws.dtype
    absw2 = jnp.abs(ws) ** 2
    _, idx = jax.lax.top_k(absw2, k)
    # flat mode index -> d-digit multi-index (row-major, as tensor_grid /
    # dense_lag_gather_indices lay the grid out)
    digits = []
    rem = idx
    for _ in range(d):
        digits.append(rem % mtot)
        rem = rem // mtot
    multi = jnp.stack(digits[::-1], axis=-1)            # (k, d)
    L = 2 * mtot - 1
    lag = multi[:, None, :] - multi[None, :, :] + (mtot - 1)
    flat = lag[..., 0]
    for t in range(1, d):
        flat = flat * L + lag[..., t]
    T_BB = v.reshape(-1)[flat]
    wB = ws[idx]
    A_BB = (wB[:, None] * T_BB * jnp.conj(wB)[None, :]
            + jnp.asarray(sigmasq, jnp.real(ws).dtype)
            * jnp.eye(k, dtype=cdtype))
    return idx, hpd_inverse(A_BB)


def make_block_precond(idx: jnp.ndarray, P_BB: jnp.ndarray,
                       jac_diag: jnp.ndarray) -> Callable:
    """Block-diagonal preconditioner apply from a prebuilt head inverse
    and tail Jacobi diagonal: rows/batches shaped like the RHS."""
    HI = jax.lax.Precision.HIGHEST

    def M_inv(r):
        rB = r[..., idx]
        zB = jnp.matmul(rB, P_BB.T, precision=HI)
        z = r / jac_diag.astype(r.dtype)
        if r.ndim == 1:
            return z.at[idx].set(zB)
        return z.at[..., idx].set(zB)

    return M_inv


def make_deflation_precond(ws: jnp.ndarray, v: jnp.ndarray, sigmasq, *,
                           mtot: int, d: int, rank: int,
                           diag_scale=1.0) -> Callable:
    """One-shot build: :func:`deflation_block` + :func:`make_block_precond`.

    ``diag_scale`` plays the same role as in
    ops/operators.make_jacobi_precond (the Toeplitz diagonal, N for the
    EFGP convolution vector).
    """
    idx, P_BB = deflation_block(ws, v, sigmasq, mtot=mtot, d=d, rank=rank)
    jac = diag_scale * jnp.abs(ws) ** 2 + jnp.asarray(sigmasq,
                                                      jnp.real(ws).dtype)
    return make_block_precond(idx, P_BB, jac)
