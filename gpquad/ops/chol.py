"""Precision-controlled blocked Cholesky inverse in pure JAX.

Why this exists: XLA:TPU's LAPACK-style custom calls (``jnp.linalg.inv``,
``cholesky``, ``eigh``, ``qr``) run their internal matmuls at the default
(bfloat16-pass) precision, which destroys factorizations of
ill-conditioned operators — on the headline EFGP Gram (cond ~ 6e5) the
built-in inverse returns ``||P A - I|| ~ 1e6`` while a host f32 LAPACK
inverse of the *same device-built matrix* gives ``~0.02-0.04``.
Newton-Schulz polishing is no rescue: it is unstable in f32 at this
conditioning (diverges right after its slow phase; measured).  A blocked
left-looking Cholesky built from ``precision=HIGHEST`` matmuls (MXU) and
sequential ``lax.scan`` small-block kernels (VPU) is backward-stable and
recovers host-LAPACK quality entirely on device, inside ``jit``.

The block loop is a ``lax.fori_loop`` over fixed-size column strips
(dynamic slices, one compiled body) so compile time stays flat in M.
Panel updates use triangular *substitution* (scan), not an explicit small
inverse — the substitution keeps the factorization backward-stable.
``hpd_inverse`` additionally Jacobi-equilibrates (unit diagonal) before
factoring, which buys a further constant on strongly graded operators
like the EFGP Gram (diag spans ~1e5).

No reference analogue: the reference leans on LAPACK/cuSOLVER via torch
(e.g. torch.linalg in vanilla_gp_sampling.py:141-151); this file is the
TPU-native replacement for what those provide.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["blocked_cholesky", "tri_inv", "hpd_inverse"]

_HI = lax.Precision.HIGHEST


def _chol_unblocked(S: jnp.ndarray) -> jnp.ndarray:
    """Unblocked lower Cholesky of a small HPD block via ``lax.scan``.

    Column ``j`` only reads columns ``< j`` of the partially-built ``L``
    (unfilled columns are zero, so the full-width matvec needs no mask).
    """
    b = S.shape[0]
    rows = jnp.arange(b)
    rdtype = jnp.real(S).dtype
    tiny = jnp.asarray(jnp.finfo(rdtype).tiny, rdtype)

    def step(L, j):
        c = jnp.take(S, j, axis=1) - jnp.matmul(
            L, jnp.conj(jnp.take(L, j, axis=0)), precision=_HI)
        dj = jnp.sqrt(jnp.maximum(jnp.real(jnp.take(c, j)), tiny))
        col = jnp.where(rows >= j, c / dj.astype(c.dtype), 0.0)
        return L.at[:, j].set(col.astype(L.dtype)), None

    L0 = jnp.zeros_like(S)
    L, _ = lax.scan(step, L0, jnp.arange(b))
    return L


def _tri_inv_unblocked(L: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a small lower-triangular block by forward substitution
    (``lax.scan`` over rows; unfilled rows of X are zero, L's strict upper
    part is zero, so full-width products need no masks)."""
    b = L.shape[0]

    def step(X, i):
        e = jax.nn.one_hot(i, b, dtype=L.dtype)
        row = (e - jnp.matmul(jnp.take(L, i, axis=0), X, precision=_HI)) \
            / jnp.take(jnp.diagonal(L), i)
        return X.at[i, :].set(row), None

    X0 = jnp.zeros_like(L)
    X, _ = lax.scan(step, X0, jnp.arange(b))
    return X


def _tri_solve_right(B: jnp.ndarray, Lkk: jnp.ndarray) -> jnp.ndarray:
    """Solve ``X Lkk^H = B`` for the panel by column substitution (scan).

    ``(X Lkk^H)[:, j] = sum_{p<=j} X[:, p] conj(Lkk[j, p])``; columns of X
    beyond ``j`` and entries ``Lkk[j, p>j]`` are zero, so the full-width
    product equals the partial sum with no masks.
    """
    dL = jnp.diagonal(Lkk)

    def step(X, j):
        lrow = jnp.conj(jnp.take(Lkk, j, axis=0))
        xj = (jnp.take(B, j, axis=1)
              - jnp.matmul(X, lrow, precision=_HI)) / jnp.conj(
                  jnp.take(dL, j))
        return X.at[:, j].set(xj), None

    X0 = jnp.zeros_like(B)
    X, _ = lax.scan(step, X0, jnp.arange(B.shape[1]))
    return X


def _pad_hpd(A: jnp.ndarray, block: int):
    M = A.shape[0]
    nb = max(1, -(-M // block))
    Mp = nb * block
    if Mp != M:
        pad = Mp - M
        A = jnp.block(
            [[A, jnp.zeros((M, pad), A.dtype)],
             [jnp.zeros((pad, M), A.dtype), jnp.eye(pad, dtype=A.dtype)]])
    return A, nb, Mp


def blocked_cholesky(A: jnp.ndarray, block: int = 64) -> jnp.ndarray:
    """Lower Cholesky factor of an HPD matrix, left-looking blocked.

    Per column strip: one full-width ``precision=HIGHEST`` matmul
    accumulates all previous columns, the diagonal block factors on the
    VPU, and the panel solves by substitution.  One ``fori_loop`` body —
    compile time is independent of the number of blocks.
    """
    M = A.shape[0]
    A, nb, Mp = _pad_hpd(A, block)
    rows = jnp.arange(Mp)[:, None]

    def body(k, L):
        lo = k * block
        colA = lax.dynamic_slice(A, (0, lo), (Mp, block))
        Lk = lax.dynamic_slice(L, (lo, 0), (block, Mp))   # cols >= lo zero
        col = colA - jnp.matmul(L, Lk.conj().T, precision=_HI)
        S = lax.dynamic_slice(col, (lo, 0), (block, block))
        Lkk = _chol_unblocked(S)
        X = _tri_solve_right(col, Lkk)                    # (Mp, block)
        X = lax.dynamic_update_slice(X, Lkk, (lo, 0))
        strip = jnp.where(rows >= lo, X, 0.0)
        return lax.dynamic_update_slice(L, strip, (0, lo))

    L = lax.fori_loop(0, nb, body, jnp.zeros_like(A))
    return L[:M, :M]


def tri_inv(L: jnp.ndarray, block: int = 64) -> jnp.ndarray:
    """Inverse of a lower-triangular matrix, blockwise.

    ``W[i,i] = inv(L[i,i])``; row strip ``i``:
    ``W[i, :] = -inv(L[i,i]) (L[i, :] @ W)`` with the diagonal block then
    overwritten — ``W`` stays lower triangular throughout, so the
    full-width matmul needs no masks.  One ``fori_loop`` body.
    """
    M = L.shape[0]
    L, nb, Mp = _pad_hpd(L, block)

    def body(i, W):
        lo = i * block
        Lrow = lax.dynamic_slice(L, (lo, 0), (block, Mp))
        Lkk = lax.dynamic_slice(L, (lo, lo), (block, block))
        Dinv = _tri_inv_unblocked(Lkk)
        acc = jnp.matmul(Lrow, W, precision=_HI)          # cols >= lo zero
        R = -jnp.matmul(Dinv, acc, precision=_HI)
        R = lax.dynamic_update_slice(R, Dinv, (0, lo))
        return lax.dynamic_update_slice(W, R, (lo, 0))

    W = lax.fori_loop(0, nb, body, jnp.zeros_like(L))
    return W[:M, :M]


def hpd_inverse(A: jnp.ndarray, block: int = 64) -> jnp.ndarray:
    """Explicit inverse of an HPD matrix: Jacobi-equilibrate, factor with
    the blocked Cholesky, invert the factor, form ``P = E L^-H L^-1 E``.

    f32 quality on TPU matches host LAPACK: ``||P A - I|| ~ cond(A)*eps``
    with a small constant (~0.02 on the cond-6e5 headline Gram), which is
    exactly the contraction rate iterative refinement needs.
    """
    dinv = (1.0 / jnp.sqrt(jnp.maximum(
        jnp.real(jnp.diagonal(A)),
        jnp.asarray(jnp.finfo(jnp.real(A).dtype).tiny)))).astype(A.dtype)
    Aeq = dinv[:, None] * A * dinv[None, :]
    L = blocked_cholesky(Aeq, block=block)
    W = tri_inv(L, block=block)
    P = jnp.matmul(W.conj().T, W, precision=_HI)
    return dinv[:, None] * P * dinv[None, :]
