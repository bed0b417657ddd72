"""Batched preconditioned conjugate gradients as a ``lax.while_loop``.

TPU-native re-design of the reference's ``ConjugateGradients``
(reference: cg.py:5-261).  The reference's batched path gathers the still-
active systems each iteration (``p[idx]``, cg.py:193-241) — a dynamic shape
XLA cannot compile.  Here the batch stays rectangular and a boolean lane
mask freezes converged systems: masked update factors are zeroed so frozen
lanes are bit-stable, which is mathematically identical to the reference's
per-system early stopping while keeping every shape static.

Convergence mirrors cg.py:229-241: relative residual against the row-wise
RHS norm (warm-start independent), with an absolute ``1e-12`` fallback for
tiny right-hand sides.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pcg", "CGResult"]

_DIV_EPS = 1e-16


class CGResult(NamedTuple):
    x: jnp.ndarray            # solutions, same shape as b
    iters: jnp.ndarray        # scalar: loop iterations executed
    converged: jnp.ndarray    # (B,) bool
    resnorm: jnp.ndarray      # (B,) final residual norms
    conv_iters: jnp.ndarray   # (B,) iteration index at convergence (maxiter if not)


def _rowdot(a, b):
    return jnp.sum(jnp.conj(a) * b, axis=-1).real


def _nonzero(v):
    return jnp.where(v == 0, jnp.ones_like(v), v)


def pcg(A: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None, *,
        tol: float = 1e-6, maxiter: Optional[int] = None,
        M_inv: Optional[Callable] = None,
        early_stopping: bool = True) -> CGResult:
    """Solve ``A x = b`` for one or a batch of right-hand sides.

    ``A`` (and ``M_inv``) must accept/return arrays shaped like ``b``;
    ``b`` is ``(n,)`` or ``(B, n)``.  Absolute-residual fallback and the
    row-wise relative test follow reference cg.py:184-241.
    """
    single = b.ndim == 1
    if single:
        b = b[None, :]
        if x0 is not None:
            x0 = x0[None, :]
        Ab = lambda v: A(v[0])[None, :]
        Mb = (lambda v: M_inv(v[0])[None, :]) if M_inv is not None else None
    else:
        Ab, Mb = A, M_inv

    B, n = b.shape
    if maxiter is None:
        maxiter = 2 * n                      # reference default, cg.py:60-65
    if x0 is None:
        x0 = jnp.zeros_like(b)

    with jax.named_scope("4_solve_cg" if b.shape[0] == 1 else "7_batch_cg_solve"):
        return _pcg_body(Ab, b, x0, Mb, tol, maxiter, early_stopping, single)


def _pcg_body(Ab, b, x0, Mb, tol, maxiter, early_stopping, single):
    B, n = b.shape
    x = x0.astype(b.dtype)
    r = b - Ab(x)
    z = Mb(r) if Mb is not None else r
    p = z
    rz = _rowdot(r, z)
    b_norm = jnp.sqrt(_rowdot(b, b))
    denom = jnp.where(b_norm > 0, b_norm, jnp.ones_like(b_norm))

    rn0 = jnp.sqrt(_rowdot(r, r))
    conv0 = (rn0 / (denom + _DIV_EPS) < tol) | (rn0 < 1e-12)
    active0 = ~conv0 if early_stopping else jnp.ones((B,), dtype=bool)

    State = tuple  # (k, x, r, p, rz, active, conv_iters)
    conv_iters0 = jnp.where(conv0, 0, maxiter).astype(jnp.int32)

    def cond(state: State):
        k, _, _, _, _, active, _ = state
        if early_stopping:
            return (k < maxiter) & jnp.any(active)
        return k < maxiter

    def body(state: State):
        k, x, r, p, rz, active, conv_iters = state
        Ap = Ab(p)
        # zero-denominator guards are exact (a where, not an additive eps):
        # the reference's additive div_eps (cg.py:57, 121, 145) biases beta
        # once rz ~ eps and stalls CG around 1e-8 relative residual.
        pAp = _rowdot(p, Ap)
        alpha = jnp.where(active, rz / _nonzero(pAp), 0.0)
        x = x + alpha[:, None].astype(x.dtype) * p
        r = r - alpha[:, None].astype(r.dtype) * Ap
        z = Mb(r) if Mb is not None else r
        rz_new = _rowdot(r, z)
        beta = jnp.where(active, rz_new / _nonzero(rz), 0.0)
        p = jnp.where(active[:, None], z + beta[:, None].astype(p.dtype) * p, p)
        rz = jnp.where(active, rz_new, rz)
        rn = jnp.sqrt(_rowdot(r, r))
        newly = active & ((rn / (denom + _DIV_EPS) < tol) | (rn < 1e-12))
        conv_iters = jnp.where(newly, k + 1, conv_iters)
        if early_stopping:
            active = active & ~newly
        return (k + 1, x, r, p, rz, active, conv_iters)

    k, x, r, p, rz, active, conv_iters = lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32), x, r, p, rz, active0,
                     conv_iters0))

    rn = jnp.sqrt(_rowdot(r, r))
    converged = (rn / (denom + _DIV_EPS) < tol) | (rn < 1e-12)
    if single:
        return CGResult(x[0], k, converged[0], rn[0], conv_iters[0])
    return CGResult(x, k, converged, rn, conv_iters)
