"""Stochastic Lanczos quadrature log-determinant (component C13).

TPU-native re-design of the reference's ``logdet_slq`` (efgpnd.py:1686-1759):
estimates ``log det(I + sigma^-2 D T D) + n log sigma^2``, which by the
Weinstein-Aronszajn identity equals ``log det(K_approx + sigma^2 I_n)``.

The reference runs a Python loop per probe and per Lanczos step; here all
probes run vmapped and the Lanczos recurrence is one ``lax.scan``, so the
whole estimate is a single compiled program whose hot ops are the batched
Toeplitz FFT matvecs.  Early Krylov breakdown (beta ~ 0) is handled by
zeroing the recurrence: the decoupled tridiagonal block then carries zero
Gauss-quadrature weight in the first-row eigenvector components, matching
the reference's early ``break`` (efgpnd.py:1738-1740) exactly.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["logdet_slq", "lanczos_tridiag", "slq_trace_f", "power_iteration",
           "trace_ainv_b_fd"]

_BREAKDOWN = 1e-12


def lanczos_tridiag(Av: Callable, q0: jnp.ndarray, steps: int):
    """Run ``steps`` of Lanczos from unit vector(s) ``q0`` (B, m).

    Returns (alphas, betas) of shapes (B, steps) and (B, steps): the
    tridiagonal coefficients, zero-padded after Krylov breakdown.
    """
    def body(carry, _):
        q, q_prev, beta_prev, alive = carry
        v = Av(q) - beta_prev[:, None].astype(q.dtype) * q_prev
        alpha = jnp.sum(jnp.conj(q) * v, axis=-1).real
        v = v - alpha[:, None].astype(v.dtype) * q
        beta = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=-1))
        alive_next = alive & (beta > _BREAKDOWN)
        q_next = jnp.where(alive_next[:, None],
                           v / jnp.where(beta == 0, 1.0, beta)[:, None].astype(v.dtype),
                           jnp.zeros_like(v))
        alpha_out = jnp.where(alive, alpha, 0.0)
        beta_out = jnp.where(alive_next, beta, 0.0)
        return (q_next, q, jnp.where(alive_next, beta, 0.0), alive_next), \
            (alpha_out, beta_out)

    B = q0.shape[0]
    init = (q0, jnp.zeros_like(q0), jnp.zeros((B,), q0.real.dtype),
            jnp.ones((B,), bool))
    _, (alphas, betas) = lax.scan(body, init, None, length=steps)
    return alphas.T, betas.T  # (B, steps)


@partial(jax.jit, static_argnames=("probes", "steps"))
def logdet_slq(ws, sigmasq, toeplitz, key, *, probes: int = 100,
               steps: int = 25, n: int = 0) -> jnp.ndarray:
    """Estimate ``log det(K_approx + sigma^2 I_n)``.

    ``ws``: (M,) quadrature weights; ``toeplitz``: the Gram operator;
    ``n``: number of data points for the ``n log sigma^2`` correction
    (reference efgpnd.py:1758).
    """
    m = ws.shape[0]
    rdtype = jnp.real(ws).dtype
    sigmasq = jnp.asarray(sigmasq, dtype=rdtype)
    z, znorm = _rademacher(key, probes, m, rdtype)
    q0 = (z / znorm[:, None]).astype(ws.dtype)

    def Av(v):
        return v + (ws * toeplitz(ws * v)) / sigmasq.astype(v.dtype)

    alphas, betas = lanczos_tridiag(Av, q0, steps)
    quad = _gauss_quadrature(alphas, betas, jnp.log) * znorm**2
    return jnp.mean(quad) + n * jnp.log(sigmasq)


def _gauss_quadrature(alphas, betas, f):
    """Per-probe Gauss quadrature ``e1' f(T) e1`` from Lanczos coefficients.

    ``alphas``/``betas``: (B, steps) tridiagonal coefficients.  Returns (B,)
    quadrature values for *unit-norm* starting vectors (scale by ||z||^2 for
    Hutchinson probes).  Eigenvalue floor 1e-18 follows the reference
    (efgpnd.py:1753; SLQ_trace.ipynb quad_from_tridiag).
    """
    B, steps = alphas.shape
    T = (jnp.zeros((B, steps, steps), alphas.dtype)
         .at[:, jnp.arange(steps), jnp.arange(steps)].set(alphas))
    if steps > 1:
        i = jnp.arange(steps - 1)
        T = T.at[:, i, i + 1].set(betas[:, :-1])
        T = T.at[:, i + 1, i].set(betas[:, :-1])
    evals, evecs = jnp.linalg.eigh(T)
    evals = jnp.maximum(evals, 1e-18)
    w1 = evecs[:, 0, :]
    return jnp.sum(w1**2 * f(evals), axis=-1)


def _rademacher(key, probes, m, dtype):
    z = (jax.random.bernoulli(key, 0.5, (probes, m)) * 2 - 1).astype(dtype)
    znorm = jnp.sqrt(jnp.sum(z * z, axis=-1))
    return z, znorm


def slq_trace_f(Av: Callable, key, m: int, *, probes: int = 8,
                steps: int = 20, f: Callable = lambda x: 1.0 / x,
                dtype=jnp.float32, batched: bool = False) -> jnp.ndarray:
    """Hutchinson + Lanczos estimate of ``tr(f(A))`` for SPD ``A``.

    TPU-native counterpart of the reference's generic ``slq_trace_f``
    (polyagamma_classification/SLQ_trace.ipynb, helper cell): all probes run
    in one vmapped ``lax.scan`` Lanczos and one batched eigendecomposition.
    ``Av`` maps a single (m,) vector; pass ``batched=True`` if it already
    maps (B, m) stacks (e.g. the batched Toeplitz matvec).  Default
    ``f = 1/x`` estimates ``tr(A^{-1})``.  Callers jit this (the probe loop
    and eigh fuse into one program); it is also jit-safe inline.
    """
    Avb = Av if batched else jax.vmap(Av)
    z, znorm = _rademacher(key, probes, m, dtype)
    q0 = z / znorm[:, None]
    alphas, betas = lanczos_tridiag(Avb, q0, steps)
    return jnp.mean(_gauss_quadrature(alphas, betas, f) * znorm**2)


def power_iteration(Av: Callable, key, m: int, *, iters: int = 8,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Operator-norm estimate by power iteration (SLQ_trace.ipynb helper)."""
    x = jax.random.normal(key, (m,), dtype)
    x = x / jnp.linalg.norm(x)

    def body(x, _):
        y = Av(x)
        ny = jnp.linalg.norm(y)
        return y / jnp.where(ny == 0, 1.0, ny), ny

    x, _ = lax.scan(body, x, None, length=iters)
    return jnp.linalg.norm(Av(x))


def trace_ainv_b_fd(A_apply: Callable, B_apply: Callable, key, m: int, *,
                    probes: int = 8, steps: int = 20, c: float = 5.0,
                    max_halves: int = 8, dtype=jnp.float32,
                    batched: bool = False):
    """Estimate ``tr(A^{-1} B)`` for SPD ``A``, symmetric ``B``, matvecs only.

    Uses the directional-logdet identity ``tr(A^{-1}B) = d/dh log det(A+hB)``
    evaluated by central finite difference of two SLQ log-dets sharing the
    same Rademacher probes, with the automatic step
    ``h = c sqrt(eps) ||A|| / ||B||`` halved (up to ``max_halves`` times,
    inside ``lax.while_loop``) until ``A ± hB`` pass a two-probe Rayleigh
    SPD check — the reference's ``estimate_trace_AinvB_via_FD`` /
    ``estimate_h`` (polyagamma_classification/SLQ_trace.ipynb).
    ``A_apply``/``B_apply`` map single (m,) vectors unless ``batched=True``.

    Returns ``(estimate, h)``.
    """
    if batched:
        A1 = lambda v: A_apply(v[None, :])[0]
        B1 = lambda v: B_apply(v[None, :])[0]
    else:
        A1, B1 = A_apply, B_apply
        A_apply, B_apply = jax.vmap(A_apply), jax.vmap(B_apply)
    kA, kB, kS, kZ = jax.random.split(key, 4)
    A_norm = power_iteration(A1, kA, m, dtype=dtype)
    B_norm = power_iteration(B1, kB, m, dtype=dtype)
    eps = jnp.finfo(dtype).eps
    h0 = c * jnp.sqrt(eps) * A_norm / jnp.where(B_norm == 0, 1.0, B_norm)

    r = jax.random.normal(kS, (2, m), dtype)
    r = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    # h-independent Rayleigh quotients: 2+2 matvecs once, not per halving
    quad_a = jnp.sum(r * A_apply(r), axis=-1)
    quad_b = jnp.sum(r * B_apply(r), axis=-1)

    def spd_ok(h):
        return jnp.all(quad_a + h * quad_b > 0) & \
            jnp.all(quad_a - h * quad_b > 0)

    def cond(carry):
        h, halves = carry
        return (~spd_ok(h)) & (halves < max_halves)

    h, _ = lax.while_loop(cond, lambda ch: (ch[0] * 0.5, ch[1] + 1),
                          (h0, jnp.asarray(0)))

    z, znorm = _rademacher(kZ, probes, m, dtype)
    q0 = z / znorm[:, None]

    def logdet(sign):
        def Av(v):
            return A_apply(v) + sign * h * B_apply(v)
        alphas, betas = lanczos_tridiag(Av, q0, steps)
        return jnp.mean(_gauss_quadrature(alphas, betas, jnp.log) * znorm**2)

    return (logdet(1.0) - logdet(-1.0)) / (2.0 * h), h
