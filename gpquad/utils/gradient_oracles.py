"""Dense reference gradient oracles (component C17).

Re-implementation of the reference's ``utils/gradient_tests.py:6-178``:
small-n, O(n^3) ground-truth gradients used by sanity checks and tests.

  - :func:`negative_log_marginal_likelihood` — dense NLL of the exact GP.
  - :func:`compute_gradients_vanilla` — gradient of the exact dense NLL wrt
    (kernel hypers..., sigmasq).  The reference routes this through
    autograd-on-Cholesky; here it is one ``jax.grad``.
  - :func:`compute_gradients_truncated` — gradient of the *truncated
    spectral objective* ``C = F D^2 F^H + sigma^2 I`` (the quantity EFGP
    actually optimizes), with explicit dense F on the quadrature grid.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.efgp import tensor_grid
from ..quadrature import spectral_grid

__all__ = [
    "negative_log_marginal_likelihood",
    "compute_gradients_vanilla",
    "compute_gradients_truncated",
    "dense_design_matrix",
]


def negative_log_marginal_likelihood(kernel, x, y, sigmasq) -> jnp.ndarray:
    """Dense NLL: 0.5 (y^T C^-1 y + logdet C + n log 2 pi)."""
    x = x[:, None] if x.ndim == 1 else x
    n = x.shape[0]
    C = kernel.kernel_matrix(x, x) + sigmasq * jnp.eye(n, dtype=x.dtype)
    L = jnp.linalg.cholesky(C)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return 0.5 * (jnp.dot(y, alpha)
                  + 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
                  + n * jnp.log(2.0 * jnp.pi))


def compute_gradients_vanilla(kernel, x, y, sigmasq) -> jnp.ndarray:
    """d NLL / d (kernel hypers..., sigmasq) of the exact dense GP via
    autodiff through the Cholesky (reference compute_gradients_vanilla,
    utils/gradient_tests.py)."""
    hv = jnp.concatenate([kernel.hyper_vector(),
                          jnp.asarray(sigmasq)[None]])

    def nll_of(vec):
        return negative_log_marginal_likelihood(
            kernel.with_hypers(vec), x, y, vec[-1])

    return jax.grad(nll_of)(hv)


def dense_design_matrix(x, h, mtot: int, d: int) -> jnp.ndarray:
    """Explicit F[n, k] = exp(+2 pi i x_n . xi_k) on the quadrature grid."""
    x = x[:, None] if x.ndim == 1 else x
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=x.dtype) * h, d)
    return jnp.exp(2j * jnp.pi * (x @ xis.T))


def compute_gradients_truncated(kernel, x, y, sigmasq, eps
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact gradient of the truncated spectral objective
    (reference compute_gradients_truncated, utils/gradient_tests.py):
    forms C = F D^2 F^H + sigma^2 I densely on the EFGP quadrature grid and
    differentiates 0.5 (y^T C^-1 y + logdet C) analytically.

    Returns (grad over (hypers..., sigmasq), nll value).
    """
    x = x[:, None] if x.ndim == 1 else x
    n, d = x.shape
    L = float(np.max(np.asarray(jnp.max(x, 0) - jnp.min(x, 0))))
    if L <= 1e-9:
        L = 1.0
    _, h, mtot = spectral_grid(kernel, eps, L)
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=x.dtype) * h, d)
    F = dense_design_matrix(x, h, mtot, d)

    S = kernel.spectral_density(xis) * h**d
    C = jnp.real((F * S[None, :].astype(F.dtype)) @ jnp.conj(F).T) \
        + sigmasq * jnp.eye(n, dtype=x.dtype)
    Lc = jnp.linalg.cholesky(C)
    alpha = jax.scipy.linalg.cho_solve((Lc, True), y)
    Cinv = jax.scipy.linalg.cho_solve((Lc, True), jnp.eye(n, dtype=x.dtype))
    nll = 0.5 * (jnp.dot(y, alpha)
                 + 2.0 * jnp.sum(jnp.log(jnp.diag(Lc)))
                 + n * jnp.log(2.0 * jnp.pi))

    Dp = (h**d) * kernel.spectral_grad(xis)      # (M, H)
    grads = []
    for i in range(len(kernel.hyper_names)):
        dC = jnp.real((F * Dp[:, i][None, :].astype(F.dtype)) @ jnp.conj(F).T)
        grads.append(0.5 * (jnp.trace(Cinv @ dC) - alpha @ dC @ alpha))
    grads.append(0.5 * (jnp.trace(Cinv) - jnp.dot(alpha, alpha)))
    return jnp.stack(grads), nll
