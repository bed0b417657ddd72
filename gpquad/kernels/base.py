"""Kernel base utilities for the TPU-native EFGP framework.

Functional re-design of the reference's pydantic ``Kernel`` ABC
(reference: kernels/kernel.py:6-241).  Instead of a mutable object holding a
back-pointer into an ``nn.Parameter`` container, kernels here are immutable
pytree dataclasses: hyperparameters are leaves (traced under ``jit``), the
dimension and smoothness order are static metadata.  New hyperparameter values
produce a *new* kernel via :func:`with_hypers` — no hidden state, no cache
invalidation protocol.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "kernel_dataclass",
    "AbstractKernel",
    "median_distance_heuristic",
]


def kernel_dataclass(cls):
    """Register a kernel dataclass as a JAX pytree.

    Hyperparameter fields (``jax.Array``-annotated) are data leaves; fields
    marked with ``metadata={'static': True}`` are auxiliary (hashable) data.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


class AbstractKernel:
    """Mixin providing the shared kernel interface.

    Subclasses define:
      - ``hyper_names``: class attr, ordered kernel hyperparameters
        (noise variance is *not* a kernel hyper; it is appended by the
        parameter container, mirroring reference kernels/kernel_params.py:9-55)
      - ``kernel(dist)``: stationary kernel value at distances
      - ``spectral_density(xi)``: spectral density at frequencies ``(n, d)``
      - ``spectral_grad(xi)``: closed-form ``(n, H)`` gradient of the density
    """

    hyper_names: Tuple[str, ...] = ()

    # ------------------------------------------------------------------
    # hyperparameter plumbing
    # ------------------------------------------------------------------
    @property
    def num_hypers(self) -> int:
        """Number of hyperparameters *including* the noise variance.

        Parity with reference ``Kernel.num_hypers`` (kernels/kernel.py:59).
        """
        return len(self.hyper_names) + 1

    def hyper_vector(self) -> jnp.ndarray:
        """Kernel hypers stacked in declared order, shape ``(H,)``."""
        return jnp.stack(
            [jnp.asarray(getattr(self, n), dtype=jnp.result_type(float)) for n in self.hyper_names]
        )

    def with_hypers(self, vec) -> "AbstractKernel":
        """Return a new kernel with hyperparameters taken from ``vec``.

        ``vec`` holds positive-space values in ``hyper_names`` order; extra
        trailing entries (e.g. the noise variance) are ignored so the full
        ``HyperState.pos`` vector can be passed directly.
        """
        updates = {n: vec[i] for i, n in enumerate(self.hyper_names)}
        return dataclasses.replace(self, **updates)

    def get_hyper(self, name: str):
        if name not in self.hyper_names:
            raise ValueError(f"Unknown hyperparameter: {name}")
        return getattr(self, name)

    def set_hyper(self, name: str, value):
        """Immutable analogue of the reference's ``set_hyper`` — returns a
        *new* kernel (reference mutates GPParams in place,
        kernels/kernel.py:120-139)."""
        if name not in self.hyper_names:
            raise ValueError(f"Unknown hyperparameter: {name}")
        return dataclasses.replace(self, **{name: value})

    def iter_hypers(self):
        for n in self.hyper_names:
            yield n, getattr(self, n)

    # ------------------------------------------------------------------
    # generic dense reference implementations
    # ------------------------------------------------------------------
    def kernel_matrix(self, x, y) -> jnp.ndarray:
        """Dense kernel matrix K(x, y). Oracle-path only (O(nm) memory).

        Parity: reference kernels/kernel.py:188-206.
        """
        x = jnp.atleast_2d(x.T).T if x.ndim == 1 else x
        y = jnp.atleast_2d(y.T).T if y.ndim == 1 else y
        d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        return self.kernel(dist)

    def log_marginal(self, x, y, sigmasq) -> jnp.ndarray:
        """Dense Cholesky log marginal likelihood (oracle path).

        Parity: reference kernels/squared_exponential.py:125-163.
        """
        x = x[:, None] if x.ndim == 1 else x
        n = x.shape[0]
        K = self.kernel_matrix(x, x)
        Kn = K + sigmasq * jnp.eye(n, dtype=K.dtype)
        L = jnp.linalg.cholesky(Kn)
        alpha = jax.scipy.linalg.cho_solve((L, True), y)
        data_fit = 0.5 * jnp.sum(y * alpha)
        complexity = jnp.sum(jnp.log(jnp.diag(L)))
        constant = 0.5 * n * jnp.log(2.0 * jnp.pi)
        lm = -(data_fit + complexity + constant)
        # Cholesky failure fallback: jnp returns NaNs where torch raises;
        # mirror the reference's -inf fallback (squared_exponential.py:161-163)
        return jnp.where(jnp.isnan(lm), -jnp.inf, lm)

    def spectral_grad_auto(self, xi) -> jnp.ndarray:
        """Autodiff gradient of the spectral density wrt kernel hypers.

        The reference hand-derives these (squared_exponential.py:93-123,
        matern.py:125-168); here ``jax.jacfwd`` over the hyper vector provides
        an independent check, and the closed forms remain the fast path.
        Returns shape ``(n, H)``.
        """
        def density_of(vec, xi_):
            return self.with_hypers(vec).spectral_density(xi_)

        return jax.jacfwd(density_of)(self.hyper_vector(), xi)

    def estimate_hyperparameters(self, x, y, key=None, K: int = 1000):
        """Median-distance initialization heuristic.

        Parity: reference squared_exponential.py:165-216 / matern.py:210-265.
        Returns (lengthscale, variance, noise_var) as floats/arrays.
        """
        x = x[:, None] if x.ndim == 1 else x
        y_var = jnp.var(y)
        med = median_distance_heuristic(x, key=key, K=K)
        lengthscale = self._median_to_lengthscale(med)
        return lengthscale, y_var, 0.2 * y_var

    def _median_to_lengthscale(self, med):
        return med  # Matérn default (matern.py:257); SE overrides with 0.5*med


def median_distance_heuristic(x, key=None, K: int = 1000):
    """Median pairwise distance over (at most) K sampled points."""
    n = x.shape[0]
    if n > K:
        if key is None:
            key = jax.random.PRNGKey(0)
        idx = jax.random.permutation(key, n)[:K]
        xs = x[idx]
    else:
        xs = x
    d2 = jnp.sum((xs[:, None, :] - xs[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    mask = dist > 0
    # median over strictly positive entries (reference squared_exponential.py:203-204)
    vals = jnp.where(mask, dist, jnp.nan)
    return jnp.nanmedian(vals)
