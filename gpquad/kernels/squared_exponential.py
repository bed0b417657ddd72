"""Squared-exponential (RBF) kernel.

TPU-native functional re-implementation of the reference kernel
(reference: kernels/squared_exponential.py:9-216).  Same math:

    k(r)   = variance * exp(-r^2 / (2 l^2))
    S(xi)  = (2 pi l^2)^(d/2) * variance * exp(-2 pi^2 l^2 |xi|^2)
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from .base import AbstractKernel, kernel_dataclass


@kernel_dataclass
class SquaredExponential(AbstractKernel):
    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0
    dimension: int = dataclasses.field(default=1, metadata={"static": True})

    hyper_names = ("lengthscale", "variance")

    # ------------------------------------------------------------------
    def kernel(self, distance):
        """k(r) — reference squared_exponential.py:46-62."""
        s = distance / self.lengthscale
        return self.variance * jnp.exp(-0.5 * s * s)

    def spectral_density(self, xi):
        """S(xi) for xi of shape (n,) or (n, d) — reference :64-91."""
        xi = xi[..., None] if xi.ndim == 1 else xi
        nsq = jnp.sum(xi * xi, axis=-1)
        l2 = self.lengthscale * self.lengthscale
        pref = (2.0 * jnp.pi * l2) ** (self.dimension / 2.0) * self.variance
        return pref * jnp.exp(-2.0 * jnp.pi**2 * l2 * nsq)

    def spectral_grad(self, xi):
        """[dS/dl, dS/dvariance], shape (n, 2) — reference :93-123."""
        xi = xi[..., None] if xi.ndim == 1 else xi
        nsq = jnp.sum(xi * xi, axis=-1)
        s = self.spectral_density(xi)
        two_pi_sq = (2.0 * jnp.pi) ** 2
        dl = s * (self.dimension / self.lengthscale
                  - two_pi_sq * self.lengthscale * nsq)
        dv = s / self.variance
        return jnp.stack([dl, dv], axis=-1)

    def _median_to_lengthscale(self, med):
        # reference squared_exponential.py:208
        return 0.5 * med
