"""Matérn kernel (any nu > 0; closed forms for nu in {1/2, 3/2, 5/2}).

TPU-native functional re-implementation of the reference kernel
(reference: kernels/matern.py:9-265).  Same math:

    k(r)  = variance * 2^{1-nu}/Gamma(nu) (sqrt(2 nu) r / l)^nu
            * K_nu(sqrt(2 nu) r / l)
    S(xi) = variance * (2 sqrt(pi))^d Gamma(nu + d/2) (2 nu)^nu
            / (Gamma(nu) l^(2 nu)) * (2 nu / l^2 + 4 pi^2 |xi|^2)^-(nu + d/2)

The reference's generic-nu path calls scipy Bessel K_nu on the host
(matern.py:72-98); here K_nu is evaluated in pure JAX from its integral
representations (:mod:`gpquad.kernels.bessel`), accurate to ~1e-12 in
log K, so the generic path jits and differentiates like everything else.
The spectral density/grad are closed forms for every nu.
"""
from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp

from .base import AbstractKernel, kernel_dataclass
from .bessel import log_matern_profile


@kernel_dataclass
class Matern(AbstractKernel):
    lengthscale: jnp.ndarray = 1.0
    variance: jnp.ndarray = 1.0
    dimension: int = dataclasses.field(default=1, metadata={"static": True})
    nu: float = dataclasses.field(default=2.5, metadata={"static": True})

    hyper_names = ("lengthscale", "variance")

    def __post_init__(self):
        if not float(self.nu) > 0.0:
            raise ValueError("Matérn nu must be positive.")

    # ------------------------------------------------------------------
    def kernel(self, distance):
        """Matérn values: closed forms for nu in {1/2, 3/2, 5/2}
        (reference matern.py:53-69), Bessel-K profile otherwise
        (reference matern.py:72-98)."""
        s = jnp.abs(distance) / self.lengthscale
        if self.nu == 0.5:
            return self.variance * jnp.exp(-s)
        if self.nu == 1.5:
            r3 = math.sqrt(3.0)
            return self.variance * (1.0 + r3 * s) * jnp.exp(-r3 * s)
        if self.nu == 2.5:
            r5 = math.sqrt(5.0)
            return (self.variance
                    * (1.0 + r5 * s + (5.0 / 3.0) * s * s)
                    * jnp.exp(-r5 * s))
        nu = float(self.nu)
        return self.variance * jnp.exp(
            log_matern_profile(nu, math.sqrt(2.0 * nu) * s))

    def spectral_density(self, xi):
        """S(xi) — reference matern.py:100-123."""
        xi = xi[..., None] if xi.ndim == 1 else xi
        nsq = jnp.sum(xi * xi, axis=-1)
        d, nu = self.dimension, self.nu
        l = self.lengthscale
        scaling = ((2.0 * math.sqrt(math.pi)) ** d
                   * math.gamma(nu + d / 2.0)
                   * (2.0 * nu) ** nu
                   / math.gamma(nu)) / l ** (2.0 * nu)
        base = 2.0 * nu / (l * l) + 4.0 * jnp.pi**2 * nsq
        return self.variance * scaling * base ** (-(nu + d / 2.0))

    def spectral_grad(self, xi):
        """[dS/dl, dS/dvariance], shape (n, 2) — reference matern.py:125-168."""
        xi = xi[..., None] if xi.ndim == 1 else xi
        nsq = jnp.sum(xi * xi, axis=-1)
        d, nu = self.dimension, self.nu
        l = self.lengthscale
        S = self.spectral_density(xi)
        dv = S / self.variance
        denom = 2.0 * nu / (l * l) + 4.0 * jnp.pi**2 * nsq
        power = -(nu + d / 2.0)
        exponent_grad = power * (-4.0 * nu / l**3) / denom
        dl = S * (-2.0 * nu / l + exponent_grad)
        return jnp.stack([dl, dv], axis=-1)
