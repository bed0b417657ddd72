"""Dense verification of the signal-variance algebraic specialization.

Port of the reference's ``verify_sigma_variance_specialization.py``: the
gradient estimator never solves probe systems for sigma_f^2; it uses

  term2(sig_f^2) = (y.alpha - sigma^2 |alpha|^2) / sigma_f^2
  term1(sig_f^2) = (n - sigma^2 * term1(sigma^2)) / sigma_f^2

which follow from K = sigma_f^2 * K_unit => dK/dsig_f^2 = K/sig_f^2 and
tr(C^-1 K) = n - sigma^2 tr(C^-1).  This script checks both identities
against explicitly formed dense matrices.
Run: ``python scripts/verify_sigma_variance_specialization.py``
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import tensor_grid
from gpquad.quadrature import spectral_grid
from gpquad.utils.loaders import load_synthetic_gp


def main():
    rng = np.random.default_rng(0)
    n, sigmasq, variance = 80, 0.15, 1.7
    xh, yh = load_synthetic_gp(n=n, d=1, lengthscale=0.3, variance=variance,
                               noise=sigmasq, seed=0, spectral=False)
    kernel = SquaredExponential(lengthscale=0.3, variance=variance,
                                dimension=1)
    _, h, mtot = spectral_grid(kernel, 1e-4, 1.0)
    xis = tensor_grid(jnp.arange(-(mtot // 2), mtot // 2 + 1) * h, 1)
    F = np.exp(2j * np.pi * (xh @ np.asarray(xis).T))
    S = np.asarray(kernel.spectral_density(xis)) * h
    Dp = h * np.asarray(kernel.spectral_grad(xis))     # (M, 2)
    C = np.real((F * S[None, :]) @ F.conj().T) + sigmasq * np.eye(n)
    Cinv = np.linalg.inv(C)
    alpha = Cinv @ yh

    # term2 identity
    dC_var = np.real((F * Dp[:, 1][None, :]) @ F.conj().T)
    t2_direct = alpha @ dC_var @ alpha
    t2_special = (yh @ alpha - sigmasq * (alpha @ alpha)) / variance
    print(f"term2: direct={t2_direct:.10f}  specialized={t2_special:.10f}  "
          f"rel err={abs(t2_direct-t2_special)/abs(t2_direct):.2e}")

    # term1 identity
    t1_direct = np.trace(Cinv @ dC_var)
    t1_noise = np.trace(Cinv)
    t1_special = (n - sigmasq * t1_noise) / variance
    print(f"term1: direct={t1_direct:.10f}  specialized={t1_special:.10f}  "
          f"rel err={abs(t1_direct-t1_special)/abs(t1_direct):.2e}")

    ok = (abs(t2_direct - t2_special) / abs(t2_direct) < 1e-10
          and abs(t1_direct - t1_special) / abs(t1_direct) < 1e-10)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
