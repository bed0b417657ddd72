"""Noise-variance trace estimators: feature-space (current) vs data-space.

Port of the reference's ``compare_sigma_noise_trace_methods.py`` and the
pathology documented in sigma_noise_trace_issue.md: the sigma^2 gradient
needs ``tr(C^-1)``.  Two matrix-free estimators:

  feature-space (the production path, reference efgpnd.py:195-206):
      tr(C^-1) = n/s2 - tr(A^-1 G)/s2, feature probes v:
      E[v^H A^-1 (D T D) v] / s2 with one batched CG on A;
  data-space (the alternative the reference evaluates):
      tr(C^-1) ~ E[z^T C^-1 z], data probes z, where
      C^-1 z = (z - F D A^-1 D F^H z)/s2 (Woodbury through the same CG).

Both are validated against the dense trace, and CG iteration tails are
compared in an ill-conditioned small-lengthscale regime.
Run: ``python scripts/compare_sigma_noise_trace_methods.py``
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
from gpquad.models.efgp import quadrature_weights, tensor_grid
from gpquad.ops.cg import pcg
from gpquad.ops.nufft import make_nufft
from gpquad.ops.operators import (convolution_vector, make_A_mean,
                                  make_jacobi_precond)
from gpquad.ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from gpquad.quadrature import spectral_grid
from gpquad.utils.loaders import load_synthetic_gp


def run_regime(name, lengthscale, sigmasq, n=400, T=64, tol=1e-8):
    rng = np.random.default_rng(0)
    xh, _ = load_synthetic_gp(n=n, d=2, lengthscale=lengthscale, seed=0)
    x = jnp.asarray(xh)
    kernel = SquaredExponential(lengthscale=lengthscale, variance=1.0,
                                dimension=2)
    _, h, mtot = spectral_grid(kernel, 1e-3, 1.0)
    d, m = 2, (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=jnp.float64) * h, d)
    ws = quadrature_weights(kernel, xis, jnp.asarray(h), d)
    nufft = make_nufft(x, h, mtot)
    v = convolution_vector(m, x, h)
    toe = make_toeplitz(v)
    A = make_A_mean(ws, toe, sigmasq)
    M_inv = make_jacobi_precond(ws, sigmasq,
                                diag_scale=toeplitz_diag_scale(v))
    Mdim = ws.shape[0]

    # dense truth
    F = np.exp(2j * np.pi * (xh @ np.asarray(xis).T))
    wsn = np.asarray(jnp.real(ws))
    C = np.real((F * (wsn**2)[None, :]) @ F.conj().T) + sigmasq * np.eye(n)
    truth = np.trace(np.linalg.inv(C))

    # feature-space estimator
    V = jnp.asarray(rng.integers(0, 2, (T, Mdim)) * 2.0 - 1)
    B = ws * toe(ws * V.astype(ws.dtype))
    res_f = pcg(A, B, tol=tol, maxiter=4 * Mdim, M_inv=M_inv)
    est_f = float(n / sigmasq - jnp.mean(
        jnp.sum(V.astype(ws.dtype).conj() * res_f.x, axis=1).real) / sigmasq)

    # data-space estimator
    Z = jnp.asarray(rng.integers(0, 2, (T, n)) * 2.0 - 1)
    FZ = ws * nufft.type1(Z.astype(ws.dtype)).reshape(T, -1)
    res_d = pcg(A, FZ, tol=tol, maxiter=4 * Mdim, M_inv=M_inv)
    alpha = (Z.astype(ws.dtype)
             - nufft.type2(ws[None, :] * res_d.x)) / sigmasq
    est_d = float(jnp.mean(jnp.sum(Z.astype(ws.dtype).conj() * alpha,
                                   axis=1).real))

    print(f"[{name}] tr(C^-1) dense={truth:.4f}  "
          f"feature={est_f:.4f} (err {abs(est_f-truth)/truth:.2%}, "
          f"cg iters max {int(jnp.max(res_f.conv_iters))})  "
          f"data={est_d:.4f} (err {abs(est_d-truth)/truth:.2%}, "
          f"cg iters max {int(jnp.max(res_d.conv_iters))})")


def main():
    run_regime("easy    l=0.30 s2=0.10", 0.30, 0.10)
    run_regime("hard    l=0.10 s2=0.01", 0.10, 0.01)
    run_regime("v.hard  l=0.05 s2=0.005", 0.05, 0.005)


if __name__ == "__main__":
    main()
