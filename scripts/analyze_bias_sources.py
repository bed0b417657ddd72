"""Decompose EFGP bias: aliasing (coarse h) vs truncation (cutoff) vs CG tol.

Port of the reference's ``analyze_efgpnd_bias_sources.py``: sweep each
lever independently on a small problem with a dense vanilla-GP anchor.
Run: ``python scripts/analyze_bias_sources.py``
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
from gpquad.models.efgp import fit_with_grid, predict_mean
from gpquad.quadrature import spectral_grid
from gpquad.utils.loaders import load_synthetic_gp


def dense_mean(kernel, x, y, sigmasq, xnew):
    K = np.asarray(kernel.kernel_matrix(x, x))
    Ks = np.asarray(kernel.kernel_matrix(xnew, x))
    return Ks @ np.linalg.solve(K + sigmasq * np.eye(len(np.asarray(y))),
                                np.asarray(y))


def main():
    rng = np.random.default_rng(0)
    xh, yh = load_synthetic_gp(n=400, d=1, lengthscale=0.2, variance=1.0,
                               noise=0.05, seed=0, spectral=False)
    x, y = jnp.asarray(xh), jnp.asarray(yh)
    kernel = SquaredExponential(lengthscale=0.2, variance=1.0, dimension=1)
    sigmasq = 0.05
    xnew = jnp.linspace(0.05, 0.95, 100)[:, None]
    anchor = dense_mean(kernel, x, y, sigmasq, xnew)
    scale = np.max(np.abs(anchor))

    _, h0, mtot0 = spectral_grid(kernel, 1e-8, 1.0)
    m0 = (mtot0 - 1) // 2

    def err(h, mtot, cg_tol):
        st = fit_with_grid(x, y, kernel, sigmasq, h, mtot, cg_tol=cg_tol)
        mean = np.asarray(predict_mean(st, xnew))
        return np.max(np.abs(mean - anchor)) / scale

    print(f"anchor grid: h={h0:.4f}, mtot={mtot0}")
    print(f"{'lever':>24} {'setting':>12} {'max rel err':>12}")
    base = err(h0, mtot0, 1e-12)
    print(f"{'baseline (tight all)':>24} {'-':>12} {base:12.3e}")

    # aliasing: coarsen h while keeping the same frequency cutoff
    for factor in (1.5, 2.0, 3.0):
        h = h0 * factor
        mtot = 2 * int(np.ceil(m0 / factor)) + 1
        print(f"{'aliasing (h x)':>24} {factor:>12} "
              f"{err(h, mtot, 1e-12):12.3e}")

    # truncation: keep h, shrink the cutoff
    for frac in (0.75, 0.5, 0.25):
        mtot = 2 * int(m0 * frac) + 1
        print(f"{'truncation (m x)':>24} {frac:>12} "
              f"{err(h0, mtot, 1e-12):12.3e}")

    # CG tolerance
    for tol in (1e-2, 1e-4, 1e-8):
        print(f"{'cg tolerance':>24} {tol:>12} "
              f"{err(h0, mtot0, tol):12.3e}")


if __name__ == "__main__":
    main()
