"""Exploring the Fourier quadrature rule: nodes, spacing, and truncation.

Script form of the reference's scratch/explore_kernels.ipynb: call the
grid planner (reference get_xis, utils/kernels.py:72-143) for SE and
Matern kernels at several tolerances, inspect the node grid (spacing h,
count mtot, frequency cutoff), compare the integral-method plan against
the closed-form heuristic, and check the planned rule actually delivers:
the quadrature-reconstructed kernel matches the analytic kernel to eps.

Run: ``python examples/quadrature_nodes.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import Matern, SquaredExponential
    from gpquad.quadrature import spectral_grid

    dtype = jnp.float64 if args.cpu else jnp.float32
    L = 1.0      # domain extent (normalized inputs)

    print("== grid plans: node spacing h, count mtot, cutoff h*(mtot-1)/2 ==")
    kernels = {
        "SE   l=0.10": SquaredExponential(lengthscale=0.10, variance=1.0,
                                          dimension=1),
        "SE   l=0.02": SquaredExponential(lengthscale=0.02, variance=1.0,
                                          dimension=1),
        "Mat32 l=0.10": Matern(lengthscale=0.10, variance=1.0, nu=1.5,
                               dimension=1),
        "Mat52 l=0.10": Matern(lengthscale=0.10, variance=1.0, nu=2.5,
                               dimension=1),
    }
    for eps in (1e-2, 1e-4, 1e-6):
        for tag, kern in kernels.items():
            xis, h, mtot = spectral_grid(kern, eps, L)
            cutoff = float(h) * (mtot - 1) / 2
            print(f"eps={eps:7.0e} {tag}: h={float(h):.4f} mtot={mtot:5d} "
                  f"cutoff={cutoff:8.2f}")
        print()

    print("== integral method vs closed-form heuristic (SE l=0.1) ==")
    kern = kernels["SE   l=0.10"]
    for eps in (1e-3, 1e-5):
        _, hi, mi = spectral_grid(kern, eps, L, use_integral=True)
        _, hh, mh = spectral_grid(kern, eps, L, use_integral=False)
        print(f"eps={eps:.0e}: integral h={float(hi):.4f} mtot={mi}"
              f" | heuristic h={float(hh):.4f} mtot={mh}")

    # Matern tails are heavy: the same eps needs far more nodes
    print("\n== spectral density mass at the nodes (eps=1e-4) ==")
    for tag in ("SE   l=0.10", "Mat32 l=0.10"):
        kern = kernels[tag]
        xis, h, mtot = spectral_grid(kern, 1e-4, L)
        S = np.asarray(kern.spectral_density(jnp.asarray(xis)[:, None]))
        total = S.sum() * float(h)
        tail = S[-1] / S.max()
        print(f"{tag}: mtot={mtot}, sum S*h = {total:.6f} "
              f"(~sigma_f^2), edge/peak = {tail:.1e}")

    print("\n== does the planned rule deliver eps? kernel reconstruction ==")
    # K(r) ~= sum_j S(xi_j) h exp(2 pi i xi_j r): trapezoid rule on the
    # spectral representation (reference efgpnd.py:336-357 identity).
    r = np.linspace(0, 0.5, 201)
    for tag, kern in kernels.items():
        for eps in (1e-3, 1e-6):
            xis, h, mtot = spectral_grid(kern, eps, L)
            xis = np.asarray(xis, np.float64)
            S = np.asarray(kern.spectral_density(
                jnp.asarray(xis, dtype)[:, None]), np.float64)
            K_quad = (S[None, :] * np.cos(2 * np.pi * r[:, None] * xis)
                      ).sum(1) * float(h)
            K_true = np.asarray(kern.kernel(jnp.asarray(r, dtype)),
                                np.float64)
            err = np.abs(K_quad - K_true).max()
            # Matern truncation error decays polynomially; the planner
            # targets the aliasing+truncation budget, allow a small factor
            print(f"{tag} eps={eps:.0e}: max |K_quad - K| = {err:.2e}")
            assert err < 20 * eps, (tag, eps, err)
    print("PASS: quadrature nodes walkthrough")


if __name__ == "__main__":
    main()
