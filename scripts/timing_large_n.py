"""Large-n scale demonstration (reference parity: test_timing_profiling.py
runs its learning loop at n=1e6; here the full fit + predict + gradient
runs at n=1e6 on one chip, with both NUFFT backends).

Run: ``python scripts/timing_large_n.py [--n 1000000]``
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--lengthscale", type=float, default=0.05)
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import fit_with_grid, predict_mean
    from gpquad.models.gradient import gradient_with_grid
    from gpquad.quadrature import spectral_grid

    rng = np.random.default_rng(0)
    n = args.n
    xh = rng.uniform(0, 1, (n, 2))
    yh = (np.sin(4 * np.pi * xh[:, 0]) * np.cos(3 * np.pi * xh[:, 1])
          + 0.1 * rng.normal(size=n))
    x = jnp.asarray(xh, jnp.float32)
    y = jnp.asarray(yh, jnp.float32)
    xt = jnp.asarray(rng.uniform(0, 1, (10000, 2)), jnp.float32)
    kern = SquaredExponential(lengthscale=jnp.float32(args.lengthscale),
                              variance=jnp.float32(1.0), dimension=2)
    _, h, mtot = spectral_grid(kern, args.eps, 1.0)
    print(f"n={n} mtot={mtot} M={mtot**2}")

    def sync(t):
        return float(jnp.sum(jnp.abs(jnp.real(t))))

    for method in ("mxu", "pallas"):
        try:
            st = fit_with_grid(x, y, kern, 0.01, h, mtot, cg_tol=1e-5,
                               max_cg_iter=600, nufft_method=method)
            sync(st.beta)
            t0 = time.time()
            st = fit_with_grid(x, y, kern, 0.01, h, mtot, cg_tol=1e-5,
                               max_cg_iter=600, nufft_method=method)
            sync(st.beta)
            dt = time.time() - t0
            print(f"fit[{method:>6}]: {dt:.3f}s "
                  f"(mean_cg_iters={int(st.mean_cg_iters)})")
        except Exception as e:
            print(f"fit[{method}] failed: {str(e)[:100]}")

    mean = predict_mean(st, xt); sync(mean)
    t0 = time.time(); mean = predict_mean(st, xt); sync(mean)
    print(f"predict_mean 10k targets: {time.time()-t0:.3f}s")

    key = jax.random.PRNGKey(0)
    g = gradient_with_grid(x, y, kern, 0.01, h, key, mtot=mtot,
                           trace_samples=10, cg_tol=1e-4, max_cg_iter=600)
    sync(g.grad)
    t0 = time.time()
    g = gradient_with_grid(x, y, kern, 0.01, h, key, mtot=mtot,
                           trace_samples=10, cg_tol=1e-4, max_cg_iter=600)
    sync(g.grad)
    print(f"hyper-gradient (10 probes): {time.time()-t0:.3f}s "
          f"grad={np.asarray(g.grad)}")


if __name__ == "__main__":
    main()
# Recorded results (TPU v5e, f32):
#   n=1e6 mtot=49:  fit[mxu] 77 ms, fit[pallas] 46 ms, predict 10k 37 ms,
#                   10-probe hyper-gradient 158 ms
#   n=5e5 mtot=475 (M=225k): warm fit 0.3 s (pallas), predict 5k 40 ms
#   n=1e6 mtot=1601 (M=2.5M): tiled-pallas type-1 apply 1.0 s,
#                              banded-spread type-1 0.35 s / type-2 0.81 s
#   n=1e6 hyper-learning (EFGP facade, pallas backend): 10 Adam iters in
#                              31 s incl. compiles; lengthscale/noise
#                              recovered to ~30%
