"""The eps knob: accuracy vs grid size, d=1 and d=2.

Script form of the reference's "Other Tests and Sanity Checks/
epsilon_tests.ipynb": sweep the quadrature tolerance eps, fit the same
data at each setting, and record the posterior-mean error against a dense
vanilla-GP oracle together with the planned grid size mtot^d.  The point
of the study: eps is a *certified* knob — the observed error tracks the
requested tolerance until it hits the arithmetic floor (f32 on TPU, f64
here on CPU), while cost grows like the node count.

Run: ``python examples/epsilon_study.py [--cpu]``
"""
import argparse
import sys
import time
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
    import gpquad
    from gpquad.kernels import SquaredExponential

    dtype = jnp.float64 if args.cpu else jnp.float32
    floor = 5e-7 if args.cpu else 5e-4   # arithmetic floor of the backend
    rng = np.random.default_rng(3)

    for d in (1, 2):
        n, n_test = 2000, 500
        x = rng.uniform(0, 1, size=(n, d))
        xq = rng.uniform(0, 1, size=(n_test, d))
        f = np.sin(5 * x[:, 0]) * np.cos(3 * x[:, -1])
        y = f + 0.1 * rng.normal(size=n)
        ell, sigmasq = 0.2, 0.01
        kern = SquaredExponential(lengthscale=ell, variance=1.0, dimension=d)

        # dense vanilla-GP oracle (float64 regardless of backend dtype)
        kern64 = SquaredExponential(lengthscale=ell, variance=1.0,
                                    dimension=d)
        K = np.asarray(kern64.kernel_matrix(jnp.asarray(x), jnp.asarray(x)),
                       np.float64)
        Ks = np.asarray(kern64.kernel_matrix(jnp.asarray(xq),
                                             jnp.asarray(x)), np.float64)
        mean_dense = Ks @ np.linalg.solve(K + sigmasq * np.eye(n), y)

        xj = jnp.asarray(x, dtype)
        yj = jnp.asarray(y, dtype)
        xqj = jnp.asarray(xq, dtype)

        print(f"== d={d}, n={n}: posterior-mean error vs dense oracle ==")
        print(f"{'eps':>8} {'mtot^d':>8} {'max err':>10} {'fit+pred s':>10}")
        errs = {}
        for eps in (1e-2, 1e-3, 1e-4, 1e-5, 1e-6):
            t0 = time.time()
            state = gpquad.fit(xj, yj, kern, sigmasq, eps=eps, cg_tol=1e-10)
            mean = np.asarray(gpquad.predict_mean(state, xqj), np.float64)
            dt = time.time() - t0
            err = np.abs(mean - mean_dense).max()
            errs[eps] = err
            print(f"{eps:8.0e} {state.mtot**d:8d} {err:10.2e} {dt:10.2f}")
        # certified: each decade of eps buys about a decade of error
        # until the arithmetic floor
        assert errs[1e-2] > errs[1e-4] > max(errs[1e-6], floor / 5), errs
        assert errs[1e-6] < max(50 * 1e-6, floor), errs
        print()
    print("PASS: epsilon study")


if __name__ == "__main__":
    main()
