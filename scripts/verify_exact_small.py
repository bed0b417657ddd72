"""Dense verification of the stochastic hyper-gradient on small problems.

Port of the reference's ``verify_efgpnd_exact_small.py:57-317``: the fast
estimator is compared probe-for-probe against a dense replication of the
same algebra across three regimes (tight CG, loose CG, preconditioner off).
Run: ``python scripts/verify_exact_small.py``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.gradient import gradient
from gpquad.quadrature import spectral_grid
from gpquad.utils.loaders import load_synthetic_gp
from tests.test_gradient import _dense_same_probe_gradient


def run_regime(name, x, y, kernel, sigmasq, eps, cg_tol, precond, rng,
               trace_samples=4):
    n = x.shape[0]
    L = float(np.max(np.asarray(x).max(0) - np.asarray(x).min(0)))
    _, h, mtot = spectral_grid(kernel, eps, L)
    M = mtot ** x.shape[1]
    Z = jnp.asarray(rng.integers(0, 2, (trace_samples, n)) * 2 - 1,
                    dtype=jnp.float64)
    V = jnp.asarray(rng.integers(0, 2, (trace_samples, M)) * 2 - 1,
                    dtype=jnp.float64)
    res = gradient(x, y, kernel, sigmasq, eps, jax.random.PRNGKey(0),
                   trace_samples=trace_samples, cg_tol=cg_tol,
                   probes=(Z, V), use_mean_precond=precond,
                   use_trace_precond=precond)
    want = _dense_same_probe_gradient(kernel, x, y, sigmasq, eps, Z, V)
    got = np.asarray(res.grad)
    err = np.max(np.abs(got - want) / (np.abs(want) + 1e-12))
    print(f"[{name:>12}] grad={np.array2string(got, precision=4)} "
          f"dense={np.array2string(want, precision=4)} "
          f"max rel err={err:.3e} "
          f"(mean_cg={int(res.mean_cg_iters)}, trace_cg={int(res.trace_cg_iters)})")
    return err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    # stands in for the usa_temp subsets the reference uses
    xh, yh = load_synthetic_gp(n=args.n, d=2, lengthscale=0.3, variance=1.0,
                               noise=0.1, seed=0, spectral=False)
    x, y = jnp.asarray(xh), jnp.asarray(yh)
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)

    e1 = run_regime("tight-cg", x, y, kernel, 0.1, 1e-3, 1e-12, True, rng)
    e2 = run_regime("loose-cg", x, y, kernel, 0.1, 1e-3, 1e-2, True, rng)
    e3 = run_regime("no-precond", x, y, kernel, 0.1, 1e-3, 1e-12, False, rng)

    ok = e1 < 1e-6 and e3 < 1e-6 and e2 < 1.0
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
