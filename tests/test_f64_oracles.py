"""Same-probe f64 oracle replicas (utils/f64_oracles.py) must match the
device estimators bit-for-algebra: on the CPU x64 backend with tight CG
tolerances and identical probes, device and replica agree to ~1e-8."""
import jax
import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_var
from gpquad.models.gradient import gradient_with_grid
from gpquad.utils.f64_oracles import (efgp_f64_objects, gradient_f64,
                                      stochastic_var_f64)


def _setup(rng):
    n, d, mtot, h, sigmasq, ell, var = 1500, 2, 7, 0.31, 0.05, 0.25, 1.3
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float64)
    y = jnp.asarray(rng.normal(size=n), jnp.float64)
    kernel = SquaredExponential(lengthscale=jnp.float64(ell),
                                variance=jnp.float64(var), dimension=d)
    obj = efgp_f64_objects(np.asarray(x), np.asarray(y), ell, var,
                           sigmasq, h, mtot)
    return x, y, kernel, obj, n, d, mtot, h, sigmasq


def test_gradient_replica_matches_device(rng):
    x, y, kernel, obj, n, d, mtot, h, sigmasq = _setup(rng)
    T, M = 4, mtot ** d
    Z = (rng.integers(0, 2, (T, n)) * 2 - 1).astype(np.float64)
    V = (rng.integers(0, 2, (T, M)) * 2 - 1).astype(np.float64)
    gres = gradient_with_grid(
        x, y, kernel, jnp.float64(sigmasq), jnp.float64(h),
        jax.random.PRNGKey(0), mtot=mtot, trace_samples=T, cg_tol=1e-12,
        max_cg_iter=4000, probes=(jnp.asarray(Z), jnp.asarray(V)),
        solver="cg")
    g64 = gradient_f64(obj, Z, V)
    rel = np.max(np.abs(np.asarray(gres.grad) - g64)
                 / np.maximum(np.abs(g64), 1e-10))
    assert rel < 1e-7


def test_stochastic_var_replica_matches_device(rng):
    x, y, kernel, obj, n, d, mtot, h, sigmasq = _setup(rng)
    M = mtot ** d
    etas = (rng.integers(0, 2, (16, M)) * 2 - 1).astype(np.float64)
    xt = rng.uniform(0.1, 0.9, (60, d))
    st = fit_with_grid(x, y, kernel, jnp.float64(sigmasq), jnp.float64(h),
                       mtot, cg_tol=1e-12, solver="cg")
    v_dev = predict_var(st, jnp.asarray(xt), method="stochastic",
                        key=jax.random.PRNGKey(0), probes=16,
                        cg_tol=1e-12, max_cg_iter=4000,
                        etas=jnp.asarray(etas))
    v64 = stochastic_var_f64(obj, etas, xt)
    rel = np.max(np.abs(np.asarray(v_dev) - v64)
                 / np.maximum(np.abs(v64), 1e-12))
    assert rel < 1e-8
