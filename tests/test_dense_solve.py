"""Dense Gram factor-solve tests (ops/dense_solve.py).

The dense solver is a TPU-first replacement for the reference's
always-iterative CG (reference cg.py:5-261): for the small-M EFGP Gram it
must agree with (a) the FFT Toeplitz operator it densifies, (b) the CG
solver it replaces, and (c) the dense f64 oracle of the same objective.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import (fit_with_grid, predict_mean, predict_var,
                                quadrature_weights, tensor_grid)
from gpquad.models.gradient import gradient_with_grid
from gpquad.ops.cg import pcg
from gpquad.ops.dense_solve import (dense_gram, dense_inverse,
                                    dense_toeplitz, refine_solve)
from gpquad.ops.operators import convolution_vector, make_A_mean
from gpquad.ops.toeplitz import make_toeplitz

from .test_efgp import make_data


@pytest.mark.parametrize("d,mtot", [(1, 9), (2, 7), (3, 5)])
def test_dense_toeplitz_matches_fft_operator(rng, d, mtot):
    n = 200
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    h = jnp.asarray(0.4)
    m = (mtot - 1) // 2
    v = convolution_vector(m, x, h)
    T_dense = dense_toeplitz(v, mtot, d)
    toe = make_toeplitz(v)
    M = mtot ** d
    z = jnp.asarray(rng.normal(size=M) + 1j * rng.normal(size=M))
    np.testing.assert_allclose(np.asarray(T_dense @ z), np.asarray(toe(z)),
                               rtol=1e-9, atol=1e-9)


def test_refine_solve_matches_cg(rng):
    n, d, mtot = 300, 2, 7
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    h = jnp.asarray(0.5)
    m = (mtot - 1) // 2
    kernel = SquaredExponential(lengthscale=0.2, variance=1.0, dimension=d)
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=x.dtype) * h, d)
    ws = quadrature_weights(kernel, xis, h, d)
    v = convolution_vector(m, x, h)
    sigmasq = 0.1
    A = dense_gram(ws, v, mtot, d, sigmasq)
    P = dense_inverse(A)
    M = mtot ** d
    b = jnp.asarray(rng.normal(size=(3, M)) + 1j * rng.normal(size=(3, M)))
    res = refine_solve(A, P, b, tol=1e-10)
    toe = make_toeplitz(v)
    res_cg = pcg(make_A_mean(ws, toe, sigmasq), b, tol=1e-13, maxiter=4000)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(res_cg.x),
                               rtol=1e-7, atol=1e-9)
    assert bool(np.all(np.asarray(res.converged)))
    # scaled operator: A_var = A / sigma^2
    res_v = refine_solve(A, P, b, scale=1.0 / sigmasq, tol=1e-10)
    x_direct = jnp.linalg.solve(A / sigmasq, b.T).T
    np.testing.assert_allclose(np.asarray(res_v.x), np.asarray(x_direct),
                               rtol=1e-7, atol=1e-9)


def test_fit_dense_equals_fit_cg(rng):
    x, y = make_data(rng, n=150, d=2, lengthscale=0.3)
    kernel = SquaredExponential(lengthscale=0.3, variance=2.0, dimension=2)
    h, mtot = jnp.asarray(0.45), 9
    st_d = fit_with_grid(x, y, kernel, 0.2, h, mtot, solver="dense")
    st_c = fit_with_grid(x, y, kernel, 0.2, h, mtot, solver="cg",
                         cg_tol=1e-12, max_cg_iter=4000)
    assert st_d.P_dense is not None and st_c.P_dense is None
    np.testing.assert_allclose(np.asarray(st_d.beta), np.asarray(st_c.beta),
                               rtol=1e-6, atol=1e-10)
    xnew = jnp.asarray(rng.uniform(0.1, 0.9, (40, 2)))
    np.testing.assert_allclose(np.asarray(predict_mean(st_d, xnew)),
                               np.asarray(predict_mean(st_c, xnew)),
                               rtol=1e-6, atol=1e-8)
    # variance paths reuse the dense inverse
    v_d = predict_var(st_d, xnew, method="regular", cg_tol=1e-10)
    v_c = predict_var(st_c, xnew, method="regular", cg_tol=1e-12,
                      max_cg_iter=4000)
    np.testing.assert_allclose(np.asarray(v_d), np.asarray(v_c),
                               rtol=1e-5, atol=1e-9)
    key = jax.random.PRNGKey(3)
    s_d = predict_var(st_d, xnew, method="stochastic", key=key, probes=64)
    s_c = predict_var(st_c, xnew, method="stochastic", key=key, probes=64,
                      cg_tol=1e-12, max_cg_iter=4000)
    np.testing.assert_allclose(np.asarray(s_d), np.asarray(s_c),
                               rtol=1e-5, atol=1e-8)


def test_gradient_dense_equals_cg_same_probes(rng):
    x, y = make_data(rng, n=130, d=1, lengthscale=0.25)
    kernel = SquaredExponential(lengthscale=0.25, variance=1.5, dimension=1)
    h, mtot = jnp.asarray(0.3), 11
    T, n, M = 6, 130, 11
    Z = jnp.asarray(rng.integers(0, 2, (T, n)) * 2 - 1, dtype=x.dtype)
    V = jnp.asarray(rng.integers(0, 2, (T, M)) * 2 - 1, dtype=x.dtype)
    key = jax.random.PRNGKey(0)
    g_d = gradient_with_grid(x, y, kernel, 0.15, h, key, mtot=mtot,
                             trace_samples=T, probes=(Z, V), solver="dense")
    g_c = gradient_with_grid(x, y, kernel, 0.15, h, key, mtot=mtot,
                             trace_samples=T, probes=(Z, V), solver="cg",
                             cg_tol=1e-12, max_cg_iter=4000)
    np.testing.assert_allclose(np.asarray(g_d.grad), np.asarray(g_c.grad),
                               rtol=1e-5, atol=1e-8)


def test_auto_solver_threshold():
    from gpquad.models.efgp import resolve_solver
    assert resolve_solver("auto", 29, 2) == "dense"    # M = 841
    assert resolve_solver("auto", 29, 3) == "cg"       # M = 24389
    assert resolve_solver("dense", 99, 3) == "dense"   # explicit override
    with pytest.raises(ValueError):
        resolve_solver("lu", 9, 1)
