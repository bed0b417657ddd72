"""Deflation (dense-head + Jacobi-tail) preconditioner tests.

The reference only ever runs the diagonal ``c|w|^2 + sigma^2`` family
(reference create_jacobi_precond, efgpnd.py:1619-1631); ops/deflation.py
is the TPU-first upgrade: dense-solve the top-k weight modes on the MXU,
Jacobi on the tail.  These tests pin (a) the gathered head block equals
the dense Gram's principal submatrix, (b) preconditioned CG converges to
the same solution with materially fewer iterations, (c) fit / variance /
gradient / df64-IR paths all accept and benefit from ``precond_rank``.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import (_cdtype, fit_with_grid, predict_var,
                                quadrature_weights, tensor_grid)
from gpquad.ops.cg import pcg
from gpquad.ops.deflation import deflation_block, make_block_precond
from gpquad.ops.dense_solve import dense_gram
from gpquad.ops.nufft import make_nufft
from gpquad.ops.operators import (convolution_vector, make_A_mean,
                                  make_jacobi_precond)
from gpquad.ops.toeplitz import make_toeplitz, toeplitz_diag_scale


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _setup(rng, n=4000, d=2, ell=0.08, sigmasq=0.01, mtot=25):
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.asarray(np.sin(5 * np.asarray(x[:, 0]))
                    + 0.1 * rng.normal(size=n))
    kern = SquaredExponential(lengthscale=ell, variance=1.0, dimension=d)
    h = jnp.asarray(1.0 / (ell * mtot))
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=x.dtype) * h, d)
    ws = quadrature_weights(kern, xis, h, d)
    v = convolution_vector(m, x, h)
    return x, y, kern, h, ws, v, sigmasq, mtot, d


def test_head_block_matches_dense_gram(rng):
    x, y, kern, h, ws, v, sigmasq, mtot, d = _setup(rng, n=800, mtot=9)
    k = 20
    idx, P_BB = deflation_block(ws, v, sigmasq, mtot=mtot, d=d, rank=k)
    A = dense_gram(ws, v, mtot, d, sigmasq)
    A_BB = np.asarray(A)[np.asarray(idx)][:, np.asarray(idx)]
    # P_BB inverts exactly the gathered principal submatrix
    assert np.allclose(np.asarray(P_BB) @ A_BB, np.eye(k),
                       atol=1e-7 * np.abs(A_BB).max())
    # the selected modes are the top-k weights
    order = np.argsort(-np.abs(np.asarray(ws)) ** 2, kind="stable")
    assert set(np.asarray(idx).tolist()) == set(order[:k].tolist())


def test_deflated_cg_same_solution_fewer_iters(rng):
    x, y, kern, h, ws, v, sigmasq, mtot, d = _setup(rng, n=4000,
                                                    ell=0.05, mtot=33)
    nufft = make_nufft(x, h, mtot, cdtype=ws.dtype)
    rhs = ws * nufft.type1(y.astype(ws.dtype)).reshape(-1)
    toe = make_toeplitz(v)
    A = make_A_mean(ws, toe, sigmasq)
    ds = toeplitz_diag_scale(v)
    jac = make_jacobi_precond(ws, sigmasq, diag_scale=ds)
    res_j = pcg(A, rhs, tol=1e-10, maxiter=4000, M_inv=jac)
    idx, P_BB = deflation_block(ws, v, sigmasq, mtot=mtot, d=d, rank=256)
    defl = make_block_precond(idx, P_BB, ds * jnp.abs(ws) ** 2 + sigmasq)
    res_d = pcg(A, rhs, tol=1e-10, maxiter=4000, M_inv=defl)
    assert bool(res_d.converged)
    scale = float(jnp.max(jnp.abs(res_j.x)))
    assert float(jnp.max(jnp.abs(res_d.x - res_j.x))) < 1e-6 * scale
    assert int(res_d.iters) < 0.6 * int(res_j.iters), \
        (int(res_d.iters), int(res_j.iters))


def test_fit_with_grid_precond_rank(rng):
    x, y, kern, h, ws, v, sigmasq, mtot, d = _setup(rng, n=4000,
                                                    ell=0.05, mtot=33)
    st0 = fit_with_grid(x, y, kern, sigmasq, h, mtot, cg_tol=1e-8,
                        max_cg_iter=4000, solver="cg")
    st1 = fit_with_grid(x, y, kern, sigmasq, h, mtot, cg_tol=1e-8,
                        max_cg_iter=4000, solver="cg", precond_rank=256)
    assert st1.defl_P is not None and st1.defl_idx is not None
    scale = float(jnp.max(jnp.abs(st0.beta)))
    assert float(jnp.max(jnp.abs(st1.beta - st0.beta))) < 1e-5 * scale
    assert int(st1.mean_cg_iters) < int(st0.mean_cg_iters)
    # variance path reuses the block and agrees with the Jacobi-CG path
    xn = jnp.asarray(rng.uniform(0.2, 0.8, (16, d)))
    key = jax.random.PRNGKey(0)
    v0 = predict_var(st0, xn, method="regular", cg_tol=1e-8)
    v1 = predict_var(st1, xn, method="regular", cg_tol=1e-8)
    assert np.allclose(np.asarray(v1), np.asarray(v0), rtol=1e-4, atol=1e-10)


def test_gradient_precond_rank(rng):
    from gpquad.models.gradient import gradient_with_grid
    x, y, kern, h, ws, v, sigmasq, mtot, d = _setup(rng, n=3000,
                                                    ell=0.05, mtot=33)
    key = jax.random.PRNGKey(1)
    g0 = gradient_with_grid(x, y, kern, sigmasq, h, key, mtot=mtot,
                            trace_samples=4, cg_tol=1e-8,
                            max_cg_iter=4000, solver="cg")
    g1 = gradient_with_grid(x, y, kern, sigmasq, h, key, mtot=mtot,
                            trace_samples=4, cg_tol=1e-8,
                            max_cg_iter=4000, solver="cg", precond_rank=256)
    assert np.allclose(np.asarray(g1.grad), np.asarray(g0.grad),
                       rtol=1e-4, atol=1e-8)
    assert int(g1.mean_cg_iters) < int(g0.mean_cg_iters)
    assert int(g1.trace_cg_iters) < int(g0.trace_cg_iters)


def test_fit_high_iterative_precond_rank(rng):
    from gpquad.models.precision import fit_high, predict_mean_high
    x, y, kern, h, ws, v, sigmasq, mtot, d = _setup(rng, n=3000,
                                                    ell=0.05, mtot=33)
    xn = jnp.asarray(rng.uniform(0.2, 0.8, (32, d)))
    hs0 = fit_high(x, y, kern, sigmasq, float(h), mtot, solver="iterative")
    hs1 = fit_high(x, y, kern, sigmasq, float(h), mtot, solver="iterative",
                   precond_rank=256)
    m0 = np.asarray(predict_mean_high(hs0, xn))
    m1 = np.asarray(predict_mean_high(hs1, xn))
    assert np.allclose(m1, m0, rtol=1e-8, atol=1e-10)
    assert int(hs1.state.mean_cg_iters) < int(hs0.state.mean_cg_iters)


def test_deflation_with_bucketed_mask(rng):
    """Deflation composes with bucketed grids: masked (zero-weight) nodes
    never enter the head block, and the deflated gradient equals the
    Jacobi gradient on the same masked grid (the fused hyper-learning
    step uses exactly this combination)."""
    from gpquad.models.gradient import gradient_with_grid
    from gpquad.quadrature import bucket_mtot, flat_grid_mask
    n, d, ell, sigmasq = 3000, 2, 0.05, 0.01
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.asarray(np.sin(5 * np.asarray(x[:, 0]))
                    + 0.1 * rng.normal(size=n))
    kern = SquaredExponential(lengthscale=ell, variance=1.0, dimension=d)
    hm = 16
    mtot = bucket_mtot(2 * hm + 1)
    assert mtot > 2 * hm + 1          # real padding
    h = jnp.asarray(1.0 / (ell * mtot))
    mask = flat_grid_mask(mtot, d, hm, dtype=x.dtype)
    key = jax.random.PRNGKey(2)
    g0 = gradient_with_grid(x, y, kern, sigmasq, h, key, mtot=mtot,
                            trace_samples=4, cg_tol=1e-9,
                            max_cg_iter=4000, solver="cg", ws_mask=mask)
    g1 = gradient_with_grid(x, y, kern, sigmasq, h, key, mtot=mtot,
                            trace_samples=4, cg_tol=1e-9,
                            max_cg_iter=4000, solver="cg", ws_mask=mask,
                            precond_rank=200)
    assert np.allclose(np.asarray(g1.grad), np.asarray(g0.grad),
                       rtol=1e-4, atol=1e-8)
    assert int(g1.mean_cg_iters) <= int(g0.mean_cg_iters)
