"""Kronecker eigen-preconditioner (ops/kron_precond.py).

The preconditioner never changes WHAT is solved (PCG with any Hermitian
PD M converges to the same solution), so the tests certify (a) the
operator identities the construction relies on, (b) Hermitian positive
definiteness of the apply, and (c) the measured iteration-count win over
Jacobi that justifies its existence (VERDICT r4 #1: the n=1e6 variance
wall was ~500 deflated iterations per probe batch).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import (fit_with_grid, predict_mean, predict_var,
                                quadrature_weights, tensor_grid)
from gpquad.ops.cg import pcg
from gpquad.ops.kron_precond import kron_eig_build, make_kron_precond
from gpquad.ops.nufft import make_nufft
from gpquad.ops.operators import convolution_vector, make_A_mean
from gpquad.ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from gpquad.quadrature import spectral_grid


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _gram_pieces(rng, n, d, ell, eps):
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    kern = SquaredExponential(lengthscale=jnp.asarray(ell),
                              variance=jnp.asarray(1.0), dimension=d)
    _, h, mtot = spectral_grid(kern, eps, 1.0)
    mtot = int(mtot)
    h = jnp.asarray(h, x.dtype)
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=x.dtype) * h, d)
    ws = quadrature_weights(kern, xis, h, d)
    v = convolution_vector(m, x, h)
    return x, kern, h, mtot, ws, v


def test_marginal_toeplitz_slices_match_direct_marginals(rng):
    """The d-dim lag table's axis slices ARE the 1-D marginal Grams:
    v[l1, 0] = sum_n exp(2 pi i h l1 x_n1)."""
    x, kern, h, mtot, ws, v = _gram_pieces(rng, 500, 2, 0.25, 1e-4)
    L = 2 * mtot - 1
    vg = np.asarray(v).reshape(L, L)
    lags = np.arange(-(mtot - 1), mtot)
    x1 = np.asarray(x)[:, 0]
    direct = np.exp(-2j * np.pi * float(h) * np.outer(lags, x1)).sum(1)
    # convolution_vector's isign convention may flip the lag axis; the
    # marginal Gram is Hermitian either way
    got = vg[:, L // 2]
    err = min(np.abs(got - direct).max(), np.abs(got - direct.conj()).max())
    assert err / np.abs(direct).max() < 1e-8


def test_kron_inverse_is_exact_for_d1(rng):
    """d=1: P = diag(|ws|) T diag(|ws|) + s2 = A exactly, so the
    preconditioned CG converges in O(1) iterations."""
    x, kern, h, mtot, ws, v = _gram_pieces(rng, 2000, 1, 0.1, 1e-6)
    s2 = jnp.asarray(0.01)
    toe = make_toeplitz(v)
    A = make_A_mean(ws, toe, s2)
    kp = kron_eig_build(ws, v, s2, mtot=mtot, d=1,
                        diag_scale=toeplitz_diag_scale(v))
    M_inv = make_kron_precond(kp)
    b = ws * jnp.asarray(rng.normal(size=mtot))
    res = pcg(A, b, tol=1e-10, maxiter=50, M_inv=M_inv)
    assert bool(res.converged)
    assert int(res.iters) <= 5


def test_kron_apply_is_hermitian_pd(rng):
    """CG requires a Hermitian positive-definite preconditioner:
    <u, M v> = <M u, v> and <u, M u> > 0 on random complex vectors."""
    x, kern, h, mtot, ws, v = _gram_pieces(rng, 1500, 2, 0.15, 1e-4)
    s2 = jnp.asarray(0.01)
    kp = kron_eig_build(ws, v, s2, mtot=mtot, d=2,
                        diag_scale=toeplitz_diag_scale(v))
    M_inv = make_kron_precond(kp)
    M = mtot ** 2
    u = jnp.asarray(rng.normal(size=M) + 1j * rng.normal(size=M),
                    ws.dtype)
    w = jnp.asarray(rng.normal(size=M) + 1j * rng.normal(size=M),
                    ws.dtype)
    Mu, Mw = M_inv(u), M_inv(w)
    lhs = complex(jnp.vdot(u, Mw))
    rhs = complex(jnp.vdot(Mu, w))
    assert abs(lhs - rhs) / abs(lhs) < 1e-6
    assert float(jnp.vdot(u, Mu).real) > 0


def test_kron_precondition_cuts_iterations_and_preserves_solution(rng):
    """Hard-ish 2-D config: kron converges in far fewer iterations than
    Jacobi, to the same posterior (mean + exact variance)."""
    n, d = 20_000, 2
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.asarray(rng.normal(size=n))
    kern = SquaredExponential(lengthscale=jnp.asarray(0.05),
                              variance=jnp.asarray(1.0), dimension=d)
    _, h, mtot = spectral_grid(kern, 1e-5, 1.0)
    mtot = int(mtot)
    st_j = fit_with_grid(x, y, kern, jnp.asarray(0.01), h, mtot,
                         cg_tol=1e-8, max_cg_iter=6000, solver="cg")
    st_k = fit_with_grid(x, y, kern, jnp.asarray(0.01), h, mtot,
                         cg_tol=1e-8, max_cg_iter=6000, solver="cg",
                         precond="kron", fft_smooth=True)
    assert bool(st_k.mean_cg_iters) and int(st_k.mean_cg_iters) < \
        int(st_j.mean_cg_iters) // 8
    xt = jnp.asarray(rng.uniform(0.05, 0.95, (128, d)))
    mj = np.asarray(predict_mean(st_j, xt))
    mk = np.asarray(predict_mean(st_k, xt))
    assert np.max(np.abs(mj - mk)) / np.max(np.abs(mj)) < 1e-6
    vj = np.asarray(predict_var(st_j, xt, method="regular", cg_tol=1e-8,
                                max_cg_iter=6000))
    vk = np.asarray(predict_var(st_k, xt, method="regular", cg_tol=1e-8,
                                max_cg_iter=6000))
    assert np.max(np.abs(vj - vk)) / np.max(vj) < 1e-6


def test_kron_with_bucketed_mask_stays_exact(rng):
    """Surplus bucketed-grid nodes carry zero weight; the preconditioner
    built from the masked ws must leave the solution identical to the
    unbucketed grid's."""
    from gpquad.quadrature import bucket_mtot, flat_grid_mask
    n, d = 5_000, 2
    x = jnp.asarray(rng.uniform(0, 1, (n, d)))
    y = jnp.asarray(rng.normal(size=n))
    kern = SquaredExponential(lengthscale=jnp.asarray(0.12),
                              variance=jnp.asarray(1.0), dimension=d)
    _, h, mtot = spectral_grid(kern, 1e-5, 1.0)
    mtot = int(mtot)
    hm = (mtot - 1) // 2
    mtot_b = mtot + 6
    mask = flat_grid_mask(mtot_b, d, hm, dtype=x.dtype)
    st = fit_with_grid(x, y, kern, jnp.asarray(0.01), h, mtot,
                       cg_tol=1e-9, max_cg_iter=6000, solver="cg",
                       precond="kron")
    st_b = fit_with_grid(x, y, kern, jnp.asarray(0.01), h, mtot_b,
                         cg_tol=1e-9, max_cg_iter=6000, solver="cg",
                         precond="kron", ws_mask=mask)
    xt = jnp.asarray(rng.uniform(0.05, 0.95, (64, d)))
    m0 = np.asarray(predict_mean(st, xt))
    mb = np.asarray(predict_mean(st_b, xt))
    assert np.max(np.abs(m0 - mb)) / np.max(np.abs(m0)) < 1e-7
