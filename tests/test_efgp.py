"""End-to-end EFGP fit/predict tests against dense oracles.

Model: reference verify_efgpnd_exact_small.py:57-317 (dense-formed operator
agreement) and BASELINE.json config #1 (posterior mean/var vs dense vanilla
GP on small 1-D SE data).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import Matern, SquaredExponential
from gpquad.models.efgp import (fit, predict_mean, predict_var,
                                posterior_fourier_rows)

from .test_nufft import dense_F


def make_data(rng, n=120, d=1, lengthscale=0.5, variance=2.0, noise=0.2):
    """Synthetic GP draw via dense Cholesky (the reference ships these as
    data/gp_samples_*.pt; regenerated here from the same generative model)."""
    x = rng.uniform(0, 1, size=(n, d))
    dist = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    K = variance * np.exp(-0.5 * (dist / lengthscale) ** 2)
    L = np.linalg.cholesky(K + 1e-10 * np.eye(n))
    f = L @ rng.normal(size=n)
    y = f + np.sqrt(noise) * rng.normal(size=n)
    return jnp.asarray(x), jnp.asarray(y)


def dense_gp_posterior(kernel, x, y, sigmasq, xnew):
    """Vanilla dense GP posterior mean/var oracle."""
    x, xnew = np.asarray(x), np.asarray(xnew)
    K = np.asarray(kernel.kernel_matrix(jnp.asarray(x), jnp.asarray(x)))
    Ks = np.asarray(kernel.kernel_matrix(jnp.asarray(xnew), jnp.asarray(x)))
    Kss = np.asarray(kernel.kernel_matrix(jnp.asarray(xnew), jnp.asarray(xnew)))
    A = K + sigmasq * np.eye(len(x))
    alpha = np.linalg.solve(A, np.asarray(y))
    mean = Ks @ alpha
    var = np.diag(Kss - Ks @ np.linalg.solve(A, Ks.T))
    return mean, var


def dense_efgp_solution(kernel, x, y, sigmasq, eps):
    """Dense solve of the *same approximate objective*: A beta = D F^H y
    with A = D F^H F D + sigma^2 I (verify_efgpnd_exact_small.py:66-81)."""
    from gpquad.quadrature import spectral_grid
    from gpquad.models.efgp import tensor_grid, quadrature_weights
    x = np.asarray(x)
    L = float(np.max(x.max(0) - x.min(0)))
    xis1d, h, mtot = spectral_grid(kernel, eps, L)
    d = x.shape[1]
    xis = np.asarray(tensor_grid(jnp.asarray(xis1d), d))
    F = dense_F(x, h, mtot)
    S = np.asarray(kernel.spectral_density(jnp.asarray(xis)))
    ws = np.sqrt(S * h**d).astype(complex)
    A = (ws[:, None] * (F.conj().T @ F) * ws[None, :]
         + sigmasq * np.eye(len(ws)))
    rhs = ws * (F.conj().T @ np.asarray(y))
    beta = np.linalg.solve(A, rhs)
    return beta, ws, h, mtot, F


@pytest.mark.parametrize("d", [1, 2])
def test_fit_beta_matches_dense_solve(rng, d):
    kernel = SquaredExponential(lengthscale=0.3, variance=1.5, dimension=d)
    x, y = make_data(rng, n=80, d=d, lengthscale=0.3, variance=1.5)
    sigmasq, eps = 0.2, 1e-4
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-12)
    beta_dense, ws, h, mtot, _ = dense_efgp_solution(kernel, x, y, sigmasq, eps)
    assert state.mtot == mtot
    assert np.allclose(float(state.h), h, rtol=1e-12)
    assert np.allclose(np.asarray(state.ws), ws, rtol=1e-10)
    err = np.linalg.norm(np.asarray(state.beta) - beta_dense)
    assert err / np.linalg.norm(beta_dense) < 1e-8


def test_posterior_mean_matches_vanilla_gp(rng):
    kernel = SquaredExponential(lengthscale=0.25, variance=1.5, dimension=1)
    x, y = make_data(rng, n=150, d=1, lengthscale=0.25, variance=1.5)
    sigmasq, eps = 0.2, 1e-6
    xnew = jnp.linspace(0.05, 0.95, 64)[:, None]
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-10)
    mean = np.asarray(predict_mean(state, xnew))
    mean_oracle, _ = dense_gp_posterior(kernel, x, y, sigmasq, xnew)
    scale = np.max(np.abs(mean_oracle))
    assert np.max(np.abs(mean - mean_oracle)) / scale < 5e-5


def test_posterior_mean_matern(rng):
    kernel = Matern(lengthscale=0.3, variance=1.0, dimension=1, nu=1.5)
    rng2 = np.random.default_rng(7)
    x = jnp.asarray(rng2.uniform(0, 1, size=(120, 1)))
    y = jnp.asarray(np.sin(6 * np.asarray(x[:, 0]))
                    + 0.1 * rng2.normal(size=120))
    sigmasq, eps = 0.05, 1e-6
    xnew = jnp.linspace(0.1, 0.9, 40)[:, None]
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-10)
    mean = np.asarray(predict_mean(state, xnew))
    mean_oracle, _ = dense_gp_posterior(kernel, x, y, sigmasq, xnew)
    scale = np.max(np.abs(mean_oracle))
    # Matérn spectral tails converge slower: tolerance follows the eps model
    assert np.max(np.abs(mean - mean_oracle)) / scale < 5e-4


def test_variance_regular_matches_dense_formula(rng):
    """'regular' variance == sigma^2 f^H D (D T D + s^2)^-1 D f computed
    densely (reference efgpnd.py:1805-1820)."""
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    x, y = make_data(rng, n=90, d=1, lengthscale=0.3, variance=1.0)
    sigmasq, eps = 0.1, 1e-4
    xnew = jnp.linspace(0.1, 0.9, 23)[:, None]
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-12)
    var = np.asarray(predict_var(state, xnew, method="regular", cg_tol=1e-12))

    beta_dense, ws, h, mtot, F = dense_efgp_solution(kernel, x, y, sigmasq, eps)
    fx = np.asarray(posterior_fourier_rows(xnew, state.h, mtot, 1))
    A = (ws[:, None] * (F.conj().T @ F) * ws[None, :]
         + sigmasq * np.eye(len(ws)))
    gam = np.linalg.solve(A / sigmasq, (ws * fx.conj()).T).T
    want = np.maximum(np.real(np.sum(fx * (ws * gam), axis=-1)), 0.0)
    assert np.allclose(var, want, rtol=1e-6, atol=1e-10)


def test_variance_regular_matches_vanilla_gp(rng):
    kernel = SquaredExponential(lengthscale=0.25, variance=1.5, dimension=1)
    x, y = make_data(rng, n=150, d=1, lengthscale=0.25, variance=1.5)
    sigmasq, eps = 0.2, 1e-6
    xnew = jnp.linspace(0.1, 0.9, 32)[:, None]
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-10)
    var = np.asarray(predict_var(state, xnew, method="regular", cg_tol=1e-10))
    _, var_oracle = dense_gp_posterior(kernel, x, y, sigmasq, xnew)
    assert np.max(np.abs(var - var_oracle)) < 5e-4 * float(kernel.variance)


def test_variance_stochastic_approximates_regular(rng):
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    x, y = make_data(rng, n=100, d=1, lengthscale=0.3, variance=1.0)
    sigmasq, eps = 0.1, 1e-4
    xnew = jnp.linspace(0.15, 0.85, 16)[:, None]
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-10)
    var_reg = np.asarray(predict_var(state, xnew, method="regular",
                                     cg_tol=1e-10))
    var_sto = np.asarray(predict_var(state, xnew, method="stochastic",
                                     key=jax.random.PRNGKey(0), probes=4000,
                                     cg_tol=1e-8))
    # Monte-Carlo estimator: loose tolerance scaling like 1/sqrt(J)
    assert np.max(np.abs(var_sto - var_reg)) < 0.1 * np.max(var_reg)


def test_variance_chebyshev_matches_regular(rng):
    """Chebyshev-interpolated variance (generalized from the PG module)
    approximates the exact per-target path on a smooth variance field."""
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    x, y = make_data(rng, n=120, d=1, lengthscale=0.3, variance=1.0)
    state = fit(x, y, kernel, 0.1, 1e-4, cg_tol=1e-10)
    xnew = jnp.linspace(0.1, 0.9, 50)[:, None]
    v_reg = np.asarray(predict_var(state, xnew, method="regular",
                                   cg_tol=1e-10))
    v_cheb = np.asarray(predict_var(state, xnew, method="chebyshev",
                                    chebyshev_nodes=24, cg_tol=1e-10))
    assert np.max(np.abs(v_cheb - v_reg)) < 2e-3 * np.max(v_reg)


def test_variance_chebyshev_auto_nodes_on_rough_kernel(rng):
    """Bandwidth-adaptive node selection (chebyshev_nodes=None) resolves a
    rough short-lengthscale Matern-3/2 variance field that the old fixed
    default of 20 nodes visibly under-resolves."""
    from gpquad.kernels import Matern
    kernel = Matern(lengthscale=0.16, variance=1.0, nu=1.5, dimension=1)
    x, y = make_data(rng, n=150, d=1, lengthscale=0.16, variance=1.0)
    state = fit(x, y, kernel, 0.1, 1e-3, cg_tol=1e-10)
    xnew = jnp.linspace(0.1, 0.9, 200)[:, None]
    v_reg = np.asarray(predict_var(state, xnew, method="regular",
                                   cg_tol=1e-10))
    v_auto = np.asarray(predict_var(state, xnew, method="chebyshev",
                                    chebyshev_nodes=None, cg_tol=1e-10))
    v_fixed20 = np.asarray(predict_var(state, xnew, method="chebyshev",
                                       chebyshev_nodes=20, cg_tol=1e-10))
    err_auto = np.max(np.abs(v_auto - v_reg)) / np.max(v_reg)
    err_fixed = np.max(np.abs(v_fixed20 - v_reg)) / np.max(v_reg)
    assert err_auto < 2e-3
    assert err_auto < err_fixed


def test_variance_chebyshev_f32_scale_rel_error_within_1e3(rng):
    """Pin the bench claim (VERDICT r3 #9): at a headline-like 2-D config
    the f32 Chebyshev variance stays within 1e-3 of the f64 exact path,
    scale-relative (max-abs error / max variance).

    scripts/diagnose_cheb_error.py attributes the budget: interpolation
    contributes ~3e-12; the f32 node-solve floor is ~4.3e-4 at n=1e5
    (BENCH_r03's on-device 3.3e-3 was the interpolation einsum running at
    TPU bf16-pass default precision, now pinned to HIGHEST)."""
    n, d, ell, sigmasq = 20_000, 2, 0.1, 0.01
    xh = rng.uniform(0, 1, size=(n, d))
    yh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
          + 0.1 * rng.normal(size=n))
    xt = rng.uniform(0, 1, size=(128, d))
    k32 = SquaredExponential(lengthscale=jnp.float32(ell),
                             variance=jnp.float32(1.0), dimension=d)
    st32 = fit(jnp.asarray(xh, jnp.float32), jnp.asarray(yh, jnp.float32),
               k32, sigmasq, 1e-6, cg_tol=1e-6)
    v32 = np.asarray(predict_var(st32, jnp.asarray(xt, jnp.float32),
                                 method="chebyshev", cg_tol=1e-5),
                     np.float64)
    k64 = SquaredExponential(lengthscale=jnp.float64(ell),
                             variance=jnp.float64(1.0), dimension=d)
    st64 = fit(jnp.asarray(xh), jnp.asarray(yh), k64, sigmasq, 1e-6,
               cg_tol=1e-12)
    v64 = np.asarray(predict_var(st64, jnp.asarray(xt), method="regular",
                                 cg_tol=1e-12))
    assert np.max(np.abs(v32 - v64)) / np.max(v64) < 1e-3


def test_2d_mean_and_variance(rng):
    kernel = SquaredExponential(lengthscale=0.4, variance=1.0, dimension=2)
    x, y = make_data(rng, n=200, d=2, lengthscale=0.4, variance=1.0)
    sigmasq, eps = 0.1, 1e-5
    xnew = jnp.asarray(np.random.default_rng(5).uniform(0.1, 0.9, size=(25, 2)))
    state = fit(x, y, kernel, sigmasq, eps, cg_tol=1e-10)
    mean = np.asarray(predict_mean(state, xnew))
    var = np.asarray(predict_var(state, xnew, method="regular", cg_tol=1e-10))
    mean_oracle, var_oracle = dense_gp_posterior(kernel, x, y, sigmasq, xnew)
    assert np.max(np.abs(mean - mean_oracle)) < 2e-4 * np.max(np.abs(mean_oracle))
    assert np.max(np.abs(var - var_oracle)) < 2e-3 * float(kernel.variance)


def test_fit_is_jittable(rng):
    from gpquad.models.efgp import fit_with_grid
    from gpquad.quadrature import spectral_grid
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    x, y = make_data(rng, n=60, d=1)
    _, h, mtot = spectral_grid(kernel, 1e-4, 1.0)

    @jax.jit
    def run(xx, yy, hh):
        st = fit_with_grid(xx, yy, kernel, 0.1, hh, mtot, cg_tol=1e-10)
        return st.beta

    b1 = np.asarray(run(x, y, h))
    state = fit(x, y, kernel, 0.1, 1e-4, cg_tol=1e-10)
    # jitted grid uses L from spectral_grid(..., L=1.0) vs data-derived L;
    # only check the jit executes and returns finite values
    assert np.all(np.isfinite(b1.real))


def test_3d_fit_and_predict(rng):
    """End-to-end d=3 (the reference demonstrates d<=3 via the roads data)."""
    kernel = SquaredExponential(lengthscale=0.5, variance=1.0, dimension=3)
    x, y = make_data(rng, n=150, d=3, lengthscale=0.5, variance=1.0,
                     noise=0.1)
    state = fit(x, y, kernel, 0.1, eps=1e-3, cg_tol=1e-10)
    assert state.d == 3
    xnew = jnp.asarray(np.random.default_rng(9).uniform(0.2, 0.8, (20, 3)))
    mean = np.asarray(predict_mean(state, xnew))
    var = np.asarray(predict_var(state, xnew, method="regular",
                                 cg_tol=1e-10))
    mo, vo = dense_gp_posterior(kernel, x, y, 0.1, xnew)
    assert np.max(np.abs(mean - mo)) < 2e-2 * max(1.0, np.max(np.abs(mo)))
    assert np.max(np.abs(var - vo)) < 3e-2 * float(kernel.variance)


def test_even_mtot_rejected(rng):
    from gpquad.ops.nufft import make_nufft
    x = jnp.asarray(rng.uniform(size=(10, 2)))
    with pytest.raises(ValueError):
        make_nufft(x, 0.3, 10)


def test_fit_solver_passthrough(rng):
    """fit() forwards solver=/precond_rank=: forced-CG (deflated or not)
    must agree with the auto dense factor-solve."""
    kernel = SquaredExponential(lengthscale=0.25, variance=1.0, dimension=2)
    x = jnp.asarray(rng.uniform(0, 1, (200, 2)))
    y = jnp.asarray(rng.normal(size=200))
    s_dense = fit(x, y, kernel, 0.1, eps=1e-3, cg_tol=1e-10)
    s_cg = fit(x, y, kernel, 0.1, eps=1e-3, cg_tol=1e-10, solver="cg")
    s_defl = fit(x, y, kernel, 0.1, eps=1e-3, cg_tol=1e-10,
                 solver="cg", precond_rank=32)
    assert s_dense.A_dense is not None and s_cg.A_dense is None
    assert s_defl.defl_P is not None
    b0 = np.asarray(s_dense.beta)
    for s in (s_cg, s_defl):
        assert np.allclose(np.asarray(s.beta), b0, atol=1e-8), \
            np.abs(np.asarray(s.beta) - b0).max()
