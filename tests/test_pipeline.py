"""Fused pipeline tests: one compiled pass == the separate stage calls."""
import jax
import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_mean, _variance_stochastic
from gpquad.models.gradient import gradient_with_grid
from gpquad.models.pipeline import fit_predict_grad
from gpquad.quadrature import spectral_grid

from .test_efgp import make_data


def test_fused_matches_components(rng):
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    x, y = make_data(rng, n=200, d=2, lengthscale=0.3, variance=1.0)
    xnew = jnp.asarray(rng.uniform(0.2, 0.8, (40, 2)))
    _, h, mtot = spectral_grid(kernel, 1e-3, 1.0)
    key = jax.random.PRNGKey(0)

    out = fit_predict_grad(x, y, xnew, kernel, 0.1, h, key, mtot=mtot,
                           trace_samples=4, var_probes=16, cg_tol=1e-10,
                           var_cg_tol=1e-8, grad_cg_tol=1e-8,
                           max_cg_iter=2000)

    state = fit_with_grid(x, y, kernel, 0.1, h, mtot, cg_tol=1e-10,
                          max_cg_iter=2000)
    mean = predict_mean(state, xnew)
    kv, kg = jax.random.split(key)
    var = _variance_stochastic(state, xnew, kv, probes=16, cg_tol=1e-8,
                               max_cg_iter=2000)
    gres = gradient_with_grid(x, y, kernel, 0.1, h, kg, mtot=mtot,
                              trace_samples=4, cg_tol=1e-8,
                              max_cg_iter=2000, beta0=state.beta)

    assert np.allclose(np.asarray(out.mean), np.asarray(mean), atol=1e-9)
    assert np.allclose(np.asarray(out.var), np.asarray(var), atol=1e-9)
    assert np.allclose(np.asarray(out.grad), np.asarray(gres.grad),
                       rtol=1e-7)
    assert np.allclose(np.abs(np.asarray(out.beta - state.beta)), 0.0,
                       atol=1e-9)


def test_fused_accepts_1d_targets(rng):
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    x, y = make_data(rng, n=100, d=1)
    xnew = jnp.linspace(0.2, 0.8, 16)      # 1-D targets
    _, h, mtot = spectral_grid(kernel, 1e-3, 1.0)
    out = fit_predict_grad(x, y, xnew, kernel, 0.1, h,
                           jax.random.PRNGKey(0), mtot=mtot,
                           trace_samples=2, var_probes=8)
    assert out.mean.shape == (16,)
    assert np.all(np.isfinite(np.asarray(out.mean)))
