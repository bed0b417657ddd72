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



def test_fused_high_matches_separate_paths(rng):
    """fit_predict_grad_high == (fit_predict_grad, fit_high+predict) run
    separately.

    Shapes/statics deliberately IDENTICAL to test_precision's d=2 case
    (n=4000, mtot=11, h=0.31, 150 targets, chunk=64, slab=256, passes=8):
    the df64 programs compile in minutes on XLA:CPU, so sharing the jit
    signature means the suite pays that compile once, not twice.  The
    fused one-dispatch variant is exercised on TPU by bench.py; fuse=False
    is numerically identical.
    """
    from gpquad.models.pipeline import fit_predict_grad_high
    from gpquad.models.precision import fit_high, predict_mean_high
    n, mtot, h, sigmasq, ell = 4000, 11, 0.31, 0.05, 0.25
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    xnew = jnp.asarray(rng.uniform(0.1, 0.9, (150, 2)), jnp.float32)
    kernel = SquaredExponential(lengthscale=jnp.float32(ell),
                                variance=jnp.float32(1.0), dimension=2)
    key = jax.random.PRNGKey(0)
    res = fit_predict_grad_high(x, y, xnew, kernel, sigmasq, h, key,
                                mtot=mtot, trace_samples=2, var_probes=4,
                                chunk=64, slab=256, fuse=False)
    sep = fit_predict_grad(x, y, xnew, kernel, sigmasq, jnp.float32(h), key,
                           mtot=mtot, trace_samples=2, var_probes=4)
    assert np.allclose(np.asarray(res.fused.mean), np.asarray(sep.mean),
                       atol=1e-12)
    assert np.allclose(np.asarray(res.fused.grad), np.asarray(sep.grad),
                       rtol=1e-10)
    # the pipeline defaults to CHUNKED lag tables (the ozaki exact
    # builder alone costs ~56 s of TPU compile and the fused program
    # ships the df64 MEAN only — see fit_predict_grad_high); mirror
    # that for bit parity
    hs = fit_high(x, y, kernel, sigmasq, h, mtot, chunk=64,
                  exact_tables=False)
    mh = predict_mean_high(hs, xnew, slab=256)
    assert np.allclose(np.asarray(res.mean_high), np.asarray(mh), atol=1e-12)
    assert float(res.high_residual) < 1e-6
    # and the exact-table default stays within the 1e-6 agreement band
    hse = fit_high(x, y, kernel, sigmasq, h, mtot)
    mhe = predict_mean_high(hse, xnew, slab=256)
    assert np.allclose(np.asarray(res.mean_high), np.asarray(mhe), atol=1e-6)
