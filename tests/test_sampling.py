"""Sampler tests (model: reference pg test 'spectral sampler covariance vs
approximate kernel', test_pg_classifier.py, and vanilla_gp_sampling checks).
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.sampling import (sample_bernoulli_gp,
                                    sample_bernoulli_gp_spectral,
                                    sample_gp_dense, sample_gp_matern,
                                    sample_gp_spectral)


def test_dense_sampler_covariance(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(30, 1)))
    k = SquaredExponential(lengthscale=0.4, variance=1.5, dimension=1)
    S = sample_gp_dense(jax.random.PRNGKey(0), x, k, noise_variance=0.05,
                        num_samples=20000)
    emp = np.cov(np.asarray(S))
    want = np.asarray(k.kernel_matrix(x, x)) + 0.05 * np.eye(30)
    assert np.max(np.abs(emp - want)) < 0.12


def test_matern_sampler_runs(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(40, 2)))
    s = sample_gp_matern(jax.random.PRNGKey(1), x, nu=1.5, num_samples=3)
    assert s.shape == (40, 3)
    s1 = sample_gp_matern(jax.random.PRNGKey(1), x, nu=2.5)
    assert s1.shape == (40,)


def test_spectral_sampler_covariance(rng):
    """Empirical covariance of spectral draws ~ the SE kernel matrix
    (the approximation the sampler targets), to MC accuracy."""
    x = jnp.asarray(rng.uniform(0, 1, size=(25, 1)))
    k = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=1)
    S = sample_gp_spectral(jax.random.PRNGKey(2), x, lengthscale=0.3,
                           variance=1.0, num_samples=30000,
                           spectral_eps=1e-6, trunc_eps=1e-6)
    assert S.shape == (25, 30000)
    emp = (np.asarray(S) @ np.asarray(S).T) / 30000
    want = np.asarray(k.kernel_matrix(x, x))
    assert np.max(np.abs(emp - want)) < 0.05, np.max(np.abs(emp - want))


def test_spectral_sampler_2d_shapes(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(60, 2)))
    s = sample_gp_spectral(jax.random.PRNGKey(3), x, lengthscale=0.4)
    assert s.shape == (60,)
    assert np.all(np.isfinite(np.asarray(s)))


def test_bernoulli_samplers(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(80, 1)))
    y, f = sample_bernoulli_gp(jax.random.PRNGKey(4), x, lengthscale=0.3)
    assert set(np.unique(np.asarray(y))).issubset({0.0, 1.0})
    assert f.shape == (80,)
    y2, f2 = sample_bernoulli_gp_spectral(jax.random.PRNGKey(5), x,
                                          lengthscale=0.3)
    assert set(np.unique(np.asarray(y2))).issubset({0.0, 1.0})


def test_pathwise_posterior_matches_efgp_posterior(rng):
    """Matheron pathwise samples must have the EFGP posterior mean and
    (regular) variance, statistically over many samples."""
    import gpquad
    from gpquad.models.sampling import sample_posterior_pathwise
    n = 120
    x = jnp.asarray(rng.uniform(0, 1, (n, 1)))
    y = jnp.asarray(np.sin(6 * np.asarray(x[:, 0]))
                    + 0.2 * rng.normal(size=n))
    kern = SquaredExponential(lengthscale=0.2, variance=1.0, dimension=1)
    state = gpquad.fit(x, y, kern, 0.05, eps=1e-5, cg_tol=1e-10)
    xq = jnp.asarray(np.linspace(0.05, 0.95, 7)[:, None])
    mean = np.asarray(gpquad.predict_mean(state, xq))
    var = np.asarray(gpquad.predict_var(state, xq, method="regular",
                                        cg_tol=1e-10))
    S = 4000
    samp = np.asarray(sample_posterior_pathwise(
        x, y, state, xq, jax.random.PRNGKey(0), num_samples=S,
        cg_tol=1e-10))
    assert samp.shape == (S, 7)
    se_mean = np.sqrt(var / S)          # std error of the sample mean
    assert np.all(np.abs(samp.mean(0) - mean) < 5 * se_mean), (
        samp.mean(0), mean, se_mean)
    rel = np.abs(samp.var(0) - var) / var
    assert np.all(rel < 6 * np.sqrt(2.0 / S)), (samp.var(0), var, rel)
