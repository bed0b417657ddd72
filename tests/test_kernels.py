"""Kernel zoo unit tests (model: reference tests/test_kernels.py:10-161)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import HyperState, Matern, SquaredExponential, make_kernel


KERNELS = [
    SquaredExponential(lengthscale=0.7, variance=2.0, dimension=1),
    SquaredExponential(lengthscale=0.3, variance=1.5, dimension=2),
    Matern(lengthscale=0.7, variance=2.0, dimension=1, nu=0.5),
    Matern(lengthscale=0.7, variance=2.0, dimension=1, nu=1.5),
    Matern(lengthscale=0.4, variance=0.8, dimension=2, nu=2.5),
    # generic-nu (Bessel-K) path, incl. integer nu where the reflection
    # formula would be singular (reference matern.py:72-98)
    Matern(lengthscale=0.7, variance=1.3, dimension=1, nu=1.0),
    Matern(lengthscale=0.5, variance=0.9, dimension=2, nu=3.0),
]


@pytest.mark.parametrize("k", KERNELS, ids=lambda k: type(k).__name__ + str(k.dimension))
def test_kernel_at_zero_is_variance(k):
    assert np.allclose(float(k.kernel(jnp.zeros(()))), float(k.variance))


def test_se_manual_value():
    k = SquaredExponential(lengthscale=2.0, variance=3.0, dimension=1)
    r = jnp.array([1.0])
    expected = 3.0 * np.exp(-0.5 * (1.0 / 2.0) ** 2)
    assert np.allclose(np.asarray(k.kernel(r)), expected)


def test_matern_manual_values():
    l, v = 0.9, 1.3
    r = jnp.array([0.5])
    s = 0.5 / l
    m12 = Matern(lengthscale=l, variance=v, nu=0.5)
    assert np.allclose(np.asarray(m12.kernel(r)), v * np.exp(-s))
    m32 = Matern(lengthscale=l, variance=v, nu=1.5)
    assert np.allclose(np.asarray(m32.kernel(r)),
                       v * (1 + np.sqrt(3) * s) * np.exp(-np.sqrt(3) * s))
    m52 = Matern(lengthscale=l, variance=v, nu=2.5)
    assert np.allclose(
        np.asarray(m52.kernel(r)),
        v * (1 + np.sqrt(5) * s + 5 * s**2 / 3) * np.exp(-np.sqrt(5) * s))


@pytest.mark.parametrize("k", KERNELS, ids=lambda k: type(k).__name__ + str(k.dimension))
def test_spectral_density_is_fourier_transform(k):
    """S(xi) must be the d-dim Fourier transform of k(r): check by direct
    numerical quadrature on a fine grid (1-D kernels only)."""
    if k.dimension != 1:
        pytest.skip("numerical FT check in 1-D")
    xs = np.linspace(-60, 60, 400001)
    dx = xs[1] - xs[0]
    kr = np.asarray(k.kernel(jnp.abs(jnp.array(xs))))
    for xi in (0.0, 0.13, 0.41):
        ft = np.sum(kr * np.cos(2 * np.pi * xi * xs)) * dx
        s = float(k.spectral_density(jnp.array([xi]))[0])
        assert np.allclose(ft, s, rtol=2e-3, atol=1e-6), (xi, ft, s)


@pytest.mark.parametrize("k", KERNELS, ids=lambda k: type(k).__name__ + str(k.dimension))
def test_spectral_grad_closed_form_vs_autodiff(k):
    xi = jnp.array(np.random.default_rng(1).normal(size=(7, k.dimension)) * 0.3)
    g_closed = np.asarray(k.spectral_grad(xi))
    g_auto = np.asarray(k.spectral_grad_auto(xi))
    assert np.allclose(g_closed, g_auto, rtol=1e-8), (g_closed, g_auto)


@pytest.mark.parametrize("k", KERNELS[:2], ids=["se1", "se2"])
def test_spectral_grad_vs_finite_difference(k):
    xi = jnp.array([[0.2] * k.dimension, [0.05] * k.dimension])
    g = np.asarray(k.spectral_grad(xi))
    epsfd = 1e-6
    for i, name in enumerate(k.hyper_names):
        v0 = float(k.get_hyper(name))
        sp = np.asarray(k.set_hyper(name, v0 + epsfd).spectral_density(xi))
        sm = np.asarray(k.set_hyper(name, v0 - epsfd).spectral_density(xi))
        fd = (sp - sm) / (2 * epsfd)
        assert np.allclose(g[:, i], fd, rtol=1e-4), (name, g[:, i], fd)


def test_log_marginal_matches_naive():
    rng = np.random.default_rng(3)
    x = jnp.array(rng.normal(size=(20, 1)))
    y = jnp.array(rng.normal(size=(20,)))
    k = SquaredExponential(lengthscale=0.5, variance=1.2, dimension=1)
    lm = float(k.log_marginal(x, y, 0.1))
    K = np.asarray(k.kernel_matrix(x, x)) + 0.1 * np.eye(20)
    sign, logdet = np.linalg.slogdet(K)
    expected = -0.5 * (y @ np.linalg.solve(K, np.asarray(y)) + logdet
                       + 20 * np.log(2 * np.pi))
    assert np.allclose(lm, expected, rtol=1e-8)


def test_hyper_roundtrip_and_pytree():
    k = SquaredExponential(lengthscale=0.5, variance=1.2, dimension=2)
    k2 = k.with_hypers(jnp.array([0.9, 2.5, 0.3]))  # trailing sig2 ignored
    assert np.allclose(float(k2.lengthscale), 0.9)
    assert np.allclose(float(k2.variance), 2.5)
    leaves, treedef = jax.tree_util.tree_flatten(k2)
    k3 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert np.allclose(float(k3.lengthscale), 0.9)
    assert k3.dimension == 2


def test_hyperstate():
    k = SquaredExponential(lengthscale=0.5, variance=1.2, dimension=1)
    hs = HyperState.create(k, sigmasq=0.1)
    assert hs.names == ("lengthscale", "variance")
    assert np.allclose(np.asarray(hs.pos), [0.5, 1.2, 0.1])
    assert np.allclose(float(hs.sig2), 0.1)
    k2 = hs.kernel_of(k)
    assert np.allclose(float(k2.lengthscale), 0.5)
    hs2 = hs.clamp_min("lengthscale", 0.8)
    assert np.allclose(float(hs2.pos[0]), 0.8)
    # pytree: optax-style update works
    hs3 = jax.tree_util.tree_map(lambda a: a * 0 + 1.0, hs)
    assert np.allclose(np.asarray(hs3.raw), 1.0)


def test_make_kernel_strings():
    assert isinstance(make_kernel("SE", 2), SquaredExponential)
    assert isinstance(make_kernel("SquaredExponential", 1), SquaredExponential)
    m = make_kernel("Matern32", 2)
    assert isinstance(m, Matern) and m.nu == 1.5
    assert make_kernel("matern52", 1).nu == 2.5
    assert make_kernel("matern12", 1).nu == 0.5
    with pytest.raises(ValueError):
        make_kernel("nope", 1)


def test_estimate_hyperparameters():
    rng = np.random.default_rng(0)
    x = jnp.array(rng.uniform(size=(200, 2)))
    y = jnp.array(rng.normal(size=(200,)) * 2.0)
    k = SquaredExponential(dimension=2)
    l, v, nv = k.estimate_hyperparameters(x, y)
    assert 0 < float(l) < 2.0
    assert np.allclose(float(v), float(jnp.var(y)))
    assert np.allclose(float(nv), 0.2 * float(jnp.var(y)))
    # Matérn uses the full median (not half)
    km = Matern(dimension=2, nu=1.5)
    lm, _, _ = km.estimate_hyperparameters(x, y)
    assert np.allclose(float(lm), 2 * float(l))


def test_matern_generic_nu_matches_scipy():
    """Generic-nu Matérn (pure-JAX Bessel-K) == scipy closed evaluation on a
    grid of distances (reference generic path, matern.py:72-98)."""
    from scipy.special import gamma as sp_gamma, kv
    r = np.concatenate([[0.0], np.logspace(-6, 1.2, 60)])
    for nu in (0.3, 1.0, 2.0, 3.7):
        for l, v in ((0.7, 1.3), (0.25, 0.6)):
            k = Matern(lengthscale=l, variance=v, dimension=1, nu=nu)
            got = np.asarray(k.kernel(jnp.asarray(r)))
            s = np.sqrt(2 * nu) * r / l
            with np.errstate(invalid="ignore"):
                want = v * 2.0 ** (1 - nu) / sp_gamma(nu) * s**nu * kv(nu, s)
            want[0] = v
            assert np.allclose(got, want, rtol=1e-10, atol=1e-12 * v), (
                nu, l, np.abs(got - want).max())


def test_matern_generic_nu_closed_form_consistency():
    """At nu=1.5 the Bessel-K profile must equal the closed form."""
    from gpquad.kernels.bessel import log_matern_profile
    r = jnp.asarray(np.logspace(-4, 1, 40))
    l = 0.6
    s = r / l
    closed = (1 + np.sqrt(3) * np.asarray(s)) * np.exp(-np.sqrt(3)
                                                       * np.asarray(s))
    got = np.asarray(jnp.exp(log_matern_profile(1.5, jnp.sqrt(3.0) * s)))
    assert np.allclose(got, closed, rtol=1e-10)


def test_matern_generic_nu_grad_lengthscale():
    """jax.grad through the Bessel-K kernel matches finite differences."""
    r = jnp.asarray([0.0, 0.1, 0.7, 2.0])

    def f(l):
        return jnp.sum(Matern(lengthscale=l, variance=1.0, dimension=1,
                              nu=2.0).kernel(r))

    g = float(jax.grad(f)(0.5))
    h = 1e-6
    fd = (float(f(0.5 + h)) - float(f(0.5 - h))) / (2 * h)
    assert np.isfinite(g)
    assert np.allclose(g, fd, rtol=1e-5), (g, fd)


def test_matern_rejects_nonpositive_nu():
    with pytest.raises(ValueError):
        Matern(lengthscale=0.5, variance=1.0, dimension=1, nu=0.0)
