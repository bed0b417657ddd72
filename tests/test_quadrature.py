"""Quadrature node-selection tests (model: reference tests/test_utils.py)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import Matern, SquaredExponential
from gpquad.quadrature import (bucket_mtot, grid_geometry, padded_grid_mask,
                               spectral_grid, truncation_bound)


def test_truncation_bound_recovers_known_value():
    # f(L) = exp(-L): f(L) = eps at L = log(1/eps)
    for eps in (1e-2, 1e-4, 1e-6):
        L = float(truncation_bound(lambda r: jnp.exp(-r), eps))
        assert np.allclose(L, math.log(1 / eps), rtol=1e-6)


def test_truncation_bound_doubles_upper():
    # support far beyond the initial upper bound 1000
    f = lambda r: jnp.exp(-r / 5000.0)
    eps = 1e-3
    L = float(truncation_bound(f, eps))
    assert np.allclose(L, 5000.0 * math.log(1 / eps), rtol=1e-6)


@pytest.mark.parametrize("kernel", [
    SquaredExponential(lengthscale=0.1, variance=1.0, dimension=1),
    SquaredExponential(lengthscale=0.25, variance=2.0, dimension=2),
    Matern(lengthscale=0.2, variance=1.0, dimension=1, nu=1.5),
    Matern(lengthscale=0.15, variance=1.0, dimension=2, nu=2.5),
], ids=["se1", "se2", "m32", "m52"])
def test_spectral_grid_integral(kernel):
    xis, h, mtot = spectral_grid(kernel, eps=1e-4, L=1.0, use_integral=True)
    assert mtot % 2 == 1 and mtot == len(xis)
    assert h > 0
    assert np.allclose(xis[1] - xis[0], h)
    assert np.allclose(xis[mtot // 2], 0.0)
    # aliasing criterion: kernel tail beyond 1/h - L is below eps
    Ltime = 1.0 / h - 1.0
    assert float(kernel.kernel(jnp.asarray(Ltime))) <= 1e-4 * 1.01
    # truncation criterion: spectral tail at grid edge is small
    edge = abs(xis[-1])
    s_edge = float(kernel.spectral_density(jnp.array([[edge] + [0.0] * (kernel.dimension - 1)]))[0])
    s_0 = float(kernel.spectral_density(jnp.zeros((1, kernel.dimension)))[0])
    assert edge ** (kernel.dimension - 1) * s_edge / s_0 <= 1e-4 * 1.01


def test_spectral_grid_heuristics_match_formulas():
    k = SquaredExponential(lengthscale=0.2, variance=1.0, dimension=1)
    xis, h, mtot = spectral_grid(k, eps=1e-3, L=1.0, use_integral=False)
    l, d, eps = 0.2, 1, 1e-3
    h_exp = 1 / (1.0 + l * math.sqrt(2 * math.log(4 * d * 3**d / eps)))
    hm_exp = math.ceil(
        math.sqrt(math.log(d * 4 ** (d + 1) / eps) / 2) / math.pi / l / h_exp)
    assert np.allclose(h, h_exp, rtol=1e-9)
    assert mtot == 2 * hm_exp + 1

    km = Matern(lengthscale=0.3, variance=1.0, dimension=2, nu=1.5)
    xis, h, mtot = spectral_grid(km, eps=1e-3, L=2.0, use_integral=False)
    l, nu, d, eps = 0.3, 1.5, 2, 1e-3
    h_exp = 1 / (2.0 + 0.85 * l / math.sqrt(nu) * math.log(1 / eps))
    hm_exp = math.ceil((math.pi ** (nu + d / 2) * l ** (2 * nu) * eps / 0.15)
                       ** (-1 / (2 * nu + d / 2)) / h_exp)
    assert np.allclose(h, h_exp, rtol=1e-9)
    assert mtot == 2 * hm_exp + 1


def test_bucket_mtot_ladder():
    assert bucket_mtot(5) == 9
    assert bucket_mtot(9) == 9
    m1 = bucket_mtot(40)
    assert m1 >= 40 and m1 % 2 == 1
    # idempotent on rungs
    assert bucket_mtot(m1) == m1
    # monotone
    assert bucket_mtot(100) >= bucket_mtot(60)


def test_padded_grid_mask():
    xis, mask = padded_grid_mask(11, hm=3, h=0.5)
    assert xis.shape == (11,) and mask.shape == (11,)
    assert np.allclose(np.asarray(mask), [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 0])
    assert np.allclose(np.asarray(xis)[5], 0.0)
    assert np.allclose(np.asarray(xis)[6] - np.asarray(xis)[5], 0.5)


def test_grid_geometry_traced_matches_host():
    k = SquaredExponential(lengthscale=0.15, variance=1.0, dimension=1)
    import jax
    h_t, hm_t = jax.jit(lambda eps, L: grid_geometry(k, eps, L))(1e-4, 1.0)
    xis, h, mtot = spectral_grid(k, 1e-4, 1.0)
    assert np.allclose(float(h_t), h, rtol=1e-9)
    assert int(np.ceil(float(hm_t) - 1e-12)) == (mtot - 1) // 2


def test_bucket_neighbors_consistent_with_ladder():
    """bucket_neighbors returns the true adjacent rungs: for every raw
    size m, the rung bucket_mtot(m) sits strictly between its reported
    neighbors, and no other rung lives in between (the PG/EFGP cold-start
    hysteresis relies on this)."""
    from gpquad.quadrature import bucket_neighbors
    rungs = set(bucket_mtot(m) for m in range(1, 5000))
    for r in sorted(rungs)[:-1]:
        down, up = bucket_neighbors(r)
        assert up in rungs and up > r
        assert not any(r < q < up for q in rungs)
        if down is not None:
            assert down in rungs and down < r
            assert not any(down < q < r for q in rungs)
        else:
            assert r == min(rungs)
