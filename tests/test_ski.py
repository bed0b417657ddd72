"""SKI baseline tests.

Model: the reference validates SKI only through smoke runs
(verify_ski_realdata.py) and OISST shootouts; here the from-scratch
implementation additionally gets dense oracles: the SKI approximate kernel
W K_g W^T must approach the exact kernel as the grid refines, and the
fitted model must match dense-GP predictions.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models.ski import (build_ski_operator, fit_ski_gp,
                               resolve_grid_bounds, resolve_grid_size,
                               ski_predict_mean)

from .test_efgp import dense_gp_posterior, make_data


def test_grid_resolution_helpers(rng):
    x = rng.uniform(0, 2, size=(100, 2))
    bounds = resolve_grid_bounds(x)
    assert len(bounds) == 2
    for (lo, hi), dim in zip(bounds, range(2)):
        assert lo < x[:, dim].min() and hi > x[:, dim].max()
    sizes = resolve_grid_size(grid_size=None, num_dims=2,
                              target_grid_points=1024, grid_bounds=bounds)
    assert len(sizes) == 2 and all(s >= 16 for s in sizes)
    assert np.prod(sizes) <= 1024 * 1.3
    assert resolve_grid_size(grid_size=32, num_dims=2,
                             target_grid_points=0, grid_bounds=bounds) == (32, 32)
    with pytest.raises(ValueError):
        resolve_grid_size(grid_size=(32,), num_dims=2, target_grid_points=0,
                          grid_bounds=bounds)
    with pytest.raises(ValueError):
        resolve_grid_bounds(x, [(0.0, 1.0)])


def test_ski_matvec_approximates_dense_kernel(rng):
    """W K_g W^T v -> K v as the grid refines (cubic interpolation:
    O(dx^3) error for smooth kernels)."""
    n = 60
    x = jnp.asarray(rng.uniform(0, 1, size=(n, 1)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.5, dimension=1)
    K = np.asarray(kern.kernel_matrix(x, x))
    v = rng.normal(size=n)
    errs = []
    for gs in (16, 32, 64):
        op = build_ski_operator(x, kern, (gs,), resolve_grid_bounds(
            np.asarray(x)))
        got = np.asarray(op.matvec(jnp.asarray(v), 0.0))
        errs.append(np.max(np.abs(got - K @ v)))
    assert errs[-1] < 2e-4 * np.max(np.abs(K @ v))
    assert errs[0] > errs[2]  # refinement helps


def test_ski_matvec_2d(rng):
    n = 50
    x = jnp.asarray(rng.uniform(0, 1, size=(n, 2)))
    kern = SquaredExponential(lengthscale=0.4, variance=1.0, dimension=2)
    K = np.asarray(kern.kernel_matrix(x, x))
    v = rng.normal(size=n)
    op = build_ski_operator(x, kern, (40, 40),
                            resolve_grid_bounds(np.asarray(x)))
    got = np.asarray(op.matvec(jnp.asarray(v), 0.0))
    assert np.max(np.abs(got - K @ v)) < 1e-3 * np.max(np.abs(K @ v))


def test_interp_adjoint(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(30, 2)))
    kern = SquaredExponential(lengthscale=0.4, variance=1.0, dimension=2)
    op = build_ski_operator(x, kern, (20, 24),
                            resolve_grid_bounds(np.asarray(x)))
    v = jnp.asarray(rng.normal(size=op.M))
    u = jnp.asarray(rng.normal(size=30))
    lhs = float(jnp.dot(u, op.interp(v)))
    rhs = float(jnp.dot(op.interp_T(u), v))
    assert np.allclose(lhs, rhs, rtol=1e-10)


def test_fit_ski_gp_learns(rng):
    x, y = make_data(rng, n=400, d=1, lengthscale=0.2, variance=1.0,
                     noise=0.05)
    out = fit_ski_gp(np.asarray(x), np.asarray(y), kernel="SE",
                     grid_size=64, max_iters=25, lr=0.1, verbose=False,
                     dtype=jnp.float64, cg_tolerance=1e-6,
                     max_cg_iterations=400, init_lengthscale=0.5,
                     init_noise=0.3)
    hist = out["history"]
    assert len(hist["loss"]) == 25
    assert hist["loss"][-1] < hist["loss"][0]
    # learned noise should head toward the true 0.05
    assert out["history"]["noise"][-1] < 0.25
    # predictions against the dense GP with the same learned hypers
    kern = out["model"]["kernel"]
    noise = float(np.exp(np.asarray(out["model"]["raw"]))[-1])
    xnew = jnp.linspace(0.1, 0.9, 40)[:, None]
    mean = np.asarray(ski_predict_mean(out, xnew))
    mo, _ = dense_gp_posterior(kern, x, y, noise, xnew)
    assert np.max(np.abs(mean - mo)) < 0.05 * max(1.0, np.max(np.abs(mo)))


def test_fit_ski_gp_smoke_2d(rng):
    x, y = make_data(rng, n=300, d=2, lengthscale=0.4)
    out = fit_ski_gp(np.asarray(x), np.asarray(y), kernel="Matern32",
                     target_grid_points=900, max_iters=3, verbose=False,
                     dtype=jnp.float64)
    assert out["settings"]["kernel"] == "matern32"
    assert out["num_train"] == 300
    assert len(out["grid_size"]) == 2
    mean = ski_predict_mean(out, x[:20])
    assert np.all(np.isfinite(np.asarray(mean)))


def test_fit_ski_subsampling(rng):
    x, y = make_data(rng, n=200, d=1)
    out = fit_ski_gp(np.asarray(x), np.asarray(y), max_iters=2,
                     max_train_n=50, verbose=False, dtype=jnp.float64)
    assert out["num_train"] == 50 and out["num_total"] == 200
    assert len(out["train_indices"]) == 50


def test_fit_ski_validates_inputs(rng):
    with pytest.raises(ValueError):
        fit_ski_gp(np.zeros((10,)), np.zeros(10))
    with pytest.raises(ValueError):
        fit_ski_gp(np.zeros((10, 1)), np.zeros(9))
    with pytest.raises(ValueError):
        fit_ski_gp(np.zeros((10, 1)), np.zeros(10), max_iters=0)
    with pytest.raises(ValueError):
        fit_ski_gp(np.zeros((10, 1)), np.zeros(10), kernel="exp")
