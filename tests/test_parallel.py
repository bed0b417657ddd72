"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The reference has no distributed path (SURVEY §2.4); these tests pin the
new capability's correctness: sharded execution must be numerically
identical (up to reduction order) to single-device execution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_mean
from gpquad.models.gradient import gradient_with_grid
from gpquad.parallel import (make_mesh, shard_points, sharded_fit,
                             sharded_gradient)
from gpquad.quadrature import spectral_grid

from .test_efgp import make_data

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(0)
    x, y = make_data(rng, n=256, d=2, lengthscale=0.3, variance=1.0)
    kernel = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    _, h, mtot = spectral_grid(kernel, 1e-3, 1.0)
    return x, y, kernel, h, mtot


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    mesh2 = make_mesh(8, axes=("dp", "probe"), shape=(4, 2))
    assert dict(zip(mesh2.axis_names, mesh2.devices.shape)) == {
        "dp": 4, "probe": 2}


def test_sharded_fit_matches_single(problem):
    x, y, kernel, h, mtot = problem
    ref = fit_with_grid(x, y, kernel, 0.1, h, mtot, cg_tol=1e-10)
    mesh = make_mesh(8)
    st = sharded_fit(x, y, kernel, 0.1, h, mtot, mesh, cg_tol=1e-10)
    assert np.allclose(np.asarray(jnp.abs(st.beta - ref.beta)), 0.0,
                       atol=1e-8)
    # prediction from the sharded state
    xnew = x[:31]
    m1 = np.asarray(predict_mean(ref, xnew))
    m2 = np.asarray(predict_mean(st, xnew))
    assert np.allclose(m1, m2, atol=1e-8)


def test_sharded_gradient_matches_single(problem):
    x, y, kernel, h, mtot = problem
    rng = np.random.default_rng(1)
    T = 8
    Z = jnp.asarray(rng.integers(0, 2, (T, x.shape[0])) * 2.0 - 1)
    V = jnp.asarray(rng.integers(0, 2, (T, mtot**2)) * 2.0 - 1)
    ref = gradient_with_grid(x, y, kernel, 0.1, h, jax.random.PRNGKey(0),
                             mtot=mtot, trace_samples=T, cg_tol=1e-10,
                             probes=(Z, V))
    mesh = make_mesh(8, axes=("dp", "probe"), shape=(4, 2))
    xs = shard_points(x, mesh)
    ys = shard_points(y, mesh)
    Zs = jax.device_put(Z, NamedSharding(mesh, P("probe", "dp")))
    Vs = jax.device_put(V, NamedSharding(mesh, P("probe", None)))
    res = gradient_with_grid(xs, ys, kernel, 0.1, h, jax.random.PRNGKey(0),
                             mtot=mtot, trace_samples=T, cg_tol=1e-10,
                             probes=(Zs, Vs))
    assert np.allclose(np.asarray(res.grad), np.asarray(ref.grad),
                       rtol=1e-6), (np.asarray(res.grad),
                                    np.asarray(ref.grad))


def test_sharded_gradient_wrapper(problem):
    x, y, kernel, h, mtot = problem
    mesh = make_mesh(8, axes=("dp", "probe"), shape=(4, 2))
    res = sharded_gradient(x, y, kernel, 0.1, h, jax.random.PRNGKey(0),
                           mesh=mesh, mtot=mtot, trace_samples=4,
                           cg_tol=1e-8)
    assert np.all(np.isfinite(np.asarray(res.grad)))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
