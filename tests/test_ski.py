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
                               ski_predict_mean, ski_predict_var,
                               _point_stencils)

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


def test_ski_matvec_3d(rng):
    """d=3 SKI operator (scatter interp path) vs the dense kernel — the
    reference gets this from GPyTorch's GridInterpolationKernel at any d
    (utils/ski.py:181-401)."""
    n = 40
    x = jnp.asarray(rng.uniform(0, 1, size=(n, 3)))
    kern = SquaredExponential(lengthscale=0.5, variance=1.0, dimension=3)
    K = np.asarray(kern.kernel_matrix(x, x))
    v = rng.normal(size=n)
    op = build_ski_operator(x, kern, (16, 16, 16),
                            resolve_grid_bounds(np.asarray(x)))
    got = np.asarray(op.matvec(jnp.asarray(v), 0.0))
    assert np.max(np.abs(got - K @ v)) < 2e-3 * np.max(np.abs(K @ v))


def test_banded_plan_dropped_for_clustered_data(rng):
    """All points in one grid-row band -> cap ~ n per band; the plan must
    fall back to scatter instead of padding every band to n slots."""
    from gpquad.kernels import SquaredExponential
    n = 2000
    x = np.zeros((n, 2))
    x[:, 0] = rng.uniform(-0.01, 0.01, n)         # one row band
    x[:, 1] = rng.uniform(-1, 1, n)
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    op = build_ski_operator(jnp.asarray(x), kern, (64, 64),
                            ((-1.0, 1.0), (-1.0, 1.0)))
    assert op.banded is None
    # operator still works through the scatter/gather path
    u = jnp.asarray(rng.normal(size=n))
    assert np.isfinite(np.asarray(op.interp_T(u))).all()


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


def test_fit_ski_accepts_kernel_instances(rng):
    """Kernel objects from the functional API work directly and seed
    the initial hypers; unsupported nu / foreign objects raise."""
    from gpquad.kernels import Matern
    x, y = make_data(rng, n=200, d=2, lengthscale=0.4)
    k = SquaredExponential(lengthscale=0.37, variance=1.0, dimension=2)
    out = fit_ski_gp(np.asarray(x), np.asarray(y), kernel=k, grid_size=24,
                     max_iters=1, lr=0.0, verbose=False, dtype=jnp.float64)
    assert out["settings"]["kernel"] == "se"
    assert np.isclose(out["history"]["lengthscale"][0], 0.37, rtol=1e-6)
    out = fit_ski_gp(np.asarray(x), np.asarray(y),
                     kernel=Matern(lengthscale=0.3, dimension=2, nu=2.5),
                     grid_size=24, max_iters=1, verbose=False,
                     dtype=jnp.float64)
    assert out["settings"]["kernel"] == "matern52"
    with pytest.raises(ValueError):
        fit_ski_gp(np.asarray(x), np.asarray(y), grid_size=24,
                   kernel=Matern(lengthscale=0.3, dimension=2, nu=0.5))
    with pytest.raises(TypeError):
        fit_ski_gp(np.asarray(x), np.asarray(y), grid_size=24, kernel=42)


def test_ski_predict_var_matches_ski_dense_oracle(rng):
    """ski_predict_var == dense evaluation of the SAME SKI approximation:
    var = k(0) - kstar^T (W K_g W^T + s2 I)^-1 kstar with kstar = W K_g w*.
    (reference surface: gpytorch predictive variance, utils/ski.py:152-178)."""
    n = 80
    x = jnp.asarray(rng.uniform(0, 1, size=(n, 1)))
    kern = SquaredExponential(lengthscale=0.25, variance=1.4, dimension=1)
    y = jnp.asarray(np.sin(5 * np.asarray(x[:, 0]))
                    + 0.05 * rng.normal(size=n))
    sigmasq = 0.04
    bounds = resolve_grid_bounds(np.asarray(x))
    op = build_ski_operator(x, kern, (48,), bounds)
    fit = {"model": {"kernel": kern,
                     "raw": jnp.log(jnp.asarray([0.25, 1.4, sigmasq])),
                     "alpha": jnp.zeros(n, jnp.float64),
                     "operator": op, "toeplitz": op.toeplitz}}
    xnew = jnp.linspace(0.05, 0.95, 33)[:, None]
    got = np.asarray(ski_predict_var(fit, xnew, batch_size=10, cg_tol=1e-12))

    # dense SKI oracle: explicit W, K_g
    M = op.M
    W = np.zeros((n, M))
    W[np.arange(n)[:, None], np.asarray(op.idx)] = np.asarray(op.wvals)
    Kg = np.zeros((M, M))
    eye = np.eye(M)
    Kg = np.stack([np.asarray(op.toeplitz(jnp.asarray(
        eye[i], jnp.complex128)).real) for i in range(M)], axis=0).T
    idx_s, wv_s = _point_stencils(op, xnew, jnp.float64)
    Ws = np.zeros((33, M))
    Ws[np.arange(33)[:, None], np.asarray(idx_s)] = np.asarray(wv_s)
    Kski = W @ Kg @ W.T
    kstar = W @ Kg @ Ws.T                    # (n, 33)
    A = Kski + sigmasq * np.eye(n)
    want = float(kern.kernel(jnp.zeros(()))) - np.sum(
        kstar * np.linalg.solve(A, kstar), axis=0)
    want = np.maximum(want, 0.0)
    assert np.allclose(got, want, rtol=1e-6, atol=1e-10), \
        np.abs(got - want).max()


def test_ski_predict_var_close_to_dense_gp(rng):
    """On a fine grid the SKI variance approximates the vanilla GP's."""
    x, y = make_data(rng, n=300, d=1, lengthscale=0.25, variance=1.0,
                     noise=0.05)
    out = fit_ski_gp(np.asarray(x), np.asarray(y), kernel="SE",
                     grid_size=96, max_iters=1, verbose=False,
                     dtype=jnp.float64, init_lengthscale=0.25,
                     init_outputscale=1.0, init_noise=0.05,
                     cg_tolerance=1e-10, max_cg_iterations=2000)
    xnew = jnp.linspace(0.1, 0.9, 25)[:, None]
    got = np.asarray(ski_predict_var(out, xnew, cg_tol=1e-10))
    kern = out["model"]["kernel"]
    noise = float(np.exp(np.asarray(out["model"]["raw"]))[-1])
    _, vo = dense_gp_posterior(kern, x, y, noise, xnew)
    assert np.max(np.abs(got - vo)) < 0.05 * np.max(vo), (
        np.abs(got - vo).max(), np.max(vo))


def test_interp_T_banded_matches_scatter(rng):
    """The banded (scatter-free) interp_T must equal the scatter-add path
    bit-for-bit up to summation order (VERDICT r2 #8)."""
    import dataclasses
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator
    n = 5000
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    op = build_ski_operator(x, kern, (40, 36), ((-1.0, 1.0), (-1.0, 1.0)))
    assert op.banded is not None
    u = jnp.asarray(rng.normal(size=(3, n)))
    got = np.asarray(op.interp_T(u))
    ref = np.asarray(dataclasses.replace(op, banded=None).interp_T(u))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-10 * max(1.0, np.max(np.abs(ref)))
    # single-vector path too
    got1 = np.asarray(op.interp_T(u[0]))
    assert np.max(np.abs(got1 - ref[0])) < 1e-10


def test_interp_T_pallas_matches_scatter(rng):
    """The Pallas bin-sorted interp_T (interpret mode on CPU) must equal
    the scatter-add path up to summation order."""
    import dataclasses
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator, set_interp_impl
    n = 4000
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    # G2=33+4=37 exercises the column-tile padding; G1=48+4 the band fold
    op = build_ski_operator(x, kern, (48, 33), ((-1.0, 1.0), (-1.0, 1.0)))
    assert op.banded is not None
    u = jnp.asarray(rng.normal(size=(3, n)))
    ref = np.asarray(dataclasses.replace(op, banded=None).interp_T(u))
    set_interp_impl("pallas")
    try:
        got = np.asarray(op.interp_T(u))
        got1 = np.asarray(op.interp_T(u[0]))
    finally:
        set_interp_impl("auto")
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-10 * max(1.0, np.max(np.abs(ref)))
    assert np.max(np.abs(got1 - ref[0])) < 1e-10


def test_interp_pallas_matches_take(rng):
    """The Pallas forward interp (interpret mode on CPU) must equal the
    gather path up to summation order, batched and single-vector."""
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator, set_interp_impl
    n = 4000
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    op = build_ski_operator(x, kern, (48, 33), ((-1.0, 1.0), (-1.0, 1.0)))
    v = jnp.asarray(rng.normal(size=(3, op.M)))
    ref = np.asarray(op.interp(v))
    set_interp_impl("pallas")
    try:
        got = np.asarray(op.interp(v))
        got1 = np.asarray(op.interp(v[0]))
    finally:
        set_interp_impl("auto")
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 1e-10 * max(1.0, np.max(np.abs(ref)))
    assert np.max(np.abs(got1 - ref[0])) < 1e-10
    # adjointness under the pallas pair
    u = jnp.asarray(rng.normal(size=(n,)))
    set_interp_impl("pallas")
    try:
        lhs = float(jnp.dot(u, op.interp(v[0])))
        rhs = float(jnp.dot(op.interp_T(u), v[0]))
    finally:
        set_interp_impl("auto")
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))


def test_interp_T_pallas_wide_grid(rng):
    """Pallas interp_T across >1 column tile (G2 > 512) and >1 point chunk
    per band (cap > cc)."""
    import dataclasses
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator, set_interp_impl
    n = 3000
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    # ext grid (12, 604): 2 bands -> cap ~ 1900 > cc, G2=604 -> 2 col tiles
    op = build_ski_operator(x, kern, (8, 600), ((-1.0, 1.0), (-1.0, 1.0)))
    u = jnp.asarray(rng.normal(size=(2, n)))
    v = jnp.asarray(rng.normal(size=(2, op.M)))
    ref = np.asarray(dataclasses.replace(op, banded=None).interp_T(u))
    ref_f = np.asarray(op.interp(v))
    set_interp_impl("pallas")
    try:
        got = np.asarray(op.interp_T(u))
        got_f = np.asarray(op.interp(v))
    finally:
        set_interp_impl("auto")
    assert np.max(np.abs(got - ref)) < 1e-10 * max(1.0, np.max(np.abs(ref)))
    assert np.max(np.abs(got_f - ref_f)) < 1e-10 * max(1.0,
                                                       np.max(np.abs(ref_f)))


def test_interp_pallas_batch_tiled(rng):
    """Pallas interp kernels across >1 batch tile (B > _batch_tile's
    bb_max=16, incl. a non-multiple-of-8 batch that forces padding) —
    the VMEM-bound regime that crashed on real hardware at B=200."""
    import dataclasses
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator, set_interp_impl
    from gpquad.ops.pallas_interp import _batch_tile
    assert _batch_tile(4) == (4, 1)
    assert _batch_tile(16) == (16, 1)
    assert _batch_tile(200) == (16, 13)
    n = 2500
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)))
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    op = build_ski_operator(x, kern, (40, 40), ((-1.0, 1.0), (-1.0, 1.0)))
    for B in (21, 40):
        u = jnp.asarray(rng.normal(size=(B, n)))
        v = jnp.asarray(rng.normal(size=(B, op.M)))
        ref = np.asarray(dataclasses.replace(op, banded=None).interp_T(u))
        ref_f = np.asarray(op.interp(v))
        set_interp_impl("pallas")
        try:
            got = np.asarray(op.interp_T(u))
            got_f = np.asarray(op.interp(v))
        finally:
            set_interp_impl("auto")
        assert got.shape == ref.shape and got_f.shape == ref_f.shape
        assert np.max(np.abs(got - ref)) < 1e-10 * max(1.0,
                                                       np.max(np.abs(ref)))
        assert np.max(np.abs(got_f - ref_f)) < 1e-10 * max(
            1.0, np.max(np.abs(ref_f)))


def test_interp_forward_stacked_matches_classic(rng):
    """The stacked forward-kernel layout (one (bb*rows, tw) x (tw, cc)
    MXU dot per step, VERDICT r4 #6) computes the same values as the
    per-lane classic layout (interpret mode; the chip run is gated on
    real-hardware validation — CLAUDE.md Mosaic rules)."""
    import jax.numpy as jnp
    from gpquad.ops import pallas_interp as pi
    G2, bh, nbands, cap, B = 256, 13, 8, 512, 5
    vs = jnp.asarray(rng.normal(size=(B, nbands, bh + 3, G2)), jnp.float32)
    i0 = jnp.asarray(rng.integers(0, bh, (nbands, cap)), jnp.int32)
    c0 = jnp.asarray(rng.integers(0, G2 - 4, (nbands, cap)), jnp.int32)
    wr = jnp.asarray(rng.normal(size=(nbands, cap, 4)), jnp.float32)
    wc = jnp.asarray(rng.normal(size=(nbands, cap, 4)), jnp.float32)
    a = pi.pallas_interp_2d(vs, i0, c0, wr, wc, bh=bh, interpret=True,
                            stacked=False)
    b = pi.pallas_interp_2d(vs, i0, c0, wr, wc, bh=bh, interpret=True,
                            stacked=True)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-4
