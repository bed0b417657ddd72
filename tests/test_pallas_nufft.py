"""Fused Pallas NUFFT kernel tests (interpreter mode on CPU; the same
kernels compile on TPU where they were validated against the f64 oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.nufft import make_nufft
from gpquad.ops.pallas_nufft import (_cos_sin_cycles, pallas_nufft1_2d,
                                     pallas_nufft2_2d)

from .test_nufft import dense_F


def test_polynomial_cos_sin():
    c = jnp.asarray(np.linspace(-0.5, 0.5, 10001))
    co, s = _cos_sin_cycles(c)
    assert np.max(np.abs(np.asarray(co) - np.cos(2 * np.pi * np.asarray(c)))) < 1e-7
    assert np.max(np.abs(np.asarray(s) - np.sin(2 * np.pi * np.asarray(c)))) < 1e-7


def test_pallas_type2_matches_dense(rng):
    n, mtot, h = 700, 9, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)), jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft2_2d(x, f, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs(F @ np.asarray(f).reshape(-1))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_pallas_type1_matches_dense(rng):
    n, mtot, h = 700, 9, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n),
                    jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs((F.conj().T @ np.asarray(v)).reshape(mtot, mtot))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_pallas_matches_mxu_path(rng):
    """Pallas and MXU paths implement the identical operator."""
    n, mtot, h = 1100, 7, 0.23
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    op = make_nufft(x, h, mtot)
    f = jnp.asarray(rng.normal(size=(mtot, mtot)), jnp.complex64)
    a = np.asarray(jnp.abs(pallas_nufft2_2d(x, f, h, mtot=mtot, tile=512)))
    b = np.asarray(jnp.abs(op.type2(f)))
    assert np.max(np.abs(a - b)) < 5e-5 * b.max()


def test_pallas_ragged_tile(rng):
    """n not divisible by the tile: padding rows must not contaminate."""
    n, mtot, h = 513, 5, 0.4
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    v = jnp.asarray(rng.normal(size=n), jnp.complex64)
    got = np.asarray(jnp.abs(pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)))
    F = dense_F(np.asarray(x), h, mtot)
    want = np.abs((F.conj().T @ np.asarray(v)).reshape(mtot, mtot))
    assert np.max(np.abs(got - want)) < 2e-4 * want.max()


def test_mode_tiled_kernels(rng):
    """mtot > _MODE_TILE dispatches the tiled kernels; results match."""
    from gpquad.ops.pallas_nufft import _MODE_TILE
    n, mtot, h = 600, _MODE_TILE + 45, 0.011
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    op = make_nufft(x, h, mtot)
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n),
                    jnp.complex64)
    got1 = pallas_nufft1_2d(x, v, h, mtot=mtot, tile=256)
    want1 = op.type1(v)
    assert float(jnp.max(jnp.abs(got1 - want1))
                 / jnp.max(jnp.abs(want1))) < 5e-5
    f = jnp.asarray(rng.normal(size=(mtot, mtot)), jnp.complex64)
    got2 = pallas_nufft2_2d(x, f, h, mtot=mtot, tile=256)
    want2 = op.type2(f)
    assert float(jnp.max(jnp.abs(got2 - want2))
                 / jnp.max(jnp.abs(want2))) < 5e-5


def test_pallas_fft_order_matches_mxu(rng):
    """fft_order=True (modeord=True, the stochastic-variance evaluation
    ordering, reference efgpnd.py:1666-1679) matches the MXU path."""
    n, mtot, h = 500, 31, 0.05
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    mxu = make_nufft(x, h, mtot, fft_order=True)
    pal = make_nufft(x, h, mtot, fft_order=True, method="pallas")
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)), jnp.complex64)
    got = np.asarray(pal.type2(f))
    want = np.asarray(mxu.type2(f))
    assert np.max(np.abs(got - want)) < 5e-5 * np.max(np.abs(want))
    v = jnp.asarray(rng.normal(size=n), jnp.complex64)
    got1 = np.asarray(pal.type1(v))
    want1 = np.asarray(mxu.type1(v)).reshape(mtot, mtot)
    assert np.max(np.abs(got1 - want1)) < 5e-5 * np.max(np.abs(want1))


def test_pallas_fft_order_mode_tiled(rng):
    """fft_order survives the mode-tiled dispatch (padded k region)."""
    from gpquad.ops.pallas_nufft import _MODE_TILE, pallas_nufft2_2d
    n, mtot, h = 300, _MODE_TILE + 17, 0.008
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    mxu = make_nufft(x, h, mtot, fft_order=True)
    f = jnp.asarray(rng.normal(size=(mtot, mtot)), jnp.complex64)
    got = np.asarray(pallas_nufft2_2d(x, f, h, mtot=mtot, tile=256,
                                      fft_order=True))
    want = np.asarray(mxu.type2(f))
    assert np.max(np.abs(got - want)) < 5e-5 * np.max(np.abs(want))


def test_stochastic_variance_pallas_evaluation(rng):
    """predict_var(..., nufft_method='pallas') == the MXU evaluation of the
    same lag sums (same key -> same probes)."""
    from gpquad.models.efgp import fit_with_grid, predict_var
    from gpquad.kernels import SquaredExponential
    n = 400
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), jnp.float32)
    y = jnp.asarray(np.sin(4 * np.asarray(x[:, 0])), jnp.float32)
    kern = SquaredExponential(lengthscale=jnp.float32(0.25),
                              variance=jnp.float32(1.0), dimension=2)
    st = fit_with_grid(x, y, kern, 0.05, jnp.float32(0.3), 9, cg_tol=1e-8)
    xq = jnp.asarray(rng.uniform(0, 1, (50, 2)), jnp.float32)
    key = jax.random.PRNGKey(3)
    v_mxu = np.asarray(predict_var(st, xq, method="stochastic", key=key,
                                   probes=64, cg_tol=1e-8))
    v_pal = np.asarray(predict_var(st, xq, method="stochastic", key=key,
                                   probes=64, cg_tol=1e-8,
                                   nufft_method="pallas"))
    assert np.max(np.abs(v_mxu - v_pal)) < 5e-5 * max(np.max(np.abs(v_mxu)),
                                                      1e-6)


def test_pallas_1d_matches_mxu(rng):
    from gpquad.ops.pallas_nufft import pallas_nufft1_1d, pallas_nufft2_1d
    n, mtot, h = 700, 41, 0.07
    x = jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32)
    for fo in (False, True):
        mxu = make_nufft(x, h, mtot, fft_order=fo)
        f = jnp.asarray(rng.normal(size=mtot) + 1j * rng.normal(size=mtot),
                        jnp.complex64)
        got = np.asarray(pallas_nufft2_1d(x, f, h, mtot=mtot, fft_order=fo))
        want = np.asarray(mxu.type2(f))
        assert np.max(np.abs(got - want)) < 5e-5 * np.max(np.abs(want)), fo
        v = jnp.asarray(rng.normal(size=n), jnp.complex64)
        got1 = np.asarray(pallas_nufft1_1d(x, v, h, mtot=mtot, fft_order=fo))
        want1 = np.asarray(mxu.type1(v))
        assert np.max(np.abs(got1 - want1)) < 5e-5 * np.max(np.abs(want1)), fo


def test_pallas_3d_matches_mxu(rng):
    from gpquad.ops.pallas_nufft import pallas_nufft1_3d, pallas_nufft2_3d
    n, mtot, h = 400, 9, 0.11
    x = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    for fo in (False, True):
        mxu = make_nufft(x, h, mtot, fft_order=fo)
        f = jnp.asarray(rng.normal(size=(mtot,) * 3)
                        + 1j * rng.normal(size=(mtot,) * 3), jnp.complex64)
        got = np.asarray(pallas_nufft2_3d(x, f, h, mtot=mtot, fft_order=fo))
        want = np.asarray(mxu.type2(f))
        assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want)), fo
        v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n),
                        jnp.complex64)
        got1 = np.asarray(pallas_nufft1_3d(x, v, h, mtot=mtot, fft_order=fo))
        want1 = np.asarray(mxu.type1(v))
        assert np.max(np.abs(got1 - want1)) < 1e-4 * np.max(np.abs(want1)), fo


def test_pallas_backend_dispatch_1d_3d(rng):
    """make_nufft(method='pallas') round-trips d=1 and d=3 through the
    duck-typed interface (batched type1/type2 included)."""
    for d, mtot in ((1, 21), (3, 7)):
        n, h = 150, 0.2
        x = jnp.asarray(rng.uniform(-1, 1, (n, d)), jnp.float32)
        pal = make_nufft(x, h, mtot, method="pallas")
        mxu = make_nufft(x, h, mtot)
        V = jnp.asarray(rng.normal(size=(3, n)), jnp.complex64)
        got = np.asarray(pal.type1(V))
        want = np.asarray(mxu.type1(V))
        assert got.shape == want.shape
        assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want)), d
        F = jnp.asarray(rng.normal(size=(2, mtot ** d)), jnp.complex64)
        got2 = np.asarray(pal.type2(F))
        want2 = np.asarray(mxu.type2(F))
        assert np.max(np.abs(got2 - want2)) < 1e-4 * np.max(np.abs(want2)), d


def test_pallas_3d_mtot_cap():
    from gpquad.ops.pallas_nufft import _D3_TILED_MAX, pallas_nufft2_3d
    x = jnp.zeros((4, 3), jnp.float32)
    f = jnp.zeros(((_D3_TILED_MAX + 2) ** 3,), jnp.complex64)
    with pytest.raises(NotImplementedError):
        pallas_nufft2_3d(x, f, 0.1, mtot=_D3_TILED_MAX + 2)


def test_pallas_3d_tiled_matches_mxu(rng):
    """Past the single-block VMEM bound (mtot > 56) the d=3 kernels
    dispatch to the j1-slab mode-tiled variants (VERDICT r2 #5)."""
    from gpquad.ops.pallas_nufft import (_D3_MAX_MTOT, pallas_nufft1_3d,
                                         pallas_nufft2_3d)
    n, mtot, h = 96, 61, 0.11
    assert mtot > _D3_MAX_MTOT
    x = jnp.asarray(rng.uniform(-1, 1, (n, 3)), jnp.float32)
    mxu = make_nufft(x, h, mtot)
    f = jnp.asarray(rng.normal(size=(mtot,) * 3), jnp.complex64)
    got = np.asarray(pallas_nufft2_3d(x, f, h, mtot=mtot))
    want = np.asarray(mxu.type2(f))
    assert np.max(np.abs(got - want)) < 1e-4 * np.max(np.abs(want))
    v = jnp.asarray(rng.normal(size=n), jnp.complex64)
    got1 = np.asarray(pallas_nufft1_3d(x, v, h, mtot=mtot))
    want1 = np.asarray(mxu.type1(v))
    assert np.max(np.abs(got1 - want1)) < 1e-4 * np.max(np.abs(want1))


def test_pallas_batched_kernels_match_map(rng):
    """In-kernel batched d=2 applies == per-element launches == MXU."""
    n, mtot, h, B = 400, 25, 0.06, 5
    x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    pal = make_nufft(x, h, mtot, method="pallas")
    mxu = make_nufft(x, h, mtot)
    assert pal._batched_fits(B)
    V = jnp.asarray(rng.normal(size=(B, n)) + 1j * rng.normal(size=(B, n)),
                    jnp.complex64)
    got = np.asarray(pal.type1(V))
    want = np.asarray(mxu.type1(V))
    assert got.shape == want.shape
    assert np.max(np.abs(got - want)) < 5e-5 * np.max(np.abs(want))
    F = jnp.asarray(rng.normal(size=(B, mtot * mtot)), jnp.complex64)
    got2 = np.asarray(pal.type2(F))
    want2 = np.asarray(mxu.type2(F))
    assert np.max(np.abs(got2 - want2)) < 5e-5 * np.max(np.abs(want2))
    # 3-D leading batch reshapes
    F3 = F.reshape(B, mtot, mtot)
    got3 = np.asarray(pal.type2(F3))
    assert np.allclose(got3, got2)
