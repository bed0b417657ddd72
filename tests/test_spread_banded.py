"""Banded (scatter-free) spread NUFFT tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.ops.nufft import make_nufft
from gpquad.ops.spread_banded import (banded_nufft1_2d, banded_nufft2_2d,
                                      banded_plan_cap)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, mtot, h = 2500, 23, 0.31
    x = jnp.asarray(rng.uniform(-2, 2, (n, 2)))
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)))
    cap = banded_plan_cap(np.asarray(x), h, mtot, w=8)
    op = make_nufft(x, h, mtot)
    return x, v, f, op, mtot, h, cap


def test_banded_type1_matches_exact(setup):
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded_type2_matches_exact(setup):
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(banded_nufft2_2d(x, f, h, mtot=mtot, w=8, cap=cap))
    want = np.asarray(op.type2(f))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded_matches_scatter_spread(setup):
    """Identical algorithm, different data movement: banded == scatter."""
    from gpquad.ops.spread_nufft import spread_nufft1_2d
    x, v, f, op, mtot, h, cap = setup
    b = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    s = np.asarray(spread_nufft1_2d(x, v, h, mtot=mtot, w=8))
    assert np.abs(b - s).max() < 1e-10 * np.abs(s).max()


def test_cap_chunking(setup):
    """cap > 512 triggers the scan over cap-chunks; results identical."""
    x, v, f, op, mtot, h, cap = setup
    a = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8, cap=cap))
    b = np.asarray(banded_nufft1_2d(x, v, h, mtot=mtot, w=8,
                                    cap=max(cap, 520)))
    assert np.abs(a - b).max() < 1e-10 * np.abs(a).max()


def test_plan_cap_reasonable():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 10, (10000, 2))
    cap = banded_plan_cap(x, 0.31, 23, w=8)
    # uniform torus coverage: cap near mean occupancy * slack
    from gpquad.ops.spread_banded import _geometry
    nf, bh, nbands = _geometry(23, 8)
    mean_occ = 10000 / nbands
    assert cap < 3 * mean_occ
    assert cap % 8 == 0


def test_wider_kernel_more_accurate(setup):
    x, v, f, op, mtot, h, cap = setup
    want = np.asarray(op.type1(v))
    e6 = np.abs(np.asarray(banded_nufft1_2d(
        x, v, h, mtot=mtot, w=6,
        cap=banded_plan_cap(np.asarray(x), h, mtot, w=6))) - want).max()
    e10 = np.abs(np.asarray(banded_nufft1_2d(
        x, v, h, mtot=mtot, w=10,
        cap=banded_plan_cap(np.asarray(x), h, mtot, w=10))) - want).max()
    assert e10 < e6


def test_banded_backend_integrates_fit_and_gradient():
    """nufft_method='banded' must run end-to-end through fit/gradient and
    match the exact MXU backend (VERDICT r1: unreachable backends don't
    count as integrated)."""
    import jax
    import jax.numpy as jnp
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import fit_with_grid, predict_mean
    from gpquad.models.gradient import gradient_with_grid
    from gpquad.models.efgp import plan_nufft_caps

    rng = np.random.default_rng(3)
    n, d, mtot, h = 3000, 2, 11, jnp.asarray(0.33, jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    kernel = SquaredExponential(lengthscale=jnp.float32(0.25),
                                variance=jnp.float32(1.0), dimension=d)
    st_b = fit_with_grid(x, y, kernel, 0.1, h, mtot, nufft_method="banded")
    st_m = fit_with_grid(x, y, kernel, 0.1, h, mtot, nufft_method="mxu")
    xt = jnp.asarray(rng.uniform(0.1, 0.9, (64, d)), jnp.float32)
    mb = np.asarray(predict_mean(st_b, xt))
    mm = np.asarray(predict_mean(st_m, xt))
    assert np.max(np.abs(mb - mm)) < 1e-4 * max(1.0, np.max(np.abs(mm)))

    T = 4
    Z = jnp.asarray(rng.integers(0, 2, (T, n)) * 2 - 1, dtype=jnp.float32)
    V = jnp.asarray(rng.integers(0, 2, (T, mtot ** d)) * 2 - 1,
                    dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    caps = plan_nufft_caps(x, float(h), mtot)
    g_b = gradient_with_grid(x, y, kernel, 0.1, h, key, mtot=mtot,
                             trace_samples=T, probes=(Z, V),
                             nufft_method="banded", nufft_caps=caps)
    g_m = gradient_with_grid(x, y, kernel, 0.1, h, key, mtot=mtot,
                             trace_samples=T, probes=(Z, V),
                             nufft_method="mxu")
    gb, gm = np.asarray(g_b.grad), np.asarray(g_m.grad)
    assert np.max(np.abs(gb - gm)) < 1e-3 * max(1.0, np.max(np.abs(gm)))


def test_banded_cap_overflow_poisons():
    """Occupancy beyond the static cap must NaN-poison, never silently
    drop points (ADVICE r1)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(0, 0.01, (500, 2)), jnp.float32)  # one band
    v = jnp.asarray(rng.normal(size=500), jnp.float32)
    out = np.asarray(banded_nufft1_2d(x, v, 0.31, mtot=11, w=8, cap=64))
    assert np.all(np.isnan(out.real))


# ---------------------------------------------------------------------------
# d = 3 ((x, y)-tiled, dense z)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def setup3d():
    from gpquad.ops.spread_banded import banded_plan_cap_3d
    rng = np.random.default_rng(1)
    n, mtot, h = 1500, 11, 0.29
    x = jnp.asarray(rng.uniform(-2, 2, (n, 3)))
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    f = jnp.asarray(rng.normal(size=(mtot,) * 3)
                    + 1j * rng.normal(size=(mtot,) * 3))
    cap = banded_plan_cap_3d(np.asarray(x), h, mtot, w=8)
    op = make_nufft(x, h, mtot)
    return x, v, f, op, mtot, h, cap


def test_banded3d_type1_matches_exact(setup3d):
    from gpquad.ops.spread_banded import banded_nufft1_3d
    x, v, f, op, mtot, h, cap = setup3d
    got = np.asarray(banded_nufft1_3d(x, v, h, mtot=mtot, w=8, cap=cap))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded3d_type2_matches_exact(setup3d):
    from gpquad.ops.spread_banded import banded_nufft2_3d
    x, v, f, op, mtot, h, cap = setup3d
    got = np.asarray(banded_nufft2_3d(x, f.reshape(-1), h, mtot=mtot, w=8,
                                      cap=cap))
    want = np.asarray(op.type2(f))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_banded3d_adjoint(setup3d):
    """<F* v, f> == <v, F f>: type-1 and type-2 are exact adjoints."""
    from gpquad.ops.spread_banded import (banded_nufft1_3d,
                                          banded_nufft2_3d)
    x, v, f, op, mtot, h, cap = setup3d
    t1 = banded_nufft1_3d(x, v, h, mtot=mtot, w=8, cap=cap)
    t2 = banded_nufft2_3d(x, f.reshape(-1), h, mtot=mtot, w=8, cap=cap)
    lhs = complex(jnp.sum(jnp.conj(t1) * f))
    rhs = complex(jnp.sum(jnp.conj(v) * t2))
    assert abs(lhs - rhs) < 1e-6 * abs(lhs)


def test_banded3d_facade_and_batch(setup3d):
    x, v, f, op, mtot, h, cap = setup3d
    nb = make_nufft(x, h, mtot, method="banded")
    assert nb.d == 3 and nb.cap == cap
    got = np.asarray(nb.type1(v))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()
    fb = jnp.stack([f.reshape(-1), 2.0 * f.reshape(-1)])
    got2 = np.asarray(nb.type2(fb))
    want2 = np.asarray(op.type2(fb))
    assert np.abs(got2 - want2).max() < 1e-6 * np.abs(want2).max()


def test_banded3d_cap_overflow_poisons(setup3d):
    from gpquad.ops.spread_banded import banded_nufft1_3d
    x, v, f, op, mtot, h, cap = setup3d
    out = banded_nufft1_3d(x, v, h, mtot=mtot, w=8, cap=8)
    assert np.isnan(np.asarray(out).real).any()


# ---------------------------------------------------------------------------
# subproblem-scheduled (adaptive occupancy, static data-free planning)
# ---------------------------------------------------------------------------

def test_sub_type1_matches_exact(setup):
    from gpquad.ops.spread_banded import sub_nufft1_2d
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(sub_nufft1_2d(x, v, h, mtot=mtot, w=8, cc=64, sc=8))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_sub_type2_matches_exact(setup):
    from gpquad.ops.spread_banded import sub_nufft2_2d
    x, v, f, op, mtot, h, cap = setup
    got = np.asarray(sub_nufft2_2d(x, f, h, mtot=mtot, w=8, cc=64, sc=8))
    want = np.asarray(op.type2(f))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_sub_clustered_points():
    """Concentrated data (all points in 4% of the fine grid) — the regime
    the per-band cap wastes ~25x on; the subproblem path must stay
    exact."""
    from gpquad.ops.spread_banded import sub_nufft1_2d, sub_nufft2_2d
    rng = np.random.default_rng(7)
    n, mtot, h = 3000, 21, 0.2
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)))    # x*h spans 20% per axis
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    op = make_nufft(x, h, mtot)
    got = np.asarray(sub_nufft1_2d(x, v, h, mtot=mtot, cc=64, sc=8))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()
    f = jnp.asarray(rng.normal(size=(mtot, mtot))
                    + 1j * rng.normal(size=(mtot, mtot)))
    got2 = np.asarray(sub_nufft2_2d(x, f, h, mtot=mtot, cc=64, sc=8))
    want2 = np.asarray(op.type2(f))
    assert np.abs(got2 - want2).max() < 1e-6 * np.abs(want2).max()


def test_sub_single_band_degenerate():
    """Everything in ONE band (max imbalance): subproblem count collapses
    to ceil(n/cc) live subproblems and results stay exact."""
    from gpquad.ops.spread_banded import sub_nufft1_2d
    rng = np.random.default_rng(8)
    n, mtot, h = 500, 17, 0.02
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    op = make_nufft(x, h, mtot)
    got = np.asarray(sub_nufft1_2d(x, v, h, mtot=mtot, cc=32, sc=4))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_sub_facade_batch_and_traced(setup):
    """make_nufft(method='sub'): facade parity, batch handling, and the
    differentiator — construction under jit with TRACED points (banded
    would demand a static host-planned cap)."""
    from gpquad.ops.spread_banded import SubNUFFT
    x, v, f, op, mtot, h, cap = setup
    ns = make_nufft(x, h, mtot, method="sub")
    assert isinstance(ns, SubNUFFT) and ns.d == 2
    got = np.asarray(ns.type1(v))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()
    fb = jnp.stack([f.reshape(-1), 3.0 * f.reshape(-1)])
    got2 = np.asarray(ns.type2(fb))
    want2 = np.asarray(op.type2(fb))
    assert np.abs(got2 - want2).max() < 1e-6 * np.abs(want2).max()

    @jax.jit
    def through_jit(xt, vt):
        return make_nufft(xt, h, mtot, method="sub").type1(vt)

    got3 = np.asarray(through_jit(x, v))
    assert np.abs(got3 - want).max() < 1e-6 * np.abs(want).max()


def test_sub_fit_end_to_end():
    """fit_with_grid(nufft_method='sub') agrees with the MXU path."""
    from gpquad.models.efgp import fit_with_grid, predict_mean
    from gpquad.kernels import SquaredExponential
    rng = np.random.default_rng(11)
    n = 1200
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(x[:, 0]))
                    + 0.1 * rng.normal(size=n))
    kern = SquaredExponential(lengthscale=jnp.asarray(0.2),
                              variance=jnp.asarray(1.0), dimension=2)
    s_mxu = fit_with_grid(x, y, kern, 0.01, 0.12, 17)
    s_sub = fit_with_grid(x, y, kern, 0.01, 0.12, 17, nufft_method="sub")
    xn = jnp.asarray(rng.uniform(0, 1, (200, 2)))
    m1 = np.asarray(predict_mean(s_mxu, xn))
    m2 = np.asarray(predict_mean(s_sub, xn))
    assert np.abs(m1 - m2).max() < 1e-6 * max(1.0, np.abs(m1).max())


# ---------------------------------------------------------------------------
# d = 3 subproblem-scheduled
# ---------------------------------------------------------------------------

def test_sub3d_type1_matches_exact(setup3d):
    from gpquad.ops.spread_banded import sub_nufft1_3d
    x, v, f, op, mtot, h, cap = setup3d
    got = np.asarray(sub_nufft1_3d(x, v, h, mtot=mtot, w=8, cc=64, sc=4))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_sub3d_type2_matches_exact(setup3d):
    from gpquad.ops.spread_banded import sub_nufft2_3d
    x, v, f, op, mtot, h, cap = setup3d
    got = np.asarray(sub_nufft2_3d(x, f.reshape(-1), h, mtot=mtot, w=8,
                                   cc=64, sc=4))
    want = np.asarray(op.type2(f))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()


def test_sub3d_clustered_points():
    """Concentrated d=3 data (points in ~3% of the tiles): the regime the
    static tile cap wastes on; subproblem scheduling must stay exact."""
    from gpquad.ops.spread_banded import sub_nufft1_3d, sub_nufft2_3d
    rng = np.random.default_rng(9)
    n, mtot, h = 2000, 13, 0.15
    x = jnp.asarray(rng.uniform(0, 1, (n, 3)))    # x*h spans 15% per axis
    v = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    op = make_nufft(x, h, mtot)
    got = np.asarray(sub_nufft1_3d(x, v, h, mtot=mtot, cc=64, sc=4))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()
    f = jnp.asarray(rng.normal(size=(mtot,) * 3)
                    + 1j * rng.normal(size=(mtot,) * 3))
    got2 = np.asarray(sub_nufft2_3d(x, f.reshape(-1), h, mtot=mtot,
                                    cc=64, sc=4))
    want2 = np.asarray(op.type2(f))
    assert np.abs(got2 - want2).max() < 1e-6 * np.abs(want2).max()


def test_sub3d_facade_batch_and_traced(setup3d):
    """make_nufft(method='sub') at d=3: facade parity, batching, and
    construction under jit with traced points (data-free planning)."""
    from gpquad.ops.spread_banded import SubNUFFT3D
    x, v, f, op, mtot, h, cap = setup3d
    ns = make_nufft(x, h, mtot, method="sub")
    assert isinstance(ns, SubNUFFT3D) and ns.d == 3
    got = np.asarray(ns.type1(v))
    want = np.asarray(op.type1(v))
    assert np.abs(got - want).max() < 1e-6 * np.abs(want).max()
    fb = jnp.stack([f.reshape(-1), 2.0 * f.reshape(-1)])
    got2 = np.asarray(ns.type2(fb))
    want2 = np.asarray(op.type2(fb))
    assert np.abs(got2 - want2).max() < 1e-6 * np.abs(want2).max()

    @jax.jit
    def through_jit(xj, vj):
        return make_nufft(xj, h, mtot, method="sub").type1(vj)

    got3 = np.asarray(through_jit(x, v))
    assert np.abs(got3 - want).max() < 1e-6 * np.abs(want).max()
