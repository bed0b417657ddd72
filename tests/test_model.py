"""EFGP model facade tests (model: reference EFGPND behavior,
efgpnd.py:336-1226, and test_parameter_access.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models.model import EFGP

from .test_efgp import dense_gp_posterior, make_data


def test_predict_matches_functional_path(rng):
    x, y = make_data(rng, n=120, d=1, lengthscale=0.25, variance=1.5)
    model = EFGP(x, y, "SE", sigmasq=0.2, eps=1e-5, estimate_params=False,
                 opts={"cg_tolerance": 1e-10})
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([0.25, 1.5, 0.2])))
    xnew = jnp.linspace(0.1, 0.9, 30)[:, None]
    mean, var = model.predict(xnew, variance_method="regular")
    mo, vo = dense_gp_posterior(model.kernel, x, y, 0.2, xnew)
    assert np.max(np.abs(np.asarray(mean) - mo)) < 1e-4 * np.max(np.abs(mo))
    assert np.max(np.abs(np.asarray(var) - vo)) < 1e-3


def test_string_kernel_and_estimation(rng):
    x, y = make_data(rng, n=100, d=2)
    model = EFGP(x, y, "Matern32", eps=1e-3)
    assert model.kernel.nu == 1.5
    # estimated hypers are positive and sensible
    p = np.exp(np.asarray(model.params.raw))
    assert np.all(p > 0)
    mean, var = model.predict(x[:10])
    assert np.asarray(mean).shape == (10,)


def test_fit_cache_invalidation(rng):
    x, y = make_data(rng, n=80, d=1)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-3, estimate_params=False)
    model.fit()
    state1 = model._state
    model.fit()
    assert model._state is state1  # cache hit
    # change a hyper -> refit (reference _params_changed, efgpnd.py:537-571)
    model.params = model.params.replace_raw(
        model.params.raw.at[0].add(0.05))
    model.fit()
    assert model._state is not state1


def test_compute_gradients_log_space_chain_rule(rng):
    x, y = make_data(rng, n=70, d=1)
    model = EFGP(x, y, "SE", sigmasq=0.15, eps=1e-3, estimate_params=False)
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([0.25, 1.3, 0.15])))
    T = 4
    Z = jnp.asarray(rng.integers(0, 2, (T, 70)) * 2 - 1, dtype=jnp.float64)
    mtot = model._grid_plan(True)[1]
    V = jnp.asarray(rng.integers(0, 2, (T, mtot)) * 2 - 1, dtype=jnp.float64)
    graw = model.compute_gradients(trace_samples=T, probes=(Z, V),
                                   cg_tol=1e-10)
    from gpquad.models.gradient import gradient_with_grid
    h, mtot2, hm = model._grid_plan(True)
    from gpquad.quadrature import padded_grid_mask
    _, mask = padded_grid_mask(mtot2, hm, h)
    res = gradient_with_grid(model.x, model.y, model.kernel, model.sigmasq,
                             h, jax.random.PRNGKey(0), mtot=mtot2,
                             trace_samples=T, cg_tol=1e-10, probes=(Z, V),
                             ws_mask=mask)
    want = np.asarray(res.grad) * np.exp(np.asarray(model.params.raw))
    assert np.allclose(np.asarray(graw), want, rtol=1e-9)


def test_optimize_hyperparameters_improves_nll(rng):
    x, y = make_data(rng, n=150, d=1, lengthscale=0.2, variance=1.0,
                     noise=0.1)
    model = EFGP(x, y, "SE", sigmasq=0.5, eps=1e-3, estimate_params=False)
    # deliberately bad init
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([0.6, 0.3, 0.5])))

    def dense_nll():
        k = model.kernel
        K = np.asarray(k.kernel_matrix(x, x))
        C = K + float(model.sigmasq) * np.eye(len(np.asarray(y)))
        sign, logdet = np.linalg.slogdet(C)
        return 0.5 * (np.asarray(y) @ np.linalg.solve(C, np.asarray(y))
                      + logdet)

    nll0 = dense_nll()
    model.optimize_hyperparameters(max_iters=25, lr=0.1, trace_samples=8,
                                   key=jax.random.PRNGKey(0))
    nll1 = dense_nll()
    assert nll1 < nll0 - 1.0, (nll0, nll1)
    hist = model.training_log
    assert len(hist["lengthscale"]) == 25
    assert len(hist["gradients"]) == 25
    assert all(m is not None for m in hist["mean_cg_iters"])


def test_min_lengthscale_clamp(rng):
    x, y = make_data(rng, n=60, d=1)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-2, estimate_params=False)
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([6e-3, 1.0, 0.1])))
    model.optimize_hyperparameters(max_iters=3, lr=0.5, trace_samples=2,
                                   min_lengthscale=5e-3,
                                   key=jax.random.PRNGKey(0))
    assert float(np.exp(model.params.raw[0])) >= 5e-3 - 1e-12


def test_sample_posterior(rng):
    x, y = make_data(rng, n=80, d=1, lengthscale=0.3)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-4, estimate_params=False)
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([0.3, 1.0, 0.1])))
    xnew = jnp.linspace(0.2, 0.8, 12)[:, None]
    samples = model.sample_posterior(xnew, nsamples=4000,
                                     key=jax.random.PRNGKey(2))
    assert samples.shape == (12, 4000)
    mo, vo = dense_gp_posterior(model.kernel, x, y, 0.1, xnew)
    emp_mean = samples.mean(axis=1)
    emp_var = samples.var(axis=1)
    assert np.max(np.abs(emp_mean - mo)) < 0.1
    assert np.max(np.abs(emp_var - vo)) < 0.2 * np.max(vo) + 0.01


def test_log_marginal_slq(rng):
    x, y = make_data(rng, n=80, d=1, lengthscale=0.3)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-4, estimate_params=False,
                 opts={"log_marginal_probes": 200, "log_marginal_steps": 30,
                       "cg_tolerance": 1e-10})
    model.params = model.params.replace_raw(
        jnp.log(jnp.array([0.3, 1.0, 0.1])))
    lm = float(model.log_marginal(key=jax.random.PRNGKey(1)))
    # dense value of the same quantity: -0.5*(logdet C + y^T C^-1 y)
    k = model.kernel
    K = np.asarray(k.kernel_matrix(x, x))
    C = K + 0.1 * np.eye(80)
    sign, logdet = np.linalg.slogdet(C)
    want = -0.5 * (logdet + np.asarray(y) @ np.linalg.solve(C, np.asarray(y))
                   + 80 * np.log(2 * np.pi))
    assert abs(lm - want) / abs(want) < 0.05, (lm, want)


def test_model_generic_nu_matern_matches_dense(rng):
    """End-to-end EFGP with a generic-nu (Bessel-K) Matérn kernel tracks the
    dense GP oracle (reference generic path, matern.py:72-98)."""
    from gpquad.kernels import Matern
    n = 200
    x = jnp.asarray(rng.uniform(-1, 1, (n, 1)))
    y = jnp.asarray(np.sin(3 * np.asarray(x[:, 0]))
                    + 0.1 * rng.normal(size=n))
    k = Matern(lengthscale=0.4, variance=1.0, dimension=1, nu=2.0)
    model = EFGP(x, y, k, sigmasq=0.01, eps=1e-6, estimate_params=False,
                 opts={"cg_tolerance": 1e-10})
    mu, _ = model.predict(x, return_variance=False)
    K = np.asarray(k.kernel(jnp.abs(x[:, None, 0] - x[None, :, 0])))
    mu_d = K @ np.linalg.solve(K + 0.01 * np.eye(n), np.asarray(y))
    # Matérn spectral tails are algebraic, so the quadrature (not the
    # Bessel-K evaluation, good to ~1e-12) dominates this gap
    assert np.abs(np.asarray(mu) - mu_d).max() < 1e-3


def test_precond_rank_option(rng):
    """opts['precond_rank'] routes the facade's fit and gradients through
    the deflation preconditioner (ops/deflation.py) on the CG branch."""
    n = 2500
    x = rng.uniform(0, 1, (n, 2))
    y = np.sin(5 * x[:, 0]) + 0.1 * rng.normal(size=n)
    from gpquad.models.model import EFGP
    m0 = EFGP(jnp.asarray(x), jnp.asarray(y), "SE", sigmasq=0.01, eps=1e-4,
              opts={"solver": "cg"})
    m1 = EFGP(jnp.asarray(x), jnp.asarray(y), "SE", sigmasq=0.01, eps=1e-4,
              opts={"solver": "cg", "precond_rank": 128})
    # same planned grid/hypers -> comparable gradients through the FORCED
    # CG branch (auto would take the dense tier at this small M)
    m1.params = m0.params
    # converged solves (loose CG leaves percent-level trace-term gaps
    # between preconditioners - docs/CONDITIONING.md)
    g0 = np.asarray(m0.compute_gradients(trace_samples=4, cg_tol=1e-9,
                                         key=jax.random.PRNGKey(0)))
    g1 = np.asarray(m1.compute_gradients(trace_samples=4, cg_tol=1e-9,
                                         key=jax.random.PRNGKey(0)))
    assert np.allclose(g0, g1, rtol=1e-4, atol=1e-6)
    m1.fit()
    assert m1._state.defl_P is not None


def test_grid_plan_rung_hysteresis(rng):
    """Bucketed plans are grow-only across a model's lifetime: once a
    rung is used, smaller planned grids reuse it (with the planned hm
    masked in — algebraically exact), so lengthscale growth never
    recompiles (the cold-start fix measured on usa_temp/world_temp)."""
    x, y = make_data(rng, n=200, d=2, lengthscale=0.1, variance=1.0)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-3, estimate_params=False)
    model.params = model.params.replace_raw(
        jnp.log(jnp.asarray([0.05, 1.0, 0.1])))
    _, mtot_small_ell, hm0 = model._grid_plan(True)
    # grow the lengthscale: planned rung shrinks, floor keeps the big one
    model.params = model.params.replace_raw(
        jnp.log(jnp.asarray([0.4, 1.0, 0.1])))
    _, mtot2, hm2 = model._grid_plan(True)
    assert mtot2 == mtot_small_ell            # floor held
    assert hm2 < hm0                          # mask shrinks instead
    # shrink below the floor again: floor grows with the plan
    model.params = model.params.replace_raw(
        jnp.log(jnp.asarray([0.02, 1.0, 0.1])))
    _, mtot3, _ = model._grid_plan(True)
    assert mtot3 > mtot_small_ell
    # unbucketed plans are untouched by the floor
    _, mtot_raw, _ = model._grid_plan(False)
    assert mtot_raw < mtot3


def test_gradient_results_unchanged_by_hysteresis_floor(rng):
    """A gradient computed on a floored (larger, masked) rung equals the
    gradient on the freshly planned rung — the surplus nodes carry
    exactly-zero weight.  Probes are matched across the two grids (the
    frequency-space Rademacher batch embeds in the larger grid's center
    block; padded modes carry zero weight, so their probe values are
    algebraically inert)."""
    x, y = make_data(rng, n=300, d=1, lengthscale=0.25, variance=1.0)
    model = EFGP(x, y, "SE", sigmasq=0.1, eps=1e-4, estimate_params=False)
    model.params = model.params.replace_raw(
        jnp.log(jnp.asarray([0.25, 1.0, 0.1])))
    prng = np.random.default_rng(3)
    T = 4
    Z = jnp.asarray(prng.integers(0, 2, (T, x.shape[0])) * 2.0 - 1)

    model._mtot_floor = 0
    _, mtot_small, _ = model._grid_plan(True)
    model._mtot_floor = 0                       # plan above set the floor
    V_small = prng.integers(0, 2, (T, mtot_small)) * 2.0 - 1
    g_fresh = np.asarray(model.compute_gradients(
        trace_samples=T, cg_tol=1e-10, probes=(Z, jnp.asarray(V_small))))

    mtot_big = 2 * mtot_small + 9               # force a larger rung
    model._mtot_floor = mtot_big
    off = (mtot_big - mtot_small) // 2
    V_big = prng.integers(0, 2, (T, mtot_big)) * 2.0 - 1
    V_big[:, off:off + mtot_small] = V_small    # center-embed (d=1)
    g_floored = np.asarray(model.compute_gradients(
        trace_samples=T, cg_tol=1e-10, probes=(Z, jnp.asarray(V_big))))
    assert np.allclose(g_fresh, g_floored, rtol=1e-6, atol=1e-8), (
        g_fresh, g_floored)
