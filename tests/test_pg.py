"""Polya-Gamma GP tests.

Model: reference polyagamma_classification/test_pg_classifier.py:44-1043 —
formula-level checks, sklearn API contract, fast-path == dense-reference
equivalences, variance-mode agreement, reproducibility.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpquad.kernels import SquaredExponential
from gpquad.models import pg_core as core
from gpquad.models.pg import (PolyagammaGPClassifier,
                              PolyagammaGPNegativeBinomialRegressor)

from .test_nufft import dense_F


# ---------------------------------------------------------------------------
# formula-level checks
# ---------------------------------------------------------------------------

def test_logistic_gaussian_approx_against_mc(rng):
    mean = jnp.asarray([0.0, 1.0, -2.0, 0.5])
    var = jnp.asarray([0.5, 1.0, 2.0, 0.0])
    got = np.asarray(core.approximate_logistic_gaussian_prob(mean, var))
    z = rng.normal(size=200_000)
    for i in range(4):
        mc = np.mean(1 / (1 + np.exp(-(float(mean[i])
                                       + np.sqrt(float(var[i])) * z))))
        assert abs(got[i] - mc) < 0.01, (i, got[i], mc)
    # no-variance fallback
    got0 = np.asarray(core.approximate_logistic_gaussian_prob(mean))
    assert np.allclose(got0, 1 / (1 + np.exp(-np.asarray(mean))))


def test_pg_omega_expectation():
    c = jnp.asarray([1e-12, 1e-9, 0.5, 2.0])
    b = jnp.asarray([1.0, 2.0, 1.0, 3.0])
    got = np.asarray(core.pg_omega_expectation(c, b))
    # small-c limit: b/4
    assert np.allclose(got[0], 0.25)
    assert np.allclose(got[1], 0.5)
    # closed form b tanh(c/2) / (2c)
    assert np.allclose(got[2], 1.0 * np.tanh(0.25) / 1.0)
    assert np.allclose(got[3], 3.0 * np.tanh(1.0) / 4.0)


def test_nb_total_count_gradient_vs_finite_difference(rng):
    y = jnp.asarray(rng.poisson(3.0, size=40).astype(np.float64))
    mean = jnp.asarray(rng.normal(size=40) * 0.3)
    var = jnp.asarray(rng.uniform(0.1, 0.5, size=40))

    def elbo_r_part(r):
        """The r-dependent ELBO pieces the gradient differentiates:
        sum lgamma(y+r) - n lgamma(r) + r * E[log sigmoid(-f)]."""
        from scipy.special import gammaln
        els = np.asarray(core.expected_log_sigmoid_neg_gaussian(
            mean, var, quadrature_nodes=32))
        return float(np.sum(gammaln(np.asarray(y) + r) - gammaln(r)
                            + r * els))

    r0 = 2.0
    g = float(core.negative_binomial_total_count_gradient(
        y, mean, var, total_count=r0, quadrature_nodes=32))
    h = 1e-5
    fd = (elbo_r_part(r0 + h) - elbo_r_part(r0 - h)) / (2 * h)
    assert np.allclose(g, fd, rtol=1e-5), (g, fd)


def test_gauss_hermite_log_sigmoid(rng):
    mean = jnp.asarray([0.3, -1.0])
    var = jnp.asarray([0.4, 1.5])
    got = np.asarray(core.expected_log_sigmoid_neg_gaussian(
        mean, var, quadrature_nodes=40))
    z = rng.normal(size=500_000)
    for i in range(2):
        f = float(mean[i]) + np.sqrt(float(var[i])) * z
        mc = np.mean(-np.log1p(np.exp(f)))
        assert abs(got[i] - mc) < 5e-3, (got[i], mc)


# ---------------------------------------------------------------------------
# operator-level equivalences (dense oracles)
# ---------------------------------------------------------------------------

def _pg_setup(rng, n=50, d=1, lengthscale=0.35, variance=1.2):
    X = jnp.asarray(rng.uniform(-1, 1, size=(n, d)))
    kern = SquaredExponential(lengthscale=lengthscale, variance=variance,
                              dimension=d)
    from gpquad.quadrature import spectral_grid
    L = float(np.max(np.asarray(X).max(0) - np.asarray(X).min(0)))
    _, h, mtot = spectral_grid(kern, 1e-4, L, trunc_eps=1e-4)
    sp = core.build_pg_spectral_state(X, kern, h, mtot=mtot)
    delta = jnp.asarray(rng.uniform(0.05, 0.3, size=n))
    return X, kern, sp, delta, h, mtot


def test_weighted_toeplitz_matches_dense(rng):
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=40, d=2)
    wt = core.weighted_toeplitz(sp, X, delta)
    F = dense_F(np.asarray(X), h, mtot)
    G = F.conj().T @ (np.asarray(delta)[:, None] * F)
    v = jnp.asarray(rng.normal(size=mtot**2)
                    + 1j * rng.normal(size=mtot**2))
    got = np.asarray(wt(v))
    assert np.allclose(got, G @ np.asarray(v), rtol=1e-8, atol=1e-8)


def test_estep_sigma_apply_matches_dense(rng):
    """One E-step pass: mean and sigma_diag equal the dense computation
    Sigma = F D (I + D F* Delta F D)^-1 D F* with the same probes."""
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=45, d=1)
    n = 45
    kappa = jnp.asarray(rng.normal(size=n))
    pg_b = jnp.ones(n)
    probes = jnp.asarray(rng.integers(0, 2, (6, n)) * 2.0 - 1)
    res = core.estep_pass(sp, X, delta, kappa, pg_b, probes, max_iters=1,
                          rho0=0.7, gamma=1e-3, cg_tol=1e-12)
    # dense
    F = dense_F(np.asarray(X), h, mtot)
    ws = np.sqrt(np.asarray(jnp.real(sp.ws2)))
    A = (ws[:, None] * (F.conj().T @ (np.asarray(delta)[:, None] * F))
         * ws[None, :] + np.eye(mtot))
    def sigma_apply(z):
        u = np.linalg.solve(A, ws * (F.conj().T @ z))
        return np.real(F @ (ws * u))
    mean_d = sigma_apply(np.asarray(kappa))
    Sz = np.stack([sigma_apply(np.asarray(probes[j])) for j in range(6)])
    sig_d = (np.asarray(probes) * Sz).mean(axis=0)
    c = np.sqrt(np.maximum(sig_d + mean_d**2, 1e-12))
    lam = 0.5 * np.tanh(0.5 * c) / c
    delta_d = np.maximum(0.3 * np.asarray(delta) + 0.7 * lam, 0.0)
    assert np.allclose(np.asarray(res.mean), mean_d, atol=1e-8)
    assert np.allclose(np.asarray(res.sigma_diag), sig_d, atol=1e-8)
    assert np.allclose(np.asarray(res.delta), delta_d, atol=1e-8)


def test_mstep_gradient_matches_dense_reference(rng):
    """M-step estimator == exact dense gradient of the same ELBO pieces.

    The reference validates against a jittered-K^-1 dense oracle
    (_dense_pg_reference_gradient, pg_classifier.py:1012-1055), which is
    ill-posed when K = F D2 F^H is rank-deficient (M < n); here the
    algebraically-identical feature-space form is used instead:

      term1 = sum_m D'_m |beta_kappa|^2,  beta_kappa = (I+W D2)^-1 F^H kappa
      term2 = tr(D' F^H (I + Delta K)^-1 Delta F)   [exact trace]

    term1 must match tightly (deterministic); term2 to Hutchinson accuracy.
    """
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=40, d=1)
    n = 40
    kappa = jnp.asarray(rng.normal(size=n))
    probes = jnp.asarray(rng.integers(0, 2, (800, n)) * 2.0 - 1)
    res = core.mstep_gradient(sp, X, delta, kappa, probes, cg_tol=1e-12)
    got_t1 = np.asarray(jnp.real(res.term1))
    got_t2 = np.asarray(jnp.real(res.term2))

    F = dense_F(np.asarray(X), h, mtot)
    ws2 = np.asarray(jnp.real(sp.ws2))
    Dp = np.asarray(jnp.real(sp.Dprime))
    dl = np.asarray(delta)
    W = F.conj().T @ (dl[:, None] * F)
    beta_k = np.linalg.solve(np.eye(mtot) + W * ws2[None, :],
                             F.conj().T @ np.asarray(kappa))
    t1 = Dp.T @ np.abs(beta_k) ** 2
    assert np.allclose(got_t1, t1, rtol=1e-6), (got_t1, t1)

    K = np.real((F * ws2[None, :]) @ F.conj().T)
    Minner = F.conj().T @ np.linalg.solve(np.eye(n) + dl[:, None] * K,
                                          dl[:, None] * F)
    t2 = Dp.T @ np.real(np.diag(Minner))
    scale = np.abs(t2) + 1.0
    assert np.all(np.abs(got_t2 - t2) / scale < 0.25), (got_t2, t2)

    # grad assembly: 0.5 * (term1 - term2)
    assert np.allclose(np.asarray(jnp.real(res.grad)),
                       0.5 * (got_t1 - got_t2), rtol=1e-10)


def test_beta_mean_and_predictive_mean_match_dense(rng):
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=50, d=1)
    kappa = jnp.asarray(rng.normal(size=50))
    beta, iters = core.solve_beta_mean(sp, X, delta, kappa, cg_tol=1e-13)
    F = dense_F(np.asarray(X), h, mtot)
    ws2 = np.asarray(jnp.real(sp.ws2))
    # the symmetrized solver returns beta = Ds^-1 (I + Ds W Ds)^-1 Ds q,
    # algebraically beta = (I + W D2)^-1 q with W = F* Delta F, q = F* kappa
    W = F.conj().T @ (np.asarray(delta)[:, None] * F)
    B = np.eye(mtot) + W * ws2[None, :]
    beta_d = np.linalg.solve(B, F.conj().T @ np.asarray(kappa))
    got = np.asarray(jnp.real(beta)) + 1j * np.asarray(jnp.imag(beta))
    assert np.allclose(got, beta_d, atol=1e-7), np.abs(got - beta_d).max()

    xnew = jnp.linspace(-0.9, 0.9, 20)[:, None]
    mean = np.asarray(core.predictive_mean(sp, xnew, beta))
    Fn = dense_F(np.asarray(xnew), h, mtot)
    want_mean = np.real(Fn @ (ws2 * beta_d))
    assert np.allclose(mean, want_mean, atol=1e-6)
    # sanity: F (ws2 beta) equals the dense PG posterior mean K(I+Delta K)^-1
    K = np.real((F * ws2[None, :]) @ F.conj().T)
    m_dense = K @ np.linalg.solve(np.eye(len(K))
                                  + np.asarray(delta)[:, None] * K,
                                  np.asarray(kappa))
    mean_train = np.asarray(core.predictive_mean(sp, X, beta))
    assert np.allclose(mean_train, m_dense, atol=1e-6)


def test_variance_modes_agree(rng):
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=60, d=1)
    xnew = jnp.linspace(-0.8, 0.8, 25)[:, None]
    v_exact = np.asarray(core.predictive_variance_exact(
        sp, X, delta, xnew, cg_tol=1e-12))
    # chebyshev
    v_cheb = np.asarray(core.predictive_variance_chebyshev(
        sp, X, delta, xnew, n_nodes_per_dim=20, cg_tol=1e-12))
    assert np.allclose(v_cheb, v_exact, rtol=1e-3, atol=1e-6)
    # stochastic
    etas = jnp.asarray(rng.integers(0, 2, (3000, sp.M)) * 2.0 - 1)
    sums = core.stochastic_variance_sums(sp, X, delta, etas, cg_tol=1e-10)
    v_sto = np.asarray(core.evaluate_variance_sums(sp, sums, xnew))
    assert np.max(np.abs(v_sto - v_exact)) < 0.1 * np.max(v_exact)


# ---------------------------------------------------------------------------
# estimator-level tests
# ---------------------------------------------------------------------------

def _binary_data(rng, n=150):
    X = rng.uniform(-1, 1, size=(n, 2))
    logits = 3 * X[:, 0] - 2 * X[:, 1]
    y = (logits + 0.5 * rng.normal(size=n) > 0).astype(int)
    return X, y


def test_classifier_sklearn_contract(rng):
    X, y = _binary_data(rng)
    clf = PolyagammaGPClassifier(max_iter=5, random_state=0, dtype="float64")
    clf.fit(X, y)
    assert list(clf.classes_) == [0, 1]
    assert clf.n_features_in_ == 2
    proba = clf.predict_proba(X[:10])
    assert proba.shape == (10, 2)
    assert np.allclose(proba.sum(axis=1), 1.0)
    pred = clf.predict(X[:10])
    assert set(pred).issubset({0, 1})
    df = clf.decision_function(X)
    assert df.shape == (len(y),)
    var = clf.predictive_variance(X)
    assert var.shape == (len(y),)
    assert clf.history_[-1]["iter"] == 5.0


def test_classifier_learns(rng):
    X, y = _binary_data(rng, n=250)
    clf = PolyagammaGPClassifier(max_iter=12, lengthscale_init=0.5,
                                 random_state=0, dtype="float64")
    clf.fit(X, y)
    assert clf.training_accuracy_ > 0.85
    acc = (clf.predict(X) == y).mean()
    assert acc > 0.85


def test_classifier_reproducible(rng):
    X, y = _binary_data(rng)
    a = PolyagammaGPClassifier(max_iter=4, random_state=7, dtype="float64"
                               ).fit(X, y)
    b = PolyagammaGPClassifier(max_iter=4, random_state=7, dtype="float64"
                               ).fit(X, y)
    assert np.allclose(a.delta_, b.delta_)
    assert a.lengthscale_ == b.lengthscale_
    Xt = rng.uniform(-1, 1, size=(20, 2))
    assert np.allclose(a.predict_proba(Xt), b.predict_proba(Xt))


def test_classifier_rejects_multiclass(rng):
    X = rng.uniform(size=(30, 2))
    y = rng.integers(0, 3, size=30)
    with pytest.raises(ValueError):
        PolyagammaGPClassifier(max_iter=1).fit(X, y)


def test_nb_regressor(rng):
    X = rng.uniform(-1, 1, size=(150, 1))
    rate = np.exp(0.8 * np.sin(3 * X[:, 0]))
    y = rng.poisson(2.0 * rate)
    reg = PolyagammaGPNegativeBinomialRegressor(
        total_count=2.0, max_iter=8, lengthscale_init=0.4, random_state=0,
        dtype="float64")
    reg.fit(X, y)
    pred = reg.predict(X)
    assert pred.shape == (150,)
    assert np.all(pred >= 0)
    assert reg.total_count_ == 2.0
    # correlation between predictions and targets should be decent
    assert np.corrcoef(pred, y)[0, 1] > 0.3


def test_nb_regressor_learns_total_count(rng):
    X = rng.uniform(-1, 1, size=(120, 1))
    y = rng.poisson(3.0, size=120)
    reg = PolyagammaGPNegativeBinomialRegressor(
        total_count=1.0, learn_total_count=True,
        total_count_update_frequency=2, max_iter=6, random_state=0,
        dtype="float64")
    reg.fit(X, y)
    assert reg.total_count_ != 1.0          # it moved
    assert reg.total_count_ > 0
    recs = [r for r in reg.history_ if "total_count" in r]
    assert len(recs) >= 1


def test_nb_rejects_bad_targets(rng):
    X = rng.uniform(size=(20, 1))
    with pytest.raises(ValueError):
        PolyagammaGPNegativeBinomialRegressor(max_iter=1).fit(
            X, -np.ones(20))
    with pytest.raises(ValueError):
        PolyagammaGPNegativeBinomialRegressor(max_iter=1).fit(
            X, np.full(20, 0.5))
    with pytest.raises(ValueError):
        PolyagammaGPNegativeBinomialRegressor(total_count=-1.0,
                                              max_iter=1).fit(
            X, np.ones(20))


def test_bad_variance_method(rng):
    X, y = _binary_data(rng, n=50)
    clf = PolyagammaGPClassifier(max_iter=1, random_state=0,
                                 predictive_variance_method="bogus",
                                 dtype="float64")
    clf.fit(X, y)
    with pytest.raises(ValueError):
        clf.predictive_variance(rng.uniform(size=(5, 2)))


def test_prediction_batch_size_matches_unbatched(rng):
    """Batched exact variance == unbatched (reference batches targets via
    prediction_batch_size, pg_classifier.py:1087,1168)."""
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=50, d=1)
    xnew = jnp.linspace(-0.9, 0.9, 37)[:, None]   # 37 % 8 != 0: pad path
    v_full = np.asarray(core.predictive_variance_exact(
        sp, X, delta, xnew, cg_tol=1e-12))
    v_batched = np.asarray(core.predictive_variance_exact_batched(
        sp, X, delta, xnew, batch_size=8, cg_tol=1e-12))
    assert v_batched.shape == v_full.shape
    assert np.allclose(v_batched, v_full, rtol=1e-10, atol=1e-12)
    # batch_size=None passthrough
    v_none = np.asarray(core.predictive_variance_exact_batched(
        sp, X, delta, xnew, batch_size=None, cg_tol=1e-12))
    assert np.allclose(v_none, v_full)


def test_e_step_tol_early_stop(rng):
    """A loose e_step_tol stops the damped fixed point early; iters_used
    reports the executed count (reference break, pg_classifier.py:574-576)."""
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=45, d=1)
    n = 45
    kappa = jnp.asarray(rng.normal(size=n))
    pg_b = jnp.ones(n)
    probes = jnp.asarray(rng.integers(0, 2, (4, n)) * 2.0 - 1)
    # tol so large the second iteration is skipped
    loose = core.estep_pass(sp, X, delta, kappa, pg_b, probes, max_iters=4,
                            rho0=0.7, gamma=1e-3, cg_tol=1e-10, tol=1e3)
    assert int(loose.iters_used) == 1
    one = core.estep_pass(sp, X, delta, kappa, pg_b, probes, max_iters=1,
                          rho0=0.7, gamma=1e-3, cg_tol=1e-10, tol=0.0)
    assert np.allclose(np.asarray(loose.delta), np.asarray(one.delta))
    # tol=0 never stops early
    full = core.estep_pass(sp, X, delta, kappa, pg_b, probes, max_iters=4,
                           rho0=0.7, gamma=1e-3, cg_tol=1e-10, tol=0.0)
    assert int(full.iters_used) == 4
    assert not np.allclose(np.asarray(full.delta), np.asarray(one.delta))


def test_estimator_prediction_batch_and_tol_plumbed(rng):
    """Estimator-level: prediction_batch_size changes nothing numerically,
    e_step_tol early-stops are visible in history."""
    X, y = _binary_data(rng, n=80)
    xq = rng.uniform(-1, 1, size=(23, 2))
    base = dict(max_iter=3, e_step_iters=3, random_state=0, dtype="float64",
                store_history=True)
    a = PolyagammaGPClassifier(prediction_batch_size=7, e_step_tol=0.0,
                               **base).fit(X, y)
    b = PolyagammaGPClassifier(prediction_batch_size=None, e_step_tol=0.0,
                               **base).fit(X, y)
    assert np.allclose(a.predictive_variance(xq), b.predictive_variance(xq),
                       rtol=1e-8)
    assert a.history_[0]["e_iters_used"] == 3.0
    c = PolyagammaGPClassifier(e_step_tol=1e6, **base).fit(X, y)
    assert c.history_[0]["e_iters_used"] == 1.0


def test_classifier_n_bucketing(rng):
    """n is padded to a 1-2-5 rung (compile-once-per-rung cold-start fix):
    padded points carry zero delta/kappa/probes, so the fit is
    algebraically the unpadded one; public attrs are sliced to n."""
    X, y = _binary_data(rng, n=130)            # pads to the 200 rung
    clf = PolyagammaGPClassifier(max_iter=6, random_state=0,
                                 dtype="float64").fit(X, y)
    assert clf._n_valid_ == 130
    assert clf._delta_t_.shape[0] == 200       # internal padded state
    assert np.all(np.asarray(clf._delta_t_)[130:] == 0.0)  # pads stay zero
    assert clf.delta_.shape == (130,)
    assert clf.posterior_mean_.shape == (130,)
    assert clf.predict_proba(X).shape == (130, 2)
    assert clf.training_accuracy_ > 0.8


def test_dense_prediction_solver_matches_cg(rng):
    """Dense factor-solve prediction path == chunked-CG path (TPU-first
    replacement for per-batch CG; reference always CG,
    pg_classifier.py:671-739)."""
    X, kern, sp, delta, h, mtot = _pg_setup(rng, n=50, d=1)
    xnew = jnp.linspace(-0.9, 0.9, 37)[:, None]
    v_cg = np.asarray(core.predictive_variance_exact_batched(
        sp, X, delta, xnew, batch_size=8, cg_tol=1e-12))
    v_dense = np.asarray(core.predictive_variance_exact_dense(
        sp, X, delta, xnew))
    assert np.allclose(v_dense, v_cg, rtol=1e-8, atol=1e-12)
    # chunked dense (pad path) == one-shot dense
    v_dense_b = np.asarray(core.predictive_variance_exact_dense(
        sp, X, delta, xnew, batch_size=8))
    assert np.allclose(v_dense_b, v_dense, rtol=1e-12, atol=1e-14)
    # prebuilt-system reuse
    sysd = core.dense_feature_system(sp, X, delta)
    v_sys = np.asarray(core.predictive_variance_exact_dense(
        sp, X, delta, xnew, system=sysd))
    assert np.allclose(v_sys, v_dense)
    # guard: refuses M beyond the dense window
    import gpquad.models.pg_core as pgc
    orig = pgc.DENSE_SOLVER_MAX_M
    try:
        pgc.DENSE_SOLVER_MAX_M = sp.M - 1
        with pytest.raises(ValueError, match="dense prediction solver"):
            core.predictive_variance_exact_dense(sp, X, delta, xnew)
    finally:
        pgc.DENSE_SOLVER_MAX_M = orig


def test_estimator_prediction_solver_routing(rng):
    """prediction_solver='auto' routes small-M fits through the dense
    system; 'cg' forces the reference-style chunked CG; both agree."""
    from gpquad.models.pg import PolyagammaGPClassifier
    n = 220
    X = rng.uniform(-1, 1, (n, 2))
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-3 * X[:, 0]))).astype(float)
    xv = rng.uniform(-1, 1, (64, 2))
    kw = dict(max_iter=2, lr=0.0, lengthscale_init=0.4, random_state=0,
              dtype="float64")
    clf_a = PolyagammaGPClassifier(prediction_solver="auto", **kw).fit(X, y)
    assert clf_a._resolved_prediction_solver(
        clf_a._spectral_state_.M) == "dense"
    p_a = clf_a.predict_proba(xv)[:, 1]
    v_a = clf_a.predictive_variance(xv)
    clf_c = PolyagammaGPClassifier(prediction_solver="cg", **kw).fit(X, y)
    p_c = clf_c.predict_proba(xv)[:, 1]
    v_c = clf_c.predictive_variance(xv)
    assert np.allclose(p_a, p_c, rtol=1e-6, atol=1e-8)
    assert np.allclose(v_a, v_c, rtol=1e-4, atol=1e-8)
    # cached system is reused across predict calls
    s1 = clf_a._dense_system_
    clf_a.predict_proba(xv)
    assert clf_a._dense_system_ is s1
    with pytest.raises(ValueError):
        PolyagammaGPClassifier(prediction_solver="nope", **kw).fit(
            X, y).predictive_variance(xv)


def test_matern_kernel_estimator(rng):
    """PG estimators accept Matern kernels (the reference gates to SE,
    pg_classifier.py:301-302; the spectral E/M algebra is kernel-
    agnostic).  The PG posterior mean on training inputs must match the
    dense PG formula built from the same truncated spectral kernel."""
    from gpquad.models.pg import PolyagammaGPClassifier
    n, d = 160, 2
    X = rng.uniform(-1, 1, (n, d))
    y = (rng.uniform(size=n)
         < 1 / (1 + np.exp(-3 * np.sin(2 * X[:, 0])))).astype(float)
    clf = PolyagammaGPClassifier(kernel="Matern32", max_iter=2, lr=0.0,
                                 lengthscale_init=0.5, random_state=0,
                                 dtype="float64", spectral_eps=1e-6)
    clf.fit(X, y)
    p = clf.predict_proba(rng.uniform(-1, 1, (32, d)))[:, 1]
    assert np.all((p > 0) & (p < 1))
    # dense check of the M-step mean against the SAME truncated spectral
    # kernel K = Re(F ws2 F^H): isolates the PG algebra from Matern's
    # (slow, polynomial-tail) quadrature truncation, which the EFGP
    # quadrature tests characterize separately
    sp = clf._spectral_state_
    F = dense_F(np.asarray(clf._X_train_t_), float(sp.h), int(sp.mtot))
    ws2 = np.asarray(jnp.real(sp.ws2))
    K = np.real((F * ws2[None, :]) @ F.conj().T)
    delta = np.asarray(clf._delta_t_)
    kappa = np.asarray(clf._y_train_like_) if hasattr(
        clf, "_y_train_like_") else (y - 0.5)
    nK = K.shape[0]
    m_dense = K @ np.linalg.solve(np.eye(nK) + delta[:, None] * K,
                                  np.concatenate([kappa,
                                                  np.zeros(nK - n)]))
    # the M-step mean F ws2 beta pairs with the STORED delta (the E-step
    # mean pairs with the pre-update delta)
    got = np.real(F @ (ws2 * np.asarray(clf._beta_mean_t_)))
    assert np.max(np.abs(got - m_dense)) \
        < 1e-5 * max(1.0, np.max(np.abs(m_dense)))   # cg_tol=1e-6 floor
    # unknown kernel still raises a clear error
    with pytest.raises(ValueError, match="Unknown kernel"):
        PolyagammaGPClassifier(kernel="nope").fit(X, y)


def test_fit_fixed_point_matches_dense_cavi(rng):
    """The full damped-Hutchinson outer loop converges to the SAME fixed
    point as an exact-Sigma dense CAVI on the identical model (reference
    CAVI_NaturalGrad_Gibbs_test.ipynb; script form
    examples/inference_comparison.py).  The quadrature kernel is realised
    exactly by the real feature map [sqrt(ws2) cos, sqrt(ws2) sin], so the
    two posteriors coincide up to inference error only."""
    n = 150
    X = np.sort(rng.uniform(-1, 1, size=(n, 1)), axis=0)
    f = 2.5 * np.sin(4 * X[:, 0])
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-f))).astype(int)

    ell, sf2 = 0.3, 2.0
    clf = PolyagammaGPClassifier(max_iter=40, lr=0.0, lengthscale_init=ell,
                                 variance_init=sf2, n_e_probes=64,
                                 random_state=0, dtype="float64")
    clf.fit(X, y)

    sp = clf._spectral_state_
    m = (sp.mtot - 1) // 2
    xis = np.arange(-m, m + 1, dtype=np.float64) * float(np.asarray(sp.h))
    w = np.sqrt(np.real(np.asarray(sp.ws2)))
    ang = 2 * np.pi * X * xis[None, :]
    Phi = np.concatenate([w * np.cos(ang), w * np.sin(ang)], axis=1)

    d = np.full(n, 0.25)
    kappa = y - 0.5
    for _ in range(300):
        Sigma = np.linalg.inv((Phi.T * d) @ Phi + np.eye(Phi.shape[1]))
        mu = Sigma @ (Phi.T @ kappa)
        c = np.sqrt(np.sum(Phi * (Phi @ Sigma), axis=1) + (Phi @ mu) ** 2)
        d_new = np.where(c > 1e-8, 0.5 * np.tanh(c / 2) / np.maximum(c, 1e-8),
                         0.25)
        if np.linalg.norm(d_new - d) < 1e-12:
            d = d_new
            break
        d = d_new
    f_cavi = Phi @ mu

    scale = np.sqrt(np.mean(f_cavi ** 2))
    rel = np.sqrt(np.mean((clf.posterior_mean_ - f_cavi) ** 2)) / scale
    assert rel < 5e-3, rel                       # probe noise floor
    assert np.max(np.abs(clf.delta_ - d)) < 5e-3
