"""Polya-Gamma GP estimators (component C15, sklearn-style surface).

TPU-native re-design of the reference's ``PolyagammaGPClassifier`` /
``PolyagammaGPNegativeBinomialRegressor``
(reference: polyagamma_classification/pg_classifier.py:1058-1688): the same
EM-style variational loop — per outer iteration a spectral-state rebuild
(the lengthscale moved), a damped PG E-step, a stochastic M-step ascent on
(lengthscale, variance) — with the same estimator API
(``fit/predict/predict_proba/decision_function/predictive_variance/
predict_response_mean``) and fitted attributes (``delta_``,
``posterior_mean_``, ``beta_mean_``, ``history_``, ...).

TPU-first differences: grids are bucketed to static sizes so the jitted
E/M passes compile once per bucket; all randomness flows from
``random_state`` through explicit PRNG keys; hypers update functionally
through optax instead of mutating ``nn.Parameter`` state.
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.base import BaseEstimator, ClassifierMixin, RegressorMixin
from sklearn.utils.validation import check_array, check_is_fitted, check_X_y

from ..kernels import SquaredExponential
from ..quadrature import (bucket_mtot, bucket_neighbors, bucket_points,
                          flat_grid_mask, grid_geometry_jit)
from . import pg_core as core

__all__ = ["PolyagammaGPClassifier", "PolyagammaGPNegativeBinomialRegressor"]


class _BernoulliLikelihood:
    """Reference _PGBernoulliLikelihood (pg_classifier.py:105-138)."""
    history_key = "approx_accuracy"
    training_attr = "training_accuracy_"

    def prepare_targets(self, y):
        classes = np.unique(y)
        if classes.size != 2:
            raise ValueError(
                "PolyagammaGPClassifier only supports binary classification.")
        return (y == classes[1]).astype(np.float64), {"classes_": classes}

    def kappa(self, t):
        return t - 0.5

    def pg_b(self, t):
        return jnp.ones_like(t)

    def response_mean(self, mean, variance):
        return core.approximate_logistic_gaussian_prob(mean, variance)

    def fit_metric(self, mean, variance, targets):
        pred = self.response_mean(mean, variance) > 0.5
        return float(jnp.mean((pred == (targets > 0.5)).astype(jnp.float32)))


class _NegativeBinomialLikelihood:
    """Reference _PGNegativeBinomialLikelihood (pg_classifier.py:141-170)."""
    history_key = "mean_count_mae"
    training_attr = "training_mean_absolute_error_"

    def __init__(self, total_count: float):
        if total_count <= 0:
            raise ValueError("total_count must be positive.")
        self.total_count = total_count

    def prepare_targets(self, y):
        if np.any(y < 0):
            raise ValueError("Negative binomial targets must be nonnegative.")
        if not np.allclose(y, np.round(y)):
            raise ValueError("Negative binomial targets must be integer-valued.")
        return np.round(y).astype(np.float64), {}

    def kappa(self, t):
        return 0.5 * (t - self.total_count)

    def pg_b(self, t):
        return t + self.total_count

    def response_mean(self, mean, variance):
        return core.negative_binomial_gaussian_mean(
            mean, variance, total_count=self.total_count)

    def fit_metric(self, mean, variance, targets):
        return float(jnp.mean(jnp.abs(self.response_mean(mean, variance)
                                      - targets)))


class _BasePolyagammaGPEstimator(BaseEstimator):
    """Shared PG estimator implementation (reference
    _BasePolyagammaGPEstimator, pg_classifier.py:1058-1488)."""

    def __init__(self, *, kernel="squared_exponential",
                 lengthscale_init=0.3, variance_init=1.0, max_iter=50,
                 e_step_iters=1, final_e_step_iters=1, e_step_tol=1e-4,
                 rho0=0.7, gamma=1e-3, lr=0.05, n_e_probes=10, n_m_probes=10,
                 cg_tol=1e-6, nufft_eps=None, spectral_eps=1e-4,
                 trunc_eps=1e-4, jitter=1e-8,
                 use_exact_weighted_toeplitz_operator=True, device=None,
                 reuse_e_probes=True,
                 prediction_batch_size=64,
                 prediction_solver="auto",
                 predictive_variance_method="exact",
                 predictive_variance_probes=16,
                 predictive_variance_chebyshev_nodes=7, warm_start=False,
                 random_state=None, dtype="float32", verbose=0,
                 store_history=False, prefetch_rungs=False):
        self.kernel = kernel
        self.lengthscale_init = lengthscale_init
        self.variance_init = variance_init
        self.max_iter = max_iter
        self.e_step_iters = e_step_iters
        self.final_e_step_iters = final_e_step_iters
        self.e_step_tol = e_step_tol
        self.rho0 = rho0
        self.gamma = gamma
        self.lr = lr
        self.n_e_probes = n_e_probes
        self.n_m_probes = n_m_probes
        self.cg_tol = cg_tol
        # accepted for drop-in compatibility with the reference signature
        # (pg_classifier.py:1065-1126): the TPU NUFFT is exact (nufft_eps
        # moot), the weighted-Toeplitz operator is always the exact one,
        # JAX owns device placement, and jitter — like the reference, whose
        # estimator never reads self.jitter (only the module-level dense
        # oracle _dense_pg_reference_gradient does,
        # pg_classifier.py:1019-1027) — is exposed for that oracle
        self.nufft_eps = nufft_eps
        self.use_exact_weighted_toeplitz_operator = \
            use_exact_weighted_toeplitz_operator
        self.device = device
        self.spectral_eps = spectral_eps
        self.trunc_eps = trunc_eps
        self.jitter = jitter
        self.reuse_e_probes = reuse_e_probes
        self.prediction_batch_size = prediction_batch_size
        self.prediction_solver = prediction_solver
        self.predictive_variance_method = predictive_variance_method
        self.predictive_variance_probes = predictive_variance_probes
        self.predictive_variance_chebyshev_nodes = \
            predictive_variance_chebyshev_nodes
        self.warm_start = warm_start
        self.random_state = random_state
        self.dtype = dtype
        self.verbose = verbose
        self.store_history = store_history
        self.prefetch_rungs = prefetch_rungs

    # ------------------------------------------------------------------
    def _make_likelihood(self):
        raise NotImplementedError

    def _rdtype(self):
        return jnp.float64 if str(self.dtype) == "float64" else jnp.float32

    def _key(self, salt: int):
        seed = 0 if self.random_state is None else int(self.random_state)
        return jax.random.fold_in(jax.random.PRNGKey(seed), salt)

    def _make_kernel_obj(self, lengthscale, variance, d):
        """Kernel factory.  The reference gates its PG classifier to SE
        ("Only the squared exponential kernel is supported in v1",
        pg_classifier.py:301-302); here any kernel with a spectral
        density + spectral gradient works — the E/M passes only ever see
        the quadrature weights ``ws``/``ws2`` and ``Dprime``, so Matern
        (12/32/52 closed forms or generic nu) drops straight in."""
        name = str(self.kernel).lower()
        rd = self._rdtype()
        if name in {"squared_exponential", "se", "rbf"}:
            return SquaredExponential(
                lengthscale=jnp.asarray(lengthscale, rd),
                variance=jnp.asarray(variance, rd), dimension=d)
        from ..kernels import make_kernel
        try:
            kern = make_kernel(self.kernel, dimension=d)
        except ValueError as e:
            raise ValueError(
                f"Unknown kernel {self.kernel!r} for the PG estimator "
                "(use 'squared_exponential' or a Matern variant).") from e
        return kern.with_hypers(jnp.asarray([lengthscale, variance], rd))

    def _plan_grid(self, X, lengthscale, variance, min_mtot: int = 0):
        """Host-side bucketed grid plan: (kernel, h, mtot, mask).

        ``min_mtot`` implements rung HYSTERESIS (grow-only grids within a
        fit): a larger rung with the planned ``hm`` masked in is
        algebraically identical to the planned grid (the surplus nodes
        carry exactly-zero weight), so once a rung's outer-step program
        is compiled the fit never pays a fresh ~20 s compile just because
        the lengthscale grew (scripts/profile_compile.py; cold start
        measured 72.1 s at n=1e5 when the trajectory re-planned downward
        mid-fit)."""
        d = X.shape[1]
        kern = self._make_kernel_obj(lengthscale, variance, d)
        L = float(np.max(np.asarray(X).max(0) - np.asarray(X).min(0)))
        if L <= 1e-9:
            L = 1.0
        h, hm_real = grid_geometry_jit(kern, self.spectral_eps, L,
                                       trunc_eps=self.trunc_eps)
        hm = int(np.ceil(float(hm_real) - 1e-12))
        mtot = max(bucket_mtot(2 * hm + 1), int(min_mtot))
        mask = flat_grid_mask(mtot, d, hm, dtype=self._rdtype())
        return kern, h, mtot, mask, hm

    def _spectral(self, X, lengthscale, variance, min_mtot: int = 0):
        """Bucketed-grid spectral state for the current hypers."""
        kern, h, mtot, mask, hm = self._plan_grid(X, lengthscale, variance,
                                                  min_mtot=min_mtot)
        self._hm_ = hm       # active-node half-width; the df64 leg masks to it
        return core.build_pg_spectral_state(X, kern, h, mtot=mtot,
                                            ws_mask=mask)

    def _rademacher(self, key, shape):
        return (jax.random.bernoulli(key, 0.5, shape) * 2 - 1
                ).astype(self._rdtype())

    # ------------------------------------------------------------------
    def _initialize_likelihood_state(self, y_t):
        return None

    def _step_auxiliary_parameters(self, *, targets, outer) -> Dict:
        return {}

    def _history_parameter_record(self) -> Dict:
        return {}

    def fit(self, X, y):
        X_arr, y_arr = check_X_y(X, y, ensure_2d=True, dtype=np.float64)
        likelihood = self._make_likelihood()
        y_model, meta = likelihood.prepare_targets(y_arr)
        for k, v in meta.items():
            setattr(self, k, v)

        rd = self._rdtype()
        self.n_features_in_ = X_arr.shape[1]
        self._X_train_np_ = X_arr.copy()
        X_t = jnp.asarray(X_arr, rd)
        y_t = jnp.asarray(y_model, rd)

        # n-bucketing: pad the point count to a 1-2-5 rung so the fused
        # outer step compiles once per rung, not once per dataset size
        # (the cold-start fix; padded points carry exactly-zero
        # delta/kappa/probes so every operator is algebraically unchanged)
        n_valid = X_t.shape[0]
        n_buck = bucket_points(n_valid)
        self._n_valid_ = n_valid
        if n_buck != n_valid:
            pad = jnp.broadcast_to(jnp.mean(X_t, axis=0),
                                   (n_buck - n_valid, X_t.shape[1]))
            X_t = jnp.concatenate([X_t, pad], axis=0)
        m_mask = (jnp.arange(n_buck) < n_valid).astype(rd)

        def _padded_kappa_pgb(likelihood):
            kappa = likelihood.kappa(y_t)
            pg_b = likelihood.pg_b(y_t)
            if n_buck != n_valid:
                z = jnp.zeros((n_buck - n_valid,), rd)
                kappa = jnp.concatenate([kappa, z])
                pg_b = jnp.concatenate([pg_b, z])
            return kappa, pg_b

        kp_cache: Dict = {}

        def _kappa_pgb(likelihood):
            ck = (type(likelihood).__name__,
                  getattr(likelihood, "total_count", None))
            if ck not in kp_cache:
                kp_cache[ck] = _padded_kappa_pgb(likelihood)
            return kp_cache[ck]

        self._X_train_t_ = X_t
        self._initialize_likelihood_state(y_t)
        likelihood = self._make_likelihood()

        if not (self.warm_start and hasattr(self, "_delta_t_")
                and self._delta_t_.shape[0] == X_t.shape[0]):
            self._delta_t_ = 0.25 * _kappa_pgb(likelihood)[1]
            self._lengthscale_v_ = float(self.lengthscale_init)
            self._variance_v_ = float(self.variance_init)

        raw = jnp.log(jnp.asarray([self._lengthscale_v_, self._variance_v_],
                                  rd))
        tx = optax.adam(self.lr)
        opt_state = tx.init(raw)

        history: List[Dict] = []
        pending: List[Dict] = []   # device scalars, fetched once at the end
        e_probes = None
        ores = None
        seen_rungs: set = set()
        prefetched_from: set = set()
        self._prefetch_threads_: List = []
        rung_floor = 0         # grow-only rung hysteresis (see _plan_grid)

        def _prefetch_neighbors(cur_mtot, kern, h, kappa, pg_b, e_probes,
                                m_key, raw, opt_state):
            """Warm the adjacent bucket rungs' outer-step programs on
            background threads: one rung compile is ~20 s on the chip
            (scripts/profile_compile.py), so a hyper move that crosses a
            rung mid-fit stalls the loop; prefetching overlaps those
            compiles with the useful iterations.  The prefetch call runs
            the REAL jitted outer_step on current-valued arguments (only
            ``mtot``/mask swap), so it lands in the same jit cache the
            training loop hits.

            OFF by default: measured on the v5e tunnel, the concurrent
            compiles contend with the critical-path compile and the
            throwaway execution contends for the device — cold fits got
            SLOWER (36.2 -> 43.6 s at n=2e4, 72.1 -> 96.3 s at n=1e5).
            The grow-only rung hysteresis (``_plan_grid(min_mtot=...)``)
            eliminates the common recompile source instead; prefetch
            remains an option for lengthscale-SHRINKING workloads on
            hosts with idle cores.  Threads are tracked on the estimator
            and JOINED before fit() returns: abandoned device work from a
            daemon thread outliving the fit contends with (and on the
            remote-TPU runtime can wedge) subsequent dispatches."""
            import threading
            d = X_t.shape[1]
            for mt in bucket_neighbors(cur_mtot):
                if mt is None or mt in seen_rungs or mt ** d > 200_000:
                    continue
                seen_rungs.add(mt)
                mask_n = flat_grid_mask(mt, d, (mt - 1) // 2, dtype=rd)

                def work(mt=mt, mask_n=mask_n):
                    try:
                        core.outer_step(
                            X_t, kern, h, mask_n, self._delta_t_, kappa,
                            pg_b, e_probes, m_key, raw, opt_state, mtot=mt,
                            e_iters=self.e_step_iters,
                            n_m_probes=self.n_m_probes, rho0=self.rho0,
                            gamma=self.gamma, e_tol=self.e_step_tol,
                            cg_tol=self.cg_tol, lr=self.lr, m_mask=m_mask)
                    except Exception:   # prefetch is best-effort only
                        pass

                t = threading.Thread(target=work, daemon=True)
                self._prefetch_threads_.append(t)
                t.start()

        for outer in range(self.max_iter):
            likelihood = self._make_likelihood()
            kappa, pg_b = _kappa_pgb(likelihood)
            pos = np.exp(np.asarray(raw))
            kern, h, mtot, mask, _hm = self._plan_grid(X_t, float(pos[0]),
                                                       float(pos[1]),
                                                       min_mtot=rung_floor)
            rung_floor = max(rung_floor, mtot)
            if e_probes is None or not self.reuse_e_probes:
                e_probes = self._rademacher(self._key(17 * (outer + 1)),
                                            (self.n_e_probes, X_t.shape[0]))
                if n_buck != n_valid:
                    e_probes = e_probes * m_mask[None, :]
            # one dispatch per outer iteration: spectral build + E-step +
            # M-step + Adam ascent in a single compiled program
            # (reference pg_classifier.py:1286-1337)
            ores = core.outer_step(
                X_t, kern, h, mask, self._delta_t_, kappa, pg_b, e_probes,
                self._key(10_000 + outer), raw, opt_state, mtot=mtot,
                e_iters=self.e_step_iters, n_m_probes=self.n_m_probes,
                rho0=self.rho0, gamma=self.gamma, e_tol=self.e_step_tol,
                cg_tol=self.cg_tol, lr=self.lr, m_mask=m_mask)
            self._delta_t_ = ores.delta
            self._last_mean_, self._last_sigma_diag_ = ores.mean, \
                ores.sigma_diag
            raw, opt_state = ores.raw, ores.opt_state
            if self.prefetch_rungs and mtot not in prefetched_from:
                # on every NEW rung the loop lands on, warm its (unseen)
                # neighbors — a monotone hyper trajectory that walks the
                # ladder then never stalls on a compile
                prefetched_from.add(mtot)
                seen_rungs.add(mtot)
                _prefetch_neighbors(mtot, kern, h, kappa, pg_b, e_probes,
                                    self._key(10_000 + outer), raw,
                                    opt_state)

            aux = self._step_auxiliary_parameters(targets=y_t, outer=outer)
            record = {"iter": float(outer), "raw": raw, "grad": ores.m_grad,
                      "e_residual": ores.e_residual,
                      "e_iters_used": ores.e_iters_used,
                      "e_cg_iters": ores.e_cg_iters,
                      "m_cg_iters": ores.m_cg_iters,
                      "mean": ores.mean, "sigma_diag": ores.sigma_diag,
                      "aux": aux, "history_key": likelihood.history_key}
            pending.append(record)
            if self.verbose:
                p = np.exp(np.asarray(raw))
                print(f"outer {outer:3d} lengthscale={p[0]:.5f} "
                      f"variance={p[1]:.5f}")

        # materialize history (one bulk device fetch instead of per-iter
        # host round-trips)
        for rec in jax.device_get(pending):
            likelihood_key = rec.pop("history_key")
            aux = rec.pop("aux")
            mean_h = rec.pop("mean")[:n_valid]
            sig_h = rec.pop("sigma_diag")[:n_valid]
            pos = np.exp(rec.pop("raw"))
            entry = {
                "iter": rec["iter"],
                "lengthscale": float(pos[0]),
                "variance": float(pos[1]),
                "grad_lengthscale": float(rec["grad"][0]),
                "grad_variance": float(rec["grad"][1]),
                "e_residual": float(rec["e_residual"]),
                "e_iters_used": float(rec["e_iters_used"]),
                "e_cg_iters": float(rec["e_cg_iters"]),
                "m_cg_iters": float(rec["m_cg_iters"]),
                likelihood_key: likelihood.fit_metric(
                    jnp.asarray(mean_h), jnp.asarray(sig_h), y_t),
            }
            entry.update(aux)
            history.append(entry)

        # barrier: no prefetch device work may outlive fit() (see
        # _prefetch_neighbors docstring)
        for t in self._prefetch_threads_:
            t.join()
        self._prefetch_threads_ = []

        pos = np.exp(np.asarray(raw))
        self._lengthscale_v_ = float(pos[0])
        self._variance_v_ = float(pos[1])

        # final spectral state + E-step + beta-mean solve
        # (reference pg_classifier.py:1362-1400)
        likelihood = self._make_likelihood()
        kappa, pg_b = _kappa_pgb(likelihood)
        spectral = self._spectral(X_t, self._lengthscale_v_,
                                  self._variance_v_, min_mtot=rung_floor)
        if e_probes is None:
            e_probes = self._rademacher(self._key(999_999),
                                        (self.n_e_probes, X_t.shape[0]))
            if n_buck != n_valid:
                e_probes = e_probes * m_mask[None, :]
        eres = core.estep_pass(spectral, X_t, self._delta_t_, kappa, pg_b,
                               e_probes, max_iters=self.final_e_step_iters,
                               rho0=self.rho0, gamma=self.gamma,
                               cg_tol=self.cg_tol, tol=self.e_step_tol)
        self._delta_t_ = eres.delta
        beta_mean, beta_iters = core.solve_beta_mean(
            spectral, X_t, self._delta_t_, kappa, cg_tol=self.cg_tol)

        self._spectral_state_ = spectral
        self._likelihood_ = likelihood
        self._beta_mean_t_ = beta_mean
        self._kappa_t_ = kappa           # kept for the df64 high leg
        self._est_sums_ = None
        self._dense_system_ = None

        self.delta_ = np.asarray(self._delta_t_)[:n_valid]
        self.posterior_mean_ = np.asarray(eres.mean)[:n_valid]
        self.posterior_var_diag_ = np.asarray(eres.sigma_diag)[:n_valid]
        self.lengthscale_ = self._lengthscale_v_
        self.variance_ = self._variance_v_
        self.n_iter_ = self.max_iter
        self.training_metric_ = likelihood.fit_metric(
            eres.mean[:n_valid], eres.sigma_diag[:n_valid], y_t)
        setattr(self, likelihood.training_attr, self.training_metric_)
        self.m_step_gradient_ = (np.asarray(ores.m_grad)
                                 if ores is not None else np.zeros(2))
        self.beta_mean_ = (np.asarray(jnp.real(beta_mean))
                           + 1j * np.asarray(jnp.imag(beta_mean)))

        self.history_ = history if self.store_history else []
        self.history_.append({
            "iter": float(self.max_iter),
            "lengthscale": self.lengthscale_,
            "variance": self.variance_,
            "e_residual": float(eres.residual),
            "e_cg_iters": float(eres.cg_iters),
            "m_cg_iters": float(beta_iters),
            likelihood.history_key: self.training_metric_,
        })
        self.history_[-1].update(self._history_parameter_record())
        return self

    # ------------------------------------------------------------------
    def _is_training_input(self, X_arr) -> bool:
        return (hasattr(self, "_X_train_np_")
                and X_arr.shape == self._X_train_np_.shape
                and np.allclose(X_arr, self._X_train_np_))

    def _variance_method(self) -> str:
        m = str(self.predictive_variance_method).lower()
        if m not in {"exact", "stochastic", "stochastic_diag_sums",
                     "chebyshev"}:
            raise ValueError(
                "predictive_variance_method must be one of {'exact', "
                "'stochastic', 'stochastic_diag_sums', 'chebyshev'}.")
        return "stochastic" if m == "stochastic_diag_sums" else m

    def _resolved_prediction_solver(self, M: int) -> str:
        s = str(self.prediction_solver).lower()
        if s not in {"auto", "dense", "cg"}:
            raise ValueError(
                "prediction_solver must be one of {'auto', 'dense', 'cg'}.")
        if s == "auto":
            return "dense" if M <= core.DENSE_SOLVER_MAX_M else "cg"
        return s

    def _get_dense_system(self):
        """Lazily build + cache the (A, inv(A), Ds) prediction system —
        ``delta`` is frozen after fit, so ONE factorization serves every
        subsequent predict/variance call."""
        if getattr(self, "_dense_system_", None) is None:
            self._dense_system_ = core.dense_feature_system(
                self._spectral_state_, self._X_train_t_, self._delta_t_)
        return self._dense_system_

    def _variance_off_train(self, X_t):
        method = self._variance_method()
        sp = self._spectral_state_
        if method == "exact":
            if self._resolved_prediction_solver(sp.M) == "dense":
                return core.predictive_variance_exact_dense(
                    sp, self._X_train_t_, self._delta_t_, X_t,
                    system=self._get_dense_system())
            return core.predictive_variance_exact_batched(
                sp, self._X_train_t_, self._delta_t_, X_t,
                batch_size=self.prediction_batch_size, cg_tol=self.cg_tol)
        if method == "stochastic":
            if self.predictive_variance_probes <= 0:
                raise ValueError("predictive_variance_probes must be positive.")
            if self._est_sums_ is None:
                etas = self._rademacher(
                    self._key(2_000_000),
                    (self.predictive_variance_probes, sp.M))
                self._est_sums_ = core.stochastic_variance_sums(
                    sp, self._X_train_t_, self._delta_t_, etas,
                    cg_tol=self.cg_tol)
            return core.evaluate_variance_sums(sp, self._est_sums_, X_t)
        solver = self._resolved_prediction_solver(sp.M)
        return core.predictive_variance_chebyshev(
            sp, self._X_train_t_, self._delta_t_, X_t,
            n_nodes_per_dim=self.predictive_variance_chebyshev_nodes,
            cg_tol=self.cg_tol, batch_size=self.prediction_batch_size,
            solver=solver,
            system=self._get_dense_system() if solver == "dense" else None)

    def decision_function(self, X):
        """Posterior mean on training inputs; predictive mean elsewhere
        (reference pg_classifier.py:1442-1459)."""
        check_is_fitted(self, ["posterior_mean_", "beta_mean_"])
        X_arr = check_array(X, ensure_2d=True, dtype=np.float64)
        if self._is_training_input(X_arr):
            return self.posterior_mean_.copy()
        X_t = jnp.asarray(X_arr, self._rdtype())
        return np.asarray(core.predictive_mean(self._spectral_state_, X_t,
                                               self._beta_mean_t_))

    def predictive_variance(self, X):
        check_is_fitted(self, ["posterior_var_diag_", "beta_mean_", "delta_"])
        X_arr = check_array(X, ensure_2d=True, dtype=np.float64)
        if self._is_training_input(X_arr):
            return self.posterior_var_diag_.copy()
        return np.asarray(
            self._variance_off_train(jnp.asarray(X_arr, self._rdtype())))

    def predict_latent_high(self, X, *, with_var: bool = True, **kw):
        """df64 latent predictive moments (VERDICT r3 #4): the reference's
        PG estimators run float64 end-to-end (pg_classifier.py:1094);
        this re-solves the final beta-mean system and the exact
        per-target variance in double-word arithmetic
        (models/pg_high.pg_predict_high), certified at <=1e-6-class
        agreement with the numpy-f64 dense feature system
        (tests/test_pg_high.py).

        Returns ``(mean, var)`` as float64 numpy arrays (``var`` is
        ``None`` with ``with_var=False``).  The f32 VI posterior
        ``delta`` defines the system; only the solve and the moment
        evaluation run in df64.
        """
        from .pg_high import pg_predict_high
        check_is_fitted(self, ["beta_mean_", "delta_", "_kappa_t_",
                               "_spectral_state_"])
        X_arr = check_array(X, ensure_2d=True, dtype=np.float64)
        sp = self._spectral_state_
        d = X_arr.shape[1]
        kern = self._make_kernel_obj(self.lengthscale_, self.variance_, d)
        res = pg_predict_high(
            self._X_train_t_, kern, float(np.asarray(sp.h)), sp.mtot,
            self._delta_t_, self._kappa_t_,
            jnp.asarray(X_arr, self._rdtype()),
            hm=getattr(self, "_hm_", None),
            with_var=with_var, **kw)
        mean = np.asarray(res.mean, np.float64)
        var = np.asarray(res.var, np.float64) if with_var else None
        return mean, var

    def predict_response_mean(self, X):
        check_is_fitted(self, ["posterior_mean_", "posterior_var_diag_",
                               "beta_mean_"])
        X_arr = check_array(X, ensure_2d=True, dtype=np.float64)
        if self._is_training_input(X_arr):
            mean = jnp.asarray(self.posterior_mean_, self._rdtype())
            var = jnp.asarray(self.posterior_var_diag_, self._rdtype())
        else:
            X_t = jnp.asarray(X_arr, self._rdtype())
            mean = core.predictive_mean(self._spectral_state_, X_t,
                                        self._beta_mean_t_)
            var = self._variance_off_train(X_t)
        return np.asarray(self._likelihood_.response_mean(mean, var))


class PolyagammaGPClassifier(_BasePolyagammaGPEstimator, ClassifierMixin):
    """Scikit-learn-style PG-augmented GP binary classifier (Bernoulli
    likelihood, logistic link).  Reference pg_classifier.py:1491-1508."""

    def _make_likelihood(self):
        return _BernoulliLikelihood()

    def predict_proba(self, X):
        p1 = np.clip(self.predict_response_mean(X), 1e-8, 1.0 - 1e-8)
        return np.column_stack([1.0 - p1, p1])

    def predict(self, X):
        proba = self.predict_proba(X)[:, 1]
        return self.classes_[(proba >= 0.5).astype(int)]


class PolyagammaGPNegativeBinomialRegressor(_BasePolyagammaGPEstimator,
                                            RegressorMixin):
    """PG-augmented GP regressor for negative-binomial counts, with optional
    Gauss-Hermite learning of ``total_count``.
    Reference pg_classifier.py:1511-1688."""

    def __init__(self, *, total_count=1.0, learn_total_count=False,
                 total_count_lr=None, total_count_update_frequency=5,
                 total_count_quadrature_nodes=12, **kwargs):
        super().__init__(**kwargs)
        self.total_count = total_count
        self.learn_total_count = learn_total_count
        self.total_count_lr = total_count_lr
        self.total_count_update_frequency = total_count_update_frequency
        self.total_count_quadrature_nodes = total_count_quadrature_nodes

    def _current_total_count(self) -> float:
        if hasattr(self, "_raw_total_count_"):
            return float(math.exp(self._raw_total_count_))
        return float(self.total_count)

    def _make_likelihood(self):
        return _NegativeBinomialLikelihood(self._current_total_count())

    def _initialize_likelihood_state(self, y_t):
        if self.total_count <= 0:
            raise ValueError("total_count must be positive.")
        if self.total_count_update_frequency <= 0:
            raise ValueError("total_count_update_frequency must be positive.")
        if self.total_count_quadrature_nodes <= 0:
            raise ValueError("total_count_quadrature_nodes must be positive.")
        if self.learn_total_count:
            if not (self.warm_start and hasattr(self, "_raw_total_count_")):
                self._raw_total_count_ = math.log(float(self.total_count))
            lr = self.lr if self.total_count_lr is None else self.total_count_lr
            self._tc_tx_ = optax.adam(lr)
            self._tc_opt_state_ = self._tc_tx_.init(
                jnp.asarray(self._raw_total_count_))
        elif hasattr(self, "_raw_total_count_"):
            del self._raw_total_count_

    def _step_auxiliary_parameters(self, *, targets, outer):
        tc = self._current_total_count()
        record = {"total_count": tc, "grad_total_count": 0.0,
                  "total_count_updated": 0.0}
        if not self.learn_total_count:
            return record
        mean = jnp.asarray(self._last_mean_)[: targets.shape[0]]
        var = jnp.asarray(self._last_sigma_diag_)[: targets.shape[0]]
        g = core.negative_binomial_total_count_gradient(
            targets, mean, var, total_count=tc,
            quadrature_nodes=self.total_count_quadrature_nodes)
        record["grad_total_count"] = float(g)
        if (outer + 1) % self.total_count_update_frequency == 0:
            raw = jnp.asarray(self._raw_total_count_)
            grad_raw = g * jnp.exp(raw)      # chain rule to log space
            updates, self._tc_opt_state_ = self._tc_tx_.update(
                -grad_raw, self._tc_opt_state_, raw)
            self._raw_total_count_ = float(optax.apply_updates(raw, updates))
            record["total_count"] = self._current_total_count()
            record["total_count_updated"] = 1.0
        return record

    def _history_parameter_record(self):
        return {"total_count": self._current_total_count(),
                "grad_total_count": 0.0, "total_count_updated": 0.0}

    def predict_mean_count(self, X):
        return self.predict_response_mean(X)

    def predict(self, X):
        return self.predict_mean_count(X)

    def fit(self, X, y):
        fitted = super().fit(X, y)
        self.total_count_ = self._current_total_count()
        self.shape_parameter_ = self.total_count_
        return fitted
