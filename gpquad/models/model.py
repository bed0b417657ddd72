"""EFGP model facade (component C11).

User-facing stateful wrapper with the reference ``EFGPND`` API surface
(reference: efgpnd.py:336-1226): ``predict``, ``compute_gradients``,
``optimize_hyperparameters``, ``sample_posterior``, fit caching keyed on a
hyperparameter fingerprint, CG warm starts, and an options dict.

Differences by design (TPU-first):
  - hyperparameters live in an immutable :class:`HyperState` pytree updated
    functionally by optax — no ``nn.Parameter`` mutation and no
    ``register_optimizer`` monkey-patching (efgpnd.py:473-511 is obsolete:
    cache sync is automatic because state is explicit);
  - every gradient step runs on a bucketed static-size grid
    (quadrature.bucket_mtot) so XLA compiles the step once even as the
    lengthscale — and with it the grid size — moves;
  - all stochastic estimators consume explicit PRNG keys.
"""
from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels import HyperState, make_kernel
from ..ops.slq import logdet_slq
from ..quadrature import bucket_mtot, grid_geometry_jit, spectral_grid
from .efgp import FitState, fit_with_grid, predict_mean, predict_var
from .gradient import gradient_with_grid

__all__ = ["EFGP"]


class EFGP:
    """Equispaced-Fourier GP regression in d dimensions (TPU-native).

    Parameters mirror reference EFGPND.__init__ (efgpnd.py:359-471):
    ``kernel`` may be a kernel object or a string ("SquaredExponential",
    "SE", "Matern12/32/52"); with ``estimate_params=True`` hypers are
    initialized by the median-distance heuristic.
    """

    def __init__(self, x, y, kernel, sigmasq: Optional[float] = None,
                 eps: float = 1e-2, nufft_eps: Optional[float] = None,
                 opts: Optional[Dict] = None, estimate_params: bool = True,
                 key=None):
        """``nufft_eps`` is accepted for drop-in compatibility with the
        reference signature (efgpnd.py:359-369) and ignored: the MXU/Pallas
        NUFFT applies are exact, so there is no spreading tolerance."""
        x = jnp.asarray(x)
        if x.ndim == 1:
            x = x[:, None]
        self.x = x
        self.y = jnp.asarray(y)
        self.eps = eps
        self.opts = {} if opts is None else dict(opts)
        self.key = key if key is not None else jax.random.PRNGKey(0)
        n, d = x.shape

        kernel = make_kernel(kernel, dimension=d)
        if estimate_params:
            l, v, nv = kernel.estimate_hyperparameters(self.x, self.y)
            kernel = kernel.with_hypers(jnp.stack([l, v]))
            if sigmasq is None:
                sigmasq = nv
        if sigmasq is None:
            sigmasq = 0.1
        self._template = kernel
        self.params = HyperState.create(kernel, sigmasq)

        self._state: Optional[FitState] = None
        self._fitted_raw = None
        self._last_gradient_beta = None
        self.last_gradient_stats: Dict = {}
        self.training_log: Dict = {}

    # ------------------------------------------------------------------
    @property
    def kernel(self):
        """Kernel carrying the current hyperparameter values."""
        return self.params.kernel_of(self._template)

    @property
    def sigmasq(self):
        return self.params.sig2

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def _params_changed(self) -> bool:
        """Fingerprint check (reference _params_changed, efgpnd.py:537-571,
        1e-8 tolerance on positive-space values)."""
        if self._fitted_raw is None:
            return True
        return bool(np.max(np.abs(np.exp(np.asarray(self.params.raw))
                                  - np.exp(self._fitted_raw))) > 1e-8)

    def _domain_length(self) -> float:
        xm = np.asarray(self.x)
        L = float(np.max(xm.max(axis=0) - xm.min(axis=0)))
        return L if L > 1e-9 else 1.0

    # ------------------------------------------------------------------
    def fit(self, force_recompute: bool = False) -> "EFGP":
        """Compute/cache the mean solve (reference
        _compute_common_parameters, efgpnd.py:710-822)."""
        if self._state is not None and not force_recompute \
                and not self._params_changed():
            return self
        kernel = self.kernel
        _, h, mtot = spectral_grid(kernel, self.eps, self._domain_length())
        beta0 = None
        if self.opts.get("mean_cg_warm_start", True) \
                and self._state is not None and self._state.M == mtot ** self.x.shape[1]:
            beta0 = self._state.beta
        self._state = fit_with_grid(
            self.x, self.y, kernel, self.sigmasq, h, mtot,
            cg_tol=self.opts.get("cg_tolerance", 1e-4),
            max_cg_iter=self.opts.get("max_cg_iterations"),
            beta0=beta0,
            use_precond=self.opts.get("mean_cg_preconditioner", True),
            nufft_method=self.opts.get("nufft_method", "mxu"))
        self._fitted_raw = np.asarray(self.params.raw).copy()
        return self

    def predict(self, x_new, *, return_variance: bool = True,
                variance_method: str = "stochastic",
                hutchinson_probes: int = 1000,
                compute_log_marginal: bool = False,
                force_recompute: bool = False, key=None):
        """Posterior mean (and variance / log-marginal) at ``x_new``
        (reference predict, efgpnd.py:824-972).

        Returns ``(mean, var)`` — ``var`` is ``None`` when
        ``return_variance=False`` — plus the log-marginal when
        ``compute_log_marginal=True``."""
        x_new = jnp.asarray(x_new)
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        self.fit(force_recompute=force_recompute)
        st = self._state
        mean = predict_mean(st, x_new)
        if return_variance:
            var = predict_var(
                st, x_new, method=variance_method,
                key=key if key is not None else self._next_key(),
                probes=hutchinson_probes,
                cg_tol=self.opts.get("cg_tolerance", 1e-4),
                max_cg_iter=self.opts.get("max_cg_iterations", 1000))
        else:
            var = None
        if compute_log_marginal:
            return mean, var, self.log_marginal()
        return mean, var

    def log_marginal(self, key=None):
        """SLQ log marginal likelihood of the fitted model.

        Uses the gradient-path formula of the reference
        (efgpnd.py:280-289): ``-0.5 (y.alpha + logdet C + n log 2 pi)``
        with ``alpha = (y - F D beta)/sigma^2 = C^{-1} y``.  The
        reference's predict-path variant (efgpnd.py:1024-1066) instead uses
        ``sum |ws| |beta|^2`` as the data-fit term, which is not
        ``y^T C^{-1} y``; this build standardizes on the correct quantity.
        """
        self.fit()
        st = self._state
        n = self.x.shape[0]
        log_det = logdet_slq(
            st.ws, st.sigmasq, st.toeplitz,
            key if key is not None else self._next_key(),
            probes=self.opts.get("log_marginal_probes", 100),
            steps=self.opts.get("log_marginal_steps", 25),
            n=n)
        yhat = predict_mean(st, self.x)  # F (ws beta), real part
        data_fit = jnp.sum(self.y * (self.y - yhat)) / st.sigmasq
        return -0.5 * (data_fit + log_det + n * jnp.log(2 * jnp.pi))

    # ------------------------------------------------------------------
    def _grid_plan(self, bucket: bool):
        """Plan (h, mtot, hm) for the current hypers; optionally bucket the
        grid size so the jitted gradient step keeps a static shape."""
        kernel = self.kernel
        h, hm_real = grid_geometry_jit(kernel, self.eps,
                                       self._domain_length())
        hm = int(np.ceil(float(hm_real) - 1e-12))
        mtot = 2 * hm + 1
        if bucket:
            return float(h), bucket_mtot(mtot), hm
        return float(h), mtot, hm

    def compute_gradients(self, *, trace_samples: int = 10,
                          cg_tol: Optional[float] = None,
                          noise_floor: Optional[float] = None,
                          compute_log_marginal: bool = False,
                          log_marginal_probes: int = 100,
                          log_marginal_steps: int = 25,
                          bucket_grid: bool = True, key=None, probes=None):
        """Gradient of the negative log marginal wrt *log-space* hypers
        (chain rule grad_raw = grad_pos * pos, reference efgpnd.py:689-703).

        Returns ``grad_raw`` or ``(grad_raw, log_marginal)``; updates
        ``last_gradient_stats`` (reference efgpnd.py:625-675).
        """
        if cg_tol is None:
            cg_tol = self.opts.get("gradient_cg_tolerance", 0.1 * self.eps)
        if noise_floor is None:
            noise_floor = self.opts.get("noise_floor")
        h, mtot, hm = self._grid_plan(bucket_grid)
        d = self.x.shape[1]
        ws_mask = None
        if bucket_grid:
            from ..quadrature import flat_grid_mask
            ws_mask = flat_grid_mask(mtot, d, hm, dtype=self.x.dtype)
        beta0 = None
        if self.opts.get("mean_cg_warm_start", True) \
                and self._last_gradient_beta is not None \
                and self._last_gradient_beta.shape[0] == mtot ** d:
            beta0 = self._last_gradient_beta
        nufft_caps = None
        if self.opts.get("nufft_method", "mxu") == "banded":
            from .efgp import plan_nufft_caps
            nufft_caps = plan_nufft_caps(self.x, h, mtot)
        res = gradient_with_grid(
            self.x, self.y, self.kernel, self.sigmasq, h,
            key if key is not None else self._next_key(),
            mtot=mtot, trace_samples=trace_samples, cg_tol=cg_tol,
            noise_floor=noise_floor, beta0=beta0, ws_mask=ws_mask,
            use_mean_precond=self.opts.get("mean_cg_preconditioner", True),
            use_trace_precond=self.opts.get("trace_cg_preconditioner", True),
            nufft_method=self.opts.get("nufft_method", "mxu"),
            nufft_caps=nufft_caps,
            probes=probes, compute_log_marginal=compute_log_marginal,
            log_marginal_probes=log_marginal_probes,
            log_marginal_steps=log_marginal_steps)
        self._last_gradient_beta = res.beta
        self.last_gradient_stats = {
            "mean_cg_iters": int(res.mean_cg_iters),
            "trace_cg_iters": int(res.trace_cg_iters),
            "feature_count": mtot ** d,
            "mtot": mtot,
            "trace_samples": trace_samples,
            "mean_cg_warm_start_used": beta0 is not None,
            "mean_cg_preconditioned": self.opts.get("mean_cg_preconditioner", True),
            "trace_cg_preconditioned": self.opts.get("trace_cg_preconditioner", True),
        }
        grad_raw = res.grad * self.params.pos
        if compute_log_marginal:
            return grad_raw, res.log_marginal
        return grad_raw

    def optimize_hyperparameters(self, *, optimizer="adam", lr: float = 0.1,
                                 max_iters: int = 50,
                                 min_lengthscale: float = 5e-3,
                                 log_interval: int = 10,
                                 compute_log_marginal: bool = False,
                                 verbose: bool = False,
                                 trace_samples: int = 10, key=None,
                                 **gkwargs) -> "EFGP":
        """Adam loop on log-space hypers with the min-lengthscale clamp
        (reference optimize_hyperparameters, efgpnd.py:1068-1226)."""
        if isinstance(optimizer, str):
            if optimizer.lower() != "adam":
                raise ValueError(f"Unsupported optimizer string: {optimizer}")
            tx = optax.adam(lr)
        else:
            tx = optimizer
        opt_state = tx.init(self.params.raw)
        if key is not None:
            self.key = key

        # jitted per-iteration tail: Adam step + min-lengthscale clamp in
        # one dispatch (eager optax costs ~dozens of remote-TPU round-trips
        # per iteration)
        ls_idx = (self.params.names.index("lengthscale")
                  if "lengthscale" in self.params.names else None)

        @jax.jit
        def adam_step(raw, opt_state, grad_raw):
            updates, opt_state = tx.update(grad_raw, opt_state, raw)
            raw = optax.apply_updates(raw, updates)
            if ls_idx is not None:
                raw = raw.at[ls_idx].set(
                    jnp.maximum(raw[ls_idx], jnp.log(min_lengthscale)))
            return raw, opt_state

        history: Dict = {"log_marginal": [], "gradients": [],
                         "mean_cg_iters": [], "trace_cg_iters": [],
                         "sigmasq": []}
        for name in self.params.names:
            history[name] = []

        start = time.time()
        for it in range(max_iters):
            pos = np.exp(np.asarray(self.params.raw))
            for i, name in enumerate(self.params.names):
                history[name].append(float(pos[i]))
            history["sigmasq"].append(float(pos[-1]))

            want_lm = compute_log_marginal and (
                it % log_interval == 0 or it == max_iters - 1)
            out = self.compute_gradients(
                trace_samples=trace_samples,
                compute_log_marginal=want_lm, **gkwargs)
            grad_raw = out[0] if want_lm else out
            if want_lm:
                history["log_marginal"].append(float(out[1]))

            history["gradients"].append(np.asarray(grad_raw).tolist())
            history["mean_cg_iters"].append(
                self.last_gradient_stats.get("mean_cg_iters"))
            history["trace_cg_iters"].append(
                self.last_gradient_stats.get("trace_cg_iters"))

            new_raw, opt_state = adam_step(self.params.raw, opt_state,
                                           grad_raw)
            self.params = self.params.replace_raw(new_raw)
            if verbose and (it % log_interval == 0 or it == max_iters - 1):
                print(f"iter {it}/{max_iters}: "
                      + ", ".join(f"{n}={v[-1]:.6g}"
                                  for n, v in history.items()
                                  if v and n != "gradients"))

        # final refit with learned hypers (reference efgpnd.py:1207-1214)
        self.fit(force_recompute=True)
        self.training_log = history
        if verbose:
            print(f"Optimization complete after {time.time()-start:.2f}s")
        return self

    # ------------------------------------------------------------------
    def sample_posterior(self, x_new, nsamples: int, key=None):
        """Dense-Cholesky posterior sampler at targets (reference
        sample_posterior, efgpnd.py:974-1022).  O(nnew^2 n) — oracle-scale
        path, mirrors the reference's dense implementation."""
        x_new = jnp.asarray(x_new)
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        kernel = self.kernel
        n = self.x.shape[0]
        Kso = kernel.kernel_matrix(x_new, self.x)
        Koo = kernel.kernel_matrix(self.x, self.x) \
            + self.sigmasq * jnp.eye(n, dtype=self.x.dtype)
        Kss = kernel.kernel_matrix(x_new, x_new)
        cov = Kss - Kso @ jnp.linalg.solve(Koo, Kso.T)
        cov = cov + 1e-10 * jnp.eye(x_new.shape[0], dtype=cov.dtype)
        L = jnp.linalg.cholesky(cov)
        z = jax.random.normal(key if key is not None else self._next_key(),
                              (x_new.shape[0], nsamples), dtype=cov.dtype)
        mean, _ = self.predict(x_new, return_variance=False)
        return np.asarray(mean[:, None] + L @ z)
