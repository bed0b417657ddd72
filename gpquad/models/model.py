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
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels import HyperState, make_kernel
from ..ops.slq import logdet_slq
from ..quadrature import bucket_mtot, grid_geometry_jit, spectral_grid


@jax.jit
def _grid_geometry_stacked(kernel, eps, L):
    """Grid geometry as ONE stacked array so the per-iteration plan costs
    a single device->host read (each read is a ~25 ms tunnel round trip)."""
    h, hm_real = grid_geometry_jit(kernel, eps, L)
    return jnp.stack([jnp.asarray(h), jnp.asarray(hm_real)])
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

    @property
    def state(self) -> "FitState":
        """The cached ``FitState`` (fits first if needed) — the handle the
        functional API (predict_mean/predict_var/sampling) consumes."""
        self.fit()
        return self._state

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
            nufft_method=self.opts.get("nufft_method", "mxu"),
            solver=self.opts.get("solver", "auto"),
            precond_rank=self.opts.get("precond_rank", 0),
            precond=self.opts.get("precond", "auto"))
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
        grid size so the jitted gradient step keeps a static shape.

        Bucketed plans apply grow-only rung HYSTERESIS across the model's
        lifetime: a larger rung with the planned ``hm`` masked in is
        algebraically identical (surplus nodes carry exactly-zero
        quadrature weight), so a hyper-learning trajectory whose
        lengthscale grows never pays a fresh ~15 s gradient-step compile
        for a smaller rung it has already outgrown (same cold-start fix
        as the PG estimator's ``_plan_grid``; the hm-driven mask keeps
        every step exact).

        One stacked device->host read (each scalar read costs a full
        ~25 ms tunnel round trip on the remote-TPU backend)."""
        kernel = self.kernel
        h, hm_real = np.asarray(_grid_geometry_stacked(
            kernel, self.eps, self._domain_length()))
        hm = int(np.ceil(float(hm_real) - 1e-12))
        mtot = 2 * hm + 1
        if bucket:
            mtot = max(bucket_mtot(mtot), getattr(self, "_mtot_floor", 0))
            self._mtot_floor = mtot
            return float(h), mtot, hm
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
            solver=self.opts.get("solver", "auto"),
            precond_rank=self.opts.get("precond_rank", 0),
            precond=self.opts.get("precond", "auto"),
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

        # fused per-iteration step: gradient + log-space chain rule + Adam
        # + clamp in ONE dispatch.  Only the grid plan (one scalar read to
        # pick the static bucket) and this dispatch touch the host per
        # iteration; history is device arrays fetched in bulk afterwards.
        # (The unfused loop pays ~8 tunnel round-trips x ~25 ms per
        # iteration: 300 ms/iter vs ~110 ms/iter fused at n=1e5 on v5e.)
        template = self._template
        rdtype = self.x.dtype
        cg_tol = gkwargs.pop("cg_tol", None)
        if cg_tol is None:
            cg_tol = self.opts.get("gradient_cg_tolerance", 0.1 * self.eps)
        noise_floor = gkwargs.pop("noise_floor",
                                  self.opts.get("noise_floor"))
        gw = dict(trace_samples=trace_samples, cg_tol=cg_tol,
                  noise_floor=noise_floor,
                  use_mean_precond=self.opts.get("mean_cg_preconditioner",
                                                 True),
                  use_trace_precond=self.opts.get("trace_cg_preconditioner",
                                                  True),
                  nufft_method=self.opts.get("nufft_method", "mxu"),
                  solver=self.opts.get("solver", "auto"),
                  precond_rank=self.opts.get("precond_rank", 0),
                  precond=self.opts.get("precond", "auto"),
                  **gkwargs)

        # the fused step closes over tx, so a fresh jit per optimize()
        # call would recompile everything (the unfused path's
        # gradient_with_grid cache is module-level).  Cache the compiled
        # step on the instance keyed by everything that shapes the trace.
        def _keyable(v):
            # array-valued kwargs (e.g. fixed probes) get BAKED into the
            # compiled step as constants; their str() is truncated, so a
            # value-based key could silently reuse a step compiled with
            # DIFFERENT array contents — never cache across those
            if isinstance(v, (jnp.ndarray, np.ndarray)) \
                    or (isinstance(v, (tuple, list))
                        and any(isinstance(e, (jnp.ndarray, np.ndarray))
                                for e in v)):
                raise TypeError("array-valued option")
            return str(v)

        try:
            cache_key = (type(tx).__name__, lr if isinstance(optimizer, str)
                         else id(optimizer), min_lengthscale, str(rdtype),
                         tuple(sorted((k, _keyable(v))
                                      for k, v in gw.items())))
        except TypeError:
            cache_key = None
        cached = getattr(self, "_fused_step_cache", None)
        if cache_key is not None and cached is not None \
                and cached[0] == cache_key:
            fused_step = cached[1]
        else:
            @partial(jax.jit, static_argnames=("mtot",))
            def fused_step(x, y, raw, opt_state, h, key, hm, beta0, *,
                           mtot):
                # hm is TRACED (flat_grid_mask is comparison-based), so
                # only bucket-rung changes of mtot recompile; the PRNG
                # split also lives here (an eager split is one more
                # ~25 ms tunnel dispatch per iteration)
                from ..quadrature import flat_grid_mask
                key, sub = jax.random.split(key)
                ws_mask = flat_grid_mask(mtot, x.shape[1], hm, dtype=rdtype)
                pos = jnp.exp(raw)
                kern = template.with_hypers(pos[:-1].astype(rdtype))
                res = gradient_with_grid(x, y, kern, pos[-1].astype(rdtype),
                                         h, sub, mtot=mtot, beta0=beta0,
                                         ws_mask=ws_mask, **gw)
                grad_raw = res.grad.astype(raw.dtype) * pos
                updates, new_opt = tx.update(grad_raw, opt_state, raw)
                new_raw = optax.apply_updates(raw, updates)
                if ls_idx is not None:
                    new_raw = new_raw.at[ls_idx].set(
                        jnp.maximum(new_raw[ls_idx],
                                    jnp.log(min_lengthscale)))
                return (new_raw, new_opt, key, grad_raw, res.beta,
                        res.mean_cg_iters, res.trace_cg_iters)
            if cache_key is not None:
                self._fused_step_cache = (cache_key, fused_step)

        history: Dict = {"log_marginal": [], "gradients": [],
                         "mean_cg_iters": [], "trace_cg_iters": [],
                         "sigmasq": []}
        for name in self.params.names:
            history[name] = []

        raw_hist, grad_hist, mit_hist, tit_hist = [], [], [], []
        from ..quadrature import flat_grid_mask
        start = time.time()
        for it in range(max_iters):
            raw_hist.append(self.params.raw)

            want_lm = compute_log_marginal and (
                it % log_interval == 0 or it == max_iters - 1)
            if want_lm:
                # rare slow path: log-marginal via the unfused estimator
                grad_raw, lm = self.compute_gradients(
                    trace_samples=trace_samples, cg_tol=cg_tol,
                    noise_floor=noise_floor, compute_log_marginal=True,
                    **gkwargs)
                history["log_marginal"].append(float(lm))
                self._last_mtot = self.last_gradient_stats["mtot"]
                new_raw, opt_state = adam_step(self.params.raw, opt_state,
                                               grad_raw)
                grad_hist.append(grad_raw)
                mit_hist.append(jnp.asarray(
                    self.last_gradient_stats["mean_cg_iters"]))
                tit_hist.append(jnp.asarray(
                    self.last_gradient_stats["trace_cg_iters"]))
            else:
                h, mtot, hm = self._grid_plan(True)
                beta0 = None
                if self.opts.get("mean_cg_warm_start", True) \
                        and self._last_gradient_beta is not None \
                        and self._last_gradient_beta.shape[0] \
                        == mtot ** self.x.shape[1]:
                    beta0 = self._last_gradient_beta
                (new_raw, opt_state, self.key, grad_raw, beta, mit,
                 tit) = fused_step(self.x, self.y, self.params.raw,
                                   opt_state, jnp.asarray(h, rdtype),
                                   self.key,
                                   jnp.asarray(hm, jnp.int32), beta0,
                                   mtot=mtot)
                self._last_gradient_beta = beta
                self._last_mtot = mtot
                grad_hist.append(grad_raw)
                mit_hist.append(mit)
                tit_hist.append(tit)
            self.params = self.params.replace_raw(new_raw)
            if verbose and (it % log_interval == 0 or it == max_iters - 1):
                print(f"iter {it}/{max_iters}: raw="
                      f"{np.asarray(self.params.raw)}")

        # bulk history fetch: four host reads total instead of four per
        # iteration
        if raw_hist:
            pos_hist = np.exp(np.asarray(jnp.stack(raw_hist)))
            grads = np.asarray(jnp.stack(grad_hist))
            mits = np.asarray(jnp.stack(mit_hist))
            tits = np.asarray(jnp.stack(tit_hist))
            for i, name in enumerate(self.params.names):
                history[name] = [float(v) for v in pos_hist[:, i]]
            history["sigmasq"] = [float(v) for v in pos_hist[:, -1]]
            history["gradients"] = [g.tolist() for g in grads]
            history["mean_cg_iters"] = [int(v) for v in mits]
            history["trace_cg_iters"] = [int(v) for v in tits]
            self.last_gradient_stats = {
                "mean_cg_iters": int(mits[-1]),
                "trace_cg_iters": int(tits[-1]),
                "feature_count": int(getattr(self, "_last_mtot", 0))
                ** self.x.shape[1],
                "mtot": int(getattr(self, "_last_mtot", 0)),
                "trace_samples": trace_samples,
                "mean_cg_warm_start_used": self._last_gradient_beta
                is not None,
                "mean_cg_preconditioned": gw["use_mean_precond"],
                "trace_cg_preconditioned": gw["use_trace_precond"],
            }

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
