"""Fused EFGP pipeline: fit + predict + hyper-gradient in ONE program.

The facade calls (fit, predict_mean, predict_var, gradient) each dispatch
their own XLA program.  For serving and for the headline benchmark the
whole pass compiles into a single program here: XLA then shares the grid
setup, NUFFT phase factors, convolution vector and Toeplitz spectrum
across stages, overlaps independent solves, and the host pays one
dispatch instead of ~8 (material on remote-TPU links with ~25 ms
round-trip latency).

This composition has no reference analogue (the reference executes
eagerly); it is pure re-plumbing of the audited stage functions.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.cg import pcg
from ..ops.dense_solve import dense_gram, dense_inverse, refine_solve
from ..ops.nufft import make_nufft
from ..ops.operators import (convolution_vector, make_A_mean,
                             make_jacobi_precond)
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from .efgp import (FitState, _cdtype, _variance_stochastic, predict_mean,
                   quadrature_weights, resolve_precond, resolve_solver,
                   tensor_grid)
from .gradient import gradient_with_grid

__all__ = ["FusedResult", "fit_predict_grad",
           "FusedHighResult", "fit_predict_grad_high"]


class FusedResult(NamedTuple):
    mean: jnp.ndarray          # (B,) posterior mean at targets
    var: jnp.ndarray           # (B,) posterior variance at targets
    grad: jnp.ndarray          # (H+1,) NLL gradient wrt positive hypers
    beta: jnp.ndarray          # (M,) mean-solve weights
    mean_cg_iters: jnp.ndarray
    trace_cg_iters: jnp.ndarray
    mean_converged: jnp.ndarray = True   # honest solve-convergence flag


@partial(jax.jit, static_argnames=(
    "mtot", "trace_samples", "var_probes", "cg_tol", "var_cg_tol",
    "grad_cg_tol", "max_cg_iter", "var_max_cg_iter", "solver",
    "nufft_method", "nufft_caps", "precond", "fft_smooth"))
def fit_predict_grad(x, y, xnew, kernel, sigmasq, h, key, *, mtot: int,
                     trace_samples: int = 10, var_probes: int = 256,
                     cg_tol: float = 1e-6, var_cg_tol: float = 1e-4,
                     grad_cg_tol: float = 1e-4, max_cg_iter: int = 1000,
                     var_max_cg_iter: Optional[int] = None,
                     ws_mask=None, solver: str = "auto",
                     nufft_method: str = "mxu",
                     nufft_caps: Optional[tuple] = None,
                     precond: str = "auto",
                     fft_smooth: bool = False) -> FusedResult:
    """One compiled pass: mean fit + target mean/variance + one
    hyper-gradient evaluation (the BASELINE.md north-star workload)."""
    if x.ndim == 1:
        x = x[:, None]
    if xnew.ndim == 1:
        xnew = xnew[:, None]
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    h = jnp.asarray(h, rdtype)
    sigmasq = jnp.asarray(sigmasq, rdtype)
    kernel = kernel.with_hypers(kernel.hyper_vector().astype(rdtype))

    # shared grid artifacts (XLA CSEs these against the gradient stage)
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * h, d)
    ws = quadrature_weights(kernel, xis, h, d, mask=ws_mask)
    caps = nufft_caps or (None, None)
    nufft = make_nufft(x, h, mtot, cdtype=cdtype, method=nufft_method,
                       cap=caps[0])
    v = convolution_vector(m, x, h, nufft_method=nufft_method, cap=caps[1])
    toeplitz = make_toeplitz(v, force_pow2=not fft_smooth)
    diag_scale = toeplitz_diag_scale(v)
    rhs = ws * nufft.type1(y.astype(cdtype)).reshape(-1)

    A_dense = P_dense = kron = None
    if resolve_solver(solver, mtot, d) == "dense":
        A_dense = dense_gram(ws, v, mtot, d, sigmasq)
        P_dense = dense_inverse(A_dense)
        res_mean = refine_solve(A_dense, P_dense, rhs, tol=cg_tol)
    else:
        A_mean = make_A_mean(ws, toeplitz, sigmasq)
        if resolve_precond(precond, 0, True, d) == "kron":
            from ..ops.kron_precond import kron_eig_build, make_kron_precond
            kron = kron_eig_build(ws, v, sigmasq, mtot=mtot, d=d,
                                  diag_scale=diag_scale)
            M_inv = make_kron_precond(kron)
        else:
            M_inv = make_jacobi_precond(ws, sigmasq, diag_scale=diag_scale)
        res_mean = pcg(A_mean, rhs, tol=cg_tol, maxiter=max_cg_iter,
                       M_inv=M_inv)
    state = FitState(beta=res_mean.x, ws=ws, h=h, sigmasq=sigmasq,
                     toeplitz=toeplitz, mean_cg_iters=res_mean.iters,
                     diag_scale=diag_scale, A_dense=A_dense, P_dense=P_dense,
                     kron=kron, mtot=mtot, d=d)

    mean = predict_mean(state, xnew)
    kv, kg = jax.random.split(key)
    var = _variance_stochastic(
        state, xnew, kv, probes=var_probes, cg_tol=var_cg_tol,
        max_cg_iter=var_max_cg_iter if var_max_cg_iter is not None
        else max_cg_iter)
    # state=state: the gradient stage reuses the fit's operator pytrees
    # (Toeplitz spectrum, dense factors, preconditioner) so the merged
    # program carries one copy of the construction graph (VERDICT r4 #4)
    gres = gradient_with_grid(x, y, kernel, sigmasq, h, kg, mtot=mtot,
                              trace_samples=trace_samples,
                              cg_tol=grad_cg_tol, max_cg_iter=max_cg_iter,
                              beta0=res_mean.x, ws_mask=ws_mask,
                              solver=solver, nufft_method=nufft_method,
                              nufft_caps=nufft_caps, precond=precond,
                              fft_smooth=fft_smooth, state=state)
    return FusedResult(mean=mean, var=var, grad=gres.grad, beta=res_mean.x,
                       mean_cg_iters=res_mean.iters,
                       trace_cg_iters=gres.trace_cg_iters,
                       mean_converged=res_mean.converged)


class FusedHighResult(NamedTuple):
    fused: FusedResult
    mean_high: jnp.ndarray     # (B,) df64-accurate posterior mean
    high_residual: jnp.ndarray # df64 relative residual of the high solve


@partial(jax.jit, static_argnames=(
    "mtot", "trace_samples", "var_probes", "cg_tol", "var_cg_tol",
    "grad_cg_tol", "max_cg_iter", "var_max_cg_iter", "solver",
    "nufft_method", "nufft_caps", "passes", "chunk", "slab",
    "exact_tables", "precond", "fft_smooth"))
def _fused_high_jit(x, y, xnew, kernel, sigmasq, h, key,
                    ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo, *,
                    mtot: int, trace_samples: int, var_probes: int,
                    cg_tol: float, var_cg_tol: float, grad_cg_tol: float,
                    max_cg_iter: int, var_max_cg_iter, solver: str,
                    nufft_method: str, nufft_caps, passes: int, chunk: int,
                    slab: int, exact_tables: bool = False,
                    precond: str = "auto", fft_smooth: bool = False
                    ) -> FusedHighResult:
    from .precision import _fit_high_core, _predict_high_jit
    fused = fit_predict_grad(
        x, y, xnew, kernel, sigmasq, h, key, mtot=mtot,
        trace_samples=trace_samples, var_probes=var_probes, cg_tol=cg_tol,
        var_cg_tol=var_cg_tol, grad_cg_tol=grad_cg_tol,
        max_cg_iter=max_cg_iter, var_max_cg_iter=var_max_cg_iter,
        solver=solver, nufft_method=nufft_method, nufft_caps=nufft_caps,
        precond=precond, fft_smooth=fft_smooth)
    hstate, res = _fit_high_core(x, y, ws_hi, ws_lo, h_hi, h_lo,
                                 sig_hi, sig_lo, mtot=mtot, passes=passes,
                                 chunk=chunk, exact_tables=exact_tables)
    mean_high = _predict_high_jit(xnew, hstate.beta, hstate.beta,
                                  jnp.real(hstate.ws),
                                  ws_lo, h_hi, h_lo, mtot=mtot,
                                  d=x.shape[1], slab=slab, has_lo=False)
    return FusedHighResult(fused=fused, mean_high=mean_high,
                           high_residual=res)


def fit_predict_grad_high(x, y, xnew, kernel, sigmasq, h, key, *, mtot: int,
                          passes: int = 8, chunk: int = 8, slab: int = 2048,
                          fuse: bool = True, exact_tables: bool = False,
                          **kw) -> FusedHighResult:
    """The full north-star workload as ONE compiled program: the fused f32
    pass (mean + stochastic variance + hyper-gradient) plus the df64
    high-precision refit + mean that delivers eps=1e-6 agreement with the
    f64 dense oracle.  Fusing them saves the per-dispatch ~25-30 ms tunnel
    latency of running the two paths back-to-back (the df64 planning
    splits are host f64, so ``h``/``sigmasq``/hypers must be concrete).

    ``exact_tables`` defaults FALSE here (unlike ``fit_high``): this
    program ships the df64 MEAN only, and the chunked-MXU lag tables'
    ~1e-9 floor sits two orders inside the 1e-6 mean target — while the
    ozaki exact builder alone costs ~56 s of TPU compile
    (profile: 72.8 s vs 16.5 s for the refit sub-program,
    scripts/profile_compile.py; VERDICT r3 cold-start regression
    8.3 -> 48.7 s).  Pass True to pin variance-grade tables.

    ``fuse=False`` runs the two sub-programs as separate dispatches —
    numerically identical, but XLA:CPU's compile time on the merged module
    is pathological (tens of minutes vs ~50 s on TPU), so CPU callers and
    the test suite use the unfused path."""
    from .precision import split_f64_host, ws_host_f64
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    xnew = jnp.asarray(xnew)
    if xnew.ndim == 1:
        xnew = xnew[:, None]
    d = x.shape[1]
    h64 = float(h)
    ws_hi, ws_lo = ws_host_f64(kernel, h64, mtot, d)
    h_hi, h_lo = split_f64_host(h64)
    sig_hi, sig_lo = split_f64_host(float(sigmasq))
    kw.setdefault("trace_samples", 10)
    kw.setdefault("var_probes", 256)
    kw.setdefault("cg_tol", 1e-6)
    kw.setdefault("var_cg_tol", 1e-4)
    kw.setdefault("grad_cg_tol", 1e-4)
    kw.setdefault("max_cg_iter", 1000)
    kw.setdefault("var_max_cg_iter", None)
    kw.setdefault("solver", "auto")
    kw.setdefault("nufft_method", "mxu")
    kw.setdefault("nufft_caps", None)
    kw.setdefault("precond", "auto")
    kw.setdefault("fft_smooth", False)
    if fuse:
        return _fused_high_jit(x, jnp.asarray(y), xnew, kernel, sigmasq, h,
                               key, ws_hi, ws_lo, h_hi, h_lo, sig_hi,
                               sig_lo, mtot=mtot, passes=passes, chunk=chunk,
                               slab=slab, exact_tables=exact_tables, **kw)
    from .precision import _fit_high_core, _predict_high_jit
    fused = fit_predict_grad(x, jnp.asarray(y), xnew, kernel, sigmasq, h,
                             key, mtot=mtot, **kw)
    hstate, res = _fit_high_core(x, jnp.asarray(y), ws_hi, ws_lo, h_hi,
                                 h_lo, sig_hi, sig_lo, mtot=mtot,
                                 passes=passes, chunk=chunk,
                                 exact_tables=exact_tables)
    mean_high = _predict_high_jit(xnew, hstate.beta, hstate.beta,
                                  jnp.real(hstate.ws),
                                  ws_lo, h_hi, h_lo, mtot=mtot, d=d,
                                  slab=slab, has_lo=False)
    return FusedHighResult(fused=fused, mean_high=mean_high,
                           high_residual=res)
