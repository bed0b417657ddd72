"""Batched stochastic hyperparameter gradient of the GP log-marginal (C10).

TPU-native re-design of the reference's ``efgpnd_gradient_batched``
(reference: efgpnd.py:17-317; math spec efgpnd_gradient_note.tex:62-220).
For hypers theta = (kernel hypers..., sigma^2) the gradient of the
*negative* log marginal is estimated as ``0.5 * (term1 - term2)`` with

  term2 (quadratic forms, exact given the mean solve):
    kernel hyper i : Re< F* alpha, D'_i F* alpha >
    sigma_f^2      : (y.alpha - sigma^2 |alpha|^2) / sigma_f^2   [algebraic]
    sigma^2        : |alpha|^2

  term1 (Hutchinson traces, all probe systems in ONE batched CG):
    kernel hyper i : data-space probes z_t: solve A b = D T (D'_i F* z),
                     alpha_t = (F D'_i F* z - F D b)/sigma^2,
                     mean_t Re<z_t, alpha_t>
    sigma^2        : feature-space probes v_t via the Woodbury identity
                     tr(K^-1) = n/sigma^2 - tr(A^-1 G)/sigma^2:
                     solve A b = D T D v, n/sigma^2 - mean Re<v,b>/sigma^2
    sigma_f^2      : (n - sigma^2 * term1_noise) / sigma_f^2     [algebraic]

All randomness is keyed (``jax.random``) and probes can be passed in
explicitly, which makes the reference's same-probe dense-oracle tests
(verify_efgpnd_exact_small.py:152-196) exact rather than seed-matched.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cg import pcg
from ..ops.dense_solve import dense_gram, dense_inverse, refine_solve
from ..ops.nufft import make_nufft
from ..ops.operators import (convolution_vector, make_A_mean,
                             make_jacobi_precond)
from ..ops.slq import logdet_slq
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from ..quadrature import spectral_grid
from .efgp import _cdtype, quadrature_weights, resolve_solver, tensor_grid

__all__ = ["GradientResult", "gradient_with_grid", "gradient"]


class GradientResult(NamedTuple):
    grad: jnp.ndarray            # (H+1,) d(NLL)/d(positive hypers)
    beta: jnp.ndarray            # (M,) raw mean-solve weights (warm start)
    log_marginal: jnp.ndarray    # scalar (nan when not requested)
    mean_cg_iters: jnp.ndarray
    trace_cg_iters: jnp.ndarray
    trace_conv_iters: jnp.ndarray  # ((tk+1)*T,) per-RHS convergence iter
                                   # (probe-block CG tails, reference
                                   # diagnose_sigma_noise_trace_blocks.py)


def _variance_index(kernel) -> Optional[int]:
    names = kernel.hyper_names
    return names.index("variance") if "variance" in names else None


@partial(jax.jit, static_argnames=(
    "mtot", "trace_samples", "cg_tol", "max_cg_iter", "use_mean_precond",
    "use_trace_precond", "compute_log_marginal", "log_marginal_probes",
    "log_marginal_steps", "nufft_method", "nufft_caps", "solver",
    "precond_rank", "precond", "fft_smooth"))
def gradient_with_grid(
        x, y, kernel, sigmasq, h, key, *, mtot: int, trace_samples: int = 10,
        cg_tol: float = 1e-3, max_cg_iter: Optional[int] = None,
        noise_floor=None, beta0=None, ws_mask=None,
        use_mean_precond: bool = True, use_trace_precond: bool = True,
        probes: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        compute_log_marginal: bool = False, log_marginal_probes: int = 100,
        log_marginal_steps: int = 25,
        nufft_method: str = "mxu", nufft_caps: Optional[tuple] = None,
        solver: str = "auto", precond_rank: int = 0,
        precond: str = "auto", fft_smooth: bool = False,
        state=None) -> GradientResult:
    """One gradient evaluation on a fixed-size frequency grid (jitted).

    Stage structure mirrors reference efgpnd.py:94-289; ``ws_mask`` zeroes
    padded grid nodes (both D and D') so bucketed static grids remain
    algebraically exact under changing hyperparameters.
    ``precond_rank > 0`` preconditions the CG branch with the dense-head
    deflation block (ops/deflation.py), built ONCE and shared by the mean
    solve and every probe system.

    ``state`` (optional ``FitState`` from the SAME kernel/sigmasq/grid,
    no noise floor): reuse the fit's ws / Toeplitz spectrum / dense
    factors / preconditioner blocks instead of rebuilding them — the
    fused pipeline passes it so the merged program carries ONE copy of
    the operator-construction graph (compile-time lever, VERDICT r4 #4).
    The NUFFT phase tables are still built here (they are not carried on
    the state); XLA CSEs them against the fit's inside one jit.

    Accuracy note (measured, round 5): the f32 gradient's error against
    the same-probe dense f64 oracle is dominated by ``cg_tol``, not by
    f32 arithmetic.  Heavy-tailed spectra amplify the trace-system
    residual through ``D'`` far harder than SE: Matérn-3/2 at the bench
    config leaves 1.2e-2 relative error at cg_tol=1e-4 but 9.4e-5 at
    1e-6 (SE: 3.4e-3 -> ~1e-4).  With the kron/deflation preconditioners
    the deeper solve costs a handful of extra iterations, so prefer
    cg_tol <= 1e-6 when the f32 gradient itself must be publishable;
    ``models/gradient_high`` remains the 1e-7-class tier.
    """
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    h = jnp.asarray(h, dtype=rdtype)
    sigmasq = jnp.asarray(sigmasq, dtype=rdtype)
    # cast hypers alongside sigmasq/h: f64 hypers (HyperState.create under
    # x64) would otherwise upcast ws and the whole pipeline to complex128
    # and scatter f64 values into the f32 term1/term2 arrays
    kernel = kernel.with_hypers(kernel.hyper_vector().astype(rdtype))
    sigmasq_eff = (jnp.maximum(sigmasq, noise_floor)
                   if noise_floor is not None else sigmasq)

    names = kernel.hyper_names
    num_hypers = kernel.num_hypers
    variance_idx = _variance_index(kernel)
    kernel_hyper_count = num_hypers - 1
    trace_kernel_indices = [i for i in range(kernel_hyper_count)
                            if i != variance_idx]
    tk = len(trace_kernel_indices)
    T = trace_samples

    # --- stage 1: frequency grid, weights, density gradients ---------------
    # named scopes mirror the reference stage taxonomy (efgpnd.py:61-289)
    scope = jax.named_scope
    m = (mtot - 1) // 2
    xis_1d = jnp.arange(-m, m + 1, dtype=rdtype) * h
    xis = tensor_grid(xis_1d, d)
    ws = quadrature_weights(kernel, xis, h, d, mask=ws_mask)
    Dprime = (h**d) * kernel.spectral_grad(xis)          # (M, H)
    if ws_mask is not None:
        Dprime = Dprime * ws_mask[:, None]
    Dprime = Dprime.astype(cdtype)
    M = ws.shape[0]

    # --- stage 2/3: NUFFT + Toeplitz + operators ---------------------------
    caps = nufft_caps or (None, None)
    nufft = make_nufft(x, h, mtot, cdtype=cdtype, method=nufft_method,
                       cap=caps[0])
    fadj = lambda v: nufft.type1(v).reshape(v.shape[:-1] + (M,))
    fwd = lambda fk: nufft.type2(fk)
    if state is not None:
        # shared-operator path (fused pipeline): one copy of the
        # Toeplitz spectrum / dense factors / preconditioner graphs
        ws = state.ws
        toeplitz = state.toeplitz
        diag_scale = state.diag_scale
        use_dense = state.P_dense is not None
        if use_dense:
            A_dense, P_dense = state.A_dense, state.P_dense
        else:
            A_mean = make_A_mean(ws, toeplitz, sigmasq_eff)
            if state.kron is not None:
                from ..ops.kron_precond import make_kron_precond
                M_inv_op = make_kron_precond(state.kron)
            elif state.defl_P is not None:
                from ..ops.deflation import make_block_precond
                M_inv_op = make_block_precond(
                    state.defl_idx, state.defl_P,
                    diag_scale * jnp.abs(ws) ** 2 + sigmasq_eff)
            else:
                M_inv_op = make_jacobi_precond(ws, sigmasq_eff,
                                               diag_scale=diag_scale)
    else:
        v_kernel = convolution_vector(m, x, h, nufft_method=nufft_method,
                                      cap=caps[1])
        toeplitz = make_toeplitz(v_kernel, force_pow2=not fft_smooth)
        diag_scale = toeplitz_diag_scale(v_kernel)
        use_dense = resolve_solver(solver, mtot, d) == "dense"
        if use_dense:
            A_dense = dense_gram(ws, v_kernel, mtot, d, sigmasq_eff)
            P_dense = dense_inverse(A_dense)
        else:
            from .efgp import resolve_precond
            A_mean = make_A_mean(ws, toeplitz, sigmasq_eff)
            family = resolve_precond(precond, precond_rank, True, d,
                                     n=n, M=M)
            if family == "kron":
                from ..ops.kron_precond import (kron_eig_build,
                                                make_kron_precond)
                kop = kron_eig_build(ws, v_kernel, sigmasq_eff, mtot=mtot,
                                     d=d, diag_scale=diag_scale)
                M_inv_op = make_kron_precond(kop)
            elif family == "deflation":
                from ..ops.deflation import (deflation_block,
                                             make_block_precond)
                didx, dP = deflation_block(ws, v_kernel, sigmasq_eff,
                                           mtot=mtot, d=d,
                                           rank=precond_rank
                                           if precond_rank > 0 else 2048)
                M_inv_op = make_block_precond(
                    didx, dP, diag_scale * jnp.abs(ws) ** 2 + sigmasq_eff)
            else:
                M_inv_op = make_jacobi_precond(ws, sigmasq_eff,
                                               diag_scale=diag_scale)
    if use_dense:
        def solve(b, x0=None):
            return refine_solve(A_dense, P_dense, b, tol=cg_tol, x0=x0)
    else:
        mean_M_inv = M_inv_op if use_mean_precond else None
        trace_M_inv = M_inv_op if use_trace_precond else None
        maxiter = max_cg_iter if max_cg_iter is not None else 2 * M

    # --- stage 4: mean solve A beta = D F* y -------------------------------
    Fy = fadj(y.astype(cdtype))
    rhs = ws * Fy
    if use_dense:
        res_mean = solve(rhs)
    else:
        res_mean = pcg(A_mean, rhs, beta0, tol=cg_tol, maxiter=maxiter,
                       M_inv=mean_M_inv)
    beta_raw = res_mean.x
    beta = ws * beta_raw
    alpha = (y.astype(cdtype) - fwd(beta)) / sigmasq_eff.astype(cdtype)

    # --- stage 5: term2 ----------------------------------------------------
    fadj_alpha = (Fy - toeplitz(beta)) / sigmasq_eff.astype(cdtype)
    term2_kernel = jnp.stack([
        jnp.vdot(fadj_alpha, Dprime[:, i] * fadj_alpha).real
        for i in range(kernel_hyper_count)]) if kernel_hyper_count else \
        jnp.zeros((0,), rdtype)
    alpha_norm = jnp.vdot(alpha, alpha).real
    if variance_idx is not None:
        variance = jnp.asarray(kernel.get_hyper("variance"), dtype=rdtype)
        y_alpha = jnp.vdot(y.astype(cdtype), alpha).real
        term2_kernel = term2_kernel.at[variance_idx].set(
            (y_alpha - sigmasq_eff * alpha_norm) / variance)
    term2 = jnp.concatenate([term2_kernel, alpha_norm[None]])

    # --- stage 6: assemble all probe right-hand sides ----------------------
    if probes is not None:
        Z, V = probes
        Z = Z.astype(rdtype)
        V = V.astype(rdtype)
    else:
        kz, kv = jax.random.split(key)
        Z = (jax.random.bernoulli(kz, 0.5, (T, n)) * 2 - 1).astype(rdtype)
        V = (jax.random.bernoulli(kv, 0.5, (T, M)) * 2 - 1).astype(rdtype)

    if tk > 0:
        fadjZ = fadj(Z.astype(cdtype))                       # (T, M)
        Di_FZ = jnp.stack([Dprime[:, i] * fadjZ
                           for i in trace_kernel_indices], 0)  # (tk, T, M)
        Di_FZ_flat = Di_FZ.reshape(tk * T, M)
        rhs_data = fwd(Di_FZ_flat)                            # (tk*T, n)
        B_kernel = ws * toeplitz(Di_FZ_flat)                  # (tk*T, M)
    else:
        rhs_data = jnp.zeros((0, n), cdtype)
        B_kernel = jnp.zeros((0, M), cdtype)

    B_noise = ws * toeplitz(ws * V.astype(cdtype))            # (T, M)
    B_all = jnp.concatenate([B_kernel, B_noise], axis=0)

    # --- stage 7: one batched solve for every probe system ------------------
    if use_dense:
        res_trace = solve(B_all)
    else:
        res_trace = pcg(A_mean, B_all, tol=cg_tol, maxiter=maxiter,
                        M_inv=trace_M_inv)
    Beta_all = res_trace.x

    # --- stage 7.5: assemble term1 ----------------------------------------
    term1 = jnp.zeros((num_hypers,), rdtype)
    if tk > 0:
        Beta_kernel = ws * Beta_all[:tk * T]
        fwdBeta = fwd(Beta_kernel)                            # (tk*T, n)
        Alpha = ((rhs_data - fwdBeta) / sigmasq_eff.astype(cdtype)) \
            .reshape(tk, T, n)
        t1_kernel = jnp.mean(
            jnp.sum(Z[None, :, :].astype(cdtype) * Alpha, axis=2).real, axis=1)
        for slot, idx in enumerate(trace_kernel_indices):
            term1 = term1.at[idx].set(t1_kernel[slot])

    Beta_noise = Beta_all[tk * T:]
    term1_noise = (n / sigmasq_eff
                   - jnp.mean(jnp.sum(V.astype(cdtype).conj() * Beta_noise,
                                      axis=1).real / sigmasq_eff))
    if variance_idx is not None:
        term1 = term1.at[variance_idx].set(
            (n - sigmasq_eff * term1_noise) / variance)
    term1 = term1.at[-1].set(term1_noise)

    # --- stage 8: gradient -------------------------------------------------
    grad = 0.5 * (term1 - term2)

    # --- stage 9: optional SLQ log marginal --------------------------------
    if compute_log_marginal:
        det_term = logdet_slq(ws, sigmasq_eff, toeplitz,
                              jax.random.fold_in(key, 7),
                              probes=log_marginal_probes,
                              steps=log_marginal_steps, n=n)
        vdot_term = jnp.vdot(y.astype(cdtype), alpha).real
        log_marginal = (-0.5 * vdot_term - 0.5 * det_term
                        - 0.5 * n * jnp.log(2 * jnp.pi))
    else:
        log_marginal = jnp.asarray(jnp.nan, rdtype)

    return GradientResult(grad=grad, beta=beta_raw, log_marginal=log_marginal,
                          mean_cg_iters=res_mean.iters,
                          trace_cg_iters=res_trace.iters,
                          trace_conv_iters=res_trace.conv_iters)


def gradient(x, y, kernel, sigmasq, eps, key, *, trace_samples: int = 10,
             cg_tol: Optional[float] = None, **kwargs) -> GradientResult:
    """Host-level wrapper: plan the grid (bisection, f64 host math), then run
    the jitted estimator.  Parity: efgpnd_gradient_batched entry
    (efgpnd.py:17-46: cg_tol defaults to eps)."""
    if x.ndim == 1:
        x = x[:, None]
    xm = np.asarray(x)
    L = float(np.max(xm.max(axis=0) - xm.min(axis=0)))
    if L <= 1e-9:
        L = 1.0
    _, h, mtot = spectral_grid(kernel, eps, L, use_integral=True)
    if cg_tol is None:
        cg_tol = eps
    if kwargs.get("nufft_method") == "banded" \
            and kwargs.get("nufft_caps") is None:
        from .efgp import plan_nufft_caps
        kwargs["nufft_caps"] = plan_nufft_caps(x, h, mtot)
    return gradient_with_grid(x, y, kernel, sigmasq, h, key, mtot=mtot,
                              trace_samples=trace_samples, cg_tol=cg_tol,
                              **kwargs)
