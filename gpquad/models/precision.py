"""High-precision (df64) EFGP fit and posterior mean.

``precision="high"`` path: posterior mean agreeing with the f64 dense
oracle to ~1e-6..1e-7 on f32-only TPU hardware (BASELINE.md's "eps=1e-6
agreement" target; the reference gets this for free by running f64 on
CPU, verify_efgpnd_exact_small.py:19-24).

Error budget, from the measured error decomposition of the f32 path:
the posterior-mean error is dominated by the *solve* — a CG/IR solution
with relative residual r leaves ~180 r in the mean (cond(A) ~ 6e5) — and
secondarily by the rhs/operator accuracy (~50x amplification).  So:

- quadrature weights ``ws`` and the grid spacing ``h`` are computed on the
  HOST in f64 (hypers are concrete at this level) and shipped as (hi, lo)
  f32 pairs — only real arrays cross the axon boundary;
- ``b = D F* y`` and the Toeplitz lag table come from the df64 NUFFT
  (ops/nufft_df.py), ~1e-9 relative;
- the dense operator ``A`` is assembled in df64 and the solve runs
  iterative refinement with df64 residual matvecs against the f32
  Cholesky inverse (ops/chol.py) — the refined beta converges to the f32
  representation floor (~1e-8 relative; measured contraction ~15x/pass);
- the posterior mean evaluates through the df64 type-2.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.cg import pcg
from ..ops.chol import hpd_inverse
from ..ops.dense_solve import DENSE_SOLVER_MAX_M, dense_lag_gather_indices
from ..ops.df64 import df_add, df_mul, df_mul_f, df_sub, df_sum_tree
from ..ops.nufft_df import (df_nufft1, df_nufft1_exact, df_nufft2_real,
                            split_f64_host)
from ..ops.operators import make_A_mean, make_jacobi_precond
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from ..ops.toeplitz_df import make_toeplitz_df, toeplitz_df_matvec
from .efgp import FitState, tensor_grid

__all__ = ["HighState", "ws_host_f64", "fit_high",
           "predict_mean_high", "df64_ir_solve"]

_HI = lax.Precision.HIGHEST


class HighState(NamedTuple):
    """f32 fit artifacts plus the df64 low words needed for high-precision
    prediction."""
    state: FitState
    ws_lo: jnp.ndarray      # (M,) f32 low word of the f64 quadrature weights
    h_lo: jnp.ndarray       # scalar f32 low word of the f64 grid spacing
    beta_lo: Optional[jnp.ndarray] = None   # (M,) complex64 low word of beta


def _spectral_density_np(kernel, xi: np.ndarray) -> np.ndarray:
    """Host f64 spectral density for the closed-form kernels (mirrors
    kernels/squared_exponential.py:32-38 and kernels/matern.py:57-69 in
    numpy; reference formulas kernels/squared_exponential.py:64-91,
    kernels/matern.py:100-123)."""
    import math

    from ..kernels import Matern, SquaredExponential
    l = float(kernel.lengthscale)
    v = float(kernel.variance)
    d = xi.shape[1]
    nsq = np.sum(xi * xi, axis=1)
    if isinstance(kernel, SquaredExponential):
        return (2.0 * np.pi * l * l) ** (d / 2.0) * v * np.exp(
            -2.0 * np.pi ** 2 * l * l * nsq)
    if isinstance(kernel, Matern):
        nu = kernel.nu
        scaling = ((2.0 * math.sqrt(math.pi)) ** d
                   * math.gamma(nu + d / 2.0) * (2.0 * nu) ** nu
                   / math.gamma(nu)) / l ** (2.0 * nu)
        base = 2.0 * nu / (l * l) + 4.0 * np.pi ** 2 * nsq
        return v * scaling * base ** (-(nu + d / 2.0))
    raise TypeError(
        f"precision='high' needs a host-f64 spectral density; "
        f"unsupported kernel type {type(kernel).__name__}")


def ws_host_f64(kernel, h64: float, mtot: int, d: int):
    """f64 quadrature weights on the host, split into (hi, lo) f32 pairs."""
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1, dtype=np.float64) * h64
    grids = np.meshgrid(*([k1] * d), indexing="ij")
    xi = np.stack([g.ravel() for g in grids], axis=-1)
    ws = np.sqrt(_spectral_density_np(kernel, xi) * h64 ** d)
    return split_f64_host(ws)


def _df_dense_matvec(Are, Aim, x: jnp.ndarray):
    """df64 matvec of the dense df64 operator against a complex64 vector:
    exact two-products elementwise + compensated pairwise reduction."""
    xr, xi_ = jnp.real(x), jnp.imag(x)
    t_re = df_sub(df_mul_f(Are, xr[None, :]), df_mul_f(Aim, xi_[None, :]))
    t_im = df_add(df_mul_f(Are, xi_[None, :]), df_mul_f(Aim, xr[None, :]))
    return df_sum_tree(t_re, axis=1), df_sum_tree(t_im, axis=1)


@partial(jax.jit, static_argnames=("mtot", "passes", "chunk",
                                   "exact_tables"))
def _fit_high_core(x, y, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo, *,
                   mtot: int, passes: int, chunk: int,
                   exact_tables: bool = True):
    """``exact_tables=True`` builds rhs/lag with the all-df64 compensated
    builder (~1e-13 table accuracy, robust to any conditioning);
    ``False`` uses the chunked-MXU df_nufft1 at the given ``chunk`` —
    ~2.5x cheaper at headline sizes with table error
    ~chunk^1.5 * eps_f32 / n (pass a small chunk; the fused pipeline uses
    8, landing the mean ~1e-7 at 1/3 the exact builder's cost)."""
    n, d = x.shape
    m = (mtot - 1) // 2
    h_df = (h_hi, h_lo)
    ws_df = (ws_hi, ws_lo)
    M = mtot ** d

    # rhs b = D F* y in df64
    if exact_tables:
        Fy_hi, Fy_lo = df_nufft1_exact(x, y, h_df, mtot)
    else:
        Fy_hi, Fy_lo = df_nufft1(x, y, h_df, mtot, chunk=chunk)
    # NOTE what makes this compile fast on XLA:CPU is the EVEN padding —
    # of the per-dim mode axis inside df_nufft1_exact and of the dense
    # mode space below — not these optimization_barriers: the CPU
    # pipeline deletes opt-barrier early (verified in HLO dumps; see
    # df64.hard_materialize for the barrier XLA:CPU does honor).  The
    # barriers are kept as cheap documentation of the stage seams and
    # for backends that do respect them.
    Fy_hi, Fy_lo = lax.optimization_barrier((Fy_hi, Fy_lo))
    b_re = df_mul(ws_df, (jnp.real(Fy_hi), jnp.real(Fy_lo)))
    b_im = df_mul(ws_df, (jnp.imag(Fy_hi), jnp.imag(Fy_lo)))

    # Toeplitz lag table in df64 -> dense df64 operator
    ones = jnp.ones((n,), x.dtype)
    if exact_tables:
        v_hi, v_lo = df_nufft1_exact(x, None, h_df, 4 * m + 1)
    else:
        v_hi, v_lo = df_nufft1(x, ones, h_df, 4 * m + 1, chunk=chunk)
    v_hi, v_lo = lax.optimization_barrier((v_hi, v_lo))
    # The dense solve runs in an EVEN-padded mode space Mp = M + (M % 2):
    # XLA:CPU/LLVM compiles two_sum/two_prod chains with an odd minor dim
    # pathologically slowly (df64.df_sum_tree), and M = mtot^d is always
    # odd.  The padded coordinate gets ws = 0 and b = 0, so A_pad =
    # blockdiag(A, sigma^2) — it decouples exactly, beta_pad = 0, and
    # P[:M, :M] is still the exact f32 inverse of A.
    Mp = M + (M % 2)
    p = Mp - M

    def padv(pair):
        return tuple(jnp.pad(w, ((0, p),)) for w in pair)

    wsp = padv(ws_df)
    b_re, b_im = padv(b_re), padv(b_im)
    idx = jnp.asarray(dense_lag_gather_indices(mtot, d))
    idx = jnp.pad(idx, ((0, p), (0, p)))
    row = (wsp[0][:, None], wsp[1][:, None])
    col = (wsp[0][None, :], wsp[1][None, :])
    T_re = (jnp.real(v_hi)[idx], jnp.real(v_lo)[idx])
    T_im = (jnp.imag(v_hi)[idx], jnp.imag(v_lo)[idx])
    Are = df_mul(df_mul(T_re, row), col)
    Aim = df_mul(df_mul(T_im, row), col)
    eye = jnp.eye(Mp, dtype=x.dtype)
    Are = df_add(Are, (sig_hi * eye, sig_lo * eye))
    Are, Aim = lax.optimization_barrier((Are, Aim))

    # f32 inverse of the hi word; IR with df64 residuals
    A_c = lax.complex(Are[0], Aim[0])
    P = hpd_inverse(A_c)
    b_c = lax.complex(b_re[0], b_im[0])
    beta = jnp.matmul(P, b_c, precision=_HI)
    for _ in range(passes):
        Ax_re, Ax_im = _df_dense_matvec(Are, Aim, beta)
        rr = df_sub(b_re, Ax_re)
        ri = df_sub(b_im, Ax_im)
        r = lax.complex(rr[0] + rr[1], ri[0] + ri[1])
        beta = beta + jnp.matmul(P, r, precision=_HI)

    # final true-residual report (df64-accurate)
    Ax_re, Ax_im = _df_dense_matvec(Are, Aim, beta)
    rr = df_sub(b_re, Ax_re)
    ri = df_sub(b_im, Ax_im)
    res = jnp.sqrt(jnp.sum((rr[0] + rr[1]) ** 2 + (ri[0] + ri[1]) ** 2))
    bn = jnp.sqrt(jnp.sum(b_re[0] ** 2 + b_im[0] ** 2))
    beta = beta[:M]
    A_c, P = A_c[:M, :M], P[:M, :M]

    # f32 companion artifacts so the ordinary predict_var paths work
    reshape = (4 * m + 1,) * d
    v_c = lax.complex(jnp.real(v_hi), jnp.imag(v_hi)).reshape(reshape)
    toeplitz = make_toeplitz(v_c)
    ws_c = ws_hi.astype(A_c.dtype)
    state = FitState(beta=beta, ws=ws_c, h=h_hi, sigmasq=sig_hi,
                     toeplitz=toeplitz, mean_cg_iters=jnp.asarray(
                         passes, jnp.int32),
                     diag_scale=toeplitz_diag_scale(v_c),
                     A_dense=A_c, P_dense=P, mtot=mtot, d=d)
    return state, res / bn


def df64_ir_solve(A_mean, M_inv, A_df, b_re, b_im, *, passes: int,
                  ir_tol: float, ir_maxiter: int, rtol: float = 0.0,
                  solve32=None):
    """Iterative refinement of ``A x = b`` to the df64 floor: per pass,
    the TRUE residual is computed in df64 via ``A_df`` (a (re, im) df-pair
    matvec) and the correction system solved with the f32 PCG to the
    loose ``ir_tol`` — the true residual contracts by ~ir_tol per pass.
    ``b_re``/``b_im``: df pairs shaped (M,) or (B, M) (batched RHS share
    one lane-masked PCG).  Runs as a ``lax.while_loop`` so XLA compiles
    ONE copy of the df64 matvec + inner CG, and — when ``rtol > 0`` —
    stops as soon as the measured true residual drops below
    ``rtol * |b|`` (well-conditioned systems converge in 2-3 of the
    ``passes`` budget; ``rtol=0`` reproduces the fixed-pass schedule).

    ``solve32``: optional direct f32 correction solver ``r32 -> x32``
    (e.g. a dense-inverse matmul for M <= DENSE_SOLVER_MAX_M) replacing
    the inner PCG; its residual plays the ir_tol role (a P accurate to
    ~cond * 2^-24 contracts the true residual just as fast).

    Returns ((x_re, x_im) df pairs, total inner iters, last true residual
    norm BEFORE the final correction).
    """
    zero = jnp.zeros_like(b_re[0])
    bn = jnp.sqrt(jnp.sum((b_re[0] + b_re[1]) ** 2
                          + (b_im[0] + b_im[1]) ** 2))
    big = jnp.asarray(jnp.inf, bn.dtype)

    def cond(carry):
        _, _, _, k, res = carry
        return (k < passes) & (res > rtol * bn)

    def body(carry):
        x_re, x_im, iters, k, _ = carry
        a_re, a_im = A_df(x_re, x_im)
        rr = df_sub(b_re, a_re)
        ri = df_sub(b_im, a_im)
        resnorm = jnp.sqrt(jnp.sum((rr[0] + rr[1]) ** 2
                                   + (ri[0] + ri[1]) ** 2))
        r32 = lax.complex(rr[0] + rr[1], ri[0] + ri[1])
        if solve32 is not None:
            cx = solve32(r32)
            c_iters = jnp.asarray(1, jnp.int32)
        else:
            corr = pcg(A_mean, r32, tol=ir_tol, maxiter=ir_maxiter,
                       M_inv=M_inv)
            cx, c_iters = corr.x, corr.iters
        x_re = df_add(x_re, (jnp.real(cx), zero))
        x_im = df_add(x_im, (jnp.imag(cx), zero))
        return (x_re, x_im, iters + c_iters, k + 1, resnorm)

    carry0 = ((zero, zero), (zero, zero), jnp.asarray(0, jnp.int32),
              jnp.asarray(0, jnp.int32), big)
    x_re, x_im, iters, _, res = lax.while_loop(cond, body, carry0)
    # res is the TRUE df64 residual measured BEFORE the final correction
    return (x_re, x_im), iters, res


@partial(jax.jit, static_argnames=("mtot", "passes", "chunk",
                                   "ir_tol", "ir_maxiter", "rtol",
                                   "precond_rank", "exact_tables"))
def _fit_high_iter_core(x, y, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo, *,
                        mtot: int, passes: int, chunk: int,
                        ir_tol: float, ir_maxiter: int,
                        rtol: float = 0.0, precond_rank: int = 0,
                        exact_tables: bool = True):
    """Matrix-free high-precision fit for grids past the dense-solver
    window: f32 Jacobi-PCG correction solves (ops/cg.py) driven by df64
    TRUE residuals from the df64 Toeplitz matvec (ops/toeplitz_df.py).

    Error chain: starting from beta = 0, each pass computes the true
    residual in df64 (~1e-13 matvec accuracy) and solves the correction
    system with f32 CG to the loose ``ir_tol``; the true residual
    contracts by ~ir_tol per pass (it is exactly the inner solve's
    relative residual, re-measured in df64), so ``passes=5`` at
    ``ir_tol=1e-2`` reaches the ~1e-9 floor the 1e-6 mean-agreement
    target needs — the reference's universal-f64 discipline
    (verify_efgpnd_exact_small.py:19-24) on f32-only hardware.

    The refinement loop is a ``lax.scan`` so XLA compiles ONE copy of the
    df64 matvec + inner CG (an unrolled loop quintuples the ~10k-op df64
    FFT graph and pushes remote compile past 9 minutes at mtot=107).
    """
    n, d = x.shape
    m = (mtot - 1) // 2
    h_df = (h_hi, h_lo)
    ws_df = (ws_hi, ws_lo)
    sig_df = (sig_hi, sig_lo)

    # one-time df64 tables.  ``exact_tables=False`` uses the chunked-MXU
    # builder (~1e-9 table error at chunk<=8 — two orders inside the 1e-6
    # mean target this fit serves, and ~10x cheaper at large mtot);
    # ``True`` keeps the all-df64 exact builder (~1e-13) that the
    # variance quadratic form requires (models/variance_high.py).
    table1 = (df_nufft1_exact if exact_tables
              else lambda xx, vv, hh, mm: df_nufft1(
                  xx, jnp.ones((xx.shape[0],), xx.dtype) if vv is None
                  else vv, hh, mm, chunk=min(chunk, 8)))

    # rhs b = D F* y in df64
    Fy_hi, Fy_lo = table1(x, y, h_df, mtot)
    b_re = df_mul(ws_df, (jnp.real(Fy_hi), jnp.real(Fy_lo)))
    b_im = df_mul(ws_df, (jnp.imag(Fy_hi), jnp.imag(Fy_lo)))

    # Toeplitz lag table in df64 -> f32 operator + df64 symbol
    ones = jnp.ones((n,), x.dtype)
    v_hi, v_lo = table1(x, None, h_df, 4 * m + 1)
    reshape = (4 * m + 1,) * d
    v_cdf = ((jnp.real(v_hi).reshape(reshape),
              jnp.real(v_lo).reshape(reshape)),
             (jnp.imag(v_hi).reshape(reshape),
              jnp.imag(v_lo).reshape(reshape)))
    T_df = make_toeplitz_df(v_cdf, d)
    v_c = lax.complex(jnp.real(v_hi), jnp.imag(v_hi)).reshape(reshape)
    toeplitz = make_toeplitz(v_c)
    ws_c = ws_hi.astype(v_c.dtype)
    A_mean = make_A_mean(ws_c, toeplitz, sig_hi)
    if precond_rank > 0:
        from ..ops.deflation import deflation_block, make_block_precond
        didx, dP = deflation_block(ws_c, v_c, sig_hi, mtot=mtot, d=d,
                                   rank=precond_rank)
        M_inv = make_block_precond(
            didx, dP, toeplitz_diag_scale(v_c) * jnp.abs(ws_c) ** 2 + sig_hi)
    else:
        M_inv = make_jacobi_precond(ws_c, sig_hi,
                                    diag_scale=toeplitz_diag_scale(v_c))

    def A_df(beta_re, beta_im):
        u = (df_mul(ws_df, beta_re), df_mul(ws_df, beta_im))
        t_re, t_im = toeplitz_df_matvec(T_df, u)
        a_re = df_add(df_mul(ws_df, t_re), df_mul(sig_df, beta_re))
        a_im = df_add(df_mul(ws_df, t_im), df_mul(sig_df, beta_im))
        return a_re, a_im

    bn = jnp.sqrt(jnp.sum(b_re[0] ** 2 + b_im[0] ** 2))
    (beta_re, beta_im), iters, res = df64_ir_solve(
        A_mean, M_inv, A_df, b_re, b_im, passes=passes, ir_tol=ir_tol,
        ir_maxiter=ir_maxiter, rtol=rtol)

    beta = lax.complex(beta_re[0], beta_im[0])
    beta_lo = lax.complex(beta_re[1], beta_im[1])
    state = FitState(beta=beta, ws=ws_c, h=h_hi, sigmasq=sig_hi,
                     toeplitz=toeplitz, mean_cg_iters=iters,
                     diag_scale=toeplitz_diag_scale(v_c),
                     mtot=mtot, d=d)
    return state, beta_lo, res / bn


def fit_high(x, y, kernel, sigmasq, h, mtot: int, *, passes: int = 8,
             chunk: int = 8, solver: str = "auto",
             ir_passes: int = 7, ir_tol: float = 1e-2,
             ir_maxiter: int = 600, ir_rtol: float = 1e-11,
             exact_tables: Optional[bool] = None,
             precond_rank: int = 0) -> HighState:
    """High-precision fit.  ``h``, ``sigmasq`` and the kernel hypers must
    be concrete (host f64 planning values), not jit tracers.

    ``solver``: 'auto' uses the dense df64 operator while
    ``M <= DENSE_SOLVER_MAX_M`` and the matrix-free df64-Toeplitz
    refinement beyond ('dense' / 'iterative' force a branch).
    ``ir_rtol``: residual-based early stop for the iterative branch —
    refinement ends once the measured true residual is below
    ``ir_rtol * |b|`` (well inside the 1e-6 mean-agreement target), or
    after ``ir_passes`` passes, whichever comes first.
    ``exact_tables``: how the one-time rhs/lag tables are built.
    ``True`` = the all-df64 exact builder (~1e-13 table error);
    ``False`` = the chunked-MXU df_nufft1 at ``min(chunk, 8)`` (~1e-9 —
    two-plus orders inside the 1e-6 mean-agreement target this fit
    serves, and up to ~6x cheaper at large n*mtot^d: 2.62 s -> 0.42 s on
    the bench hard config with max error vs the f64 oracle unchanged at
    5.68e-7).  Default ``None`` resolves automatically: exact while the
    table work ``n * (2*mtot-1)^d`` stays under ~3e8 df-products (where
    the exact builder is effectively free AND its extra digits matter —
    at small n the table error is a visibly larger fraction of the sum),
    chunked beyond.  States feeding a variance quadratic form need exact
    tables; the variance estimators build their own
    (models/variance_high.py).
    ``precond_rank > 0`` preconditions the iterative branch's inner CG
    with the dense-head deflation block (ops/deflation.py).
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    d = x.shape[1]
    M = mtot ** d
    if exact_tables is None:
        # the error-free bf16-digit MXU builder (ops/ozaki.py) made exact
        # tables CHEAPER than the chunked builder wherever it dispatches
        # (d <= 3, real weights, f32 words — every fit call site), so
        # auto now always prefers exact; the work budget only gates the
        # residual non-dispatch cases (f64 words on CPU x64 oracles)
        exact_tables = (x.dtype == jnp.float32
                        or x.shape[0] * (2 * mtot - 1) ** d <= 3e8)
    if solver == "auto":
        solver = "dense" if M <= DENSE_SOLVER_MAX_M else "iterative"
    if solver not in ("dense", "iterative"):
        raise ValueError(
            f"Unknown solver '{solver}' (auto | dense | iterative)")
    if solver == "dense" and M > DENSE_SOLVER_MAX_M:
        raise ValueError(
            f"solver='dense' materializes a df64 {M}x{M} operator; "
            f"M={M} exceeds DENSE_SOLVER_MAX_M={DENSE_SOLVER_MAX_M}. "
            f"Use solver='iterative' (matrix-free df64 refinement).")
    h64 = float(h)
    ws_hi, ws_lo = ws_host_f64(kernel, h64, mtot, d)
    h_hi, h_lo = split_f64_host(h64)
    sig_hi, sig_lo = split_f64_host(float(sigmasq))
    if solver == "dense":
        state, _ = _fit_high_core(x, jnp.asarray(y), ws_hi, ws_lo, h_hi,
                                  h_lo, sig_hi, sig_lo, mtot=mtot,
                                  passes=passes, chunk=chunk,
                                  exact_tables=exact_tables)
        return HighState(state=state, ws_lo=ws_lo, h_lo=h_lo)
    state, beta_lo, _ = _fit_high_iter_core(
        x, jnp.asarray(y), ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo,
        mtot=mtot, passes=ir_passes, chunk=chunk, ir_tol=ir_tol,
        ir_maxiter=ir_maxiter, rtol=ir_rtol, precond_rank=precond_rank,
        exact_tables=exact_tables)
    return HighState(state=state, ws_lo=ws_lo, h_lo=h_lo, beta_lo=beta_lo)


@partial(jax.jit, static_argnames=("mtot", "d", "slab", "has_lo"))
def _predict_high_jit(x_new, beta, beta_lo, ws_hi, ws_lo, h_hi, h_lo, *,
                      mtot: int, d: int, slab: int = 2048,
                      has_lo: bool = True):
    ws_df = (ws_hi, ws_lo)
    # the zero low word is built INSIDE jit: the axon runtime rejects
    # eagerly materialized complex constants (CLAUDE.md)
    lo_re = jnp.real(beta_lo) if has_lo else jnp.zeros_like(jnp.real(beta))
    lo_im = jnp.imag(beta_lo) if has_lo else jnp.zeros_like(jnp.real(beta))
    c_re = df_mul(ws_df, (jnp.real(beta), lo_re))
    c_im = df_mul(ws_df, (jnp.imag(beta), lo_im))
    hi, lo = df_nufft2_real(x_new, c_re, c_im, (h_hi, h_lo), mtot,
                            slab=slab)
    return hi + lo


def predict_mean_high(hs: HighState, x_new, *, slab: int = 2048):
    """Posterior mean via the df64 type-2 (reference predict mean apply,
    efgpnd.py:918-922, at f64-oracle accuracy).  Uses the df64 beta low
    word when the matrix-free fit produced one."""
    x_new = jnp.asarray(x_new)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    st = hs.state
    has_lo = hs.beta_lo is not None
    return _predict_high_jit(x_new, st.beta,
                             hs.beta_lo if has_lo else st.beta,
                             jnp.real(st.ws), hs.ws_lo, st.h, hs.h_lo,
                             mtot=st.mtot, d=st.d, slab=slab,
                             has_lo=has_lo)
