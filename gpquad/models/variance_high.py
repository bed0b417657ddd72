"""df64 high-precision posterior variance (the last estimator without a
1e-6 story).

The f32 ``predict_var`` paths (models/efgp.py:259-413) bottom out at
~2e-5 agreement with the f64 dense oracle — the per-target solve runs at
``cg_tol`` and the quadratic form ``f_x^T W A_var^{-1} W f_x*`` amplifies
the solve residual.  This module re-runs the *regular* (exact per-target)
variance estimator in double-word arithmetic, matching the reference's
universal-f64 discipline (reference compute_prediction_variance,
efgpnd.py:1761-1841, run in f64 on CPU) on f32-only TPU hardware:

- the Toeplitz lag table comes from the EXACT (all-df64) type-1
  (ops/nufft_df.df_nufft1_exact, ~1e-13 relative — the chunked-MXU
  df_nufft1's ~1e-8 floor is amplified past 1e-6 by the quadratic form)
  and drives both the df64 BTTB matvec (ops/toeplitz_df.py) and the f32
  inner operator;
- target Fourier rows are df64 phase tensors (Dekker-compensated
  ``x·h·k`` cycles, df64 sin/cos);
- each target microbatch solves ``A_mean z = W f_x*`` by iterative
  refinement (models/precision.df64_ir_solve): f32 Jacobi-PCG correction
  solves driven by df64 TRUE residuals, contracting ~``ir_tol`` per pass
  to the ~1e-9 floor;
- the quadratic form closes in df64 dots, and
  ``var = sigma^2 * Re<f_x*, W z>`` (A_var = A_mean / sigma^2, reference
  efgpnd.py:1602-1609, so the sigma^2 rescale is exact).

Slab layout bounds memory at O(slab * M) df words; cost is one batched
M-system per slab, so this is the *oracle-grade* variance — use the f32
paths for bulk prediction and this one where the 1e-6 target matters.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.df64 import df_add, df_mul, df_sum_tree, hard_materialize
from ..ops.nufft_df import (cdf_outer_rows, df_nufft1_exact,
                            df_phase_factors, split_f64_host)
from ..ops.operators import make_A_mean, make_jacobi_precond
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from ..ops.toeplitz_df import make_toeplitz_df, toeplitz_df_matvec
from .precision import df64_ir_solve, ws_host_f64

__all__ = ["variance_high"]


def _bcast_pair(pair, shape):
    return (jnp.broadcast_to(pair[0], shape), jnp.broadcast_to(pair[1], shape))


def _conj_rows_df(xs, h_df, mtot: int, d: int):
    """df64 rows of conj(f_x) = exp(-2 pi i x . xi) at the slab's targets,
    flattened to (s, mtot^d) (re, im) df pairs.  ``posterior_fourier_rows``
    (models/efgp.py:242-256) is the f32 analogue of the conjugate."""
    g_re, g_im = None, None
    for dim in range(d):
        _, cos_df, sin_df = df_phase_factors(xs[:, dim], h_df, mtot,
                                             isign=-1)
        # hard_materialize: stop XLA:CPU fusing the sincos polynomial
        # into the downstream quadratic form's two_sum reduction (the
        # pathological pattern documented at df64.hard_materialize;
        # measured 6.5 s -> sub-second warm for a 200-target slab)
        cos_df, sin_df = hard_materialize((cos_df, sin_df))
        if g_re is None:
            g_re, g_im = cos_df, sin_df
        else:
            g_re, g_im = cdf_outer_rows(g_re, g_im, cos_df, sin_df)
    return g_re, g_im


@partial(jax.jit, static_argnames=("mtot", "d", "slab", "passes", "chunk",
                                   "ir_tol", "ir_maxiter", "rtol",
                                   "use_dense_inner", "precond_rank"))
def _variance_high_core(x, x_new, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo,
                        *, mtot: int, d: int, slab: int, passes: int,
                        chunk: int, ir_tol: float, ir_maxiter: int,
                        rtol: float = 0.0, use_dense_inner: bool = False,
                        precond_rank: int = 0):
    n = x.shape[0]
    m = (mtot - 1) // 2
    h_df = (h_hi, h_lo)
    ws_df = (ws_hi, ws_lo)
    sig_df = (sig_hi, sig_lo)

    # df64 lag table -> df64 symbol + f32 operator / preconditioner.
    # The EXACT (all-df64) builder matters here: the quadratic form
    # amplifies lag-table error ~|A^{-1}| / sigma^2-fold, and df_nufft1's
    # in-chunk f32 partial matmuls leave a ~1e-8 floor that lands the
    # variance at ~6e-6 relative; the compensated sum takes the table to
    # ~1e-13 and the variance below 1e-7.
    v_hi, v_lo = df_nufft1_exact(x, None, h_df, 4 * m + 1)
    reshape = (4 * m + 1,) * d
    v_cdf = ((jnp.real(v_hi).reshape(reshape),
              jnp.real(v_lo).reshape(reshape)),
             (jnp.imag(v_hi).reshape(reshape),
              jnp.imag(v_lo).reshape(reshape)))
    T_df = make_toeplitz_df(v_cdf, d)
    v_c = lax.complex(jnp.real(v_hi), jnp.imag(v_hi)).reshape(reshape)
    toeplitz32 = make_toeplitz(v_c)
    ws_c = ws_hi.astype(v_c.dtype)
    A_mean32 = make_A_mean(ws_c, toeplitz32, sig_hi)
    solve32 = None
    if use_dense_inner:
        # M <= DENSE_SOLVER_MAX_M: ONE dense inverse on the MXU turns
        # every inner correction solve (slab lanes x passes, previously
        # hundreds of CG iterations each) into a single matmul
        from ..ops.dense_solve import dense_gram, dense_inverse
        A_c = dense_gram(ws_c, v_c, mtot, d, sig_hi)
        P_c = dense_inverse(A_c)
        HI = jax.lax.Precision.HIGHEST
        solve32 = lambda r: jnp.matmul(r, P_c.T, precision=HI)
        M_inv = None
    elif precond_rank > 0:
        from ..ops.deflation import deflation_block, make_block_precond
        didx, dP = deflation_block(ws_c, v_c, sig_hi, mtot=mtot, d=d,
                                   rank=precond_rank)
        M_inv = make_block_precond(
            didx, dP, toeplitz_diag_scale(v_c) * jnp.abs(ws_c) ** 2
            + sig_hi)
    else:
        M_inv = make_jacobi_precond(ws_c, sig_hi,
                                    diag_scale=toeplitz_diag_scale(v_c))

    def A_df(x_re, x_im):
        u = (df_mul(ws_df, x_re), df_mul(ws_df, x_im))
        t_re, t_im = toeplitz_df_matvec(T_df, u)
        a_re = df_add(df_mul(ws_df, t_re),
                      df_mul(_bcast_pair(sig_df, x_re[0].shape), x_re))
        a_im = df_add(df_mul(ws_df, t_im),
                      df_mul(_bcast_pair(sig_df, x_im[0].shape), x_im))
        return a_re, a_im

    def one_slab(xs):
        g_re, g_im = _conj_rows_df(xs, h_df, mtot, d)       # (s, M) df
        b_re = df_mul(ws_df, g_re)
        b_im = df_mul(ws_df, g_im)
        (z_re, z_im), iters, _ = df64_ir_solve(
            A_mean32, M_inv, A_df, b_re, b_im, passes=passes,
            ir_tol=ir_tol, ir_maxiter=ir_maxiter, rtol=rtol,
            solve32=solve32)
        wz_re = df_mul(ws_df, z_re)
        wz_im = df_mul(ws_df, z_im)
        # var = sigma^2 Re<g, W z>  (Re<a,b> = sum ar*br + ai*bi)
        t = df_add(df_mul(g_re, wz_re), df_mul(g_im, wz_im))
        q = df_sum_tree(t, axis=-1)                         # (s,) df
        v = df_mul(_bcast_pair(sig_df, q[0].shape), q)
        return v[0] + v[1], iters

    nt = x_new.shape[0]
    npad = -(-nt // slab) * slab
    if npad != nt:
        x_new = jnp.concatenate(
            [x_new, jnp.zeros((npad - nt, d), x_new.dtype)], axis=0)
    var, iters = lax.map(one_slab, x_new.reshape(-1, slab, d))
    return jnp.maximum(var.reshape(-1)[:nt], 0.0), jnp.sum(iters)


def variance_high(x, kernel, sigmasq, h, mtot: int, x_new, *,
                  passes: int = 7, chunk: int = 64, slab: int = 256,
                  ir_tol: float = 1e-2, ir_maxiter: int = 600,
                  ir_rtol: float = 1e-11, precond_rank: int = 0):
    """Exact per-target posterior variance at df64 accuracy (~1e-7 vs the
    f64 dense oracle).  ``h``/``sigmasq``/kernel hypers must be concrete
    host-f64 planning values, like fit_high/gradient_high.

    Matrix-free: works at any grid size (no DENSE_SOLVER_MAX_M window).
    For ``M <= DENSE_SOLVER_MAX_M`` the inner correction solves use one
    dense MXU inverse (a matmul per pass) instead of CG; beyond it,
    ``precond_rank > 0`` swaps the inner Jacobi for the dense-head
    deflation block (ops/deflation.py).  The df64 TRUE-residual loop is
    identical either way, so the accuracy story does not change.
    Returns the (nt,) variance as plain f32.
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    x_new = jnp.asarray(x_new)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    d = x.shape[1]
    h64 = float(h)
    ws_hi, ws_lo = ws_host_f64(kernel, h64, mtot, d)
    h_hi, h_lo = split_f64_host(h64)
    sig_hi, sig_lo = split_f64_host(float(sigmasq))
    from ..ops.dense_solve import DENSE_SOLVER_MAX_M
    var, _ = _variance_high_core(
        x, x_new, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo, mtot=mtot,
        d=d, slab=min(slab, max(1, x_new.shape[0])), passes=passes,
        chunk=chunk, ir_tol=ir_tol, ir_maxiter=ir_maxiter, rtol=ir_rtol,
        use_dense_inner=mtot ** d <= DENSE_SOLVER_MAX_M,
        precond_rank=precond_rank)
    return var
