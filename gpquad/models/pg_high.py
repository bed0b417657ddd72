"""df64 high-precision leg for the Polya-Gamma classifier (VERDICT r3 #4).

The reference's PG estimators run float64 end-to-end
(reference pg_classifier.py:1094 ``dtype: torch.dtype = torch.float64``);
gpquad's PG outer loop is f32 — right for TPU VI, where the CAVI fixed
point itself moves by ~1e-3 per damped step — but the FINAL beta-mean
solve and the exact predictive moments deserve the same <=1e-6-class
bound the regression side has (models/precision.py, variance_high.py).

The PG prediction system, for fixed posterior weights ``delta``
(reference _solve_beta_mean pg_classifier.py:634-650 and
_predictive_latent_moments pg_classifier.py:671-739):

    (I + Ds T_w Ds) z = Ds q        beta = Ds^{-1} z
    T_w = F* diag(delta) F          Ds = sqrt(max(ws2, eps_d))

This module re-runs that algebra in double-word (df64) arithmetic on
f32-only TPU hardware:

- the weighted lag table ``v_w`` comes from the EXACT df64 type-1 of
  ``delta`` on the doubled grid (ops/nufft_df.df_nufft1_exact, ~1e-13),
  driving both the df64 BTTB matvec and the f32 inner operator;
- ``Ds``, ``ws2``, and ``e = ws2 / Ds`` are built on the host in f64 and
  shipped as (hi, lo) pairs (only real arrays cross the axon boundary);
- each solve is iterative refinement (models/precision.df64_ir_solve):
  f32 corrections — ONE dense-inverse matmul per pass for
  ``M <= DENSE_SOLVER_MAX_M`` (the common PG regime), CG beyond — driven
  by df64 TRUE residuals, contracting to the ~1e-9 floor;
- the latent mean closes as ``Re<g, ws2 beta>`` and the latent variance
  as ``Re<conj(phi), e z>`` in df64 dots.

Accuracy is certified against the numpy-f64 dense feature system (the
same system models/pg_core.py:418-443 materializes) in
tests/test_pg_high.py and scripts/verify_pg_high.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.df64 import df_add, df_mul, df_sub, df_sum_tree, hard_materialize
from ..ops.dense_solve import DENSE_SOLVER_MAX_M, dense_inverse, dense_toeplitz
from ..ops.nufft_df import (cdf_outer_rows, df_nufft1_exact,
                            df_phase_factors, split_f64_host)
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from ..ops.toeplitz_df import make_toeplitz_df, toeplitz_df_matvec
from .precision import _spectral_density_np, df64_ir_solve

__all__ = ["pg_beta_mean_high", "pg_predict_high", "PGHighResult"]


class PGHighResult(NamedTuple):
    """df64 PG prediction bundle (hi components are plain f32 views)."""
    beta: jnp.ndarray          # (M,) complex64 hi word
    beta_lo: jnp.ndarray       # (M,) complex64 lo word
    mean: jnp.ndarray          # (B,) latent predictive mean, f32 hi word
    var: jnp.ndarray           # (B,) latent predictive variance (or None)
    solve_iters: jnp.ndarray
    residual: jnp.ndarray      # last true df64 residual of the beta solve


def _pg_host_tables(kernel, h64: float, mtot: int, d: int,
                    hm: int | None = None):
    """Host-f64 PG weight tables as (hi, lo) pairs: ``ws2 = S h^d``,
    ``Ds = sqrt(max(ws2, eps_d))`` (the same floor pg_core._feature_solver
    applies in f32), ``Ds^{-1}``, and ``e = ws2 / Ds``.

    ``hm`` (when given) zeroes ws2 on surplus bucketed-grid nodes with any
    ``|k| > hm`` BEFORE the floor — mirroring the masked f32 fit
    (pg_core.build_pg_spectral_state ``ws_mask``), so the df64 leg solves
    the exact system the f32 fit defined even when ``mtot > 2*hm+1``
    (grow-only rung hysteresis)."""
    m = (mtot - 1) // 2
    j1 = np.arange(-m, m + 1, dtype=np.int64)
    k1 = j1.astype(np.float64) * h64
    grids = np.meshgrid(*([k1] * d), indexing="ij")
    xi = np.stack([g.ravel() for g in grids], axis=-1)
    ws2 = _spectral_density_np(kernel, xi) * h64 ** d
    if hm is not None and hm < m:
        jg = np.meshgrid(*([np.abs(j1)] * d), indexing="ij")
        active = np.stack([g.ravel() for g in jg], axis=-1).max(-1) <= hm
        ws2 = np.where(active, ws2, 0.0)
    eps_d = max(float(np.mean(ws2)) * 1e-14, 1e-14)
    Ds = np.sqrt(np.maximum(ws2, eps_d))
    return (split_f64_host(ws2), split_f64_host(Ds),
            split_f64_host(1.0 / Ds), split_f64_host(ws2 / Ds))


def _mul_real_pair(rp, z_re, z_im):
    """(real df vector) * (complex df pair) — elementwise."""
    return df_mul(rp, z_re), df_mul(rp, z_im)


def _rows_df(xs, h_df, mtot: int, d: int, *, isign: int):
    """df64 phase rows ``exp(isign 2 pi i x . xi)`` flattened to
    (s, mtot^d) (re, im) df pairs (models/variance_high._conj_rows_df
    generalized to either sign)."""
    g_re, g_im = None, None
    for dim in range(d):
        _, cos_df, sin_df = df_phase_factors(xs[:, dim], h_df, mtot,
                                             isign=isign)
        cos_df, sin_df = hard_materialize((cos_df, sin_df))
        if g_re is None:
            g_re, g_im = cos_df, sin_df
        else:
            g_re, g_im = cdf_outer_rows(g_re, g_im, cos_df, sin_df)
    return g_re, g_im


@partial(jax.jit, static_argnames=("mtot", "d", "slab", "passes", "ir_tol",
                                   "ir_maxiter", "rtol", "use_dense_inner",
                                   "with_var"))
def _pg_high_core(x, x_new, delta, kappa, ws2_df, Ds_df, Dsinv_df, e_df,
                  h_df, *, mtot: int, d: int, slab: int, passes: int,
                  ir_tol: float, ir_maxiter: int, rtol: float,
                  use_dense_inner: bool, with_var: bool):
    n = x.shape[0]
    m = (mtot - 1) // 2

    # df64 weighted lag table v_w = F_(2mtot-1)* delta  (doubled grid)
    v_hi, v_lo = df_nufft1_exact(x, delta, h_df, 4 * m + 1)
    reshape = (4 * m + 1,) * d
    v_cdf = ((jnp.real(v_hi).reshape(reshape),
              jnp.real(v_lo).reshape(reshape)),
             (jnp.imag(v_hi).reshape(reshape),
              jnp.imag(v_lo).reshape(reshape)))
    T_df = make_toeplitz_df(v_cdf, d)
    v_c = lax.complex(jnp.real(v_hi), jnp.imag(v_hi)).reshape(reshape)
    wtoe32 = make_toeplitz(v_c)
    cdtype = v_c.dtype
    Ds32 = Ds_df[0].astype(cdtype)

    if use_dense_inner:
        Tw = dense_toeplitz(v_c, mtot, d)
        A32 = (Ds32[:, None] * Tw * Ds32[None, :]
               + jnp.eye(Tw.shape[0], dtype=cdtype))
        P32 = dense_inverse(A32)
        HI = jax.lax.Precision.HIGHEST
        solve32 = lambda r: jnp.matmul(r, P32.T, precision=HI)
        A_mean32, M_inv = None, None
    else:
        solve32 = None

        def A_mean32(Y):
            return Y + Ds32 * wtoe32(Ds32 * Y)
        diag = 1.0 + jnp.real(Ds32) ** 2 * jnp.real(
            toeplitz_diag_scale(v_c))

        def M_inv(r):
            return r / diag.astype(r.dtype)

    def A_df(z_re, z_im):
        u = _mul_real_pair(Ds_df, z_re, z_im)
        t_re, t_im = toeplitz_df_matvec(T_df, u)
        a_re = df_add(z_re, df_mul(Ds_df, t_re))
        a_im = df_add(z_im, df_mul(Ds_df, t_im))
        return a_re, a_im

    def solve_sym(b_re, b_im):
        return df64_ir_solve(A_mean32, M_inv, A_df, b_re, b_im,
                             passes=passes, ir_tol=ir_tol,
                             ir_maxiter=ir_maxiter, rtol=rtol,
                             solve32=solve32)

    # ---- beta mean: q = F* kappa (df64), b = Ds q, beta = Ds^{-1} z
    q_hi, q_lo = df_nufft1_exact(x, kappa, h_df, mtot)
    q_re = (jnp.real(q_hi)[None, :], jnp.real(q_lo)[None, :])
    q_im = (jnp.imag(q_hi)[None, :], jnp.imag(q_lo)[None, :])
    b_re, b_im = _mul_real_pair(Ds_df, q_re, q_im)
    (z_re, z_im), iters, res = solve_sym(b_re, b_im)
    beta_re, beta_im = _mul_real_pair(Dsinv_df, z_re, z_im)
    beta = lax.complex(beta_re[0][0], beta_im[0][0])
    beta_lo = lax.complex(beta_re[1][0], beta_im[1][0])

    # ---- latent mean at x_new: Re<g, ws2 beta>, g = exp(+2 pi i x xi)
    w_re, w_im = _mul_real_pair(ws2_df, beta_re, beta_im)

    def mean_slab(xs):
        g_re, g_im = _rows_df(xs, h_df, mtot, d, isign=+1)
        t = df_sub(df_mul(g_re, _bcast(w_re, g_re)),
                   df_mul(g_im, _bcast(w_im, g_im)))
        q = df_sum_tree(t, axis=-1)
        return q[0] + q[1]

    def _bcast(p, like):
        return (jnp.broadcast_to(p[0], like[0].shape),
                jnp.broadcast_to(p[1], like[1].shape))

    nt = x_new.shape[0]
    npad = -(-nt // slab) * slab
    xp = (jnp.concatenate([x_new, jnp.zeros((npad - nt, d), x_new.dtype)])
          if npad != nt else x_new)
    mean = lax.map(mean_slab, xp.reshape(-1, slab, d)).reshape(-1)[:nt]

    if not with_var:
        return PGHighResult(beta=beta, beta_lo=beta_lo, mean=mean, var=None,
                            solve_iters=iters, residual=res)

    # ---- latent variance: phi = conj rows, solve (I + Ds T_w Ds) z =
    # Ds phi, var = Re<conj(phi), e z>  (e = ws2 / Ds)
    def var_slab(xs):
        p_re, p_im = _rows_df(xs, h_df, mtot, d, isign=-1)
        vb_re, vb_im = _mul_real_pair(Ds_df, p_re, p_im)
        (sz_re, sz_im), it, _ = solve_sym(vb_re, vb_im)
        v_re, v_im = _mul_real_pair(e_df, sz_re, sz_im)
        t = df_add(df_mul(p_re, v_re), df_mul(p_im, v_im))
        q = df_sum_tree(t, axis=-1)
        return q[0] + q[1], it

    var, vit = lax.map(var_slab, xp.reshape(-1, slab, d))
    var = jnp.maximum(var.reshape(-1)[:nt], 0.0)
    return PGHighResult(beta=beta, beta_lo=beta_lo, mean=mean, var=var,
                        solve_iters=iters + jnp.sum(vit), residual=res)


def pg_predict_high(x, kernel, h, mtot: int, delta, kappa, x_new, *,
                    hm: int | None = None,
                    with_var: bool = True, slab: int = 128,
                    passes: int = 7, ir_tol: float = 1e-2,
                    ir_maxiter: int = 600, ir_rtol: float = 1e-11):
    """df64 PG posterior: beta-mean solve + latent predictive mean (and,
    with ``with_var``, exact latent variance) at ~1e-7-class agreement
    with the numpy-f64 dense feature system.

    ``h``/kernel hypers must be concrete host values (like fit_high);
    ``delta``/``kappa`` are the f32 posterior weights from the VI fit —
    the df64 leg solves the f32-defined system exactly, the same input
    convention the regression oracles use (bench.py accuracy notes).
    Pass ``hm`` when ``mtot`` is a bucketed rung > ``2*hm+1`` so the host
    tables zero the surplus nodes exactly as the masked f32 fit did.
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    x_new = jnp.asarray(x_new)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    d = x.shape[1]
    h64 = float(h)
    ws2_df, Ds_df, Dsinv_df, e_df = _pg_host_tables(kernel, h64, mtot, d,
                                                    hm=hm)
    h_df = split_f64_host(h64)
    return _pg_high_core(
        x, x_new, jnp.asarray(delta), jnp.asarray(kappa),
        ws2_df, Ds_df, Dsinv_df, e_df, h_df, mtot=mtot, d=d,
        slab=min(slab, max(1, x_new.shape[0])), passes=passes,
        ir_tol=ir_tol, ir_maxiter=ir_maxiter, rtol=ir_rtol,
        use_dense_inner=mtot ** d <= DENSE_SOLVER_MAX_M,
        with_var=with_var)


def pg_beta_mean_high(x, kernel, h, mtot: int, delta, kappa, **kw):
    """df64 beta-mean only (no prediction targets): convenience wrapper
    returning ``(beta_hi, beta_lo, iters, residual)``."""
    res = pg_predict_high(x, kernel, h, mtot, delta, kappa,
                          jnp.zeros((1, jnp.asarray(x).shape[-1])),
                          with_var=False, **kw)
    return res.beta, res.beta_lo, res.solve_iters, res.residual
