"""df64 high-precision hyper-gradient (the gradient leg of the eps=1e-6
agreement loop).

The f32 gradient estimator's error is a pure arithmetic floor, not a
solver-tolerance artifact: its trace chain evaluates
``alpha_t = (F q_t - F D Beta_t) / sigma^2`` where the two n-space
operands cancel to ~1/6800 of their size before the 1/sigma^2 blow-up
(measured on the headline config), so f32 rounding of either operand
leaves ~4e-3 relative error in the gradient — at ANY cg_tol (the
reference sidesteps this by running torch float64 end to end,
verify_efgpnd_exact_small.py:152-196).

The fix costs no df64 type-2 applies at all: every term of the estimator
(models/gradient.py:94-241) is an inner product that reduces to the
M-dimensional feature space,

    z^T F s            = (F* z)^H s
    y^T F beta         = (F* y)^H beta
    |F beta|^2         = beta^H (F* F) beta = beta^H T beta,

so with df64 type-1 applies (ops/nufft_df.py) for F*y / F*z, the df64
Toeplitz matvec (ops/toeplitz_df.py) for T, and df64-refined solves
(precision.df64_ir_solve) for beta and every probe system, the whole
gradient assembles from df64 dot products over (M,) vectors.  The
cancellations then happen in df64 (~1e-13), leaving the ~1e-7 f32
representation floor of the returned gradient.

SE and fixed-nu Matern kernels (host-f64 spectral derivative tables).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.cg import pcg
from ..ops.df64 import df_add, df_mul, df_neg, df_sub, df_sum_tree, two_prod
from ..ops.nufft_df import (df_nufft1, df_nufft1_exact,
                            split_f64_host)
from ..ops.operators import make_A_mean, make_jacobi_precond
from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from ..ops.toeplitz_df import make_toeplitz_df, toeplitz_df_matvec
from .precision import _spectral_density_np, df64_ir_solve, ws_host_f64

__all__ = ["GradientHighResult", "gradient_high", "dlength_host_f64"]


class GradientHighResult(NamedTuple):
    grad: jnp.ndarray          # (H+1,) d(NLL)/d(positive hypers), df64->f32
    inner_iters: jnp.ndarray   # total inner f32 CG iterations
    residual: jnp.ndarray      # last true df64 residual of the batched solve


def _spectral_dlength_np(kernel, xi: np.ndarray) -> np.ndarray:
    """Host f64 dS/d(lengthscale) (mirrors the kernels' spectral_grad
    lengthscale column; reference kernels/squared_exponential.py:64-91,
    kernels/matern.py:100-123)."""
    from ..kernels import Matern, SquaredExponential
    l = float(kernel.lengthscale)
    d = xi.shape[1]
    nsq = np.sum(xi * xi, axis=1)
    S = _spectral_density_np(kernel, xi)
    if isinstance(kernel, SquaredExponential):
        return S * (d / l - 4.0 * np.pi ** 2 * l * nsq)
    if isinstance(kernel, Matern):
        nu = kernel.nu
        base = 2.0 * nu / (l * l) + 4.0 * np.pi ** 2 * nsq
        return S * (-2.0 * nu / l + (nu + d / 2.0) * (4.0 * nu / l ** 3)
                    / base)
    raise TypeError(
        f"gradient_high needs a host-f64 spectral derivative; unsupported "
        f"kernel type {type(kernel).__name__}")


def dlength_host_f64(kernel, h64: float, mtot: int, d: int):
    """f64 table h^d * dS/d(lengthscale) on the grid, split to f32 pairs."""
    m = (mtot - 1) // 2
    k1 = np.arange(-m, m + 1, dtype=np.float64) * h64
    grids = np.meshgrid(*([k1] * d), indexing="ij")
    xi = np.stack([g.ravel() for g in grids], axis=-1)
    return split_f64_host(_spectral_dlength_np(kernel, xi) * h64 ** d)


def _cdf_dot_re(ar, ai, br, bi):
    """Re<a, b> = sum(ar*br + ai*bi) over df pairs -> scalar df."""
    t = df_add(df_mul(ar, br), df_mul(ai, bi))
    return df_sum_tree(t, axis=-1)


def _df_scal(pair, x):
    """Scalar df pair times array df pair."""
    return df_mul((jnp.broadcast_to(pair[0], x[0].shape),
                   jnp.broadcast_to(pair[1], x[0].shape)), x)


@partial(jax.jit, static_argnames=("mtot", "trace_samples", "passes",
                                   "chunk", "ir_tol", "ir_maxiter",
                                   "rtol", "use_dense_inner",
                                   "precond_rank"))
def _gradient_high_core(x, y, Z, V, ws_hi, ws_lo, dl_hi, dl_lo, h_hi, h_lo,
                        sig_hi, sig_lo, isig_hi, isig_lo, ivar_hi, ivar_lo,
                        var_hi, var_lo, *, mtot: int, trace_samples: int,
                        passes: int, chunk: int, ir_tol: float,
                        ir_maxiter: int, rtol: float = 0.0,
                        use_dense_inner: bool = False,
                        precond_rank: int = 0):
    n, d = x.shape
    m = (mtot - 1) // 2
    T = trace_samples
    h_df = (h_hi, h_lo)
    ws_df = (ws_hi, ws_lo)
    dl_df = (dl_hi, dl_lo)
    sig_df = (sig_hi, sig_lo)
    isig_df = (isig_hi, isig_lo)       # 1/sigma^2, exact f64 split
    ivar_df = (ivar_hi, ivar_lo)       # 1/variance
    M = mtot ** d

    # df64 feature-space ingredients: F*y, F*z_t, lag table
    Fy_hi, Fy_lo = df_nufft1_exact(x, y, h_df, mtot)
    Fy = ((jnp.real(Fy_hi), jnp.real(Fy_lo)),
          (jnp.imag(Fy_hi), jnp.imag(Fy_lo)))
    q0_hi, q0_lo = lax.map(
        lambda v: df_nufft1(x, v, h_df, mtot, chunk=chunk), Z)   # (T, M)
    q0 = ((jnp.real(q0_hi), jnp.real(q0_lo)),
          (jnp.imag(q0_hi), jnp.imag(q0_lo)))
    ones = jnp.ones((n,), x.dtype)
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
        # M <= DENSE_SOLVER_MAX_M: dense MXU inverse answers every inner
        # correction solve (mean + all probe lanes x passes) with one
        # matmul (same rationale as models/variance_high.py)
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

    def T_apply(u):                    # complex df pair -> complex df pair
        return toeplitz_df_matvec(T_df, u)

    def A_df(x_re, x_im):
        u = (df_mul(ws_df, x_re), df_mul(ws_df, x_im))
        t_re, t_im = T_apply(u)
        a_re = df_add(df_mul(ws_df, t_re), _df_scal(sig_df, x_re))
        a_im = df_add(df_mul(ws_df, t_im), _df_scal(sig_df, x_im))
        return a_re, a_im

    # batched right-hand sides: [mean; kernel probes; noise probes]
    # mean: b = D F* y
    b_mean_re = df_mul(ws_df, Fy[0])
    b_mean_im = df_mul(ws_df, Fy[1])
    # kernel probes: q_t = D'_l (F* z_t); b = D T q
    q_re = df_mul((dl_hi[None, :], dl_lo[None, :]), q0[0])
    q_im = df_mul((dl_hi[None, :], dl_lo[None, :]), q0[1])
    tq_re, tq_im = T_apply((q_re, q_im))
    bk_re = df_mul((ws_hi[None, :], ws_lo[None, :]), tq_re)
    bk_im = df_mul((ws_hi[None, :], ws_lo[None, :]), tq_im)
    # noise probes (feature-space Rademacher): b = D T (D v)
    u_re = df_mul((ws_hi[None, :], ws_lo[None, :]),
                  (V, jnp.zeros_like(V)))
    tu_re, tu_im = T_apply((u_re, (jnp.zeros_like(V), jnp.zeros_like(V))))
    bn_re = df_mul((ws_hi[None, :], ws_lo[None, :]), tu_re)
    bn_im = df_mul((ws_hi[None, :], ws_lo[None, :]), tu_im)

    B_re = (jnp.concatenate([b_mean_re[0][None], bk_re[0], bn_re[0]], 0),
            jnp.concatenate([b_mean_re[1][None], bk_re[1], bn_re[1]], 0))
    B_im = (jnp.concatenate([b_mean_im[0][None], bk_im[0], bn_im[0]], 0),
            jnp.concatenate([b_mean_im[1][None], bk_im[1], bn_im[1]], 0))

    (X_re, X_im), iters, res = df64_ir_solve(
        A_mean32, M_inv, A_df, B_re, B_im, passes=passes, ir_tol=ir_tol,
        ir_maxiter=ir_maxiter, rtol=rtol, solve32=solve32)

    beta_re = (X_re[0][0], X_re[1][0])
    beta_im = (X_im[0][0], X_im[1][0])
    Bk_re = (X_re[0][1:1 + T], X_re[1][1:1 + T])
    Bk_im = (X_im[0][1:1 + T], X_im[1][1:1 + T])
    Bn_re = (X_re[0][1 + T:], X_re[1][1 + T:])
    Bn_im = (X_im[0][1 + T:], X_im[1][1 + T:])

    # ---- term2 (mean chain, all M-space df64) -----------------------------
    # beta_w = D beta;  fadj_alpha = (F*y - T beta_w) / sigma^2
    bw_re = df_mul(ws_df, beta_re)
    bw_im = df_mul(ws_df, beta_im)
    tb_re, tb_im = T_apply((bw_re, bw_im))
    fa_re = _df_scal(isig_df, df_sub(Fy[0], tb_re))
    fa_im = _df_scal(isig_df, df_sub(Fy[1], tb_im))
    dfa_re = df_mul(dl_df, fa_re)
    dfa_im = df_mul(dl_df, fa_im)
    t2_l = _cdf_dot_re(fa_re, fa_im, dfa_re, dfa_im)

    # y.y in df64 (y exact f32)
    yy = df_sum_tree(two_prod(y, y), axis=0)
    # Re(Fy^H beta_w)
    fyb = _cdf_dot_re(Fy[0], Fy[1], bw_re, bw_im)
    # beta_w^H T beta_w (real part; T Hermitian PSD)
    btb = _cdf_dot_re(bw_re, bw_im, tb_re, tb_im)
    # alpha_norm = (y.y - 2 Re(Fy^H b) + b^H T b) / sigma^4
    an = df_sub(df_add(yy, btb), df_add(fyb, fyb))
    alpha_norm = df_mul(isig_df, df_mul(isig_df, an))
    # y^T alpha = (y.y - Re(Fy^H b)) / sigma^2
    y_alpha = df_mul(isig_df, df_sub(yy, fyb))
    # t2_variance = (y_alpha - sigma^2 alpha_norm) / variance
    t2_v = df_mul(ivar_df, df_sub(y_alpha, df_mul(sig_df, alpha_norm)))

    # ---- term1 ------------------------------------------------------------
    # kernel block: t1_l = mean_t Re<q0_t, q_t - D Beta_t> / sigma^2
    s_re = df_sub((q_re[0], q_re[1]),
                  df_mul((ws_hi[None, :], ws_lo[None, :]), Bk_re))
    s_im = df_sub((q_im[0], q_im[1]),
                  df_mul((ws_hi[None, :], ws_lo[None, :]), Bk_im))
    dots = _cdf_dot_re(q0[0], q0[1], (s_re[0], s_re[1]),
                       (s_im[0], s_im[1]))           # (T,) df
    t1_l_sum = df_sum_tree(dots, axis=0)
    t1_l = df_mul(isig_df, (t1_l_sum[0] / T, t1_l_sum[1] / T))

    # noise block: t1_noise = n/sigma^2 - mean_t <v_t, Beta_t> / sigma^2
    vdots = df_sum_tree(df_mul((V, jnp.zeros_like(V)), Bn_re), axis=-1)
    vsum = df_sum_tree(vdots, axis=0)
    n_isig = _df_scal(isig_df, (jnp.asarray(float(n), x.dtype),
                                jnp.zeros((), x.dtype)))
    t1_n = df_sub((n_isig[0], n_isig[1]),
                  df_mul(isig_df, (vsum[0] / T, vsum[1] / T)))
    # t1_variance = (n - sigma^2 t1_noise) / variance
    t1_v = df_mul(ivar_df, df_sub(
        (jnp.asarray(float(n), x.dtype), jnp.zeros((), x.dtype)),
        df_mul(sig_df, t1_n)))

    def half_diff(a, b):
        g = df_sub(a, b)
        return 0.5 * (g[0] + g[1])

    grad = jnp.stack([half_diff(t1_l, t2_l), half_diff(t1_v, t2_v),
                      half_diff(t1_n, alpha_norm)])
    return grad, iters, res


def gradient_high(x, y, kernel, sigmasq, h, mtot: int, *,
                  trace_samples: int = 10, key=None,
                  probes: Optional[Tuple] = None, passes: int = 7,
                  chunk: int = 64, ir_tol: float = 1e-2,
                  ir_maxiter: int = 600,
                  ir_rtol: float = 1e-11,
                  precond_rank: int = 0) -> GradientHighResult:
    """df64 hyper-gradient over (lengthscale, variance, sigmasq).

    Same estimator and probe conventions as
    models/gradient.gradient_with_grid (pass ``probes=(Z, V)`` for exact
    same-probe comparisons); hypers/``h``/``sigmasq`` must be concrete
    (host-f64 planning values).  For ``M <= DENSE_SOLVER_MAX_M`` the
    inner correction solves use one dense MXU inverse; beyond it,
    ``precond_rank > 0`` deflates the inner CG (ops/deflation.py).
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    if kernel.hyper_names != ("lengthscale", "variance"):
        raise NotImplementedError(
            "gradient_high supports (lengthscale, variance) kernels "
            "(SE / fixed-nu Matern)")
    M = mtot ** d
    if probes is not None:
        Z, V = probes
        Z = jnp.asarray(Z, x.dtype)
        V = jnp.asarray(V, x.dtype)
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        kz, kv = jax.random.split(key)
        Z = (jax.random.bernoulli(kz, 0.5, (trace_samples, n)) * 2 - 1
             ).astype(x.dtype)
        V = (jax.random.bernoulli(kv, 0.5, (trace_samples, M)) * 2 - 1
             ).astype(x.dtype)

    h64 = float(h)
    sig64 = float(sigmasq)
    var64 = float(kernel.variance)
    ws_hi, ws_lo = ws_host_f64(kernel, h64, mtot, d)
    dl_hi, dl_lo = dlength_host_f64(kernel, h64, mtot, d)
    h_hi, h_lo = split_f64_host(h64)
    sig_hi, sig_lo = split_f64_host(sig64)
    isig_hi, isig_lo = split_f64_host(1.0 / sig64)
    var_hi, var_lo = split_f64_host(var64)
    ivar_hi, ivar_lo = split_f64_host(1.0 / var64)
    from ..ops.dense_solve import DENSE_SOLVER_MAX_M
    grad, iters, res = _gradient_high_core(
        x, jnp.asarray(y), Z, V, ws_hi, ws_lo, dl_hi, dl_lo, h_hi, h_lo,
        sig_hi, sig_lo, isig_hi, isig_lo, ivar_hi, ivar_lo, var_hi, var_lo,
        mtot=mtot, trace_samples=Z.shape[0], passes=passes, chunk=chunk,
        ir_tol=ir_tol, ir_maxiter=ir_maxiter, rtol=ir_rtol,
        use_dense_inner=M <= DENSE_SOLVER_MAX_M,
        precond_rank=precond_rank)
    return GradientHighResult(grad=grad, inner_iters=iters, residual=res)
