"""EFGP functional core: fit, predict, posterior variance (layer L5).

TPU-native re-design of the reference's ``EFGPND._compute_common_parameters``
/ ``predict`` / ``compute_prediction_variance`` stack (reference:
efgpnd.py:710-972, 1634-1841).  Everything here is a pure function over
explicit pytree state — no ``nn.Module`` caches, no parameter fingerprinting;
refitting under new hyperparameters is just calling :func:`fit` again (and
under ``jit`` XLA reuses the compiled program as long as grid shapes bucket
to the same size).

The NUFFT applies run as exact separable MXU matmuls (ops/nufft.py), the
Gram matvec is the FFT Toeplitz operator (ops/toeplitz.py), and all CG
solves are the masked batched ``lax.while_loop`` PCG (ops/cg.py).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cg import pcg
from ..ops.deflation import deflation_block, make_block_precond
from ..ops.dense_solve import (DENSE_SOLVER_MAX_M, dense_gram, dense_inverse,
                               refine_solve)
from ..ops.kron_precond import KronPrecond, kron_eig_build, make_kron_precond
from ..ops.nufft import make_nufft
from ..ops.operators import (convolution_vector, make_A_mean, make_A_var,
                             make_jacobi_precond)
from ..ops.toeplitz import ToeplitzND, make_toeplitz, toeplitz_diag_scale
from ..quadrature import spectral_grid

__all__ = [
    "FitState",
    "tensor_grid",
    "quadrature_weights",
    "fit_with_grid",
    "fit",
    "predict_mean",
    "predict_var",
    "posterior_fourier_rows",
]


def _cdtype(rdtype):
    return jnp.complex64 if jnp.dtype(rdtype) == jnp.float32 else jnp.complex128


@dataclasses.dataclass(frozen=True)
class FitState:
    """Cached fit artifacts — the analogue of EFGPND's ``_beta/_xis/_ws/
    _toeplitz`` cache (reference efgpnd.py:459-464, 816-822)."""
    beta: jnp.ndarray          # (M,) complex Fourier weights
    ws: jnp.ndarray            # (M,) complex quadrature weights sqrt(S h^d)
    h: jnp.ndarray             # scalar grid spacing
    sigmasq: jnp.ndarray       # scalar noise variance
    toeplitz: ToeplitzND       # Gram operator F*F
    mean_cg_iters: jnp.ndarray
    diag_scale: jnp.ndarray = 1.0   # Toeplitz zero-lag (= n), Jacobi scale
    A_dense: Optional[jnp.ndarray] = None   # (M, M) dense A (dense solver)
    P_dense: Optional[jnp.ndarray] = None   # (M, M) inv(A) (dense solver)
    defl_idx: Optional[jnp.ndarray] = None  # (k,) deflated mode indices
    defl_P: Optional[jnp.ndarray] = None    # (k, k) inv(A[B, B])
    kron: Optional[KronPrecond] = None      # Kronecker eigen-preconditioner
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    d: int = dataclasses.field(metadata={"static": True}, default=1)

    @property
    def M(self) -> int:
        return self.mtot ** self.d

    def xis_flat(self) -> jnp.ndarray:
        """(M, d) tensor-product frequency grid."""
        m = (self.mtot - 1) // 2
        xis_1d = jnp.arange(-m, m + 1, dtype=self.h.dtype) * self.h
        return tensor_grid(xis_1d, self.d)


jax.tree_util.register_dataclass(
    FitState,
    data_fields=["beta", "ws", "h", "sigmasq", "toeplitz", "mean_cg_iters",
                 "diag_scale", "A_dense", "P_dense", "defl_idx", "defl_P",
                 "kron"],
    meta_fields=["mtot", "d"],
)


def resolve_precond(precond: str, precond_rank: int, use_precond: bool,
                    d: int, n: Optional[int] = None,
                    M: Optional[int] = None) -> str:
    """Preconditioner family for the CG branch.  'auto' keeps the
    historical selection (deflation when ``precond_rank > 0``, Jacobi
    otherwise); 'kron' is the Kronecker eigen-preconditioner
    (ops/kron_precond.py) — the strongest option for d <= 3 separable
    densities when the data are dense relative to the grid; 'adaptive'
    picks kron when ``n >= M`` and deflation otherwise (kron's separable
    concentration argument needs the per-mode fluctuation ~sqrt(n) to be
    small against the n-scaled mean — at n < M the fluctuation term
    dominates and the dense-head deflation tier wins; both regimes
    measured, docs/DESIGN.md round-5 notes)."""
    if precond == "auto":
        return "deflation" if precond_rank > 0 else (
            "jacobi" if use_precond else "none")
    if precond == "adaptive":
        if d > 3 or (n is not None and M is not None and n < M):
            return "deflation"
        return "kron"
    if precond == "kron" and d > 3:
        return "jacobi"
    if precond not in ("jacobi", "deflation", "kron", "none"):
        raise ValueError(f"Unknown precond '{precond}' "
                         "(auto | adaptive | jacobi | deflation | kron | "
                         "none)")
    return precond


def resolve_solver(solver: str, mtot: int, d: int) -> str:
    """'auto' picks the dense factor-solve while the O(M^2) Gram is cheap
    (M <= DENSE_SOLVER_MAX_M), CG beyond — see ops/dense_solve.py."""
    if solver == "auto":
        return "dense" if mtot ** d <= DENSE_SOLVER_MAX_M else "cg"
    if solver not in ("dense", "cg"):
        raise ValueError(f"Unknown solver '{solver}' (auto | dense | cg)")
    return solver


def tensor_grid(xis_1d: jnp.ndarray, d: int) -> jnp.ndarray:
    """(mtot^d, d) tensor-product grid in ``ij`` order
    (reference efgpnd.py:96-97)."""
    grids = jnp.meshgrid(*([xis_1d] * d), indexing="ij")
    return jnp.stack(grids, axis=-1).reshape(-1, d)


def quadrature_weights(kernel, xis_flat, h, d, *, mask=None):
    """ws = sqrt(S(xi) h^d), complex (reference efgpnd.py:98, 778-780).

    ``mask`` (optional, (M,)) zeroes padded grid nodes so bucketed static
    grids stay algebraically exact."""
    s = kernel.spectral_density(xis_flat)
    if mask is not None:
        s = s * mask
    ws = jnp.sqrt(s.astype(_cdtype(s.dtype)) * h.astype(s.dtype) ** d)
    return ws


def fit_with_grid(x, y, kernel, sigmasq, h, mtot: int, *,
                  cg_tol: float = 1e-4, max_cg_iter: Optional[int] = None,
                  beta0: Optional[jnp.ndarray] = None,
                  use_precond: bool = True, ws_mask=None,
                  nufft_method: str = "mxu",
                  nufft_caps: Optional[tuple] = None,
                  solver: str = "auto",
                  precond_rank: int = 0,
                  precond: str = "auto",
                  fft_smooth: bool = False) -> FitState:
    """Fit against a fixed (static-size) frequency grid, compiled with XLA.

    Mirrors ``_compute_common_parameters`` (reference efgpnd.py:736-822):
    quadrature weights, NUFFT rhs, Toeplitz Gram, Jacobi-preconditioned CG
    mean solve.  ``h`` may be traced; only ``mtot`` must be static.
    ``precond_rank > 0`` swaps the CG branch's Jacobi preconditioner for
    the dense-head deflation preconditioner (ops/deflation.py) on the
    top-``precond_rank`` weight modes; the block is kept on the state so
    variance/gradient solves against the same ``A`` reuse it.
    ``precond="kron"`` uses the Kronecker eigen-preconditioner instead
    (ops/kron_precond.py; measured 376 -> 12 mean iterations on the hard
    config) — also carried on the state for variance/gradient reuse.

    Always jitted: the axon TPU runtime cannot materialize complex host
    constants or transfer complex buffers, so every complex intermediate
    must live inside a compiled program; only real arrays cross the host
    boundary.
    """
    if nufft_method == "banded" and nufft_caps is None:
        nufft_caps = plan_nufft_caps(x, h, mtot)
    return _fit_with_grid_jit(x, y, kernel, sigmasq, h, beta0, ws_mask,
                              mtot=mtot, cg_tol=cg_tol,
                              max_cg_iter=max_cg_iter,
                              use_precond=use_precond,
                              nufft_method=nufft_method,
                              nufft_caps=nufft_caps, solver=solver,
                              precond_rank=precond_rank, precond=precond,
                              fft_smooth=fft_smooth)


def plan_nufft_caps(x, h, mtot: int) -> tuple:
    """Host-side static band caps for the banded backend: (fit grid,
    doubled convolution-vector grid).  Requires concrete ``x``/``h``."""
    from ..ops.spread_banded import banded_plan_cap, banded_plan_cap_3d
    import numpy as np
    xh = np.asarray(x)
    if xh.ndim == 1:
        xh = xh[:, None]
    m = (mtot - 1) // 2
    plan = banded_plan_cap if xh.shape[1] == 2 else banded_plan_cap_3d
    return (plan(xh, float(h), mtot),
            plan(xh, float(h), 4 * m + 1))


@partial(jax.jit,
         static_argnames=("mtot", "cg_tol", "max_cg_iter", "use_precond",
                          "nufft_method", "nufft_caps", "solver",
                          "precond_rank", "precond", "fft_smooth"))
def _fit_with_grid_jit(x, y, kernel, sigmasq, h, beta0, ws_mask, *,
                       mtot: int, cg_tol: float,
                       max_cg_iter: Optional[int],
                       use_precond: bool,
                       nufft_method: str = "mxu",
                       nufft_caps: Optional[tuple] = None,
                       solver: str = "auto",
                       precond_rank: int = 0,
                       precond: str = "auto",
                       fft_smooth: bool = False) -> FitState:
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    rdtype = x.dtype
    cdtype = _cdtype(rdtype)
    h = jnp.asarray(h, dtype=rdtype)
    sigmasq = jnp.asarray(sigmasq, dtype=rdtype)
    kernel = kernel.with_hypers(kernel.hyper_vector().astype(rdtype))

    m = (mtot - 1) // 2
    xis_1d = jnp.arange(-m, m + 1, dtype=rdtype) * h
    xis = tensor_grid(xis_1d, d)
    ws = quadrature_weights(kernel, xis, h, d, mask=ws_mask)

    caps = nufft_caps or (None, None)
    nufft = make_nufft(x, h, mtot, cdtype=cdtype, method=nufft_method,
                       cap=caps[0])
    rhs = ws * nufft.type1(y.astype(cdtype)).reshape(-1)

    # fft_smooth: pad the Toeplitz FFT to 2,3,5,7-smooth sizes instead of
    # pow-2 — measured 1.41x faster per matvec on v5e at the scale config
    # (700^2 vs 1024^2); pow-2 remains the default because the M-sharded
    # pencil FFT requires mesh-divisible pads (parallel/msharded.py)
    v = convolution_vector(m, x, h, nufft_method=nufft_method, cap=caps[1])
    toeplitz = make_toeplitz(v, force_pow2=not fft_smooth)
    A_dense = P_dense = defl_idx = defl_P = kron = None
    if resolve_solver(solver, mtot, d) == "dense":
        A_dense = dense_gram(ws, v, mtot, d, sigmasq)
        P_dense = dense_inverse(A_dense)
        res = refine_solve(A_dense, P_dense, rhs, tol=cg_tol)
    else:
        A_mean = make_A_mean(ws, toeplitz, sigmasq)
        M_inv = None
        family = resolve_precond(precond, precond_rank, use_precond, d,
                                 n=n, M=mtot ** d)
        if family == "kron":
            kron = kron_eig_build(ws, v, sigmasq, mtot=mtot, d=d,
                                  diag_scale=toeplitz_diag_scale(v))
            M_inv = make_kron_precond(kron)
        elif family == "deflation":
            defl_idx, defl_P = deflation_block(
                ws, v, sigmasq, mtot=mtot, d=d,
                rank=precond_rank if precond_rank > 0 else 2048)
            jac = (toeplitz_diag_scale(v) * jnp.abs(ws) ** 2 + sigmasq)
            M_inv = make_block_precond(defl_idx, defl_P, jac)
        elif family == "jacobi":
            M_inv = make_jacobi_precond(ws, sigmasq,
                                        diag_scale=toeplitz_diag_scale(v))
        res = pcg(A_mean, rhs, beta0, tol=cg_tol,
                  maxiter=max_cg_iter if max_cg_iter is not None
                  else 2 * rhs.shape[0],
                  M_inv=M_inv)
    return FitState(beta=res.x, ws=ws, h=h, sigmasq=sigmasq,
                    toeplitz=toeplitz, mean_cg_iters=res.iters,
                    diag_scale=toeplitz_diag_scale(v),
                    A_dense=A_dense, P_dense=P_dense,
                    defl_idx=defl_idx, defl_P=defl_P, kron=kron,
                    mtot=mtot, d=d)


def fit(x, y, kernel, sigmasq, eps: float = 1e-2, *, cg_tol: float = 1e-4,
        max_cg_iter: Optional[int] = None, beta0=None,
        use_precond: bool = True, solver: str = "auto",
        precond_rank: int = 0, precond: str = "auto") -> FitState:
    """Host-level fit: plan the quadrature grid, then solve.

    Grid planning (bisection truncation bounds) follows reference
    efgpnd.py:750-762 with ``use_integral=True``.  ``solver`` "auto"
    takes the dense factor-solve under DENSE_SOLVER_MAX_M modes (fast on
    the MXU; prefer "cg" on CPU where a large dense inverse crawls).
    """
    if x.ndim == 1:
        x = x[:, None]
    L = float(np.max(np.asarray(jnp.max(x, axis=0) - jnp.min(x, axis=0))))
    if L <= 1e-9:
        L = 1.0
    _, h, mtot = spectral_grid(kernel, eps, L, use_integral=True)
    return fit_with_grid(x, y, kernel, sigmasq, h, mtot, cg_tol=cg_tol,
                         max_cg_iter=max_cg_iter, beta0=beta0,
                         use_precond=use_precond, solver=solver,
                         precond_rank=precond_rank, precond=precond)


# ---------------------------------------------------------------------------
# prediction
# ---------------------------------------------------------------------------

@jax.jit
def predict_mean(state: FitState, x_new) -> jnp.ndarray:
    """Posterior mean: one type-2 apply of ws*beta
    (reference efgpnd.py:918-922)."""
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    nufft = make_nufft(x_new, state.h, state.mtot)
    return nufft.type2((state.ws * state.beta).reshape((state.mtot,) * state.d)).real


def posterior_fourier_rows(x_new, h, mtot: int, d: int):
    """Rows f_x = exp(+2 pi i x . xi) of the Fourier design at targets,
    built as a separable outer product of per-dimension phase factors
    (the reference materializes them directly, efgpnd.py:1811)."""
    nufft = make_nufft(x_new, h, mtot)
    # conj(E_t)[n, j] = exp(+2 pi i x_n h k_j)
    fs = [jnp.conj(p) for p in nufft.phases]
    if d == 1:
        return fs[0]
    if d == 2:
        return jnp.einsum("nj,nk->njk", fs[0], fs[1]).reshape(x_new.shape[0], -1)
    if d == 3:
        return jnp.einsum("nj,nk,nl->njkl", fs[0], fs[1], fs[2]).reshape(
            x_new.shape[0], -1)
    raise NotImplementedError("d <= 3")


def _solve_var(state: FitState, rhs, *, cg_tol, max_cg_iter):
    """Solve ``A_var x = rhs`` (``A_var = A_mean / sigma^2``) reusing the
    fit's dense inverse when present, batched CG otherwise."""
    if state.P_dense is not None:
        return refine_solve(state.A_dense, state.P_dense, rhs,
                            scale=1.0 / state.sigmasq, tol=cg_tol)
    A_var = make_A_var(state.ws, state.toeplitz, state.sigmasq)
    return pcg(A_var, rhs, tol=cg_tol, maxiter=max_cg_iter,
               M_inv=_var_precond(state))


def _var_precond(state: FitState):
    """Preconditioner for A_var = A_mean / sigma^2 (the reference's
    variance CG runs unpreconditioned, efgpnd.py:1648-1655, 1813-1816; the
    CSV baselines show 2.5-6x iteration cuts from the diagonal).

    Reuses the fit's Kronecker eigen-preconditioner or deflation block
    when present: a preconditioner for ``A`` works unchanged for
    ``A / sigma^2`` (a global positive scale of ``M^{-1}`` leaves the
    PCG iterates invariant)."""
    if state.kron is not None:
        return make_kron_precond(state.kron)
    if state.defl_P is not None:
        jac = (state.diag_scale * jnp.abs(state.ws) ** 2 + state.sigmasq)
        return make_block_precond(state.defl_idx, state.defl_P, jac)
    diag = (state.diag_scale * jnp.abs(state.ws) ** 2 / state.sigmasq + 1.0)

    def M_inv(v):
        return v / diag.astype(v.dtype)
    return M_inv


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter", "microbatch"))
def _variance_regular(state: FitState, x_new, *, cg_tol, max_cg_iter,
                      microbatch: int = 8192) -> jnp.ndarray:
    """Exact per-target variance: dense factor-solve when available, CG
    microbatches otherwise (reference efgpnd.py:1805-1820)."""
    B = x_new.shape[0]
    nb = max(1, math.ceil(B / microbatch))
    pad = nb * microbatch - B if nb > 1 else 0
    if pad:
        x_new = jnp.concatenate([x_new, x_new[-1:].repeat(pad, axis=0)], axis=0)

    def one_batch(xb):
        fx = posterior_fourier_rows(xb, state.h, state.mtot, state.d)
        rhs = state.ws * jnp.conj(fx)
        res = _solve_var(state, rhs, cg_tol=cg_tol, max_cg_iter=max_cg_iter)
        return jnp.maximum(jnp.real(jnp.sum(fx * (state.ws * res.x), axis=-1)),
                           0.0)

    if nb == 1:
        return one_batch(x_new)
    chunks = x_new.reshape(nb, -1, x_new.shape[-1])
    out = jax.lax.map(one_batch, chunks).reshape(-1)
    return out[:B]


@partial(jax.jit, static_argnames=("probes", "cg_tol", "max_cg_iter",
                                   "nufft_method"))
def _variance_stochastic(state: FitState, x_new, key, *, probes: int,
                         cg_tol, max_cg_iter,
                         nufft_method: str = "mxu",
                         etas=None) -> jnp.ndarray:
    """Hutchinson diag-sums variance (reference diag_sums_nd +
    nufft_var_est_nd, efgpnd.py:1634-1679).

    Solve A_var u_j = D eta_j for J Rademacher probes, cross-correlate
    gamma = D u with eta on the (2*mtot-1)^d zero-padded FFT grid, then
    evaluate the lag sums at targets with one FFT-ordered type-2 apply.
    ``etas`` (optional, (probes, M) Rademacher) makes same-probe dense
    f64 oracle comparisons exact rather than seed-matched (the same
    parity hook the gradient estimator exposes, gradient.py:171-178).
    """
    mtot, d = state.mtot, state.d
    M = mtot ** d
    rdtype = state.h.dtype
    if etas is None:
        etas = (jax.random.bernoulli(key, 0.5, (probes, M)) * 2 - 1
                ).astype(rdtype)
    else:
        etas = etas.astype(rdtype)
    # Probe-CHUNKED solve + correlation (running sum of exact per-chunk
    # sums): both the (probes, M) CG state with its padded-FFT matvec
    # buffers and the (probes, Lf^d) correlation spectra scale linearly
    # with the probe count — 4096 unchunked probes wanted ~50 GB of HBM
    # at the scale config; 256-probe chunks keep the peak flat.
    #
    # The correlation runs on a 2,3,5,7-smooth grid >= 2*mtot-1 and
    # extracts the +-(mtot-1) lags: 2*mtot-1 is odd by construction and
    # often has large prime factors (677 prime at the scale config,
    # 321 = 3*107 at ERA5 rungs), which sends the TPU FFT down the slow
    # non-smooth path; lags within the support are exact for ANY fft
    # size >= 2m-1.
    from ..ops.toeplitz import _next_smooth
    L = 2 * mtot - 1
    Lf = _next_smooth(L)
    s_size = (Lf,) * d
    axes = tuple(range(1, d + 1))
    pc = min(probes, 256)
    nc = -(-probes // pc)
    pad = nc * pc - probes
    eta_c = etas if pad == 0 else jnp.concatenate(
        [etas, jnp.zeros((pad,) + etas.shape[1:], etas.dtype)])
    eta_c = eta_c.reshape((nc, pc, mtot ** d))

    def solve_corr_chunk(e_flat):
        rhs = state.ws[None, :] * e_flat
        res = _solve_var(state, rhs, cg_tol=cg_tol,
                         max_cg_iter=max_cg_iter)
        g = (state.ws[None, :] * res.x).reshape((pc,) + (mtot,) * d)
        e = e_flat.reshape((pc,) + (mtot,) * d)
        G = jnp.fft.fftn(g, s=s_size, axes=axes)
        E = jnp.fft.fftn(e.astype(G.dtype), s=s_size, axes=axes)
        return jnp.sum(jnp.fft.ifftn(G * jnp.conj(E), s=s_size, axes=axes),
                       axis=0)

    if nc == 1:
        est_sums = solve_corr_chunk(eta_c[0]) / probes
    else:
        est_sums = jnp.sum(jax.lax.map(solve_corr_chunk, eta_c),
                           axis=0) / probes
    if Lf != L:
        lag_idx = jnp.concatenate([jnp.arange(mtot),
                                   jnp.arange(Lf - mtot + 1, Lf)])
        for ax in range(d):
            est_sums = jnp.take(est_sums, lag_idx, axis=ax)

    # FFT-ordered type-2 on the (2*mtot-1)^d lag grid (modeord=True in the
    # reference, efgpnd.py:1666-1679); "pallas" avoids materializing the
    # (n_targets, 2*mtot-1) phase matrices of this doubled grid
    method = nufft_method if (nufft_method == "pallas" and d == 2) else "mxu"
    nufft = make_nufft(x_new, state.h, 2 * mtot - 1, fft_order=True,
                       method=method)
    return nufft.type2(est_sums).real


# module-level so the executable is compiled once; a fresh jit(lambda)
# per call recompiled every time (~0.3 s per predict_var on axon)
_abs2 = jax.jit(lambda w: jnp.abs(w) ** 2)


def _auto_chebyshev_nodes(state: FitState, x_new, *, mass: float = 0.999,
                          c: float = 4.0, floor: int = 20, cap: int = 96):
    """Per-dimension Chebyshev node counts from the variance surface's
    effective bandwidth.

    The posterior variance is a trigonometric polynomial in x; its
    spectral envelope is NOT the raw quadrature weights ws^2 but the
    Woodbury-damped q = ws^2 / (n ws^2 + sigma^2): the quadratic form is
    f* D (G/s2 + I)^{-1} D f, and where the data dominate
    (n ws^2 >> s2) the inverse flattens the spectrum to ~s2/n, so high
    frequencies carry far more relative mass than ws^2 suggests.  The
    per-dim bandwidth B = (q-weighted ``mass``-quantile of |xi_dim|)
    bounds how fast the surface varies; Chebyshev interpolation of
    e^{2 pi i B x} over a width-W window needs ~pi nodes per wavelength,
    so N = ceil(2 c B W) with c = 4.0.  Measured at the headline bench
    config (n=1e5, SE l=0.1, eps=1e-6, mtot=29): the raw-ws^2 quantile
    gave N=42 (interp 6.9e-4 rel-to-max vs the f64 oracle) while the
    damped quantile gives N=69 (3e-8 class); a fixed N=20 was 13% off.
    Heavy-tailed spectra (Matern-1/2 at very short lengthscale) can need
    more than ``cap`` nodes; the dispatcher falls back to exact
    per-target solves when the auto grid would be no smaller than the
    target set anyway."""
    m = (state.mtot - 1) // 2
    xis1 = np.arange(-m, m + 1) * float(state.h)
    # |ws|^2 computed inside jit: axon cannot transfer complex arrays
    # host<->device, but the squared magnitude is real.
    w2 = np.asarray(_abs2(state.ws))
    w2 = (w2 / (float(np.asarray(state.diag_scale)) * w2
                + float(np.asarray(state.sigmasq))))
    w2 = w2.reshape((state.mtot,) * state.d)
    xh = np.asarray(x_new)
    order = np.argsort(np.abs(xis1))
    fsorted = np.abs(xis1)[order]
    out = []
    for dim in range(state.d):
        axes = tuple(i for i in range(state.d) if i != dim)
        wdim = w2.sum(axis=axes) if axes else w2
        cs = np.cumsum(wdim[order])
        B = fsorted[min(int(np.searchsorted(cs, mass * cs[-1])),
                        len(fsorted) - 1)]
        W = float(xh[:, dim].max() - xh[:, dim].min())
        out.append(int(np.clip(np.ceil(2.0 * c * B * W), floor, cap)))
    return out


def _variance_chebyshev(state: FitState, x_new, *, n_nodes_per_dim,
                        cg_tol, max_cg_iter) -> jnp.ndarray:
    """Chebyshev-Lobatto tensor-grid variance, barycentric-interpolated to
    the targets.

    Generalizes the PG module's third variance mode
    (reference pg_classifier.py:879-1009) to EFGP regression, per SURVEY
    §7-S5: the posterior variance is a smooth function of the target
    location, so the exact per-target solves run only at
    ``prod(n_nodes_per_dim)`` Chebyshev nodes and targets interpolate —
    for 10k 2-D targets this cuts the CG batch ~25x at ~1e-3 accuracy.
    ``n_nodes_per_dim`` may be an int, a per-dim sequence, or None
    (bandwidth-adaptive via :func:`_auto_chebyshev_nodes`).
    """
    from .pg_core import chebyshev_lobatto_nodes
    xh = np.asarray(x_new)
    d = xh.shape[1]
    if n_nodes_per_dim is None:
        n_per_dim = _auto_chebyshev_nodes(state, x_new)
    elif np.ndim(n_nodes_per_dim) == 0:
        n_per_dim = [int(n_nodes_per_dim)] * d
    else:
        n_per_dim = [int(v) for v in n_nodes_per_dim]
    axes_nodes, axes_weights = [], []
    for dim in range(d):
        coord = xh[:, dim]
        lo, hi = float(coord.min()), float(coord.max())
        if np.isclose(lo, hi):
            pad = max(abs(lo), 1.0) * 1e-6
            lo, hi = lo - pad, hi + pad
        nodes, weights = chebyshev_lobatto_nodes(lo, hi, n_per_dim[dim])
        axes_nodes.append(jnp.asarray(nodes, x_new.dtype))
        axes_weights.append(jnp.asarray(weights, x_new.dtype))
    mesh = np.stack(np.meshgrid(*[np.asarray(a) for a in axes_nodes],
                                indexing="ij"), -1).reshape(-1, d)
    # one fused program: node solves + device-built barycentric rows +
    # tensor interpolation.  Building the (targets, nodes) matrices on
    # host and shipping them through the axon tunnel cost ~10x the
    # compute at 10k targets (0.69 s vs the 47 ms exact-at-10k path).
    return _cheb_eval(state, x_new, tuple(axes_nodes), tuple(axes_weights),
                      jnp.asarray(mesh, x_new.dtype), cg_tol=float(cg_tol),
                      max_cg_iter=int(max_cg_iter))


def _bary_rows(nodes, weights, t):
    """Barycentric interpolation rows, built on device.  The barycentric
    form is self-normalizing as t -> node (the diverging term dominates
    numerator and denominator), so only exact zeros need the one-hot
    guard (reference _barycentric_interpolation_matrix,
    pg_classifier.py:894-920)."""
    diff = t[:, None] - nodes[None, :]
    hit = diff == 0.0
    matched = jnp.any(hit, axis=1)
    onehot = hit.astype(t.dtype)
    raw = weights[None, :] / jnp.where(hit, 1.0, diff)
    raw = jnp.where(hit, 0.0, raw)
    smooth = raw / jnp.sum(raw, axis=1, keepdims=True)
    return jnp.where(matched[:, None], onehot, smooth)


@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter"))
def _cheb_eval(state, x_new, nodes, weights, mesh, *, cg_tol, max_cg_iter):
    d = len(nodes)
    node_var = _variance_regular(state, mesh, cg_tol=cg_tol,
                                 max_cg_iter=max_cg_iter)
    node_grid = node_var.reshape(tuple(n.shape[0] for n in nodes))
    mats = [_bary_rows(nodes[i], weights[i], x_new[:, i]) for i in range(d)]
    letters = "abcdefghij"[:d]
    expr = ",".join(f"n{c}" for c in letters) + "," + letters + "->n"
    # HIGHEST: the TPU default runs contractions at bf16-pass precision;
    # the barycentric rows carry alternating-sign O(1) weights, so a bf16
    # contraction injects ~4e-3 of the grid scale — BENCH_r03 measured
    # scale_rel_err 3.3e-3 on device vs the 4.3e-4 f32 node-solve floor
    # this estimator shows on CPU (scripts/diagnose_cheb_error.py)
    return jnp.maximum(jnp.einsum(expr, *mats, node_grid,
                                  precision=jax.lax.Precision.HIGHEST), 0.0)


def predict_var(state: FitState, x_new, *, method: str = "stochastic",
                key=None, probes: int = 1000, cg_tol: float = 1e-4,
                max_cg_iter: int = 1000, microbatch: int = 8192,
                chebyshev_nodes=None,
                nufft_method: str = "mxu", etas=None) -> jnp.ndarray:
    """Posterior variance dispatch (reference compute_prediction_variance,
    efgpnd.py:1761-1841, plus the Chebyshev mode generalized from the PG
    module)."""
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    method = method.lower()
    if method == "regular":
        return _variance_regular(state, x_new, cg_tol=cg_tol,
                                 max_cg_iter=max_cg_iter,
                                 microbatch=microbatch)
    if method == "stochastic":
        if key is None:
            key = jax.random.PRNGKey(0)
        return _variance_stochastic(state, x_new, key, probes=probes,
                                    cg_tol=cg_tol, max_cg_iter=max_cg_iter,
                                    nufft_method=nufft_method, etas=etas)
    if method == "chebyshev":
        if chebyshev_nodes is None:
            auto = _auto_chebyshev_nodes(state, x_new)
            # When the auto-sized node grid is no smaller than the target
            # set, per-target exact solves are both cheaper and exact —
            # fall through to the regular path instead of interpolating.
            if int(np.prod(auto)) >= x_new.shape[0]:
                return _variance_regular(state, x_new, cg_tol=cg_tol,
                                         max_cg_iter=max_cg_iter,
                                         microbatch=microbatch)
            chebyshev_nodes = auto
        return _variance_chebyshev(state, x_new,
                                   n_nodes_per_dim=chebyshev_nodes,
                                   cg_tol=cg_tol, max_cg_iter=max_cg_iter)
    raise ValueError(
        f"Variance method '{method}' not implemented. Choose 'regular', "
        f"'stochastic' or 'chebyshev'.")
