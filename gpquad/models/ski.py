"""SKI (structured kernel interpolation) baseline GP (component C16).

The reference wraps GPyTorch's ``GridInterpolationKernel`` stack
(reference: utils/ski.py:32-401).  This build implements SKI from scratch
on the same TPU structured-operator core used by EFGP:

    K ~ W K_grid W^T,   K_grid multilevel Toeplitz (stationary kernel on a
                        uniform grid) -> FFT matvec (ops/toeplitz.py),
    W sparse local cubic-convolution interpolation -> gather / scatter-add
    (4^d weights per point, Keys a=-1/2 cubic, the same family GPyTorch's
    Interpolation uses).

Hyper-learning follows the reference's route conceptually
(-ExactMarginalLogLikelihood via CG + stochastic trace, utils/ski.py:270-326)
but with explicit pieces: Hutchinson probes for tr(K^-1 dK), one batched
PCG for all solves, SLQ for the reported loss, Adam on log-space hypers
with a noise floor.  ``fit_ski_gp`` mirrors the reference's signature and
returned history dict (incl. per-iteration timings and RSS).
"""
from __future__ import annotations

import math
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..kernels import make_kernel
from ..ops.cg import pcg
from ..ops.pallas_interp import _on_tpu as _pallas_on_tpu
from ..ops.pallas_interp import pallas_interp_2d, pallas_interp_T_2d
from ..ops.toeplitz import ToeplitzND, make_toeplitz

__all__ = ["SKIOperator", "build_ski_operator", "fit_ski_gp",
           "ski_predict_mean", "ski_predict_var"]


def _canonical_kernel(kernel) -> str:
    """Accepts the reference's string names (utils/ski.py:185 takes
    kernel: str = "SE") plus gpquad kernel instances, so functional-API
    users can hand their kernel object straight to the baseline."""
    if not isinstance(kernel, str):
        name = type(kernel).__name__
        if name == "SquaredExponential":
            return "se"
        if name == "Matern":
            nu = getattr(kernel, "nu", None)
            if nu is not None and abs(nu - 1.5) < 1e-9:
                return "matern32"
            if nu is not None and abs(nu - 2.5) < 1e-9:
                return "matern52"
            raise ValueError(
                f"SKI supports Matern nu in {{1.5, 2.5}}, got nu={nu}.")
        raise TypeError(
            f"Unsupported SKI kernel object {name!r}. Pass a kernel name "
            "string or a SquaredExponential / Matern(nu=1.5|2.5) instance.")
    key = kernel.lower().replace("-", "").replace("_", "")
    if key in {"se", "squaredexponential", "rbf", "gaussian"}:
        return "se"
    if key in {"matern", "matern32", "mat32"}:
        return "matern32"
    if key in {"matern52", "mat52"}:
        return "matern52"
    raise ValueError(
        f"Unsupported SKI kernel '{kernel}'. Expected one of: SE, "
        "SquaredExponential, RBF, Matern32, Matern52.")


def resolve_grid_bounds(x: np.ndarray, grid_bounds=None
                        ) -> Tuple[Tuple[float, float], ...]:
    """1%-padded data bounds (reference _resolve_grid_bounds,
    utils/ski.py:64-87)."""
    d = x.shape[1]
    if grid_bounds is not None:
        if len(grid_bounds) != d:
            raise ValueError(
                f"grid_bounds has {len(grid_bounds)} dims, expected {d}")
        out = []
        for lo, hi in grid_bounds:
            if not float(hi) > float(lo):
                raise ValueError(
                    f"Each grid bound must satisfy hi > lo, got {(lo, hi)}")
            out.append((float(lo), float(hi)))
        return tuple(out)
    mins, maxs = x.min(0), x.max(0)
    spans = np.maximum(maxs - mins, 1e-6)
    pad = 0.01 * spans
    return tuple((float(mins[i] - pad[i]), float(maxs[i] + pad[i]))
                 for i in range(d))


def resolve_grid_size(*, grid_size=None, num_dims: int,
                      target_grid_points: int, grid_bounds
                      ) -> Tuple[int, ...]:
    """Span-scaled per-dim sizes within a total budget (reference
    _resolve_grid_size, utils/ski.py:90-120)."""
    if isinstance(grid_size, int):
        return (int(grid_size),) * num_dims
    if grid_size is not None:
        out = tuple(int(v) for v in grid_size)
        if len(out) != num_dims:
            raise ValueError(
                f"grid_size has {len(out)} dims, expected {num_dims}")
        if any(v <= 1 for v in out):
            raise ValueError("Each entry in grid_size must be > 1")
        return out
    base = max(16, int(round(target_grid_points ** (1.0 / num_dims))))
    spans = [max(hi - lo, 1e-6) for lo, hi in grid_bounds]
    gm = math.prod(spans) ** (1.0 / num_dims)
    scaled = [max(16, int(round(base * (s / gm)))) for s in spans]
    total = math.prod(scaled)
    if total > target_grid_points:
        shrink = (target_grid_points / total) ** (1.0 / num_dims)
        scaled = [max(16, int(math.floor(v * shrink))) for v in scaled]
    return tuple(scaled)


def _cubic_weights(t):
    """Keys cubic-convolution weights (a = -1/2) for fractional offset
    t in [0,1): weights for nodes at offsets (-1, 0, 1, 2)."""
    a = -0.5
    def f1(s):  # |s| <= 1
        return (a + 2.0) * s**3 - (a + 3.0) * s**2 + 1.0
    def f2(s):  # 1 < |s| < 2
        return a * s**3 - 5.0 * a * s**2 + 8.0 * a * s - 4.0 * a
    return jnp.stack([f2(t + 1.0), f1(t), f1(1.0 - t), f2(2.0 - t)], axis=-1)


import dataclasses
from typing import NamedTuple

_BANDED_BH = 8          # band height (rows); slab height is BH + 3

# interp_T backend for the banded plan: "einsum" (XLA banded-dense),
# "pallas" (VMEM-resident one-hot selectors, ops/pallas_interp.py), or
# "auto" (batch-aware pallas on TPU, einsum elsewhere).
_INTERP_IMPL = "auto"

# measured v5e (n=2e5, 512^2), per-op crossovers:
# - interp_T (transpose): pallas wins at EVERY batch since the kernel
#   stacks the batch tile into one MXU matmul — B=4: 30.5 vs 32.6 ms
#   einsum; B=200 (CG-variance batches): 115.7 vs 203.5 ms (the old
#   per-lane dots used ~11 of the MXU's 128 result rows, 246 ms).
# - interp (forward): the per-lane dot's output is already a full
#   (512, 512) tile, so batch stacking cannot help (and Mosaic rejects
#   the minor-dim reshape it needs); the bb-loop loses to the XLA
#   gather at large batch — B=8: 48.3 vs 62.1 ms, B=16: 64.3 vs
#   62.2 ms, B=200: 491 vs 72.5 ms.  Forward crossover ~12.
_PALLAS_MAX_BATCH = 1 << 30            # transpose: no batch limit
_PALLAS_FWD_MAX_BATCH = 12             # forward: gather wins beyond


def set_interp_impl(impl: str) -> None:
    """Select the banded ``interp_T`` backend ("auto"/"einsum"/"pallas").

    Read at trace time: jitted callers compiled before a switch keep the
    backend they were traced with (clear caches or use fresh callables)."""
    global _INTERP_IMPL
    if impl not in ("auto", "einsum", "pallas"):
        raise ValueError(f"unknown interp impl: {impl!r}")
    _INTERP_IMPL = impl


def _interp_impl(batch: int = 1, op: str = "T") -> str:
    """Resolve the backend at trace time; ``batch`` is the static batch
    size of the call being traced (shapes are static under jit), ``op``
    the direction ("T" transpose / "fwd" forward) — the two kernels have
    different batch crossovers (see _PALLAS_*_MAX_BATCH above)."""
    if _INTERP_IMPL != "auto":
        return _INTERP_IMPL
    cap = _PALLAS_FWD_MAX_BATCH if op == "fwd" else _PALLAS_MAX_BATCH
    if _pallas_on_tpu() and batch <= cap:
        return "pallas"
    return "einsum"


def _fold_band_slabs(slabs, batch, G1: int, G2: int, bh: int):
    """Fold each band's 3-row stencil halo into the next band and flatten
    (B, nbands, bh+3, G2) slabs to (*batch, G1*G2)."""
    B, nbands = slabs.shape[:2]
    dt = slabs.dtype
    core = slabs[:, :, :bh, :]                   # (B, nb, bh, G2)
    halo = slabs[:, :, bh:, :]                   # (B, nb, 3, G2)
    shifted = jnp.concatenate(
        [jnp.zeros_like(halo[:, :1]), halo[:, :-1]], axis=1)
    addend = jnp.concatenate(
        [shifted, jnp.zeros((B, nbands, bh - 3, G2), dt)], axis=2)
    fine = (core + addend).reshape(B, nbands * bh, G2)
    return fine[:, :G1, :].reshape(batch + (G1 * G2,))


class BandedInterpTables(NamedTuple):
    """Point-to-band gather tables for the scatter-free ``interp_T``
    (d=2): points sorted by the stencil's base grid row, padded to a
    static per-band ``cap`` (host-planned; the same banded-dense recipe
    as ops/spread_banded.py, here with the cubic 4-point stencil)."""
    pidx: jnp.ndarray       # (nbands, cap) int32 original point index
    valid: jnp.ndarray      # (nbands, cap) bool
    i0loc: jnp.ndarray      # (nbands, cap) int32 local row offset 0..BH-1
    c0: jnp.ndarray         # (nbands, cap) int32 column stencil start
    w_row: jnp.ndarray      # (nbands, cap, 4) row cubic weights
    w_col: jnp.ndarray      # (nbands, cap, 4) column cubic weights
    inv_slot: jnp.ndarray   # (n,) int32 band-major slot of each point


def _plan_banded_interp(i0, w1d, G1: int, bh: int = _BANDED_BH,
                        slack: float = 1.25):
    """Host-side banded plan (concrete stencils only): sort by base row
    band, pad band occupancy to a static cap."""
    i0 = np.asarray(i0)
    w1d = np.asarray(w1d)
    n = i0.shape[0]
    nbands = -(-G1 // bh)
    band = i0[:, 0] // bh
    order = np.argsort(band, kind="stable")
    band_sorted = band[order]
    starts = np.searchsorted(band_sorted, np.arange(nbands + 1))
    occ = starts[1:] - starts[:-1]
    cap = max(8, int(math.ceil(occ.max() * slack / 8.0)) * 8)
    offs = starts[:-1, None] + np.arange(cap)[None, :]
    valid = offs < starts[1:, None]
    table = np.where(valid, np.clip(offs, 0, n - 1), 0)
    pidx = order[table]
    i0loc = i0[pidx, 0] - (np.arange(nbands) * bh)[:, None]
    inv_slot = np.empty(n, np.int64)
    slot_ids = np.arange(nbands * cap).reshape(nbands, cap)
    inv_slot[pidx[valid]] = slot_ids[valid]
    return BandedInterpTables(
        pidx=jnp.asarray(pidx.astype(np.int32)),
        valid=jnp.asarray(valid),
        i0loc=jnp.asarray(i0loc.astype(np.int32)),
        c0=jnp.asarray(i0[pidx, 1].astype(np.int32)),
        w_row=jnp.asarray(w1d[pidx, 0, :]),
        w_col=jnp.asarray(w1d[pidx, 1, :]),
        inv_slot=jnp.asarray(inv_slot.astype(np.int32)))


@dataclasses.dataclass(frozen=True)
class SKIOperator:
    """W K_grid W^T + sigma^2 I with precomputed interpolation stencils.

    Registered as a pytree so it can cross jit boundaries as an argument
    (the axon TPU runtime rejects complex closure constants, so the
    Toeplitz spectrum must travel as data, not be baked into programs)."""
    idx: jnp.ndarray            # (n, 4^d) int32 flat grid indices
    wvals: jnp.ndarray          # (n, 4^d) real weights
    toeplitz: Optional[ToeplitzND]
    grid_shape: Tuple[int, ...] = dataclasses.field(
        metadata={"static": True}, default=())
    lo: Optional[jnp.ndarray] = None
    dx: Optional[jnp.ndarray] = None
    banded: Optional[BandedInterpTables] = None

    @property
    def M(self) -> int:
        return int(np.prod(self.grid_shape))

    def interp(self, v):
        """W v: grid -> points; v (..., M) -> (..., n).

        The take path is an (n, 4^d) gather — gather-bound on TPU like
        the scatter transpose was; with banded tables and the Pallas
        backend the stencil reads become MXU contractions against the
        same VMEM one-hot selectors (ops/pallas_interp.py)."""
        if (self.banded is not None and len(self.grid_shape) == 2
                and _interp_impl(int(np.prod(v.shape[:-1], dtype=np.int64)),
                                 op="fwd") == "pallas"):
            return self._interp_banded_pallas(v)
        g = jnp.take(v, self.idx, axis=-1)          # (..., n, 4^d)
        return jnp.sum(g * self.wvals, axis=-1)

    def _interp_banded_pallas(self, v):
        t = self.banded
        G1, G2 = self.grid_shape
        bh = _BANDED_BH
        nbands, cap = t.pidx.shape
        batch = v.shape[:-1]
        vb = v.reshape((-1, G1, G2))
        B = vb.shape[0]
        pad_rows = nbands * bh + 3 - G1
        vp = jnp.pad(vb, [(0, 0), (0, pad_rows), (0, 0)])
        row_idx = (np.arange(nbands)[:, None] * bh
                   + np.arange(bh + 3)[None, :])     # (nbands, bh+3)
        slabs = vp[:, row_idx, :]                    # (B, nbands, bh+3, G2)
        pts = pallas_interp_2d(slabs, t.i0loc, t.c0, t.w_row, t.w_col,
                               bh=bh)                # (nbands, B, cap)
        flat = jnp.moveaxis(pts, 1, 0).reshape(B, nbands * cap)
        return flat[:, t.inv_slot].reshape(batch + t.inv_slot.shape)

    def interp_T(self, u):
        """W^T u: points -> grid; u (..., n) -> (..., M).

        With banded tables (d=2, host-planned) the scatter-add becomes
        dense per-band MXU work — XLA scatter throughput (~1e8 updates/s,
        51 ms at n=2e5) was SKI's single slowest op on v5e; the sorted
        segment-sum alternative lost (commit 8dc1021), the banded-dense
        formulation is the lever that wins."""
        if self.banded is not None and len(self.grid_shape) == 2:
            return self._interp_T_banded(u)
        contrib = u[..., :, None] * self.wvals      # (..., n, 4^d)
        flat_idx = self.idx.reshape(-1)
        out_shape = u.shape[:-1] + (self.M,)
        z = jnp.zeros(out_shape, u.dtype)
        return z.at[..., flat_idx].add(
            contrib.reshape(u.shape[:-1] + (-1,)))

    def _interp_T_banded(self, u):
        t = self.banded
        G1, G2 = self.grid_shape
        bh = _BANDED_BH
        nbands, cap = t.pidx.shape
        batch = u.shape[:-1]
        ub = u.reshape((-1, u.shape[-1]))           # (B, n)
        B = ub.shape[0]
        us = ub[:, t.pidx.reshape(-1)].reshape(B, nbands, cap) \
            * t.valid[None].astype(u.dtype)
        if _interp_impl(B) == "pallas":
            slabs = pallas_interp_T_2d(us, t.i0loc, t.c0, t.w_row, t.w_col,
                                       G2=G2, bh=bh)
            slabs = jnp.swapaxes(slabs, 0, 1)        # (B, nbands, bh+3, G2)
            return _fold_band_slabs(slabs, batch, G1, G2, bh)
        rho = jnp.arange(bh + 3, dtype=jnp.int32)
        cols = jnp.arange(G2, dtype=jnp.int32)

        cc = min(cap, 2048)
        ncc = -(-cap // cc)
        cap_pad = ncc * cc

        def padc(a, fill=0):
            if cap_pad == cap:
                return a
            pads = [(0, 0), (0, cap_pad - cap)] + [(0, 0)] * (a.ndim - 2)
            return jnp.pad(a, pads, constant_values=fill)

        i0loc_c = padc(t.i0loc).reshape(nbands, ncc, cc).swapaxes(0, 1)
        c0_c = padc(t.c0).reshape(nbands, ncc, cc).swapaxes(0, 1)
        wr_c = padc(t.w_row).reshape(nbands, ncc, cc, 4).swapaxes(0, 1)
        wc_c = padc(t.w_col).reshape(nbands, ncc, cc, 4).swapaxes(0, 1)
        # (B, nbands, cap) -> (ncc, nbands, cc, B)
        us_c = jnp.moveaxis(
            padc(jnp.moveaxis(us, 0, -1)).reshape(nbands, ncc, cc, B),
            1, 0)

        dt = u.dtype

        def chunk2(carry, args):
            i0c, c0c, wrc, wcc, uc = args            # uc: (nbands, cc, B)
            s_row = jnp.zeros((nbands, cc, bh + 3), dt)
            s_col = jnp.zeros((nbands, cc, G2), dt)
            for j in range(4):
                s_row = s_row + wrc[..., j].astype(dt)[..., None] * (
                    (i0c + j)[..., None] == rho[None, None, :]).astype(dt)
                s_col = s_col + wcc[..., j].astype(dt)[..., None] * (
                    (c0c + j)[..., None] == cols[None, None, :]).astype(dt)
            sv = s_col[:, :, None, :] * uc[:, :, :, None]  # (nb, cc, B, G2)
            slab = jnp.einsum("bcr,bcBf->bBrf", s_row, sv,
                              precision=jax.lax.Precision.HIGHEST)
            return carry + slab, None

        init = jnp.zeros((nbands, B, bh + 3, G2), dt)
        slabs, _ = jax.lax.scan(chunk2, init,
                                (i0loc_c, c0_c, wr_c, wc_c, us_c))
        return _fold_band_slabs(slabs.swapaxes(0, 1), batch, G1, G2, bh)

    def matvec(self, v, sigmasq, toeplitz: Optional[ToeplitzND] = None):
        """(W K_g W^T + sigma^2 I) v over the trailing point axis."""
        T = toeplitz if toeplitz is not None else self.toeplitz
        Kg = T(self.interp_T(v)).real.astype(v.dtype)
        return self.interp(Kg) + sigmasq * v


jax.tree_util.register_dataclass(
    SKIOperator, data_fields=["idx", "wvals", "toeplitz", "lo", "dx",
                              "banded"],
    meta_fields=["grid_shape"],
)


def _grid_lag_table(kernel, grid_shape, dx):
    """Kernel values on the full lag grid (2 m_t - 1 per dim)."""
    d = len(grid_shape)
    axes = [jnp.arange(-(m - 1), m, dtype=dx.dtype) * dx[t]
            for t, m in enumerate(grid_shape)]
    mesh = jnp.meshgrid(*axes, indexing="ij")
    dist = jnp.sqrt(sum(g * g for g in mesh))
    return kernel.kernel(dist)


def build_ski_operator(x, kernel, grid_size: Tuple[int, ...],
                       grid_bounds) -> SKIOperator:
    """Precompute interpolation stencils + grid-kernel Toeplitz operator.

    The working grid extends the requested bounds by two nodes per side so
    the 4-point cubic stencil never clips for in-bounds data (GPyTorch
    handles this inside GridInterpolationKernel)."""
    x = jnp.asarray(x)
    n, d = x.shape
    rdtype = x.dtype
    los = jnp.asarray([b[0] for b in grid_bounds], rdtype)
    his = jnp.asarray([b[1] for b in grid_bounds], rdtype)
    sizes = np.asarray(grid_size)
    dx = (his - los) / jnp.asarray(sizes - 1, rdtype)
    ext_sizes = tuple(int(m) + 4 for m in sizes)
    lo_ext = los - 2.0 * dx

    t = (x - lo_ext[None, :]) / dx[None, :]
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32) - 1, 0,
                  jnp.asarray([m - 4 for m in ext_sizes]))
    frac = t - jnp.floor(t)
    w1d = _cubic_weights(frac)                   # (n, d, 4)

    # tensor-product stencil: indices and weights over 4^d corners
    strides = np.ones(d, np.int64)
    for tdim in range(d - 2, -1, -1):
        strides[tdim] = strides[tdim + 1] * ext_sizes[tdim + 1]
    strides = jnp.asarray(strides, jnp.int32)
    offsets = np.stack(np.meshgrid(*([np.arange(4)] * d), indexing="ij"),
                       -1).reshape(-1, d)        # (4^d, d)
    offsets_j = jnp.asarray(offsets, jnp.int32)
    corner = i0[:, None, :] + offsets_j[None, :, :]          # (n, 4^d, d)
    idx = jnp.sum(corner * strides[None, None, :], axis=-1)  # (n, 4^d)
    wv = jnp.ones((n, offsets.shape[0]), rdtype)
    for tdim in range(d):
        wv = wv * w1d[:, tdim, :][:, offsets[:, tdim]]

    toeplitz = make_toeplitz(
        _grid_lag_table(kernel, ext_sizes, dx).astype(
            jnp.complex64 if rdtype == jnp.float32 else jnp.complex128))
    banded = None
    if d == 2 and not isinstance(x, jax.core.Tracer):
        banded = _plan_banded_interp(np.asarray(i0), np.asarray(w1d),
                                     ext_sizes[0])
        # clustered data blows up the static per-band cap (all points in
        # few bands); past 4x slot waste the dense-band formulations lose
        # to plain scatter/gather — drop the tables (cf. the data-free
        # subproblem scheduling that solved this for the NUFFT spread,
        # ops/spread_banded.sub_nufft1_2d)
        nbands, cap = banded.pidx.shape
        if nbands * cap > 4 * max(n, 1):
            banded = None
    return SKIOperator(idx=idx, wvals=wv, toeplitz=toeplitz,
                       grid_shape=ext_sizes, lo=lo_ext, dx=dx,
                       banded=banded)


# ---------------------------------------------------------------------------
# training-step math (jitted)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cg_tol", "max_cg_iter", "trace_samples",
                                   "slq_probes", "slq_steps", "grid_shape"))
def _ski_loss_and_grad(idx, wvals, banded, x, y, kernel, sigmasq, key, *,
                       grid_shape, dx, cg_tol, max_cg_iter, trace_samples,
                       slq_probes, slq_steps):
    """One MLL evaluation + gradient wrt (hypers..., noise).

    grad_theta NLL = 0.5 (tr(K^-1 dK) - alpha^T dK alpha), Hutchinson trace
    with ``trace_samples`` probes, all solves in one batched PCG.
    """
    n = y.shape[0]
    rdtype = y.dtype
    op = SKIOperator(idx=idx, wvals=wvals, toeplitz=None,
                     grid_shape=grid_shape, lo=None, dx=dx, banded=banded)
    lag = _grid_lag_table(kernel, grid_shape, dx)
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    T = make_toeplitz(lag.astype(cdtype))

    A = lambda v: op.matvec(v, sigmasq, T)
    Z = (jax.random.bernoulli(key, 0.5, (trace_samples, n)) * 2 - 1
         ).astype(rdtype)
    B = jnp.concatenate([y[None, :], Z], axis=0)
    sol = pcg(A, B, tol=cg_tol, maxiter=max_cg_iter)
    alpha = sol.x[0]
    U = sol.x[1:]

    # dK_g wrt each kernel hyper via forward-mode through the lag table
    hypers = kernel.hyper_names
    def lag_of(vec):
        return _grid_lag_table(kernel.with_hypers(vec), grid_shape, dx)
    dlags = jax.jacfwd(lag_of)(kernel.hyper_vector())  # (*lag_shape, H)

    def quad_form(a, b, dlag):
        """a^T W dK_g W^T b."""
        Td = make_toeplitz(dlag.astype(cdtype))
        return jnp.sum(a * op.interp(Td(op.interp_T(b)).real.astype(rdtype)))

    grads = []
    for i in range(len(hypers)):
        dlag = dlags[..., i]
        t_quad = quad_form(alpha, alpha, dlag)
        t_trace = jnp.mean(jax.vmap(
            lambda u, z: quad_form(u, z, dlag))(U, Z))
        grads.append(0.5 * (t_trace - t_quad))
    # noise: dK = I
    t_trace_noise = jnp.mean(jnp.sum(U * Z, axis=1))
    grads.append(0.5 * (t_trace_noise - jnp.sum(alpha * alpha)))
    grad = jnp.stack(grads)

    # loss via SLQ on the grid operator is not available (K is in point
    # space); use Lanczos SLQ on A directly with data-space probes
    def Av_feat(v):
        return A(v)
    from ..ops.slq import lanczos_tridiag
    zq = (jax.random.bernoulli(jax.random.fold_in(key, 3), 0.5,
                               (slq_probes, n)) * 2 - 1).astype(rdtype)
    znorm = jnp.sqrt(jnp.sum(zq * zq, axis=-1))
    q0 = zq / znorm[:, None]
    alphas_l, betas_l = lanczos_tridiag(Av_feat, q0, slq_steps)
    Tm = (jnp.zeros((slq_probes, slq_steps, slq_steps), rdtype)
          .at[:, jnp.arange(slq_steps), jnp.arange(slq_steps)].set(alphas_l))
    if slq_steps > 1:
        i2 = jnp.arange(slq_steps - 1)
        Tm = Tm.at[:, i2, i2 + 1].set(betas_l[:, :-1])
        Tm = Tm.at[:, i2 + 1, i2].set(betas_l[:, :-1])
    evals, evecs = jnp.linalg.eigh(Tm)
    evals = jnp.maximum(evals, 1e-18)
    w1 = evecs[:, 0, :]
    logdet = jnp.mean(jnp.sum(w1**2 * jnp.log(evals), axis=-1) * znorm**2)
    nll = 0.5 * (jnp.sum(y * alpha) + logdet + n * jnp.log(2 * jnp.pi))
    return nll / n, grad / n, sol.iters, alpha


def _rss_gb():
    try:
        import psutil
        return psutil.Process().memory_info().rss / (1024 ** 3)
    except Exception:
        return None


def fit_ski_gp(x, y, *, kernel="SE", grid_size=None,
               target_grid_points: int = 32_768, grid_bounds=None,
               max_iters: int = 50, lr: float = 0.05,
               noise_floor: float = 1e-4, dtype=jnp.float32,
               max_train_n: Optional[int] = None, subsample_seed: int = 0,
               init_lengthscale: Optional[float] = None,
               init_outputscale: Optional[float] = None,
               init_noise: Optional[float] = None,
               cg_tolerance: float = 1e-3, max_cg_iterations: int = 100,
               max_lanczos_quadrature_iterations: int = 10,
               num_trace_samples: int = 2, slq_probes: int = 8,
               verbose: bool = True, key=None) -> Dict[str, Any]:
    """Fit the SKI GP and return training logs (reference fit_ski_gp,
    utils/ski.py:181-401; same defaults where they transfer)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64).reshape(-1)
    if x.ndim != 2:
        raise ValueError(f"x must have shape (N, d), got {x.shape}")
    if x.shape[0] != y.shape[0]:
        raise ValueError("x and y must have matching first dims, got "
                         f"{x.shape[0]} and {y.shape[0]}")
    if max_iters < 1:
        raise ValueError("max_iters must be >= 1")
    total_n = x.shape[0]
    train_indices = None
    if max_train_n is not None and total_n > max_train_n:
        rng = np.random.default_rng(subsample_seed)
        train_indices = np.sort(rng.permutation(total_n)[:max_train_n])
        x, y = x[train_indices], y[train_indices]

    kname = _canonical_kernel(kernel)
    if not isinstance(kernel, str):       # seed inits from the instance
        if init_lengthscale is None:
            init_lengthscale = float(np.asarray(kernel.lengthscale))
        if init_outputscale is None:
            init_outputscale = float(np.asarray(kernel.variance))
    d = x.shape[1]
    bounds = resolve_grid_bounds(x, grid_bounds)
    sizes = resolve_grid_size(grid_size=grid_size, num_dims=d,
                              target_grid_points=target_grid_points,
                              grid_bounds=bounds)

    x_t = jnp.asarray(x, dtype)
    y_t = jnp.asarray(y, dtype)
    if key is None:
        key = jax.random.PRNGKey(subsample_seed)

    l0 = init_lengthscale if init_lengthscale is not None else \
        0.2 * max(hi - lo for lo, hi in bounds)
    v0 = init_outputscale if init_outputscale is not None else float(np.var(y))
    n0 = max(init_noise if init_noise is not None else 0.1 * float(np.var(y)),
             noise_floor)
    template = make_kernel({"se": "SE", "matern32": "Matern32",
                            "matern52": "Matern52"}[kname], dimension=d)
    raw = jnp.log(jnp.asarray([l0, v0, n0], dtype))
    tx = optax.adam(lr)
    opt_state = tx.init(raw)

    # stencils are hyper-independent: build once
    op = build_ski_operator(x_t, template.with_hypers(jnp.exp(raw)), sizes,
                            bounds)

    @jax.jit
    def adam_step(raw, opt_state, grad_pos):
        grad_raw = grad_pos * jnp.exp(raw)
        updates, opt_state = tx.update(grad_raw, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        raw = raw.at[-1].set(jnp.maximum(raw[-1], jnp.log(noise_floor)))
        return raw, opt_state

    history = {k: [] for k in ("iteration", "loss", "lengthscale",
                               "outputscale", "noise", "forward_sec",
                               "backward_sec", "elapsed_sec", "rss_gb",
                               "cg_iters")}
    best = (np.inf, None, None)
    start = time.time()
    alpha = None
    for it in range(max_iters):
        t0 = time.time()
        pos = jnp.exp(raw)
        kern = template.with_hypers(pos)
        nll, grad, iters, alpha = _ski_loss_and_grad(
            op.idx, op.wvals, op.banded, x_t, y_t, kern, pos[-1],
            jax.random.fold_in(key, it), grid_shape=op.grid_shape, dx=op.dx,
            cg_tol=cg_tolerance, max_cg_iter=max_cg_iterations,
            trace_samples=num_trace_samples, slq_probes=slq_probes,
            slq_steps=max_lanczos_quadrature_iterations)
        fwd_sec = time.time() - t0
        t0 = time.time()
        raw, opt_state = adam_step(raw, opt_state, grad)
        bwd_sec = time.time() - t0

        loss_v = float(nll)
        pos_h = np.exp(np.asarray(raw))
        history["iteration"].append(it + 1)
        history["loss"].append(loss_v)
        history["lengthscale"].append(float(pos_h[0]))
        history["outputscale"].append(float(pos_h[1]))
        history["noise"].append(float(pos_h[2]))
        history["forward_sec"].append(fwd_sec)
        history["backward_sec"].append(bwd_sec)
        history["elapsed_sec"].append(time.time() - start)
        history["rss_gb"].append(_rss_gb())
        history["cg_iters"].append(int(iters))
        if loss_v < best[0]:
            best = (loss_v, np.asarray(raw).copy(), it + 1)
        if verbose:
            print(f"[SKI] iter {it+1:>3}/{max_iters}  loss={loss_v:.6g}  "
                  f"ls={pos_h[0]:.6g}  os={pos_h[1]:.6g}  "
                  f"noise={pos_h[2]:.6g}  cg={int(iters)}")

    if best[1] is not None:
        raw = jnp.asarray(best[1])
    pos = jnp.exp(raw)
    kern = template.with_hypers(pos)
    # final mean solve at best hypers
    lag = _grid_lag_table(kern, op.grid_shape, op.dx)
    cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    T_final = make_toeplitz(lag.astype(cdtype))
    res = pcg(lambda v: op.matvec(v, pos[-1], T_final), y_t,
              tol=cg_tolerance, maxiter=10 * max_cg_iterations)

    return {
        "model": {"kernel": kern, "raw": raw, "alpha": res.x,
                  "operator": op, "toeplitz": T_final},
        "history": history,
        "train_x": x_t, "train_y": y_t, "train_indices": train_indices,
        "num_train": int(x_t.shape[0]), "num_total": int(total_n),
        "grid_size": sizes, "grid_bounds": bounds,
        "best_iteration": best[2], "best_loss": best[0],
        "dtype": str(np.dtype(np.float32 if dtype == jnp.float32
                              else np.float64)),
        "fit_time_sec": time.time() - start,
        "settings": {"kernel": kname, "lr": lr, "noise_floor": noise_floor,
                     "cg_tolerance": cg_tolerance,
                     "max_cg_iterations": max_cg_iterations,
                     "num_trace_samples": num_trace_samples},
    }


def _point_stencils(op: SKIOperator, x_new, dtype):
    """Cubic-interpolation stencils (idx, weights) for new points on the
    fitted operator's extended grid (same construction as
    build_ski_operator)."""
    x_new = jnp.asarray(x_new, dtype)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    d = x_new.shape[1]
    t = (x_new - op.lo[None, :]) / op.dx[None, :]
    ext_sizes = op.grid_shape
    i0 = jnp.clip(jnp.floor(t).astype(jnp.int32) - 1, 0,
                  jnp.asarray([m - 4 for m in ext_sizes]))
    frac = t - jnp.floor(t)
    w1d = _cubic_weights(frac)
    strides = np.ones(d, np.int64)
    for tdim in range(d - 2, -1, -1):
        strides[tdim] = strides[tdim + 1] * ext_sizes[tdim + 1]
    offsets = np.stack(np.meshgrid(*([np.arange(4)] * d), indexing="ij"),
                       -1).reshape(-1, d)
    corner = i0[:, None, :] + jnp.asarray(offsets, jnp.int32)[None, :, :]
    idx = jnp.sum(corner * jnp.asarray(strides, jnp.int32)[None, None, :],
                  axis=-1)
    wv = jnp.ones((x_new.shape[0], offsets.shape[0]), dtype)
    for tdim in range(d):
        wv = wv * w1d[:, tdim, :][:, offsets[:, tdim]]
    return idx, wv


def ski_predict_mean(fit: Dict[str, Any], x_new) -> jnp.ndarray:
    """Predictive mean w(x*)^T K_g W^T alpha using the fitted stencils."""
    op: SKIOperator = fit["model"]["operator"]
    alpha = fit["model"]["alpha"]
    T = fit["model"]["toeplitz"]
    idx, wv = _point_stencils(op, x_new, alpha.dtype)
    g = T(op.interp_T(alpha)).real.astype(alpha.dtype)   # K_g W^T alpha
    return jnp.sum(jnp.take(g, idx, axis=-1) * wv, axis=-1)


def ski_predict_var(fit: Dict[str, Any], x_new, *, batch_size: int = 256,
                    cg_tol: float = 1e-6,
                    max_cg_iter: int = 1000) -> jnp.ndarray:
    """Exact-CG predictive variance under the SKI approximation:

        var(x*) = k(0) - k_*^T (W K_g W^T + sigma^2 I)^{-1} k_*,
        k_*     = W K_g w_*                       (SKI cross-covariance),

    microbatched over targets with one batched PCG per chunk — the same
    pattern as EFGP's 'regular' estimator (gpquad/models/efgp.py).  The
    reference gets this from gpytorch's returned SKI model
    (reference utils/ski.py:152-178 + gpytorch predictions)."""
    op: SKIOperator = fit["model"]["operator"]
    kern = fit["model"]["kernel"]
    raw = fit["model"]["raw"]
    T = fit["model"]["toeplitz"]
    rdtype = fit["model"]["alpha"].dtype
    sigmasq = jnp.exp(raw)[-1]
    k0 = kern.kernel(jnp.zeros((), rdtype)).astype(rdtype)

    x_new = jnp.asarray(x_new, rdtype)
    if x_new.ndim == 1:
        x_new = x_new[:, None]
    n_new = x_new.shape[0]
    b = min(int(batch_size), n_new)
    pad = (-n_new) % b
    xp = jnp.concatenate([x_new, jnp.broadcast_to(x_new[:1],
                                                  (pad, x_new.shape[1]))]
                         ) if pad else x_new

    # T and the stencil arrays enter as jit ARGUMENTS (pytrees), not
    # closure constants: the axon TPU runtime rejects large eager complex
    # constants embedded in compiled programs
    @jax.jit
    def chunk_var(xc, op, T, sigmasq, k0):
        idx, wv = _point_stencils(op, xc, rdtype)
        # W_*^T rows scattered onto the grid: (b, M)
        u = jnp.zeros((xc.shape[0], op.M), rdtype)
        u = u.at[jnp.arange(xc.shape[0])[:, None], idx].add(wv)
        kstar = op.interp(T(u).real.astype(rdtype))      # (b, n)
        sol = pcg(lambda v: op.matvec(v, sigmasq, T), kstar,
                  tol=cg_tol, maxiter=max_cg_iter)
        return jnp.maximum(k0 - jnp.sum(kstar * sol.x, axis=-1), 0.0)

    out = [chunk_var(jax.lax.dynamic_slice_in_dim(xp, s, b), op, T,
                     sigmasq, k0)
           for s in range(0, n_new + pad, b)]
    return jnp.concatenate(out)[:n_new]
