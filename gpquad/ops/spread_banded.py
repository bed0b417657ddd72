"""Banded (scatter-free) ES-kernel spreading for TPU.

XLA scatter throughput (~1e8 updates/s) makes the classical spread NUFFT
scatter-bound on TPU.  This module reformulates spreading as dense work:

  1. sort points by the fine-grid ROW BAND their stencil starts in
     (device argsort; bands of height BH >= w rows);
  2. per band, evaluate the separable ES kernel DENSELY: a (cap, BH+w-1)
     row-kernel block (sublane axis) and a (cap, nf) column-kernel block
     (the w nonzeros per row land wherever the point sits — dense
     evaluation over all nf columns handles periodic wrap for free);
  3. one MXU matmul per band, S_row^T @ (diag(v) S_col), accumulates the
     band's (BH+w-1, nf) slab; halo rows fold into the next band by a
     roll + reshape (no scatter anywhere);
  4. interpolation (type-2) is the exact transpose: gather band rows,
     matmul, masked row-sum.

Cost: bands * cap * nf kernel evals + (BH+w) * cap * nf MACs — MXU/VPU
dense work, independent of mtot beyond the fine-grid FFT.  ``band_cap``
(max points per band, a static shape) comes from a host bincount when
points are concrete, or is passed explicitly under an outer jit.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from .spread_nufft import _deconv_factors, _fine_size

__all__ = ["banded_plan_cap", "banded_nufft1_2d", "banded_nufft2_2d",
           "BandedNUFFT", "banded_plan_cap_3d", "banded_nufft1_3d",
           "banded_nufft2_3d", "BandedNUFFT3D", "sub_nsub_2d",
           "sub_nufft1_2d", "sub_nufft2_2d", "SubNUFFT", "sub_nsub_3d",
           "sub_nufft1_3d", "sub_nufft2_3d", "SubNUFFT3D"]


def _geometry(mtot: int, w: int):
    nf = _fine_size(mtot)
    bh = 8
    while bh < w:          # band height must divide nf (a power of two)
        bh *= 2
    nbands = nf // bh
    return nf, bh, nbands


def banded_plan_cap(x, h, mtot: int, w: int = 8, slack: float = 1.25) -> int:
    """Host-side: max band occupancy (rounded up) for concrete points."""
    nf, bh, nbands = _geometry(mtot, w)
    xh = np.asarray(x)
    t = xh[:, 0] * float(h)
    g = (t - np.floor(t)) * nf
    r0 = np.mod(np.ceil(g - 0.5 * w).astype(np.int64), nf)
    occ = np.bincount(r0 // bh, minlength=nbands)
    cap = int(occ.max())
    return max(8, int(math.ceil(cap * slack / 8.0)) * 8)


def _fine_coords(x, h, nf: int):
    """Fine-grid coordinates g = frac(x h) nf as a compensated (hi, lo) pair.

    A single f32 quantizes the position to ~nf * 2^-24 ~ 2.4e-4 grid units
    at nf=4096; with the ES kernel's slope (~2 beta / w) that costs ~1e-3
    in every kernel weight.  The Dekker two-product recovers the product's
    low bits and the pair keeps them: downstream distances are computed as
    (g_hi - integer) + g_lo, where the first subtraction is exact
    (Sterbenz) and nf (a power of two) scales both halves exactly."""
    rdtype = x.dtype
    h = jnp.asarray(h, rdtype)
    p = x * h
    c = jnp.asarray(4097.0, rdtype)                  # 2^12 + 1 split
    x_big = x * c
    x_hi = x_big - (x_big - x)
    x_lo = x - x_hi
    h_big = h * c
    h_hi = h_big - (h_big - h)
    h_lo = h - h_hi
    err = (((x_hi * h_hi - p) + x_hi * h_lo) + x_lo * h_hi) + x_lo * h_lo
    u0 = p - jnp.floor(p)                            # exact
    return u0 * nf, err * nf                         # both scalings exact


def _es_dense(dist, w: int, beta: float):
    t = 2.0 * dist / w
    inside = jnp.abs(t) < 1.0
    t = jnp.where(inside, t, 0.0)
    return jnp.where(inside,
                     jnp.exp(beta * (jnp.sqrt(1.0 - t * t) - 1.0)), 0.0)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cap"))
def banded_nufft1_2d(x, vals, h, *, mtot: int, w: int = 8, cap: int = 1024):
    """Type-1 (isign=-1) spread NUFFT with banded dense spreading."""
    beta = 2.30 * w
    nf, bh, nbands = _geometry(mtot, w)
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128

    g, glo = _fine_coords(x, h, nf)                  # (N, 2) pairs
    gx, gy = g[:, 0], g[:, 1]
    gxl, gyl = glo[:, 0], glo[:, 1]
    r0 = jnp.mod(jnp.ceil(gx - 0.5 * w).astype(jnp.int32), nf)
    band = r0 // bh
    order = jnp.argsort(band)
    band_sorted = band[order]
    starts = jnp.searchsorted(band_sorted, jnp.arange(nbands + 1),
                              side="left")

    # (nbands, cap) gather table into the sorted order; padding -> idx n
    offs = starts[:-1, None] + jnp.arange(cap)[None, :]
    valid = offs < starts[1:, None]
    table = jnp.where(valid, jnp.clip(offs, 0, n - 1), 0)
    pidx = jnp.take(order, table)                    # original point index

    gxs = jnp.take(gx, pidx)                         # (nbands, cap)
    gys = jnp.take(gy, pidx)
    gxls = jnp.take(gxl, pidx)
    gyls = jnp.take(gyl, pidx)
    r0s = jnp.take(r0, pidx)
    vs = jnp.take(vals.astype(cdtype), pidx) * valid.astype(rdtype)
    # overflow guard: points beyond the static cap would silently drop;
    # poison the output with NaN instead so the contract violation is loud
    # (plan caps with banded_plan_cap / make_nufft's facade planning)
    overflow = jnp.max(starts[1:] - starts[:-1]) > cap
    vs = vs * jnp.where(overflow, jnp.nan, 1.0).astype(rdtype)

    rho = jnp.arange(bh + w - 1, dtype=rdtype)
    band_base = (jnp.arange(nbands) * bh).astype(rdtype)
    cols = jnp.arange(nf, dtype=rdtype)

    # chunk the cap axis: the dense (nbands, cap, nf) column-kernel block
    # would blow HBM when bands are imbalanced (concentrated data); a scan
    # keeps memory at (nbands, cc, nf) while accumulating the slabs
    cc = min(cap, 512)
    ncc = -(-cap // cc)
    cap_pad = ncc * cc

    def padc(a):
        return jnp.pad(a, ((0, 0), (0, cap_pad - cap))) if cap_pad > cap             else a

    gxs_c = padc(gxs).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gys_c = padc(gys).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gxls_c = padc(gxls).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gyls_c = padc(gyls).reshape(nbands, ncc, cc).swapaxes(0, 1)
    r0s_c = padc(r0s).reshape(nbands, ncc, cc).swapaxes(0, 1)
    vs_c = padc(vs).reshape(nbands, ncc, cc).swapaxes(0, 1)

    def chunk_slab(carry, args):
        gxc, gyc, gxlc, gylc, r0c, vc = args
        # row kernel over local band rows rho = 0..bh+w-2 (absolute row =
        # band*bh + rho); frac_x keeps the distance local even when the
        # stencil start wrapped past nf
        frac_x = (gxc - jnp.ceil(gxc - 0.5 * w)) + gxlc
        local_r0 = r0c.astype(rdtype) - band_base[:, None]
        dist_row = (local_r0[..., None] + frac_x[..., None]
                    - rho[None, None, :])            # (nbands, cc, bh+w-1)
        s_row = _es_dense(dist_row, w, beta)
        # column kernel densely over all nf columns, periodic distance
        dcol = (gyc[..., None] - cols[None, None, :]) + gylc[..., None]
        dcol = dcol - nf * jnp.round(dcol / nf)
        s_col = _es_dense(dcol, w, beta)             # (nbands, cc, nf)
        sv = s_col.astype(cdtype) * vc[..., None]
        # HIGHEST: TPU einsum otherwise runs bf16 MXU passes (~1e-3 error)
        return carry + jnp.einsum("bcr,bcf->brf", s_row.astype(cdtype), sv,
                                  precision=jax.lax.Precision.HIGHEST), None

    init = jnp.zeros((nbands, bh + w - 1, nf), cdtype)
    slabs, _ = jax.lax.scan(chunk_slab, init,
                            (gxs_c, gys_c, gxls_c, gyls_c, r0s_c, vs_c))
    # fold halos: rows bh..bh+w-2 of band b are rows 0..w-2 of band b+1
    core = slabs[:, :bh, :]
    halo = slabs[:, bh:, :]                          # (nbands, w-1, nf)
    halo = jnp.roll(halo, 1, axis=0)                 # wraps last band to 0
    pad = jnp.zeros((nbands, bh - (w - 1), nf), core.dtype)
    fine = (core + jnp.concatenate([halo, pad], axis=1)
            ).reshape(nf, nf)

    U = jnp.fft.fftn(fine)
    kidx = jnp.arange(-m, m + 1) % nf
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    return U[jnp.ix_(kidx, kidx)] * (cf[:, None] * cf[None, :]).astype(
        U.dtype)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cap"))
def banded_nufft2_2d(x, fk, h, *, mtot: int, w: int = 8, cap: int = 1024):
    """Type-2 (isign=+1) interp NUFFT: exact adjoint of the banded spread."""
    beta = 2.30 * w
    nf, bh, nbands = _geometry(mtot, w)
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128

    f = fk.reshape(mtot, mtot).astype(cdtype)
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    fd = f * (cf[:, None] * cf[None, :]).astype(cdtype)
    kidx = jnp.arange(-m, m + 1) % nf
    F = jnp.zeros((nf, nf), cdtype).at[jnp.ix_(kidx, kidx)].set(fd)
    u = jnp.fft.ifftn(F) * (nf * nf)

    g, glo = _fine_coords(x, h, nf)
    gx, gy = g[:, 0], g[:, 1]
    gxl, gyl = glo[:, 0], glo[:, 1]
    r0 = jnp.mod(jnp.ceil(gx - 0.5 * w).astype(jnp.int32), nf)
    band = r0 // bh
    order = jnp.argsort(band)
    band_sorted = band[order]
    starts = jnp.searchsorted(band_sorted, jnp.arange(nbands + 1),
                              side="left")
    offs = starts[:-1, None] + jnp.arange(cap)[None, :]
    valid = offs < starts[1:, None]
    table = jnp.where(valid, jnp.clip(offs, 0, n - 1), 0)
    pidx = jnp.take(order, table)

    gxs = jnp.take(gx, pidx)
    gys = jnp.take(gy, pidx)
    gxls = jnp.take(gxl, pidx)
    gyls = jnp.take(gyl, pidx)
    r0s = jnp.take(r0, pidx)

    rho = jnp.arange(bh + w - 1, dtype=rdtype)
    band_base = (jnp.arange(nbands) * bh).astype(rdtype)
    cols = jnp.arange(nf, dtype=rdtype)
    # band row slab: rows band*bh .. band*bh+bh+w-2 (mod nf)
    row_ids = (band_base[:, None].astype(jnp.int32)
               + jnp.arange(bh + w - 1)[None, :]) % nf  # (nbands, bh+w-1)
    u_band = jnp.take(u, row_ids.reshape(-1), axis=0).reshape(
        nbands, bh + w - 1, nf)

    cc = min(cap, 512)
    ncc = -(-cap // cc)
    cap_pad = ncc * cc

    def padc(a):
        return jnp.pad(a, ((0, 0), (0, cap_pad - cap))) if cap_pad > cap             else a

    gxs_c = padc(gxs).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gys_c = padc(gys).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gxls_c = padc(gxls).reshape(nbands, ncc, cc).swapaxes(0, 1)
    gyls_c = padc(gyls).reshape(nbands, ncc, cc).swapaxes(0, 1)
    r0s_c = padc(r0s).reshape(nbands, ncc, cc).swapaxes(0, 1)

    def chunk_out(_, args):
        gxc, gyc, gxlc, gylc, r0c = args
        frac_x = (gxc - jnp.ceil(gxc - 0.5 * w)) + gxlc
        local_r0 = r0c.astype(rdtype) - band_base[:, None]
        dist_row = (local_r0[..., None] + frac_x[..., None]
                    - rho[None, None, :])
        s_row = _es_dense(dist_row, w, beta)
        dcol = (gyc[..., None] - cols[None, None, :]) + gylc[..., None]
        dcol = dcol - nf * jnp.round(dcol / nf)
        s_col = _es_dense(dcol, w, beta)
        tband = jnp.einsum("bcr,brf->bcf", s_row.astype(cdtype), u_band,
                           precision=jax.lax.Precision.HIGHEST)
        return None, jnp.sum(tband * s_col.astype(cdtype), axis=-1)

    _, out_chunks = jax.lax.scan(chunk_out, None,
                                 (gxs_c, gys_c, gxls_c, gyls_c, r0s_c))
    # (ncc, nbands, cc) -> (nbands, cap)
    out_sorted = out_chunks.swapaxes(0, 1).reshape(nbands, cap_pad)[:, :cap]

    # route back to original point order (points were only gathered)
    out = jnp.zeros((n,), cdtype)
    out = out.at[pidx.reshape(-1)].add(
        jnp.where(valid, out_sorted, 0.0).reshape(-1))
    overflow = jnp.max(starts[1:] - starts[:-1]) > cap
    return out * jnp.where(overflow, jnp.nan, 1.0).astype(rdtype)


# --------------------------------------------------------------------------
# Subproblem scheduling: adaptive occupancy with fully static shapes
#
# The (band, cap) tables above process EVERY band at the maximum
# occupancy: concentrated data (real point clouds; any config with
# h * range < 1, where points only reach a fraction of the fine grid)
# wastes compute proportional to cap / mean-occupancy.  The subproblem
# scheme instead walks the SORTED point list in fixed chunks of ``cc``
# points that never cross a band boundary: band b contributes
# ceil(occ_b / cc) subproblems, so the total is bounded by
# n/cc + nbands — a STATIC bound needing no host planning at all.  Each
# subproblem computes the same dense (R, nf) slab as a band would; slabs
# land in their band accumulator via one coarse scatter-add per scan
# step (nsub * R * nf elements total — ~R/cc of the dense work, vs the
# per-point scatter the banded design exists to avoid).  This is the
# adaptive answer to clustered data (FINUFFT's GPU "subproblem" binning
# plays the same role; reference reaches it through finufft,
# efgpnd.py:1496-1548).
# --------------------------------------------------------------------------


def _sub_counts(starts, cc: int, nsub: int):
    """Per-subproblem (band id, point offset) from band start offsets.

    ``starts``: (nbands+1,) sorted-order band starts.  Subproblem s of
    band b covers sorted points [starts[b] + j*cc, ...) for local chunk
    j; padded subproblems (beyond the actual total) get zero points."""
    occ = starts[1:] - starts[:-1]
    nsub_b = -(-occ // cc)                           # ceil, 0 for empty
    csum = jnp.cumsum(nsub_b)                        # inclusive
    sids = jnp.arange(nsub)
    band = jnp.searchsorted(csum, sids, side="right")
    nbands = occ.shape[0]
    band = jnp.clip(band, 0, nbands - 1)
    prev = jnp.where(band > 0, jnp.take(csum, band - 1), 0)
    local = sids - prev                              # chunk index in band
    offset = jnp.take(starts[:-1], band) + local * cc
    live = sids < csum[-1]
    return band, offset, live


def sub_nsub_2d(n: int, mtot: int, w: int = 8, cc: int = 256) -> int:
    """Static subproblem bound for d=2: nbands + ceil(n/cc)."""
    _, _, nbands = _geometry(mtot, w)
    return nbands + -(-n // cc)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cc", "sc"))
def sub_nufft1_2d(x, vals, h, *, mtot: int, w: int = 8, cc: int = 256,
                  sc: int = 32):
    """Type-1 (isign=-1) banded spread NUFFT, subproblem-scheduled:
    cost adapts to occupancy (no static per-band cap), all shapes static
    from (n, mtot) alone."""
    beta = 2.30 * w
    nf, bh, nbands = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    nsub = sub_nsub_2d(n, mtot, w, cc)
    nsc = -(-nsub // sc)
    nsub_pad = nsc * sc

    g, glo = _fine_coords(x, h, nf)
    gx, gy = g[:, 0], g[:, 1]
    gxl, gyl = glo[:, 0], glo[:, 1]
    r0 = jnp.mod(jnp.ceil(gx - 0.5 * w).astype(jnp.int32), nf)
    band = r0 // bh
    order = jnp.argsort(band)
    band_sorted = band[order]
    starts = jnp.searchsorted(band_sorted, jnp.arange(nbands + 1),
                              side="left")
    sub_band, sub_off, live = _sub_counts(starts, cc, nsub_pad)

    # (nsub_pad, cc) gather tables
    offs = sub_off[:, None] + jnp.arange(cc)[None, :]
    lim = jnp.take(starts[1:], sub_band)
    valid = (offs < lim[:, None]) & live[:, None]
    pidx = jnp.take(order, jnp.where(valid, jnp.clip(offs, 0, n - 1), 0))

    gxs = jnp.take(gx, pidx)
    gys = jnp.take(gy, pidx)
    gxls = jnp.take(gxl, pidx)
    gyls = jnp.take(gyl, pidx)
    r0s = jnp.take(r0, pidx)
    vs = jnp.take(vals.astype(cdtype), pidx) * valid.astype(rdtype)

    rho = jnp.arange(R, dtype=rdtype)
    cols = jnp.arange(nf, dtype=rdtype)
    sub_base = (sub_band * bh).astype(rdtype)

    def chunk(a):
        return a.reshape(nsc, sc, *a.shape[1:])

    def step(acc, args):
        gxc, gyc, gxlc, gylc, r0c, vc, basec, bidc = args
        frac_x = (gxc - jnp.ceil(gxc - 0.5 * w)) + gxlc
        local_r0 = r0c.astype(rdtype) - basec[:, None]
        dist_row = (local_r0[..., None] + frac_x[..., None]
                    - rho[None, None, :])            # (sc, cc, R)
        s_row = _es_dense(dist_row, w, beta)
        dcol = (gyc[..., None] - cols[None, None, :]) + gylc[..., None]
        dcol = dcol - nf * jnp.round(dcol / nf)
        s_col = _es_dense(dcol, w, beta)             # (sc, cc, nf)
        sv = s_col.astype(cdtype) * vc[..., None]
        slab = jnp.einsum("scr,scf->srf", s_row.astype(cdtype), sv,
                          precision=jax.lax.Precision.HIGHEST)
        return acc.at[bidc].add(slab), None

    acc0 = jnp.zeros((nbands, R, nf), cdtype)
    acc, _ = jax.lax.scan(step, acc0,
                          (chunk(gxs), chunk(gys), chunk(gxls),
                           chunk(gyls), chunk(r0s), chunk(vs),
                           chunk(sub_base), chunk(sub_band)))

    core = acc[:, :bh, :]
    halo = jnp.roll(acc[:, bh:, :], 1, axis=0)
    pad = jnp.zeros((nbands, bh - (w - 1), nf), core.dtype)
    fine = (core + jnp.concatenate([halo, pad], axis=1)).reshape(nf, nf)

    U = jnp.fft.fftn(fine)
    kidx = jnp.arange(-m, m + 1) % nf
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    return U[jnp.ix_(kidx, kidx)] * (cf[:, None] * cf[None, :]).astype(
        U.dtype)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cc", "sc"))
def sub_nufft2_2d(x, fk, h, *, mtot: int, w: int = 8, cc: int = 256,
                  sc: int = 32):
    """Type-2 (isign=+1) subproblem-scheduled interp: exact adjoint of
    :func:`sub_nufft1_2d`."""
    beta = 2.30 * w
    nf, bh, nbands = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    nsub = sub_nsub_2d(n, mtot, w, cc)
    nsc = -(-nsub // sc)
    nsub_pad = nsc * sc

    f = fk.reshape(mtot, mtot).astype(cdtype)
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    fd = f * (cf[:, None] * cf[None, :]).astype(cdtype)
    kidx = jnp.arange(-m, m + 1) % nf
    F = jnp.zeros((nf, nf), cdtype).at[jnp.ix_(kidx, kidx)].set(fd)
    u = jnp.fft.ifftn(F) * (nf * nf)
    row_ids = (jnp.arange(nbands)[:, None] * bh
               + jnp.arange(R)[None, :]) % nf
    u_bands = u[row_ids]                             # (nbands, R, nf)

    g, glo = _fine_coords(x, h, nf)
    gx, gy = g[:, 0], g[:, 1]
    gxl, gyl = glo[:, 0], glo[:, 1]
    r0 = jnp.mod(jnp.ceil(gx - 0.5 * w).astype(jnp.int32), nf)
    band = r0 // bh
    order = jnp.argsort(band)
    band_sorted = band[order]
    starts = jnp.searchsorted(band_sorted, jnp.arange(nbands + 1),
                              side="left")
    sub_band, sub_off, live = _sub_counts(starts, cc, nsub_pad)
    offs = sub_off[:, None] + jnp.arange(cc)[None, :]
    lim = jnp.take(starts[1:], sub_band)
    valid = (offs < lim[:, None]) & live[:, None]
    pidx = jnp.take(order, jnp.where(valid, jnp.clip(offs, 0, n - 1), 0))

    gxs = jnp.take(gx, pidx)
    gys = jnp.take(gy, pidx)
    gxls = jnp.take(gxl, pidx)
    gyls = jnp.take(gyl, pidx)
    r0s = jnp.take(r0, pidx)

    rho = jnp.arange(R, dtype=rdtype)
    cols = jnp.arange(nf, dtype=rdtype)
    sub_base = (sub_band * bh).astype(rdtype)

    def chunk(a):
        return a.reshape(nsc, sc, *a.shape[1:])

    def step(_, args):
        gxc, gyc, gxlc, gylc, r0c, basec, bidc = args
        frac_x = (gxc - jnp.ceil(gxc - 0.5 * w)) + gxlc
        local_r0 = r0c.astype(rdtype) - basec[:, None]
        dist_row = (local_r0[..., None] + frac_x[..., None]
                    - rho[None, None, :])
        s_row = _es_dense(dist_row, w, beta)
        dcol = (gyc[..., None] - cols[None, None, :]) + gylc[..., None]
        dcol = dcol - nf * jnp.round(dcol / nf)
        s_col = _es_dense(dcol, w, beta)
        ub = u_bands[bidc]                           # (sc, R, nf)
        tband = jnp.einsum("scr,srf->scf", s_row.astype(cdtype), ub,
                           precision=jax.lax.Precision.HIGHEST)
        return None, jnp.sum(tband * s_col.astype(cdtype), axis=-1)

    _, out_chunks = jax.lax.scan(step, None,
                                 (chunk(gxs), chunk(gys), chunk(gxls),
                                  chunk(gyls), chunk(r0s),
                                  chunk(sub_base), chunk(sub_band)))
    out_sorted = out_chunks.reshape(nsub_pad, cc)

    out = jnp.zeros((n,), cdtype)
    return out.at[pidx.reshape(-1)].add(
        jnp.where(valid, out_sorted, 0.0).reshape(-1))


# --------------------------------------------------------------------------
# d = 3: tile in (x, y), dense column kernel in z
#
# The d=2 trick (dense kernel over ALL fine columns => no scatter, wrap for
# free) generalizes: points sort into (bh x bh) fine-grid TILES in (x, y);
# per tile the separable ES kernel is evaluated as a (cap, R) x-row block,
# a (cap, R) y-row block (R = bh + w - 1, both local to the tile), and a
# (cap, nf) dense z block.  One MXU contraction per tile,
#   slab[rs, z] += (s_x (x) s_y)[c, rs] * (s_z * v)[c, z],
# accumulates a (R, R, nf) tile slab; x/y halos fold into neighbor tiles
# by rolls (no scatter anywhere).  The z axis is chunked (static zc) so the
# transient slab stays ~1e8 B at any nf.  Fills FINUFFT's d=3 role
# (reference efgpnd.py:1496-1548) with MXU dense work.
# --------------------------------------------------------------------------


def banded_plan_cap_3d(x, h, mtot: int, w: int = 8,
                       slack: float = 1.25) -> int:
    """Host-side: max (x, y)-tile occupancy (rounded up) for concrete
    points."""
    nf, bh, nb = _geometry(mtot, w)
    xh = np.asarray(x)
    caps = []
    for t in range(2):
        tt = xh[:, t] * float(h)
        g = (tt - np.floor(tt)) * nf
        r0 = np.mod(np.ceil(g - 0.5 * w).astype(np.int64), nf)
        caps.append(r0 // bh)
    occ = np.bincount(caps[0] * nb + caps[1], minlength=nb * nb)
    cap = int(occ.max())
    return max(8, int(math.ceil(cap * slack / 8.0)) * 8)


def _tile_tables_3d(x, h, nf: int, bh: int, nb: int, w: int, cap: int):
    """Sort points into (x, y) tiles; gather tables + fine coords."""
    n = x.shape[0]
    g, glo = _fine_coords(x, h, nf)
    r0x = jnp.mod(jnp.ceil(g[:, 0] - 0.5 * w).astype(jnp.int32), nf)
    r0y = jnp.mod(jnp.ceil(g[:, 1] - 0.5 * w).astype(jnp.int32), nf)
    tile = (r0x // bh) * nb + (r0y // bh)
    order = jnp.argsort(tile)
    tile_sorted = tile[order]
    starts = jnp.searchsorted(tile_sorted, jnp.arange(nb * nb + 1),
                              side="left")
    offs = starts[:-1, None] + jnp.arange(cap)[None, :]
    valid = offs < starts[1:, None]
    table = jnp.where(valid, jnp.clip(offs, 0, n - 1), 0)
    pidx = jnp.take(order, table)                    # (ntiles, cap)
    overflow = jnp.max(starts[1:] - starts[:-1]) > cap

    def take(a):
        return jnp.take(a, pidx)

    gs = tuple(take(g[:, t]) for t in range(3))
    gls = tuple(take(glo[:, t]) for t in range(3))
    return pidx, valid, overflow, gs, gls, (take(r0x), take(r0y))


def _plan_chunks_3d(nf: int, nb: int, R: int, cap: int):
    """Static (cap-chunk, z-chunk) sizes bounding the transient slab and
    dense-z blocks to ~1.3e8 B."""
    ntiles = nb * nb
    zc = max(16, min(nf, (128 << 20) // max(1, ntiles * R * R * 8)))
    while nf % zc != 0:
        zc //= 2
    zc = max(zc, 16) if nf % max(zc, 16) == 0 else zc
    cc = max(8, min(cap, (64 << 20) // max(1, ntiles * nf * 4)))
    cc = min(cap, max(8, (cc // 8) * 8))
    ncc = -(-cap // cc)
    return cc, ncc, zc, nf // zc


def _xy_kernel_blocks(gxc, gyc, gxlc, gylc, r0xc, r0yc, base_x, base_y,
                      rho, w: int, beta: float, rdtype):
    """Separable local (tile-relative) x/y ES blocks -> (tiles, cc, R, R)."""
    frac_x = (gxc - jnp.ceil(gxc - 0.5 * w)) + gxlc
    frac_y = (gyc - jnp.ceil(gyc - 0.5 * w)) + gylc
    lx = r0xc.astype(rdtype) - base_x[:, None]
    ly = r0yc.astype(rdtype) - base_y[:, None]
    dist_x = lx[..., None] + frac_x[..., None] - rho[None, None, :]
    dist_y = ly[..., None] + frac_y[..., None] - rho[None, None, :]
    s_x = _es_dense(dist_x, w, beta)                 # (ntiles, cc, R)
    s_y = _es_dense(dist_y, w, beta)
    return s_x[..., :, None] * s_y[..., None, :]     # (ntiles, cc, R, R)


def _fold_xy(slabs, nb: int, bh: int, R: int, w: int, zc: int):
    """Fold x/y halo rows of (nb, nb, R, R, zc) tile slabs into their
    +1-neighbor tiles (wrap) -> the (nf, nf, zc) fine-grid z-slice."""
    core = slabs[:, :, :bh]
    halo = jnp.roll(slabs[:, :, bh:], 1, axis=0)
    pad = jnp.zeros((nb, nb, bh - (w - 1), R, zc), slabs.dtype)
    s = core + jnp.concatenate([halo, pad], axis=2)  # (nb, nb, bh, R, zc)
    core = s[:, :, :, :bh]
    halo = jnp.roll(s[:, :, :, bh:], 1, axis=1)
    pad = jnp.zeros((nb, nb, bh, bh - (w - 1), zc), slabs.dtype)
    s = core + jnp.concatenate([halo, pad], axis=3)  # (nb, nb, bh, bh, zc)
    nf = nb * bh
    return s.transpose(0, 2, 1, 3, 4).reshape(nf, nf, zc)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cap"))
def banded_nufft1_3d(x, vals, h, *, mtot: int, w: int = 8, cap: int = 256):
    """Type-1 (isign=-1) d=3 spread NUFFT with banded dense spreading."""
    beta = 2.30 * w
    nf, bh, nb = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    ntiles = nb * nb

    pidx, valid, overflow, gs, gls, r0s = _tile_tables_3d(
        x, h, nf, bh, nb, w, cap)
    vs = jnp.take(vals.astype(cdtype), pidx) * valid.astype(rdtype)
    vs = vs * jnp.where(overflow, jnp.nan, 1.0).astype(rdtype)

    rho = jnp.arange(R, dtype=rdtype)
    tids = jnp.arange(ntiles)
    base_x = ((tids // nb) * bh).astype(rdtype)
    base_y = ((tids % nb) * bh).astype(rdtype)

    cc, ncc, zc, nzc = _plan_chunks_3d(nf, nb, R, cap)
    cap_pad = ncc * cc

    def padc(a):
        return (jnp.pad(a, ((0, 0), (0, cap_pad - cap)))
                if cap_pad > cap else a)

    def chunked(a):
        return padc(a).reshape(ntiles, ncc, cc).swapaxes(0, 1)

    gxs_c, gys_c, gzs_c = (chunked(a) for a in gs)
    gxls_c, gyls_c, gzls_c = (chunked(a) for a in gls)
    r0x_c, r0y_c = chunked(r0s[0]), chunked(r0s[1])
    vs_c = chunked(vs)

    def z_step(_, z0):
        zcols = z0 + jnp.arange(zc, dtype=rdtype)

        def cap_step(carry, args):
            gxc, gyc, gzc, gxlc, gylc, gzlc, rxc, ryc, vc = args
            s_xy = _xy_kernel_blocks(gxc, gyc, gxlc, gylc, rxc, ryc,
                                     base_x, base_y, rho, w, beta, rdtype)
            s_xy = s_xy.reshape(ntiles, cc, R * R)
            dz = (gzc[..., None] - zcols[None, None, :]) + gzlc[..., None]
            dz = dz - nf * jnp.round(dz / nf)
            s_z = _es_dense(dz, w, beta)             # (ntiles, cc, zc)
            sv = s_z.astype(cdtype) * vc[..., None]
            return carry + jnp.einsum(
                "bcp,bcz->bpz", s_xy.astype(cdtype), sv,
                precision=jax.lax.Precision.HIGHEST), None

        init = jnp.zeros((ntiles, R * R, zc), cdtype)
        slab, _ = jax.lax.scan(cap_step, init,
                               (gxs_c, gys_c, gzs_c, gxls_c, gyls_c,
                                gzls_c, r0x_c, r0y_c, vs_c))
        slab = slab.reshape(nb, nb, R, R, zc)
        return None, _fold_xy(slab, nb, bh, R, w, zc)

    _, slices = jax.lax.scan(
        z_step, None, jnp.arange(nzc, dtype=rdtype) * zc)
    fine = slices.transpose(1, 2, 0, 3).reshape(nf, nf, nf)

    U = jnp.fft.fftn(fine)
    kidx = jnp.arange(-m, m + 1) % nf
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    return U[jnp.ix_(kidx, kidx, kidx)] * (
        cf[:, None, None] * cf[None, :, None] * cf[None, None, :]
    ).astype(U.dtype)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cap"))
def banded_nufft2_3d(x, fk, h, *, mtot: int, w: int = 8, cap: int = 256):
    """Type-2 (isign=+1) d=3 interp NUFFT: exact adjoint of the banded
    spread."""
    beta = 2.30 * w
    nf, bh, nb = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    ntiles = nb * nb

    f = fk.reshape(mtot, mtot, mtot).astype(cdtype)
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    fd = f * (cf[:, None, None] * cf[None, :, None]
              * cf[None, None, :]).astype(cdtype)
    kidx = jnp.arange(-m, m + 1) % nf
    F = jnp.zeros((nf, nf, nf), cdtype).at[
        jnp.ix_(kidx, kidx, kidx)].set(fd)
    u = jnp.fft.ifftn(F) * (nf ** 3)

    pidx, valid, overflow, gs, gls, r0s = _tile_tables_3d(
        x, h, nf, bh, nb, w, cap)

    rho = jnp.arange(R, dtype=rdtype)
    tids = jnp.arange(ntiles)
    base_x = ((tids // nb) * bh).astype(rdtype)
    base_y = ((tids % nb) * bh).astype(rdtype)
    rows_x = ((tids // nb) * bh)[:, None] + jnp.arange(R)[None, :]
    rows_y = ((tids % nb) * bh)[:, None] + jnp.arange(R)[None, :]
    rows_x, rows_y = rows_x % nf, rows_y % nf       # (ntiles, R)

    cc, ncc, zc, nzc = _plan_chunks_3d(nf, nb, R, cap)
    cap_pad = ncc * cc

    def padc(a):
        return (jnp.pad(a, ((0, 0), (0, cap_pad - cap)))
                if cap_pad > cap else a)

    def chunked(a):
        return padc(a).reshape(ntiles, ncc, cc).swapaxes(0, 1)

    gxs_c, gys_c, gzs_c = (chunked(a) for a in gs)
    gxls_c, gyls_c, gzls_c = (chunked(a) for a in gls)
    r0x_c, r0y_c = chunked(r0s[0]), chunked(r0s[1])

    def z_step(_, z0):
        zcols = z0.astype(rdtype) + jnp.arange(zc, dtype=rdtype)
        u_z = jax.lax.dynamic_slice_in_dim(u, z0, zc, axis=2)
        a = u_z[rows_x]                              # (ntiles, R, nf, zc)
        u_t = jnp.take_along_axis(
            a, rows_y[:, None, :, None], axis=2)     # (ntiles, R, R, zc)
        u_t = u_t.reshape(ntiles, R * R, zc)

        def cap_step(_, args):
            gxc, gyc, gzc, gxlc, gylc, gzlc, rxc, ryc = args
            s_xy = _xy_kernel_blocks(gxc, gyc, gxlc, gylc, rxc, ryc,
                                     base_x, base_y, rho, w, beta, rdtype)
            s_xy = s_xy.reshape(ntiles, cc, R * R)
            tband = jnp.einsum("bcp,bpz->bcz", s_xy.astype(cdtype), u_t,
                               precision=jax.lax.Precision.HIGHEST)
            dz = (gzc[..., None] - zcols[None, None, :]) + gzlc[..., None]
            dz = dz - nf * jnp.round(dz / nf)
            s_z = _es_dense(dz, w, beta)
            return None, jnp.sum(tband * s_z.astype(cdtype), axis=-1)

        _, oc = jax.lax.scan(cap_step, None,
                             (gxs_c, gys_c, gzs_c, gxls_c, gyls_c,
                              gzls_c, r0x_c, r0y_c))
        return None, oc                              # (ncc, ntiles, cc)

    _, parts = jax.lax.scan(z_step, None,
                            jnp.arange(nzc, dtype=jnp.int32) * zc)
    out_sorted = jnp.sum(parts, axis=0)              # (ncc, ntiles, cc)
    out_sorted = out_sorted.swapaxes(0, 1).reshape(
        ntiles, cap_pad)[:, :cap]

    out = jnp.zeros((n,), cdtype)
    out = out.at[pidx.reshape(-1)].add(
        jnp.where(valid, out_sorted, 0.0).reshape(-1))
    return out * jnp.where(overflow, jnp.nan, 1.0).astype(rdtype)


# --------------------------------------------------------------------------
# d = 3 subproblem scheduling: the d=2 trick over (x, y) TILES
#
# Points sort into the (nb x nb) fine-grid tiles of the banded d=3 design
# and each tile's occupancy splits into fixed cc-point subproblems that
# never cross a tile boundary — the data-free static bound is
# ntiles + ceil(n/cc), so clustered data pays ~n/cc MXU contractions, not
# ntiles * cap, and no host cap planning is needed (works with traced
# points under jit).  Fills FINUFFT's GPU d=3 "subproblem" binning role
# (reference reaches it through finufft, efgpnd.py:1496-1548).
# --------------------------------------------------------------------------


def sub_nsub_3d(n: int, mtot: int, w: int = 8, cc: int = 128) -> int:
    """Static subproblem bound for d=3: ntiles + ceil(n/cc)."""
    _, _, nb = _geometry(mtot, w)
    return nb * nb + -(-n // cc)


def _plan_zc_3d(nf: int, nb: int, R: int):
    """Static z-chunk bounding the (ntiles, R*R, zc) slab to ~1.3e8 B."""
    ntiles = nb * nb
    zc = max(16, min(nf, (128 << 20) // max(1, ntiles * R * R * 8)))
    while nf % zc != 0:
        zc //= 2
    zc = max(zc, 16) if nf % max(zc, 16) == 0 else zc
    return zc, nf // zc


def _sub_tables_3d(x, h, nf: int, bh: int, nb: int, w: int, cc: int,
                   nsub_pad: int):
    """Sort points into (x, y) tiles, split occupancy into cc-point
    subproblems; returns per-subproblem gather tables."""
    n = x.shape[0]
    g, glo = _fine_coords(x, h, nf)
    r0x = jnp.mod(jnp.ceil(g[:, 0] - 0.5 * w).astype(jnp.int32), nf)
    r0y = jnp.mod(jnp.ceil(g[:, 1] - 0.5 * w).astype(jnp.int32), nf)
    tile = (r0x // bh) * nb + (r0y // bh)
    order = jnp.argsort(tile)
    starts = jnp.searchsorted(tile[order], jnp.arange(nb * nb + 1),
                              side="left")
    sub_tile, sub_off, live = _sub_counts(starts, cc, nsub_pad)
    offs = sub_off[:, None] + jnp.arange(cc)[None, :]
    lim = jnp.take(starts[1:], sub_tile)
    valid = (offs < lim[:, None]) & live[:, None]
    pidx = jnp.take(order, jnp.where(valid, jnp.clip(offs, 0, n - 1), 0))

    def take(a):
        return jnp.take(a, pidx)

    gs = tuple(take(g[:, t]) for t in range(3))
    gls = tuple(take(glo[:, t]) for t in range(3))
    return pidx, valid, sub_tile, gs, gls, (take(r0x), take(r0y))


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cc", "sc"))
def sub_nufft1_3d(x, vals, h, *, mtot: int, w: int = 8, cc: int = 128,
                  sc: int = 8):
    """Type-1 (isign=-1) d=3 spread NUFFT, subproblem-scheduled: cost
    adapts to (x, y)-tile occupancy, all shapes static from (n, mtot)."""
    beta = 2.30 * w
    nf, bh, nb = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    ntiles = nb * nb
    nsub = sub_nsub_3d(x.shape[0], mtot, w, cc)
    nsc = -(-nsub // sc)
    nsub_pad = nsc * sc

    pidx, valid, sub_tile, gs, gls, r0s = _sub_tables_3d(
        x, h, nf, bh, nb, w, cc, nsub_pad)
    vs = jnp.take(vals.astype(cdtype), pidx) * valid.astype(rdtype)

    rho = jnp.arange(R, dtype=rdtype)
    base_x = ((sub_tile // nb) * bh).astype(rdtype)
    base_y = ((sub_tile % nb) * bh).astype(rdtype)
    zc, nzc = _plan_zc_3d(nf, nb, R)

    def chunk(a):
        return a.reshape(nsc, sc, *a.shape[1:])

    xs = (chunk(gs[0]), chunk(gs[1]), chunk(gs[2]), chunk(gls[0]),
          chunk(gls[1]), chunk(gls[2]), chunk(r0s[0]), chunk(r0s[1]),
          chunk(vs), chunk(base_x), chunk(base_y), chunk(sub_tile))

    def z_step(_, z0):
        zcols = z0 + jnp.arange(zc, dtype=rdtype)

        def step(acc, args):
            (gxc, gyc, gzc, gxlc, gylc, gzlc, rxc, ryc, vc, bxc, byc,
             tidc) = args
            s_xy = _xy_kernel_blocks(gxc, gyc, gxlc, gylc, rxc, ryc,
                                     bxc, byc, rho, w, beta, rdtype)
            s_xy = s_xy.reshape(sc, cc, R * R)
            dz = (gzc[..., None] - zcols[None, None, :]) + gzlc[..., None]
            dz = dz - nf * jnp.round(dz / nf)
            s_z = _es_dense(dz, w, beta)             # (sc, cc, zc)
            sv = s_z.astype(cdtype) * vc[..., None]
            slab = jnp.einsum("scp,scz->spz", s_xy.astype(cdtype), sv,
                              precision=jax.lax.Precision.HIGHEST)
            return acc.at[tidc].add(slab), None

        acc0 = jnp.zeros((ntiles, R * R, zc), cdtype)
        acc, _ = jax.lax.scan(step, acc0, xs)
        return None, _fold_xy(acc.reshape(nb, nb, R, R, zc), nb, bh, R,
                              w, zc)

    _, slices = jax.lax.scan(
        z_step, None, jnp.arange(nzc, dtype=rdtype) * zc)
    fine = slices.transpose(1, 2, 0, 3).reshape(nf, nf, nf)

    U = jnp.fft.fftn(fine)
    kidx = jnp.arange(-m, m + 1) % nf
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    return U[jnp.ix_(kidx, kidx, kidx)] * (
        cf[:, None, None] * cf[None, :, None] * cf[None, None, :]
    ).astype(U.dtype)


@functools.partial(jax.jit, static_argnames=("mtot", "w", "cc", "sc"))
def sub_nufft2_3d(x, fk, h, *, mtot: int, w: int = 8, cc: int = 128,
                  sc: int = 8):
    """Type-2 (isign=+1) d=3 subproblem-scheduled interp: exact adjoint
    of :func:`sub_nufft1_3d`."""
    beta = 2.30 * w
    nf, bh, nb = _geometry(mtot, w)
    R = bh + w - 1
    m = (mtot - 1) // 2
    n = x.shape[0]
    rdtype = x.dtype
    cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
    nsub = sub_nsub_3d(n, mtot, w, cc)
    nsc = -(-nsub // sc)
    nsub_pad = nsc * sc

    f = fk.reshape(mtot, mtot, mtot).astype(cdtype)
    cf = jnp.asarray(_deconv_factors(mtot, nf, w, beta), rdtype)
    fd = f * (cf[:, None, None] * cf[None, :, None]
              * cf[None, None, :]).astype(cdtype)
    kidx = jnp.arange(-m, m + 1) % nf
    F = jnp.zeros((nf, nf, nf), cdtype).at[
        jnp.ix_(kidx, kidx, kidx)].set(fd)
    u = jnp.fft.ifftn(F) * (nf ** 3)

    pidx, valid, sub_tile, gs, gls, r0s = _sub_tables_3d(
        x, h, nf, bh, nb, w, cc, nsub_pad)

    rho = jnp.arange(R, dtype=rdtype)
    base_x = ((sub_tile // nb) * bh).astype(rdtype)
    base_y = ((sub_tile % nb) * bh).astype(rdtype)
    rows_x = (((sub_tile // nb) * bh)[:, None]
              + jnp.arange(R)[None, :]) % nf         # (nsub_pad, R)
    rows_y = (((sub_tile % nb) * bh)[:, None]
              + jnp.arange(R)[None, :]) % nf
    zc, nzc = _plan_zc_3d(nf, nb, R)

    def chunk(a):
        return a.reshape(nsc, sc, *a.shape[1:])

    xs = (chunk(gs[0]), chunk(gs[1]), chunk(gs[2]), chunk(gls[0]),
          chunk(gls[1]), chunk(gls[2]), chunk(r0s[0]), chunk(r0s[1]),
          chunk(base_x), chunk(base_y), chunk(rows_x), chunk(rows_y))

    def z_step(_, z0):
        zcols = z0.astype(rdtype) + jnp.arange(zc, dtype=rdtype)
        u_z = jax.lax.dynamic_slice_in_dim(u, z0, zc, axis=2)

        def step(_, args):
            (gxc, gyc, gzc, gxlc, gylc, gzlc, rxc, ryc, bxc, byc,
             rwx, rwy) = args
            a = u_z[rwx]                             # (sc, R, nf, zc)
            u_t = jnp.take_along_axis(
                a, rwy[:, None, :, None], axis=2)    # (sc, R, R, zc)
            u_t = u_t.reshape(sc, R * R, zc)
            s_xy = _xy_kernel_blocks(gxc, gyc, gxlc, gylc, rxc, ryc,
                                     bxc, byc, rho, w, beta, rdtype)
            s_xy = s_xy.reshape(sc, cc, R * R)
            tband = jnp.einsum("scp,spz->scz", s_xy.astype(cdtype), u_t,
                               precision=jax.lax.Precision.HIGHEST)
            dz = (gzc[..., None] - zcols[None, None, :]) + gzlc[..., None]
            dz = dz - nf * jnp.round(dz / nf)
            s_z = _es_dense(dz, w, beta)
            return None, jnp.sum(tband * s_z.astype(cdtype), axis=-1)

        _, oc = jax.lax.scan(step, None, xs)
        return None, oc                              # (nsc, sc, cc)

    _, parts = jax.lax.scan(z_step, None,
                            jnp.arange(nzc, dtype=jnp.int32) * zc)
    out_sorted = jnp.sum(parts, axis=0).reshape(nsub_pad, cc)

    out = jnp.zeros((n,), cdtype)
    return out.at[pidx.reshape(-1)].add(
        jnp.where(valid, out_sorted, 0.0).reshape(-1))


@dataclasses.dataclass(frozen=True)
class BandedNUFFT:
    """Banded spread/interp NUFFT with the ops/nufft.NUFFT interface.

    The fastest backend at large mtot (where the MXU phase matrices stop
    fitting HBM): cost is fine-grid FFT + dense band matmuls, independent
    of mtot beyond the FFT.  d=2, symmetric mode ordering, fixed static
    band cap (plan with :func:`banded_plan_cap`; overflow NaN-poisons).
    Fills the role FINUFFT plays in the reference (efgpnd.py:1496-1548).
    """
    x: jnp.ndarray
    h: jnp.ndarray
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    w: int = dataclasses.field(metadata={"static": True}, default=8)
    cap: int = dataclasses.field(metadata={"static": True}, default=1024)

    @property
    def d(self) -> int:
        return 2

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def type1(self, vals: jnp.ndarray) -> jnp.ndarray:
        if vals.ndim == 1:
            return banded_nufft1_2d(self.x, vals, self.h, mtot=self.mtot,
                                    w=self.w, cap=self.cap)
        flat = vals.reshape((-1, vals.shape[-1]))
        out = jax.vmap(lambda v: banded_nufft1_2d(
            self.x, v, self.h, mtot=self.mtot, w=self.w, cap=self.cap))(flat)
        return out.reshape(vals.shape[:-1] + (self.mtot, self.mtot))

    def type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        M = self.mtot ** 2
        shape_block = (self.mtot, self.mtot)
        if fk.shape == (M,) or fk.shape == shape_block:
            return banded_nufft2_2d(self.x, fk.reshape(-1), self.h,
                                    mtot=self.mtot, w=self.w, cap=self.cap)
        lead = fk.shape[:fk.ndim - 1] if fk.shape[-1] == M else \
            fk.shape[:fk.ndim - 2]
        flat = fk.reshape((-1, M))
        out = jax.vmap(lambda f: banded_nufft2_2d(
            self.x, f, self.h, mtot=self.mtot, w=self.w, cap=self.cap))(flat)
        return out.reshape(lead + (self.n,))


jax.tree_util.register_dataclass(
    BandedNUFFT, data_fields=["x", "h"], meta_fields=["mtot", "w", "cap"]
)


@dataclasses.dataclass(frozen=True)
class SubNUFFT:
    """Subproblem-scheduled banded NUFFT with the ops/nufft.NUFFT
    interface (d=2, symmetric mode ordering).

    Same band algebra as :class:`BandedNUFFT` but work is scheduled in
    fixed ``cc``-point chunks that never cross a band boundary, so cost
    adapts to occupancy (clustered data pays n/cc, not nbands*cap) and
    planning is DATA-FREE: the subproblem bound nbands + ceil(n/cc)
    depends only on static (n, mtot) — no host cap, fully usable under
    jit with traced points.  Fills FINUFFT's adaptive GPU "subproblem"
    binning role (reference reaches it through finufft,
    efgpnd.py:1496-1548)."""
    x: jnp.ndarray
    h: jnp.ndarray
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    w: int = dataclasses.field(metadata={"static": True}, default=8)
    cc: int = dataclasses.field(metadata={"static": True}, default=256)
    sc: int = dataclasses.field(metadata={"static": True}, default=32)

    @property
    def d(self) -> int:
        return 2

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def type1(self, vals: jnp.ndarray) -> jnp.ndarray:
        if vals.ndim == 1:
            return sub_nufft1_2d(self.x, vals, self.h, mtot=self.mtot,
                                 w=self.w, cc=self.cc, sc=self.sc)
        flat = vals.reshape((-1, vals.shape[-1]))
        out = jax.vmap(lambda v: sub_nufft1_2d(
            self.x, v, self.h, mtot=self.mtot, w=self.w, cc=self.cc,
            sc=self.sc))(flat)
        return out.reshape(vals.shape[:-1] + (self.mtot, self.mtot))

    def type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        M = self.mtot ** 2
        shape_block = (self.mtot, self.mtot)
        if fk.shape == (M,) or fk.shape == shape_block:
            return sub_nufft2_2d(self.x, fk.reshape(-1), self.h,
                                 mtot=self.mtot, w=self.w, cc=self.cc,
                                 sc=self.sc)
        lead = fk.shape[:fk.ndim - 1] if fk.shape[-1] == M else \
            fk.shape[:fk.ndim - 2]
        flat = fk.reshape((-1, M))
        out = jax.vmap(lambda f: sub_nufft2_2d(
            self.x, f, self.h, mtot=self.mtot, w=self.w, cc=self.cc,
            sc=self.sc))(flat)
        return out.reshape(lead + (self.n,))


jax.tree_util.register_dataclass(
    SubNUFFT, data_fields=["x", "h"], meta_fields=["mtot", "w", "cc", "sc"]
)


@dataclasses.dataclass(frozen=True)
class BandedNUFFT3D:
    """d=3 banded spread/interp NUFFT ((x, y)-tiled, dense z) with the
    ops/nufft.NUFFT interface.  Symmetric mode ordering, static tile cap
    (plan with :func:`banded_plan_cap_3d`; overflow NaN-poisons)."""
    x: jnp.ndarray
    h: jnp.ndarray
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    w: int = dataclasses.field(metadata={"static": True}, default=8)
    cap: int = dataclasses.field(metadata={"static": True}, default=256)

    @property
    def d(self) -> int:
        return 3

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def type1(self, vals: jnp.ndarray) -> jnp.ndarray:
        if vals.ndim == 1:
            return banded_nufft1_3d(self.x, vals, self.h, mtot=self.mtot,
                                    w=self.w, cap=self.cap)
        flat = vals.reshape((-1, vals.shape[-1]))
        out = jax.vmap(lambda v: banded_nufft1_3d(
            self.x, v, self.h, mtot=self.mtot, w=self.w, cap=self.cap))(flat)
        return out.reshape(vals.shape[:-1] + (self.mtot,) * 3)

    def type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        M = self.mtot ** 3
        shape_block = (self.mtot,) * 3
        if fk.shape == (M,) or fk.shape == shape_block:
            return banded_nufft2_3d(self.x, fk.reshape(-1), self.h,
                                    mtot=self.mtot, w=self.w, cap=self.cap)
        lead = fk.shape[:fk.ndim - 1] if fk.shape[-1] == M else \
            fk.shape[:fk.ndim - 3]
        flat = fk.reshape((-1, M))
        out = jax.vmap(lambda f: banded_nufft2_3d(
            self.x, f, self.h, mtot=self.mtot, w=self.w, cap=self.cap))(flat)
        return out.reshape(lead + (self.n,))


jax.tree_util.register_dataclass(
    BandedNUFFT3D, data_fields=["x", "h"], meta_fields=["mtot", "w", "cap"]
)


@dataclasses.dataclass(frozen=True)
class SubNUFFT3D:
    """d=3 subproblem-scheduled banded NUFFT with the ops/nufft.NUFFT
    interface (symmetric mode ordering).  Data-free static planning:
    ntiles + ceil(n/cc) subproblems from (n, mtot) alone — no host cap,
    fully usable under jit with traced points."""
    x: jnp.ndarray
    h: jnp.ndarray
    mtot: int = dataclasses.field(metadata={"static": True}, default=0)
    w: int = dataclasses.field(metadata={"static": True}, default=8)
    cc: int = dataclasses.field(metadata={"static": True}, default=128)
    sc: int = dataclasses.field(metadata={"static": True}, default=8)

    @property
    def d(self) -> int:
        return 3

    @property
    def n(self) -> int:
        return self.x.shape[0]

    def type1(self, vals: jnp.ndarray) -> jnp.ndarray:
        if vals.ndim == 1:
            return sub_nufft1_3d(self.x, vals, self.h, mtot=self.mtot,
                                 w=self.w, cc=self.cc, sc=self.sc)
        flat = vals.reshape((-1, vals.shape[-1]))
        out = jax.vmap(lambda v: sub_nufft1_3d(
            self.x, v, self.h, mtot=self.mtot, w=self.w, cc=self.cc,
            sc=self.sc))(flat)
        return out.reshape(vals.shape[:-1] + (self.mtot,) * 3)

    def type2(self, fk: jnp.ndarray) -> jnp.ndarray:
        M = self.mtot ** 3
        shape_block = (self.mtot,) * 3
        if fk.shape == (M,) or fk.shape == shape_block:
            return sub_nufft2_3d(self.x, fk.reshape(-1), self.h,
                                 mtot=self.mtot, w=self.w, cc=self.cc,
                                 sc=self.sc)
        lead = fk.shape[:fk.ndim - 1] if fk.shape[-1] == M else \
            fk.shape[:fk.ndim - 3]
        flat = fk.reshape((-1, M))
        out = jax.vmap(lambda f: sub_nufft2_3d(
            self.x, f, self.h, mtot=self.mtot, w=self.w, cc=self.cc,
            sc=self.sc))(flat)
        return out.reshape(lead + (self.n,))


jax.tree_util.register_dataclass(
    SubNUFFT3D, data_fields=["x", "h"], meta_fields=["mtot", "w", "cc", "sc"]
)
