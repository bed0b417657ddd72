"""Pallas bin-sorted transpose-interpolation (SKI W^T, d=2).

``W^T u`` (points -> grid, 4x4 cubic stencils) is SKI's hot op: it runs
inside every CG iteration (reference fit_ski_gp solves, utils/ski.py:181-401,
via GPyTorch's InterpolatedLazyTensor._t_matmul scatter).  XLA lowers the
scatter-add at ~1e8 updates/s (51 ms at n=2e5); the banded-dense rewrite in
models/ski.py gets ~29 ms but materializes per-chunk one-hot column
selectors in HBM.  This kernel keeps everything in VMEM:

  per (row-band, column-tile, point-chunk) grid step:
    A^T[r, p] = w_row[p, r - i0loc[p]]     one-hot row selector  (rows, cc)
    Wc[p, c]  = w_col[p, c - c0[p]]        one-hot col selector  (cc, tw)
    slab[b]  += (A^T * u_b) @ Wc           MXU matmul            (rows, tw)

so HBM traffic is one read of the sorted point tables plus one write of the
band slabs — the one-hot selectors never leave VMEM.  The host-side band
plan (sort points by stencil base row, pad to a static cap) is shared with
the banded-dense path (models/ski.py _plan_banded_interp).

Runs in interpreter mode off-TPU so the CPU suite tests it exactly.
Measured on v5e (n=2e5, 512^2 grid, B=4): full SKI matvec 50 ms Pallas
vs 73 ms banded-einsum vs ~150 ms scatter+gather; the forward kernel
carries the win (40 vs 64 ms), the transpose wins at every batch once
the batch tile stacks into one MXU matmul (B=4: 30.5 vs 32.6 ms;
B=200: 115.7 vs 203.5 ms einsum).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_interp_T_2d", "pallas_interp_2d"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _batch_tile(B: int, bb_max: int = 16) -> tuple[int, int]:
    """Pick a batch tile: the whole batch when small (block dim == array
    dim satisfies Mosaic), else a multiple-of-8 tile so VMEM blocks do
    not scale with B (B=200 CG batches blow the 16 MB scoped-vmem limit
    otherwise)."""
    if B <= bb_max:
        return B, 1
    bb = bb_max
    return bb, -(-B // bb)


def _interp_T_kernel(i0_ref, c0_ref, wr_ref, wc_ref, us_ref, out_ref, *,
                     tw: int):
    """One (band, batch-tile, col-tile, point-chunk) step; accumulates
    over point chunks (innermost grid axis)."""
    rows = out_ref.shape[2]
    cc = i0_ref.shape[2]
    dt = out_ref.dtype
    i0 = i0_ref[0, 0, :]
    c0 = c0_ref[0, 0, :]

    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, cc), 0)
    At = jnp.zeros((rows, cc), dt)
    for j in range(4):
        At = At + wr_ref[0, j, :][None, :].astype(dt) * (
            riota == (i0 + j)[None, :]).astype(dt)

    col0 = pl.program_id(2) * tw
    ciota = col0 + jax.lax.broadcasted_iota(jnp.int32, (cc, tw), 1)
    Wc = jnp.zeros((cc, tw), dt)
    for j in range(4):
        Wc = Wc + wc_ref[0, j, :][:, None].astype(dt) * (
            ciota == (c0 + j)[:, None]).astype(dt)

    # full-precision accumulate: Pallas dots default to bf16-level without
    # HIGHEST (see ops/pallas_nufft.py)
    dot = functools.partial(jnp.dot, preferred_element_type=dt,
                            precision=jax.lax.Precision.HIGHEST)
    # stack the batch into ONE (bb*rows, cc) x (cc, tw) matmul: the
    # per-lane (rows, cc) dot uses only ~rows (<16) of the MXU's 128
    # result rows, which is why the einsum path used to win at CG-variance
    # batches (B=200); stacking restores full MXU occupancy and builds
    # the one-hot selectors once per batch TILE instead of once per lane
    bb = us_ref.shape[1]
    S = (us_ref[0, :, :].astype(dt)[:, None, :]
         * At[None, :, :]).reshape(bb * rows, cc)
    slab = dot(S, Wc).reshape(1, bb, rows, tw)

    @pl.when(pl.program_id(3) == 0)
    def _():
        out_ref[...] = slab

    @pl.when(pl.program_id(3) > 0)
    def _():
        out_ref[...] += slab


@functools.partial(jax.jit, static_argnames=("G2", "bh", "cc", "interpret"))
def pallas_interp_T_2d(us, i0loc, c0, w_row, w_col, *, G2: int,
                       bh: int, cc: int = 512,
                       interpret: bool | None = None):
    """Band slabs of ``W^T u`` for d=2 cubic interpolation.

    ``us``: (B, nbands, cap) point values gathered in band order and
    zeroed where invalid; ``i0loc``: (nbands, cap) int32 local stencil
    base row in [0, bh) (may be negative/out-of-range for padded entries —
    they carry zero ``us``); ``c0``: (nbands, cap) int32 global stencil
    base column; ``w_row``/``w_col``: (nbands, cap, 4) cubic weights.

    Returns slabs (nbands, B, bh+3, G2): per-band core rows plus a 3-row
    halo that the caller folds into the next band (models/ski.py).
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, nbands, cap = us.shape
    rows = bh + 3
    dt = us.dtype

    ncc = -(-cap // cc)
    cap_pad = ncc * cc
    tw = min(512, -(-G2 // 128) * 128)
    nct = -(-G2 // tw)
    g2_pad = nct * tw
    bb, nbt = _batch_tile(B)
    b_pad = bb * nbt

    def padc(a, fill=0):
        if cap_pad == cap:
            return a
        pads = [(0, 0), (0, cap_pad - cap)] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, pads, constant_values=fill)

    # singleton middle axis: Mosaic requires the block's last-two dims to
    # divide (8, 128) or equal the array dims — (1, cc) on (nbands, cap)
    # fails, (1, 1, cc) on (nbands, 1, cap) is legal
    i0_p = padc(i0loc.astype(jnp.int32), fill=-8)[:, None, :]
    c0_p = padc(c0.astype(jnp.int32), fill=-8)[:, None, :]
    wr_p = jnp.moveaxis(padc(w_row), -1, 1).astype(dt)   # (nbands, 4, cap)
    wc_p = jnp.moveaxis(padc(w_col), -1, 1).astype(dt)
    us_p = jnp.swapaxes(us, 0, 1)                        # (nbands, B, cap)
    if cap_pad != cap or b_pad != B:
        us_p = jnp.pad(us_p, [(0, 0), (0, b_pad - B), (0, cap_pad - cap)])

    out = pl.pallas_call(
        functools.partial(_interp_T_kernel, tw=tw),
        grid=(nbands, nbt, nct, ncc),
        in_specs=[
            pl.BlockSpec((1, 1, cc), lambda b, bt, t, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda b, bt, t, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cc), lambda b, bt, t, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cc), lambda b, bt, t, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, cc), lambda b, bt, t, c: (b, bt, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, rows, tw),
                               lambda b, bt, t, c: (b, bt, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands, b_pad, rows, g2_pad), dt),
        interpret=interpret,
    )(i0_p, c0_p, wr_p, wc_p, us_p)
    return out[:, :B, :, :G2]


def _interp_kernel(i0_ref, c0_ref, wr_ref, wc_ref, vs_ref, out_ref, *,
                   tw: int, stacked: bool = False):
    """Forward ``W v`` for one (band, batch-tile, point-chunk, col-tile)
    step; accumulates partial column-tile contributions over the
    innermost col-tile grid dimension."""
    rows = vs_ref.shape[2]
    cc = i0_ref.shape[2]
    dt = out_ref.dtype
    i0 = i0_ref[0, 0, :]
    c0 = c0_ref[0, 0, :]

    riota = jax.lax.broadcasted_iota(jnp.int32, (rows, cc), 0)
    At = jnp.zeros((rows, cc), dt)
    for j in range(4):
        At = At + wr_ref[0, j, :][None, :].astype(dt) * (
            riota == (i0 + j)[None, :]).astype(dt)

    col0 = pl.program_id(3) * tw
    ciota = col0 + jax.lax.broadcasted_iota(jnp.int32, (cc, tw), 1)
    Wc = jnp.zeros((cc, tw), dt)
    for j in range(4):
        Wc = Wc + wc_ref[0, j, :][:, None].astype(dt) * (
            ciota == (c0 + j)[:, None]).astype(dt)

    # Two contraction layouts (round-5, VERDICT r4 #6):
    # stacked=True flips the contraction onto the wide axis —
    # out[b, p] = sum_r At[r, p] * (vs[b] @ Wc^T)[r, p] — one
    # (bb*rows, tw) x (tw, cc) dot per step (full tw=512 MXU depth, batch
    # tile stacked along sublanes) instead of bb dots whose contraction
    # depth is only rows~bh+3; the r-reduction is a cheap VPU
    # broadcast-multiply per lane.  The classic layout contracts rows on
    # the MXU per lane: (rows, cc) x (rows, tw) -> (cc, tw).
    bb = vs_ref.shape[1]
    if stacked:
        rows_l = [vs_ref[0, b].astype(dt) for b in range(bb)]
        stk = rows_l[0] if bb == 1 else jnp.concatenate(rows_l, axis=0)
        P = jax.lax.dot_general(
            stk, Wc,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dt, precision=jax.lax.Precision.HIGHEST)
        vals = jnp.stack(
            [jnp.sum(P[b * rows:(b + 1) * rows] * At, axis=0)
             for b in range(bb)], axis=0)[None]
    else:
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST)
        vals = jnp.stack(
            [jnp.sum(dot(At, vs_ref[0, b].astype(dt)) * Wc, axis=1)
             for b in range(bb)], axis=0)[None]

    @pl.when(pl.program_id(3) == 0)
    def _():
        out_ref[...] = vals

    @pl.when(pl.program_id(3) > 0)
    def _():
        out_ref[...] += vals


@functools.partial(jax.jit,
                   static_argnames=("bh", "cc", "interpret", "stacked"))
def pallas_interp_2d(vs, i0loc, c0, w_row, w_col, *, bh: int, cc: int = 512,
                     interpret: bool | None = None, stacked: bool = False):
    """Band-sorted point values of ``W v`` for d=2 cubic interpolation.

    The XLA forward path is an (n, 16) gather + weighted sum —
    gather-bound on TPU just like the scatter was.  Here each point reads
    its 4x4 stencil from the band slab via the same VMEM one-hot
    selectors as the transpose kernel: P = At^T(rows-contract) @ slab,
    out = rowsum(P * Wc).

    ``vs``: (B, nbands, bh+3, G2) per-band slab views of the grid
    (core rows plus the 3-row halo from the next band; the caller builds
    them with one strided row gather).  Other tables as in
    ``pallas_interp_T_2d``.  Returns (nbands, B, cap) values in
    band-sorted slot order (invalid slots hold garbage from clipped
    table entries — gather only ``inv_slot`` positions back).
    """
    if interpret is None:
        interpret = not _on_tpu()
    B, nbands, rows, G2 = vs.shape[0], vs.shape[1], vs.shape[2], vs.shape[3]
    cap = i0loc.shape[1]
    dt = vs.dtype

    ncc = -(-cap // cc)
    cap_pad = ncc * cc
    tw = min(512, -(-G2 // 128) * 128)
    nct = -(-G2 // tw)
    g2_pad = nct * tw
    bb, nbt = _batch_tile(B)
    b_pad = bb * nbt

    def padc(a, fill=0):
        if cap_pad == cap:
            return a
        pads = [(0, 0), (0, cap_pad - cap)] + [(0, 0)] * (a.ndim - 2)
        return jnp.pad(a, pads, constant_values=fill)

    i0_p = padc(i0loc.astype(jnp.int32), fill=-8)[:, None, :]
    c0_p = padc(c0.astype(jnp.int32), fill=-8)[:, None, :]
    wr_p = jnp.moveaxis(padc(w_row), -1, 1).astype(dt)
    wc_p = jnp.moveaxis(padc(w_col), -1, 1).astype(dt)
    vs_p = jnp.swapaxes(vs, 0, 1)                        # (nbands, B, rows, G2)
    if g2_pad != G2 or b_pad != B:
        vs_p = jnp.pad(vs_p, [(0, 0), (0, b_pad - B), (0, 0),
                              (0, g2_pad - G2)])

    out = pl.pallas_call(
        functools.partial(_interp_kernel, tw=tw, stacked=stacked),
        grid=(nbands, nbt, ncc, nct),
        in_specs=[
            pl.BlockSpec((1, 1, cc), lambda b, bt, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda b, bt, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cc), lambda b, bt, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cc), lambda b, bt, c, t: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb, rows, tw), lambda b, bt, c, t: (b, bt, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bb, cc), lambda b, bt, c, t: (b, bt, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbands, b_pad, cap_pad), dt),
        interpret=interpret,
    )(i0_p, c0_p, wr_p, wc_p, vs_p)
    return out[:, :B, :cap]
