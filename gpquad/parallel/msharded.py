"""M-sharded Toeplitz matvec: a pencil-decomposed distributed FFT.

The default scale-out layout (gpquad/parallel/sharding.py) shards data
points and probe lanes but **replicates the frequency-space state** — every
device holds the full padded FFT grid, so per-device memory for the Gram
matvec is O(prod(fft_shape)) regardless of the device count.  For very
large grids (big d, small lengthscale) that replication is the memory
wall; this module removes it for the flagship d=2 case by sharding the
grid itself.

Layout (classic pencil/transpose FFT, the standard distributed-FFT recipe
on TPU ICI):

    input slab   (P1/k, P2)  sharded over mesh axis -> FFT along axis 1
    all_to_all   (split axis 1, concat axis 0)      -> (P1, P2/k)
    FFT axis 0, multiply cached kernel spectrum slab (P1, P2/k)
    iFFT axis 0, all_to_all back                    -> (P1/k, P2)
    iFFT axis 1, central-block slice

Per-device frequency memory drops from P1*P2 to P1*P2/k; the two
``all_to_all`` collectives ride ICI.  The kernel spectrum is also stored
sharded (one slab per device), so the *operator* state scales too.

The reference has no distributed path at all (SURVEY §2.4); this is the
TPU-native answer to its single-device ToeplitzND (efgpnd.py:1239-1393).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.toeplitz import ToeplitzND

__all__ = ["msharded_toeplitz_matvec", "shard_toeplitz_kernel",
           "make_msharded_A_mean", "msharded_fit"]


def _pencil_conv2d(xp, kf, *, axis_name: str):
    """Circular 2-D convolution of one padded slab with the kernel
    spectrum slab.  xp: (B, P1/k, P2) local; kf: (P1, P2/k) local."""
    # Layout note: XLA:CPU's fft thunk requires dim0-major operands, but
    # inside a fused while_loop body the planner hands FFTs transposed
    # layouts and RET_CHECKs.  Keep every FFT on the LAST axis and flatten
    # the operand to 2-D first — the reshape across the transposed dims
    # forces a physical copy into the canonical layout (free where the
    # layout was already canonical; a transpose that had to happen anyway
    # otherwise).  TPU is layout-agnostic here; this is for the CPU test
    # and dryrun backends.
    def fft_last(a, inverse=False):
        shape = a.shape
        flat = a.reshape(-1, shape[-1])
        out = jnp.fft.ifft(flat, axis=-1) if inverse \
            else jnp.fft.fft(flat, axis=-1)
        return out.reshape(shape)

    a = fft_last(xp)
    # (B, P1/k, P2) -> (B, P1, P2/k)
    a = jax.lax.all_to_all(a, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    a = jnp.swapaxes(a, -1, -2)
    a = fft_last(a)
    a = a * jnp.swapaxes(kf, -1, -2)[None, :, :]
    a = fft_last(a, inverse=True)
    a = jnp.swapaxes(a, -1, -2)
    a = jax.lax.all_to_all(a, axis_name, split_axis=1, concat_axis=2,
                           tiled=True)
    return fft_last(a, inverse=True)


def shard_toeplitz_kernel(toeplitz: ToeplitzND, mesh: Mesh,
                          axis: str = "dp") -> jnp.ndarray:
    """Place the cached kernel spectrum column-sharded over ``axis`` (one
    (P1, P2/k) slab per device)."""
    return jax.device_put(toeplitz.fft_kernel,
                          NamedSharding(mesh, P(None, axis)))


def msharded_toeplitz_matvec(toeplitz: ToeplitzND, x, mesh: Mesh,
                             axis: str = "dp", fft_kernel=None):
    """Apply the 2-D multilevel-Toeplitz operator with the padded grid
    sharded over ``mesh[axis]``.

    ``x``: (..., M) flat or (..., n1, n2) block, replicated or sharded —
    the result matches ``toeplitz(x)`` up to reduction order.  Pass
    ``fft_kernel=shard_toeplitz_kernel(...)`` to keep the operator state
    sharded across calls; otherwise the replicated cached spectrum is
    resharded on the fly.

    Requires d == 2 and both padded FFT sizes divisible by the axis size
    (power-of-two padding guarantees this for power-of-two meshes).
    """
    if toeplitz.d != 2:
        raise NotImplementedError(
            "pencil-sharded matvec is implemented for d=2; other dims run "
            "the replicated ToeplitzND path")
    n1, n2 = toeplitz.ns
    P1, P2 = toeplitz.fft_shape
    k = mesh.shape[axis]
    if P1 % k or P2 % k:
        raise ValueError(
            f"fft_shape {toeplitz.fft_shape} not divisible by mesh axis "
            f"'{axis}' of size {k}")
    kf = fft_kernel if fft_kernel is not None \
        else shard_toeplitz_kernel(toeplitz, mesh, axis)

    cdtype = toeplitz.fft_kernel.dtype
    flat = x.shape[-1] == toeplitz.size and (
        x.ndim < 2 or tuple(x.shape[-2:]) != (n1, n2))
    batch = x.shape[:-1] if flat else x.shape[:-2]
    xb = x.reshape((-1, n1, n2)).astype(cdtype)

    conv = shard_map(partial(_pencil_conv2d, axis_name=axis), mesh=mesh,
                     in_specs=(P(None, axis, None), P(None, axis)),
                     out_specs=P(None, axis, None))

    @jax.jit
    def run(xb, kf):
        xp = jnp.zeros((xb.shape[0], P1, P2), cdtype)
        xp = xp.at[:, :n1, :n2].set(xb)
        y = conv(xp, kf)
        return y[:, n1 - 1:2 * n1 - 1, n2 - 1:2 * n2 - 1]

    y = run(xb, kf)
    return (y.reshape(batch + (toeplitz.size,)) if flat
            else y.reshape(batch + (n1, n2)))


def make_msharded_A_mean(ws, toeplitz: ToeplitzND, sigmasq, mesh: Mesh,
                         axis: str = "dp"):
    """Mean-solve operator ``A beta = D T D beta + sigma^2 beta`` whose
    Gram matvec runs the pencil-transpose sharded FFT — traceable inside
    ``jit``/``lax.while_loop``, so the batched PCG (ops/cg.py) can drive
    it directly.  This is what upgrades the standalone matvec into an
    end-to-end large-grid solve (VERDICT r2 #4).

    The kernel spectrum is column-slab-sharded with a sharding constraint
    (per-device operator state = P1*P2/k), and every CG iterate's padded
    grid lives sharded inside the shard_map region.
    """
    if toeplitz.d != 2:
        raise NotImplementedError("M-sharded A_mean requires d == 2")
    n1, n2 = toeplitz.ns
    P1, P2 = toeplitz.fft_shape
    k = mesh.shape[axis]
    if P1 % k or P2 % k:
        raise ValueError(
            f"fft_shape {toeplitz.fft_shape} not divisible by mesh axis "
            f"'{axis}' of size {k}")
    cdtype = toeplitz.fft_kernel.dtype
    kf = jax.lax.with_sharding_constraint(
        toeplitz.fft_kernel, NamedSharding(mesh, P(None, axis)))
    conv = shard_map(partial(_pencil_conv2d, axis_name=axis), mesh=mesh,
                     in_specs=(P(None, axis, None), P(None, axis)),
                     out_specs=P(None, axis, None))

    def A_mean(beta):
        beta = beta.astype(cdtype)
        u = ws * beta
        batch = u.shape[:-1]
        xb = u.reshape((-1, n1, n2))
        xp = jnp.zeros((xb.shape[0], P1, P2), cdtype)
        xp = xp.at[:, :n1, :n2].set(xb)
        y = conv(xp, kf)
        t = y[:, n1 - 1:2 * n1 - 1, n2 - 1:2 * n2 - 1]
        t = t.reshape(batch + (toeplitz.size,))
        return ws * t + sigmasq * beta

    return A_mean


def msharded_fit(x, y, kernel, sigmasq, h, mtot: int, mesh: Mesh, *,
                 axis: str = "dp", cg_tol: float = 1e-4,
                 max_cg_iter=None, use_precond: bool = True):
    """End-to-end EFGP fit with the frequency grid sharded (pencil FFT).

    Point-space work (NUFFT rhs, lag table) runs data-parallel via GSPMD
    from the input shardings exactly like ``sharded_fit``; the mean-solve
    CG then iterates against :func:`make_msharded_A_mean`, so per-device
    frequency memory is O(P1 * P2 / k) instead of the replicated
    O(P1 * P2) wall (gpquad/parallel/sharding.py:14-21).  Numerically
    equal to the single-device ``fit_with_grid(..., solver='cg')`` up to
    reduction order.  d=2 only (the pencil decomposition's home turf).
    """
    from functools import partial as _partial

    from ..models.efgp import FitState, quadrature_weights, tensor_grid
    from ..ops.cg import pcg
    from ..ops.nufft import make_nufft
    from ..ops.operators import convolution_vector, make_jacobi_precond
    from ..ops.toeplitz import make_toeplitz, toeplitz_diag_scale
    from .sharding import shard_points

    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    if x.shape[1] != 2:
        raise NotImplementedError("msharded_fit requires d == 2")
    xs = shard_points(x, mesh, axis)
    ys = shard_points(jnp.asarray(y), mesh, axis)

    @_partial(jax.jit, static_argnames=("mtot", "cg_tol", "max_cg_iter",
                                        "use_precond"))
    def _run(x, y, kernel, sigmasq, h, *, mtot, cg_tol, max_cg_iter,
             use_precond):
        rdtype = x.dtype
        cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
        h = jnp.asarray(h, rdtype)
        sigmasq = jnp.asarray(sigmasq, rdtype)
        kernel_c = kernel.with_hypers(kernel.hyper_vector().astype(rdtype))
        m = (mtot - 1) // 2
        d = 2
        xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * h, d)
        ws = quadrature_weights(kernel_c, xis, h, d)
        nufft = make_nufft(x, h, mtot, cdtype=cdtype)
        rhs = ws * nufft.type1(y.astype(cdtype)).reshape(-1)
        v = convolution_vector(m, x, h)
        toeplitz = make_toeplitz(v)
        A = make_msharded_A_mean(ws, toeplitz, sigmasq, mesh, axis)
        M_inv = None
        if use_precond:
            M_inv = make_jacobi_precond(ws, sigmasq,
                                        diag_scale=toeplitz_diag_scale(v))
        res = pcg(A, rhs, tol=cg_tol,
                  maxiter=max_cg_iter if max_cg_iter is not None
                  else 2 * rhs.shape[0], M_inv=M_inv)
        return FitState(beta=res.x, ws=ws, h=h, sigmasq=sigmasq,
                        toeplitz=toeplitz, mean_cg_iters=res.iters,
                        diag_scale=toeplitz_diag_scale(v), mtot=mtot, d=d)

    with mesh:
        return _run(xs, ys, kernel, sigmasq, h, mtot=mtot, cg_tol=cg_tol,
                    max_cg_iter=max_cg_iter, use_precond=use_precond)
