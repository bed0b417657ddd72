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

__all__ = ["msharded_toeplitz_matvec", "shard_toeplitz_kernel"]


def _pencil_conv2d(xp, kf, *, axis_name: str):
    """Circular 2-D convolution of one padded slab with the kernel
    spectrum slab.  xp: (B, P1/k, P2) local; kf: (P1, P2/k) local."""
    a = jnp.fft.fft(xp, axis=-1)
    # (B, P1/k, P2) -> (B, P1, P2/k)
    a = jax.lax.all_to_all(a, axis_name, split_axis=2, concat_axis=1,
                           tiled=True)
    a = jnp.fft.fft(a, axis=-2)
    a = a * kf[None, :, :]
    a = jnp.fft.ifft(a, axis=-2)
    a = jax.lax.all_to_all(a, axis_name, split_axis=1, concat_axis=2,
                           tiled=True)
    return jnp.fft.ifft(a, axis=-1)


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
