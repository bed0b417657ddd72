"""Multi-chip scale-out over a ``jax.sharding.Mesh`` (new capability).

The reference is strictly single-process/single-device (SURVEY §2.4: no
``torch.distributed`` anywhere).  The TPU-native scale axes of EFGP are

  - ``n`` (data points): the NUFFT phase matrices and all point-space
    vectors shard row-wise; the type-1 contraction ``F* y`` reduces over
    the sharded axis, so XLA inserts one ``psum`` over ICI per apply and
    the (small) frequency-space state stays replicated;
  - ``probe`` (Hutchinson/trace systems): the batched trace CG is
    embarrassingly parallel across right-hand sides; lanes shard over the
    second mesh axis and only the scalar convergence mask is global.

GSPMD propagates both layouts from the input shardings — no hand-written
collectives are needed on the hot path.  Under this layout the
frequency-space state is REPLICATED: per-device memory for the Gram matvec
is O(prod(fft_shape)) complex words (e.g. d=2, mtot=801 -> pad 2048^2 ->
64 MiB at complex64) independent of device count.  When that replication
is the wall, :mod:`gpquad.parallel.msharded` shards the padded grid itself
with a pencil-transpose FFT (per-device memory /= mesh size).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_points", "shard_probes", "replicate",
           "sharded_fit", "sharded_gradient", "sharded_pg_outer_step"]


def make_mesh(n_devices: Optional[int] = None,
              axes: Tuple[str, ...] = ("dp",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Build a device mesh.  Default: all devices on one data axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_points(arr, mesh: Mesh, axis: str = "dp"):
    """Shard the leading (data-point) axis of ``arr`` over ``axis``."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_probes(arr, mesh: Mesh, axis: str = "probe"):
    """Shard the leading (probe-batch) axis of ``arr`` over ``axis``."""
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(arr, mesh: Mesh):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def sharded_fit(x, y, kernel, sigmasq, h, mtot, mesh: Mesh, **kw):
    """Data-parallel fit: points sharded, frequency state replicated.

    The type-1 NUFFT contraction over the sharded point axis becomes a
    matmul + ``psum``; the CG mean solve runs replicated (its state is the
    small (M,) vector).
    """
    from ..models.efgp import fit_with_grid
    xs = shard_points(jnp.asarray(x), mesh)
    ys = shard_points(jnp.asarray(y), mesh)
    return fit_with_grid(xs, ys, kernel, sigmasq, h, mtot, **kw)


def sharded_gradient(x, y, kernel, sigmasq, h, key, *, mesh: Mesh,
                     mtot: int, trace_samples: int, probe_axis: str = "probe",
                     **kw):
    """Data + probe parallel gradient step.

    Point-space arrays shard over ``dp``; the Rademacher probe batches
    shard over ``probe`` so each device solves its slice of the batched
    trace CG.
    """
    from ..models.gradient import gradient_with_grid
    n = x.shape[0]
    m = mtot ** x.shape[1] if x.ndim > 1 else mtot
    kz, kv = jax.random.split(key)
    rdtype = x.dtype
    Z = (jax.random.bernoulli(kz, 0.5, (trace_samples, n)) * 2 - 1
         ).astype(rdtype)
    V = (jax.random.bernoulli(kv, 0.5, (trace_samples, m)) * 2 - 1
         ).astype(rdtype)
    xs = shard_points(jnp.asarray(x), mesh)
    ys = shard_points(jnp.asarray(y), mesh)
    Zs = jax.device_put(Z, NamedSharding(mesh, P(probe_axis, "dp")))
    Vs = shard_probes(V, mesh, probe_axis)
    return gradient_with_grid(xs, ys, kernel, sigmasq, h, key, mtot=mtot,
                              trace_samples=trace_samples, probes=(Zs, Vs),
                              **kw)


def sharded_pg_outer_step(x, kern, h, ws_mask, delta, kappa, pg_b,
                          e_probes, m_key, raw, opt_state, *, mesh: Mesh,
                          probe_axis: str = "probe", **kw):
    """Data + probe parallel PG outer EM iteration (VERDICT r3 #5).

    The E-step's probe solves are embarrassingly parallel — the batched
    feature-space CG carries ``1 + P`` right-hand sides
    (models/pg_core.estep_pass), so the Rademacher probe batch shards
    over ``probe`` exactly like the EFGP trace systems; every
    point-space vector (x, delta, kappa, pg_b, and the probes' point
    axis) shards over ``dp``, turning the type-1 NUFFT contraction into
    a matmul + ``psum`` over ICI.  The (M,)-space state stays
    replicated, so the compiled program is :func:`gpquad.models.pg_core.
    outer_step` unchanged — GSPMD propagates the layouts from the input
    shardings.

    ``probe_axis`` is skipped if the mesh doesn't carry it (pure-``dp``
    meshes replicate the probe batch instead).
    """
    from ..models.pg_core import outer_step
    xs = shard_points(jnp.asarray(x), mesh)
    ds = shard_points(jnp.asarray(delta), mesh)
    ks = shard_points(jnp.asarray(kappa), mesh)
    bs = shard_points(jnp.asarray(pg_b), mesh)
    pa = probe_axis if probe_axis in mesh.axis_names else None
    Ps = jax.device_put(jnp.asarray(e_probes),
                        NamedSharding(mesh, P(pa, "dp")))
    return outer_step(xs, kern, h, ws_mask, ds, ks, bs, Ps, m_key, raw,
                      opt_state, **kw)
