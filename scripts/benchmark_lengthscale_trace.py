"""Benchmark the feature-space lengthscale-trace rewrite vs the production
data-space block.

Port of the reference benchmark
(reference: benchmark_lengthscale_trace_rewrite.py:1-349, which timed both
formulations on the full PRISM tmean raster in its "bad regime" states):

  old (production, efgpnd.py:175-220):  per probe z in data space,
      rhs = ws * T(d_l * F* z),  solve A beta = rhs,
      alpha = (F(d_l F* z) - F(ws beta)) / sigma^2,
      estimate_j = Re <z, alpha>
  new (feature-space rewrite):  per probe v in feature space,
      rhs = ws * T(d_l * T(ws v)),  solve A beta = rhs,
      estimate_j = trace_const - Re <v, beta> / sigma^2,
      trace_const = N sum(d_l) / sigma^2  (Toeplitz zero lag = N)

Both are unbiased estimators of the same term1 trace; the benchmark
reports wall/iters and the estimates' agreement in combined standard
errors.  Runs on the frozen raster in the reference's bad-regime states.
PASS: the two estimates agree within 5 combined standard errors in every
configuration.

Run: ``python scripts/benchmark_lengthscale_trace.py [--n 2000]``
"""
import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import quadrature_weights, tensor_grid
from gpquad.ops.cg import pcg
from gpquad.ops.nufft import make_nufft
from gpquad.ops.operators import (convolution_vector, make_A_mean,
                                  make_jacobi_precond)
from gpquad.ops.toeplitz import make_toeplitz, toeplitz_diag_scale
from gpquad.quadrature import spectral_grid

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"


def build(x, kernel, sigmasq, eps):
    n, d = x.shape
    L = float(np.max(x.max(0) - x.min(0)))
    _, h, mtot = spectral_grid(kernel, eps, L, use_integral=True)
    return float(h), mtot


def make_blocks(x, kernel, h, mtot, sigmasq, cg_tol):
    """Jitted old/new trace blocks sharing the same operators."""
    d = x.shape[1]
    m = (mtot - 1) // 2

    @partial(jax.jit, static_argnames=())
    def _old(x, Z):
        rdtype = x.dtype
        cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
        hh = jnp.asarray(h, rdtype)
        xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * hh, d)
        ws = quadrature_weights(kernel, xis, hh, d)
        d_l = ((hh ** d) * kernel.spectral_grad(xis)[:, 0]).astype(cdtype)
        nufft = make_nufft(x, hh, mtot, cdtype=cdtype)
        v = convolution_vector(m, x, hh)
        T = make_toeplitz(v)
        A = make_A_mean(ws, T, sigmasq)
        M_inv = make_jacobi_precond(ws, sigmasq,
                                    diag_scale=toeplitz_diag_scale(v))
        TS = Z.shape[0]
        fadjZ = nufft.type1(Z.astype(cdtype)).reshape(TS, -1)
        DiFZ = d_l[None, :] * fadjZ
        rhs_data = nufft.type2(DiFZ).real
        B = ws[None, :] * T(DiFZ)
        res = pcg(A, B, tol=cg_tol, maxiter=2000, M_inv=M_inv)
        mean_part = nufft.type2(ws[None, :] * res.x).real
        alpha = (rhs_data - mean_part) / sigmasq
        return jnp.sum(Z * alpha, axis=1), res.iters

    @partial(jax.jit, static_argnames=())
    def _new(x, V):
        rdtype = x.dtype
        cdtype = jnp.complex64 if rdtype == jnp.float32 else jnp.complex128
        hh = jnp.asarray(h, rdtype)
        xis = tensor_grid(jnp.arange(-m, m + 1, dtype=rdtype) * hh, d)
        ws = quadrature_weights(kernel, xis, hh, d)
        d_l = ((hh ** d) * kernel.spectral_grad(xis)[:, 0]).astype(cdtype)
        v = convolution_vector(m, x, hh)
        T = make_toeplitz(v)
        A = make_A_mean(ws, T, sigmasq)
        M_inv = make_jacobi_precond(ws, sigmasq,
                                    diag_scale=toeplitz_diag_scale(v))
        B = ws[None, :] * T(d_l[None, :] * T(ws[None, :]
                                             * V.astype(cdtype)))
        res = pcg(A, B, tol=cg_tol, maxiter=2000, M_inv=M_inv)
        trace_const = (toeplitz_diag_scale(v)
                       * jnp.sum(jnp.real(d_l)) / sigmasq)
        est = trace_const - jnp.real(
            jnp.sum(jnp.conj(V.astype(cdtype)) * res.x, axis=1)) / sigmasq
        return est, res.iters

    return _old, _new


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--samples", type=int, default=10)
    ap.add_argument("--eps", type=float, default=1e-4)
    args = ap.parse_args()
    blob = np.load(DATA)
    x = jnp.asarray(blob["x_train"][:args.n])
    n, d = x.shape
    key = jax.random.PRNGKey(0)

    states = [("iter40", 0.09256, 3.878, 0.05202),
              ("final", 0.07518, 5.258, 0.05606)]
    fails = []
    for cg_tol in (1e-4, 1e-5):
        print(f"---- cg_tol={cg_tol:g} trace_samples={args.samples} ----")
        for name, ell, var, sig2 in states:
            kern = SquaredExponential(lengthscale=ell, variance=var,
                                      dimension=d)
            h, mtot = build(np.asarray(x), kern, sig2, args.eps)
            old_f, new_f = make_blocks(x, kern, h, mtot, sig2, cg_tol)
            Z = (jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                      (args.samples, n)) * 2 - 1
                 ).astype(x.dtype)
            M = mtot ** d
            V = (jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5,
                                      (args.samples, M)) * 2 - 1
                 ).astype(x.dtype)

            t0 = time.time()
            e_old, it_old = old_f(x, Z)
            e_old = np.asarray(e_old)
            compile_old = time.time() - t0
            t0 = time.time()
            e_old2, _ = old_f(x, Z)
            float(np.asarray(e_old2).sum())
            warm_old = time.time() - t0

            t0 = time.time()
            e_new, it_new = new_f(x, V)
            e_new = np.asarray(e_new)
            compile_new = time.time() - t0
            t0 = time.time()
            e_new2, _ = new_f(x, V)
            float(np.asarray(e_new2).sum())
            warm_new = time.time() - t0

            se = np.hypot(e_old.std(ddof=1) / np.sqrt(len(e_old)),
                          e_new.std(ddof=1) / np.sqrt(len(e_new)))
            z = abs(e_old.mean() - e_new.mean()) / max(se, 1e-12)
            print(f"[{name}] mtot={mtot} M={M}  "
                  f"old: est={e_old.mean():+.5e} iters={int(it_old)} "
                  f"warm={warm_old:.3f}s (compile {compile_old:.1f}s)  "
                  f"new: est={e_new.mean():+.5e} iters={int(it_new)} "
                  f"warm={warm_new:.3f}s (compile {compile_new:.1f}s)  "
                  f"|z|={z:.2f}")
            if z > 5.0:
                fails.append(f"{name}@{cg_tol}")
    print("PASS" if not fails else f"FAIL: {fails}")
    sys.exit(0 if not fails else 1)


if __name__ == "__main__":
    main()
