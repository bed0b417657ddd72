"""Profile the n=1e6 scale-config stochastic variance (VERDICT r4 #1).

Measures, on the real chip, the levers for the 24.6 s variance wall:
  (a) PCG iteration count for the probe batch vs deflation rank;
  (b) per-iteration cost vs probe-batch size (64 / 256);
  (c) pow-2 (1024^2) vs 2,3,5,7-smooth (700^2) FFT padding.

Usage:  python scripts/profile_scale_var.py [--n 1000000] [--rank 2048 ...]
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import (fit_with_grid, plan_nufft_caps, predict_var,
                                _variance_stochastic)
from gpquad.quadrature import spectral_grid

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--lengthscale", type=float, default=0.006)
ap.add_argument("--eps", type=float, default=1e-6)
ap.add_argument("--ranks", type=int, nargs="*", default=[2048, 4096, 8192])
ap.add_argument("--probes", type=int, nargs="*", default=[64])
ap.add_argument("--cg-tol", type=float, default=1e-3)
args = ap.parse_args()

rng = np.random.default_rng(0)
n, d = args.n, 2
sigmasq = 0.01
xh = rng.uniform(0, 1, size=(n, d))
fh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
      + 0.5 * np.sin(7 * xh[:, 0] + 5 * xh[:, 1]))
yh = fh + 0.1 * rng.normal(size=n)
x = jnp.asarray(xh, jnp.float32)
y = jnp.asarray(yh, jnp.float32)
xnew = jnp.asarray(rng.uniform(0, 1, size=(1000, d)), jnp.float32)
kernel = SquaredExponential(lengthscale=jnp.float32(args.lengthscale),
                            variance=jnp.float32(1.0), dimension=d)
_, h, mtot = spectral_grid(kernel, args.eps, 1.0)
mtot = int(mtot)
print(f"mtot={mtot} M={mtot**d}", flush=True)
caps = plan_nufft_caps(x, float(h), mtot)


@jax.jit
def _reduce(a):
    return jnp.sum(jnp.abs(jnp.real(a)))


def sync(a):
    return float(_reduce(a))


key = jax.random.PRNGKey(11)
from functools import partial
from gpquad.ops.cg import pcg
from gpquad.ops.operators import make_A_var
from gpquad.models.efgp import _var_precond


@partial(jax.jit, static_argnames=("p", "tol"))
def _probe_iters(st, key, p, tol):
    M = st.mtot ** st.d
    etas = (jax.random.bernoulli(key, 0.5, (p, M)) * 2 - 1
            ).astype(st.h.dtype)
    rhs = st.ws[None, :] * etas
    A_var = make_A_var(st.ws, st.toeplitz, st.sigmasq)
    res = pcg(A_var, rhs, tol=tol, maxiter=1000, M_inv=_var_precond(st))
    return res.iters



for rank in args.ranks:
    st = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                       cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                       precond_rank=rank, nufft_method="banded",
                       nufft_caps=caps)
    sync(st.beta)
    t0 = time.time()
    st = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                       cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                       precond_rank=rank, nufft_method="banded",
                       nufft_caps=caps)
    sync(st.beta)
    tfit = time.time() - t0
    print(f"rank={rank}: fit {tfit:.2f}s iters={int(st.mean_cg_iters)}",
          flush=True)
    for p in args.probes:
        v = predict_var(st, xnew, method="stochastic", key=key, probes=p,
                        cg_tol=args.cg_tol, max_cg_iter=1000)
        sync(v)
        t0 = time.time()
        v = predict_var(st, xnew, method="stochastic", key=key, probes=p,
                        cg_tol=args.cg_tol, max_cg_iter=1000)
        sync(v)
        tv = time.time() - t0
        # iteration count of the same probe solve
        it = int(_probe_iters(st, key, p, args.cg_tol))
        print(f"rank={rank} probes={p}: var {tv:.2f}s iters={it}",
              flush=True)

