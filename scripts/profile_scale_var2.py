"""Scale-var levers, part 2: deflation-rank sweep + FFT-padding cost.

Measures on the chip, at the bench scale config (n=1e6, mtot=339):
  (a) probe-solve iterations + time for deflation rank 4096 / 8192;
  (b) raw A_var matvec time at pow-2 (1024^2) vs 2,3,5,7-smooth (700^2)
      FFT padding, B=64 lanes.
"""
import argparse
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, plan_nufft_caps, _var_precond
from gpquad.ops.cg import pcg
from gpquad.ops.operators import make_A_var
from gpquad.ops.toeplitz import make_toeplitz
from gpquad.quadrature import spectral_grid

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--lengthscale", type=float, default=0.006)
ap.add_argument("--ranks", type=int, nargs="*", default=[4096, 8192])
ap.add_argument("--probes", type=int, default=64)
ap.add_argument("--cg-tol", type=float, default=1e-3)
ap.add_argument("--skip-fft", action="store_true")
args = ap.parse_args()

rng = np.random.default_rng(0)
n, d = args.n, 2
sigmasq = 0.01
xh = rng.uniform(0, 1, size=(n, d))
yh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
      + 0.1 * rng.normal(size=n))
x = jnp.asarray(xh, jnp.float32)
y = jnp.asarray(yh, jnp.float32)
kernel = SquaredExponential(lengthscale=jnp.float32(args.lengthscale),
                            variance=jnp.float32(1.0), dimension=d)
_, h, mtot = spectral_grid(kernel, 1e-6, 1.0)
mtot = int(mtot)
print(f"mtot={mtot} M={mtot**d}", flush=True)
caps = plan_nufft_caps(x, float(h), mtot)


@jax.jit
def _reduce(a):
    return jnp.sum(jnp.abs(jnp.real(a)))


def sync(a):
    return float(_reduce(a))


key = jax.random.PRNGKey(11)


@partial(jax.jit, static_argnames=("p", "tol", "maxi"))
def _probe_solve(st, key, p, tol, maxi=1000):
    M = st.mtot ** st.d
    etas = (jax.random.bernoulli(key, 0.5, (p, M)) * 2 - 1
            ).astype(st.h.dtype)
    rhs = st.ws[None, :] * etas
    A_var = make_A_var(st.ws, st.toeplitz, st.sigmasq)
    res = pcg(A_var, rhs, tol=tol, maxiter=maxi, M_inv=_var_precond(st))
    return res.x, res.iters


@partial(jax.jit, static_argnames=("p", "reps", "smooth"))
def _matvec_loop(st, key, p, reps, smooth):
    """reps back-to-back A_var matvecs (data-dependent chaining so XLA
    cannot elide them)."""
    M = st.mtot ** st.d
    toe = (make_toeplitz(
        jnp.fft.ifftn(st.toeplitz.fft_kernel)[
            tuple(slice(0, 2 * m - 1) for m in st.toeplitz.ns)],
        force_pow2=False) if smooth else st.toeplitz)
    A_var = make_A_var(st.ws, toe, st.sigmasq)
    z = (jax.random.bernoulli(key, 0.5, (p, M)) * 2 - 1
         ).astype(st.ws.dtype)

    def body(i, z):
        w = A_var(z)
        return w / jnp.max(jnp.abs(jnp.real(w)))

    return jax.lax.fori_loop(0, reps, body, z)


for rank in args.ranks:
    t0 = time.time()
    st = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                       cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                       precond_rank=rank, nufft_method="banded",
                       nufft_caps=caps)
    sync(st.beta)
    t_cold = time.time() - t0
    t0 = time.time()
    st = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                       cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                       precond_rank=rank, nufft_method="banded",
                       nufft_caps=caps)
    sync(st.beta)
    tfit = time.time() - t0
    print(f"rank={rank}: fit cold {t_cold:.1f}s warm {tfit:.2f}s "
          f"iters={int(st.mean_cg_iters)}", flush=True)
    xs, it = _probe_solve(st, key, args.probes, args.cg_tol)
    sync(xs)
    t0 = time.time()
    xs, it = _probe_solve(st, key, args.probes, args.cg_tol)
    sync(xs)
    print(f"rank={rank} probes={args.probes}: solve {time.time()-t0:.2f}s "
          f"iters={int(it)}", flush=True)

if not args.skip_fft:
    st = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                       cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                       precond_rank=2048, nufft_method="banded",
                       nufft_caps=caps)
    sync(st.beta)
    for smooth in (False, True):
        z = _matvec_loop(st, key, args.probes, 20, smooth)
        sync(z)
        t0 = time.time()
        z = _matvec_loop(st, key, args.probes, 20, smooth)
        sync(z)
        dt = (time.time() - t0) / 20
        lbl = "smooth700" if smooth else "pow2-1024"
        print(f"matvec {lbl} B={args.probes}: {dt*1e3:.1f} ms/apply",
              flush=True)
