"""Attribute the fused-program cold start (VERDICT r3 weak #2).

BENCH_r02 compiled the fused headline program in 8.3 s; BENCH_r03 in
48.7 s after the df64 refit (ozaki exact tables) + adaptive Chebyshev
joined the round.  This script AOT-compiles each candidate sub-program at
the exact headline shapes (n=1e5, mtot=29) and times the compile alone,
so the regression can be pinned to a component instead of guessed at:

  a. fit_predict_grad          — the f32 fused pass
  b. _fit_high_core (ozaki)    — df64 refit, error-free bf16-digit tables
  c. _fit_high_core (chunked)  — df64 refit, chunked-MXU tables
  d. _fused_high_jit           — the shipped all-in-one program
  e. PG outer_step             — the classifier's per-rung program

Run (TPU): python scripts/profile_compile.py [--n 100000]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gpquad.kernels import SquaredExponential
    from gpquad.models import pipeline
    from gpquad.models.precision import (_fit_high_core, split_f64_host,
                                         ws_host_f64)
    from gpquad.quadrature import spectral_grid

    rng = np.random.default_rng(0)
    n, d = args.n, 2
    x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
    y = jnp.asarray(rng.normal(size=n), jnp.float32)
    xnew = jnp.asarray(rng.uniform(0, 1, (10_000, d)), jnp.float32)
    kernel = SquaredExponential(lengthscale=jnp.float32(0.1),
                                variance=jnp.float32(1.0), dimension=d)
    sigmasq = 0.01
    _, h, mtot = spectral_grid(kernel, 1e-6, 1.0)
    mtot = int(mtot)
    key = jax.random.PRNGKey(0)
    h64 = float(h)
    ws_hi, ws_lo = ws_host_f64(kernel, h64, mtot, d)
    h_hi, h_lo = split_f64_host(h64)
    sig_hi, sig_lo = split_f64_host(sigmasq)
    print(f"device={jax.devices()[0]} n={n} mtot={mtot}", flush=True)

    out = {}

    def compile_time(label, fn, *fargs, **fkw):
        t0 = time.time()
        lowered = fn.lower(*fargs, **fkw)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_comp = time.time() - t0
        out[label] = {"lower_s": round(t_lower, 2),
                      "compile_s": round(t_comp, 2)}
        print(label, out[label], flush=True)

    fkw = dict(mtot=mtot, trace_samples=10, var_probes=256, cg_tol=1e-6,
               var_cg_tol=1e-4, grad_cg_tol=1e-4, max_cg_iter=1000,
               var_max_cg_iter=400, solver="auto", nufft_method="mxu",
               nufft_caps=None)
    compile_time("a_fit_predict_grad", pipeline.fit_predict_grad,
                 x, y, xnew, kernel, sigmasq, h, key, **fkw)
    compile_time("b_fit_high_ozaki", _fit_high_core,
                 x, y, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo,
                 mtot=mtot, passes=8, chunk=8, exact_tables=True)
    compile_time("c_fit_high_chunked", _fit_high_core,
                 x, y, ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo,
                 mtot=mtot, passes=8, chunk=8, exact_tables=False)
    compile_time("d_fused_high", pipeline._fused_high_jit,
                 x, y, xnew, kernel, sigmasq, h, key,
                 ws_hi, ws_lo, h_hi, h_lo, sig_hi, sig_lo,
                 passes=8, chunk=8, slab=2048, **fkw)

    # PG outer step at its n=1e5 planning rung
    import optax
    from gpquad.models import pg_core
    yb = (rng.uniform(size=n) < 0.5).astype(np.float32)
    kappa = jnp.asarray(yb - 0.5)
    pg_b = jnp.ones((n,), jnp.float32)
    delta0 = jnp.full((n,), 0.25, jnp.float32)
    kpg = SquaredExponential(lengthscale=jnp.float32(0.3),
                             variance=jnp.float32(1.0), dimension=d)
    _, hp, mtot_pg = spectral_grid(kpg, 1e-2, 1.0)
    e_probes = jnp.asarray(rng.integers(0, 2, (64, n)) * 2 - 1, jnp.float32)
    raw = jnp.log(jnp.asarray([0.3, 1.0], jnp.float32))
    tx = optax.adam(0.05)
    compile_time("e_pg_outer_step", pg_core.outer_step,
                 x, kpg, hp, None, delta0, kappa, pg_b, e_probes,
                 jax.random.PRNGKey(1), raw, tx.init(raw),
                 mtot=int(mtot_pg), e_iters=8, n_m_probes=32, rho0=0.5,
                 gamma=0.1, e_tol=1e-3, cg_tol=1e-3, lr=0.05)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
