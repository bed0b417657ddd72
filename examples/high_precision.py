"""Walkthrough: f64-grade answers on f32-only hardware (the df64 layer).

The reference runs float64 end to end on CPU/CUDA (reference
verify_efgpnd_exact_small.py:19-24; pg_classifier.py:1094 defaults
float64), so its posterior mean, hyper-gradient, and variance all agree
with a dense f64 oracle by construction.  TPUs have no f64, so gpquad
reaches the same ~1e-6 agreement with double-word (df64) arithmetic:

  1. ``fit_high``          — posterior mean (dense df64 operator while
     M <= 4096; matrix-free df64-Toeplitz iterative refinement beyond);
  2. ``gradient_high``     — the batched hyper-gradient with every
     cancellation-prone term in df64 dots;
  3. ``variance_high``     — exact per-target posterior variance solved
     by df64 iterative refinement;
  4. ``msharded_fit_high`` — the same refinement with the frequency grid
     pencil-sharded over a device mesh (runs here on 8 virtual CPU
     devices; on hardware the all_to_all transposes ride ICI).

Each step prints its agreement against a same-algebra numpy-f64 oracle
(gpquad.utils.f64_oracles).  Run: ``python examples/high_precision.py``
(CPU x64; a few minutes, dominated by df64 compiles).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.gradient_high import gradient_high
from gpquad.models.precision import fit_high, predict_mean_high
from gpquad.models.variance_high import variance_high
from gpquad.parallel import make_mesh, msharded_fit_high
from gpquad.utils.f64_oracles import (efgp_f64_objects, gradient_f64,
                                      regular_var_f64)

# --- problem: f32 inputs, moderate conditioning -----------------------------
n, d, ell, var, sigmasq, h, mtot = 8000, 2, 0.15, 1.0, 0.02, 0.45, 13
rng = np.random.default_rng(0)
x32 = rng.uniform(0, 1, (n, d)).astype(np.float32)
f = np.sin(5 * x32[:, 0]) * np.cos(3 * x32[:, 1])
y32 = (f + 0.1 * rng.normal(size=n)).astype(np.float32)
xt32 = rng.uniform(0.05, 0.95, (200, d)).astype(np.float32)
kernel = SquaredExponential(lengthscale=jnp.float32(ell),
                            variance=jnp.float32(var), dimension=d)
x, y, xt = jnp.asarray(x32), jnp.asarray(y32), jnp.asarray(xt32)

# the numpy-f64 oracle shares the same grid/algebra, so any difference is
# pure arithmetic/solver error — not quadrature discretization
obj = efgp_f64_objects(x32, y32, ell, var, sigmasq, h, mtot)
mean64 = np.real(np.exp(2j * np.pi * (np.asarray(xt32, np.float64)
                                      @ obj["xis"].T))
                 @ (obj["ws"] * obj["beta_raw"]))

# --- 1. high-precision posterior mean ---------------------------------------
t0 = time.time()
hs = fit_high(x, y, kernel, sigmasq, h, mtot)
mean_hi = predict_mean_high(hs, xt)
err = np.max(np.abs(np.asarray(mean_hi, np.float64) - mean64))
print(f"1. fit_high mean:       max |err| vs f64 oracle = {err:.2e}   "
      f"({time.time() - t0:.1f}s)")
assert err < 1e-6

# the matrix-free branch reaches the same floor at ANY grid size
t0 = time.time()
hs_it = fit_high(x, y, kernel, sigmasq, h, mtot, solver="iterative")
mean_it = predict_mean_high(hs_it, xt)
err_it = np.max(np.abs(np.asarray(mean_it, np.float64) - mean64))
print(f"   matrix-free branch:  max |err| = {err_it:.2e}   "
      f"({time.time() - t0:.1f}s)")

# --- 2. high-precision hyper-gradient ---------------------------------------
T = 8
Z = jnp.asarray(rng.integers(0, 2, (T, n)) * 2.0 - 1, jnp.float32)
V = jnp.asarray(rng.integers(0, 2, (T, mtot ** d)) * 2.0 - 1, jnp.float32)
g64 = gradient_f64(obj, np.asarray(Z), np.asarray(V))
t0 = time.time()
gh = gradient_high(x, y, kernel, sigmasq, h, mtot, probes=(Z, V))
rel = np.max(np.abs(np.asarray(gh.grad, np.float64) - g64) / np.abs(g64))
print(f"2. gradient_high:       max rel err (same probes) = {rel:.2e}   "
      f"({time.time() - t0:.1f}s)")

# --- 3. high-precision posterior variance -----------------------------------
var64 = regular_var_f64(obj, xt32)
t0 = time.time()
vh = variance_high(x, kernel, sigmasq, h, mtot, xt, slab=200)
verr = np.max(np.abs(np.asarray(vh, np.float64) - var64))
vrel = np.max(np.abs(np.asarray(vh, np.float64) - var64)
              / np.maximum(var64, 1e-12))
print(f"3. variance_high:       max |err| = {verr:.2e}  "
      f"(pointwise rel {vrel:.2e})   ({time.time() - t0:.1f}s)")

# --- 4. the same precision, frequency grid sharded over a mesh --------------
mesh = make_mesh(8)
t0 = time.time()
st, beta_lo = msharded_fit_high(x, y, kernel, sigmasq, h, mtot, mesh)
beta_sh = (np.asarray(st.beta, np.complex128)
           + np.asarray(beta_lo, np.complex128))
beta_ref = (np.asarray(hs_it.state.beta, np.complex128)
            + np.asarray(hs_it.beta_lo, np.complex128))
serr = np.max(np.abs(beta_sh - beta_ref)) / np.max(np.abs(beta_ref))
print(f"4. msharded_fit_high:   rel diff vs single-device = {serr:.2e}  "
      f"(mesh {dict(zip(mesh.axis_names, mesh.devices.shape))})   "
      f"({time.time() - t0:.1f}s)")
print("done: every estimator within the 1e-6 agreement band on f32 words")
