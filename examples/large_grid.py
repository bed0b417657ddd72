"""Walkthrough: the large-grid regime (M > DENSE_SOLVER_MAX_M).

Small lengthscales force large frequency grids — the regime the
reference's hard CSV rows live in (reference
benchmark_cg_preconditioning_realdata.py:40-46: 629 unpreconditioned
iterations, 111 at the swept Jacobi optimum).  Past ``M = 4096`` gpquad
cannot materialize the dense Gram, so everything runs matrix-free, and
three levers control cost and accuracy:

  1. **Jacobi vs deflation preconditioning** (`ops/deflation`): the
     top-k weight modes' principal submatrix is gathered straight from
     the Toeplitz lag table and inverted once on the MXU — a dense
     "head" with a Jacobi "tail".  One build amortizes across the mean
     solve, every gradient probe system, and every refinement pass.
  2. **Matrix-free df64 refinement** (`models/precision.fit_high`
     ``solver="iterative"``): df64 true residuals around the f32 PCG
     reach ~1e-6 agreement with an f64 oracle at ANY grid size.
  3. **Oracle-grade gradient + variance** (`models/gradient_high`,
     `models/variance_high`): the same refinement through the whole
     estimator algebra, with tables from the error-free bf16-digit MXU
     builder (`ops/ozaki`).

This walkthrough runs a deliberately hard 2-D config (lengthscale 0.03
at eps=1e-6 => mtot=75, M=5625 — past the dense window) end to end on a
small-n problem so it stays quick on CPU; on a v5e the bench's harder
mtot=107 / n=1e5 twin of this code lands at ~0.06 s
(f32 fit), ~0.4 s (df64 fit), ~0.6 s (df64 gradient), ~2.3 s (df64 exact
variance, 256 targets) — the `hard_*` fields of bench.py.

Run: ``python examples/large_grid.py`` (CPU x64, a few minutes).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_mean
from gpquad.models.gradient import gradient_with_grid
from gpquad.models.precision import fit_high, predict_mean_high
from gpquad.quadrature import spectral_grid

rng = np.random.default_rng(0)
n, d, ell, sigmasq = 20000, 2, 0.03, 0.01
xh = rng.uniform(0, 1, size=(n, d))
yh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
      + 0.1 * rng.normal(size=n))
x = jnp.asarray(xh, jnp.float32)
y = jnp.asarray(yh, jnp.float32)
xt = jnp.asarray(rng.uniform(0.1, 0.9, size=(500, d)), jnp.float32)

kernel = SquaredExponential(lengthscale=jnp.float32(ell),
                            variance=jnp.float32(1.0), dimension=d)
_, h, mtot = spectral_grid(kernel, 1e-6, 1.0)
mtot = int(mtot)
print(f"grid: mtot={mtot}, M={mtot**d}  (dense window ends at 4096)")

# -- 1. f32 fit: Jacobi vs deflated CG ----------------------------------
st_j = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                     cg_tol=1e-6, max_cg_iter=2000, solver="cg")
st_d = fit_with_grid(x, y, kernel, jnp.float32(sigmasq), h, mtot,
                     cg_tol=1e-6, max_cg_iter=2000, solver="cg",
                     precond_rank=1024)
print(f"CG iterations: jacobi {int(st_j.mean_cg_iters)} -> "
      f"deflated(k=1024) {int(st_d.mean_cg_iters)}")
mean_j = np.asarray(predict_mean(st_j, xt))
mean_d = np.asarray(predict_mean(st_d, xt))
print(f"  same solution: max diff {np.max(np.abs(mean_j - mean_d)):.2e}")

# -- 2. hyper-gradient: the deflation block is shared by every probe ----
key = jax.random.PRNGKey(0)
g = gradient_with_grid(x, y, kernel, jnp.float32(sigmasq), h, key,
                       mtot=mtot, trace_samples=5, cg_tol=1e-4,
                       solver="cg", precond_rank=1024)
print(f"gradient (deflated probes): {np.asarray(g.grad)}  "
      f"mean/trace iters {int(g.mean_cg_iters)}/{int(g.trace_cg_iters)}")

# -- 3. df64 high-precision fit at a grid no dense solver reaches -------
t0 = time.time()
hs = fit_high(x, y, kernel, sigmasq, float(h), mtot, solver="iterative",
              precond_rank=1024)
mh = np.asarray(predict_mean_high(hs, xt))
print(f"df64 iterative fit: {time.time()-t0:.1f}s, "
      f"inner iters {int(hs.state.mean_cg_iters)}, "
      f"df64-vs-f32 mean shift {np.max(np.abs(mh - mean_d)):.2e} "
      f"(the f32 error the refinement removes)")
print("done — scripts/verify_hard_high_accuracy.py certifies this exact "
      "code path at 1e-6 against f64 oracles")
