"""Report-style walkthrough: posterior-variance estimator shootout.

Port of the reference's variance-shootout notebook narrative
(reference: efgpnd_ex.ipynb's "Posterior variance" sections +
prism_experiment/analyze_prism_variance_drive.py:1): the three variance
modes answer the same question at very different costs —

  - ``regular``    exact per-target solves (the truth, O(targets) CG),
  - ``stochastic`` Hutchinson diag-sums (one batched solve, probes-limited
                   accuracy ~1/sqrt(J)),
  - ``chebyshev``  exact solves at a small Chebyshev-Lobatto tensor grid,
                   barycentric-interpolated to the targets

and the report shows accuracy-vs-cost on one fitted model, including the
probes sweep that the reference uses to pick J.

Run: ``python examples/report_variance_shootout.py`` (CPU x64).
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

from gpquad.models.efgp import fit_with_grid, predict_var
from gpquad.models.sampling import sample_gp_spectral
from gpquad.kernels import SquaredExponential
from gpquad.quadrature import spectral_grid

n, d, ls, var, noise = 6000, 2, 0.15, 1.0, 0.05
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (n, d)))
f = sample_gp_spectral(jax.random.PRNGKey(2), x, lengthscale=ls,
                       variance=var)
y = f + jnp.sqrt(noise) * jax.random.normal(jax.random.PRNGKey(5), f.shape,
                                            f.dtype)
kernel = SquaredExponential(lengthscale=jnp.float64(ls),
                            variance=jnp.float64(var), dimension=d)
_, h, mtot = spectral_grid(kernel, 1e-4, 1.0)
state = fit_with_grid(x, y, kernel, jnp.float64(noise), jnp.float64(h),
                      int(mtot), cg_tol=1e-8)
x_new = jnp.asarray(rng.uniform(0.05, 0.95, (800, d)))
print(f"fitted: n={n} mtot={int(mtot)} M={int(mtot)**d}; "
      f"{x_new.shape[0]} variance targets")

t0 = time.time()
truth = predict_var(state, x_new, method="regular", cg_tol=1e-8)
t_reg = time.time() - t0
print(f"[   regular] {t_reg:6.2f}s   (exact per-target solves — the truth)")

t0 = time.time()
vc = predict_var(state, x_new, method="chebyshev", chebyshev_nodes=16,
                 cg_tol=1e-8)
t_cheb = time.time() - t0
err_c = float(jnp.max(jnp.abs(vc - truth)))
print(f"[ chebyshev] {t_cheb:6.2f}s   max err {err_c:.2e} "
      f"(16^d nodes, barycentric)")

for probes in (64, 256, 1024):
    t0 = time.time()
    vs = predict_var(state, x_new, method="stochastic", probes=probes,
                     key=jax.random.PRNGKey(3), cg_tol=1e-8)
    dt = time.time() - t0
    err = float(jnp.sqrt(jnp.mean((vs - truth) ** 2)))
    rel = err / float(jnp.mean(truth))
    print(f"[stoch J={probes:4d}] {dt:6.2f}s   rmse {err:.2e} "
          f"(rel {rel:.1%} of the mean variance — scales ~1/sqrt(J))")

# success criteria (the claims the report text makes)
assert err_c < 5e-3 * float(jnp.max(truth)), err_c
assert rel < 0.05, rel        # J=1024 stochastic within 5% of the mean var
print("\nreading: chebyshev matches 'regular' at a fraction of the cost "
      "when targets >> nodes^d; stochastic wins when M is large and "
      "moderate accuracy suffices.")
