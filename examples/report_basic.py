"""Report-style walkthrough: the full EFGP story on one synthetic problem.

Port of the reference's ``efgpnd_basic_report.ipynb`` narrative
(reference: efgpnd_basic_report.ipynb — its stated "typical usage"
companion to efgpnd_basic_ex, README.md:2-4):

  1. sample a ground-truth function from a vanilla GP
     (gpquad.models.sampling = reference vanilla_gp_sampling.py),
  2. learn (lengthscale, variance, noise) with stochastic hyper-gradients
     + Adam, logging the training path,
  3. sanity-check the optimum against the exact dense log-marginal
     (small n, the notebook's sklearn-GPR comparison),
  4. fit the posterior mean and time/compare the variance modes.

Run: ``python examples/report_basic.py`` (CPU x64; a few minutes).
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
from gpquad.models.model import EFGP
from gpquad.models.sampling import sample_gp_spectral

# --- 1. ground truth from a vanilla GP --------------------------------------
n, d = 8000, 2
true_ls, true_var, true_noise = 0.1, 1.0, 0.1
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (n, d)))
f = sample_gp_spectral(jax.random.PRNGKey(1), x, lengthscale=true_ls,
                       variance=true_var)
y = f + jnp.sqrt(true_noise) * jax.random.normal(jax.random.PRNGKey(2),
                                                 f.shape, f.dtype)
print(f"sampled GP: n={n} d={d} true hypers "
      f"(ls={true_ls}, var={true_var}, noise={true_noise})")

# --- 2. hyper learning with a training log ----------------------------------
model = EFGP(x, y, "SE", eps=1e-4,
             opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500})
t0 = time.time()
model.optimize_hyperparameters(max_iters=40, lr=0.15, trace_samples=10,
                               log_interval=10, verbose=True)
print(f"hyper learning: {time.time() - t0:.1f}s")
log = model.training_log
path = list(zip(log["lengthscale"], log["variance"]))
print("training path (ls, var): start", tuple(round(v, 4) for v in path[0]),
      "-> end", tuple(round(v, 4) for v in path[-1]))
pos = np.exp(np.asarray(model.params.raw))
print(f"learned: ls={pos[0]:.4f} var={pos[1]:.4f} noise={pos[-1]:.4f}")

# --- 3. dense log-marginal check (the notebook's sklearn comparison) --------
n_small = 1500
xs, ys = x[:n_small], y[:n_small]
kern = SquaredExponential(lengthscale=jnp.asarray(pos[0]),
                          variance=jnp.asarray(pos[1]), dimension=d)
lm_learned = float(kern.log_marginal(xs, ys, jnp.asarray(pos[-1])))
kern_true = SquaredExponential(lengthscale=jnp.asarray(true_ls),
                               variance=jnp.asarray(true_var), dimension=d)
lm_true = float(kern_true.log_marginal(xs, ys, jnp.asarray(true_noise)))
print(f"dense log-marginal (n={n_small}): learned {lm_learned:.1f} "
      f"vs true-hypers {lm_true:.1f} "
      f"({'learned >= true' if lm_learned >= lm_true - 5 else 'GAP — check'})")

# --- 4. posterior mean + variance-mode timing -------------------------------
g = np.linspace(0.05, 0.95, 40)
x_new = jnp.asarray(np.stack(np.meshgrid(g, g), -1).reshape(-1, 2))
t0 = time.time()
mean, _ = model.predict(x_new, return_variance=False)
print(f"mean only: {time.time() - t0:.2f}s for {x_new.shape[0]} targets")
for method in ("stochastic", "chebyshev", "regular"):
    t0 = time.time()
    _, var = model.predict(x_new, return_variance=True,
                           variance_method=method)
    dt = time.time() - t0
    print(f"variance[{method:>10}]: {dt:6.2f}s  "
          f"range [{float(jnp.min(var)):.4f}, {float(jnp.max(var)):.4f}]")
print("done")
