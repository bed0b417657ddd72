"""Full 2-D EFGP demo (script form of the reference's ``efgpnd_ex.ipynb``,
the notebook whose cell outputs are the BASELINE.md timing anchors):

  n = 50k scattered 2-D points  ->  fit, posterior mean at 10k targets,
  all three variance estimators (timed against each other), SLQ
  log-marginal monitor, then a short hyper-learning loop.

Run: ``python examples/full_2d_demo.py [--cpu] [--n 50000]``
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--targets", type=int, default=10_000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    import gpquad
    from gpquad.models.model import EFGP

    rng = np.random.default_rng(0)
    n = args.n
    dtype = jnp.float64 if args.cpu else jnp.float32
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), dtype)
    f = (np.sin(3 * np.pi * np.asarray(x[:, 0]))
         * np.cos(2 * np.pi * np.asarray(x[:, 1])))
    y = jnp.asarray(f + 0.1 * rng.normal(size=n), dtype)
    xq = jnp.asarray(rng.uniform(0, 1, (args.targets, 2)), dtype)

    def sync(v):
        return float(jnp.sum(jnp.abs(v)))

    # --- fit + posterior mean (reference efgpnd_ex cell 23: 0.0485 s) ----
    kern = gpquad.make_kernel("SE", 2).with_hypers(
        jnp.asarray([0.15, 1.0], dtype))
    state = gpquad.fit(x, y, kern, sigmasq=0.01, eps=1e-4, cg_tol=1e-6)
    mean = gpquad.predict_mean(state, xq)
    sync(mean)                       # warm
    t0 = time.time()
    mean = gpquad.predict_mean(state, xq)
    sync(mean)
    print(f"posterior mean ({args.targets} targets): {time.time()-t0:.4f} s")

    # --- three variance estimators (reference cells 27-35) ---------------
    key = jax.random.PRNGKey(1)
    # chebyshev_nodes=None = bandwidth-adaptive (Woodbury-damped) counts
    for method, kw in [("stochastic", dict(probes=500)),
                       ("chebyshev", dict(chebyshev_nodes=None)),
                       ("regular", dict(microbatch=2048))]:
        var = gpquad.predict_var(state, xq, method=method, key=key,
                                 cg_tol=1e-4, **kw)
        sync(var)
        t0 = time.time()
        var = gpquad.predict_var(state, xq, method=method, key=key,
                                 cg_tol=1e-4, **kw)
        sync(var)
        print(f"variance [{method:>10}]: {time.time()-t0:.4f} s   "
              f"range [{float(jnp.min(var)):.2e}, {float(jnp.max(var)):.2e}]")

    # --- hyper-learning loop (reference optimize_hyperparameters) --------
    model = EFGP(x, y, "SE", eps=1e-4,
                 opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500})
    t0 = time.time()
    model.optimize_hyperparameters(max_iters=10, lr=0.1, trace_samples=10,
                                   compute_log_marginal=True,
                                   log_interval=5, verbose=True)
    print(f"10 Adam iters: {time.time()-t0:.2f} s")
    mu, _ = model.predict(xq, return_variance=False)
    truth = (np.sin(3 * np.pi * np.asarray(xq[:, 0]))
             * np.cos(2 * np.pi * np.asarray(xq[:, 1])))
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - truth) ** 2)))
    print(f"RMSE vs true field after learning: {rmse:.4f}")
    # success criterion: well under the observation noise (0.1)
    assert rmse < 0.08, rmse


if __name__ == "__main__":
    main()
