"""Basic EFGP regression walkthrough (script form of the reference's
``efgpnd_basic_ex.ipynb``): fit, predict mean + variance, learn hypers.

Run: ``python examples/basic_regression.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import gpquad
    from gpquad.utils.loaders import load_synthetic_gp

    # 2-D synthetic GP draw (stands in for data/gp_samples_*.pt)
    dtype = jnp.float64 if args.cpu else jnp.float32
    xh, yh = load_synthetic_gp(n=args.n, d=2, lengthscale=0.15, variance=1.5,
                               noise=0.1, seed=0)
    x, y = jnp.asarray(xh, dtype), jnp.asarray(yh, dtype)

    # 1. build the model — string kernel + automatic hyper estimation
    model = gpquad.EFGP(x, y, "SquaredExponential", eps=1e-4)
    print("initial hypers:",
          {k: float(v) for k, v in model.params.as_dict().items()})

    # 2. learn hyperparameters (stochastic-trace gradients + Adam)
    model.optimize_hyperparameters(max_iters=20, lr=0.1, trace_samples=10,
                                   key=jax.random.PRNGKey(0))
    print("learned hypers:",
          {k: float(v) for k, v in model.params.as_dict().items()})

    # 3. predict on a grid with three variance flavors
    g = np.linspace(0.05, 0.95, 40)
    xg = jnp.asarray(np.stack(np.meshgrid(g, g), -1).reshape(-1, 2), dtype)
    mean, var_sto = model.predict(xg, variance_method="stochastic",
                                  hutchinson_probes=256)
    _, var_cheb = model.predict(xg, variance_method="chebyshev")
    print(f"mean range [{float(mean.min()):.3f}, {float(mean.max()):.3f}]  "
          f"stochastic var mean {float(var_sto.mean()):.5f}  "
          f"chebyshev var mean {float(var_cheb.mean()):.5f}")

    # 4. log marginal likelihood (SLQ)
    lm = float(model.log_marginal())
    print("log marginal:", lm)
    # success criteria: nonnegative variances, the two estimators agree
    # on the mean level, finite log marginal
    assert float(var_sto.min()) > -1e-4 and float(var_cheb.min()) >= 0.0
    assert abs(float(var_sto.mean()) - float(var_cheb.mean())) \
        < 0.25 * float(var_cheb.mean())
    assert np.isfinite(lm)


if __name__ == "__main__":
    main()
