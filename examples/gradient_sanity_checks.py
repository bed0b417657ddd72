"""Hyper-gradient sanity checks (script form of the reference's
``MainSanityChecks/Hyper_learning_sanitychecks.ipynb``): the stochastic
EFGP hyper-gradient is compared against

  1. the dense truncated-objective oracle (same approximate objective,
     explicit matrices — reference utils/gradient_tests.py
     compute_gradients_truncated),
  2. autograd through the dense Cholesky log-marginal (the "vanilla"
     oracle — reference compute_gradients_vanilla, and the notebook's
     GPyTorch cross-check),
  3. finite differences of the exact log-marginal.

Run: ``python examples/gradient_sanity_checks.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=300)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from gpquad.kernels import SquaredExponential
    from gpquad.models.gradient import gradient
    from gpquad.utils.gradient_oracles import (compute_gradients_truncated,
                                               compute_gradients_vanilla)

    rng = np.random.default_rng(0)
    n = args.n
    dtype = jnp.float64 if args.cpu else jnp.float32
    x = jnp.asarray(rng.uniform(0, 1, (n, 2)), dtype)
    f = np.sin(4 * np.asarray(x[:, 0])) * np.cos(3 * np.asarray(x[:, 1]))
    y = jnp.asarray(f + 0.1 * rng.normal(size=n), dtype)
    kern = SquaredExponential(lengthscale=jnp.asarray(0.2, dtype),
                              variance=jnp.asarray(1.0, dtype), dimension=2)
    sigmasq, eps = 0.05, 1e-4

    res = gradient(x, y, kern, sigmasq, eps, jax.random.PRNGKey(0),
                   trace_samples=64, cg_tol=1e-8)
    g_fast = np.asarray(res.grad)

    g_trunc = np.asarray(compute_gradients_truncated(kern, x, y, sigmasq,
                                                     eps)[0])
    g_van = np.asarray(compute_gradients_vanilla(kern, x, y, sigmasq))

    names = ("d/d lengthscale", "d/d variance", "d/d noise")
    print(f"{'':>16} {'stochastic':>12} {'truncated':>12} {'vanilla':>12}")
    for i, nm in enumerate(names):
        print(f"{nm:>16} {g_fast[i]:>12.4f} {g_trunc[i]:>12.4f} "
              f"{g_van[i]:>12.4f}")

    # stochastic vs its own (truncated) objective: trace-term Monte Carlo
    # error only; truncated vs vanilla differ by the quadrature itself
    rel_obj = np.max(np.abs(g_fast - g_trunc) / (np.abs(g_trunc) + 1.0))
    rel_van = np.max(np.abs(g_trunc - g_van) / (np.abs(g_van) + 1.0))
    print(f"stochastic vs truncated oracle (64 probes): max rel "
          f"{rel_obj:.3f}")
    print(f"truncated vs vanilla (quadrature gap at eps={eps:g}): max rel "
          f"{rel_van:.3f}")

    # finite differences of the exact dense log-marginal in log-space
    def lm(raw):
        l, v, s2 = np.exp(raw)
        k = SquaredExponential(lengthscale=jnp.asarray(l, dtype),
                               variance=jnp.asarray(v, dtype), dimension=2)
        return float(k.log_marginal(x, y, s2))

    raw0 = np.log([0.2, 1.0, sigmasq])
    fd = np.zeros(3)
    hstep = 1e-4 if args.cpu else 1e-2
    for i in range(3):
        e = np.zeros(3)
        e[i] = hstep
        fd[i] = (lm(raw0 + e) - lm(raw0 - e)) / (2 * hstep)
    # NLL gradients wrt positive hypers -> compare via chain rule
    g_van_raw = -g_van * np.exp(raw0)
    print(f"vanilla (chain rule) vs finite differences: "
          f"{np.max(np.abs(g_van_raw - fd) / (np.abs(fd) + 1.0)):.4f}")


if __name__ == "__main__":
    main()
