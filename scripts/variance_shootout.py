"""Posterior-variance method shootout: regular vs stochastic (accuracy/time).

Port of the reference's ``efgpnd_variance_shootout.py``.
Run: ``python scripts/variance_shootout.py [--tpu]``
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--targets", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import fit, predict_var
    from gpquad.utils.loaders import load_synthetic_gp

    dtype = jnp.float64 if args.cpu else jnp.float32
    xh, yh = load_synthetic_gp(n=args.n, d=2, lengthscale=0.2, variance=1.0,
                               noise=0.1, seed=0)
    x, y = jnp.asarray(xh, dtype), jnp.asarray(yh, dtype)
    kernel = SquaredExponential(lengthscale=jnp.asarray(0.2, dtype),
                                variance=jnp.asarray(1.0, dtype), dimension=2)
    rng = np.random.default_rng(1)
    xnew = jnp.asarray(rng.uniform(0.1, 0.9, (args.targets, 2)), dtype)
    state = fit(x, y, kernel, 0.1, eps=1e-4, cg_tol=1e-8)

    t0 = time.time()
    v_reg = predict_var(state, xnew, method="regular", cg_tol=1e-8)
    jax.block_until_ready(v_reg)
    t_reg = time.time() - t0
    print(f"regular   : {t_reg:.3f}s (reference anchor)")

    for probes in (50, 200, 1000):
        t0 = time.time()
        v_s = predict_var(state, xnew, method="stochastic",
                          key=jax.random.PRNGKey(0), probes=probes,
                          cg_tol=1e-6)
        jax.block_until_ready(v_s)
        dt = time.time() - t0
        err = float(jnp.max(jnp.abs(v_s - v_reg)) / jnp.max(v_reg))
        print(f"stochastic J={probes:>5}: {dt:.3f}s  max rel err vs "
              f"regular = {err:.3e}")


if __name__ == "__main__":
    main()
