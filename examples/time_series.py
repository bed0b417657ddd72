"""1-D time-series EFGP (script form of the reference's
``efgpnd_basic_ex_time_series.ipynb``): Matérn kernel, irregular samples,
forecast band.

Run: ``python examples/time_series.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import gpquad

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(0)
    # irregularly sampled seasonal signal with trend
    t = np.sort(rng.uniform(0, 10, 3000))
    f = 0.3 * t + np.sin(2 * np.pi * t) + 0.4 * np.sin(6 * np.pi * t)
    yv = f + 0.2 * rng.normal(size=len(t))
    x, y = jnp.asarray(t, dtype), jnp.asarray(yv, dtype)

    model = gpquad.EFGP(x, y, "Matern32", eps=1e-4)
    model.optimize_hyperparameters(max_iters=15, lr=0.1, trace_samples=8,
                                   key=jax.random.PRNGKey(0))
    print("learned:", {k: float(v) for k, v in model.params.as_dict().items()})

    tq = jnp.asarray(np.linspace(0, 10, 500), dtype)
    mean, var = model.predict(tq, variance_method="regular")
    band = 2.0 * jnp.sqrt(jnp.maximum(var, 0.0))
    inside = np.mean(np.abs(np.interp(np.asarray(tq), t, f)
                            - np.asarray(mean)) < np.asarray(band))
    rmse = float(jnp.sqrt(jnp.mean(
        (mean - jnp.asarray(np.interp(np.asarray(tq), t, f), dtype)) ** 2)))
    print(f"forecast RMSE vs truth: {rmse:.4f}; 2-sigma coverage of truth: "
          f"{inside:.1%}")
    # success criteria: sub-noise reconstruction, calibrated band
    assert rmse < 0.2, rmse
    assert inside > 0.80, inside


if __name__ == "__main__":
    main()
