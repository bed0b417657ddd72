"""Attribute the headline-config Chebyshev variance error (VERDICT r3 #9).

BENCH_r03 recorded ``scale_rel_err_var_cheb_vs_dense_f64 = 3.3e-3`` while
bench.py claimed the estimator "sits at the f32 node-solve floor (~2e-4)".
This script reproduces the exact headline configuration (n=1e5, d=2, SE
l=0.1, eps=1e-6 -> mtot=29, dense-solver branch) on the CPU backend and
splits the error into its three candidate sources:

  a. node-solve precision  — run the SAME estimator with f64 state
     (interpolation error only survives);
  b. node-solve tolerance  — f32 state, cg_tol 1e-5 vs 1e-7;
  c. interpolation itself  — f32 'regular' (exact per-target) variance at
     the same targets = the f32 solve floor WITHOUT interpolation.

Oracle: numpy dense f64 'regular' formula (utils/f64_oracles.py), the same
oracle the bench scores against.

Run: JAX_PLATFORMS=cpu python scripts/diagnose_cheb_error.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import json

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_var
from gpquad.quadrature import spectral_grid
from gpquad.utils.f64_oracles import efgp_f64_objects, regular_var_f64


def main():
    rng = np.random.default_rng(0)
    n, d = 100_000, 2
    xh = rng.uniform(0, 1, size=(n, d))
    fh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
          + 0.5 * np.sin(7 * xh[:, 0] + 5 * xh[:, 1]))
    yh = fh + 0.1 * rng.normal(size=n)
    xt = rng.uniform(0, 1, size=(512, d))
    sigmasq, eps, ell = 0.01, 1e-6, 0.1

    kern32 = SquaredExponential(lengthscale=jnp.float32(ell),
                                variance=jnp.float32(1.0), dimension=d)
    _, h, mtot = spectral_grid(kern32, eps, 1.0)
    print(f"mtot={mtot} M={mtot**d}")

    # --- f64 oracle on the f32-rounded inputs (same convention as bench)
    x32 = np.asarray(xh, np.float32)
    y32 = np.asarray(yh, np.float32)
    xt32 = np.asarray(xt, np.float32)
    obj = efgp_f64_objects(x32, y32, ell, 1.0, sigmasq, float(h), int(mtot))
    var64 = regular_var_f64(obj, xt32.astype(np.float64))
    vmax = var64.max()
    print(f"var64 range [{var64.min():.3e}, {vmax:.3e}]")

    def scale_rel(v):
        return float(np.max(np.abs(np.asarray(v, np.float64) - var64)) / vmax)

    out = {}
    # --- f32 pipeline (what the bench runs)
    st32 = fit_with_grid(jnp.asarray(x32), jnp.asarray(y32), kern32,
                         sigmasq, h, mtot, cg_tol=1e-6, max_cg_iter=1000)
    for tol in (1e-5, 1e-7):
        vc = predict_var(st32, jnp.asarray(xt32), method="chebyshev",
                         cg_tol=tol, max_cg_iter=600)
        out[f"f32_cheb_tol{tol:g}"] = scale_rel(vc)
    vr = predict_var(st32, jnp.asarray(xt32), method="regular",
                     cg_tol=1e-5, max_cg_iter=600)
    out["f32_regular_tol1e-05"] = scale_rel(vr)
    vr7 = predict_var(st32, jnp.asarray(xt32), method="regular",
                      cg_tol=1e-7, max_cg_iter=600)
    out["f32_regular_tol1e-07"] = scale_rel(vr7)

    # --- f64 pipeline (same estimator, interpolation error only)
    kern64 = SquaredExponential(lengthscale=jnp.float64(ell),
                                variance=jnp.float64(1.0), dimension=d)
    st64 = fit_with_grid(jnp.asarray(x32, jnp.float64),
                         jnp.asarray(y32, jnp.float64), kern64,
                         sigmasq, jnp.float64(h), mtot,
                         cg_tol=1e-10, max_cg_iter=2000)
    vc64 = predict_var(st64, jnp.asarray(xt32, jnp.float64),
                       method="chebyshev", cg_tol=1e-12, max_cg_iter=2000)
    out["f64_cheb"] = scale_rel(vc64)
    vr64 = predict_var(st64, jnp.asarray(xt32, jnp.float64),
                       method="regular", cg_tol=1e-12, max_cg_iter=2000)
    out["f64_regular"] = scale_rel(vr64)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
