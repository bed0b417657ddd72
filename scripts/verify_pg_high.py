"""Certify the PG df64 leg on the real TPU -> experiments/pg_high_accuracy.json.

The reference's PG estimators are float64 end-to-end
(reference pg_classifier.py:1094); gpquad's df64 leg
(models/pg_high.pg_predict_high) must deliver <=1e-6-class agreement with
the numpy-f64 dense feature system (utils/f64_oracles.pg_*_f64) ON THE
CHIP, same discipline as scripts/verify_hard_high_accuracy.py for the
regression side.

Also records the f32 production path's agreement on the same problem (the
gap between the two IS the df64 leg's value), and a second config with a
Matérn-3/2 kernel (the reference PG is SE-only).

Run (TPU): python scripts/verify_pg_high.py
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def one_config(name, kern_factory, n, d, eps, rng):
    import jax
    import jax.numpy as jnp
    from gpquad.models import pg_core as core
    from gpquad.models.pg_high import pg_predict_high
    from gpquad.quadrature import spectral_grid
    from gpquad.utils.f64_oracles import (pg_beta_mean_f64, pg_f64_objects,
                                          pg_mean_f64, pg_var_f64)

    x = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    kern = kern_factory()
    _, h, mtot = spectral_grid(kern, eps, 1.0)
    delta = (0.1 + 0.15 * rng.uniform(size=n)).astype(np.float32)
    kappa = (rng.integers(0, 2, n) - 0.5).astype(np.float32)
    xt = rng.uniform(0.1, 0.9, size=(128, d)).astype(np.float32)

    t0 = time.time()
    res = pg_predict_high(x, kern, float(h), int(mtot), delta, kappa, xt)
    mean_df = np.asarray(res.mean, np.float64)   # real host reads only
    var_df = np.asarray(res.var, np.float64)
    t_cold = time.time() - t0
    t0 = time.time()
    res = pg_predict_high(x, kern, float(h), int(mtot), delta, kappa, xt)
    mean_df = np.asarray(res.mean, np.float64)
    var_df = np.asarray(res.var, np.float64)
    t_warm = time.time() - t0

    # f32 production path on the same problem
    sp = core.build_pg_spectral_state(jnp.asarray(x), kern,
                                      jnp.float32(h), mtot=int(mtot))
    beta32, _ = core.solve_beta_mean(sp, jnp.asarray(x),
                                     jnp.asarray(delta),
                                     jnp.asarray(kappa), cg_tol=1e-6)
    mean32 = np.asarray(core.predictive_mean(sp, jnp.asarray(xt), beta32),
                        np.float64)
    var32 = np.asarray(core.predictive_variance_exact(
        sp, jnp.asarray(x), jnp.asarray(delta), jnp.asarray(xt),
        cg_tol=1e-6), np.float64)

    obj = pg_f64_objects(x, delta, kern, float(h), int(mtot))
    beta64 = pg_beta_mean_f64(obj, kappa)
    mean64 = pg_mean_f64(obj, xt, beta64)
    var64 = pg_var_f64(obj, xt)
    ms, vs = np.max(np.abs(mean64)), np.max(var64)
    out = {
        "n": n, "d": d, "mtot": int(mtot), "M": int(mtot) ** d,
        "cold_s": round(t_cold, 2), "warm_s": round(t_warm, 3),
        "rel_err_mean_high": float(np.max(np.abs(mean_df - mean64)) / ms),
        "rel_err_var_high": float(np.max(np.abs(var_df - var64)) / vs),
        "rel_err_mean_f32": float(np.max(np.abs(mean32 - mean64)) / ms),
        "rel_err_var_f32": float(np.max(np.abs(var32 - var64)) / vs),
    }
    out["pass_1e6"] = bool(out["rel_err_mean_high"] < 1e-6
                           and out["rel_err_var_high"] < 1e-6)
    print(name, json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=str(
        REPO / "experiments" / "pg_high_accuracy.json"))
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gpquad.kernels import Matern, SquaredExponential

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0]),
           "backend": jax.devices()[0].platform}
    out["se_2d"] = one_config(
        "se_2d", lambda: SquaredExponential(lengthscale=jnp.float32(0.25),
                                            variance=jnp.float32(2.0),
                                            dimension=2),
        args.n, 2, 1e-4, rng)
    out["matern32_2d"] = one_config(
        "matern32_2d", lambda: Matern(lengthscale=jnp.float32(0.3),
                                      variance=jnp.float32(1.5), nu=1.5,
                                      dimension=2),
        args.n, 2, 1e-3, rng)
    out["all_pass"] = bool(out["se_2d"]["pass_1e6"]
                           and out["matern32_2d"]["pass_1e6"])
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("ALL PASS" if out["all_pass"] else "FAIL", "->", args.json)


if __name__ == "__main__":
    main()
