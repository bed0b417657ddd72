"""Probe-reuse study: fresh vs frozen Hutchinson probes across Adam steps.

Port of the reference's probe-reuse diagnostic
(reference: oisst_experiment/diagnose_probe_reuse.py, whose JSON summary —
oisst_probe_reuse_summary.json — supplied BASELINE.md's EFGP val-RMSE and
CG-iteration anchors): hyper-learning on the frozen raster with

  fresh  — new Rademacher probes every iteration (the default; unbiased
           but the gradient noise re-rolls each step), vs
  reused — one fixed probe set for the whole run (correlated noise; the
           optimizer sees a smooth but slightly biased surface — the
           reference found this competitive and much friendlier to CG
           warm starts).

Reports per-iteration gradient norms, mean/trace CG iterations, final
hypers, validation RMSE, wall time; writes JSON next to the other
experiment artifacts.  PASS: both runs reach val-RMSE within 25% of the
observation noise and within 10% of each other.

Run: ``python scripts/diagnose_probe_reuse.py [--iters 20] [--json out]``
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

from gpquad.kernels import SquaredExponential
from gpquad.models.efgp import fit_with_grid, predict_mean
from gpquad.models.gradient import gradient_with_grid
from gpquad.quadrature import spectral_grid

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"


def run(x, y, xv, yv, *, iters, trace_samples, reuse, key, mtot, h):
    n, d = x.shape
    M = mtot ** d
    raw = jnp.log(jnp.asarray([0.2, float(np.var(np.asarray(y))),
                               0.1 * float(np.var(np.asarray(y)))]))
    tx = optax.adam(0.1)
    opt_state = tx.init(raw)
    frozen_Z = frozen_V = None
    grads, mean_iters, trace_iters = [], [], []
    beta0 = None
    t0 = time.time()
    for it in range(iters):
        pos = jnp.exp(raw)
        kern = SquaredExponential(lengthscale=pos[0], variance=pos[1],
                                  dimension=d)
        kit = key if reuse else jax.random.fold_in(key, it)
        kz, kv = jax.random.split(kit)
        if not reuse or frozen_Z is None:
            frozen_Z = (jax.random.bernoulli(kz, 0.5, (trace_samples, n))
                        * 2 - 1).astype(x.dtype)
            frozen_V = (jax.random.bernoulli(kv, 0.5, (trace_samples, M))
                        * 2 - 1).astype(x.dtype)
        res = gradient_with_grid(x, y, kern, pos[2], h, kit, mtot=mtot,
                                 trace_samples=trace_samples, cg_tol=1e-5,
                                 probes=(frozen_Z, frozen_V), beta0=beta0)
        beta0 = res.beta
        grad_raw = res.grad * pos
        updates, opt_state = tx.update(grad_raw, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        grads.append(float(jnp.linalg.norm(grad_raw)))
        mean_iters.append(int(res.mean_cg_iters))
        trace_iters.append(int(res.trace_cg_iters))
    wall = time.time() - t0
    pos = np.exp(np.asarray(raw))
    kern = SquaredExponential(lengthscale=float(pos[0]),
                              variance=float(pos[1]), dimension=d)
    st = fit_with_grid(x, y, kern, float(pos[2]), h, mtot, cg_tol=1e-8)
    mu = predict_mean(st, jnp.asarray(xv))
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - yv) ** 2)))
    return {"val_rmse": rmse, "lengthscale": float(pos[0]),
            "variance": float(pos[1]), "noise": float(pos[2]),
            "wall_sec": wall, "grad_norms": grads,
            "mean_cg_iters": mean_iters, "trace_cg_iters": trace_iters}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--trace-samples", type=int, default=10)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()
    blob = np.load(DATA)
    x = jnp.asarray(blob["x_train"][:args.n])
    y = jnp.asarray(blob["y_train"][:args.n])
    xv, yv = blob["x_val"], blob["y_val"]
    noise = float(blob["meta"][1])

    kern0 = SquaredExponential(lengthscale=0.2, variance=1.0, dimension=2)
    _, h, mtot = spectral_grid(kern0, 1e-4, 1.0)
    key = jax.random.PRNGKey(0)
    out = {}
    for mode, reuse in (("fresh", False), ("reused", True)):
        r = run(x, y, xv, yv, iters=args.iters,
                trace_samples=args.trace_samples, reuse=reuse, key=key,
                mtot=mtot, h=float(h))
        out[mode] = r
        print(f"[{mode:>6}] val_rmse={r['val_rmse']:.4f} "
              f"ls={r['lengthscale']:.4f} noise={r['noise']:.4f} "
              f"wall={r['wall_sec']:.1f}s "
              f"mean_cg(last)={r['mean_cg_iters'][-1]} "
              f"trace_cg(last)={r['trace_cg_iters'][-1]}")

    checks = {
        "fresh_near_noise": out["fresh"]["val_rmse"] < 1.25 * noise,
        "reused_near_noise": out["reused"]["val_rmse"] < 1.25 * noise,
        "modes_agree": abs(out["fresh"]["val_rmse"]
                           - out["reused"]["val_rmse"])
        < 0.10 * max(out["fresh"]["val_rmse"], out["reused"]["val_rmse"]),
    }
    out["checks"] = checks
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2, default=float))
    ok = all(checks.values())
    print("PASS" if ok else "FAIL", checks)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
