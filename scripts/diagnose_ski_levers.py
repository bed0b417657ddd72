"""Diagnose which SKI levers matter most (frozen-raster edition).

TPU-native analogue of the reference's
oisst_experiment/diagnose_ski_levers.py:1-40, which separates three
error sources in the SKI baseline:

1. optimization / estimator budget (Adam steps, Hutchinson probes),
2. iterative-training artifacts (CG tolerance / budget, SLQ),
3. interpolation bias from the SKI grid itself.

Here each lever is swept one-at-a-time around the committed shootout
config (experiments/shootout_frozen_raster.json: SKI val-RMSE 0.1025 at
grid 4096 / 20 iters / cg_tol 1e-4) on the frozen raster, reporting
val RMSE + learned hypers + fit time per setting, plus two
attributions per lever family:

* ``headroom`` — how much RMSE IMPROVES when the family gets more
  capacity (finer grid, more iters/probes, tighter CG).  Nonzero
  headroom = that lever currently limits the baseline.
* ``sensitivity`` — how much RMSE degrades when the family is starved
  (coarse grid, few iters, loose CG).  Reported for context only: a
  deliberately-loosened tolerance obviously hurts and says nothing
  about the baseline.

PASS: no family has relative headroom > 2% (the committed shootout
config is converged — each error source the reference separates,
diagnose_ski_levers.py:6-8, is driven to its floor).

Run: ``python scripts/diagnose_ski_levers.py [--json out]``
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

from gpquad.models.ski import fit_ski_gp, ski_predict_mean

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"

BASE = dict(target_grid_points=4096, max_iters=20, cg_tolerance=1e-4,
            max_cg_iterations=200, num_trace_samples=2)

#   (key, value, direction): +1 = more capacity than BASE, -1 = starved
LEVERS = {
    "grid": [("target_grid_points", 256, -1), ("target_grid_points", 1024, -1),
             ("target_grid_points", 16384, +1)],
    "budget": [("max_iters", 5, -1), ("max_iters", 40, +1),
               ("num_trace_samples", 8, +1)],
    "cg": [("cg_tolerance", 1e-1, -1), ("cg_tolerance", 1e-6, +1),
           ("max_cg_iterations", 25, -1)],
}


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def run_one(x, y, xv, yv, **overrides):
    cfg = dict(BASE)
    cfg.update(overrides)
    t0 = time.time()
    out = fit_ski_gp(x, y, kernel="SE", lr=0.1, verbose=False,
                     dtype=jnp.float64, **cfg)
    mean = np.asarray(ski_predict_mean(out, jnp.asarray(xv)))
    pos = np.exp(np.asarray(out["model"]["raw"]))
    return {"val_rmse": rmse(mean, yv), "fit_sec": time.time() - t0,
            "lengthscale": float(pos[0]), "variance": float(pos[1]),
            "noise": float(pos[2]), "config": cfg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    blob = np.load(DATA)
    x, y = blob["x_train"], blob["y_train"]
    xv, yv = blob["x_val"], blob["y_val"]
    print(f"frozen raster: n_train={len(x)} n_val={len(xv)}")

    base = run_one(x, y, xv, yv)
    print(f"[base] val_rmse={base['val_rmse']:.4f} fit={base['fit_sec']:.1f}s"
          f"  {BASE}")

    runs = {"base": base}
    headroom, sensitivity = {}, {}
    for family, settings in LEVERS.items():
        hr = sens = 0.0
        for key, val, direction in settings:
            r = run_one(x, y, xv, yv, **{key: val})
            tag = f"{key}={val}"
            runs[tag] = r
            delta = r["val_rmse"] - base["val_rmse"]
            if direction > 0:
                hr = max(hr, -delta)        # improvement from more capacity
            else:
                sens = max(sens, delta)     # degradation when starved
            print(f"[{family:>6}] {tag:<24} val_rmse={r['val_rmse']:.4f} "
                  f"(delta {delta:+.4f})  fit={r['fit_sec']:.1f}s")
        headroom[family] = hr
        sensitivity[family] = sens

    rel_head = {f: s / base["val_rmse"] for f, s in headroom.items()}
    checks = {"baseline_converged_no_headroom": max(rel_head.values()) <= 0.02}
    out = {"base": base, "runs": runs, "headroom": headroom,
           "sensitivity": sensitivity, "relative_headroom": rel_head,
           "checks": checks}
    print(json.dumps({"headroom": headroom, "sensitivity": sensitivity,
                      "relative_headroom": rel_head,
                      "checks": checks}, indent=2, default=float))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2, default=float))
    if not all(checks.values()):
        print("FAIL", file=sys.stderr)
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
