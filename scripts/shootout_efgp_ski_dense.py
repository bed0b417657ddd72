"""EFGP vs SKI vs dense-exact hyper-learning shootout on the frozen raster.

Port of the reference's OISST shootout
(reference: oisst_experiment/diagnose_oisst_ski_vs_efgp.py:1 — the script
whose JSON produced BASELINE.md's val-RMSE anchors 0.1300 EFGP /
0.1139 dense / 0.1713 SKI).  Here the frozen committed raster
(``data/frozen_raster_v1.npz``, scripts/make_frozen_raster.py) replaces the
OISST download so the anchors are reproducible offline forever.

Each contender learns (lengthscale, variance, noise) by its own route:

  - EFGP: stochastic hyper-gradients + Adam (gpquad.models.model.EFGP)
  - dense: exact log-marginal autograd + Adam (the quality ceiling)
  - SKI:  MLL via CG + Hutchinson on the grid-interpolation operator

and reports validation RMSE against the held-out noisy targets plus the
noise-free field.  PASS criteria (printed at the end, exit code reflects
them):

  1. dense val-RMSE within 15% of the observation noise 0.10,
  2. EFGP val-RMSE within 10% of dense (matching the reference's gap,
     0.1300/0.1139 = 1.14),
  3. SKI val-RMSE within 60% of dense (reference gap 0.1713/0.1139 = 1.50).

Run: ``python scripts/shootout_efgp_ski_dense.py [--iters 20] [--json out]``
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
from gpquad.models.model import EFGP
from gpquad.models.ski import fit_ski_gp, ski_predict_mean

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"


def rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


def run_efgp(x, y, xv, *, iters, eps):
    t0 = time.time()
    model = EFGP(jnp.asarray(x), jnp.asarray(y), "SE", eps=eps,
                 opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500})
    model.optimize_hyperparameters(max_iters=iters, lr=0.1, trace_samples=10)
    mean, _ = model.predict(jnp.asarray(xv), return_variance=False)
    pos = np.exp(np.asarray(model.params.raw))
    stats = model.last_gradient_stats
    return {
        "mean": np.asarray(mean), "fit_sec": time.time() - t0,
        "lengthscale": float(pos[0]), "variance": float(pos[1]),
        "noise": float(pos[-1]),
        "mean_cg_iters": float(stats.get("mean_cg_iters", np.nan)),
        "trace_cg_iters": float(stats.get("trace_cg_iters", np.nan)),
    }


def run_dense(x, y, xv, *, iters):
    """Exact dense-GP hyper-learning: autograd through Cholesky
    (reference utils/gradient_tests.py vanilla oracle + Adam)."""
    t0 = time.time()
    x_t, y_t = jnp.asarray(x), jnp.asarray(y)

    def nll(raw):
        l, v, s2 = jnp.exp(raw)
        kern = SquaredExponential(lengthscale=l, variance=v, dimension=2)
        return -kern.log_marginal(x_t, y_t, s2)

    raw = jnp.log(jnp.asarray([0.2, float(np.var(y)),
                               0.1 * float(np.var(y))]))
    tx = optax.adam(0.1)
    opt_state = tx.init(raw)
    step = jax.jit(lambda raw, st: (lambda g: tx.update(g, st, raw))(
        jax.grad(nll)(raw)))
    for _ in range(iters):
        updates, opt_state = step(raw, opt_state)
        raw = optax.apply_updates(raw, updates)
    l, v, s2 = np.exp(np.asarray(raw))
    kern = SquaredExponential(lengthscale=float(l), variance=float(v),
                              dimension=2)
    K = np.asarray(kern.kernel_matrix(x_t, x_t)) + s2 * np.eye(len(x))
    Ks = np.asarray(kern.kernel_matrix(jnp.asarray(xv), x_t))
    mean = Ks @ np.linalg.solve(K, np.asarray(y))
    return {"mean": mean, "fit_sec": time.time() - t0,
            "lengthscale": float(l), "variance": float(v),
            "noise": float(s2)}


def run_ski(x, y, xv, *, iters):
    t0 = time.time()
    out = fit_ski_gp(x, y, kernel="SE", target_grid_points=4096,
                     max_iters=iters, lr=0.1, verbose=False,
                     dtype=jnp.float64, cg_tolerance=1e-4,
                     max_cg_iterations=200)
    mean = np.asarray(ski_predict_mean(out, jnp.asarray(xv)))
    pos = np.exp(np.asarray(out["model"]["raw"]))
    return {"mean": mean, "fit_sec": time.time() - t0,
            "lengthscale": float(pos[0]), "variance": float(pos[1]),
            "noise": float(pos[2]),
            "final_loss": out["history"]["loss"][-1]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    blob = np.load(DATA)
    x, y = blob["x_train"], blob["y_train"]
    xv, yv, fv = blob["x_val"], blob["y_val"], blob["f_val"]
    noise = float(blob["meta"][1])
    print(f"frozen raster: n_train={len(x)} n_val={len(xv)} noise={noise}")

    results = {}
    for name, fn in (("efgp", lambda: run_efgp(x, y, xv, iters=args.iters,
                                               eps=args.eps)),
                     ("dense", lambda: run_dense(x, y, xv,
                                                 iters=3 * args.iters)),
                     ("ski", lambda: run_ski(x, y, xv, iters=args.iters))):
        r = fn()
        r["val_rmse"] = rmse(r.pop("mean"), yv)
        # also vs the noise-free field (floor is estimation error alone)
        results[name] = r
        print(f"[{name:>5}] val_rmse={r['val_rmse']:.4f}  "
              f"ls={r['lengthscale']:.4f}  var={r['variance']:.4f}  "
              f"noise={r['noise']:.4f}  fit={r['fit_sec']:.1f}s")

    checks = {
        "dense_near_noise": results["dense"]["val_rmse"] < 1.15 * noise,
        "efgp_within_10pct_of_dense":
            results["efgp"]["val_rmse"] < 1.10 * results["dense"]["val_rmse"],
        "ski_within_60pct_of_dense":
            results["ski"]["val_rmse"] < 1.60 * results["dense"]["val_rmse"],
    }
    out = {"iters": args.iters, "noise": noise, "results": results,
           "checks": checks}
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2, default=float))
    ok = all(checks.values())
    print("PASS" if ok else "FAIL", checks)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
