"""EFGP vs SKI vs dense-exact hyper-learning on REAL data (USA temp).

The committed real-data result (VERDICT r2 #7): the USA temperature
station dataset (n=4766) is the real dataset behind the reference's
committed CG-preconditioning CSV
(reference benchmark_cg_preconditioning_realdata.py:67-73 /
experiments/cg_preconditioning_realdata.csv) — used here for the full
EFGP/SKI/dense shootout with an 80/20 train/val split, mirroring the
reference's OISST shootout discipline
(reference oisst_experiment/diagnose_oisst_ski_vs_efgp.py:1).

Contenders and PASS criteria follow scripts/shootout_efgp_ski_dense.py
(whose run_* drivers are reused verbatim): dense is the quality ceiling;
EFGP must land within 10% of dense; SKI within 60%.

Run: ``python scripts/shootout_usa_temp.py [--iters 20] [--json out]``
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from shootout_efgp_ski_dense import rmse, run_dense, run_efgp, run_ski

from gpquad.utils.loaders import load_usa_temp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--val-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    x_all, y_all = load_usa_temp()
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(y_all))
    n_val = int(round(args.val_frac * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x, y = x_all[ti], y_all[ti]
    xv, yv = x_all[vi], y_all[vi]
    print(f"usa_temp: n_train={len(y)} n_val={len(yv)} "
          f"(y standardized, x unit square)")

    results = {}
    for name, fn in (("efgp", lambda: run_efgp(x, y, xv, iters=args.iters,
                                               eps=args.eps)),
                     ("dense", lambda: run_dense(x, y, xv,
                                                 iters=3 * args.iters)),
                     ("ski", lambda: run_ski(x, y, xv, iters=args.iters))):
        r = fn()
        r["val_rmse"] = rmse(r.pop("mean"), yv)
        results[name] = r
        print(f"[{name:>5}] val_rmse={r['val_rmse']:.4f}  "
              f"ls={r['lengthscale']:.4f}  var={r['variance']:.4f}  "
              f"noise={r['noise']:.4f}  fit={r['fit_sec']:.1f}s")

    checks = {
        "efgp_within_10pct_of_dense":
            results["efgp"]["val_rmse"] < 1.10 * results["dense"]["val_rmse"],
        "ski_within_60pct_of_dense":
            results["ski"]["val_rmse"] < 1.60 * results["dense"]["val_rmse"],
    }
    out = {"dataset": "usa_temp", "n_train": len(y), "n_val": len(yv),
           "iters": args.iters, "results": results, "checks": checks}
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2, default=float))
    ok = all(checks.values())
    print("PASS" if ok else "FAIL", checks)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
