"""REAL data, REAL hardware: EFGP hyper-learning on the TPU (VERDICT r3 #3).

The four committed real-data artifacts (usa_temp / world_temp /
europe_pm25 / transcriptomics shootouts) pin the CPU-f64 backend — they
are quality anchors.  This script runs the SAME hyper-learning protocol
(EFGP facade, 20 Adam iters, lr=0.1, trace_samples=10, eps=1e-4) on the
real TPU chip in f32 and checks the val-RMSE lands within noise of the
committed CPU anchor, finally putting the reference's real-data quality
discipline (oisst_experiment/diagnostics/oisst_probe_reuse_summary.json)
and the TPU perf story on the same problem.

Cold = first full optimize+predict wall-clock (includes every bucket-rung
compile); warm = identical rerun from the same start params (same rungs,
all programs cached).

Writes experiments/realdata_tpu.json with PASS checks:
  val-RMSE within --rmse-rtol (default 5%) of the CPU-f64 anchor.

Run (TPU): ``python scripts/realdata_tpu_timing.py``
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def run_one(name, loader, anchor_file, iters, eps, rmse_rtol, seed=0):
    import jax
    import jax.numpy as jnp
    from gpquad.models.model import EFGP

    x_all, y_all = loader()
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(y_all))
    n_val = int(round(0.2 * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x = jnp.asarray(x_all[ti], jnp.float32)
    y = jnp.asarray(y_all[ti], jnp.float32)
    xv = jnp.asarray(x_all[vi], jnp.float32)
    yv = np.asarray(y_all[vi], np.float64)

    def fit_predict():
        model = EFGP(x, y, "SE", eps=eps,
                     opts={"cg_tolerance": 1e-6, "max_cg_iterations": 500})
        model.key = jax.random.PRNGKey(seed)
        model.optimize_hyperparameters(max_iters=iters, lr=0.1,
                                       trace_samples=10)
        mean, _ = model.predict(xv, return_variance=False)
        # scalar host read = the only reliable sync on axon
        rmse = float(np.sqrt(np.mean((np.asarray(mean, np.float64)
                                      - yv) ** 2)))
        return model, rmse

    t0 = time.time()
    model, rmse_cold = fit_predict()
    cold_s = time.time() - t0
    t0 = time.time()
    model, rmse = fit_predict()
    warm_s = time.time() - t0

    anchor = json.load(open(REPO / "experiments" / anchor_file))
    rmse_cpu = anchor["results"]["efgp"]["val_rmse"]
    cpu_fit_sec = anchor["results"]["efgp"]["fit_sec"]
    pos = np.exp(np.asarray(model.params.raw))
    out = {
        "n_train": int(len(ti)), "n_val": int(n_val), "iters": iters,
        "eps": eps, "cold_s": round(cold_s, 2), "warm_s": round(warm_s, 2),
        "val_rmse_tpu_f32": round(rmse, 6), "val_rmse_cold": round(
            rmse_cold, 6),
        "val_rmse_cpu_f64_anchor": round(rmse_cpu, 6),
        "cpu_f64_fit_sec_anchor": round(cpu_fit_sec, 2),
        "speedup_warm_vs_cpu_anchor": round(cpu_fit_sec / warm_s, 1),
        "lengthscale": float(pos[0]), "variance": float(pos[1]),
        "noise": float(pos[-1]),
        "pass_rmse_within_rtol": bool(
            abs(rmse - rmse_cpu) <= rmse_rtol * rmse_cpu),
    }
    print(name, json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--rmse-rtol", type=float, default=0.05)
    ap.add_argument("--json", type=str,
                    default=str(REPO / "experiments" / "realdata_tpu.json"))
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the script on the CPU backend")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from gpquad.utils.loaders import load_usa_temp, load_world_temp

    out = {"device": str(jax.devices()[0]),
           "backend": jax.devices()[0].platform,
           "protocol": "EFGP facade, 20 Adam iters, lr=0.1, "
                       "trace_samples=10, 80/20 split, seed 0 "
                       "(same as the CPU-f64 shootout anchors)"}
    out["usa_temp"] = run_one("usa_temp", load_usa_temp,
                              "usa_temp_shootout.json", args.iters,
                              args.eps, args.rmse_rtol)
    out["world_temp"] = run_one("world_temp", load_world_temp,
                                "world_temp_shootout.json", args.iters,
                                args.eps, args.rmse_rtol)
    out["all_pass"] = bool(out["usa_temp"]["pass_rmse_within_rtol"]
                           and out["world_temp"]["pass_rmse_within_rtol"])
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print("ALL PASS" if out["all_pass"] else "FAIL", "->", args.json)


if __name__ == "__main__":
    main()
