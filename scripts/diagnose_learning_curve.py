"""Stage-timing diagnostics over a hyper-learning run.

Port of the reference's ``diagnose_efgpnd_learning_curve.py``: per-iteration
wall-clock broken into grid planning / gradient / bookkeeping, plus CG
iteration trajectories (the reference instruments CG with
RecordingConjugateGradients; here the solver returns its counters).
Run: ``python scripts/diagnose_learning_curve.py [--cpu]``
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    from gpquad.models.model import EFGP
    from gpquad.utils.loaders import load_synthetic_gp
    from gpquad.utils.profiling import StageTimer

    dtype = jnp.float64 if args.cpu else jnp.float32
    xh, yh = load_synthetic_gp(n=args.n, d=2, lengthscale=0.15, variance=1.0,
                               noise=0.05, seed=0)
    model = EFGP(jnp.asarray(xh, dtype), jnp.asarray(yh, dtype), "SE",
                 eps=1e-3)
    timer = StageTimer()

    for it in range(args.iters):
        with timer.time("1_grid_plan"):
            h, mtot, hm = model._grid_plan(True)
        with timer.time("2_gradient"):
            g = model.compute_gradients(trace_samples=8)
            float(jnp.sum(jnp.abs(g)))     # force completion
        stats = model.last_gradient_stats
        with timer.time("3_adam_bookkeeping"):
            model.params = model.params.replace_raw(
                model.params.raw - 0.05 * g)
        print(f"iter {it}: mtot={mtot} mean_cg={stats['mean_cg_iters']} "
              f"trace_cg={stats['trace_cg_iters']} "
              f"grad={np.array2string(np.asarray(g), precision=3)}")

    print()
    print(timer.table())


if __name__ == "__main__":
    main()
