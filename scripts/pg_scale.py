"""PG classifier scale benchmark on TPU: cold-start + warm fit vs n.

Regenerates experiments/pg_scale_tpu.json (VERDICT r2 weak-#6: the fused
outer step's first-fit compile was 248.8 s at n=2e4 BEFORE n-bucketing —
smaller n recompiled the giant program per dataset size).  With
``quadrature.bucket_points`` padding n to a 1-2-5 rung the program
compiles once per rung; this script measures the post-fix numbers.

Methodology: each n runs in a FRESH subprocess (honest cold start: full
trace + XLA compile, no in-process caches) with the persistent JAX
compile cache disabled; the warm fit is a second ``fit`` in the same
process (same rung -> no recompile).  Mirrors the reference's scale
demonstration discipline (reference test_timing_profiling.py:18-21).

Run: ``python scripts/pg_scale.py [--ns 20000 100000] [--json out]``
"""
import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def child(n: int) -> None:
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO))
    from gpquad import PolyagammaGPClassifier
    from gpquad.models.sampling import sample_bernoulli_gp_spectral

    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, size=(n, 2))
    yb, _f = sample_bernoulli_gp_spectral(jax.random.PRNGKey(0),
                                          jnp.asarray(X, jnp.float32),
                                          lengthscale=0.4, variance=4.0)
    y = np.asarray(yb).astype(int)

    def make():
        return PolyagammaGPClassifier(max_iter=10, lengthscale_init=0.3,
                                      lr=0.05, n_e_probes=10, n_m_probes=10,
                                      random_state=0, dtype="float32")

    clf = make()
    t0 = time.time()
    clf.fit(X, y)
    first = time.time() - t0

    clf2 = make()
    t0 = time.time()
    clf2.fit(X, y)
    warm = time.time() - t0

    acc = float((clf2.predict(X) == y).mean())
    print(json.dumps({"n": n, "first_fit_s": round(first, 1),
                      "warm_fit_s": round(warm, 2), "acc": round(acc, 4),
                      "lengthscale": round(float(clf2.lengthscale_), 4)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="+", default=[20_000, 100_000])
    ap.add_argument("--json", type=str,
                    default=str(REPO / "experiments" / "pg_scale_tpu.json"))
    ap.add_argument("--child-n", type=int, default=None)
    args = ap.parse_args()

    if args.child_n is not None:
        child(args.child_n)
        return

    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1e9"  # disable

    out = {}
    for n in args.ns:
        r = subprocess.run([sys.executable, __file__, "--child-n", str(n)],
                           capture_output=True, text=True, env=env,
                           timeout=1800)
        line = r.stdout.strip().splitlines()[-1]
        rec = json.loads(line)
        out[str(n)] = {k: v for k, v in rec.items() if k != "n"}
        print(f"n={n}: {rec}")

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
