"""SKI smoke-run over available datasets (port of verify_ski_realdata.py).

Runs the SKI baseline for a few iterations on each loadable dataset (real
loaders when files exist under GPQUAD_DATA_DIR, synthetic otherwise) and
reports losses.
Run: ``python scripts/verify_ski.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-sub", type=int, default=2000)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np
    from gpquad.models.ski import fit_ski_gp
    from gpquad.utils import loaders

    datasets = []
    for name, fn in (("era5", loaders.load_era5),
                     ("oisst", loaders.load_oisst),
                     ("roads", loaders.load_roads),
                     ("co2", loaders.load_co2)):
        try:
            x, y = fn(n_sub=args.n_sub, seed=0)
            datasets.append((name, x, y))
        except FileNotFoundError:
            print(f"[skip] {name}: dataset files not present")
    x, y = loaders.load_synthetic_gp(n=args.n_sub, d=2, lengthscale=0.2,
                                     seed=0)
    datasets.append(("synthetic", x, y))

    failures = 0
    for name, x, y in datasets:
        y = (y - y.mean()) / (y.std() + 1e-12)
        try:
            out = fit_ski_gp(x, y, kernel="SE", target_grid_points=4096,
                             max_iters=5, verbose=False)
            print(f"[ok]  {name:>10}: n={len(y)} grid={out['grid_size']} "
                  f"loss {out['history']['loss'][0]:.4f} -> "
                  f"{out['history']['loss'][-1]:.4f}")
        except Exception as e:  # pragma: no cover
            failures += 1
            print(f"[FAIL] {name}: {e}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
