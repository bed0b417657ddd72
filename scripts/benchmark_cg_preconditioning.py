"""Mean/trace CG iteration counts under diagonal-preconditioner variants.

Port of the reference's ``benchmark_cg_preconditioning_realdata.py``
(diag c*|w|^2 + sigma^2 for c in {none, 1, 10, 100, 1000, N}); writes
``experiments/cg_preconditioning.csv`` with the same column meaning
(rel_soln_err_vs_ref, iters_completed, solve_time_sec).
Run: ``python scripts/benchmark_cg_preconditioning.py``
"""
import argparse
import csv
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4766)
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--lengthscale", type=float, default=0.05,
                    help="small lengthscale reproduces the 'hard' regime")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--usa-temp", action="store_true",
                    help="run on the REAL USA temperature dataset — the "
                         "reference's benchmark_cg_preconditioning_realdata "
                         "configuration (n=4766)")
    ap.add_argument("--out", default="experiments/cg_preconditioning.csv")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import fit_with_grid, quadrature_weights, tensor_grid
    from gpquad.ops.cg import pcg
    from gpquad.ops.nufft import make_nufft
    from gpquad.ops.operators import (convolution_vector, make_A_mean,
                                      make_jacobi_precond)
    from gpquad.ops.toeplitz import make_toeplitz
    from gpquad.quadrature import spectral_grid
    from gpquad.utils.loaders import load_synthetic_gp

    if args.usa_temp:
        from gpquad.utils.loaders import load_usa_temp
        xh, yh = load_usa_temp()
        args.n = len(yh)
    else:
        xh, yh = load_synthetic_gp(n=args.n, d=2,
                                   lengthscale=args.lengthscale,
                                   variance=1.0, noise=0.1, seed=0)
    dtype = jnp.float64 if args.cpu else jnp.float32
    x = jnp.asarray(xh, dtype)
    y = jnp.asarray(yh, dtype)
    kernel = SquaredExponential(lengthscale=jnp.asarray(args.lengthscale, dtype),
                                variance=jnp.asarray(1.0, dtype), dimension=2)
    sigmasq = jnp.asarray(0.1, dtype)
    _, h, mtot = spectral_grid(kernel, args.eps, 1.0)
    d, n = 2, args.n
    m = (mtot - 1) // 2
    xis = tensor_grid(jnp.arange(-m, m + 1, dtype=dtype) * h, d)
    ws = quadrature_weights(kernel, xis, jnp.asarray(h, dtype), d)
    nufft = make_nufft(x, h, mtot)
    toe = make_toeplitz(convolution_vector(m, x, h))
    A = make_A_mean(ws, toe, sigmasq)
    rhs_mean = ws * nufft.type1(y.astype(ws.dtype)).reshape(-1)
    rng = np.random.default_rng(0)
    T = 8
    V = jnp.asarray(rng.integers(0, 2, (T, ws.shape[0])) * 2 - 1, dtype)
    rhs_trace = ws * toe(ws * V.astype(ws.dtype))

    variants = [("none", None)] + [
        (f"diag_{c}ws2", c) for c in (1.0, 10.0, 100.0, 1000.0, float(n))]
    ref_solution = {}
    rows = []
    for name, c in variants:
        M_inv = None if c is None else make_jacobi_precond(ws, sigmasq,
                                                           diag_scale=c)
        for system, rhs in (("mean", rhs_mean), ("trace", rhs_trace)):
            t0 = time.time()
            res = pcg(A, rhs, tol=args.tol, maxiter=4 * ws.shape[0],
                      M_inv=M_inv)
            jax.block_until_ready(res.x)
            dt = time.time() - t0
            key = system
            if key not in ref_solution:
                tight = pcg(A, rhs, tol=1e-10, maxiter=8 * ws.shape[0],
                            M_inv=M_inv)
                ref_solution[key] = tight.x
            rel = float(jnp.linalg.norm(res.x - ref_solution[key])
                        / jnp.linalg.norm(ref_solution[key]))
            iters = (int(res.iters) if system == "mean"
                     else int(jnp.sum(res.conv_iters)))
            rows.append({"precond": name, "system": system,
                         "rel_soln_err_vs_ref": rel,
                         "iters_completed": iters,
                         "solve_time_sec": round(dt, 4),
                         "n": n, "M": int(ws.shape[0]), "mtot": int(mtot),
                         "tol": args.tol})
            print(f"{name:>14} {system:>5}: iters={iters:>6} "
                  f"time={dt:.3f}s rel_err={rel:.2e}")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
