"""Per-block trace-CG tail diagnostic: which probe right-hand sides drag.

Port of the reference's ``diagnose_sigma_noise_trace_blocks.py:1-111``,
which renders per-RHS CG iteration counts for the lengthscale / variance /
noise trace blocks under several Jacobi preconditioners.  Here the
per-RHS convergence iterations come straight out of the batched
masked-lane PCG (``GradientResult.trace_conv_iters``,
gpquad/models/gradient.py:54-56) — no bespoke CG loop needed; the
sigma_f^2 block is absent by design (the repo's estimator computes it
algebraically rather than with probe solves, gradient.py:218-220).

PASS: the preconditioned per-block tail ratio (max iters / median iters)
stays under ``--tail-threshold`` AND preconditioning does not lose to the
unpreconditioned solve on any block.

Run: ``python scripts/diagnose_trace_blocks.py [--trace-samples 8]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from gpquad.kernels import SquaredExponential
from gpquad.models.gradient import gradient_with_grid
from gpquad.quadrature import spectral_grid


def per_block_iters(conv_iters: np.ndarray, T: int, labels):
    """Split the flat ((tk+1)*T,) per-RHS iteration vector into blocks
    (kernel trace blocks first, noise block last — gradient.py:190-192)."""
    blocks = {}
    for b, label in enumerate(labels):
        blocks[label] = conv_iters[b * T:(b + 1) * T]
    return blocks


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--lengthscale", type=float, default=0.03)
    ap.add_argument("--variance", type=float, default=10.0)
    ap.add_argument("--sigmasq", type=float, default=1e-4)
    ap.add_argument("--eps", type=float, default=1e-4)
    ap.add_argument("--trace-samples", type=int, default=8)
    ap.add_argument("--cg-tol", type=float, default=1e-3)
    ap.add_argument("--tail-threshold", type=float, default=20.0)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    n, d = args.n, 2
    xh = rng.uniform(0, 1, size=(n, d))
    fh = np.sin(4 * np.pi * xh[:, 0]) * np.cos(3 * np.pi * xh[:, 1])
    yh = fh + 0.1 * rng.normal(size=n)
    x = jnp.asarray(xh, jnp.float64)
    y = jnp.asarray(yh, jnp.float64)
    kernel = SquaredExponential(lengthscale=jnp.float64(args.lengthscale),
                                variance=jnp.float64(args.variance),
                                dimension=d)
    _, h, mtot = spectral_grid(kernel, args.eps, 1.0)
    T = args.trace_samples
    labels = ["dlengthscale", "dsigmanoise"]

    print(f"n={n} mtot={int(mtot)} M={int(mtot)**d} "
          f"ell={args.lengthscale} var={args.variance} "
          f"sigmasq={args.sigmasq} cg_tol={args.cg_tol}")

    ok = True
    tails = {}
    for precond in (False, True):
        res = gradient_with_grid(
            x, y, kernel, jnp.float64(args.sigmasq), jnp.float64(h),
            jax.random.PRNGKey(0), mtot=int(mtot), trace_samples=T,
            cg_tol=args.cg_tol, max_cg_iter=4000, solver="cg",
            use_trace_precond=precond)
        conv = np.asarray(res.trace_conv_iters)
        blocks = per_block_iters(conv, T, labels)
        name = "jacobi" if precond else "none"
        print(f"\nPreconditioner: {name}")
        for label, iters in blocks.items():
            med = float(np.median(iters))
            mx = int(np.max(iters))
            ratio = mx / max(med, 1.0)
            tails[(name, label)] = (med, mx, ratio)
            print(f"  {label:<14} per-RHS iters: "
                  f"{np.array2string(iters, max_line_width=70)}"
                  f"  median={med:.0f} max={mx} tail-ratio={ratio:.2f}")

    for label in labels:
        med_n, mx_n, _ = tails[("none", label)]
        med_j, mx_j, ratio_j = tails[("jacobi", label)]
        if ratio_j > args.tail_threshold:
            print(f"FAIL: {label} jacobi tail-ratio {ratio_j:.1f} > "
                  f"{args.tail_threshold}")
            ok = False
        if mx_j > mx_n:
            print(f"FAIL: {label} jacobi max iters {mx_j} worse than "
                  f"unpreconditioned {mx_n}")
            ok = False
    print("\nPASS" if ok else "\nFAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
