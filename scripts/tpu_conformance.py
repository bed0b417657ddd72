"""Hardware-conformance sweep: every accelerated backend on the real chip.

Interpret-mode tests validate the math but NOT Mosaic lowering: block
shapes legal on the interpreter can be rejected on hardware, and VMEM
footprints only blow up for real (both bit the Pallas SKI interp kernels,
ops/pallas_interp.py — found only when first run on a v5e).  This sweep
runs every NUFFT backend x dimension x mode-ordering combination plus the
Pallas SKI interp kernels against the exact MXU path on whatever backend
``jax.devices()`` provides, so one bounded command certifies the whole
accelerated surface after any kernel change:

    python scripts/tpu_conformance.py          # on the TPU
    python scripts/tpu_conformance.py --cpu    # interpret-mode pre-flight

Exit code 0 iff every combination lowers, runs, and agrees.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--tol", type=float, default=3e-3,
                    help="relative-to-scale agreement vs the MXU path")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from gpquad.ops.nufft import make_nufft

    rng = np.random.default_rng(0)
    n = args.n
    failures = []

    def check(tag, fn):
        t0 = time.perf_counter()
        try:
            err, scale = fn()
            dt = time.perf_counter() - t0
            ok = err <= args.tol * max(scale, 1.0)
            print(f"{'PASS' if ok else 'FAIL'}  {tag:<42} "
                  f"err={err:.2e} scale={scale:.1e} ({dt:.1f}s)")
            if not ok:
                failures.append((tag, f"err {err:.3e}"))
        except Exception as e:  # noqa: BLE001 — report every lowering crash
            print(f"FAIL  {tag:<42} {type(e).__name__}: {str(e)[:90]}")
            failures.append((tag, str(e)[:120]))

    # -- NUFFT backends vs MXU -------------------------------------------
    combos = [(m, d, f)
              for m in ("pallas", "spread", "banded", "sub")
              for d in (1, 2, 3)
              for f in (False, True)]

    def nufft_case(method, d, fft_order, mtot):
        def run():
            x = jnp.asarray(rng.uniform(0, 1, (n, d)), jnp.float32)
            vals = jnp.asarray(rng.normal(size=n), jnp.float32)
            ref_op = make_nufft(x, 0.31, mtot, fft_order=fft_order)
            op = make_nufft(x, 0.31, mtot, fft_order=fft_order,
                            method=method)

            @jax.jit
            def drive(ref_op, op, vals):
                r1 = ref_op.type1(vals)
                t1 = op.type1(vals)
                fk = r1 / (1.0 + jnp.abs(r1))
                r2 = ref_op.type2(fk)
                t2 = op.type2(fk)
                e = jnp.maximum(jnp.max(jnp.abs(t1 - r1)),
                                jnp.max(jnp.abs(t2 - r2)))
                s = jnp.maximum(jnp.max(jnp.abs(r1)), jnp.max(jnp.abs(r2)))
                return e, s

            e, s = drive(ref_op, op, vals)
            return float(e), float(s)
        return run

    for method, d, fft_order in combos:
        supported = ((method == "pallas" and d in (1, 2, 3))
                     or (method == "spread" and d == 2 and not fft_order)
                     or (method == "banded" and d in (2, 3) and not fft_order)
                     or (method == "sub" and d in (2, 3) and not fft_order))
        if not supported:
            continue
        mtot = {1: 201, 2: 41, 3: 15}[d]
        tag = f"nufft[{method}] d={d} fft_order={fft_order} mtot={mtot}"
        check(tag, nufft_case(method, d, fft_order, mtot))

    # large-mtot d=3 pallas: exercises the mode-tiled first dim (cap was
    # VMEM-bound at 56 before tiling, ops/nufft.py round-2 note)
    check("nufft[pallas] d=3 mtot=81 (mode-tiled)",
          nufft_case("pallas", 3, False, 81))

    # -- Pallas SKI interp kernels vs the scatter/gather path -------------
    def ski_case(B):
        def run():
            import dataclasses
            from gpquad.kernels import SquaredExponential
            from gpquad.models.ski import build_ski_operator, set_interp_impl
            x = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
            kern = SquaredExponential(lengthscale=0.3, variance=1.0,
                                      dimension=2)
            op = build_ski_operator(x, kern, (96, 96),
                                    ((-1.0, 1.0), (-1.0, 1.0)))
            u = jnp.asarray(rng.normal(size=(B, n)), jnp.float32)
            v = jnp.asarray(rng.normal(size=(B, op.M)), jnp.float32)
            op_plain = dataclasses.replace(op, banded=None)
            set_interp_impl("pallas")
            try:
                tT = jax.jit(lambda o, w: o.interp_T(w))(op, u)
                tF = jax.jit(lambda o, w: o.interp(w))(op, v)
            finally:
                set_interp_impl("auto")
            rT = jax.jit(lambda o, w: o.interp_T(w))(op_plain, u)
            rF = jax.jit(lambda o, w: o.interp(w))(op_plain, v)
            e = max(float(jnp.max(jnp.abs(tT - rT))),
                    float(jnp.max(jnp.abs(tF - rF))))
            s = max(float(jnp.max(jnp.abs(rT))), float(jnp.max(jnp.abs(rF))))
            return e, s
        return run

    check("ski-interp[pallas] B=4 (single batch tile)", ski_case(4))
    check("ski-interp[pallas] B=40 (batch-tiled grid)", ski_case(40))

    print()
    if failures:
        print(f"FAILED {len(failures)} combination(s):")
        for tag, msg in failures:
            print(f"  - {tag}: {msg}")
        sys.exit(1)
    print("PASS: all accelerated backends conform on",
          jax.devices()[0].platform)


if __name__ == "__main__":
    main()
