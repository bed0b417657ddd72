"""Time the three SKI interp_T backends: scatter vs banded-einsum vs Pallas.

W^T u is SKI's hot op (every CG iteration); the reference leaves it to
GPyTorch's scatter (utils/ski.py:181-401 via InterpolatedLazyTensor).
Measured on TPU v5e at n=2e5, grid 512^2, B=4: interp_T scatter ~80 ms,
banded-einsum ~28 ms, Pallas ~30 ms; forward interp gather ~64 ms,
Pallas ~40 ms; full SKI matvec (W K_g W^T + s2) einsum ~73 ms, Pallas
~50 ms.  The Pallas bin-sorted kernels keep the one-hot selectors in
VMEM (ops/pallas_interp.py).

On CPU this still checks three-way agreement but timings are not
meaningful (Pallas runs interpreted).  Sync via scalar host read —
block_until_ready is a no-op on axon.

Run: ``python scripts/time_ski_interp.py [--n 200000] [--grid 512]
[--batch 4] [--cpu]``
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from gpquad.kernels import SquaredExponential
    from gpquad.models.ski import build_ski_operator, set_interp_impl

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (args.n, 2)), jnp.float32)
    kern = SquaredExponential(lengthscale=0.3, variance=1.0, dimension=2)
    g = args.grid
    op = build_ski_operator(x, kern, (g, g), ((-1.0, 1.0), (-1.0, 1.0)))
    u = jnp.asarray(rng.normal(size=(args.batch, args.n)), jnp.float32)

    v = jnp.asarray(rng.normal(size=(args.batch, op.M)), jnp.float32)
    runs = {}

    def bench(tag, impl, operator, apply, inp):
        # the operator rides through jit as a pytree argument: closing over
        # it would embed its complex kernel FFT as an eager constant, which
        # the axon TPU runtime cannot materialize (UNIMPLEMENTED)
        set_interp_impl(impl)
        try:
            f = jax.jit(apply)
            out = f(operator, inp)
            s = float(jnp.sum(jnp.abs(out)))      # compile + settle
            best = float("inf")
            for _r in range(args.repeats):
                t0 = time.perf_counter()
                out = f(operator, inp)
                s = float(jnp.sum(jnp.abs(out)))  # host read = sync
                best = min(best, time.perf_counter() - t0)
        finally:
            set_interp_impl("auto")
        runs[tag] = (best, np.asarray(out))
        print(f"{tag:>22}: {best*1e3:8.2f} ms   checksum {s:.6e}")

    op_scatter = dataclasses.replace(op, banded=None)
    print(f"-- interp_T (points -> grid), n={args.n}, grid {g}^2, "
          f"B={args.batch} --")
    bench("scatter", "einsum", op_scatter, lambda o, w: o.interp_T(w), u)
    bench("banded-einsum", "einsum", op, lambda o, w: o.interp_T(w), u)
    bench("pallas", "pallas", op, lambda o, w: o.interp_T(w), u)
    print("-- interp (grid -> points) --")
    bench("gather", "einsum", op, lambda o, w: o.interp(w), v)
    bench("pallas-fwd", "pallas", op, lambda o, w: o.interp(w), v)
    print("-- full matvec (W K_g W^T + s2) --")
    # fresh lambda per bench: jit's cache is keyed on the callable, and a
    # shared one would silently reuse the first backend's executable
    bench("matvec-einsum", "einsum", op, lambda o, w: o.matvec(w, 0.1), u)
    bench("matvec-pallas", "pallas", op, lambda o, w: o.matvec(w, 0.1), u)

    for tag, ref_tag in (("banded-einsum", "scatter"), ("pallas", "scatter"),
                         ("pallas-fwd", "gather"),
                         ("matvec-pallas", "matvec-einsum")):
        ref = runs[ref_tag][1]
        err = np.abs(runs[tag][1] - ref).max()
        print(f"max |{tag} - {ref_tag}| = {err:.3e}")
        assert err < 1e-3 * max(1.0, np.abs(ref).max()), (tag, err)
    print("PASS: all backends agree")


if __name__ == "__main__":
    main()
