"""Headline benchmark: n=1e5 2-D EFGP fit + predict + hyper-gradient step.

North star (BASELINE.md): posterior mean (10k targets) + posterior
variance + one hyperparameter-gradient step at n=1e5, d=2 in < 1 s on one
TPU v5e chip, with eps=1e-6 quadrature, checked against the f64 dense
solve of the same objective.

The headline path is the fused single-program pipeline
(gpquad.models.pipeline.fit_predict_grad).  Timing forces a scalar host
read per measurement: on the remote-TPU (axon) runtime
``block_until_ready`` does NOT synchronize, so naive timers only measure
the enqueue.

Prints ONE JSON line:
  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": value/1.0}
plus component timings and accuracy fields.
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--targets", type=int, default=10_000)
    ap.add_argument("--eps", type=float, default=1e-6)
    ap.add_argument("--probes", type=int, default=256,
                    help="Hutchinson probes for the stochastic variance")
    ap.add_argument("--trace-samples", type=int, default=10)
    ap.add_argument("--lengthscale", type=float, default=0.1)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip-accuracy", action="store_true")
    ap.add_argument("--nufft-method", default="mxu",
                    choices=["mxu", "pallas", "banded"],
                    help="NUFFT backend for the fused pass (banded wins at "
                         "very large mtot)")
    args = ap.parse_args()

    import jax
    try:  # persistent compile cache cuts reruns' cold start
        jax.config.update("jax_compilation_cache_dir", "/tmp/gpquad_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from gpquad.kernels import SquaredExponential
    from gpquad.models.efgp import (fit_with_grid, predict_mean, predict_var,
                                    resolve_solver)
    from gpquad.models.gradient import gradient_with_grid
    from gpquad.models.pipeline import fit_predict_grad_high
    from gpquad.quadrature import spectral_grid

    rng = np.random.default_rng(0)
    n, d = args.n, 2
    xh = rng.uniform(0, 1, size=(n, d))
    fh = (np.sin(3 * np.pi * xh[:, 0]) * np.cos(2 * np.pi * xh[:, 1])
          + 0.5 * np.sin(7 * xh[:, 0] + 5 * xh[:, 1]))
    yh = fh + 0.1 * rng.normal(size=n)
    x = jnp.asarray(xh, dtype=jnp.float32)
    y = jnp.asarray(yh, dtype=jnp.float32)
    xnew = jnp.asarray(rng.uniform(0, 1, size=(args.targets, d)),
                       dtype=jnp.float32)

    kernel = SquaredExponential(lengthscale=jnp.float32(args.lengthscale),
                                variance=jnp.float32(1.0), dimension=d)
    sigmasq, eps = 0.01, args.eps
    _, h, mtot = spectral_grid(kernel, eps, 1.0)
    key = jax.random.PRNGKey(0)

    @jax.jit
    def _reduce_tree(arrays):
        return sum(jnp.sum(jnp.abs(jnp.real(a)))
                   for a in jax.tree_util.tree_leaves(arrays)
                   if hasattr(a, "dtype"))

    def sync(*arrays):
        """Force completion: ONE fused scalar reduce + host read (axon-safe;
        per-leaf reads cost ~28 ms dispatch each through the tunnel)."""
        return float(_reduce_tree(arrays))

    nufft_caps = None
    if args.nufft_method == "banded":
        from gpquad.models.efgp import plan_nufft_caps
        nufft_caps = plan_nufft_caps(x, float(h), int(mtot))

    def fused():
        # ONE compiled program: fused f32 pass (mean + stochastic variance
        # + hyper-gradient) PLUS the df64 refit + mean that delivers the
        # eps=1e-6 oracle agreement — everything the north star asks for
        # in a single dispatch
        return fit_predict_grad_high(
            x, y, xnew, kernel, sigmasq, h, key, mtot=mtot,
            trace_samples=args.trace_samples, var_probes=args.probes,
            cg_tol=1e-6, var_cg_tol=1e-4, grad_cg_tol=1e-4,
            max_cg_iter=1000, var_max_cg_iter=400,
            nufft_method=args.nufft_method, nufft_caps=nufft_caps)

    t0 = time.time()
    res = fused()
    out = res.fused
    sync(out.mean, out.var, out.grad, res.mean_high)
    compile_s = time.time() - t0

    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        res = fused()
        out = res.fused
        sync(out.mean, out.var, out.grad, res.mean_high)
        times.append(time.time() - t0)
    total = min(times)
    mean_high = res.mean_high

    # component timings (separate dispatches, warmed, float-synced)
    def timed(fn, *fargs, **fkw):
        sync(fn(*fargs, **fkw))           # warm / compile
        t0 = time.time()
        out = fn(*fargs, **fkw)
        sync(out)
        return time.time() - t0, out

    # standalone high-precision (df64) path timing for the component table
    from gpquad.models.precision import fit_high, predict_mean_high

    def high_path():
        hs = fit_high(x, y, kernel, sigmasq, float(h), mtot)
        return hs, predict_mean_high(hs, xnew)

    hs, _ = high_path()                  # warm / compile
    sync(_)
    t0 = time.time()
    hs, mh_sep = high_path()
    sync(mh_sep)
    t_high = time.time() - t0

    t_fit, state = timed(fit_with_grid, x, y, kernel, sigmasq, h, mtot,
                         cg_tol=1e-6, max_cg_iter=1000)
    t_mean, mean = timed(predict_mean, state, xnew)
    t_var, var = timed(predict_var, state, xnew, method="stochastic",
                       key=key, probes=args.probes, cg_tol=1e-4,
                       max_cg_iter=400)
    t_var_cheb, vc = timed(predict_var, state, xnew, method="chebyshev",
                           chebyshev_nodes=20, cg_tol=1e-5, max_cg_iter=600)
    t_grad, gres = timed(gradient_with_grid, x, y, kernel, sigmasq, h, key,
                         mtot=mtot, trace_samples=args.trace_samples,
                         cg_tol=1e-4, max_cg_iter=1000)

    # headline = the single fused program: f32 pass (mean+var+grad) PLUS
    # the high-precision refit+mean delivering the eps=1e-6 oracle
    # agreement — everything the north star asks for in one dispatch
    value = total
    out_json = {
        "metric": "efgp_fit_predict_grad_n1e5_2d_seconds",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(value / 1.0, 4),
        "fused_all_s": round(total, 4),
        "high_precision_fit_mean_standalone_s": round(t_high, 4),
        "high_residual": float(np.asarray(res.high_residual)),
        "n": n, "d": d, "eps": eps, "mtot": int(mtot),
        "M": int(mtot) ** d, "targets": args.targets,
        "probes": args.probes, "trace_samples": args.trace_samples,
        "fit_s": round(t_fit, 4), "mean_s": round(t_mean, 4),
        "var_stochastic_s": round(t_var, 4),
        "var_chebyshev_s": round(t_var_cheb, 4),
        "grad_s": round(t_grad, 4),
        "compile_s": round(compile_s, 2),
        "mean_cg_iters": int(out.mean_cg_iters),
        "mean_cg_converged": bool(np.asarray(out.mean_converged)),
        "solver": resolve_solver("auto", mtot, d),
        "nufft_method": args.nufft_method,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }

    if not args.skip_accuracy:
        # f64 dense solve of the SAME objective on CPU (A beta = D F* y).
        # The oracle must consume the same inputs the device sees: the f32
        # point/target arrays (exact in f64), not the pre-rounding host
        # values — otherwise the two solvers solve different problems at
        # the ~3e-6 phase level.
        xs = np.asarray(x, np.float64)
        ys = np.asarray(y, np.float64)
        M = mtot ** d
        m = (mtot - 1) // 2
        k1 = np.arange(-m, m + 1)
        K = np.stack(np.meshgrid(k1, k1, indexing="ij"), -1).reshape(-1, d)
        F = np.exp(2j * np.pi * (xs @ (h * K.T)))
        xis = (h * K).astype(np.float64)
        l2 = args.lengthscale**2
        S = (2 * np.pi * l2) * np.exp(
            -2 * np.pi**2 * l2 * np.sum(xis**2, axis=1))
        ws = np.sqrt(S * h**d)
        A = (ws[:, None] * (F.conj().T @ F) * ws[None, :]
             + sigmasq * np.eye(M))
        beta64 = np.linalg.solve(A, ws * (F.conj().T @ ys))
        xt = np.asarray(xnew[:2000], dtype=np.float64)
        Ft = np.exp(2j * np.pi * (xt @ (h * K.T)))
        mean64 = np.real(Ft @ (ws * beta64))
        mean32 = np.asarray(mean)[:2000]
        out_json["max_err_mean_f32_vs_dense_f64"] = round(
            float(np.max(np.abs(mean32 - mean64))), 8)
        mh = np.asarray(mean_high)[:2000].astype(np.float64)
        out_json["max_err_mean_vs_dense_f64"] = round(
            float(np.max(np.abs(mh - mean64))), 9)
        # variance accuracy vs dense (chebyshev vs f64 'regular' formula)
        G64 = np.linalg.solve(A / sigmasq, (ws * Ft[:500].conj()).T).T
        var64 = np.maximum(np.real(np.sum(Ft[:500] * (ws * G64), -1)), 0)
        out_json["max_err_var_cheb_vs_dense_f64"] = round(
            float(np.max(np.abs(np.asarray(vc)[:500] - var64))), 8)

    print(json.dumps(out_json))


if __name__ == "__main__":
    main()
