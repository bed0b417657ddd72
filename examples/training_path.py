"""Hyper-learning trajectory over the exact log-marginal landscape.

Script form of the reference's fos_data.ipynb final cell: run the Adam
hyper-learning loop, then render the (lengthscale, variance) training path
on top of a densely-evaluated log-marginal-likelihood contour (noise fixed
at its learned value) and check the path actually climbs the landscape.
The reference does this on a private .npz (field-of-streams coordinates);
here the data is a small synthetic 2-D GP-style field so the dense
landscape is computable exactly.

Writes ``examples/training_path.png``.

Run: ``python examples/training_path.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np
    import gpquad
    from gpquad.kernels import SquaredExponential

    dtype = jnp.float64 if args.cpu else jnp.float32
    rng = np.random.default_rng(5)

    n = 400
    x = rng.uniform(0, 1, size=(n, 2))
    f = np.sin(7 * x[:, 0]) * np.cos(5 * x[:, 1])
    y = f + 0.15 * rng.normal(size=n)
    y = (y - y.mean()) / y.std()
    xj, yj = jnp.asarray(x, dtype), jnp.asarray(y, dtype)

    # --- Adam loop, logging the hyper trajectory ---------------------------
    kern = SquaredExponential(lengthscale=0.4, variance=0.3, dimension=2)
    model = gpquad.EFGP(xj, yj, kern, sigmasq=0.2, eps=1e-4,
                        estimate_params=False)
    model.optimize_hyperparameters(max_iters=60, lr=0.08, trace_samples=4,
                                   cg_tol=1e-7, key=jax.random.PRNGKey(0))
    log = model.training_log
    ells = np.array(log["lengthscale"])
    sf2s = np.array(log["variance"])
    s2_final = float(log["sigmasq"][-1])
    print(f"path: l {ells[0]:.3f}->{ells[-1]:.3f}, "
          f"sigma_f^2 {sf2s[0]:.3f}->{sf2s[-1]:.3f}, "
          f"sigma^2 ->{s2_final:.4f}")

    # --- dense log-ML landscape at the learned noise -----------------------
    d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)

    def logml(ell, sf2):
        K = sf2 * np.exp(-d2 / (2 * ell**2)) + s2_final * np.eye(n)
        L = np.linalg.cholesky(K)
        a = np.linalg.solve(L, y)
        return (-0.5 * a @ a - np.log(np.diag(L)).sum()
                - 0.5 * n * np.log(2 * np.pi))

    ell_grid = np.geomspace(0.02, 0.8, 25)
    sf2_grid = np.geomspace(0.05, 5.0, 25)
    Z = np.array([[logml(l, s) for l in ell_grid] for s in sf2_grid])

    lm_init = logml(ells[0], sf2s[0])
    lm_final = logml(ells[-1], sf2s[-1])
    print(f"dense logML: init {lm_init:.1f} -> final {lm_final:.1f} "
          f"(grid best {Z.max():.1f})")
    assert lm_final > lm_init, "optimization must climb the landscape"
    assert lm_final > Z.max() - 0.05 * abs(Z.max() - np.median(Z)), \
        "final point must sit near the top of the landscape"

    # --- render -------------------------------------------------------------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 5.2))
    levels = np.quantile(Z, np.linspace(0.55, 1.0, 18))
    cs = ax.contourf(ell_grid, sf2_grid, Z, levels=np.unique(levels),
                     cmap="viridis")
    fig.colorbar(cs, ax=ax, label="log marginal likelihood")
    ax.plot(ells, sf2s, "w.-", lw=1.2, ms=4, label="Adam path")
    ax.plot(ells[0], sf2s[0], "ws", ms=8, mfc="none", label="init")
    ax.plot(ells[-1], sf2s[-1], "w*", ms=13, label="learned")
    ax.set(xscale="log", yscale="log", xlabel="lengthscale",
           ylabel="signal variance",
           title="Hyper-learning path on the exact log-ML landscape")
    ax.legend(loc="lower left", framealpha=0.4)
    out = Path(__file__).with_name("training_path.png")
    fig.savefig(out, dpi=110, bbox_inches="tight")
    print(f"wrote {out}")
    print("PASS: training path walkthrough")


if __name__ == "__main__":
    main()
