"""Temperature-map reconstruction (script form of the reference's
``simple_temp_map.py`` plotting demo): fit the frozen raster, reconstruct
the field on a dense grid, and compare EFGP with the SKI baseline.

Writes ``temperature_map.png`` when matplotlib is available (optional —
the image is a contour triptych: truth-ish validation scatter, EFGP map,
EFGP-vs-SKI residual).

Run: ``python examples/temperature_map.py [--cpu]``
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

DATA = Path(__file__).resolve().parents[1] / "data" / "frozen_raster_v1.npz"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--grid", type=int, default=80)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from gpquad.models.model import EFGP
    from gpquad.models.ski import fit_ski_gp, ski_predict_mean

    blob = np.load(DATA)
    x, y = blob["x_train"], blob["y_train"]
    xv, yv = blob["x_val"], blob["y_val"]
    dtype = jnp.float64 if args.cpu else jnp.float32

    g = np.linspace(0, 1, args.grid)
    xg = np.stack(np.meshgrid(g, g, indexing="ij"), -1).reshape(-1, 2)

    # EFGP: learn hypers, reconstruct the map with variance
    model = EFGP(jnp.asarray(x, dtype), jnp.asarray(y, dtype), "SE",
                 eps=1e-4, opts={"cg_tolerance": 1e-6})
    model.optimize_hyperparameters(max_iters=15, lr=0.1, trace_samples=10)
    map_mean, map_var = model.predict(jnp.asarray(xg, dtype),
                                      return_variance=True)
    val_mean, _ = model.predict(jnp.asarray(xv, dtype),
                                return_variance=False)
    efgp_rmse = float(np.sqrt(np.mean((np.asarray(val_mean) - yv) ** 2)))
    print(f"EFGP: val RMSE {efgp_rmse:.4f}  "
          f"hypers {np.exp(np.asarray(model.params.raw)).round(4)}")

    # SKI baseline on the same data
    ski = fit_ski_gp(x, y, kernel="SE", target_grid_points=4096,
                     max_iters=15, lr=0.1, verbose=False,
                     dtype=jnp.float64 if args.cpu else jnp.float32)
    ski_map = np.asarray(ski_predict_mean(ski, jnp.asarray(xg)))
    ski_val = np.asarray(ski_predict_mean(ski, jnp.asarray(xv)))
    ski_rmse = float(np.sqrt(np.mean((ski_val - yv) ** 2)))
    print(f"SKI : val RMSE {ski_rmse:.4f}")
    # success criteria: both models reconstruct well under the data std,
    # and EFGP is at least SKI-class on its own home problem
    assert efgp_rmse < 0.5 * float(np.std(yv)), (efgp_rmse, np.std(yv))
    assert efgp_rmse < 1.15 * ski_rmse, (efgp_rmse, ski_rmse)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))
        m0 = axes[0].scatter(xv[:, 0], xv[:, 1], c=yv, s=8, cmap="RdBu_r")
        axes[0].set_title("held-out observations")
        fig.colorbar(m0, ax=axes[0])
        mm = np.asarray(map_mean).reshape(args.grid, args.grid)
        m1 = axes[1].contourf(g, g, mm.T, levels=30, cmap="RdBu_r")
        axes[1].set_title(f"EFGP map (val RMSE {efgp_rmse:.3f})")
        fig.colorbar(m1, ax=axes[1])
        diff = mm - ski_map.reshape(args.grid, args.grid)
        m2 = axes[2].contourf(g, g, diff.T, levels=30, cmap="PuOr")
        axes[2].set_title("EFGP - SKI")
        fig.colorbar(m2, ax=axes[2])
        out = Path(__file__).with_name("temperature_map.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        print(f"wrote {out}")
    except ImportError:
        print("matplotlib not available; skipping the figure")


if __name__ == "__main__":
    main()
