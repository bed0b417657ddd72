"""Polya-Gamma GP classification on REAL data (spatial transcriptomics).

The reference's PG classifier demo runs on a spatial transcriptomics
slide: spot coordinates in [-1, 1]^2 and Slc17a7 gene expression
binarized at > 0.001 (~21% positive) — reference
polyagamma_classification/PG_GP_classification.ipynb cell 3 (loads
``x.pt`` / ``y_slc17a7.pt``).  This script is the committed real-data
artifact for the PG module: an 80/20 split, variational EM fit with
hyper learning, and honest held-out metrics (accuracy / AUC / log-loss).

The spatial signal in this label is LIMITED: a k-NN classifier on the
coordinates — the nonparametric ceiling for any purely spatial model —
reaches only ~0.72 AUC with accuracy at the majority-class floor
(measured in-script).  PASS therefore means extracting that signal
fully and calibratedly, not an absolute accuracy bar:
  1. val AUC >= 0.65 (well above chance),
  2. val AUC >= kNN-ceiling AUC - 0.03,
  3. val log-loss < the constant-predictor (base-rate) log-loss.

Run: ``python scripts/pg_spatial_transcriptomics.py [--n-sub 30013]
[--iters 15] [--json out]``
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from gpquad.models.pg import PolyagammaGPClassifier
from gpquad.utils.loaders import load_spatial_transcriptomics


def auc_rank(y_true, score):
    """AUC via the rank-sum (Mann-Whitney) identity; ties get midranks."""
    order = np.argsort(score, kind="mergesort")
    ranks = np.empty(len(score))
    sorted_scores = score[order]
    i = 0
    while i < len(score):
        j = i
        while j + 1 < len(score) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i:j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    pos = y_true > 0.5
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    return float((ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def log_loss(y_true, p, eps=1e-12):
    p = np.clip(p, eps, 1.0 - eps)
    return float(-np.mean(y_true * np.log(p) + (1 - y_true) * np.log(1 - p)))


def knn_ceiling(x, y, xv, k=25):
    """k-NN on coordinates: the nonparametric ceiling for spatial-only
    prediction of the label field."""
    from scipy.spatial import cKDTree
    _, idx = cKDTree(x).query(xv, k=k)
    return y[idx].mean(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-sub", type=int, default=None,
                    help="subsample size (default: all 30013 spots)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--lengthscale-init", type=float, default=0.1)
    ap.add_argument("--val-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    x_all, y_all = load_spatial_transcriptomics(n_sub=args.n_sub,
                                                seed=args.seed)
    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(len(y_all))
    n_val = int(round(args.val_frac * len(y_all)))
    vi, ti = perm[:n_val], perm[n_val:]
    x, y = x_all[ti], y_all[ti]
    xv, yv = x_all[vi], y_all[vi]
    pos_frac = float(y_all.mean())
    majority_acc = max(pos_frac, 1.0 - pos_frac)
    print(f"spatial_transcriptomics: n_train={len(y)} n_val={len(yv)} "
          f"pos_frac={pos_frac:.3f} majority_acc={majority_acc:.3f}")

    clf = PolyagammaGPClassifier(max_iter=args.iters, random_state=args.seed,
                                 lengthscale_init=args.lengthscale_init,
                                 dtype="float64", store_history=True)
    t0 = time.perf_counter()
    clf.fit(x, y)
    fit_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    p_val = clf.predict_proba(xv)[:, 1]
    predict_s = time.perf_counter() - t0
    var_val = np.asarray(clf.predictive_variance(xv[:2000]))

    acc = float(((p_val > 0.5) == (yv > 0.5)).mean())
    auc = auc_rank(yv, p_val)
    nll = log_loss(yv, p_val)
    train_acc = float(clf.training_accuracy_)

    p_knn = knn_ceiling(x, y, xv)
    knn_auc = auc_rank(yv, p_knn)
    knn_nll = log_loss(yv, p_knn)
    base_nll = log_loss(yv, np.full(len(yv), float(y.mean())))

    checks = {
        "auc_above_chance": auc >= 0.65,
        "auc_matches_knn_ceiling": auc >= knn_auc - 0.03,
        "log_loss_beats_base_rate": nll < base_nll,
        "variance_nonnegative": bool((var_val >= 0).all()),
    }
    out = {
        "dataset": "spatial_transcriptomics_slc17a7",
        "n_train": len(y), "n_val": len(yv), "iters": args.iters,
        "pos_frac": pos_frac, "majority_acc": majority_acc,
        "val_accuracy": acc, "val_auc": auc, "val_log_loss": nll,
        "knn_ceiling_auc": knn_auc, "knn_log_loss": knn_nll,
        "base_rate_log_loss": base_nll,
        "train_accuracy": train_acc,
        "lengthscale": float(clf.lengthscale_),
        "variance": float(clf.variance_),
        "fit_sec": fit_s, "predict_sec": predict_s,
        "mean_predictive_variance": float(var_val.mean()),
        "checks": checks,
    }
    print(json.dumps(out, indent=2, default=float))
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2, default=float))
    if not all(checks.values()):
        print("FAIL", file=sys.stderr)
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
