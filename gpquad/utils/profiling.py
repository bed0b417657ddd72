"""Tracing/profiling helpers (aux subsystem §5 of the survey).

The reference gates every gradient stage behind ``torch.profiler``
``record_function`` scopes named "0_book_keeping" ... "9_log_marginal"
(reference efgpnd.py:46-61, 94-312).  The TPU-native equivalents:

  - :func:`stage` — ``jax.named_scope`` wrapper keeping the same stage
    taxonomy; the names appear in XLA HLO metadata and in TensorBoard
    traces;
  - :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard trace directory;
  - :class:`StageTimer` — host-side wall-clock stage table mirroring the
    printed profiler tables of the reference diagnostics
    (diagnose_efgpnd_learning_curve.py).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax

__all__ = ["stage", "trace", "StageTimer", "STAGES"]

# the reference's stage taxonomy (efgpnd.py:61-289)
STAGES = (
    "0_book_keeping",
    "1_frequency_grid_setup",
    "2_nufft_setup",
    "3_toeplitz_setup",
    "4_solve_cg",
    "5_compute_term2",
    "6_monte_carlo_trace",
    "7_batch_cg_solve",
    "7.5_compute_alpha",
    "8_gradient_calculation",
    "9_log_marginal_likelihood",
)


def stage(name: str):
    """Named scope for a pipeline stage; shows up in profiler traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpquad-trace", *, create_perfetto_link=False):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage table (device-synchronizing).

    Usage::

        timer = StageTimer()
        with timer.time("4_solve_cg"):
            beta = ...
        print(timer.table())
    """

    def __init__(self):
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.perf_counter() - t0)

    def table(self) -> str:
        rows = ["stage".ljust(28) + "calls   total_s     mean_s"]
        total = 0.0
        for name, vals in self.records.items():
            total += sum(vals)
            rows.append(f"{name:<28}{len(vals):>5}{sum(vals):>10.4f}"
                        f"{sum(vals)/len(vals):>11.5f}")
        rows.append(f"{'TOTAL':<28}{'':>5}{total:>10.4f}")
        return "\n".join(rows)
