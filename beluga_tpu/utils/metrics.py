"""Accuracy metrics (the evo_ape / beluga_benchmark analysis analog).

The reference measures accuracy offline with ``evo_ape`` against bag ground
truth (beluga_benchmark/docs/BENCHMARKING.md) and compares runs with
``compare_results.py``.  This module provides the same quantities as plain
functions over pose arrays.
"""

from __future__ import annotations

import numpy as np


def _wrap_angle(a):
    return np.arctan2(np.sin(a), np.cos(a))


def ape(estimates_xyt: np.ndarray, ground_truth_xyt: np.ndarray) -> dict:
    """Absolute pose error statistics between (x, y, yaw) trajectories.

    Returns translation RMSE/mean/max (meters) and yaw RMSE (radians) —
    the quantities the reference gates and plots.
    """
    est = np.asarray(estimates_xyt, np.float64)
    gt = np.asarray(ground_truth_xyt, np.float64)
    assert est.shape == gt.shape and est.shape[-1] == 3
    terr = np.linalg.norm(est[:, :2] - gt[:, :2], axis=-1)
    yerr = np.abs(_wrap_angle(est[:, 2] - gt[:, 2]))
    return {
        "rmse": float(np.sqrt(np.mean(terr**2))),
        "mean": float(np.mean(terr)),
        "median": float(np.median(terr)),
        "max": float(np.max(terr)),
        "yaw_rmse": float(np.sqrt(np.mean(yerr**2))),
        "yaw_max": float(np.max(yerr)),
        "count": int(len(terr)),
    }


def compare_runs(runs: dict[str, dict]) -> str:
    """Tabulate APE summaries from several runs (compare_results.py analog)."""
    cols = ["rmse", "mean", "max", "yaw_rmse", "count"]
    lines = ["run".ljust(28) + "  ".join(c.rjust(9) for c in cols)]
    for name, m in runs.items():
        lines.append(
            name.ljust(28)
            + "  ".join(
                (f"{m[c]:9.4f}" if isinstance(m[c], float) else f"{m[c]:9d}")
                for c in cols
            )
        )
    return "\n".join(lines)
