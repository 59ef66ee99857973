"""Straggler telemetry for the cell co-partitioned plans (r4 verdict
next-round #10).

Every large×large cell plan (pip_pairs_cell, overlay_*_cell) lives or
dies by the per-cell group-size distribution: one urban-hotspot cell 100×
the median is one straggling shuffle partition at 100 TB. This module
summarizes the per-cell row histogram into one JSON metrics row —
max / median / p90 / p99 / skew ratio — so the salting threshold
(`sjoin_cell_partitioned(salt_threshold=...)`) is tuned from recorded
evidence rather than guessed.

The histogram pass projects ONLY the cell column (narrow groupby-count);
enabling telemetry re-executes the upstream cell tagging once more, so
it is opt-in per run, not always-on.
"""

from __future__ import annotations

import json
import os

import numpy as np

SKEW_FILE = "skew_metrics.jsonl"


def cell_skew_summary(tagged_ds, cell_col: str = "cell",
                      stage: str = "") -> dict:
    """One metrics row from a cell-tagged Dataset (pre-groupby)."""
    from ray.data.aggregate import Count

    hist = (
        tagged_ds.select_columns([cell_col])
        .groupby(cell_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    n = hist["n"].to_numpy()
    if len(n) == 0:
        return {"stage": stage, "n_cells": 0, "rows": 0, "max": 0,
                "median": 0, "p90": 0, "p99": 0, "skew_ratio": 0.0}
    return {
        "stage": stage,
        "n_cells": int(len(n)),
        "rows": int(n.sum()),
        "max": int(n.max()),
        "median": int(np.median(n)),
        "p90": int(np.percentile(n, 90)),
        "p99": int(np.percentile(n, 99)),
        # the tuning signal: max cell vs the typical cell
        "skew_ratio": float(n.max() / max(float(np.median(n)), 1.0)),
    }


def record_cell_skew(out_dir: str, summary: dict) -> None:
    """Append one summary row to the run's skew metrics sidecar."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, SKEW_FILE), "a") as f:
        f.write(json.dumps(summary) + "\n")


def load_cell_skew(out_dir: str) -> list[dict]:
    path = os.path.join(out_dir, SKEW_FILE)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(x) for x in f if x.strip()]
