"""Per-key capped sampling: deterministic "first n rows per key".

Reference analog: the TOTAL=500 sample cap per resource class / per LOINC code
(extraction/main.py:222-223,240 with .env.default TOTAL) — each class
validates at most TOTAL instances. Here: keep the first `n` rows per routing
key, ordered by explicit columns so the sample is deterministic under any
partitioning (the reference's "first page order" is server-dependent; ours is
total-ordered).

Shape: per-batch local cap (each batch contributes ≤ n rows per key it
contains — vectorized pandas groupby-head after a stable sort) → global
groupby(key).map_groups final cap. The exchange moves O(n · keys · blocks)
rows, never the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def first_n_per_key(
    ds,
    n: int,
    key_column: str,
    order_columns: list[str],
    rank_column: str | None = "rank",
):
    """First `n` rows per `key_column` value, ordered by `order_columns`
    ascending. Optionally appends a 1-based `rank_column` within each key."""

    def local_cap(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(order_columns, kind="mergesort")
            .groupby(key_column, sort=False)
            .head(n)
        )

    def final_cap(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_columns, kind="mergesort").head(n)
        if rank_column:
            g = g.assign(**{rank_column: np.arange(1, len(g) + 1)})
        return g

    pruned = ds.map_batches(local_cap, batch_format="pandas")
    return pruned.groupby(key_column).map_groups(final_cap, batch_format="pandas")
