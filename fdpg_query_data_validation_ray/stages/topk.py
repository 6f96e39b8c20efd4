"""Distributed top-k without a full global sort.

Reference analog: the report's severity sort + "latest report" selection are
tiny driver-side sorts (latex_report/report_visualizer.py:472-491,505-509);
our engine additionally needs order-by-limit over big tables (O1/O2 family in
SURVEY.md §2.6) where `ds.sort().limit(k)` would be an all-to-all exchange of
EVERY block.

Shape: per-batch local top-k (pyarrow sort_indices + take — each block
contributes at most k rows) → global sort over the ≤ k·num_blocks survivors →
limit(k). The exchange moves O(k · blocks) rows instead of O(n).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _sort_keys(columns: list[str], descending: list[bool]):
    return [
        (c, "descending" if d else "ascending") for c, d in zip(columns, descending)
    ]


def top_k(ds, k: int, columns: list[str], descending: list[bool] | bool = False):
    """Global top-k rows of `ds` ordered by `columns` (per-column descending).

    Exact: local-top-k pruning never discards a global-top-k row, because a
    row outside its own block's top k is beaten by ≥ k rows already.
    """
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    keys = _sort_keys(columns, descending)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=keys)
        return t.take(idx.slice(0, k))

    pruned = ds.map_batches(local_topk, batch_format="pyarrow")
    return pruned.sort(columns, descending=descending).limit(k)
