"""Per-key capped sampling: deterministic "first n rows per key".

Reference analog: the TOTAL=500 sample cap per resource class / per LOINC code
(extraction/main.py:222-223,240 with .env.default TOTAL) — each class
validates at most TOTAL instances. Here: keep the first `n` rows per routing
key, ordered by explicit columns so the sample is deterministic under any
partitioning (the reference's "first page order" is server-dependent; ours is
total-ordered).

Shape: per-batch local cap (each batch contributes ≤ n rows per key it
contains — vectorized pandas groupby-head after a stable sort) → key-hash
COARSE-partition final cap: one groupby(part) co-locates all of a key's
surviving rows and a single pandas sort + groupby-head caps EVERY key in the
part at once (pandas' groupby.head/cumcount are C-level across keys — no
per-key Ray group machinery, same plan as stages/temporal.py). The exchange
moves O(n · keys · blocks) rows, never the table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from fdpg_query_data_validation_ray.functions.hashing import hash64


def first_n_per_key(
    ds,
    n: int,
    key_column: str,
    order_columns: list[str],
    rank_column: str | None = "rank",
    ascending: list[bool] | bool = True,
):
    """First `n` rows per `key_column` value under the `order_columns` order
    (per-column direction via `ascending` — descending first columns make
    this the per-key TOP-K, e.g. "top 3 docs per language by length"; the
    grouped ROW_NUMBER() <= n / QUALIFY workhorse). Optionally appends a
    1-based `rank_column` within each key. Deterministic under any
    partitioning when the order is total (make the last order column a
    unique id)."""
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()
    if isinstance(ascending, bool):
        ascending = [ascending] * len(order_columns)

    def local_cap(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.sort_values(order_columns, ascending=ascending,
                              kind="mergesort")
            .groupby(key_column, sort=False)
            .head(n)
        )
        part = (hash64(out[key_column].to_numpy()) & np.uint64(n_parts - 1)).astype(
            np.int32
        )
        return out.assign(__part=part)

    def final_cap_part(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values([key_column] + order_columns,
                          ascending=[True] + list(ascending),
                          kind="mergesort")
            .groupby(key_column, sort=False)
            .head(n)
            .drop(columns=["__part"])
        )
        if rank_column:
            out = out.assign(
                **{
                    rank_column: out.groupby(key_column, sort=False).cumcount() + 1
                }
            )
        return out

    pruned = ds.map_batches(local_cap, batch_format="pandas")
    return pruned.groupby("__part").map_groups(final_cap_part, batch_format="pandas")


def sample_k(ds, k: int, id_column: str, salt: str = "samplek",
             key_column: str = "sample_key"):
    """Exact-k uniform global sample without a shuffle — the distributed,
    rerun-stable stand-in for reservoir sampling (Vitter 1985): rank every
    row by a deterministic salted id hash and keep the k smallest. Identical
    rows come back on every run, any partitioning, and any node count; the
    hash replays in SQL (ORDER BY md5_number_lower(salt||'|'||CAST(id AS
    VARCHAR)) & (1<<60)-1, id LIMIT k — split.py's mechanism). Scale shape
    is top_k's hierarchical local prune: each block contributes ≤ k rows,
    the exchange moves O(k · blocks) rows, never the table."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.split import _row_hashes
    from fdpg_query_data_validation_ray.stages.topk import top_k

    def add_key(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[id_column]))
        h = _row_hashes(t, id_column, salt).astype(np.int64)  # < 2^60: fits
        return t.append_column(key_column, pa.array(h, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return top_k(keyed, k, [key_column, id_column], descending=False)
