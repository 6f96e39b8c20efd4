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


def global_rank(ds, key_column: str, id_column: str, descending: bool = True,
                rank_column: str = "rank"):
    """Global dense ROW_NUMBER by (key, id) WITHOUT a full sort — the
    ORDER-BY-at-scale pattern for bounded-cardinality rank keys (lengths,
    scores, bucketed metrics):

    1. combiner histogram: per-batch pyarrow group_by collapses the key
       column to (key, partial count) rows — the only thing that reaches
       the driver is the merged histogram, O(distinct keys);
    2. the driver cumsums the sorted histogram into per-key BASE offsets
       (rows ranked before each key group) and broadcasts them;
    3. one groupby(key) exchange: each key group ranks its ids locally
       (np.argsort) and adds its base — ranks are globally correct because
       ties on the key are fully contained in one group.

    Exactly ROW_NUMBER() OVER (ORDER BY key [DESC], id): 1-based, dense,
    deterministic. Null keys are EXCLUDED (mirror the oracle with
    `WHERE key IS NOT NULL`): a null groupby key would poison the sort
    shuffle and null ordering is dialect-dependent anyway. For unbounded
    key cardinality use top_k or a range-partitioned sort instead — the
    histogram is driver-resident."""
    import numpy as np
    import ray

    from ray.data.aggregate import Sum

    def keyed(t: pa.Table) -> pa.Table:
        t = t.select([key_column, id_column]).filter(
            pc.and_(
                pc.is_valid(t[key_column]), pc.is_valid(t[id_column])
            )
        )
        return t

    def partial_hist(t: pa.Table) -> pa.Table:
        return keyed(t).group_by([key_column]).aggregate([([], "count_all")])

    hist = (
        ds.map_batches(partial_hist, batch_format="pyarrow", batch_size=16384)
        .groupby(key_column)
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:
        return ds.map_batches(
            lambda t: pa.table(
                {id_column: pa.array([], pa.int64()),
                 rank_column: pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    hist = hist.sort_values(key_column, ascending=not descending).reset_index(
        drop=True
    )
    keys_sorted = hist[key_column].to_numpy()
    bases = np.concatenate([[0], np.cumsum(hist["n"].to_numpy())[:-1]]).astype(
        np.int64
    )
    # searchsorted needs ascending order; flip for descending keys
    lookup_keys = keys_sorted[::-1] if descending else keys_sorted
    lookup_bases = bases[::-1] if descending else bases
    base_ref = ray.put((lookup_keys.copy(), lookup_bases.copy()))

    def rank_group(g: pa.Table) -> pa.Table:
        import ray as _ray

        if g.num_rows == 0:
            return pa.table(
                {id_column: pa.array([], pa.int64()),
                 rank_column: pa.array([], pa.int64())}
            )
        lk, lb = _ray.get(base_ref)
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        key = g[key_column][0].as_py()
        base = int(lb[np.searchsorted(lk, key)])
        order = np.argsort(ids, kind="stable")
        ranks = np.empty(len(ids), dtype=np.int64)
        ranks[order] = base + 1 + np.arange(len(ids), dtype=np.int64)
        return pa.table({id_column: pa.array(ids), rank_column: pa.array(ranks)})

    return (
        ds.map_batches(keyed, batch_format="pyarrow", batch_size=16384)
        .groupby(key_column)
        .map_groups(rank_group, batch_format="pyarrow")
    )
