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

    Three prune levels instead of a final `sort().limit(k)` — the all-to-all
    Sort cost fixed boundary sampling + 2 tasks per surviving BLOCK, ~1 s of
    pure scheduling on a 64-block input (BENCH r3→r4 regression; NOTES.md
    round 5). Level 1 prunes per block; level 2 re-prunes over ~1M-row
    bundles (bounds survivors to k per 20k blocks — the coalesce knob for
    the 1e6-block regime); the final single-block prune is exact by the
    same argument and emits the rows already sorted."""
    if isinstance(descending, bool):
        descending = [descending] * len(columns)
    keys = _sort_keys(columns, descending)

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.sort_indices(t, sort_keys=keys)
        return t.take(idx.slice(0, k))

    def final_topk(t: pa.Table) -> pa.Table:
        # the single coalesced block still needs the sort even when
        # num_rows <= k: callers read the output in rank order
        idx = pc.sort_indices(t, sort_keys=keys)
        return t.take(idx.slice(0, min(k, t.num_rows)))

    pruned = ds.map_batches(local_topk, batch_format="pyarrow").map_batches(
        local_topk, batch_format="pyarrow", batch_size=1_000_000
    )
    return pruned.repartition(1).map_batches(final_topk, batch_format="pyarrow")


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


def range_rank(ds, key_column: str, id_column: str, descending: bool = False,
               rank_column: str = "rank", n_ranges: int | None = None,
               rows_per_range: int = 2_000_000):
    """Exact global ROW_NUMBER for UNBOUNDED-cardinality keys — the
    range-partitioned total-sort leg next to `top_k` (limit-k) and
    `global_rank` (bounded key cardinality / heavy ties):

    1. boundary estimation: per-batch mergeable KLL sketches of the key →
       one intermediate merge level (`repartition(8)`) → the driver merges
       ≤ 8 fixed-size sketches and reads evenly spaced quantiles. Driver
       state is O(sketch), never O(rows) or O(blocks); boundary error only
       affects range BALANCE, never rank correctness.
    2. route: each row gets range_id = searchsorted(boundaries, key) — a
       monotone map, so ranges are contiguous key intervals and rows with
       EQUAL keys always share a range (the tie-containment ranking needs).
    3. per-range exact counts via combiner count → groupby-Sum (O(n_ranges)
       rows to the driver) → cumulative base offsets per range.
    4. one groupby(range_id) exchange: each range sorts locally by
       (key [DESC], id) and adds its base.

    Exactly ROW_NUMBER() OVER (ORDER BY key [DESC], id): ranks are exact for
    ANY boundary placement because bases come from exact counts and ties
    never straddle ranges. Null keys/ids and NaN keys are EXCLUDED (mirror
    the oracle with `WHERE key IS NOT NULL AND NOT isnan(key)` — NaN
    ordering is engine-dependent). Non-float keys route through a monotone
    float64 cast (collisions only merge adjacent ranges; correctness is
    unaffected).

    `n_ranges` defaults to ceil(n / rows_per_range) clamped to [1, 4096],
    using the sketch's exact row count — a range must fit one worker's
    heap. A fully-degenerate key (every row identical) collapses to one
    range; that regime is `global_rank`'s job (its histogram is tiny there).

    Note: `ds` is consumed three times (sketch, count, rank); pass the lazy
    read so each pass re-reads only the two pruned columns rather than
    re-running an expensive upstream pipeline."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.functions.sketches import KLL

    def keyed(t: pa.Table) -> pa.Table:
        k = t[key_column]
        mask = pc.and_(pc.is_valid(k), pc.is_valid(t[id_column]))
        if pa.types.is_floating(k.type):
            mask = pc.and_kleene(mask, pc.invert(pc.is_nan(k)))
        return t.select([key_column, id_column]).filter(mask)

    def batch_sketch(t: pa.Table) -> pa.Table:
        t = keyed(t)
        sk = KLL()
        if t.num_rows:
            sk.add_values(
                t[key_column].to_numpy(zero_copy_only=False).astype(np.float64)
            )
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    def merge_sketches(t: pa.Table) -> pa.Table:
        sk = KLL()
        for b in t["sk"].to_pylist():
            sk.merge(KLL.from_bytes(b))
        return pa.table({"sk": pa.array([sk.to_bytes()], pa.binary())})

    sk = KLL()
    merged = (
        ds.map_batches(batch_sketch, batch_format="pyarrow", batch_size=65536)
        .repartition(8)
        .map_batches(merge_sketches, batch_format="pyarrow")
        .take_all()
    )
    for r in merged:
        sk.merge(KLL.from_bytes(r["sk"]))

    empty = pa.table(
        {id_column: pa.array([], pa.int64()),
         rank_column: pa.array([], pa.int64())}
    )
    if sk.n == 0:
        return ray.data.from_arrow(empty)

    if n_ranges is None:
        n_ranges = int(min(4096, max(1, -(-sk.n // rows_per_range))))
    qs = [i / n_ranges for i in range(1, n_ranges)]
    bnd = np.unique(np.asarray(sk.quantiles(qs), dtype=np.float64))

    def route(t: pa.Table) -> pa.Table:
        t = keyed(t)
        kv = t[key_column].to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(bnd, kv, side="left").astype(np.int64)
        return t.append_column("_range", pa.array(rid, pa.int64()))

    def count_partial(t: pa.Table) -> pa.Table:
        return (
            route(t).select(["_range"]).group_by(["_range"])
            .aggregate([([], "count_all")])
        )

    hist = (
        ds.map_batches(count_partial, batch_format="pyarrow", batch_size=16384)
        .groupby("_range")
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values("_range")
    )
    rids = hist["_range"].to_numpy(np.int64)
    cnts = hist["n"].to_numpy(np.int64)
    if descending:
        # ranks start at the ranges holding the LARGEST keys
        after = np.concatenate([np.cumsum(cnts[::-1])[-2::-1], [0]])
        bases = dict(zip(rids.tolist(), after.tolist()))
    else:
        before = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        bases = dict(zip(rids.tolist(), before.tolist()))

    sort_keys = [
        (key_column, "descending" if descending else "ascending"),
        (id_column, "ascending"),
    ]

    def rank_group(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        base = bases[g["_range"][0].as_py()]
        g2 = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        ranks = base + 1 + np.arange(g2.num_rows, dtype=np.int64)
        return pa.table(
            {id_column: g2[id_column], rank_column: pa.array(ranks, pa.int64())}
        )

    return (
        ds.map_batches(route, batch_format="pyarrow", batch_size=16384)
        .groupby("_range")
        .map_groups(rank_group, batch_format="pyarrow")
    )


def take_top_fraction(ds, key_column: str, id_column: str, numer: int,
                      denom: int, descending: bool = True,
                      rank_column: str = "rank"):
    """Percentile cut: keep the best ceil(n·numer/denom) rows by key order —
    the FineWeb/DCLM "top X% by quality score" selection, as a first-class
    distributed operator.

    Composes range_rank (exact global ROW_NUMBER over unbounded keys) with a
    rank threshold. The threshold count n is the rank-ELIGIBLE row count
    (null keys/ids and NaN keys excluded, exactly range_rank's domain), read
    from the materialized rank table — (id, rank) is 16 B/row in the object
    store, spill-safe, and materializing it means the 3-pass rank pipeline
    runs once instead of twice. The fraction is a rational numer/denom so
    the threshold is INTEGER math on both engine and oracle sides
    (ceil(n·numer/denom) = (n·numer + denom − 1) // denom) — no float-ceil
    boundary drift. Scale shape inherits range_rank's: O(sketch) driver
    state, one groupby exchange, per-range local sorts."""
    if not (0 < numer <= denom):
        raise ValueError(f"need 0 < numer <= denom: {numer}/{denom}")
    ranked = range_rank(
        ds, key_column, id_column, descending=descending,
        rank_column=rank_column,
    ).materialize()
    n = ranked.count()
    if n == 0:
        return ranked
    thr = (n * numer + denom - 1) // denom

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(t[rank_column], thr))

    return ranked.map_batches(keep, batch_format="pyarrow")


def ntile(ds, k: int, key_column: str, id_column: str,
          descending: bool = False, rank_column: str = "rank",
          bucket_column: str = "bucket"):
    """NTILE(k): assign every row its k-quantile bucket under the global
    (key [DESC], id) order — curriculum / difficulty binning ("train on the
    easiest quartile first"), score-band stratification. The bucketize leg
    on top of range_rank's exact global ROW_NUMBER.

    SQL NTILE semantics replayed with INTEGER math on both sides: with
    q = n // k and r = n % k, the first r buckets hold q+1 rows, so

        bucket(rank) = (rank-1) // (q+1) + 1              if rank <= r*(q+1)
                       r + (rank-1 - r*(q+1)) // q + 1    otherwise

    Rank-eligible rows only (range_rank's domain: null key/id and NaN keys
    excluded). The rank table is materialized once ((id, rank) is 16 B/row,
    spill-safe) to read n; the bucket map is then a zero-exchange
    map_batches."""
    import numpy as np

    if k < 1:
        raise ValueError(f"need k >= 1: {k}")
    ranked = range_rank(
        ds, key_column, id_column, descending=descending,
        rank_column=rank_column,
    ).materialize()
    n = ranked.count()
    if n == 0:
        return ranked
    q, r = divmod(n, k)

    def bucketize(t: pa.Table) -> pa.Table:
        rk = t[rank_column].to_numpy(zero_copy_only=False)
        if q == 0:
            b = rk  # n < k: one row per bucket, bucket == rank
        else:
            cut = r * (q + 1)
            b = np.where(
                rk <= cut,
                (rk - 1) // (q + 1) + 1,
                r + (rk - 1 - cut) // q + 1,
            )
        return t.append_column(bucket_column, pa.array(b, pa.int64()))

    return ranked.map_batches(bucketize, batch_format="pyarrow")
