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


def weighted_sample_k(ds, k: int, id_column: str, weight_column: str,
                      salt: str = "wsample", key_column: str = "es_key"):
    """Exact-k WEIGHTED sample without replacement — Efraimidis & Spirakis
    (2006): each row draws u ~ U(0,1) and the k largest u^(1/w) win, which
    makes P(row i first) = w_i / Σw exactly. Deterministic and rerun/
    partition-stable: u derives from the salted md5 hash of the id
    (split.py's mechanism), and the order key is the INTEGER

        es_key = (−lnq9(u)) · 1e6 // w      (keep the k SMALLEST)

    with lnq9 = floor(ln·1e9 + 0.5): −ln(u)/w order quantized so both the
    engine and a SQL replay compare identical int64s — no float ordering
    anywhere (ties broken by id). Weights must be positive integers; rows
    with null/≤0 weight or null id are excluded (mirror in the oracle).
    Headroom: −lnq9(u) ≤ 60·ln2·1e9 ≈ 4.2e10, ×1e6 < 2^63.

    Scale shape = sample_k's hierarchical local prune: each block
    contributes ≤ k rows, the exchange moves O(k · blocks) rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.split import _row_hashes
    from fdpg_query_data_validation_ray.stages.topk import top_k

    SPAN = float(1 << 60)

    def add_key(t: pa.Table) -> pa.Table:
        w = pc.cast(t[weight_column], pa.int64())
        m = pc.and_(
            pc.is_valid(t[id_column]),
            pc.and_kleene(pc.is_valid(w), pc.greater(w, 0)),
        )
        t = t.filter(pc.fill_null(m, False))
        h = _row_hashes(t, id_column, salt)
        u = (h.astype(np.float64) + 1.0) / SPAN  # u ∈ (0, 1]
        neg_lnq9 = -np.floor(np.log(u) * 1e9 + 0.5).astype(np.int64)
        wv = pc.cast(t[weight_column], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        key = (neg_lnq9 * 1_000_000) // wv
        return t.append_column(key_column, pa.array(key, pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    return top_k(keyed, k, [key_column, id_column], descending=False)


def budget_take_per_key(
    ds,
    key_column: str,
    cost_column: str,
    order_column: str,
    budget: int,
    tiebreak_column: str,
    n_buckets: int = 64,
):
    """Keep, per key, the prefix of rows (ordered by `order_column`, ties by
    `tiebreak_column`) whose RUNNING `cost_column` total stays ≤ `budget` —
    the token-budget corpus-mixing primitive ("give me 50M tokens of each
    language, chosen deterministically"). Appends `cum_<cost_column>` (the
    inclusive running total).

    Plan — a distributed per-key prefix sum with budget pruning:
      pass 1: per-batch (key, bucket) cost-sum partials, where bucket is a
          contiguous range of the order space (order_column is expected
          ~uniform, e.g. a salted hash) → one small groupby → the driver
          cumsums the BOUNDED (keys × n_buckets) grid into per-bucket base
          offsets.
      pass 2: rows route to (key, bucket) parts, but ONLY buckets whose
          base offset is still under budget — everything past the budget
          horizon is dropped before the exchange (the scale win: a 1%
          budget moves ~1% of the data). Each part sorts its bucket, adds
          the exact base, and cuts at the budget.

    Preconditions: keys × n_buckets bounded (driver grid); order_column
    values ~uniform over [0, 2^60) (salted-hash ordering gives this).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    SPAN = 1 << 60  # md5_low60 order space
    width = SPAN // n_buckets

    def grid_partials(t: pa.Table) -> pa.Table:
        b = pc.divide(t[order_column], pa.scalar(width, pa.int64()))
        g = pa.table(
            {
                "key": t[key_column].combine_chunks(),
                "bucket": pc.cast(b, pa.int64()).combine_chunks(),
                "c": t[cost_column].combine_chunks(),
            }
        ).group_by(["key", "bucket"]).aggregate([("c", "sum")])
        return g

    grid = (
        ds.map_batches(grid_partials, batch_format="pyarrow", batch_size=65536)
        .groupby(["key", "bucket"])
        .aggregate(Sum("c_sum", alias_name="c"))
        .to_pandas()  # bounded: keys × n_buckets
    )
    grid = grid.sort_values(["key", "bucket"])
    grid["base"] = (
        grid.groupby("key", sort=False)["c"].cumsum() - grid["c"]
    ).astype("int64")
    # buckets whose base already exceeds the budget can't contribute rows
    live = grid[grid["base"] <= budget]
    base_of = {
        (k, int(b)): int(v)
        for k, b, v in zip(live["key"], live["bucket"], live["base"])
    }

    cum_name = f"cum_{cost_column}"

    n_parts = 64  # coarse parts; each holds whole (key, bucket) groups

    def route(t: pa.Table) -> pd.DataFrame:
        df = t.to_pandas()
        df["bucket"] = (df[order_column] // width).astype("int64")
        keyed = list(zip(df[key_column], df["bucket"]))
        live_mask = np.fromiter(
            (kb in base_of for kb in keyed), dtype=bool, count=len(keyed)
        )
        df = df[live_mask].copy()  # budget-horizon prune BEFORE the exchange
        h = hash64(
            (df[key_column].astype(str) + "\x1f" + df["bucket"].astype(str))
            .to_numpy(dtype=object)
        )
        df["part"] = (h & np.uint64(n_parts - 1)).astype("int64")
        return df

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out_cols = list(g.columns)
        for drop in ("part", "bucket"):
            if drop in out_cols:
                out_cols.remove(drop)
        out_cols.append(cum_name)
        if len(g) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        res = []
        for (k, b), grp in g.groupby([key_column, "bucket"], sort=False):
            base = base_of.get((k, int(b)))
            if base is None:
                continue
            grp = grp.sort_values([order_column, tiebreak_column],
                                  kind="mergesort")
            cum = base + grp[cost_column].cumsum().astype("int64")
            keep = cum <= budget
            grp = grp[keep].copy()
            grp[cum_name] = cum[keep].astype("int64")
            res.append(grp.drop(columns=["part", "bucket"]))
        if not res:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        return pd.concat(res, ignore_index=True)

    routed = ds.map_batches(route, batch_format="pyarrow", batch_size=65536)
    return routed.groupby("part").map_groups(per_part, batch_format="pandas")
