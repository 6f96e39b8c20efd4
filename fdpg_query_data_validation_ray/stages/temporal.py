"""Temporal operators Ray Data lacks natively: as-of join and sessionization.

Both are built as the composition pattern the builder brief prescribes for
custom operators: tag/union + `groupby(key).map_groups` with a fully
vectorized per-group body (numpy searchsorted / diff-cumsum), documented
partitioning assumption: one BY-key's rows fit one group (true for per-user
event streams; a pathological single hot key should be pre-split by time
range before this operator).

Reference analog: none (the reference has no temporal joins); these are the
training-data-pipeline operators the round brief lists explicitly ("as-of
join, range join, windowed aggregate").
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _ts_int64(s: pd.Series) -> np.ndarray:
    """datetime64[*] → int64 (native unit); already-integer passes through."""
    v = s.to_numpy()
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(np.int64)
    return v.astype(np.int64)


def asof_join_events(
    ds,
    by: str,
    on: str,
    id_column: str,
    left_filter,
    right_filter,
    out_gap: str = "gap_us",
    out_right_id: str = "right_id",
):
    """Backward as-of LEFT join of two row subsets of ONE dataset: for each
    left row, the same-`by`-key right row with the greatest `on` ≤ left.`on`
    (DuckDB `ASOF LEFT JOIN` semantics). Unmatched left rows keep null
    right_id/gap.

    `left_filter(t)` / `right_filter(t)` are pyarrow-table → boolean-mask
    callables evaluated per batch; the single input scan is split into tagged
    sides (no second read), then one groupby(`by`) co-locates each key and a
    vectorized searchsorted merge resolves matches per group. Two distinct
    datasets can as-of join by unioning them with a side tag and the same
    schema — this entry point covers the common self-join shape directly.

    Ties on `on` within the right side break by the LAST row in
    (on, id) sort order — deterministic regardless of arrival order."""
    import pyarrow as pa

    def tag(batch: pa.Table) -> pa.Table:
        lm = left_filter(batch)
        rm = right_filter(batch)
        left = batch.filter(lm)
        right = batch.filter(rm)
        out = {
            by: pa.concat_arrays(
                [left[by].combine_chunks(), right[by].combine_chunks()]
            ),
            on: pa.concat_arrays(
                [left[on].combine_chunks(), right[on].combine_chunks()]
            ),
            id_column: pa.concat_arrays(
                [left[id_column].combine_chunks(), right[id_column].combine_chunks()]
            ),
            "__side": pa.array(
                np.concatenate(
                    [np.zeros(left.num_rows, np.int8), np.ones(right.num_rows, np.int8)]
                )
            ),
        }
        return pa.table(out)

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == 0]
        right = g[g["__side"] == 1]
        empty = pd.DataFrame(
            {
                id_column: pd.Series(dtype="int64"),
                by: pd.Series(dtype="int64"),
                out_right_id: pd.Series(dtype="float64"),
                out_gap: pd.Series(dtype="float64"),
            }
        )
        if left.empty:
            return empty
        lt = _ts_int64(left[on])
        lid = left[id_column].to_numpy()
        key = left[by].iloc[0]
        order_l = np.lexsort((lid, lt))
        lt, lid = lt[order_l], lid[order_l]
        if right.empty:
            return pd.DataFrame(
                {
                    id_column: lid,
                    by: np.full(len(lid), key),
                    out_right_id: np.full(len(lid), np.nan),
                    out_gap: np.full(len(lid), np.nan),
                }
            )
        rt = _ts_int64(right[on])
        rid = right[id_column].to_numpy()
        order_r = np.lexsort((rid, rt))  # ties on ts → last id wins
        rt, rid = rt[order_r], rid[order_r]
        ix = np.searchsorted(rt, lt, side="right") - 1
        matched = ix >= 0
        ix_safe = np.where(matched, ix, 0)
        return pd.DataFrame(
            {
                id_column: lid,
                by: np.full(len(lid), key),
                out_right_id: np.where(matched, rid[ix_safe].astype(np.float64), np.nan),
                out_gap: np.where(
                    matched, (lt - rt[ix_safe]).astype(np.float64), np.nan
                ),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return tagged.groupby(by).map_groups(merge_group, batch_format="pandas")


def range_join_count(
    ds,
    by: str,
    on: str,
    id_column: str,
    lo_us: int,
    hi_us: int,
):
    """Per-key range self-join, count form: for each row, how many OTHER rows
    of the same `by` key have `on` within [on+lo_us, on+hi_us] (lo typically
    negative). The classic interval/range join Ray Data lacks natively,
    planned as groupby(key) + per-group sorted double-searchsorted — O(n log n)
    per key instead of the naive O(n²) pairwise comparison.

    Returns (id_column, by, n_neighbors). Same partitioning assumption as the
    other temporal operators: one key's rows fit one group."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_int64(g[on])
        ids = g[id_column].to_numpy()
        order = np.lexsort((ids, ts))
        ts_s, ids_s = ts[order], ids[order]
        hi_ix = np.searchsorted(ts_s, ts_s + hi_us, side="right")
        lo_ix = np.searchsorted(ts_s, ts_s + lo_us, side="left")
        n = (hi_ix - lo_ix - 1).astype(np.int64)  # -1: exclude self
        return pd.DataFrame(
            {
                id_column: ids_s,
                by: np.full(len(ids_s), g[by].iloc[0]),
                "n_neighbors": n,
            }
        )

    pruned = ds.map_batches(
        lambda t: t.select([by, on, id_column]), batch_format="pyarrow"
    )
    return pruned.groupby(by).map_groups(per_key, batch_format="pandas")


def sessionize(
    ds,
    user_col: str,
    ts_col: str,
    id_column: str,
    gap_seconds: int = 1800,
):
    """Per-user session statistics under a gap rule: a new session starts when
    the time since the user's previous event exceeds `gap_seconds`.
    Returns one row per user: (user_col, n_events, n_sessions,
    longest_session) — the classic event-stream windowed aggregate.

    Plan: column-pruned scan → groupby(user) → vectorized diff/cumsum per
    group (no Python loop over events). Deterministic ordering inside a user:
    (ts, id)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = _ts_int64(g[ts_col])
        ids = g[id_column].to_numpy()
        order = np.lexsort((ids, ts))
        ts = ts[order]
        n = len(ts)
        gap_us = gap_seconds * 1_000_000
        new_session = np.empty(n, dtype=bool)
        new_session[0] = True
        if n > 1:
            new_session[1:] = np.diff(ts) > gap_us
        sess_ix = np.cumsum(new_session) - 1
        sizes = np.bincount(sess_ix)
        return pd.DataFrame(
            {
                user_col: [g[user_col].iloc[0]],
                "n_events": np.array([n], dtype=np.int64),
                "n_sessions": np.array([int(new_session.sum())], dtype=np.int64),
                "longest_session": np.array([int(sizes.max())], dtype=np.int64),
            }
        )

    pruned = ds.map_batches(
        lambda t: t.select([user_col, ts_col, id_column]), batch_format="pyarrow"
    )
    return pruned.groupby(user_col).map_groups(per_user, batch_format="pandas")
