"""Uniqueness constraint: duplicate-key detection, hash-first and exact.

Reference analog: the reference's only dedup is IssueSet's exact
hash-dedup-and-count (extraction/IssueSet.py:9-26); the north_rule lifts the
same shape to data rows — uniqueness on (repo, path, commit) with the
duplicate count attached to each violation.

Scale design (SURVEY.md §2.7, §4.2). A groupby over the composite STRING key
is an all-to-all sort of every row's key strings — measured 22s on 1M rows
where the entire row-check pass takes 10s; even an int64-hash groupby pays the
full exchange (17s). Duplicates are usually rare, so detection is a candidate
sieve + exact verify; BOTH passes are distributed:

- pass 1 (candidate sieve) has two interchangeable strategies, auto-selected
  by estimated input size (`mode="auto"`, the default):
  - "sieve": each batch reduces its rows to 64-bit mixed key hashes
    (8 bytes/row, vectorized, no string concatenation); the hash arrays
    stream to the driver where one `np.unique(return_counts)` finds hashes
    seen more than once. Fastest while 8 B x rows fits the driver
    (~50M rows by default — QDV_SIEVE_MAX_DRIVER_ROWS).
  - "shuffle": salted hash-partitioned pre-aggregate + groupby(khash) —
    nothing O(rows) ever reaches the driver; the scale-safe default whenever
    the input size is unknown or above the driver budget.
- pass 2 (exact verify) is always distributed: the sorted candidate-hash
  array is broadcast (`ray.put`, read once per actor), rows whose key-hash
  hits the set (binary search) survive, and the survivors are counted by the
  ACTUAL key values via per-batch partial aggregation + a Ray groupby over
  the (rare) candidates — no driver concat of duplicate rows, so dense
  duplicate corpora (30-50% dup rates in training data) stay off the driver.
  Exact under 64-bit collisions: distinct keys that collide fall out at the
  final count, true duplicates always surface.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64, mix64
from fdpg_query_data_validation_ray.rules import DIAGNOSTICS
from fdpg_query_data_validation_ray.schema import VIOLATION_SCHEMA
from fdpg_query_data_validation_ray.stages.row_checks import row_key_array

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

# driver budget for the "sieve" strategy: 8 B/row of int64 hashes. Above this
# (or when the row count is unknown) auto mode picks the shuffle strategy.
SIEVE_MAX_DRIVER_ROWS = int(os.environ.get("QDV_SIEVE_MAX_DRIVER_ROWS", 50_000_000))


def key_hash(t: pa.Table, key_columns: list[str]) -> np.ndarray:
    """Order-sensitive 64-bit combined hash of the key columns (no string
    join materialized)."""
    h = hash64(t.column(key_columns[0]))
    with np.errstate(over="ignore"):
        for c in key_columns[1:]:
            h = mix64(h * _GOLDEN ^ hash64(t.column(c)))
    return h


def estimated_rows(ds) -> int | None:
    """Metadata row count when the plan can provide one without executing
    (parquet reads); None after transforms."""
    try:
        return ds._meta_count()
    except Exception:
        return None


def resolve_sieve_mode(ds, mode: str) -> str:
    """auto → 'sieve' only when the input is provably within the driver
    budget; 'shuffle' (scale-safe) otherwise. QDV_SIEVE_MODE overrides."""
    env = os.environ.get("QDV_SIEVE_MODE")
    if env in ("sieve", "shuffle"):
        return env
    if mode != "auto":
        return mode
    n = estimated_rows(ds)
    if n is not None and n <= SIEVE_MAX_DRIVER_ROWS:
        return "sieve"
    return "shuffle"


def _empty_result(ds, key_columns: list[str], count_name: str) -> pa.Table:
    schema = ds.schema()
    fields = [(c, schema.base_schema.field(c).type) for c in key_columns]
    return pa.table(
        {c: pa.array([], t) for c, t in fields}
        | {count_name: pa.array([], pa.int64())}
    )


def candidate_dup_hashes(ds, key_columns: list[str]) -> np.ndarray:
    """Pass 1, driver strategy: sorted int64 hashes that occur more than once
    (superset of the true duplicate keys). 8 B/row at the driver."""
    def to_hashes(batch: pa.Table) -> pa.Table:
        kh = key_hash(batch, key_columns)
        return pa.table({"khash": pa.array(kh.view(np.int64))})

    proj = ds.map_batches(to_hashes, batch_format="pyarrow")
    chunks = [b["khash"].to_numpy() for b in proj.iter_batches(batch_format="pyarrow", batch_size=None)]
    if not chunks:
        return np.array([], dtype=np.int64)
    # sort + adjacent-equal scan, NOT np.unique(return_counts=True): the
    # counts path argsorts and histograms (~9x slower at 16M hashes — 2.9 s
    # vs 0.33 s measured); only the duplicated values matter here
    s = np.sort(np.concatenate(chunks))
    dups = s[1:][s[1:] == s[:-1]]
    return np.unique(dups)  # sorted; tiny on a typical corpus


def candidate_dup_hashes_shuffle(ds, key_columns: list[str]) -> np.ndarray:
    """Pass 1, hash-partitioned strategy (the north_rule's explicit salted
    shuffle plan — nothing O(rows) reaches the driver):

    - salted pre-aggregate: per-batch pyarrow group_by collapses intra-batch
      duplicates, so a hot key ships ≤ 1 (hash, partial-count) row per batch —
      the salt is the batch itself, bounding any reducer's share of a hot key
      by the number of batches, not the number of rows;
    - hash shuffle: groupby over the int64 key hash (even distribution by
      construction — it IS a hash) sums partial counts per reducer;
    - only hashes with global count > 1 return to the driver (rare).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(key_columns)
        t = t.group_by(key_columns).aggregate([([], "count_all")])
        kh = key_hash(t, key_columns)
        return pa.table(
            {"khash": pa.array(kh.view(np.int64)), "count_all": t["count_all"]}
        )

    totals = ds.map_batches(partial, batch_format="pyarrow").groupby(
        "khash"
    ).aggregate(Sum("count_all", alias_name="n"))
    cand = totals.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["khash"]),
        batch_format="pyarrow",
    )
    chunks = [
        b["khash"].to_numpy() for b in cand.iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    if not chunks:
        return np.array([], dtype=np.int64)
    return np.sort(np.concatenate(chunks))


def make_candidate_picker(hset_ref, key_columns: list[str]):
    """Broadcast membership filter as a TASK fn: the candidate array is
    `ray.put` once and `ray.get` per task — a zero-copy read from the local
    object store, so plain tasks beat an actor pool (no pool startup latency,
    same no-reshipping guarantee)."""

    def pick(batch: pa.Table) -> pa.Table:
        import ray

        hset = ray.get(hset_ref)
        kh = key_hash(batch, key_columns).view(np.int64)
        ix = np.searchsorted(hset, kh)
        ix[ix == len(hset)] = 0
        return batch.filter(pa.array(hset[ix] == kh))

    return pick


def duplicate_keys(
    ds, key_columns: list[str], count_name: str = "dup_count", mode: str = "auto"
):
    """Duplicate key groups: (key columns..., count_name > 1). Returns a
    pyarrow Table sorted by the key columns (the RESULT — the dup-group set —
    is all that materializes at the driver; the heavy work streams).

    mode="auto" (default) resolves pass 1 per `resolve_sieve_mode`:
    "sieve" (driver-merged hash sieve, fastest within the 8 B/row driver
    budget) vs "shuffle" (salted hash-partitioned groupby, scale-safe).
    Pass 2 (exact verify by true key values) is distributed in BOTH modes.
    Identical results either way."""
    import ray
    from ray.data.aggregate import Sum

    key_columns = list(key_columns)
    if resolve_sieve_mode(ds, mode) == "shuffle":
        cand = candidate_dup_hashes_shuffle(ds, key_columns)
    else:
        cand = candidate_dup_hashes(ds, key_columns)
    if len(cand) == 0:
        return _empty_result(ds, key_columns, count_name)

    hset_ref = ray.put(cand)
    picked = ds.map_batches(
        make_candidate_picker(hset_ref, key_columns), batch_format="pyarrow"
    )

    # pass 2: exact count by TRUE key values, never a driver concat of
    # duplicate ROWS — per-batch pyarrow partial counts collapse each batch's
    # share of a hot key to one (key, partial-count) row, then either:
    # - candidate set small (the usual case): stream the partials to the
    #   driver and merge INCREMENTALLY — the running buffer re-aggregates
    #   whenever it exceeds ~4× the candidate count, so driver memory is
    #   O(candidates) regardless of input rows or duplicate density;
    # - candidate set large: a Ray groupby over the partials (pays the
    #   shuffle constant only when the result itself is shuffle-sized).
    def count_partial(batch: pa.Table) -> pa.Table:
        return batch.select(key_columns).group_by(key_columns).aggregate(
            [([], "count_all")]
        )

    partials = picked.map_batches(count_partial, batch_format="pyarrow")
    if len(cand) <= 5_000_000:
        g = _merge_partials_driver(partials, key_columns, cap=max(4 * len(cand), 65_536))
    else:
        totals = partials.groupby(key_columns).aggregate(
            Sum("count_all", alias_name="count_all")
        )
        parts = [
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in totals.iter_batches(batch_format="pyarrow", batch_size=None)
        ]
        parts = [p for p in parts if p.num_rows]
        g = pa.concat_tables(parts).combine_chunks() if parts else None
    if g is None or g.num_rows == 0:
        return _empty_result(ds, key_columns, count_name)
    g = g.filter(pc.greater(g["count_all"], 1))
    if g.num_rows == 0:
        return _empty_result(ds, key_columns, count_name)
    g = g.rename_columns(key_columns + [count_name])
    return g.select(key_columns + [count_name]).sort_by(
        [(c, "ascending") for c in key_columns]
    )


MERGE_OVERFLOW = object()
"""Sentinel returned by _merge_partials_driver when `hard_limit` is set and
the DISTINCT-key result itself exceeds it — the caller must fall back to a
distributed plan instead of materializing the result at the driver."""


def _merge_partials_driver(
    partials, key_columns: list[str], cap: int, hard_limit: int | None = None
):
    """Incrementally merge streamed (key, count_all) partial tables with
    bounded driver memory: re-aggregate whenever the buffer exceeds `cap`
    rows (the merged result can never exceed the candidate-key count).

    `hard_limit` bounds the MERGED (distinct-key) row count: if a regroup
    still leaves more rows than the limit, the distinct result genuinely does
    not fit the driver (e.g. an empty dimension against a high-cardinality
    fact column makes every distinct fact key 'dangling') and MERGE_OVERFLOW
    is returned so the caller can keep the result distributed."""
    def regroup(t: pa.Table) -> pa.Table:
        out = t.group_by(key_columns).aggregate([("count_all", "sum")])
        return out.rename_columns(key_columns + ["count_all"])

    buf: pa.Table | None = None
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if not t.num_rows:
            continue
        buf = t if buf is None else pa.concat_tables([buf, t])
        if buf.num_rows > cap:
            buf = regroup(buf.combine_chunks())
            if hard_limit is not None and buf.num_rows > hard_limit:
                return MERGE_OVERFLOW
    return regroup(buf.combine_chunks()) if buf is not None else None


def uniqueness_violations(ds, key_columns: list[str], severity: str = "error"):
    """Violation rows (VIOLATION_SCHEMA) — one per duplicate key group, with
    the group size in `actual` (IssueSet count semantics). Returns a pyarrow
    Table."""
    key_columns = list(key_columns)
    rule_id = f"unique({','.join(key_columns)})"
    location = ",".join(key_columns)
    diagnostics = DIAGNOSTICS["unique"]

    t = duplicate_keys(ds, key_columns)
    n = t.num_rows
    if n == 0:
        return VIOLATION_SCHEMA.empty_table()
    keys = row_key_array(t, tuple(key_columns))
    return pa.table(
        {
            "rule_id": pa.array([rule_id] * n),
            "severity": pa.array([severity] * n),
            "location": pa.array([location] * n),
            "diagnostics": pa.array([diagnostics] * n),
            "row_key": pc.cast(keys, pa.string()),
            "actual": pc.cast(t["dup_count"], pa.string()),
        },
        schema=VIOLATION_SCHEMA,
    )
