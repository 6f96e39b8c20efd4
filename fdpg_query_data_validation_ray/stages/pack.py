"""Sequence packing: concat-and-chunk documents into fixed token-budget
training sequences (the canonical LLM-pretraining packing: documents are
concatenated in a deterministic order and the token stream is split every
`budget` tokens; a document overlapping a boundary belongs to every sequence
its span touches).

The hard part at scale is each document's global token OFFSET — a prefix sum
over the whole corpus in doc-id order. Implemented as a range-partitioned
two-pass prefix sum (no O(rows) driver state, no global sort):

  pass 1: map_batches → per-range token subtotals → tiny groupby(range_id)
          aggregate; the driver prefix-sums the R range totals (O(R), R is a
          parameter, default 1024) and broadcasts the base offsets.
  pass 2: groupby(range_id).map_groups — each range's rows are co-located,
          sorted by id within the group, exclusive-cumsum'd, and every doc
          emits one (id, seq_id) row per budget window its span overlaps
          (vectorized repeat + arange, no per-row Python).

Partitioning assumption: one id-range's rows fit one group (same contract as
the temporal operators); `n_ranges` scales the group size down. Ids must be
non-negative integers; rows with null id or null token source are excluded
(the SQL oracle's WHERE clause matches).

Reference analog: none (the reference validates, it does not pack); this is
part of the mandated LLM-pipeline surface. The oracle replay is
SUM() OVER (ORDER BY id ROWS UNBOUNDED PRECEDING ... 1 PRECEDING) +
generate_series(start//B, (start+tokens-1)//B) in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(
    ds,
    id_column: str,
    token_column: str,
    budget: int,
    n_ranges: int = 1024,
):
    """→ Dataset of (id_column, seq_id): one row per (document, sequence)
    assignment. `token_column` must already hold each row's positive token
    count (compute it upstream — e.g. 1 + n_chars // 4)."""
    import ray
    from ray.data.aggregate import Sum

    assert budget > 0
    # Packing needs THREE passes over its input (id bounds → per-range token
    # totals → emission). Materialize the 16 B/row (id, tokens) projection
    # ONCE so those passes read narrow materialized blocks instead of
    # re-executing the upstream pipeline three times — composed callers
    # (q_pretrain_corpus: normalize→langid→dedup→decontaminate→scrub) would
    # otherwise pay their whole chain per pass. The projection spills fine at
    # scale and is strictly cheaper than any one upstream recompute.
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                id_column: pc.cast(t[id_column], pa.int64()),
                token_column: pc.cast(t[token_column], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    stats = ds.map_batches(
        lambda t: pa.table(
            {
                "mn": pa.array([pc.min(t[id_column]).as_py()], pa.int64()),
                "mx": pa.array([pc.max(t[id_column]).as_py()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    if stats.empty or stats["mn"].isna().all():
        return ds.map_batches(
            lambda t: pa.table(
                {id_column: pa.array([], pa.int64()), "seq_id": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    lo = int(stats["mn"].min())
    hi = int(stats["mx"].max())
    width = max(1, (hi - lo + n_ranges) // n_ranges)

    def keyed(t: pa.Table) -> pa.Table:
        # null id/tokens and non-positive tokens are excluded (zero-token
        # docs occupy no span; the oracle filters identically)
        keep = pc.and_(
            pc.and_(pc.is_valid(t[id_column]), pc.is_valid(t[token_column])),
            pc.greater(pc.cast(t[token_column], pa.int64()), 0),
        )
        t = t.filter(keep)
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = t[token_column].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "rid": pa.array((ids - lo) // width),
                id_column: pa.array(ids),
                "tokens": pa.array(toks),
            }
        )

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # pass 1: per-range token totals (tiny aggregate), driver prefix-sums
    totals = (
        keyed_ds.map_batches(
            lambda t: pa.table(
                {"rid": t["rid"], "tokens": t["tokens"]}
            ).group_by("rid").aggregate([("tokens", "sum")]),
            batch_format="pyarrow",
        )
        .groupby("rid")
        .aggregate(Sum("tokens_sum", alias_name="range_tokens"))
        .to_pandas()
    )
    totals = totals.sort_values("rid").reset_index(drop=True)
    bases = np.zeros(n_ranges + 1, dtype=np.int64)
    per_range = np.zeros(n_ranges, dtype=np.int64)
    per_range[totals["rid"].to_numpy()] = totals["range_tokens"].to_numpy()
    np.cumsum(per_range, out=bases[1:])  # bases[r] = tokens before range r
    bases_ref = ray.put(bases)

    def emit(group: pa.Table) -> pa.Table:
        import ray as _ray

        if group.num_rows == 0:
            return pa.table(
                {id_column: pa.array([], pa.int64()), "seq_id": pa.array([], pa.int64())}
            )
        base = _ray.get(bases_ref)
        rid = int(group["rid"][0].as_py())
        ids = group[id_column].to_numpy(zero_copy_only=False)
        toks = group["tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, toks = ids[order], toks[order]
        ends = np.cumsum(toks)
        starts = base[rid] + ends - toks
        ends = base[rid] + ends
        first = starts // budget
        last = (ends - 1) // budget  # tokens >= 1 → span non-empty
        counts = (last - first + 1).astype(np.int64)
        tot = int(counts.sum())
        cs = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=cs[1:])
        within = np.arange(tot, dtype=np.int64) - np.repeat(cs, counts)
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, counts)),
                "seq_id": pa.array(np.repeat(first, counts) + within),
            }
        )

    return keyed_ds.groupby("rid").map_groups(emit, batch_format="pyarrow")
