"""Grouping-sets / ROLLUP / CUBE aggregation in one data-sized exchange.

SQL's `GROUP BY ROLLUP(a, b)` computes the same decomposable aggregates at
several granularities — (a, b), (a), () — in one statement. The naive
distributed plan runs one shuffle per grouping set; that is S full
exchanges over the fact table. Because Sum/Count are decomposable, every
coarser set is derivable from the FINEST aggregate, so the plan here is:

  1. per-batch combiner: partial sums/counts at the finest granularity
     (the exchange moves a handful of rows per batch, not the fact table),
  2. ONE groupby over the finest keys → the finest aggregate dataset,
  3. each coarser grouping set re-aggregates the finest dataset — these
     exchanges are O(finest-group-count), negligible next to the data,
  4. union of all levels, with aggregated-away key columns NULL-filled and
     a `lvl` bitmask matching SQL's GROUPING(k1, .., kn) (leftmost key =
     most significant bit; bit set ⇔ the key is aggregated away).

Precondition (same class as global_rank's): the FINEST grouping must have
bounded cardinality — true by construction for rollup/cube dimensions
(flags, statuses, categories). For near-unique keys this is the wrong
operator; use a plain groupby per set.

Reference parity: the reference's report aggregates issue counts at
resource-type and whole-corpus granularity from one pass
(/root/reference/latex_report/report_visualizer.py:144-230 renders both a
per-type table and corpus totals); this generalizes that two-level rollup.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def rollup_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """ROLLUP(k1..kn): prefixes from finest to empty."""
    return [tuple(keys[:i]) for i in range(len(keys), -1, -1)]


def cube_sets(keys: Sequence[str]) -> list[tuple[str, ...]]:
    """CUBE(k1..kn): all subsets, finest first."""
    n = len(keys)
    out = []
    for mask in range(2**n - 1, -1, -1):
        out.append(tuple(k for i, k in enumerate(keys) if mask & (1 << (n - 1 - i))))
    return out


def grouping_level(keys: Sequence[str], subset: Sequence[str]) -> int:
    """SQL GROUPING(k1..kn) bitmask: leftmost key = MSB, set ⇔ rolled up."""
    s = set(subset)
    lvl = 0
    for i, k in enumerate(keys):
        if k not in s:
            lvl |= 1 << (len(keys) - 1 - i)
    return lvl


def grouping_sets(
    ds,
    keys: Sequence[str],
    value_cols: Sequence[str],
    sets: Sequence[Sequence[str]] | None = None,
    count_alias: str = "n_rows",
    batch_size: int = 16384,
):
    """Sum(value_cols) + Count(*) at each grouping set, one fact exchange.

    `value_cols` must already be exact integer columns (fixed-point cents /
    e6 — see queries._cents) so re-aggregation is order-independent.
    Returns a Dataset with columns [*keys, "lvl", count_alias, *sum_cols]
    where sum_cols are named ``sum_<col>``.
    """
    from ray.data.aggregate import Sum

    keys = list(keys)
    value_cols = list(value_cols)
    if sets is None:
        sets = rollup_sets(keys)
    sets = [tuple(s) for s in sets]
    if tuple(keys) not in sets:
        raise ValueError("grouping_sets requires the finest set (all keys)")

    def partial(t: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in value_cols] + [([], "count_all")]
        return t.group_by(keys).aggregate(aggs)

    finest = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .groupby(keys)
        .aggregate(
            *[Sum(f"{c}_sum", alias_name=f"sum_{c}") for c in value_cols],
            Sum("count_all", alias_name=count_alias),
        )
    )

    # The finest aggregate is bounded-cardinality (the operator's documented
    # precondition) and is consumed by every grouping-set branch below —
    # materialize it ONCE so the fact-table exchange doesn't re-execute per
    # branch (lazy fan-out recompute).
    finest = finest.materialize()

    sum_cols = [f"sum_{c}" for c in value_cols]
    out_cols = keys + ["lvl", count_alias] + sum_cols

    def finalize(subset: tuple[str, ...], key_types: dict):
        lvl = grouping_level(keys, subset)

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for k in keys:
                if k in subset:
                    cols[k] = t[k]
                else:
                    cols[k] = pa.nulls(n, key_types[k])
            cols["lvl"] = pa.array([lvl] * n, pa.int64())
            cols[count_alias] = t[count_alias]
            for c in sum_cols:
                cols[c] = t[c]
            return pa.table({c: cols[c] for c in out_cols})

        return fn

    key_types = {
        f.name: f.type for f in finest.schema().base_schema if f.name in keys
    }

    levels = []
    for subset in sets:
        if subset == tuple(keys):
            lv = finest
        elif subset:
            lv = finest.groupby(list(subset)).aggregate(
                *[Sum(c, alias_name=c) for c in sum_cols],
                Sum(count_alias, alias_name=count_alias),
            )
        else:
            # global totals: constant-key groupby over the tiny finest set
            lv = (
                finest.map_batches(
                    lambda t: t.append_column(
                        "_all", pa.array([0] * t.num_rows, pa.int8())
                    ),
                    batch_format="pyarrow",
                )
                .groupby("_all")
                .aggregate(
                    *[Sum(c, alias_name=c) for c in sum_cols],
                    Sum(count_alias, alias_name=count_alias),
                )
            )
        levels.append(lv.map_batches(finalize(subset, key_types), batch_format="pyarrow"))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
