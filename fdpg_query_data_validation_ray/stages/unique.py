"""Uniqueness constraint: duplicate-key detection via two-phase aggregation.

Reference analog: the reference's only dedup is IssueSet's exact
hash-dedup-and-count (extraction/IssueSet.py:9-26); the north_rule lifts the
same shape to data rows — uniqueness on (repo, path, commit) with the
duplicate count attached to each violation.

Scale design (SURVEY.md §2.7, §4.2):
- project to the key columns BEFORE any exchange (never shuffle `content`);
- phase 1: per-batch pyarrow group_by collapses intra-batch duplicates —
  this is the salted pre-aggregate (salt = batch), so a hot key contributes at
  most one row per batch to the shuffle, bounding skew;
- phase 2: a Ray Data hash groupby over the (much smaller) partial counts,
  summing to global counts; only keys with count > 1 survive.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.rules import DIAGNOSTICS
from fdpg_query_data_validation_ray.schema import VIOLATION_SCHEMA
from fdpg_query_data_validation_ray.stages.row_checks import row_key_array


def duplicate_keys(ds, key_columns: list[str], count_name: str = "dup_count"):
    """Dataset of duplicate key groups: (key columns..., dup_count>1)."""
    from ray.data.aggregate import Sum

    key_columns = list(key_columns)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(key_columns)
        return t.group_by(key_columns).aggregate([([], "count_all")])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    totals = partials.groupby(key_columns).aggregate(
        Sum("count_all", alias_name=count_name)
    )
    return totals.map_batches(
        lambda t: t.filter(pc.greater(t[count_name], 1)), batch_format="pyarrow"
    )


def uniqueness_violations(ds, key_columns: list[str], severity: str = "error"):
    """Violation rows (VIOLATION_SCHEMA) — one per duplicate key group, with
    the group size in `actual` (IssueSet count semantics)."""
    key_columns = list(key_columns)
    rule_id = f"unique({','.join(key_columns)})"
    location = ",".join(key_columns)
    diagnostics = DIAGNOSTICS["unique"]

    def to_violations(t: pa.Table) -> pa.Table:
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

    return duplicate_keys(ds, key_columns).map_batches(
        to_violations, batch_format="pyarrow"
    )
