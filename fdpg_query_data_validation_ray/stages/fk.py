"""Referential integrity: anti-join of fact keys against a dimension.

Reference analog: reference-existence checks surfaced by the validator as
missing-reference issues ("Condition.subject: minimum required = 1...",
extraction/test/test_profiles.py:42-51); here an explicit FK check of e.g.
`repo`/`commit` against registered dimension tables (SURVEY.md §2.4 J5).

Two physical plans, chosen by dimension size:
- broadcast (default, dim fits the object store budget): `ray.put` the dim key
  array ONCE, each checker actor `ray.get`s it in __init__ (zero per-batch
  re-shipping) and filters with a vectorized `pc.is_in` — no shuffle at all;
- hash-partitioned (both sides large): project fact side to its key columns,
  bucket both sides by hash64(key) % B, co-group per bucket, and emit keys
  present in the fact bucket but absent from the dim bucket. Only key columns
  ever move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64
from fdpg_query_data_validation_ray.rules import DIAGNOSTICS
from fdpg_query_data_validation_ray.schema import VIOLATION_SCHEMA
from fdpg_query_data_validation_ray.stages.row_checks import row_key_array


def _joined_key(table: pa.Table, columns: list[str]) -> pa.ChunkedArray | pa.Array:
    return row_key_array(table, tuple(columns))


def _violation_table(
    keys, actual, rule_id: str, location: str, severity: str
) -> pa.Table:
    n = len(keys)
    if n == 0:
        return VIOLATION_SCHEMA.empty_table()
    return pa.table(
        {
            "rule_id": pa.array([rule_id] * n),
            "severity": pa.array([severity] * n),
            "location": pa.array([location] * n),
            "diagnostics": pa.array([DIAGNOSTICS["foreign_key"]] * n),
            "row_key": pc.cast(keys, pa.string()),
            "actual": pc.cast(actual, pa.string()),
        },
        schema=VIOLATION_SCHEMA,
    )


class BroadcastFKChecker:
    """Actor-pool stage: dim key set fetched from the object store once per
    actor (reference: the terminology server's value sets loaded once,
    docker-compose.yml:32-46), then vectorized membership per batch."""

    def __init__(
        self,
        columns: list[str],
        key_columns: list[str],
        dim_ref=None,
        dim_keys: list[str] | None = None,
        severity: str = "error",
        dim_name: str = "",
    ):
        import ray

        self.columns = list(columns)
        self.key_columns = tuple(key_columns)
        keys = ray.get(dim_ref) if dim_ref is not None else dim_keys
        self.dim = pa.array(list(keys), type=pa.string())
        self.severity = severity
        self.rule_id = f"foreign_key({','.join(self.columns)}->{dim_name})"
        self.location = ",".join(self.columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fact_key = pc.cast(_joined_key(batch, self.columns), pa.string())
        dangling = pc.and_(
            pc.invert(pc.is_in(fact_key, value_set=self.dim)),
            pc.is_valid(batch.column(self.columns[0]))
            if len(self.columns) == 1
            else pc.is_valid(fact_key),
        )
        dangling = pc.fill_null(dangling, False)
        keys = pc.filter(row_key_array(batch, self.key_columns), dangling)
        actual = pc.filter(fact_key, dangling)
        return _violation_table(keys, actual, self.rule_id, self.location, self.severity)


def fk_violations_broadcast(
    ds,
    columns: list[str],
    dim_keys,
    key_columns: list[str],
    severity: str = "error",
    dim_name: str = "dim",
    concurrency=(1, 4),
):
    """dim_keys: iterable of key strings (joined with '|' for composites), a
    pyarrow Array, or an ObjectRef to one (ray.put once, read per actor)."""
    import ray

    if isinstance(dim_keys, ray.ObjectRef):
        kwargs = dict(dim_ref=dim_keys)
    else:
        keys = dim_keys.to_pylist() if isinstance(dim_keys, (pa.Array, pa.ChunkedArray)) else list(dim_keys)
        kwargs = dict(dim_keys=keys)
    return ds.map_batches(
        BroadcastFKChecker,
        fn_constructor_kwargs=dict(
            columns=columns,
            key_columns=key_columns,
            severity=severity,
            dim_name=dim_name,
            **kwargs,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def dangling_keys_hash(
    fact_ds,
    columns: list[str],
    dim_ds,
    dim_columns: list[str] | None = None,
    num_buckets: int = 64,
):
    """Hash-partitioned anti-join for large dimensions. Returns a Dataset with
    one row per distinct dangling key: (fk_key, n_rows).

    Both sides are projected to their key columns, pre-deduplicated per batch
    (bounds skew exactly like the uniqueness pre-aggregate), bucketed by
    hash64(key) % num_buckets, and co-grouped; within a bucket the anti-join is
    a vectorized `pc.is_in` over key arrays.
    """
    from ray.data.aggregate import Sum

    dim_columns = list(dim_columns or columns)

    def fact_partial(batch: pa.Table) -> pa.Table:
        key = pc.cast(_joined_key(batch, list(columns)), pa.string())
        t = pa.table({"fk_key": key})
        t = t.group_by(["fk_key"]).aggregate([([], "count_all")])
        h = hash64(t["fk_key"])
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        ).append_column("side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    def dim_partial(batch: pa.Table) -> pa.Table:
        key = pc.cast(_joined_key(batch, dim_columns), pa.string())
        t = pa.table({"fk_key": pc.unique(key)})
        h = hash64(t["fk_key"])
        return pa.table(
            {
                "fk_key": t["fk_key"],
                "count_all": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "bucket": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    fact_keys = fact_ds.map_batches(fact_partial, batch_format="pyarrow")
    dim_keys = dim_ds.map_batches(dim_partial, batch_format="pyarrow")
    tagged = fact_keys.union(dim_keys)

    def anti(group: pa.Table) -> pa.Table:
        side = group["side"]
        dim_mask = pc.equal(side, 1)
        dim_arr = pc.filter(group["fk_key"], dim_mask)
        fact = group.filter(pc.equal(side, 0))
        dangling = pc.invert(pc.is_in(fact["fk_key"], value_set=dim_arr.combine_chunks()))
        bad = fact.filter(pc.fill_null(dangling, False))
        # per-bucket partial sums; a key appears in exactly one bucket, but may
        # have several fact partial rows → aggregate below
        return bad.select(["fk_key", "count_all"])

    out = tagged.groupby("bucket").map_groups(anti, batch_format="pyarrow")
    return out.groupby("fk_key").aggregate(Sum("count_all", alias_name="n_rows"))
