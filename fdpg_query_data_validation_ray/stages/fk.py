"""Referential integrity: anti-join of fact keys against a dimension.

Reference analog: reference-existence checks surfaced by the validator as
missing-reference issues ("Condition.subject: minimum required = 1...",
extraction/test/test_profiles.py:42-51); here an explicit FK check of e.g.
`repo`/`commit` against registered dimension tables (SURVEY.md §2.4 J5).

Two physical plans, chosen by dimension size:
- broadcast (default, dim fits the object store budget): `ray.put` the dim key
  array ONCE, each checker actor `ray.get`s it in __init__ (zero per-batch
  re-shipping) and filters with a vectorized `pc.is_in` — no shuffle at all;
- hash-partitioned (both sides large): project both sides to their key
  columns, pre-dedup per batch, tag by side, route by a COARSE key-hash
  partition id, and resolve existence per partition with one vectorized
  anti-join. Only (key, count, tag, part) rows ever move, and the one
  exchange sorts a small int32 partition column instead of per-key strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    """Broadcast membership stage: the dim key set is resolved once at
    construction (reference: the terminology server's value sets loaded
    once, docker-compose.yml:32-46) and shipped with the serialized
    callable, then vectorized membership per batch."""

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
    # task-based instance: the dim value-set array is built once driver-side
    # and rides the serialized callable (one plasma object, cached per
    # worker) — a dedicated actor pool only added ~0.5-1 s startup latency.
    # An explicit int `concurrency` caps task parallelism (memory guard for
    # huge dim key sets); tuples were the old actor-pool spec and mean
    # "unbounded tasks" now, as does None.
    checker = BroadcastFKChecker(
        columns=columns,
        key_columns=key_columns,
        severity=severity,
        dim_name=dim_name,
        **kwargs,
    )
    mb_kwargs = {}
    if isinstance(concurrency, int):
        mb_kwargs["concurrency"] = concurrency
    return ds.map_batches(
        checker,
        batch_format="pyarrow",
        batch_size=8192,
        **mb_kwargs,
    )


def _dangling_sieve(fact_ds, dim_ds, columns, dim_columns, _key):
    """No-shuffle anti-join attempt: stream the dim side's per-batch-unique
    keys to the driver with a hard budget; on success broadcast the EXACT key
    set (values, not hashes — no collision caveat) and anti-filter the fact
    side with vectorized `is_in`, finishing counts via the bounded
    incremental partial merge. Returns None when the dim — or the merged
    dangling-key RESULT — overflows the budget (caller falls back to the
    single-shuffle tagged-groupby plan, which keeps the result distributed)."""
    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.unique import (
        MERGE_OVERFLOW,
        SIEVE_MAX_DRIVER_ROWS,
        _merge_partials_driver,
    )

    def dim_keys_batch(batch: pa.Table) -> pa.Table:
        return pa.table({"fk_key": pc.unique(_key(batch, list(dim_columns)))})

    chunks, total = [], 0
    for b in dim_ds.map_batches(dim_keys_batch, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        arr = t["fk_key"].combine_chunks()
        chunks.append(arr)
        total += len(arr)
        if total > SIEVE_MAX_DRIVER_ROWS:
            return None  # dim too big for the driver — shuffle plan instead
    if chunks:
        dim_arr = pc.unique(pa.concat_arrays(
            [c if isinstance(c, pa.Array) else c.combine_chunks() for c in chunks]
        ))
    else:
        dim_arr = pa.array([], pa.string())  # empty dim: every fact key dangles
    ref = ray.put(dim_arr)

    def anti_partial(batch: pa.Table) -> pa.Table:
        dim = ray.get(ref)  # zero-copy local object-store read per task
        keys = _key(batch, list(columns))
        if len(dim):
            keys = keys.filter(pc.invert(pc.is_in(keys, value_set=dim)))
        t = pa.table({"fk_key": keys})
        return t.group_by(["fk_key"]).aggregate([([], "count_all")])

    partials = fact_ds.map_batches(anti_partial, batch_format="pyarrow")
    # the dangling-key RESULT is driver-materialized too: bound it by the same
    # budget (an empty/mismatched dim against a high-cardinality fact would
    # otherwise collect every distinct fact key here) and bail to the
    # distributed shuffle plan on overflow
    g = _merge_partials_driver(
        partials, ["fk_key"], cap=1 << 20, hard_limit=SIEVE_MAX_DRIVER_ROWS
    )
    if g is MERGE_OVERFLOW:
        return None
    if g is None or g.num_rows == 0:
        out = pa.table(
            {"fk_key": pa.array([], pa.string()), "n_rows": pa.array([], pa.int64())}
        )
    else:
        out = pa.table(
            {"fk_key": pc.cast(g["fk_key"], pa.string()), "n_rows": g["count_all"]}
        )
    return rd.from_arrow(out)


def dangling_keys_hash(
    fact_ds,
    columns: list[str],
    dim_ds,
    dim_columns: list[str] | None = None,
    num_buckets: int = 64,  # kept for API stability; single-shuffle plan below
    mode: str = "auto",
):
    """Anti-join for referential integrity at dimension scale. Returns a
    Dataset with one row per distinct dangling key: (fk_key, n_rows).

    mode="auto" (default): first TRY the no-shuffle sieve — stream the dim
    side's per-batch-deduplicated keys to the driver; if the exact dim key
    set stays within the driver budget (QDV_SIEVE_MAX_DRIVER_ROWS), broadcast
    it and anti-filter the fact side with a C-level `is_in`, finishing the
    (rare) dangling keys' counts with the bounded incremental partial merge —
    zero shuffles, exact (real key VALUES are compared, not hashes). If the
    dim overflows the budget mid-stream, bail out (one wasted dim scan) to
    the shuffle plan. QDV_SIEVE_MODE=shuffle / mode="shuffle" forces:

    ONE shuffle total: both sides are projected to their key columns and
    pre-deduplicated per batch (bounds skew exactly like the uniqueness
    pre-aggregate — a hot key contributes ≤ 1 row per batch per side), tagged
    fact=0 / dim=1 and routed by `part = hash64(key) mod P` (P coarse
    hash-range partitions, ~8× cluster CPUs). A groupby(part).map_groups then
    resolves each partition with ONE vectorized kernel: C-level group_by to
    finish the fact counts, `pc.is_in` against the partition's dim keys to
    drop matched keys. Keys the dim never touched are dangling.

    vs the previous per-key Sum/Max groupby: the exchange volume is the same
    (key, count, tag rows), but Ray's sort-aggregate now orders a small int32
    partition column instead of every key string, and the per-key aggregation
    happens inside Arrow kernels — the "Ray sort-aggregate constant" (~8-20 s
    per 1M shuffled rows, NOTES.md #1) no longer scales with key width or
    per-group machinery. hash64 is deterministic across processes, so the
    same key always lands in the same partition; the result stays distributed
    (one output block per partition).
    """
    dim_columns = list(dim_columns or columns)

    # single-column FKs shuffle in a NATIVE numeric type (int sort ≪ string
    # sort); only the (small) dangling output is cast to string. The shuffle
    # key type must be IDENTICAL on both sides — fact int32 vs dim int64 would
    # otherwise fail the union or mis-compare — so promote once from the two
    # schemas: both integer → int64, else string. Composite keys join with '|'.
    def _schema_type(ds_, col):
        return ds_.schema().base_schema.field(col).type

    if len(columns) == 1:
        ftype = _schema_type(fact_ds, columns[0])
        dtype_ = _schema_type(dim_ds, dim_columns[0])
        if pa.types.is_integer(ftype) and pa.types.is_integer(dtype_):
            f_u64 = ftype == pa.uint64()
            d_u64 = dtype_ == pa.uint64()
            if f_u64 and d_u64:
                key_type = pa.uint64()
            elif f_u64 or d_u64:
                # uint64 values above 2^63 don't fit int64 (cast raises) and a
                # signed side can hold negatives that don't fit uint64 —
                # string is the only lossless common type
                key_type = pa.string()
            else:
                key_type = pa.int64()
        else:
            key_type = pa.string()
    else:
        key_type = pa.string()

    def _key(batch: pa.Table, cols: list[str]):
        if len(cols) == 1:
            # null FKs are not dangling (reference: absent elements surface as
            # cardinality issues, not reference issues) — drop before counting
            return pc.drop_null(pc.cast(batch.column(cols[0]), key_type))
        return pc.drop_null(pc.cast(_joined_key(batch, cols), pa.string()))

    env_mode = __import__("os").environ.get("QDV_SIEVE_MODE")
    if env_mode in ("sieve", "shuffle"):
        mode = env_mode
    if mode != "shuffle":
        sieved = _dangling_sieve(fact_ds, dim_ds, columns, dim_columns, _key)
        if sieved is not None:
            return sieved

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def _with_part(t: pa.Table) -> pa.Table:
        part = (hash64(t["fk_key"]) & np.uint64(n_parts - 1)).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def fact_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"fk_key": _key(batch, list(columns))})
        t = t.group_by(["fk_key"]).aggregate([([], "count_all")])
        t = t.append_column("side", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return _with_part(t)

    def dim_partial(batch: pa.Table) -> pa.Table:
        key = pc.unique(_key(batch, dim_columns))
        t = pa.table(
            {
                "fk_key": key,
                "count_all": pa.array(np.zeros(len(key), dtype=np.int64)),
                "side": pa.array(np.ones(len(key), dtype=np.int8)),
            }
        )
        return _with_part(t)

    fact_keys = fact_ds.map_batches(fact_partial, batch_format="pyarrow")
    dim_keys = dim_ds.map_batches(dim_partial, batch_format="pyarrow")
    tagged = fact_keys.union(dim_keys)

    empty = pa.table(
        {"fk_key": pa.array([], pa.string()), "n_rows": pa.array([], pa.int64())}
    )

    def resolve_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return empty
        side = part["side"]
        dim = pc.unique(pc.filter(part["fk_key"], pc.equal(side, 1)))
        fact = part.filter(pc.equal(side, 0)).select(["fk_key", "count_all"])
        if len(dim):
            fact = fact.filter(pc.invert(pc.is_in(fact["fk_key"], value_set=dim)))
        if fact.num_rows == 0:
            return empty
        g = fact.group_by(["fk_key"]).aggregate([("count_all", "sum")])
        return pa.table(
            {
                "fk_key": pc.cast(g["fk_key"], pa.string()),
                "n_rows": g["count_all_sum"],
            }
        )

    return tagged.groupby("part").map_groups(resolve_part, batch_format="pyarrow")
