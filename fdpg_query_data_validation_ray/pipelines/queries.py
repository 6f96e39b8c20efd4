"""Named query pipelines over the driver test tables (sf_dir parquet).

Each function takes `sf_dir` and returns a Ray Dataset / pyarrow Table whose
schema EXACTLY matches the DuckDB oracle in __ray_entry__.oracle_sql — column
names included, numeric aggregates integer-exact (cents/e4/e6 fixed-point) so
value hashes can't drift on float summation order.

These are the SURVEY.md §2 operators exercised against real tables:
row checks (M1/F3), issue dedup (A1), uniqueness (§2.7), FK anti-join (J5),
distribution (A3), column stats (A7), sort/top-k (O1/O2), joins (J1),
windowed aggregation (events), dedup family, ANN, text analysis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import fdpg_query_data_validation_ray as qdv
from fdpg_query_data_validation_ray.stages.row_checks import RowChecker

ALLOWED_LANGS = ["en", "es", "de", "fr"]  # zh → in_set violations on purpose
N_CHARS_RANGE = (50, 400)


def _rd():
    import ray.data as rd

    return rd


def _read(sf_dir: str, table: str, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def documents_suite() -> qdv.Suite:
    return qdv.Suite(
        "documents",
        [
            qdv.not_null("text"),
            qdv.in_set("lang", ALLOWED_LANGS),
            qdv.value_range("n_chars", *N_CHARS_RANGE),
            qdv.regex("source", "src[0-9]+"),
        ],
        key_columns=["doc_id"],
    )


def q_row_checks_documents(sf_dir: str):
    # task-based instance: this 4-rule suite compiles in microseconds, so
    # plain tasks beat an actor pool's startup latency (the flagship
    # corpus_validate keeps the actor pool — its CheckAndProfile state is
    # bigger and its runs long enough to amortize)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars", "source"])
    return ds.map_batches(
        RowChecker(suite=documents_suite()), batch_format="pyarrow"
    )


def q_issue_dedup_counts(sf_dir: str):
    """A1 IssueSet semantics: dedup-count issues by identity key, with a
    per-batch combiner so the exchange moves (key, partial count) rows
    rather than every violation."""
    from ray.data.aggregate import Sum

    keys = ["rule_id", "severity", "location", "diagnostics"]
    return (
        q_row_checks_documents(sf_dir)
        .map_batches(
            lambda t: t.group_by(keys).aggregate([([], "count_all")]),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby(keys)
        .aggregate(Sum("count_all", alias_name="n_issues"))
    )


def q_unique_docs_lang_nchars(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.unique import duplicate_keys

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return duplicate_keys(ds, ["lang", "n_chars"])


def q_fk_orders_customer(sf_dir: str):
    """Broadcast anti-join; the dim is restricted to even custkeys so the
    dangling set is non-trivial on clean TPC-H-ish data."""
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.fk import fk_violations_broadcast

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    even = pc.filter(
        cust["c_custkey"], pc.equal(pc.bit_wise_and(cust["c_custkey"], 1), 0)
    )
    dim_keys = [str(k) for k in even.to_pylist()]
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    return fk_violations_broadcast(
        ds, ["o_custkey"], dim_keys, key_columns=["o_orderkey"], dim_name="customer"
    )


def q_fk_lineitem_orders_hash(sf_dir: str):
    """Hash-partitioned anti-join path (both sides as Datasets); dim keeps
    only o_orderkey % 3 != 0 so ~1/3 of lineitems dangle."""
    from fdpg_query_data_validation_ray.stages.fk import dangling_keys_hash

    def mod3_nonzero(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"]
        mod3 = pc.subtract(k, pc.multiply(pc.divide(k, 3), 3))  # int divide truncates
        return t.filter(pc.not_equal(mod3, 0))

    fact = _read(sf_dir, "lineitem", ["l_orderkey"])
    dim = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        mod3_nonzero, batch_format="pyarrow"
    )
    return dangling_keys_hash(fact, ["l_orderkey"], dim, ["o_orderkey"], num_buckets=16)


def q_col_stats_lineitem(sf_dir: str):
    """Distributed column profile (partial→merge, no shuffle), projected to
    its exactly-comparable fields."""
    from fdpg_query_data_validation_ray.stages.stats import column_stats

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", cols)
    stats = column_stats(ds, columns=cols)
    return pa.table(
        {
            "col_name": cols,
            "n_rows": [stats[c]["count"] for c in cols],
            "n_nulls": [stats[c]["nulls"] for c in cols],
            "min_value": [float(stats[c]["min"]) for c in cols],
            "max_value": [float(stats[c]["max"]) for c in cols],
        }
    )


def q_distinct_exact(sf_dir: str):
    """Exact distinct counts for several columns in ONE read pass: per batch,
    each column's local distinct values become (col_name, value) rows; a
    single groupby over the pair dedups globally; a tiny count per col_name
    finishes. Data rows never reach the driver."""
    from ray.data.aggregate import Count

    cols = ["lang", "source"]
    ds = _read(sf_dir, "documents", cols)

    def local_distinct(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            # drop_null: COUNT(DISTINCT) excludes NULLs, and a null groupby
            # key would crash the sort-based shuffle anyway
            vals = pc.drop_null(pc.unique(pc.cast(t.column(c), pa.string())))
            parts.append(
                pa.table(
                    {
                        # explicit type: an all-null batch leaves vals empty
                        # and an untyped empty array would infer type null,
                        # breaking concat_tables schema unification
                        "col_name": pa.array([c] * len(vals), pa.string()),
                        "value": pc.cast(vals, pa.string()),
                    }
                )
            )
        return pa.concat_tables(parts)

    pairs = ds.map_batches(
        local_distinct, batch_format="pyarrow", batch_size=4096
    ).groupby(["col_name", "value"]).aggregate(Count(alias_name="_n"))
    counts = pairs.groupby("col_name").aggregate(Count(alias_name="n_distinct"))
    # build from the declared column list: an empty/partial aggregate result
    # (zero-row input loses its schema through to_pandas) still yields one
    # n_distinct=0 row per column, matching COUNT(DISTINCT) on empty input
    found: dict = {}
    for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if "col_name" in t.column_names:
            found.update(zip(t["col_name"].to_pylist(), t["n_distinct"].to_pylist()))
    return pa.table(
        {
            "col_name": cols,
            "n_distinct": pa.array([int(found.get(c, 0)) for c in cols], pa.int64()),
        }
    )


def q_lang_distribution(sf_dir: str):
    """Distribution via combiner pre-aggregation: per-batch pyarrow
    group_by collapses rows to (lang, partial count) before the exchange —
    at corpus scale the shuffle moves one row per (batch, lang), not one
    per document. count_all keeps the null-lang group (a plain "count"
    would drop it)."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(["lang"]).aggregate([([], "count_all")])

    return (
        _read(sf_dir, "documents", ["lang"])
        .map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("lang")
        .aggregate(Sum("count_all", alias_name="n_docs"))
    )


def q_content_length_hist(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["n_chars"])

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()), 50.0)), pa.int64()
        )
        return pa.table({"bucket": b})

    def partial(t: pa.Table) -> pa.Table:
        return bucketize(t).group_by(["bucket"]).aggregate([([], "count_all")])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("bucket")
        .aggregate(Sum("count_all", alias_name="n_docs"))
    )


def q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks(),
                "hour": pc.floor_temporal(t["ts"], unit="hour"),
                "value_cents": pc.cast(
                    pc.round(
                        pc.multiply(t["value"], 100.0),
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                ),
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        # combiner: (event_type, hour) partial count+sum per batch; the
        # exchange then moves one row per (batch, key) instead of per event
        return prep(t).group_by(["event_type", "hour"]).aggregate(
            [([], "count_all"), ("value_cents", "sum")]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["event_type", "hour"])
        .aggregate(
            Sum("count_all", alias_name="n_events"),
            Sum("value_cents_sum", alias_name="sum_value_cents"),
        )
    )


def _cents(col, scale=100.0):
    return pc.cast(
        pc.round(pc.multiply(col, scale), round_mode="half_towards_infinity"),
        pa.int64(),
    )


def q_events_hourly_moving(sf_dir: str):
    """Windowed aggregate (custom operator per SURVEY §2: Ray Data has no
    window function): tumbling hourly sums → per-key sorted 3-bucket moving
    sum via groupby(event_type).map_groups — the window state never leaves its
    partition, only the SMALL hourly aggregate shuffles, integer-exact."""
    import pandas as pd

    hourly = q_events_hourly(sf_dir)

    def moving(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("hour", kind="mergesort")
        # integer-exact windowed sum via int64 cumsum (pandas rolling().sum()
        # goes through float64 and loses exactness above 2^53)
        v = g["sum_value_cents"].to_numpy(dtype=np.int64)
        c = np.cumsum(v)
        out = c.copy()
        out[3:] -= c[:-3]
        g = g.assign(moving_sum_cents=out)
        return g[["event_type", "hour", "moving_sum_cents"]]

    return hourly.groupby("event_type").map_groups(moving, batch_format="pandas")


def q_events_props_k(sf_dir: str):
    """JSON field extraction (§2.8): parse props.k per event, aggregate per
    event_type — vectorized regex fast path + json.loads fallback."""
    from ray.data.aggregate import Count, Sum

    from fdpg_query_data_validation_ray.functions.jsonfield import extract_int_field

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks(),
                "k": extract_int_field(t["props"], "k"),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        "event_type"
    ).aggregate(Count(alias_name="n_events"), Sum("k", alias_name="sum_k"))


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped grouped aggregate, integer-exact (fixed-point sums)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.less_equal(t["l_shipdate"], pa.scalar(np.datetime64("1998-09-02", "us")))
        t = t.filter(keep)
        qty_c = _cents(t["l_quantity"])
        ext_c = _cents(t["l_extendedprice"])
        disc_c = _cents(t["l_discount"])
        tax_c = _cents(t["l_tax"])
        disc_price_e4 = pc.multiply(ext_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        charge_e6 = pc.multiply(disc_price_e4, pc.add(pa.scalar(100, pa.int64()), tax_c))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks(),
                "l_linestatus": t["l_linestatus"].combine_chunks(),
                "qty_cents": qty_c,
                "base_price_cents": ext_c,
                "disc_price_e4": disc_price_e4,
                "charge_e6": charge_e6,
            }
        )

    def partial(t: pa.Table) -> pa.Table:
        # combiner: partial sums per (flag, status) per batch — the exchange
        # moves a handful of rows per batch instead of every lineitem
        return prep(t).group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty_cents", "sum"),
                ("base_price_cents", "sum"),
                ("disc_price_e4", "sum"),
                ("charge_e6", "sum"),
                ([], "count_all"),
            ]
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_cents_sum", alias_name="sum_qty_cents"),
            Sum("base_price_cents_sum", alias_name="sum_base_price_cents"),
            Sum("disc_price_e4_sum", alias_name="sum_disc_price_e4"),
            Sum("charge_e6_sum", alias_name="sum_charge_e6"),
            Sum("count_all", alias_name="count_order"),
        )
    )


def _stream_key_array(ds, column: str, cap: int):
    """Collect a dataset's int key column at the driver as a sorted unique
    int64 array, bailing out (None) beyond `cap` — the budget guard every
    broadcast side uses (stages/fk.py pattern)."""
    chunks, total = [], 0
    for b in ds.select_columns([column]).iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        arr = pc.unique(t[column].combine_chunks()).to_numpy(zero_copy_only=False)
        chunks.append(arr.astype(np.int64))
        total += len(arr)
        if total > cap:
            return None
    if not chunks:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(chunks))


def q_top_building_orders(sf_dir: str):
    """Join pipeline (TPC-H Q3 shape) as a broadcast semi-join CHAIN: the
    BUILDING customer keys (dimension-sized) and then the matching orderkeys
    are each streamed to the driver under a budget and broadcast
    (`ray.put` once, binary-search filter per task) — no shuffle join
    anywhere; lineitem's per-batch revenue partials for ONLY the surviving
    orderkeys merge incrementally at the driver (bounded by ~4× the orderkey
    count). Beyond the budget either key set falls back to the fully
    distributed native-hash-join plan (`_top_building_orders_join`)."""
    import ray

    from fdpg_query_data_validation_ray.stages.unique import SIEVE_MAX_DRIVER_ROWS

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    bkeys = _stream_key_array(cust, "c_custkey", SIEVE_MAX_DRIVER_ROWS)
    if bkeys is None:
        return _top_building_orders_join(sf_dir)
    bref = ray.put(bkeys)

    def building_only(t: pa.Table) -> pa.Table:
        keys = ray.get(bref)
        if len(keys) == 0:
            return t.slice(0, 0).select(["o_orderkey"])
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.searchsorted(keys, ck)
        ix[ix == len(keys)] = 0
        return t.filter(pa.array(keys[ix] == ck)).select(["o_orderkey"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        building_only, batch_format="pyarrow"
    )
    okeys = _stream_key_array(orders, "o_orderkey", SIEVE_MAX_DRIVER_ROWS)
    if okeys is None:
        return _top_building_orders_join(sf_dir)
    oref = ray.put(okeys)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_partial(t: pa.Table) -> pa.Table:
        keys = ray.get(oref)
        if len(keys) == 0:
            t = t.slice(0, 0)
        else:
            lk = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            ix = np.searchsorted(keys, lk)
            ix[ix == len(keys)] = 0
            t = t.filter(pa.array(keys[ix] == lk))
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        return pa.table(
            {"o_orderkey": t["l_orderkey"].combine_chunks(), "revenue_e4": rev}
        ).group_by(["o_orderkey"]).aggregate([("revenue_e4", "sum")])

    from fdpg_query_data_validation_ray.stages.unique import _merge_partials_driver

    partials = li.map_batches(revenue_partial, batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(["o_orderkey", "count_all"]),
        batch_format="pyarrow",
    )
    merged = _merge_partials_driver(
        partials, ["o_orderkey"], cap=max(4 * len(okeys), 65_536)
    )
    if merged is None or merged.num_rows == 0:
        return pa.table(
            {"o_orderkey": pa.array([], pa.int64()),
             "revenue_e4": pa.array([], pa.int64())}
        )
    merged = merged.rename_columns(["o_orderkey", "revenue_e4"])
    out = merged.sort_by([("revenue_e4", "descending"), ("o_orderkey", "ascending")])
    return out.slice(0, 10)


def _top_building_orders_join(sf_dir: str):
    """Fully distributed fallback (native hash joins) for when either
    broadcast side exceeds the driver budget."""
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.topk import top_k

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    building_orders = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    ).select_columns(["o_orderkey"])

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue_partial(t: pa.Table) -> pa.Table:
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        return pa.table(
            {"l_orderkey": t["l_orderkey"].combine_chunks(), "rev": rev}
        ).group_by(["l_orderkey"]).aggregate([("rev", "sum")])

    li_partial = li.map_batches(revenue_partial, batch_format="pyarrow")
    joined = li_partial.join(
        building_orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    agg = joined.map_batches(
        lambda t: pa.table(
            {"o_orderkey": t["l_orderkey"].combine_chunks(), "revenue_e4": t["rev_sum"]}
        ),
        batch_format="pyarrow",
    ).groupby("o_orderkey").aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    return top_k(agg, 10, ["revenue_e4", "o_orderkey"], descending=[True, False])


def q_top_users_by_events(sf_dir: str):
    from ray.data.aggregate import Sum

    agg = (
        _read(sf_dir, "events", ["user_id"])
        .map_batches(
            lambda t: t.group_by(["user_id"]).aggregate([([], "count_all")]),
            batch_format="pyarrow",
            batch_size=16384,
        )
        .groupby("user_id")
        .aggregate(Sum("count_all", alias_name="n_events"))
    )
    return agg.sort(["n_events", "user_id"], descending=[True, False]).limit(20)


def q_events_recent_topk(sf_dir: str):
    """order-by-limit via distributed top-k: per-batch local prune so the
    exchange moves O(k·blocks) rows, not the whole table (stages/topk.py)."""
    from fdpg_query_data_validation_ray.stages.topk import top_k

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])
    return top_k(ds, 50, ["ts", "event_id"], descending=[True, False])


def q_segment_order_totals(sf_dir: str):
    """Native Ray Data hash join (orders ⋈ customer on custkey) → grouped
    aggregate per market segment, integer-exact."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_custkey": t["o_custkey"].combine_chunks(),
                "totalprice_cents": _cents(t["o_totalprice"]),
            }
        ),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    # partition count trades shuffle-aggregator fixed cost against reducer
    # parallelism: Ray 2.49 runs one 1-CPU aggregator actor per partition,
    # so at bench scale fewer is faster (16->8 saved ~0.5 s); on a real
    # cluster size this ~2x total cores (see cluster._join_partitions)
    joined = orders.join(
        cust,
        join_type="inner",
        num_partitions=8,
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    return (
        joined.map_batches(
            lambda t: t.group_by(["c_mktsegment"]).aggregate(
                [([], "count_all"), ("totalprice_cents", "sum")]
            ),
            batch_format="pyarrow",
            batch_size=16384,
        )
        .groupby("c_mktsegment")
        .aggregate(
            Sum("count_all", alias_name="n_orders"),
            Sum("totalprice_cents_sum", alias_name="sum_totalprice_cents"),
        )
    )


def q_first_docs_per_lang(sf_dir: str):
    """Per-key sample cap (reference TOTAL=500 per class, main.py:222-223):
    first 5 doc_ids per lang, deterministic under any partitioning."""
    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    ds = _read(sf_dir, "documents", ["lang", "doc_id"])
    out = first_n_per_key(ds, 5, "lang", ["doc_id"], rank_column="rank")
    return out.map_batches(
        lambda t: t.select(["lang", "doc_id", "rank"]).cast(
            pa.schema([("lang", pa.string()), ("doc_id", pa.int64()), ("rank", pa.int64())])
        ),
        batch_format="pyarrow",
    )


def q_top_docs_per_lang(sf_dir: str):
    """Per-key TOP-K: the 3 longest docs per language (n_chars DESC,
    doc_id tiebreak) — ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
    n_chars DESC, doc_id) <= 3 as the descending leg of first_n_per_key
    (stages/sampling.py): per-batch local cap is the combiner, the
    exchange moves O(k · keys · blocks) rows, never the table."""
    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    ds = _read(sf_dir, "documents", ["lang", "doc_id", "n_chars"])
    out = first_n_per_key(
        ds, 3, "lang", ["n_chars", "doc_id"], rank_column="rnk",
        ascending=[False, True],
    )
    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["lang", "doc_id", "n_chars", "rnk"]).cast(schema),
        batch_format="pyarrow",
    )


def q_dedup_exact_docs(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.dedup import exact_duplicate_groups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_duplicate_groups(ds, "text", "doc_id")
    # materialize with an explicit schema: an empty Dataset loses its schema
    # through to_pandas, and this result is legitimately empty on clean data.
    # The collect is bounded by the dup-GROUP count, not input rows, but a
    # pathological all-duplicates corpus could still blow the driver — cap it
    # like _stream_key_array instead of a bare take_all.
    schema = pa.schema(
        [("text_md5", pa.string()), ("keep_id", pa.int64()), ("n_copies", pa.int64())]
    )
    cap = 5_000_000
    parts, total = [], 0
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_rows:
            parts.append(t.cast(schema))
            total += t.num_rows
            if total > cap:
                raise ValueError(
                    f"dedup_exact_docs result exceeds the driver cap ({cap} "
                    "groups); consume the Dataset from exact_duplicate_groups "
                    "directly (write_parquet) instead of collecting"
                )
    return pa.concat_tables(parts) if parts else schema.empty_table()


def q_dedup_exact_props(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.dedup import exact_duplicate_groups

    ds = _read(sf_dir, "events", ["event_id", "props"])
    return exact_duplicate_groups(ds, "props", "event_id")


def q_dedup_keep_first(sf_dir: str):
    """Exact dedup that KEEPS one representative row (min doc_id) per distinct
    text — the materializing counterpart of dedup_exact_docs."""
    from fdpg_query_data_validation_ray.stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    out = exact_dedup(ds, "text", "doc_id")
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def q_dedup_minhash(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.dedup import minhash_near_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_near_duplicates(ds, "text", "doc_id", threshold=0.5)


def q_dedup_simhash(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.dedup import simhash_near_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_duplicates(ds, "text", "doc_id", max_hamming=8)


def q_dedup_ngram_jaccard(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs via the bucket-scoped scale path
    (LSH candidates → exact verify inside buckets, stages/dedup.py
    jaccard_verify_buckets) — the whole-language O(n²) groupby is gone from
    every shipped query; ngram_jaccard_pairs remains as the small-scale
    reference verifier used by the parity tests."""
    from fdpg_query_data_validation_ray.stages.dedup import jaccard_verify_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return jaccard_verify_buckets(
        ds, "text", "doc_id", threshold=0.5, group_column="lang"
    )


def q_dedup_clusters(sf_dir: str):
    """Near-dup cluster labels: exact n-gram-Jaccard pairs (bucket-scoped
    verify, same-lang constraint) → connected components → (doc_id,
    cluster_id = min member id). The oracle is a DuckDB recursive-CTE
    transitive closure over the SAME exact-jaccard pair set, so the
    component labels are hash-checked."""
    from fdpg_query_data_validation_ray.stages.cluster import connected_components
    from fdpg_query_data_validation_ray.stages.dedup import jaccard_verify_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pairs = jaccard_verify_buckets(
        ds, "text", "doc_id", threshold=0.5, group_column="lang"
    )
    labels = connected_components(pairs)
    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "cluster_id"]),
        batch_format="pyarrow",
    )


def q_dedup_jaccard_keep(sf_dir: str):
    """Materializing fuzzy dedup with an exact verifier: drop every doc that
    is a non-minimum member of an exact-jaccard near-dup component (pairs
    from the bucket-scoped verify). The fuzzy keep-one analog of
    dedup_keep_first, oracle-checked end to end."""
    from fdpg_query_data_validation_ray.stages.cluster import (
        dedup_keep_representative,
    )
    from fdpg_query_data_validation_ray.stages.dedup import jaccard_verify_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).materialize()
    pairs = jaccard_verify_buckets(
        ds, "text", "doc_id", threshold=0.5, group_column="lang"
    )
    kept = dedup_keep_representative(ds, pairs, "doc_id")
    return kept.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def q_dedup_minhash_keep(sf_dir: str):
    """Scale-path materializing fuzzy dedup: MinHash+LSH pairs → connected
    components → keep min-id representative. No SQL oracle (minhash
    estimates aren't SQL-expressible); cross-checked in tests against
    exact_dedup on identical-clique fixtures and guarded by a giant-clique
    skew test (tests/test_cluster.py)."""
    from fdpg_query_data_validation_ray.stages.cluster import minhash_dedup_keep

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    kept = minhash_dedup_keep(ds, "text", "doc_id", threshold=0.7)
    return kept.map_batches(
        lambda t: t.select(["doc_id", "lang"]), batch_format="pyarrow"
    )


def q_supplier_balance_by_region(sf_dir: str):
    """Three-way broadcast join (supplier ⋈ nation ⋈ region): the two tiny
    dims collapse to ONE driver-side lookup (suppkey-side never shuffles) —
    the broadcast-small-side plan for star-schema rollups (J1)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rmap = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    n2r = {
        nk: rmap[rk]
        for nk, rk in zip(
            nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()
        )
    }
    keys = pa.array(sorted(n2r), pa.int64())
    vals = pa.array([n2r[k] for k in sorted(n2r)], pa.string())

    def attach_region(t: pa.Table) -> pa.Table:
        ix = pc.index_in(t["s_nationkey"], value_set=keys)
        return pa.table(
            {
                "r_name": pc.take(vals, ix),
                "acctbal_cents": _cents(t["s_acctbal"]),
            }
        )

    ds = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    return ds.map_batches(attach_region, batch_format="pyarrow").groupby(
        "r_name"
    ).aggregate(
        Count(alias_name="n_suppliers"),
        Sum("acctbal_cents", alias_name="sum_acctbal_cents"),
    )


def q_parts_by_brand_size(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    ds = _read(sf_dir, "part", ["p_brand", "p_size", "p_retailprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_brand": t["p_brand"].combine_chunks(),
                "p_size": t["p_size"].combine_chunks(),
                "price_cents": _cents(t["p_retailprice"]),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow").groupby(
        ["p_brand", "p_size"]
    ).aggregate(
        Count(alias_name="n_parts"),
        Min("price_cents", alias_name="min_price_cents"),
        Max("price_cents", alias_name="max_price_cents"),
    )


KNN_QUERY_IDS = [0, 1, 2, 3, 4]


def q_knn_cosine(sf_dir: str):
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.similarity import knn_cosine

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = pc.is_in(emb["vec_id"], value_set=pa.array(KNN_QUERY_IDS, pa.int64()))
    qt = emb.filter(mask)
    order = pc.sort_indices(qt["vec_id"])
    qt = qt.take(order)
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_cosine(ds, (qt["vec_id"].to_pylist(), qm), k=5)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]).cast(
            pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())])
        ),
        batch_format="pyarrow",
    )


def q_knn_cosine_ivf(sf_dir: str):
    """IVF-bucketed ANN (scale path; recall < 1 vs the brute-force baseline)."""
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.similarity import knn_cosine_ivf

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = pc.is_in(emb["vec_id"], value_set=pa.array(KNN_QUERY_IDS, pa.int64()))
    qt = emb.filter(mask)
    qt = qt.take(pc.sort_indices(qt["vec_id"]))
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_cosine_ivf(ds, (qt["vec_id"].to_pylist(), qm), k=5, dim=qm.shape[1])
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]).cast(
            pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())])
        ),
        batch_format="pyarrow",
    )


def q_knn_cosine_pq(sf_dir: str):
    """PQ-accelerated ANN (stages/similarity.py knn_cosine_pq): one
    streaming assign pass appends uint8 codes, ADC lookup tables prune each
    batch to a 128-candidate shortlist per query, exact cosine re-ranks
    ONLY the shortlist — the FAISS ADC search pattern. Rows-only check
    (sample-trained k-means codebooks aren't SQL-expressible); the recall
    bar vs exact knn is pinned in tests."""
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.stages.similarity import knn_cosine_pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = pc.is_in(emb["vec_id"], value_set=pa.array(KNN_QUERY_IDS, pa.int64()))
    qt = emb.filter(mask)
    qt = qt.take(pc.sort_indices(qt["vec_id"]))
    qm = np.array(qt["embedding"].to_pylist(), dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_cosine_pq(ds, (qt["vec_id"].to_pylist(), qm), k=5)
    return out.map_batches(
        lambda t: t.select(["query_id", "vec_id", "rank"]).cast(
            pa.schema([("query_id", pa.int64()), ("vec_id", pa.int64()), ("rank", pa.int64())])
        ),
        batch_format="pyarrow",
    )


def q_drift_docs(sf_dir: str):
    """Distribution drift: PSI on the lang histogram + KS (via KLL sketches)
    on n_chars, comparing odd vs even doc_ids (reference snapshot = even).
    Sketch merge is shuffle-free (mergeable partials); comparison is driver-side
    over tiny snapshots."""
    from fdpg_query_data_validation_ray.stages.drift import Snapshot, ks_from_kll, psi
    from fdpg_query_data_validation_ray.stages.stats import collect_partials

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def half(parity: int):
        return ds.map_batches(
            lambda t, p=parity: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)
            ).drop_columns(["doc_id"]),
            batch_format="pyarrow",
        )

    snaps = []
    for parity in (0, 1):
        partials = collect_partials(
            half(parity), columns=["lang", "n_chars"], categorical=["lang"]
        )
        snaps.append(Snapshot.from_partials(list(partials.values())))
    ref, cur = snaps
    psi_lang = psi(ref.columns["lang"]["counts"], cur.columns["lang"]["counts"])
    ks_nchars = ks_from_kll(ref.columns["n_chars"]["kll"], cur.columns["n_chars"]["kll"])
    return pa.table(
        {
            "col_name": ["lang", "n_chars"],
            "metric": ["psi", "ks"],
            "value": pa.array([round(psi_lang, 6), round(ks_nchars, 6)], pa.float64()),
            "drifted": pa.array([psi_lang > 0.2, ks_nchars > 0.2], pa.bool_()),
        }
    )


def q_cosine_near_dup(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.similarity import cosine_near_duplicates

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return cosine_near_duplicates(ds, threshold=0.9, n_planes=8, dim=64)


def q_cosine_dedup_keep(sf_dir: str):
    """Materializing embedding dedup: cosine-LSH near-dup pairs → connected
    components → keep min-id representative per cluster (the embedding
    analog of dedup_minhash_keep; same cluster machinery). Rows-only (LSH
    isn't SQL-expressible); the resolution step itself is oracle-checked via
    dedup_clusters / dedup_jaccard_keep, and the recall test bounds the pair
    stage."""
    from fdpg_query_data_validation_ray.stages.cluster import (
        dedup_keep_representative,
    )
    from fdpg_query_data_validation_ray.stages.similarity import (
        cosine_near_duplicates,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
    pairs = cosine_near_duplicates(ds, threshold=0.9, n_planes=8, dim=64)
    kept = dedup_keep_representative(ds, pairs, "vec_id")
    return kept.map_batches(
        lambda t: t.select(["vec_id"]).cast(pa.schema([("vec_id", pa.int64())])),
        batch_format="pyarrow",
    )


def q_normalize_docs(sf_dir: str):
    """Canonical text normalization (NFC + lower + whitespace collapse +
    strip) — hash-checked against DuckDB's nfc_normalize/lower/
    regexp_replace/trim composition (stages/text.py:NormalizeTextStage)."""
    from fdpg_query_data_validation_ray.stages.text import NormalizeTextStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        NormalizeTextStage(text_column="text"), batch_format="pyarrow"
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "text_norm"]).cast(
            pa.schema([("doc_id", pa.int64()), ("text_norm", pa.string())])
        ),
        batch_format="pyarrow",
    )


def q_top_words(sf_dir: str):
    """Corpus vocabulary: explode text → words (vectorized pandas split +
    explode), pre-aggregate INSIDE each batch (a raw word explosion would
    shuffle ~every token; the per-batch group_by collapses it to distinct
    words per batch), global sum, then distributed top-k."""
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.topk import top_k

    ds = _read(sf_dir, "documents", ["text"])

    def explode_count(df):
        import pandas as pd

        # split on the exact ASCII class RE2's \s matches, so tokenization
        # agrees with the DuckDB regexp oracle even on Unicode whitespace
        words = (
            df["text"].dropna().str.lower().str.split(r"[ \t\n\f\r]+", regex=True).explode()
        )
        words = words[words != ""]
        vc = words.value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy()})

    counts = ds.map_batches(
        explode_count, batch_format="pandas", batch_size=4096
    ).groupby("word").aggregate(Sum("n", alias_name="n_occurrences"))
    return top_k(counts, 50, ["n_occurrences", "word"], descending=[True, False])


def q_bpe_pair_counts(sf_dir: str):
    """Top-50 BPE merge candidates: adjacent character-pair frequencies
    over the token vocabulary, weighted by corpus token frequency
    (stages/text.py bpe_pair_counts — unique-tokens-first per batch,
    in-batch pair pre-aggregation, one small groupby, distributed top-k)."""
    from fdpg_query_data_validation_ray.stages.text import bpe_pair_counts

    return bpe_pair_counts(_read(sf_dir, "documents", ["text"]), top_n=50)


def q_bpe_encode_docs(sf_dir: str):
    """BPE tokenization corpus-wide (stages/bpe.py): merges trained on a
    deterministic bounded sample at the driver (tokenizer training is
    sample-based by design — the PQ/k-means precedent), then an actor-pool
    encode stage with per-unique-word memoization emits list<int64> token
    ids per doc. Rows-only (the greedy merge loop has no SQL form);
    round-trip/greediness/invariance property tests + a pure-Python
    reference cross-check live in tests/test_bpe.py. Emitted here:
    (doc_id, n_bpe_ids, ids_checksum) — the checksum is an order-weighted
    mod-2^61 fold so any id or position change is visible."""
    from collections import Counter

    from fdpg_query_data_validation_ray.stages.bpe import (
        BPEEncodeStage, train_bpe,
    )

    sample = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .limit(512)
        .to_pandas()
    )
    ctr = Counter()
    for t in sample["text"].fillna(""):
        ctr.update(t.split())
    words, counts = zip(*sorted(ctr.items())) if ctr else ((), ())
    merges = train_bpe(list(words), list(counts), n_merges=64)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # actor pool (class + constructor args), NOT an instance: the per-word
    # memo cache and the rank table must live across the actor's lifetime —
    # a passed instance would run as tasks that reserialize state and lose
    # the memo every batch
    enc = ds.map_batches(
        BPEEncodeStage,
        fn_constructor_args=("text", merges),
        # autoscaling pool (min 1): a fixed pool of 4 would reserve every
        # CPU of a 4-CPU test cluster and starve the upstream read tasks
        batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
    )

    MOD = (1 << 61) - 1

    def checksum(t: pa.Table) -> pa.Table:
        ids = t["token_ids"].combine_chunks()
        flat = ids.flatten().to_numpy(zero_copy_only=False).astype(object)
        offs = ids.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        pos = np.arange(len(flat), dtype=object) - np.repeat(
            offs[:-1].astype(object), lens
        )
        contrib = (pos + 1) * flat % MOD
        acc = np.zeros(t.num_rows, dtype=object)
        np.add.at(acc, np.repeat(np.arange(t.num_rows), lens), contrib)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_ids": t["n_bpe_ids"],
                "ids_checksum": pa.array(
                    [int(a) % MOD for a in acc], pa.int64()
                ),
            }
        )

    return enc.map_batches(checksum, batch_format="pyarrow")


def q_token_count_docs(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.text import TokenCountStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        TokenCountStage(), batch_format="pyarrow", batch_size=1024
    ).map_batches(lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow")


def q_lang_id_docs(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.text import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    return ds.map_batches(
        LangIdStage(), batch_format="pyarrow", batch_size=1024
    ).map_batches(lambda t: t.select(["doc_id", "lang", "lang_pred"]), batch_format="pyarrow")


def q_quality_docs(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.text import QualityScoreStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    # integer-exact feature counts + fixed-point score: SQL-expressible, so
    # this query is oracle-checked (the float ratios stay available on the
    # stage for pipeline use)
    return ds.map_batches(
        QualityScoreStage(), batch_format="pyarrow", batch_size=1024
    ).map_batches(
        lambda t: t.select(
            ["doc_id", "n_chars_q", "n_words", "n_stop_words", "n_punct_chars",
             "n_distinct_words", "quality_score_e4"]
        ),
        batch_format="pyarrow",
    )


def q_fingerprint_docs(sf_dir: str):
    from fdpg_query_data_validation_ray.stages.text import FingerprintStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        FingerprintStage(), batch_format="pandas", batch_size=1024
    ).map_batches(
        lambda t: t.select(["doc_id", "fingerprint_min", "n_fingerprints"]),
        batch_format="pyarrow",
    )


def q_multimodal_decode(sf_dir: str):
    """Multimodal pipeline over a derived binary column: deterministic
    grayscale BMP payloads (a real, spec-conformant image format, seeded by
    doc_id) → actor-pool resize (decode → subsample → re-encode) → decode,
    small batches for fat binary rows (stages/multimodal.py)."""
    import numpy as np

    from fdpg_query_data_validation_ray.stages.multimodal import (
        DecodeStage,
        ResizeStage,
        encode_bmp_gray,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def attach_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        nchars = t["n_chars"].to_pylist()
        payloads = []
        for i, n in zip(ids, nchars):
            w = 8 + (n or 0) % 24
            h = 8 + int(i) % 16
            rng = np.random.default_rng(int(i))
            payloads.append(
                encode_bmp_gray(rng.integers(0, 256, (h, w), dtype=np.uint8))
            )
        return pa.table(
            {"doc_id": t["doc_id"].combine_chunks(), "payload": pa.array(payloads, pa.binary())}
        )

    decoded = (
        ds.map_batches(attach_payload, batch_format="pyarrow", batch_size=256)
        # task-based instances: the codec stages hold no per-process state
        # (mode flags only), so an actor pool only added startup latency
        .map_batches(
            ResizeStage(factor=2, mode="real"),
            batch_format="pyarrow",
            batch_size=256,
        )
        .map_batches(
            DecodeStage(mode="real"),
            batch_format="pyarrow",
            batch_size=256,
        )
    )
    return decoded.map_batches(
        lambda t: t.select(["doc_id", "width", "height", "mean_intensity"]),
        batch_format="pyarrow",
    )


def q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing of the documents corpus into
    1024-token training sequences (tokens = 1 + n_chars//4), via the
    range-partitioned distributed prefix sum in stages/pack.py. Exact SQL
    oracle: window cumsum + generate_series over each doc's span."""
    from fdpg_query_data_validation_ray.stages.pack import pack_sequences

    # FLOOR division like the oracle's `n_chars // 4` (Arrow's integer
    # divide truncates toward zero, which disagrees with DuckDB's // for
    # negative n_chars); exact in float64 for any plausible doc length
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "tokens": pc.add(
                    pc.cast(
                        pc.floor(
                            pc.divide(pc.cast(t["n_chars"], pa.float64()), 4.0)
                        ),
                        pa.int64(),
                    ),
                    1,
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return pack_sequences(ds, "doc_id", "tokens", budget=1024, n_ranges=64)


def q_multimodal_frames(sf_dir: str):
    """Frame-sampling over multi-frame binary payloads (the video-pipeline
    shape): deterministic fake "videos" — 1 + doc_id%4 concatenated real BMP
    frames, frame f sized (8 + doc_id%8) × (8 + f%8) — demuxed by
    split_frames from the container bytes alone, every-2nd-frame sampling,
    sampled frames decoded in an actor pool. Oracle-checkable because the
    sampled (doc_id, frame_index, width, height) set is a pure formula of
    doc_id, replayed with generate_series in SQL — the plumbing (explode
    layout, batch size, actor signature) is the part under test."""
    import numpy as np

    from fdpg_query_data_validation_ray.stages.multimodal import (
        FrameSampleStage,
        encode_bmp_gray,
    )

    ds = _read(sf_dir, "documents", ["doc_id"])

    def attach_video(t: pa.Table) -> pa.Table:
        payloads = []
        for i in t["doc_id"].to_pylist():
            n_frames = 1 + int(i) % 4
            w = 8 + int(i) % 8
            rng = np.random.default_rng(int(i))
            payloads.append(
                b"".join(
                    encode_bmp_gray(
                        rng.integers(0, 256, (8 + f % 8, w), dtype=np.uint8)
                    )
                    for f in range(n_frames)
                )
            )
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks(),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return (
        ds.map_batches(attach_video, batch_format="pyarrow", batch_size=256)
        .map_batches(
            FrameSampleStage(every=2),
            batch_format="pyarrow",
            batch_size=256,
        )
    )


def q_stats_sketches(sf_dir: str):
    """HLL distinct + DDSketch quantiles per documents column (approximate —
    no SQL oracle for the HLL; the DD quantile math itself IS oracle-checked
    by quantiles_nchars)."""
    from fdpg_query_data_validation_ray.stages.stats import column_stats

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])
    stats = column_stats(ds, categorical=["lang", "source"])
    cols = sorted(stats)
    return pa.table(
        {
            "col_name": cols,
            "distinct_hll": [stats[c]["distinct_hll"] for c in cols],
            "p50": [stats[c].get("quantiles", {}).get("p50") for c in cols],
            "p99": [stats[c].get("quantiles", {}).get("p99") for c in cols],
        }
    )


def q_psi_terms_lang(sf_dir: str):
    """Per-category PSI terms of the lang histogram, even vs odd doc_ids —
    the drift PSI formula (stages/drift.py:psi) made oracle-checkable: counts
    are exact integers and each term is one fixed-order float expression
    ((a-e)*ln(a/e) with the 1e-6 clamp), replayed verbatim in the DuckDB
    oracle; terms are per-row so no sum-order float drift is possible.
    Aggregation is a tiny groupby count per half (nothing O(rows) at the
    driver)."""
    import numpy as np
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.drift import _EPS

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    # ONE pass: group by (lang, parity) — not one filtered pipeline per half.
    # Null lang / null doc_id rows are dropped HERE: the oracle's `%2 = p`
    # and `lang IS NOT NULL` exclude them, and Ray's groupby shuffle cannot
    # sort null string keys anyway.
    # doc_id >= 0 enforced on BOTH sides: for a negative odd doc_id DuckDB's
    # % yields -1 (row in neither half) while bit_wise_and(,1) yields 1, so
    # parity-by-bit is only valid on the non-negative domain
    def keyed(t: pa.Table) -> pa.Table:
        out = pa.table(
            {"lang": t["lang"], "parity": pc.bit_wise_and(t["doc_id"], 1)}
        )
        return out.filter(
            pc.and_(
                pc.and_(pc.is_valid(out["lang"]), pc.is_valid(out["parity"])),
                pc.fill_null(pc.greater_equal(t["doc_id"], 0), False),
            )
        )

    counted = (
        ds.map_batches(
            # combiner: partial (lang, parity) counts per batch
            lambda t: keyed(t).group_by(["lang", "parity"]).aggregate(
                [([], "count_all")]
            ),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby(["lang", "parity"])
        .aggregate(Sum("count_all", alias_name="c"))
    )
    expected, actual = {}, {}
    for b in counted.iter_batches(batch_format="pyarrow", batch_size=None):
        for lang, par, c in zip(
            b["lang"].to_pylist(), b["parity"].to_pylist(), b["c"].to_pylist()
        ):
            if lang is None or par is None:
                # null lang / null doc_id excluded on both sides: the
                # oracle's `doc_id % 2 = p` and `lang IS NOT NULL` drop them
                continue
            (expected if par == 0 else actual)[lang] = c
    keys = sorted(set(expected) | set(actual))
    e_tot = max(1, sum(expected.values()))
    a_tot = max(1, sum(actual.values()))
    rows = {"lang": [], "e_count": [], "a_count": [], "psi_term_micro": []}
    for k in keys:
        e = max(expected.get(k, 0) / e_tot, _EPS)
        a = max(actual.get(k, 0) / a_tot, _EPS)
        rows["lang"].append(k)
        rows["e_count"].append(expected.get(k, 0))
        rows["a_count"].append(actual.get(k, 0))
        # fixed-point micro-units via floor(x*1e6+0.5): the SAME IEEE ops on
        # both sides — Python round() (half-to-even on exact decimals) and
        # DuckDB ROUND() (scale-then-half-away) disagree near 5e-7 grid
        # boundaries, so neither is usable for a hash-exact oracle
        term = float((a - e) * np.log(a / e))
        rows["psi_term_micro"].append(int(np.floor(term * 1e6 + 0.5)))
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            "e_count": pa.array(rows["e_count"], pa.int64()),
            "a_count": pa.array(rows["a_count"], pa.int64()),
            "psi_term_micro": pa.array(rows["psi_term_micro"], pa.int64()),
        }
    )


def q_quantiles_nchars(sf_dir: str):
    """DDSketch quantiles of documents.n_chars (positive values) — the
    "approximate" sketch that IS oracle-checkable: the bucket index is a
    pure function of the value (ceil(ln(x)/ln(gamma))), so a DuckDB query
    that replays the same bucket math over the same rows produces the SAME
    quantile values, hash-exact. Per-batch sketches merge at the driver
    (commutative counter addition — nothing O(rows) leaves the workers)."""
    from fdpg_query_data_validation_ray.functions.sketches import DDSketch

    ds = _read(sf_dir, "documents", ["n_chars"])

    def part(t: pa.Table) -> pa.Table:
        import numpy as np

        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = DDSketch()
        s.add_values(x[x > 0])
        return pa.table({"dd": pa.array([s.to_bytes()], pa.binary())})

    merged = DDSketch()
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for raw in b["dd"]:
            merged.merge(DDSketch.from_bytes(raw.as_py()))
    qs = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)
    if merged.n == 0:
        # no positive values: the oracle's WHERE x>0 leaves nothing to join
        # against and returns 0 rows — match it (quantile() would be NaN)
        return pa.table(
            {"q": pa.array([], pa.float64()), "value_micro": pa.array([], pa.int64())}
        )
    # fixed-point micro-units (floor(v*1e6+0.5), identical IEEE ops in the
    # SQL oracle) — Python round() vs DuckDB ROUND() diverge at half-grid
    # boundaries, which would make the hash-exact check a latent flake
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value_micro": pa.array(
                [int(np.floor(merged.quantile(q) * 1e6 + 0.5)) for q in qs],
                pa.int64(),
            ),
        }
    )


def q_quantiles_value_by_type(sf_dir: str):
    """Grouped DDSketch quantiles (GROUP BY key + percentile at scale): per
    event_type quantiles of the positive values. The exchange moves
    (key, sketch) rows — O(keys × blocks) bounded bytes, never data rows —
    and the bucket math replays per group in the SQL oracle, hash-exact
    (stages/stats.py:quantile_by_key)."""
    from fdpg_query_data_validation_ray.stages.stats import quantile_by_key

    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = quantile_by_key(ds, "event_type", "value",
                          qs=(0.25, 0.5, 0.9, 0.99))
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("q", pa.float64()),
            ("value_micro", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["event_type", "q", "value_micro"]).cast(schema),
        batch_format="pyarrow",
    )


def q_zscore_events_by_type(sf_dir: str):
    """Per-group standardization: each event's value z-scored within its
    event_type (stages/stats.py zscore_by_key) — two-pass broadcast plan:
    a tiny (key, n, sum_e, ssq_e) moment groupby, ray.put of the O(keys)
    moment LUT, then a zero-exchange scoring pass. The float finish is one
    fixed IEEE sequence replayed verbatim in the oracle, hash-exact."""
    from fdpg_query_data_validation_ray.stages.stats import zscore_by_key

    cols = ["event_id", "event_type", "value"]
    out = zscore_by_key(
        _read(sf_dir, "events", ["event_type", "value"]),
        _read(sf_dir, "events", cols),
        "event_type", "value", "event_id", scale=100,
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("z_e6", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "event_type", "z_e6"]).cast(schema),
        batch_format="pyarrow",
    )


def q_events_type_pivot(sf_dir: str):
    """Pivot / one-hot aggregate: per user, COUNT(*) per event type as wide
    columns (stages/stats.py pivot_counts) — the event-log → per-entity
    feature-vector step. One factorize + scatter per batch is the combiner;
    the exchange moves wide partial rows, never events. Declared pivot
    domain (SQL PIVOT ... IN contract); unseen types land in n_other."""
    from fdpg_query_data_validation_ray.stages.stats import pivot_counts

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    return pivot_counts(
        ds, "user_id", "event_type",
        values=["click", "view", "purchase", "signup", "error"],
    )


def q_events_funnel(sf_dir: str):
    """Event-funnel detection: users who view → click → purchase with each
    step within 6 hours of the previous, strictly time-ordered; per
    converting user the earliest chain-start ts
    (stages/temporal.py funnel_first_conversion). Backward-induction
    kernel over coarse key-hash parts; the oracle needs nested EXISTS
    self-joins — no SQL window form exists."""
    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion,
    )

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    out = funnel_first_conversion(
        ds, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"],
        window_us=6 * 3600 * 1_000_000,
    )
    schema = pa.schema(
        [("user_id", pa.int64()), ("first_start_ts", pa.timestamp("us"))]
    )
    return out.map_batches(
        lambda t: t.select(["user_id", "first_start_ts"]).cast(schema),
        batch_format="pyarrow",
    )


def q_events_funnel_dropoff(sf_dir: str):
    """Classic funnel drop-off report: how many users complete the first j
    steps of view → click → purchase (each gap ≤ 6h) for every prefix j —
    three prefix funnels (stages/temporal.py funnel_first_conversion; the
    1-step prefix is a distinct-key count) unioned into (step, n_users).
    Hash-exact vs the nested-EXISTS prefix oracles."""
    import ray
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion,
    )

    W = 6 * 3600 * 1_000_000

    def count_partial(step: int, ds):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "step": pa.array([step] * t.num_rows, pa.int64()),
                    "one": pa.array(np.ones(t.num_rows, np.int64)),
                }
            )
        return ds.map_batches(f, batch_format="pyarrow")

    # step 1: distinct users with a qualifying 'view' (ts non-null)
    def viewers(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(t["user_id"].combine_chunks()),
            pc.and_(pc.is_valid(t["ts"].combine_chunks()),
                    pc.equal(t["event_type"], "view")),
        )
        g = t.filter(m).select(["user_id"]).group_by(["user_id"]).aggregate(
            [([], "count_all")]
        )
        return g.select(["user_id"])

    s1 = (
        _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(viewers, batch_format="pyarrow")
        .groupby("user_id")
        .count()
    )
    s2 = funnel_first_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type", steps=["view", "click"], window_us=W,
    )
    s3 = funnel_first_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], window_us=W,
    )
    unioned = (
        count_partial(1, s1).union(count_partial(2, s2))
        .union(count_partial(3, s3))
    )
    out = unioned.groupby("step").aggregate(Sum("one", alias_name="n_users"))
    schema = pa.schema([("step", pa.int64()), ("n_users", pa.int64())])
    return out.map_batches(
        lambda t: t.select(["step", "n_users"]).cast(schema),
        batch_format="pyarrow",
    )


def q_percent_rank_docs(sf_dir: str):
    """PERCENT_RANK over a near-unique global order: percentile score per
    doc under (n_chars, doc_id) — range_rank's exact ROW_NUMBER + the
    integer-count finish floor((rank−1)/(n−1)·1e6 + 0.5), one fixed IEEE
    division replayed in SQL. The percentile-score leg next to NTILE
    (bucketize) and top_fraction (cut)."""
    from fdpg_query_data_validation_ray.stages.topk import range_rank

    ranked = range_rank(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        "n_chars", "doc_id", descending=False,
    ).materialize()
    n = ranked.count()

    def finish(t: pa.Table) -> pa.Table:
        rk = t["rank"].to_numpy(zero_copy_only=False).astype(np.float64)
        pr = np.floor((rk - 1.0) / float(n - 1) * 1e6 + 0.5).astype(np.int64) \
            if n > 1 else np.zeros(len(rk), np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "rank": t["rank"],
                "pct_e6": pa.array(pr, pa.int64()),
            }
        )

    return ranked.map_batches(finish, batch_format="pyarrow")


_TAG_PATTERNS: list[tuple[str, str]] = [
    # RE2-safe ASCII classes only (the PII_RULES contract) so DuckDB
    # regexp parity holds byte-for-byte
    ("n_numbers", r"[0-9]+"),
    ("n_code_tokens", r"[A-Za-z_][A-Za-z0-9_]*\("),
    ("n_upper_words", r"\b[A-Z]{2,}\b"),
]


def q_tag_docs(sf_dir: str):
    """Regex taxonomy tagging: per doc, match counts for a fixed pattern
    list (numbers, code-call tokens, shouting words) — the corpus
    annotation step classifier pipelines run before routing. Compiled
    patterns, pandas C-regex count kernels, zero exchange; RE2-parity
    classes so the len(regexp_extract_all) oracle is hash-exact."""
    import re as _re

    import pandas as pd

    pats = [(c, _re.compile(p, _re.ASCII)) for c, p in _TAG_PATTERNS]

    def tag(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("")
        out = {"doc_id": t["doc_id"]}
        for col, rx in pats:
            out[col] = pa.array(
                s.str.count(rx).to_numpy(np.int64), pa.int64()
            )
        return pa.table(out)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tag, batch_format="pyarrow", batch_size=1024)


def q_ntile_docs(sf_dir: str):
    """NTILE(4) curriculum binning: every doc gets its length quartile under
    the global (n_chars, doc_id) order (stages/topk.py ntile on top of
    range_rank). Integer NTILE math on both sides, hash-exact."""
    from fdpg_query_data_validation_ray.stages.topk import ntile

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = ntile(ds, 4, "n_chars", "doc_id", descending=False)
    schema = pa.schema(
        [("doc_id", pa.int64()), ("rank", pa.int64()), ("bucket", pa.int64())]
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "rank", "bucket"]).cast(schema),
        batch_format="pyarrow",
    )


def q_clip_events_by_type(sf_dir: str):
    """Per-group winsorization: each event's value clamped to its
    event_type's [p5, p95] DDSketch band (stages/stats.py
    clip_by_key_quantiles) — two-pass broadcast plan, zero row shuffle;
    the DD bucket math and the integer clamp replay in SQL, hash-exact."""
    from fdpg_query_data_validation_ray.stages.stats import clip_by_key_quantiles

    out = clip_by_key_quantiles(
        _read(sf_dir, "events", ["event_type", "value"]),
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type", "value", "event_id", lo_q=0.05, hi_q=0.95,
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("value_e6", pa.int64()),
            ("clipped_e6", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["event_id", "event_type", "value_e6", "clipped_e6"]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_diff_docs_halves(sf_dir: str):
    """Distributed multiset diff (EXCEPT ALL both directions, with counts):
    compare the (lang, source) multiset of even-doc_id documents against
    odd-doc_id documents (stages/stats.py multiset_diff) — the pipeline
    regression primitive. Combiner partials per side union into ONE
    groupby; exchange moves distinct-tuple count rows only."""
    from fdpg_query_data_validation_ray.stages.stats import multiset_diff

    def half(par: int):
        ds = _read(sf_dir, "documents", ["doc_id", "lang", "source"])
        return ds.map_batches(
            lambda t, p=par: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)
            ).select(["lang", "source"]),
            batch_format="pyarrow",
        )

    out = multiset_diff(half(0), half(1), ["lang", "source"])
    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("source", pa.string()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["lang", "source", "n_a", "n_b"]).cast(schema),
        batch_format="pyarrow",
    )


def q_corr_lineitem(sf_dir: str):
    """Per-group Pearson correlation of quantity vs extendedprice per
    returnflag (stages/stats.py corr_by_key): five exact integer moments
    per batch groupby are the combiner, one tiny Sum groupby merges, a
    zero-exchange map finishes the ONE fixed IEEE r formula — hash-exact
    vs the verbatim SQL replay. Quantity in units, price in whole dollars
    (int64 headroom documented in the stage)."""
    from fdpg_query_data_validation_ray.stages.stats import corr_by_key

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_quantity", "l_extendedprice"])
    out = corr_by_key(ds, "l_returnflag", "l_quantity", "l_extendedprice",
                      x_scale=1, y_scale=1)
    schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("n", pa.int64()),
            ("corr_e6", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["l_returnflag", "n", "corr_e6"]).cast(schema),
        batch_format="pyarrow",
    )


_UF_TYPES = ["click", "view", "purchase", "signup", "error"]
_UF_COLS = [f"n_{v}" for v in _UF_TYPES] + [
    "n_other", "n_sessions", "converted", "total_value_cents",
]


def q_user_features(sf_dir: str):
    """Composed feature-store build — ONE wide feature vector per user from
    four operator families, assembled without a join: per-type event counts
    (pivot combiner), session count (sessionize kernel), funnel conversion
    flag (backward-induction kernel), and the exact cents value total. Each
    source emits the FULL wide schema zero-filled outside its own columns;
    the lazy union feeds ONE user groupby summing every column — the same
    single-exchange trick as pivot_counts, generalized across sources.
    Hash-exact vs a 4-CTE LEFT-JOIN oracle."""
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.stats import pivot_counts
    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion, sessionize,
    )

    def widen(ds, keep: dict[str, str]):
        """Map a (user_id, ...) partial to the full wide schema."""
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            zero = pa.array(np.zeros(n, np.int64))
            cols = {"user_id": pc.cast(t["user_id"], pa.int64())}
            for c in _UF_COLS:
                src = keep.get(c)
                cols[c] = (pc.cast(t[src], pa.int64())
                           if src is not None else zero)
            return pa.table(cols)
        return ds.map_batches(f, batch_format="pyarrow")

    def add_cents(t: pa.Table) -> pa.Table:
        # cents ride the pivot exchange (sum_columns) — invalid values add 0,
        # which equals SQL's SUM-skips-NULL + COALESCE(...,0) on the oracle
        # side
        x = pc.cast(t["value"], pa.float64())
        ok = pc.and_(pc.is_valid(x), pc.invert(pc.is_nan(x)))
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.if_else(ok, x, 0.0), 100.0), 0.5)),
            pa.int64(),
        )
        return t.select(["user_id", "event_type"]).append_column(
            "cents", cents
        )

    pivot = pivot_counts(
        _read(sf_dir, "events", ["user_id", "event_type", "value"])
        .map_batches(add_cents, batch_format="pyarrow", batch_size=16384),
        "user_id", "event_type", values=_UF_TYPES,
        sum_columns={"total_value_cents": "cents"},
    )
    sess = sessionize(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        "user_id", "ts", "event_id", gap_seconds=1800,
    )
    funnel = funnel_first_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"],
        window_us=6 * 3600 * 1_000_000,
    ).map_batches(
        lambda t: t.select(["user_id"]).append_column(
            "one", pa.array(np.ones(t.num_rows, np.int64))
        ),
        batch_format="pyarrow",
    )

    unioned = (
        widen(pivot, {c: c for c in _UF_COLS[:6]
                      } | {"total_value_cents": "total_value_cents"})
        .union(widen(sess, {"n_sessions": "n_sessions"}))
        .union(widen(funnel, {"converted": "one"}))
    )
    out = unioned.groupby("user_id").aggregate(
        *(Sum(c, alias_name=c) for c in _UF_COLS)
    )
    schema = pa.schema([("user_id", pa.int64())]
                       + [(c, pa.int64()) for c in _UF_COLS])
    return out.map_batches(
        lambda t: t.select(["user_id"] + _UF_COLS).cast(schema),
        batch_format="pyarrow",
    )


def q_exact_quantiles_events(sf_dir: str):
    """EXACT global quantiles of a near-unique float column — the exact
    leg next to the DDSketch estimate (`quantiles_nchars`): quantile_disc
    = the row at rank floor(q·(n−1))+1 under the total (value, id) order.
    range_rank supplies the exact distributed ROW_NUMBER (O(sketch)
    driver state, one exchange); the ≤|qs| hit rows come to the driver
    and ONE pruned is_in scan fetches their values — nothing else ever
    leaves the cluster. Hash-exact vs the ROW_NUMBER join oracle."""
    import ray

    from fdpg_query_data_validation_ray.stages.topk import range_rank

    qs = (0.25, 0.5, 0.9, 0.99)
    ranked = range_rank(
        _read(sf_dir, "events", ["event_id", "value"]),
        "value", "event_id", descending=False,
    ).materialize()
    n = ranked.count()
    # (rank, q) PAIRS — two quantiles may share a rank at tiny n, and a
    # dict keyed by rank would silently drop one of them
    targets = [(int(np.floor(q * (n - 1))) + 1, q) for q in qs]
    tset = pa.array(sorted({r for r, _ in targets}), pa.int64())

    hits = ranked.map_batches(
        lambda t: t.filter(pc.is_in(t["rank"].combine_chunks(),
                                    value_set=tset)),
        batch_format="pyarrow",
    ).to_pandas()  # ≤ len(qs) rows
    id_of = dict(zip(hits["rank"], hits["event_id"]))
    ids = pa.array(sorted(id_of.values()), pa.int64())

    vals = (
        _read(sf_dir, "events", ["event_id", "value"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["event_id"].combine_chunks(),
                                        value_set=ids)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    v_of = dict(zip(vals["event_id"], vals["value"]))
    rows = sorted(
        (q, int(np.floor(v_of[id_of[r]] * 1e6 + 0.5)), r)
        for r, q in targets
    )
    return pa.table(
        {
            "q": pa.array([r[0] for r in rows], pa.float64()),
            "value_e6": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def q_user_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by first-active week
    (cohort), counted per week they were active — the classic product /
    data-freshness analytics table. ONE exchange: (user, week) rows route
    by user-hash part, and each part resolves cohort (per-user MIN week —
    all of a user's rows share the part), per-user distinct weeks, and the
    (cohort, week) user counts in a single pandas kernel; a tiny final
    groupby sums the per-part counts. Hash-exact vs the MIN/DISTINCT/JOIN
    oracle (floor_temporal week == date_trunc('week'), Monday start)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def route(t: pa.Table) -> pa.Table:
        from fdpg_query_data_validation_ray.functions.hashing import hash64

        m = pc.and_(
            pc.is_valid(t["user_id"].combine_chunks()),
            pc.is_valid(t["ts"].combine_chunks()),
        )
        t = t.filter(m)
        wk = pc.floor_temporal(t["ts"].combine_chunks(), unit="week")
        u = t["user_id"].combine_chunks()
        part = pa.array(
            (hash64(u) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pa.table({"user_id": u, "wk": wk, "part": part})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"cohort": pd.Series(dtype="datetime64[us]"),
                 "week": pd.Series(dtype="datetime64[us]"),
                 "n_users": pd.Series(dtype="int64")}
            )
        pairs = g[["user_id", "wk"]].drop_duplicates()
        cohort = g.groupby("user_id", sort=False)["wk"].min()
        pairs = pairs.assign(cohort=pairs["user_id"].map(cohort))
        out = (
            pairs.groupby(["cohort", "wk"], sort=False)
            .size()
            .reset_index(name="n_users")
            .rename(columns={"wk": "week"})
        )
        return out[["cohort", "week", "n_users"]]

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    routed = ds.map_batches(route, batch_format="pyarrow", batch_size=16384)
    parts = routed.groupby("part").map_groups(per_part,
                                              batch_format="pandas")
    out = parts.groupby(["cohort", "week"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )
    schema = pa.schema(
        [
            ("cohort", pa.timestamp("us")),
            ("week", pa.timestamp("us")),
            ("n_users", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["cohort", "week", "n_users"]).cast(schema),
        batch_format="pyarrow",
    )


def q_corpus_validate(sf_dir: str):
    """Flagship: derive the (repo,path,commit,lang,content) corpus from the
    documents table, run the checkpointed validation pipeline, return the
    dedup-counted issue table."""
    import glob
    import tempfile

    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.sources.corpus import (
        corpus_dataset_from_documents,
    )

    # STREAMED derivation: documents → corpus shape → partitioned parquet,
    # never materialized at the driver
    work = tempfile.mkdtemp(prefix="qdv_corpus_")
    try:
        corpus_dataset_from_documents(sf_dir).repartition(4).write_parquet(
            f"{work}/input"
        )
        files = sorted(glob.glob(f"{work}/input/*.parquet"))
        suite = qdv.Suite(
            "code",
            [
                qdv.not_null("content"),
                qdv.regex("commit", "[0-9a-f]{32}"),
                qdv.length_range("content", 40, None),
            ],
            key_columns=["repo", "path", "commit"],
        )
        registry = qdv.SuiteRegistry(
            routing_column="lang",
            routes={l: suite for l in ("en", "de", "fr", "es")},  # zh unrouted → warnings
        )
        plan = ValidationPlan(
            registry=registry,
            unique_keys=["repo", "path", "commit"],
            stats_columns=["repo", "lang", "content"],
            categorical=["lang"],
            content_column="content",
        )
        report = run_validation(files, f"{work}/out", plan, num_partitions=4)
        rows = report["validation"] + report["general"] + report["error"]
        return pa.table(
            {
                "rule_id": [r["rule_id"] for r in rows],
                "severity": [r["severity"] for r in rows],
                "location": [r["location"] for r in rows],
                "n_issues": pa.array([r["count"] for r in rows], pa.int64()),
            }
        )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def q_events_asof_purchase(sf_dir: str):
    """As-of join (custom temporal operator): for each click event, the same
    user's latest purchase at-or-before its timestamp (DuckDB ASOF LEFT JOIN
    oracle). right_id/gap are DOUBLE (NaN = no prior purchase) so nullable
    semantics hash identically under any oracle fetch path."""
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.temporal import asof_join_events

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    return asof_join_events(
        ds,
        by="user_id",
        on="ts",
        id_column="event_id",
        left_filter=lambda t: pc.equal(t["event_type"], "click"),
        right_filter=lambda t: pc.equal(t["event_type"], "purchase"),
        out_right_id="purchase_id",
        out_gap="gap_us",
    )


def q_events_sessionize(sf_dir: str):
    """Sessionization windowed aggregate: per-user session stats under a
    30-minute inactivity gap (window-function oracle)."""
    from fdpg_query_data_validation_ray.stages.temporal import sessionize

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    return sessionize(ds, "user_id", "ts", "event_id", gap_seconds=1800)


def q_events_range_neighbors(sf_dir: str):
    """Range join (custom temporal operator): per event, how many other
    events of the same user fall within ±5 minutes — per-key sorted
    double-searchsorted instead of a naive pairwise sweep (SQL BETWEEN-join
    oracle)."""
    from fdpg_query_data_validation_ray.stages.temporal import range_join_count

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    five_min = 5 * 60 * 1_000_000
    return range_join_count(
        ds, by="user_id", on="ts", id_column="event_id",
        lo_us=-five_min, hi_us=five_min,
    )


def q_events_user_deltas(sf_dir: str):
    """Per-key LAG window: each event's previous value within the same user
    under the (ts, event_id) order, plus the exact fixed-point delta —
    LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) as a
    distributed coarse-partition kernel (stages/temporal.py:lag_delta).
    Quantization to e6 integers happens BEFORE the delta, so the result is
    exact int64 arithmetic with NULL firsts, hash-exact vs the window
    oracle."""
    from fdpg_query_data_validation_ray.stages.temporal import lag_delta

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = lag_delta(ds, "user_id", "ts", "event_id", "value")
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("value_e", pa.int64()),
            ("prev_value_e", pa.int64()),
            ("delta_e", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "value_e", "prev_value_e", "delta_e"]
        ).cast(schema),
        batch_format="pyarrow",
    )



def q_events_user_window(sf_dir: str):
    """Per-row time-RANGE rolling aggregate: each event's trailing-1-hour
    SUM(value)/COUNT(*) within its user — SUM(..) OVER (PARTITION BY user_id
    ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) as
    a distributed coarse-partition kernel
    (stages/temporal.py:rolling_window_sum). Values quantize to cents BEFORE
    the prefix sums, so every window sum is exact int64 arithmetic,
    hash-exact vs the window oracle."""
    from fdpg_query_data_validation_ray.stages.temporal import rolling_window_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = rolling_window_sum(
        ds, "user_id", "ts", "event_id", "value",
        window_us=3_600_000_000, scale=100,
    )
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("win_sum_e", pa.int64()),
            ("win_n", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "win_sum_e", "win_n"]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_ewma_events_by_user(sf_dir: str):
    """Per-user EWMA of event values under the (ts, event_id) order
    (stages/temporal.py ewma_by_key, alpha=0.3). Rows-only by design: the
    recurrence has no SQL window form; brute-force parity, invariance and
    null-semantics tests live in tests/test_temporal.py."""
    from fdpg_query_data_validation_ray.stages.temporal import ewma_by_key

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = ewma_by_key(ds, "user_id", "ts", "event_id", "value", alpha=0.3)
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ewma_e6", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["user_id", "event_id", "ewma_e6"]).cast(schema),
        batch_format="pyarrow",
    )


def q_locf_events_by_user(sf_dir: str):
    """Per-user LOCF gap filling: each event carries the most recent
    non-null value of its user — LAST_VALUE(value IGNORE NULLS) OVER
    (PARTITION BY user ORDER BY ts, id ROWS UNBOUNDED PRECEDING) as a
    coarse-partition kernel (stages/temporal.py forward_fill_by_key).
    Values quantized to e6 BEFORE the fill, hash-exact."""
    from fdpg_query_data_validation_ray.stages.temporal import (
        forward_fill_by_key,
    )

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = forward_fill_by_key(ds, "user_id", "ts", "event_id", "value")
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("value_e", pa.int64()),
            ("filled_e", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "value_e", "filled_e"]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_split_docs(sf_dir: str):
    """Deterministic train/val/test assignment by id hash (stages/split.py):
    stable under re-runs, partitioning, and corpus growth; oracle reproduces
    the exact md5_number_lower threshold arithmetic in SQL."""
    from fdpg_query_data_validation_ray.stages.split import assign_split

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = assign_split(
        ds, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "split"]).cast(
            pa.schema([("doc_id", pa.int64()), ("split", pa.string())])
        ),
        batch_format="pyarrow",
    )


def q_sample_docs(sf_dir: str):
    """Deterministic Bernoulli(0.2) sample keyed on the doc id hash — same
    rows on every run and any partitioning (stages/split.py)."""
    from fdpg_query_data_validation_ray.stages.split import sample_fraction

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = sample_fraction(ds, "doc_id", 0.2)
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang"]).cast(
            pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
        ),
        batch_format="pyarrow",
    )


def q_redact_pii_docs(sf_dir: str):
    """PII redaction (C4/RefinedWeb scrub): plant deterministic email /
    phone / IPv4 literals into each doc's text (the synthetic corpus has
    none), then count + redact them. Planting happens identically on the
    engine side (Arrow concat kernels) and in the oracle (SQL ||), so the
    redacted text is byte-comparable. doc_id & 255 (not % 256) on BOTH
    sides — bit semantics agree for all integers, % does not for negatives."""
    from fdpg_query_data_validation_ray.stages.text import PIIRedactStage

    def aug(t: pa.Table) -> pa.Table:
        s = pc.cast(t["doc_id"], pa.string())
        ip = pc.cast(pc.bit_wise_and(t["doc_id"], 255), pa.string())
        text_aug = pc.binary_join_element_wise(
            pc.fill_null(t["text"], ""),
            " contact user", s, "@example.com or +49170",
            pc.utf8_lpad(s, 7, "0"), " from 10.", ip, ".0.1",
            "",
        )
        return pa.table({"doc_id": t["doc_id"], "text": text_aug})

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        aug, batch_format="pyarrow"
    )
    return ds.map_batches(PIIRedactStage("text"), batch_format="pyarrow").select_columns(
        ["doc_id", "text_redacted", "n_emails", "n_phones", "n_ips"]
    )


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 97 == 0 stand in for
    the benchmark suite; their distinct word-3-gram md5 hashes are built
    DISTRIBUTIVELY (per-batch distinct → groupby dedup — the driver only
    receives the gram-vocabulary-bounded hash array, never the benchmark
    text), ray.put once, and every other doc is flagged when it shares
    >= 3 distinct grams. 3-grams (not the literature's 8-13) because the
    synthetic corpus draws from a 30-word vocabulary: at k=3 real
    cross-doc overlap exists (16 flagged at sf0.01, of which 10 are
    non-benchmark docs), so the oracle discriminates; at k=5 only the
    benchmark members self-hit."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        DecontaminateStage,
        benchmark_gram_hashes_distributed,
    )

    bench_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        # trunc-division remainder == SQL % for any sign (both C-style)
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 97), 97),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    bench_ref = ray.put(benchmark_gram_hashes_distributed(bench_ds, "text", k=3))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        # task-based instance: the sorted benchmark array is baked into the
        # serialized callable — one plasma object, cached per worker — so a
        # dedicated actor pool only added startup latency
        DecontaminateStage(bench=bench_ref, text_column="text", k=3, min_hits=3),
        batch_format="pyarrow",
        # coalesce the reader's small blocks: the per-batch md5-gram kernel
        # has a fixed cost that 70-row batches pay 70x over
        batch_size=1024,
    ).select_columns(
        ["doc_id", "n_grams_distinct", "n_contaminated", "is_contaminated"]
    )


def q_repetition_docs(sf_dir: str):
    """Gopher repetition signals per doc (top-word / duplicate-word /
    top-bigram fractions, fixed-point e6) — stages/text.py RepetitionStage."""
    from fdpg_query_data_validation_ray.stages.text import RepetitionStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        RepetitionStage("text"), batch_format="pyarrow", batch_size=1024
    ).select_columns(
        ["doc_id", "rep_top_word_e6", "dup_word_frac_e6", "rep_top_bigram_e6"]
    )


def q_entropy_docs(sf_dir: str):
    """Unigram Shannon entropy per doc (lexical diversity; low = stuffed
    boilerplate, anomalously high = noise) — stages/text.py
    UnigramEntropyStage. ent_num_e6 = n·lnq(n) − Σ c·lnq(c) with per-count
    e6 ln quantization, so the whole aggregate is exact int64 and the
    GROUP BY doc,term oracle is hash-exact."""
    from fdpg_query_data_validation_ray.stages.text import UnigramEntropyStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        UnigramEntropyStage("text"), batch_format="pyarrow", batch_size=1024
    ).select_columns(["doc_id", "n_tokens", "ent_num_e6"])


def q_truncate_docs(sf_dir: str):
    """Max-length truncation to 64 tokens (tokenize→truncate→detokenize,
    stages/text.py TruncateTokensStage) — all Arrow kernels, zero-copy;
    byte-exact vs the list-slice + array_to_string oracle."""
    from fdpg_query_data_validation_ray.stages.text import TruncateTokensStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        TruncateTokensStage("text", 64), batch_format="pyarrow",
        batch_size=1024,
    ).select_columns(["doc_id", "text_trunc", "n_tokens", "was_truncated"])


def q_sample_n_per_lang(sf_dir: str):
    """Deterministic stratified sampling: exactly min(10, |stratum|) docs
    per lang, chosen as the 10 smallest salted-md5 hashes — uniform without
    replacement WITHIN each stratum, stable under re-runs, partitioning and
    corpus growth (a doc enters/leaves the sample only when its own hash
    rank crosses the boundary). Composes stages/split.py's hash mechanism
    with stages/sampling.py's distributed per-key cap."""
    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key
    from fdpg_query_data_validation_ray.stages.split import _row_hashes

    def add_hash(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t["lang"]), pc.is_valid(t["doc_id"]))
        )
        h = _row_hashes(t, "doc_id", "strat").astype(np.int64)
        return t.append_column("h", pa.array(h, pa.int64()))

    ds = _read(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        add_hash, batch_format="pyarrow", batch_size=8192
    )
    out = first_n_per_key(ds, 10, "lang", ["h", "doc_id"], rank_column="rank")
    return out.map_batches(
        lambda t: t.select(["lang", "doc_id", "rank"]).cast(
            pa.schema(
                [("lang", pa.string()), ("doc_id", pa.int64()),
                 ("rank", pa.int64())]
            )
        ),
        batch_format="pyarrow",
    )


def q_docs_ranked_by_len(sf_dir: str):
    """Global dense ROW_NUMBER by (n_chars DESC, doc_id) without a full
    sort — histogram combiner → driver cumsum of per-key bases → one
    groupby exchange (stages/topk.py global_rank). Null n_chars excluded
    on both sides."""
    from fdpg_query_data_validation_ray.stages.topk import global_rank

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return global_rank(ds, "n_chars", "doc_id", descending=True)


def q_events_ranked_by_value(sf_dir: str):
    """Exact global ROW_NUMBER by (value DESC, event_id) where `value` is a
    near-unique float — the UNBOUNDED-cardinality regime where
    global_rank's driver histogram would be O(n). stages/topk.py
    range_rank: KLL-sampled range boundaries → monotone route → exact
    per-range counts → per-range local sort + base offsets. Null/NaN
    values excluded on both sides (NaN ordering is engine-dependent)."""
    from fdpg_query_data_validation_ray.stages.topk import range_rank

    ds = _read(sf_dir, "events", ["event_id", "value"])
    return range_rank(
        ds, "value", "event_id", descending=True, n_ranges=16
    )


def q_top_fraction_docs(sf_dir: str):
    """Percentile cut (stages/topk.py take_top_fraction): the top 10 % of
    documents by (n_chars DESC, doc_id) — the FineWeb/DCLM "keep the best
    X % by score" selection, composed from range_rank + an integer-math
    rank threshold (ceil(n/10) = (n+9)//10 on both sides)."""
    from fdpg_query_data_validation_ray.stages.topk import take_top_fraction

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return take_top_fraction(ds, "n_chars", "doc_id", 1, 10, descending=True)


def q_sample_k_docs(sf_dir: str):
    """Exact-k uniform global sample (stages/sampling.py sample_k): the 100
    docs with the smallest salted md5 id hash — deterministic under re-runs
    and any partitioning, O(k·blocks) exchange via top_k's local prune."""
    from fdpg_query_data_validation_ray.stages.sampling import sample_k

    ds = _read(sf_dir, "documents", ["doc_id"])
    return sample_k(ds, 100, "doc_id")


def _plant_lines(t: pa.Table, group_w: int = 4) -> pa.Table:
    """Deterministically impose line structure on the synthetic corpus (which
    has no newlines or punctuation): words regroup into `group_w`-word lines;
    a line gets a terminal '.' iff (doc_id + line_index) is even. Replayed
    verbatim in the oracle via list slicing (t[x:x+w-1] + the same parity
    CASE), so the lined text is byte-identical on both sides — the
    q_redact_pii_docs planting pattern. Vectorized: one flatten + per-word
    suffix select + one groupby join per doc."""
    import numpy as np
    import pandas as pd

    n = t.num_rows
    doc_id = t["doc_id"].to_numpy(zero_copy_only=False)
    col = pc.fill_null(pc.cast(t["text"], pa.string()), "")
    wl = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(wl).to_numpy(zero_copy_only=False)
    par = pc.list_parent_indices(wl).to_numpy(zero_copy_only=False)
    nonempty = flat != ""  # regex split can emit "" at text edges
    flat, par = flat[nonempty], par[nonempty]
    lined = np.full(n, "", dtype=object)
    if len(flat):
        starts = np.searchsorted(par, np.arange(n))
        ordn = np.arange(len(par)) - starts[par]
        li = ordn // group_w
        last_of_doc = np.ones(len(par), dtype=bool)
        last_of_doc[:-1] = par[:-1] != par[1:]
        last_of_line = (ordn % group_w == group_w - 1) | last_of_doc
        punct = ((doc_id[par] + li) % 2) == 0
        dot = last_of_line & punct
        sep = np.where(last_of_doc, "", np.where(last_of_line, "\n", " "))
        toks = pd.Series(flat, dtype=object) + np.where(dot, ".", "") + sep
        joined = toks.groupby(par, sort=True).agg("".join)
        lined[joined.index.to_numpy()] = joined.to_numpy()
    return pa.table(
        {"doc_id": t["doc_id"], "text": pa.array(lined, pa.string())}
    )


def q_distinct_terms_per_lang(sf_dir: str):
    """Grouped exact distinct: COUNT(DISTINCT token) per language
    (stages/stats.py distinct_count_per_key) — tokenize per batch (one Arrow
    split + parent-index gather, no per-row Python), local (lang, term)
    dedup as the combiner, one pair groupby, tiny per-lang count."""
    from fdpg_query_data_validation_ray.stages.stats import distinct_count_per_key

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()), ""))
        wl = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(wl)
        par = pc.list_parent_indices(wl)
        lang = pc.take(t["lang"].combine_chunks(), par)
        keep = pc.not_equal(flat, "")
        return pa.table(
            {"lang": pc.filter(lang, keep), "term": pc.filter(flat, keep)}
        )

    pairs = ds.map_batches(tokens, batch_format="pyarrow", batch_size=2048)
    return distinct_count_per_key(pairs, "lang", "term", alias="n_distinct_terms")


def q_top_terms_per_lang(sf_dir: str):
    """Exact GROUPED heavy hitters: the 5 most frequent terms per language
    (count DESC, term ASC tiebreak) — the per-key leg next to the global
    two-pass `heavy_terms_docs`. Pure composition: per-batch (lang, term)
    count partials (the combiner — the exchange moves count rows, never
    tokens), one Sum groupby, then the descending per-key cap
    (stages/sampling.py first_n_per_key). Hash-exact vs the ROW_NUMBER
    oracle."""
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()), ""))
        wl = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(wl)
        par = pc.list_parent_indices(wl)
        lang = pc.take(t["lang"].combine_chunks(), par)
        keep = pc.and_(pc.not_equal(flat, ""), pc.is_valid(lang))
        pt = pa.table(
            {"lang": pc.filter(lang, keep), "term": pc.filter(flat, keep)}
        )
        g = pt.group_by(["lang", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "term", "n"])

    counts = (
        ds.map_batches(pair_counts, batch_format="pyarrow", batch_size=2048)
        .groupby(["lang", "term"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out = first_n_per_key(
        counts, 5, "lang", ["n", "term"], rank_column="rnk",
        ascending=[False, True],
    )
    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("term", pa.string()),
            ("n", pa.int64()),
            ("rnk", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["lang", "term", "n", "rnk"]).cast(schema),
        batch_format="pyarrow",
    )


def q_distinct_terms_per_lang_hll(sf_dir: str):
    """Approximate grouped distinct: HLL estimate of distinct terms per
    language (stages/stats.py hll_count_per_key) — the scale path beside
    the exact `distinct_terms_per_lang`: the exchange moves (key, sketch)
    rows, bounded regardless of cardinality. Rows-only (no SQL estimator);
    tolerance vs the exact plan pinned in tests."""
    from fdpg_query_data_validation_ray.stages.stats import hll_count_per_key

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def tokens(t: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()), ""))
        wl = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(wl)
        par = pc.list_parent_indices(wl)
        lang = pc.take(t["lang"].combine_chunks(), par)
        keep = pc.not_equal(flat, "")
        return pa.table(
            {"lang": pc.filter(lang, keep), "term": pc.filter(flat, keep)}
        )

    pairs = ds.map_batches(tokens, batch_format="pyarrow", batch_size=2048)
    return hll_count_per_key(pairs, "lang", "term")


def q_c4_filter_docs(sf_dir: str):
    """C4 line-level structural cleaning (stages/text.py C4LineFilterStage):
    plant deterministic 4-word lines with parity punctuation (identically in
    the oracle), keep lines ending in [.!?] with ≥ 4 words, keep docs with
    ≥ 3 surviving lines."""
    from fdpg_query_data_validation_ray.stages.text import C4LineFilterStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _plant_lines, batch_format="pyarrow"
    )
    return ds.map_batches(
        C4LineFilterStage(min_words=4, min_lines=3),
        batch_format="pyarrow",
        batch_size=2048,
    )


def q_span_dedup_docs(sf_dir: str):
    """C4-style duplicate-span removal (Raffel et al. 2020 §2.2): every
    non-overlapping full 3-token span that occurs more than once in the
    corpus keeps its first (doc_id, span_idx) occurrence; later occurrences
    are cut from their documents. stages/text.py span_dedup — payload-free
    span explode, coarse-part winner pick, native left-outer join, per-batch
    rebuild. k=3 so real cross-doc span collisions exist in the synthetic
    30-word-vocabulary corpus."""
    from fdpg_query_data_validation_ray.stages.text import span_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return span_dedup(ds, k=3)


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid sums (the IVF / spherical-k-means
    training step as a first-class aggregate), integer-exact via e6
    quantization before aggregation — stages/similarity.py
    embedding_centroid_sums."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        embedding_centroid_sums,
    )

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return embedding_centroid_sums(ds, "embedding", "label")


def q_lm_score_docs(sf_dir: str):
    """CCNet-style LM quality filter: a word-bigram LM trained
    DISTRIBUTIVELY on the deterministic reference subset (doc_id % 17 == 0
    — CCNet trains on a fixed reference corpus): per-batch (hash, count)
    partials → groupby-Sum → the driver receives only the
    vocabulary-bounded model arrays, never the reference text. Broadcast
    once, then every doc scored with an integer-exact quantized NLL
    (stages/text.py LMScoreStage)."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        LMScoreStage,
        train_bigram_lm_distributed,
    )

    train_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 17), 17),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    model_ref = ray.put(train_bigram_lm_distributed(train_ds, "text"))
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LMScoreStage(model_ref, text_column="text"),
        batch_format="pyarrow",
        batch_size=1024,
    ).select_columns(["doc_id", "n_bigrams", "nll_e6_sum"])


def q_quantize_embeddings(sf_dir: str):
    """SQ8 scalar quantization (FAISS-style) — the 4× memory-reduction
    step before ANN at scale: per-dimension exact (min, max) via a
    dimension-bounded combiner groupby (stages/similarity.py
    embedding_dim_minmax — driver receives O(d) rows), bounds broadcast in
    the stage closure, every vector mapped to
    code = FLOOR((x-mn)/(mx-mn)*255 + 0.5) uint8 codes in one streaming
    map_batches (SQ8Stage emits packed list<uint8>). The query explodes
    codes to (vec_id, dim, code) rows so the IEEE-replayed DuckDB oracle
    can hash-check every code."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        SQ8Stage,
        embedding_dim_minmax,
    )

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    mn, mx = embedding_dim_minmax(emb, "embedding")

    def explode(t: pa.Table) -> pa.Table:
        arr = t["codes"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.asarray(arr.offsets)
        lens = np.diff(offs).astype(np.int64)
        total = int(lens.sum())
        dim_el = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs[:-1].astype(np.int64), lens)
            + 1
        )
        ids = np.repeat(
            t["vec_id"].to_numpy(zero_copy_only=False), lens
        )
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "dim": pa.array(dim_el, pa.int64()),
                "code": pa.array(
                    arr.values.to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return emb.map_batches(
        SQ8Stage(mn, mx, "embedding", "vec_id"), batch_format="pyarrow"
    ).map_batches(explode, batch_format="pyarrow")


def q_pq_codes_embeddings(sf_dir: str):
    """Product-quantization codes (Jégou et al. 2011) — the other half of
    the FAISS compression family next to `quantize_embeddings` (SQ8):
    codebooks k-means-trained per subspace on a deterministic bounded
    sample (`pq_train`, sample-based BY DESIGN — the corpus is only ever
    assigned), broadcast in the stage closure, every vector mapped to m=4
    uint8 sub-codes in one streaming einsum map_batches. Rows-only check
    (k-means is not SQL-expressible); tests pin determinism, partition
    invariance, code ranges and an ADC-reconstruction recall bar. Output
    exploded to (vec_id, sub, code) for a stable compare schema."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        PQAssignStage,
        pq_train,
    )

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    books = pq_train(emb, m=4, k=64)

    def explode(t: pa.Table) -> pa.Table:
        arr = t["codes"].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.asarray(arr.offsets)
        lens = np.diff(offs).astype(np.int64)
        sub = (
            np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(offs[:-1].astype(np.int64), lens)
        )
        return pa.table(
            {
                "vec_id": pa.array(
                    np.repeat(t["vec_id"].to_numpy(zero_copy_only=False), lens),
                    pa.int64(),
                ),
                "sub": pa.array(sub, pa.int64()),
                "code": pa.array(
                    arr.values.to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return emb.map_batches(
        PQAssignStage(books, "embedding", "vec_id"), batch_format="pyarrow"
    ).map_batches(explode, batch_format="pyarrow")


def q_heavy_terms_docs(sf_dir: str, k: int = 4096, denom: int = 1000):
    """EXACT heavy hitters (terms with frequency > n_tokens/1000) via the
    two-pass sketch-guided plan — the shuffle-free scale path for frequent
    terms at 10^12 tokens, where an exact whole-vocabulary groupby would
    all-to-all-exchange every token:

      pass 1: each batch emits a bulk Misra-Gries summary of its term
        counts (≤ k rows) + an exact token-count sentinel; partials
        stream-compact at the driver with the SAME mg_truncate kernel.
        Mergeable-summaries guarantee (Agarwal et al. 2012): every term
        with true count > W/(k+1) is in the merged candidate set — with
        k = 4096 and threshold W/1000, no heavy term can be missed.
      pass 2: the ≤ k candidate strings broadcast in the task closure;
        each batch counts ONLY candidate occurrences (sorted-array
        searchsorted membership + bincount), a tiny groupby sums them,
        and the exact integer filter cnt * denom > n cuts.

    Output is EXACT and order-free (hash-exact oracle), even though pass 1
    is lossy — the sketch only prunes the candidate space. Precondition:
    k + 1 >= denom, else the MG bound W/(k+1) sits ABOVE the threshold
    W/denom and heavy terms could be missed (enforced)."""
    if k + 1 < denom:
        raise ValueError(
            "heavy_terms: need k + 1 >= denom for the containment guarantee"
        )
    from fdpg_query_data_validation_ray.functions.sketches import mg_truncate

    import pandas as pd
    import re as _re

    from fdpg_query_data_validation_ray.stages.text import _tokenize_batch

    token_re = _re.compile(r"\S+")

    def partials(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower()
        flat, counts, _starts = _tokenize_batch(s, token_re)
        n_tok = int(counts.sum())
        if n_tok == 0:
            uk = np.empty(0, dtype=object)
            uc = np.empty(0, dtype=np.int64)
        else:
            uk, uc, _ = mg_truncate(flat, np.ones(len(flat), np.int64), k)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(len(uk), np.int32), [1]]),
                    pa.int32(),
                ),
                "term": pa.array(list(uk) + [""], pa.string()),
                "cnt": pa.array(
                    np.concatenate([uc, [n_tok]]), pa.int64()
                ),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        term = t["term"].to_numpy(zero_copy_only=False)
        ctr = kind == 0
        uk, uc, _ = mg_truncate(term[ctr], cnt[ctr], k)
        return pa.table(
            {
                "kind": pa.array(
                    np.concatenate([np.zeros(len(uk), np.int32), [1]]),
                    pa.int32(),
                ),
                "term": pa.array(list(uk) + [""], pa.string()),
                "cnt": pa.array(
                    np.concatenate([uc, [int(cnt[~ctr].sum())]]), pa.int64()
                ),
            }
        )

    from fdpg_query_data_validation_ray.stages.text import _streamed_combine

    docs = _read(sf_dir, "documents", ["text"])
    agg = _streamed_combine(
        docs.map_batches(partials, batch_format="pyarrow"), combine
    )
    kind = agg["kind"].to_numpy(zero_copy_only=False)
    n_total = int(agg["cnt"].to_numpy(zero_copy_only=False)[kind == 1].sum())
    cand = np.sort(agg["term"].to_numpy(zero_copy_only=False)[kind == 0])

    def exact_counts(t: pa.Table) -> pa.Table:
        s = t["text"].to_pandas().fillna("").str.lower()
        flat, counts, _starts = _tokenize_batch(s, token_re)
        if len(flat) == 0 or len(cand) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "cnt": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(cand, flat)
        pos_c = np.minimum(pos, len(cand) - 1)
        hit = cand[pos_c] == flat
        bc = np.bincount(pos_c[hit], minlength=len(cand))
        nz = np.flatnonzero(bc)
        return pa.table(
            {
                "term": pa.array(cand[nz], pa.string()),
                "cnt": pa.array(bc[nz], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    def cut(t: pa.Table) -> pa.Table:
        t = t.rename_columns(["term", "cnt"])
        keep = pc.greater(
            pc.multiply(t["cnt"], pa.scalar(denom, pa.int64())),
            pa.scalar(n_total, pa.int64()),
        )
        return t.filter(keep)

    return (
        docs.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cnt"))
        .map_batches(cut, batch_format="pyarrow")
    )


def q_hash_vectorize_docs(sf_dir: str):
    """Feature-hashing vectorizer (stages/text.py HashVectorizeStage):
    every doc becomes signed token counts over 64 hashed dims — the
    fixed-dimension featurizer fast quality classifiers consume. Stateless
    row-count-changing map_batches, zero exchange; md5 token hashing is
    DuckDB-replayable so every (doc_id, dim, val) row is hash-exact."""
    from fdpg_query_data_validation_ray.stages.text import HashVectorizeStage

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        HashVectorizeStage("text", "doc_id", n_dims=64),
        batch_format="pyarrow",
        batch_size=2048,
    )


def q_classifier_score_docs(sf_dir: str):
    """Linear quality-classifier inference (stages/text.py
    LinearScoreStage): every doc scored w·x over hashed token features —
    the fasttext-style batched-model-inference pattern (weights built once
    in the stage, exact integer dot products, zero exchange). The default
    md5-derived weights make inference end-to-end DuckDB-replayable;
    trained weights use identical plumbing."""
    from fdpg_query_data_validation_ray.stages.text import LinearScoreStage

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LinearScoreStage(n_dims=64),
        batch_format="pyarrow",
        batch_size=2048,
    ).select_columns(["doc_id", "n_tokens", "score_i"])


def q_subsample_docs(sf_dir: str):
    """Frequency-balanced subsampling (the mC4/PaLM high-resource
    downweighting and word2vec frequency-subsampling family): each doc
    survives with probability ∝ 1/sqrt(n_lang), so over-represented
    languages shrink toward balance while rare ones keep everything
    (probability saturates at 1). keep ⟺
    float64(md5_low60('sub|'||id)) · sqrt(float64(n_lang)) < 2^64 —
    deterministic under re-runs/partitioning, and IEEE-replayable in SQL
    (int→double conversion, correctly-rounded sqrt, one multiply: every op
    bit-identical between numpy and DuckDB; no pow/exp, whose libm
    rounding differs). Per-lang counts come from a bounded groupby and
    broadcast in the task closure — zero exchange on the corpus pass
    (stages/split.py subsample_balanced)."""
    from fdpg_query_data_validation_ray.stages.split import subsample_balanced

    return subsample_balanced(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        id_column="doc_id",
        group_column="lang",
        strength=16.0,
        salt="sub",
    )


def q_chunk_docs(sf_dir: str):
    """Sliding-window training-chunk splitting (stages/text.py ChunkStage):
    every doc becomes ceil(n_tokens/16) chunks of up to 32 whitespace
    tokens at stride 16 — the overlapping context-window precursor to
    sequence packing. Pure row-count-changing map_batches: no exchange, no
    state, streams at any scale. Oracle: generate_series stride steps +
    array_to_string list slices, hash-exact."""
    from fdpg_query_data_validation_ray.stages.text import ChunkStage

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ChunkStage(window=32, stride=16),
        batch_format="pyarrow",
        batch_size=2048,
    )


_CCNET_LANG_SHIFT = 48  # composite key: lang_idx << 48 | nll_e6_sum


def q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail corpus split (Wenzek et al. 2020 §3.4): each
    language is cut into perplexity TERTILES — the head (lowest LM NLL,
    cleanest text) is what pretraining keeps. Exactly
    NTILE(3) OVER (PARTITION BY lang ORDER BY nll_e6_sum, doc_id).

    Ray shape — one exact distributed rank, no per-lang loop and no
    whole-language groups:
      1. per-lang doc counts from a pruned lang-only read (bounded rows);
         langs sorted → dense idx + cumulative base offsets.
      2. docs scored by the broadcast bigram LM (LMScoreStage, same model
         as `lm_score_docs`), then a COMPOSITE int64 key
         lang_idx << 48 | nll_e6_sum (asserted in-range) makes the global
         (key, doc_id) order equal the per-lang (nll, doc_id) order with
         languages contiguous.
      3. `range_rank` gives the exact global ROW_NUMBER; because language
         blocks are contiguous with known bases, the final map recovers
         lang AND per-lang rank FROM THE RANK ALONE (searchsorted over the
         base offsets — no join back), then applies the NTILE size
         formula (first n%3 buckets get ceil(n/3) rows).
    The scoring pipeline is consumed 3× by range_rank (sketch/count/rank
    passes) — deliberate: re-computing the cheap vectorized scorer streams,
    while materializing a corpus-length projection would hold O(n) in the
    object store at 100 TB."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        LMScoreStage,
        train_bigram_lm_distributed,
    )
    from fdpg_query_data_validation_ray.stages.topk import range_rank

    lang_counts = (
        _read(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .count()
        .to_pandas()
        .sort_values("lang")
    )
    langs = lang_counts["lang"].to_numpy(object)
    n_per = lang_counts["count()"].to_numpy(np.int64)
    if len(langs) >= (1 << 15):
        raise ValueError("ccnet_buckets: lang cardinality exceeds composite range")
    bases = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int64)

    train_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 17), 17)
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    model_ref = ray.put(train_bigram_lm_distributed(train_ds, "text"))
    lang_sorted = np.sort(langs)

    def composite(t: pa.Table) -> pa.Table:
        nll = t["nll_e6_sum"].to_numpy(zero_copy_only=False)
        if len(nll) and (nll.min() < 0 or nll.max() >= (1 << _CCNET_LANG_SHIFT)):
            raise ValueError("ccnet_buckets: nll_e6_sum outside composite range")
        lidx = np.searchsorted(lang_sorted, t["lang"].to_numpy(zero_copy_only=False))
        ckey = (lidx.astype(np.int64) << _CCNET_LANG_SHIFT) | nll
        return pa.table(
            {"doc_id": t["doc_id"], "ckey": pa.array(ckey, pa.int64())}
        )

    scored = (
        _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        .map_batches(
            LMScoreStage(model_ref, text_column="text"),
            batch_format="pyarrow",
            batch_size=1024,
        )
        .map_batches(composite, batch_format="pyarrow")
    )
    ranked = range_rank(scored, "ckey", "doc_id", descending=False)

    # per-lang rank blocks are contiguous: [base+1, base+n] for lang idx i.
    cum = np.cumsum(n_per)  # rank r belongs to lang searchsorted(cum, r)
    names = np.array(["head", "middle", "tail"], dtype=object)

    def to_bucket(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        lidx = np.searchsorted(cum, r, side="left")
        n = n_per[lidx]
        rl = r - bases[lidx]  # 1-based per-lang rank
        big, base = n % 3, n // 3
        size1 = base + 1
        in_first = rl <= big * size1
        b = np.where(
            in_first,
            (rl - 1) // size1,
            big + (rl - 1 - big * size1) // np.maximum(base, 1),
        ) + 1
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": pa.array(langs[lidx], pa.string()),
                "bucket": pa.array(names[b - 1], pa.string()),
            }
        )

    return ranked.map_batches(to_bucket, batch_format="pyarrow")


def q_dsir_weights_docs(sf_dir: str):
    """DSIR importance weights (stages/text.py DSIRWeightStage — Xie et
    al. 2023): every document scored by Σ ln p_target/q_raw over its word
    unigram+bigram feature occurrences. The target distribution comes from
    the deterministic doc_id % 13 == 0 subset (DSIR's target set is a
    fixed high-quality corpus), the raw distribution from the whole
    corpus; BOTH are built by the distributed LM builder (per-batch
    (hash, count) partials → bundled combine → vocabulary-bounded driver
    arrays — the corpora never materialize in one process), broadcast
    once, and every doc scored with an integer-exact quantized log-ratio
    sum."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        DSIRWeightStage,
        train_bigram_lm_distributed,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    target = docs.map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 13), 13),
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    model_t = ray.put(train_bigram_lm_distributed(target, "text"))
    model_r = ray.put(train_bigram_lm_distributed(docs, "text"))
    return docs.map_batches(
        DSIRWeightStage(model_t, model_r, text_column="text"),
        batch_format="pyarrow",
        batch_size=1024,
    ).select_columns(["doc_id", "n_feats", "dsir_e6_sum"])


def q_decontaminate_fuzzy_docs(sf_dir: str):
    """FUZZY benchmark decontamination: flag every corpus doc whose word-
    3-gram Jaccard with ANY benchmark doc (the doc_id % 97 == 0 stand-in
    suite) reaches 0.5 — the near-verbatim-copy complement to
    `decontaminate_docs`' exact shared-gram rule. Ray shape: the benchmark
    rows are re-tagged by an id offset (bench_id = doc_id + 2^40), unioned
    with the corpus, and the whole union flows through the SAME
    bucket-scoped exact-jaccard verifier as the dedup family
    (stages/dedup.py jaccard_verify_buckets — LSH candidates, singleton
    sieve, coarse-part verify); pairs are then kept only when they CROSS
    the offset boundary, and a per-doc Max aggregate yields
    (doc_id, jaccard_max). Output rows = the contamination list only — no
    corpus-wide flag join, no driver-side set."""
    from ray.data.aggregate import Max

    from fdpg_query_data_validation_ray.stages.dedup import (
        jaccard_verify_buckets,
    )

    off = np.int64(1 << 40)
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_bench(t: pa.Table) -> pa.Table:
        sub = t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 97), 97),
                ),
                0,
            )
        )
        return sub.set_column(
            sub.schema.get_field_index("doc_id"),
            "doc_id",
            pc.add(sub["doc_id"], pa.scalar(int(off), pa.int64())),
        )

    union = docs.union(docs.map_batches(to_bench, batch_format="pyarrow"))
    pairs = jaccard_verify_buckets(union, "text", "doc_id", threshold=0.5)

    def cross_only(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        a_b, b_b = a >= off, b >= off
        keep = a_b != b_b
        corpus_id = np.where(a_b, b, a)[keep]
        return pa.table(
            {
                "doc_id": pa.array(corpus_id, pa.int64()),
                "jaccard": pa.array(j[keep], pa.float64()),
            }
        )

    return (
        pairs.map_batches(cross_only, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Max("jaccard"))
        .map_batches(
            lambda t: t.rename_columns(["doc_id", "jaccard_max"]),
            batch_format="pyarrow",
        )
    )


def q_dsir_resample_docs(sf_dir: str):
    """DSIR importance RESAMPLING — the selection step on top of
    `dsir_weights_docs` (Xie et al. 2023 §2: sample without replacement
    ∝ exp(w) via the Gumbel-max trick). Each doc's selection key is
    w + Gumbel(u), with u derived from the deterministic salted md5 of its
    id — so the 'random' draw is a pure function of the doc id (stable
    under re-runs and partitioning) and replayable in SQL. key_e6 =
    dsir_e6_sum + floor(1e6·(−ln(−ln(u))) + 0.5) stays an exact integer;
    the top-100 cut runs through the shuffle-light top_k stage."""
    from fdpg_query_data_validation_ray.stages.split import _row_hashes
    from fdpg_query_data_validation_ray.stages.topk import top_k

    weights = q_dsir_weights_docs(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        h = _row_hashes(t, "doc_id", "dsirg").astype(np.float64)
        u = (h + 0.5) / 1152921504606846976.0
        g = -np.log(-np.log(u))
        key = t["dsir_e6_sum"].to_numpy(zero_copy_only=False) + np.floor(
            1e6 * g + 0.5
        ).astype(np.int64)
        return t.append_column("key_e6", pa.array(key, pa.int64()))

    keyed = weights.map_batches(add_key, batch_format="pyarrow")
    return top_k(
        keyed, 100, ["key_e6", "doc_id"], descending=[True, False]
    ).select_columns(["doc_id", "dsir_e6_sum", "key_e6"])


def q_shuffle_docs(sf_dir: str):
    """Deterministic global corpus shuffle — the pre-training data-order
    op: every doc gets an exact global position ROW_NUMBER() OVER (ORDER BY
    md5('shuffle|'||doc_id), doc_id). Seeded-hash order is a pure function
    of the ids (stable under re-runs, re-partitioning and corpus growth —
    unlike ds.random_shuffle) and the position assignment runs through the
    range-partitioned exact rank (KLL boundaries → monotone route → exact
    base offsets), so no full materialization anywhere."""
    from fdpg_query_data_validation_ray.stages.split import _row_hashes
    from fdpg_query_data_validation_ray.stages.topk import range_rank

    def add_key(t: pa.Table) -> pa.Table:
        h = _row_hashes(t, "doc_id", "shuffle").astype(np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "h": pa.array(h, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        add_key, batch_format="pyarrow"
    )
    return range_rank(ds, "h", "doc_id", rank_column="pos", n_ranges=16)


def q_pretrain_corpus(sf_dir: str):
    return _pretrain_pipeline(sf_dir, dedup="exact")


def q_pretrain_corpus_fuzzy(sf_dir: str):
    """The pretrain pipeline with the dedup stage swapped for
    MinHash+LSH near-dup keep (stages/cluster.py minhash_dedup_keep) —
    the composition real web corpora run, where byte-exact MD5 dedup
    rarely fires. No SQL oracle (LSH bucketing + connected components are
    not SQL-expressible); correctness via the cross-check test: the fuzzy
    keep-set equals the exact keep-set minus near-dup losers on a
    seeded-clone fixture (tests/test_pii_decontam.py)."""
    return _pretrain_pipeline(sf_dir, dedup="minhash")


def _pretrain_pipeline(sf_dir: str, dedup: str = "exact"):
    """Composed end-to-end pretraining-data pipeline — the flagship LLM
    use case, every stage streaming in ONE lazy Ray pipeline (no driver
    materialization between stages):

        normalize → lang-ID (keep predicted 'en') → Gopher repetition
        filter (rep_top_word_e6 ≤ 160000, ~p95) → dedup keep-first on the
        normalized text (dedup="exact": md5 groupby; dedup="minhash":
        MinHash+LSH near-dup keep) → benchmark decontamination (drop docs
        sharing ≥3 distinct 3-grams with the mod-97 benchmark) → CCNet LM
        filter (bigram LM trained on the mod-17 reference subset; drop
        docs with avg NLL > 3.826 nats ≈ p95, compared as exact integers
        nll_e6_sum ≤ THR·n_bigrams) → PII scrub → pack into 1024-token
        training sequences.

    Each stage is the SAME operator its standalone query exercises; the
    value here is proving they compose — and the whole composition is
    hash-exact against a single DuckDB oracle (one CTE per stage). The PII
    scrub is a structural no-op on this corpus (vocabulary words only) but
    runs for real; token counts are taken from the scrubbed text on both
    sides. Output: (doc_id, seq_id) training-sequence assignments."""
    import ray

    from fdpg_query_data_validation_ray.stages.dedup import exact_dedup
    from fdpg_query_data_validation_ray.stages.pack import pack_sequences
    from fdpg_query_data_validation_ray.stages.text import (
        DecontaminateStage,
        LangIdStage,
        LMScoreStage,
        NormalizeTextStage,
        PIIRedactStage,
        RepetitionStage,
        benchmark_gram_hashes_distributed,
        train_bigram_lm_distributed,
    )

    # Reference sets are built DISTRIBUTIVELY (decontamination benchmark =
    # mod-97 docs, LM train set = mod-17 docs; trunc-division remainder ==
    # SQL % for any sign): filter → the SAME NormalizeTextStage kernels the
    # main pipeline runs (so the gram basis cannot drift) → per-batch
    # partials → bundled combine levels. The driver receives only the
    # vocabulary-bounded model/hash arrays — the reference subsets, which
    # grow with the corpus, never materialize in one process. Two small
    # subset scans instead of the old single driver-side pull.
    def _mod_eq(t, m):
        return pc.equal(
            pc.subtract(
                t["doc_id"], pc.multiply(pc.divide(t["doc_id"], m), m)
            ),
            0,
        )

    def _ref_subset(m):
        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(
                lambda t, m=m: t.filter(_mod_eq(t, m)),
                batch_format="pyarrow",
            )
            .map_batches(NormalizeTextStage("text"), batch_format="pyarrow")
            .select_columns(["text_norm"])
        )

    bench_ref = ray.put(
        benchmark_gram_hashes_distributed(_ref_subset(97), "text_norm", k=3)
    )
    lm_ref = ray.put(train_bigram_lm_distributed(_ref_subset(17), "text_norm"))

    ds = (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(NormalizeTextStage("text"), batch_format="pyarrow")
        .map_batches(LangIdStage("text"), batch_format="pyarrow")
        .map_batches(
            lambda t: t.filter(pc.equal(t["lang_pred"], "en")).select(
                ["doc_id", "text_norm"]
            ),
            batch_format="pyarrow",
        )
        .map_batches(RepetitionStage("text_norm"), batch_format="pyarrow",
                     batch_size=1024)
        .map_batches(
            lambda t: t.filter(
                pc.less_equal(t["rep_top_word_e6"], 160000)
            ).select(["doc_id", "text_norm"]),
            batch_format="pyarrow",
        )
    )
    if dedup == "minhash":
        from fdpg_query_data_validation_ray.stages.cluster import (
            minhash_dedup_keep,
        )

        ds = minhash_dedup_keep(ds, "text_norm", "doc_id")
    else:
        ds = exact_dedup(ds, "text_norm", "doc_id")
    ds = (
        ds.map_batches(
            DecontaminateStage(
                bench=bench_ref, text_column="text_norm", k=3, min_hits=3
            ),
            batch_format="pyarrow",
            batch_size=1024,
        )
        .map_batches(
            lambda t: t.filter(pc.less(t["n_contaminated"], 3)).select(
                ["doc_id", "text_norm"]
            ),
            batch_format="pyarrow",
        )
        .map_batches(LMScoreStage(lm_ref, text_column="text_norm"),
                     batch_format="pyarrow", batch_size=1024)
        .map_batches(
            # exact integer compare: avg NLL <= 3.826 nats; n_bigrams == 0
            # docs trivially pass (0 <= 0)
            lambda t: t.filter(
                pc.less_equal(
                    t["nll_e6_sum"],
                    pc.multiply(
                        t["n_bigrams"], pa.scalar(3_826_000, pa.int64())
                    ),
                )
            ).select(["doc_id", "text_norm"]),
            batch_format="pyarrow",
        )
        .map_batches(PIIRedactStage("text_norm"), batch_format="pyarrow")
        .map_batches(
            # tokens = 1 + len(text)//4; lengths are non-negative so Arrow's
            # trunc divide == SQL's floor //
            lambda t: pa.table(
                {
                    "doc_id": t["doc_id"].combine_chunks(),
                    "tokens": pc.add(
                        pc.divide(
                            pc.cast(
                                pc.utf8_length(t["text_redacted"]), pa.int64()
                            ),
                            4,
                        ),
                        1,
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    return pack_sequences(ds, "doc_id", "tokens", budget=1024, n_ranges=64)


def q_mixture_docs(sf_dir: str):
    """Weighted corpus mixture (pretraining data mixing, stages/split.py):
    all English docs (rate 1.0) + a deterministic 25% of the rest. Single
    pass: mixture_rules tags each row with its first matching rule and
    applies the per-source hash threshold in ONE map_batches — the input is
    scanned once (the old two-filtered-views union scanned it per source).
    Oracle unchanged: UNION ALL of the two md5-predicate selects."""
    from fdpg_query_data_validation_ray.stages.split import mixture_rules

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = mixture_rules(
        ds,
        "doc_id",
        [
            ("en", lambda t: pc.equal(t["lang"], "en"), 1.0),
            ("rest", None, 0.25),
        ],
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "lang", "source"]).cast(
            pa.schema(
                [("doc_id", pa.int64()), ("lang", pa.string()), ("source", pa.string())]
            )
        ),
        batch_format="pyarrow",
    )


def q_tfidf_topk_docs(sf_dir: str):
    """Top-3 TF-IDF terms per document (stages/text.py TfIdfStage). The
    document-frequency table is built DISTRIBUTIVELY (per-batch distinct
    (doc, term) partials → bundled combine → stream-compacted driver merge
    — `doc_frequency_distributed`, the LM-builder plan), ray.put once, and
    the scoring stage adds no exchange: the top-k cut is per-document
    inside each batch. Hash-exact oracle: the same md5-low60 term identity,
    ln(n/df) idf and ROW_NUMBER tie-break replayed in SQL."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        TfIdfStage,
        doc_frequency_distributed,
    )

    df_state = doc_frequency_distributed(
        _read(sf_dir, "documents", ["text"]), "text"
    )
    df_ref = ray.put(df_state)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        TfIdfStage(df_ref, k_top=3, text_column="text", id_column="doc_id"),
        batch_format="pyarrow",
        # coalesce the reader's small blocks (same rationale as decontaminate)
        batch_size=1024,
    )


def q_kmeans_embeddings(sf_dir: str):
    """Distributed spherical k-means (stages/similarity.py
    kmeans_fit_distributed — the iterative broadcast-reduce operator class)
    over the embeddings table, then label every vector with its cluster.
    No SQL oracle (iterative, non-SQL-expressible); tests/test_kmeans.py
    pins bit-parity with a single-process reference, batching invariance,
    the non-decreasing objective, and the IVF integration recall bar."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        kmeans_assign,
        kmeans_fit_distributed,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, _counts, _hist = kmeans_fit_distributed(
        ds, n_clusters=8, dim=64, vec_column="embedding", iters=5
    )
    return kmeans_assign(ds, cents, "embedding", "vec_id")


def q_embedding_gram(sf_dir: str):
    """Distributed second-moment (Gram) matrix over the embeddings table —
    the covariance step of PCA/whitening as an oracle-checkable aggregate
    (stages/similarity.py embedding_gram_matrix). Each batch contributes
    one d×d integer matmul over e3-quantized vectors; the O(d²) partials
    stream-reduce, so the result is exact under any batching. Output: the
    1-based upper triangle (dim_i, dim_j, sum_q2) plus a (0, 0, n_vectors)
    sentinel row."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        embedding_gram_matrix,
    )

    return embedding_gram_matrix(
        _read(sf_dir, "embeddings", ["embedding"]), "embedding"
    )


def q_semdedup_embeddings(sf_dir: str):
    """SemDeDup semantic deduplication (stages/similarity.py semdedup —
    Abbas et al. 2023): distributed k-means over the embeddings, then each
    cluster drops all but the lowest-centroid-similarity member of every
    quantized-cosine≥θ duplicate component. Output: the full decision
    table (vec_id, cluster, sim_e6, keep, rep_id). No SQL oracle (k-means
    is iterative/non-SQL); tests/test_semdedup.py pins planted-clone
    recovery, the keep rule, partition invariance, and the banded-window
    fallback."""
    from fdpg_query_data_validation_ray.stages.similarity import semdedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(
        ds, n_clusters=8, dim=64, threshold=0.95, iters=4
    )


INCR_CUTOFF = "1997-01-01"


def q_incremental_new_lineitem(sf_dir: str):
    """Incremental-ingestion primitive (stages/incremental.py): lineitems
    shipped on/after the snapshot cutoff whose (l_partkey, l_suppkey) pair
    never shipped BEFORE the cutoff — "process only records whose key is
    new since the last crawl". Bloom-sieve plan: partial blooms over the
    seen side fan-in off-driver and broadcast once; bloom MISSES stream
    through as definitely-new; the maybe-seen sliver is resolved EXACTLY by
    a value intersect against the seen side. Zero shuffles, 2 passes per
    side, driver state budget-guarded with a distributed anti-join+native-
    join fallback. Reference analog: the paged fetch restarts from offset 0
    every run (data_quality_check/flare_cohort/download.py:24-58) — this is
    the record-level resume that avoids that rescan."""
    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    cutoff = pa.scalar(np.datetime64(INCR_CUTOFF, "us"))
    cols = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_shipdate"]
    # n_seen sized from the UNFILTERED parquet metadata count (upper bound —
    # oversizing the bloom only lowers its fp rate); avoids an extra
    # filtered pass just to size the filter
    n_total = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    base = _read(sf_dir, "lineitem", cols)
    seen = base.map_batches(
        lambda t: t.filter(pc.less(t["l_shipdate"], cutoff)).select(
            ["l_partkey", "l_suppkey"]
        ),
        batch_format="pyarrow",
    )
    incoming = base.map_batches(
        lambda t: t.filter(pc.greater_equal(t["l_shipdate"], cutoff)).select(
            ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
        ),
        batch_format="pyarrow",
    )
    return filter_new_keys(
        incoming, seen, ["l_partkey", "l_suppkey"], n_seen_hint=n_total
    )


def q_inverted_index_terms(sf_dir: str):
    """Inverted-index build (the search-engine core): term → document
    frequency + capped posting list (first 5 doc_ids ascending,
    comma-joined), for mid-band terms (3 ≤ df ≤ 100 — stopwords and
    hapaxes excluded). Tokenize with within-batch (term, doc) dedup as
    the combiner, ONE term-hash exchange co-locates each term's postings,
    per-part kernels sort once and emit df + the capped list. Postings
    are strings so the DuckDB string_agg oracle is byte-exact."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()
    DF_MIN, DF_MAX, CAP = 2, 100_000, 5

    def route(t: pa.Table) -> pa.Table:
        m = pc.is_valid(t["doc_id"])
        t = t.filter(m)
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()), ""))
        wl = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(wl)
        par = pc.list_parent_indices(wl)
        doc = pc.take(t["doc_id"].combine_chunks(), par)
        keep = pc.not_equal(flat, "")
        pairs = pa.table(
            {"term": pc.filter(flat, keep), "doc_id": pc.filter(doc, keep)}
        ).group_by(["term", "doc_id"]).aggregate([])
        part = pa.array(
            (hash64(pairs["term"]) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pairs.append_column("part", part)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"term": pd.Series(dtype="object"),
                 "df": pd.Series(dtype="int64"),
                 "postings": pd.Series(dtype="object")}
            )
        g = g[["term", "doc_id"]].drop_duplicates()
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        sizes = g.groupby("term", sort=False).size()
        ok_terms = sizes[(sizes >= DF_MIN) & (sizes <= DF_MAX)]
        g = g[g["term"].isin(ok_terms.index)]
        if len(g) == 0:
            return pd.DataFrame(
                {"term": pd.Series(dtype="object"),
                 "df": pd.Series(dtype="int64"),
                 "postings": pd.Series(dtype="object")}
            )
        capped = g[g.groupby("term", sort=False).cumcount() < CAP]
        posts = capped.groupby("term", sort=False)["doc_id"].agg(
            lambda s: ",".join(str(v) for v in s)
        )
        out = pd.DataFrame(
            {
                "term": posts.index,
                "df": ok_terms.reindex(posts.index).astype("int64").to_numpy(),
                "postings": posts.to_numpy(),
            }
        )
        return out.reset_index(drop=True)

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(route, batch_format="pyarrow", batch_size=2048)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def q_lang_confusion_docs(sf_dir: str):
    """Language-ID confusion matrix: declared lang × predicted lang with
    counts — the calibration table that decides whether the classifier is
    trustworthy enough to route filtering. Reuses LangIdStage verbatim,
    adds a per-batch count combiner and one tiny groupby; hash-exact
    against the lang-ID oracle wrapped in a GROUP BY."""
    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.text import LangIdStage

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        return t.select(["lang", "lang_pred"]).group_by(
            ["lang", "lang_pred"]
        ).aggregate([([], "count_all")])

    return (
        ds.map_batches(LangIdStage(), batch_format="pyarrow", batch_size=1024)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("count_all", alias_name="n_docs"))
    )


def q_events_hourly_anomaly(sf_dir: str):
    """Hour-over-hour spike detection — the freshness/rate alert every
    ingestion pipeline runs: per (event_type, hour) counts, compare each
    hour to the type's PREVIOUS observed hour (LAG), flag > 2× jumps.
    Per-batch count combiner → one small groupby → the LAG/flag pass runs
    on the bounded (types × hours) axis at the driver (the
    new_users_hourly precondition). First observed hour of a type has no
    baseline: prev_n NULL, is_spike false."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_type"]))
        t = t.filter(m)
        g = pa.table(
            {
                "event_type": t["event_type"].combine_chunks(),
                "hour": pc.floor_temporal(t["ts"].combine_chunks(), unit="hour"),
            }
        ).group_by(["event_type", "hour"]).aggregate([([], "count_all")])
        return g

    hourly = (
        _read(sf_dir, "events", ["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("count_all", alias_name="n_events"))
    )
    h = hourly.to_pandas().sort_values(["event_type", "hour"]).reset_index(
        drop=True
    )
    prev = h.groupby("event_type", sort=False)["n_events"].shift(1)
    h["prev_n"] = prev.astype("Int64")
    h["is_spike"] = (h["n_events"] > 2 * prev).fillna(False).astype(bool)
    h["n_events"] = h["n_events"].astype("int64")
    return pa.Table.from_pandas(
        h[["event_type", "hour", "n_events", "prev_n", "is_spike"]],
        preserve_index=False,
    ).cast(
        pa.schema(
            [("event_type", pa.string()), ("hour", pa.timestamp("us")),
             ("n_events", pa.int64()), ("prev_n", pa.int64()),
             ("is_spike", pa.bool_())]
        )
    )


def q_chunk_pairs_docs(sf_dir: str):
    """Adjacent-chunk training-pair construction (NSP / contrastive
    next-segment pairs): disjoint 32-token chunks per doc (ChunkStage with
    stride == window) paired (i, i+1) within the doc — text_a precedes
    text_b, the positive-pair generator self-supervised objectives feed
    on. The pairing is a vectorized shift INSIDE the same map_batches
    call that chunked the doc (a doc's chunks never span batches), so
    the whole query is one stateless, exchange-free pass."""
    import pandas as pd

    from fdpg_query_data_validation_ray.stages.text import ChunkStage

    st = ChunkStage(window=32, stride=32)

    def pairs(t: pa.Table) -> pd.DataFrame:
        c = st(t).to_pandas()
        c = c.sort_values(["doc_id", "chunk_id"], kind="mergesort").reset_index(
            drop=True
        )
        if len(c) == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"),
                 "pair_id": pd.Series(dtype="int64"),
                 "text_a": pd.Series(dtype="object"),
                 "text_b": pd.Series(dtype="object")}
            )
        # ChunkStage emits chunks in (doc_id, chunk_id) order: shift by one
        nxt_doc = c["doc_id"].shift(-1)
        nxt_text = c["chunk_text"].shift(-1)
        keep = (nxt_doc == c["doc_id"]).to_numpy()
        out = pd.DataFrame(
            {
                "doc_id": c["doc_id"].to_numpy()[keep],
                "pair_id": c["chunk_id"].to_numpy()[keep],
                "text_a": c["chunk_text"].to_numpy()[keep],
                "text_b": nxt_text.to_numpy()[keep],
            }
        )
        out["doc_id"] = out["doc_id"].astype("int64")
        out["pair_id"] = out["pair_id"].astype("int64")
        return out

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        pairs, batch_format="pyarrow", batch_size=2048
    )


def q_revenue_by_nation(sf_dir: str):
    """Star join across three fact/dim hops (TPC-H Q5 shape): revenue per
    customer nation = customer ⋈ orders ⋈ lineitem ⋈ nation. Two
    co-partitioned exchanges on DIFFERENT keys — custkey first (orders
    pick up the customer's nation), orderkey second (lineitem revenue
    partials meet the order's nation) — each kernel pre-aggregates per
    nation before emitting, so exchange 2's output is parts × nations
    rows; the 25-row nation dim is a closure broadcast. Revenue is the
    exact e4 fixed-point (cents × (100 − disc_cents))."""
    import pandas as pd

    import pyarrow.parquet as pq

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    name_of = dict(
        zip(nation["n_nationkey"].to_pylist(), nation["n_name"].to_pylist())
    )

    # ---- exchange 1 (by custkey): orders meet customer nationkey --------
    def cust_rows(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(len(k), np.int8)),
                "a": k,
                "b": pc.cast(t["c_nationkey"], pa.int64()).combine_chunks(),
            }
        )

    def order_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["o_custkey"]))
        k = t["o_custkey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(len(k), np.int8)),
                "a": k,
                "b": t["o_orderkey"].combine_chunks(),
            }
        )

    def join1(g: pd.DataFrame) -> pd.DataFrame:
        cust = g[g["kind"] == 1]
        orders = g[g["kind"] == 0]
        if len(cust) == 0 or len(orders) == 0:
            return pd.DataFrame({"okey": pd.Series(dtype="int64"),
                                 "nkey": pd.Series(dtype="int64")})
        nk = pd.Series(cust["b"].to_numpy(), index=cust["a"].to_numpy())
        got = orders["a"].map(nk)
        keep = got.notna().to_numpy()
        return pd.DataFrame(
            {"okey": orders["b"].to_numpy()[keep],
             "nkey": got.to_numpy()[keep].astype("int64")}
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        cust_rows, batch_format="pyarrow", batch_size=65536
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        order_rows, batch_format="pyarrow", batch_size=65536
    )
    order_nation = (
        cust.union(orders).groupby("part").map_groups(join1, batch_format="pandas")
    )

    # ---- exchange 2 (by orderkey): lineitem revenue meets order nation ---
    def on_rows(t: pa.Table) -> pa.Table:
        k = t["okey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(len(k), np.int8)),
                "a": k,
                "b": t["nkey"].combine_chunks(),
            }
        )

    def li_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["l_orderkey"]))
        rev = pc.multiply(
            _cents(t["l_extendedprice"]),
            pc.subtract(pa.scalar(100, pa.int64()), _cents(t["l_discount"])),
        )
        g = pa.table(
            {"okey": t["l_orderkey"].combine_chunks(), "rev": rev}
        ).group_by("okey").aggregate([("rev", "sum")])
        k = g["okey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(len(k), np.int8)),
                "a": k,
                "b": g["rev_sum"].combine_chunks(),
            }
        )

    def join2(g: pd.DataFrame) -> pd.DataFrame:
        on = g[g["kind"] == 1]
        li = g[g["kind"] == 0]
        if len(on) == 0 or len(li) == 0:
            return pd.DataFrame({"nkey": pd.Series(dtype="int64"),
                                 "revenue_e4": pd.Series(dtype="int64")})
        nk = pd.Series(on["b"].to_numpy(), index=on["a"].to_numpy())
        got = li["a"].map(nk)
        keep = got.notna().to_numpy()
        d = pd.DataFrame(
            {"nkey": got.to_numpy()[keep].astype("int64"),
             "rev": li["b"].to_numpy()[keep]}
        )
        out = d.groupby("nkey", sort=False)["rev"].sum().reset_index(
            name="revenue_e4"
        )
        out["revenue_e4"] = out["revenue_e4"].astype("int64")
        return out

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_rows, batch_format="pyarrow", batch_size=65536)
    on = order_nation.map_batches(on_rows, batch_format="pyarrow")
    per_nation = (
        on.union(li)
        .groupby("part")
        .map_groups(join2, batch_format="pandas")
        .groupby("nkey")
        .aggregate(Sum("revenue_e4", alias_name="revenue_e4"))
    )

    def finish(t: pa.Table) -> pa.Table:
        names = pa.array(
            [name_of.get(k) for k in t["nkey"].to_pylist()], pa.string()
        )
        return pa.table(
            {"n_name": names,
             "revenue_e4": pc.cast(t["revenue_e4"], pa.int64()).combine_chunks()}
        )

    return per_nation.map_batches(finish, batch_format="pyarrow")


def q_token_budget_docs(sf_dir: str):
    """Token-budget corpus mixing: per language, keep the deterministic
    (salted-hash-ordered) prefix of documents whose running character
    total stays ≤ 20,000 — 'give me N tokens of each language', the
    budgeted sampling step real mixture builders run. Distributed per-key
    prefix sum with budget pruning (stages/sampling.budget_take_per_key):
    rows beyond the budget horizon never enter the exchange, so a 1%
    budget moves ~1% of the corpus. Hash-exact vs the windowed-SUM
    oracle (same salted md5 ordering, doc_id tiebreak)."""
    from fdpg_query_data_validation_ray.stages.sampling import budget_take_per_key
    from fdpg_query_data_validation_ray.stages.split import _row_hashes

    BUDGET = 20_000

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["lang"]), pc.is_valid(t["doc_id"])),
            pc.is_valid(t["n_chars"]),
        )
        t = t.filter(m)
        h = _row_hashes(t, "doc_id", "budget").astype(np.int64)
        return t.append_column("h", pa.array(h, pa.int64()))

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]).map_batches(
        prep, batch_format="pyarrow", batch_size=8192
    )
    out = budget_take_per_key(
        ds, key_column="lang", cost_column="n_chars", order_column="h",
        budget=BUDGET, tiebreak_column="doc_id",
    )
    schema = pa.schema(
        [("lang", pa.string()), ("doc_id", pa.int64()),
         ("n_chars", pa.int64()), ("cum_n_chars", pa.int64())]
    )
    return out.map_batches(
        lambda t: t.select(["lang", "doc_id", "n_chars", "cum_n_chars"]).cast(
            schema
        ),
        batch_format="pyarrow",
    )


def q_order_reconciliation(sf_dir: str):
    """Cross-table reconciliation check — the ledger-vs-detail audit every
    warehouse runs: order header totals vs the SUM of their lineitems,
    rolled up per order status (n_orders, n_mismatched, total absolute
    drift in cents). One orderkey-hash exchange: lineitem sum partials
    (combiner) and header rows co-partition; per-part kernels diff and
    pre-aggregate per status, so the final groupby sees parts × statuses
    rows. Headers with NO lineitems count as fully mismatched (the
    LEFT-join semantics); orphan lineitems are the FK family's job."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def li_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["l_orderkey"]))
        cents = _cents(t["l_extendedprice"])
        g = pa.table(
            {"okey": t["l_orderkey"].combine_chunks(), "cents": cents}
        ).group_by("okey").aggregate([("cents", "sum")])
        k = g["okey"].combine_chunks()
        n = len(k)
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(n, np.int8)),
                "okey": k,
                "status": pa.array([""] * n, pa.string()),
                "cents": g["cents_sum"].combine_chunks(),
            }
        )

    def order_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].combine_chunks()
        n = len(k)
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(n, np.int8)),
                "okey": k,
                "status": t["o_orderstatus"].combine_chunks(),
                "cents": _cents(t["o_totalprice"]),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        hdr = g[g["kind"] == 1]
        if len(hdr) == 0:
            return pd.DataFrame(
                {"o_orderstatus": pd.Series(dtype="object"),
                 "n_orders": pd.Series(dtype="int64"),
                 "n_mismatched": pd.Series(dtype="int64"),
                 "sum_abs_diff_cents": pd.Series(dtype="int64")}
            )
        items = g[g["kind"] == 0].groupby("okey", sort=False)["cents"].sum()
        got = hdr["okey"].map(items).fillna(0).astype("int64").to_numpy()
        diff = hdr["cents"].to_numpy() - got
        d = pd.DataFrame(
            {
                "o_orderstatus": hdr["status"].to_numpy(),
                "mism": (diff != 0).astype("int64"),
                "absd": np.abs(diff),
            }
        )
        out = d.groupby("o_orderstatus", sort=False).agg(
            n_orders=("mism", "size"),
            n_mismatched=("mism", "sum"),
            sum_abs_diff_cents=("absd", "sum"),
        ).reset_index()
        for c in ("n_orders", "n_mismatched", "sum_abs_diff_cents"):
            out[c] = out[c].astype("int64")
        return out

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        li_partials, batch_format="pyarrow", batch_size=65536
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
    ).map_batches(order_rows, batch_format="pyarrow", batch_size=65536)
    return (
        li.union(orders)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("o_orderstatus")
        .aggregate(
            Sum("n_orders", alias_name="n_orders"),
            Sum("n_mismatched", alias_name="n_mismatched"),
            Sum("sum_abs_diff_cents", alias_name="sum_abs_diff_cents"),
        )
    )


def q_multimodal_phash_dups(sf_dir: str):
    """Image dedup by perceptual hash: deterministic BMP payloads (every
    4th doc reuses one of 40 shared images — the clone population), 64-bit
    aHash per image (stages/multimodal.PerceptualHashStage), then the
    exact-dup group machinery on the hash alone — the payload never enters
    the exchange. Rows-only by design (no SQL BMP codec); pinned by a
    brute-force cross-check test (tests/test_phash.py)."""
    from fdpg_query_data_validation_ray.stages.multimodal import (
        PerceptualHashStage,
        encode_bmp_gray,
    )
    from fdpg_query_data_validation_ray.stages.unique import duplicate_keys

    ds = _read(sf_dir, "documents", ["doc_id"])

    def attach_payload(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            i = int(i)
            seed = i % 40 if i % 4 == 0 else i
            rng = np.random.default_rng(seed)
            w, h = 8 + seed % 24, 8 + seed % 16
            payloads.append(
                encode_bmp_gray(rng.integers(0, 256, (h, w), dtype=np.uint8))
            )
        return t.append_column("payload", pa.array(payloads, pa.binary()))

    hashed = (
        ds.map_batches(attach_payload, batch_format="pyarrow", batch_size=256)
        .map_batches(
            PerceptualHashStage("payload"),
            batch_format="pyarrow",
            batch_size=256,
        )
        .select_columns(["doc_id", "phash"])  # payload-free from here on
    )
    return duplicate_keys(hashed, ["phash"])


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER aggregate join: order count per customer INCLUDING
    zero-order customers — the outer-join leg next to the inner native
    join (segment_order_totals) and the anti-join (fk family). One
    exchange: per-batch order-count partials (≈10× combiner compression
    — orders per customer ≫ 1) and customer rows union into the same
    custkey-hash parts; each part left-merges and zero-fills. No
    broadcast (the dim is data-sized), no native shuffle join."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def order_partials(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["o_custkey"]))
        agg = t.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        k = agg["o_custkey"].combine_chunks()
        n = len(k)
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(n, np.int8)),
                "custkey": k,
                "seg": pa.array([""] * n, pa.string()),
                "n": pc.cast(agg["count_all"], pa.int64()).combine_chunks(),
            }
        )

    def customer_rows(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].combine_chunks()
        n = len(k)
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(n, np.int8)),
                "custkey": k,
                "seg": t["c_mktsegment"].combine_chunks(),
                "n": pa.array(np.zeros(n, np.int64)),
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        cust = g[g["kind"] == 1]
        if len(cust) == 0:
            return pd.DataFrame(
                {"c_custkey": pd.Series(dtype="int64"),
                 "c_mktsegment": pd.Series(dtype="object"),
                 "n_orders": pd.Series(dtype="int64")}
            )
        counts = g[g["kind"] == 0].groupby("custkey", sort=False)["n"].sum()
        out = pd.DataFrame(
            {
                "c_custkey": cust["custkey"].to_numpy(),
                "c_mktsegment": cust["seg"].to_numpy(),
                "n_orders": cust["custkey"].map(counts).fillna(0).astype("int64").to_numpy(),
            }
        )
        return out

    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        order_partials, batch_format="pyarrow", batch_size=65536
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        customer_rows, batch_format="pyarrow", batch_size=65536
    )
    return (
        orders.union(cust)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def q_active_users_24h(sf_dir: str):
    """Rolling 24-hour distinct users per hour (the DAU-style freshness
    metric) — exact windowed COUNT DISTINCT without per-window state:
    distinct (user, hour) pairs resolve inside user-hash parts, each pair
    fans out to the ≤24 window-hours it serves, the fan-out dedups per
    (user, window-hour) INSIDE the same part (a user's pairs co-locate),
    and parts emit (hour, partial count) rows. ONE data-sized exchange;
    window hours outside the data's hour set are dropped against a
    broadcast of the (bounded) hour axis."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()
    W = 24

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    # bounded hour axis (one value per calendar hour with data) — tiny;
    # computed with a per-batch unique combiner and broadcast via closure
    hours_present = np.unique(
        np.concatenate(
            [
                b["h"].to_numpy(zero_copy_only=False)
                for b in ds.map_batches(
                    lambda t: pa.table(
                        {
                            "h": pc.unique(
                                pc.floor_temporal(
                                    pc.drop_null(t["ts"].combine_chunks()),
                                    unit="hour",
                                )
                            )
                        }
                    ),
                    batch_format="pyarrow",
                ).iter_batches(batch_format="pyarrow")
            ]
        )
    )

    def route(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"]))
        t = t.filter(m)
        u = t["user_id"].combine_chunks()
        h = pc.floor_temporal(t["ts"].combine_chunks(), unit="hour")
        pairs = pa.table({"user_id": u, "h": h}).group_by(
            ["user_id", "h"]
        ).aggregate([])  # within-batch distinct: free compression
        part = pa.array(
            (hash64(pairs["user_id"]) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pairs.append_column("part", part)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"hour": pd.Series(dtype="datetime64[us]"),
                                 "n": pd.Series(dtype="int64")})
        g = g[["user_id", "h"]].drop_duplicates()
        u = np.repeat(g["user_id"].to_numpy(), W)
        wh = (
            np.repeat(g["h"].to_numpy(), W)
            + np.tile(np.arange(W) * np.timedelta64(1, "h"), len(g))
        )
        keep = np.isin(wh, hours_present)
        d = pd.DataFrame({"user_id": u[keep], "hour": wh[keep]})
        d = d.drop_duplicates()
        out = d.groupby("hour", sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    partials = (
        ds.map_batches(route, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )
    # final combine over the BOUNDED hour axis (≤ parts × hours rows) at
    # the driver — Ray's native sort-based groupby on a timestamp key
    # measured 17 s on 46k partial rows for this query, vs milliseconds
    # here; same bounded-axis precondition as new_users_hourly
    h = partials.to_pandas().groupby("hour", sort=True)["n"].sum().reset_index(
        name="n_active_users"
    )
    h["n_active_users"] = h["n_active_users"].astype("int64")
    return pa.Table.from_pandas(h, preserve_index=False).cast(
        pa.schema([("hour", pa.timestamp("us")), ("n_active_users", pa.int64())])
    )


def q_user_event_paths(sf_dir: str):
    """Ordered group-concat: each user's first-8 event types by (ts,
    event_id), '>'-joined — the 'behavior path' string feature behavioral
    models train on (and SQL's string_agg(... ORDER BY) with a window
    cap). One user-hash exchange; per part: one sort, cumcount cap, one
    C-level join aggregation. event_id tiebreak makes the path total-
    ordered, so the string is byte-exact vs the ROW_NUMBER oracle."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()
    CAP = 8

    def route(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"])),
            pc.is_valid(t["event_type"]),
        )
        t = t.filter(m)
        u = t["user_id"].combine_chunks()
        part = pa.array((hash64(u) & np.uint64(n_parts - 1)).astype(np.int32))
        return pa.table(
            {
                "user_id": u,
                "ts": t["ts"].combine_chunks(),
                "event_id": t["event_id"].combine_chunks(),
                "event_type": t["event_type"].combine_chunks(),
                "part": part,
            }
        )

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"user_id": pd.Series(dtype="int64"),
                 "path": pd.Series(dtype="object"),
                 "n_path_events": pd.Series(dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = g[g.groupby("user_id", sort=False).cumcount() < CAP]
        agg = g.groupby("user_id", sort=False)["event_type"].agg(
            path=">".join, n_path_events="size"
        )
        out = agg.reset_index()
        out["n_path_events"] = out["n_path_events"].astype("int64")
        return out[["user_id", "path", "n_path_events"]]

    return (
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
        .map_batches(route, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )


def q_copurchase_suppliers(sf_dir: str):
    """Market-basket co-occurrence: supplier pairs appearing in the same
    order, top-50 by shared-order count — the 'bought together' bipartite
    projection. Pair explosion happens INSIDE order-hash parts (all lines
    of an order co-locate; blow-up bounded by order size², never by data
    volume), per-part pair counts are the combiner, one small groupby
    sums, distributed top-k caps the result."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts
    from fdpg_query_data_validation_ray.stages.topk import top_k

    n_parts = _verify_parts()

    def route(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["l_orderkey"]), pc.is_valid(t["l_suppkey"]))
        t = t.filter(m)
        o = t["l_orderkey"].combine_chunks()
        part = pa.array((hash64(o) & np.uint64(n_parts - 1)).astype(np.int32))
        return pa.table(
            {"order": o, "supp": t["l_suppkey"].combine_chunks(), "part": part}
        )

    _PAIR_EMPTY = {"supp_a": pd.Series(dtype="int64"),
                   "supp_b": pd.Series(dtype="int64"),
                   "n": pd.Series(dtype="int64")}

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(dict(_PAIR_EMPTY, part2=pd.Series(dtype="int32")))
        s = g[["order", "supp"]].drop_duplicates()
        m = s.merge(s, on="order", suffixes=("_a", "_b"))
        m = m[m["supp_a"] < m["supp_b"]]
        out = (
            m.groupby(["supp_a", "supp_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype("int64")
        # route the partial counts by pair hash for the second exchange —
        # Ray's native multi-key groupby is the measured slow path (45 s on
        # 95k partial rows vs 0.5 s for the coarse-part kernel; NOTES.md
        # combiner-compression lesson), so the sum rides a part2 exchange
        pk = hash64(out["supp_a"].to_numpy() * np.int64(1_000_003)
                    + out["supp_b"].to_numpy())
        out["part2"] = (pk & np.uint64(n_parts - 1)).astype(np.int32)
        return out

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"supp_a": pd.Series(dtype="int64"),
                 "supp_b": pd.Series(dtype="int64"),
                 "n_orders": pd.Series(dtype="int64")}
            )
        out = (
            g.groupby(["supp_a", "supp_b"], sort=False)["n"]
            .sum()
            .reset_index(name="n_orders")
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        return out

    counts = (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        .map_batches(route, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("part2")
        .map_groups(sum_pairs, batch_format="pandas")
    )
    return top_k(
        counts, 50, ["n_orders", "supp_a", "supp_b"],
        descending=[True, False, False],
    )


def q_pagerank_lineitem(sf_dir: str):
    """Fixed-point PageRank (3 iterations, damping 0.85, rank scaled e9)
    over the symmetric order↔supplier bipartite graph from lineitem —
    node id = 2·orderkey for orders, 2·suppkey+1 for suppliers; parallel
    edges (one per lineitem) honored. Iterative BSP join+aggregate on
    Ray Data (stages/graph.py): two co-partitioned exchanges per
    iteration, all-int64 arithmetic → hash-exact against the DuckDB
    oracle that unrolls the same three iterations as CTEs."""
    from fdpg_query_data_validation_ray.stages.graph import pagerank_int

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def mk_edges(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["l_orderkey"]), pc.is_valid(t["l_suppkey"]))
        t = t.filter(m)
        o = pc.multiply(t["l_orderkey"], pa.scalar(2, pa.int64()))
        s = pc.add(
            pc.multiply(t["l_suppkey"], pa.scalar(2, pa.int64())),
            pa.scalar(1, pa.int64()),
        )
        on = o.combine_chunks().to_numpy(zero_copy_only=False)
        sn = s.combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": np.concatenate([on, sn]),
                "dst": np.concatenate([sn, on]),
            }
        )

    edges = ds.map_batches(mk_edges, batch_format="pyarrow", batch_size=65536)
    return pagerank_int(edges, iters=3)


def q_compression_ratio_docs(sf_dir: str):
    """zlib compression-ratio quality signal (entropy proxy) per document —
    rows-only by design: no SQL deflate exists. Task-based map_batches (the
    stage holds no state beyond the zlib binding); correctness pinned by
    tests/test_compression_ratio.py property tests."""
    from fdpg_query_data_validation_ray.stages.text import CompressionRatioStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        CompressionRatioStage("text"), batch_format="pyarrow", batch_size=2048
    ).select_columns(
        ["doc_id", "n_bytes", "n_bytes_zlib", "compression_ratio_e6"]
    )


def q_k_anonymity_docs(sf_dir: str):
    """k-anonymity audit over quasi-identifiers (lang, source, length
    bucket): groups with fewer than k=5 members are re-identification
    risks a privacy review must surface before release. Per-batch combiner
    partials → one small groupby → HAVING filter; the exchange moves group
    partials, never documents."""
    from ray.data.aggregate import Sum

    K = 5

    def partial(t: pa.Table) -> pa.Table:
        b = pc.if_else(
            pc.is_valid(t["n_chars"]),
            pc.divide(pc.fill_null(t["n_chars"], 0), pa.scalar(50, pa.int64())),
            pa.scalar(None, pa.int64()),
        )
        t = pa.table(
            {
                "lang": t["lang"].combine_chunks(),
                "source": t["source"].combine_chunks(),
                "nchars_bucket": b,
            }
        )
        return t.group_by(["lang", "source", "nchars_bucket"]).aggregate(
            [([], "count_all")]
        )

    agg = (
        _read(sf_dir, "documents", ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["lang", "source", "nchars_bucket"])
        .aggregate(Sum("count_all", alias_name="n_rows"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.less(t["n_rows"], K)), batch_format="pyarrow"
    )


def q_vocab_overlap_langs(sf_dir: str):
    """Pairwise vocabulary Jaccard between languages — the set-similarity
    JOIN between groups ('how much does the es vocabulary overlap en?').
    ONE token-sized exchange: tokenize per batch, within-batch (lang, term)
    dedup as the combiner, route by hash(term) so every occurrence of a
    term co-locates; each part emits exact per-term lang-pair partials AND
    per-lang distinct-size partials in the same kernel; one tiny groupby
    sums both row kinds, and the |langs|² assembly (jaccard_e6 integer
    math) runs on the bounded result. No term ever crosses parts twice and
    no lang×lang shuffle join exists anywhere."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def route(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["lang"]))
        txt = pc.utf8_lower(pc.fill_null(pc.cast(t["text"], pa.string()), ""))
        wl = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(wl)
        par = pc.list_parent_indices(wl)
        lang = pc.take(t["lang"].combine_chunks(), par)
        keep = pc.not_equal(flat, "")
        pairs = pa.table(
            {"lang": pc.filter(lang, keep), "term": pc.filter(flat, keep)}
        )
        # combiner: set semantics → within-batch dedup is free compression
        pairs = pairs.group_by(["lang", "term"]).aggregate([])
        part = pa.array(
            (hash64(pairs["term"]) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pairs.append_column("part", part)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        out_schema = {"lang_a": pd.Series(dtype="object"),
                      "lang_b": pd.Series(dtype="object"),
                      "n": pd.Series(dtype="int64")}
        if len(g) == 0:
            return pd.DataFrame(out_schema)
        g = g[["lang", "term"]].drop_duplicates()
        sizes = g.groupby("lang", sort=False).size().reset_index(name="n")
        sizes = sizes.rename(columns={"lang": "lang_a"})
        sizes["lang_b"] = ""  # sentinel: per-lang distinct-size rows
        m = g.merge(g, on="term", suffixes=("_a", "_b"))
        m = m[m["lang_a"] < m["lang_b"]]
        pairs = (
            m.groupby(["lang_a", "lang_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out = pd.concat([sizes[["lang_a", "lang_b", "n"]],
                         pairs[["lang_a", "lang_b", "n"]]], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    agg = (
        _read(sf_dir, "documents", ["lang", "text"])
        .map_batches(route, batch_format="pyarrow", batch_size=2048)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby(["lang_a", "lang_b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # bounded |langs|² assembly
    df = agg.to_pandas()
    sizes = df[df["lang_b"] == ""].set_index("lang_a")["n"]
    pairs = df[df["lang_b"] != ""].copy()
    pairs["n_a"] = pairs["lang_a"].map(sizes).astype("int64")
    pairs["n_b"] = pairs["lang_b"].map(sizes).astype("int64")
    pairs = pairs.rename(columns={"n": "n_common"})
    union = pairs["n_a"] + pairs["n_b"] - pairs["n_common"]
    pairs["jaccard_e6"] = (pairs["n_common"] * 1_000_000 // union).astype("int64")
    pairs = pairs.sort_values(["lang_a", "lang_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        pairs[["lang_a", "lang_b", "n_common", "n_a", "n_b", "jaccard_e6"]],
        preserve_index=False,
    )


def q_new_users_hourly(sf_dir: str):
    """Running DISTINCT users over time — 'new users per hour + cumulative
    total', the growth-analytics staple. Exact without any running-distinct
    state: a user's FIRST event is found per user-hash part (all of a
    user's rows co-locate, so per-part MIN(ts) is the global min), parts
    emit (hour, n_new) partials, one tiny groupby sums them, and the
    cumulative sum runs over the bounded hour axis at the driver (same
    documented bounded-cardinality precondition as stages/topk.global_rank
    — hours grow with calendar time, not data volume)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def route(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"]))
        t = t.filter(m)
        u = t["user_id"].combine_chunks()
        part = pa.array((hash64(u) & np.uint64(n_parts - 1)).astype(np.int32))
        return pa.table({"user_id": u, "ts": t["ts"].combine_chunks(),
                         "part": part})

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"hour": pd.Series(dtype="datetime64[us]"),
                                 "n_new": pd.Series(dtype="int64")})
        first = g.groupby("user_id", sort=False)["ts"].min()
        hours = first.dt.floor("h")
        out = hours.value_counts().rename_axis("hour").reset_index(name="n_new")
        return out[["hour", "n_new"]]

    hourly = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(route, batch_format="pyarrow", batch_size=16384)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("hour")
        .aggregate(Sum("n_new", alias_name="n_new"))
    )
    # bounded axis: one row per hour of calendar time
    h = hourly.to_pandas().sort_values("hour").reset_index(drop=True)
    h["cum_users"] = h["n_new"].cumsum().astype("int64")
    h["n_new"] = h["n_new"].astype("int64")
    return pa.Table.from_pandas(
        h[["hour", "n_new", "cum_users"]], preserve_index=False
    ).cast(pa.schema([("hour", pa.timestamp("us")), ("n_new", pa.int64()),
                      ("cum_users", pa.int64())]))


def q_rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) in ONE fact-table
    exchange: per-batch combiner → finest groupby → coarser levels derived
    from the (bounded-cardinality, materialized-once) finest aggregate.
    `lvl` matches SQL GROUPING(flag, status). Hash-exact: fixed-point cents
    sums re-aggregate without float drift."""
    from fdpg_query_data_validation_ray.stages.rollup import grouping_sets

    ds = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].combine_chunks(),
                "l_linestatus": t["l_linestatus"].combine_chunks(),
                "qty_cents": _cents(t["l_quantity"]),
                "price_cents": _cents(t["l_extendedprice"]),
            }
        )

    return grouping_sets(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=16384),
        keys=["l_returnflag", "l_linestatus"],
        value_cols=["qty_cents", "price_cents"],
    )


def q_cube_events(sf_dir: str):
    """GROUP BY CUBE(event_type, hour-of-day): all four grouping sets from
    one exchange over events. The (type) and (hod) marginals plus the
    global total come from the 24×|types| finest aggregate, not from
    re-scanning the facts."""
    from fdpg_query_data_validation_ray.stages.rollup import cube_sets, grouping_sets

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_type"])),
            pc.and_(pc.is_valid(t["value"]),
                    pc.invert(pc.is_nan(t["value"]))),
        )
        t = t.filter(m)
        return pa.table(
            {
                "event_type": t["event_type"].combine_chunks(),
                "hod": pc.cast(pc.hour(t["ts"].combine_chunks()), pa.int64()),
                "value_cents": _cents(t["value"]),
            }
        )

    return grouping_sets(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=16384),
        keys=["event_type", "hod"],
        value_cols=["value_cents"],
        sets=cube_sets(["event_type", "hod"]),
    )


def q_triangle_suppliers(sf_dir: str):
    """Per-node triangle counts over the supplier co-purchase graph
    (stages/graph.py triangle_counts — degree-ordered node-iterator, wedge
    volume O(m^1.5)). Edges: supplier pairs sharing ≥ 2 distinct orders,
    thinned deterministically to ~1/4 by md5_number_lower('tri|u|v') % 4
    == 0 (sparse AND non-empty at every sf — replayed verbatim in the
    oracle). Pair explosion happens inside order-hash parts (bounded by
    order size²); md5 thinning applies BEFORE the pair-count exchange so
    the exchange only moves surviving pairs."""
    from fdpg_query_data_validation_ray.stages.graph import triangle_counts

    out = triangle_counts(_copurchase_edges(sf_dir), a="a", b="b")
    schema = pa.schema([("node", pa.int64()), ("n_triangles", pa.int64())])
    # schema anchor: a triangle-free graph yields ZERO groups, so map_groups
    # emits schema-less empty pandas blocks — normalize every block to the
    # typed schema and union an empty typed block so consumers always see
    # (node, n_triangles)
    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return t.select(["node", "n_triangles"]).cast(schema)

    return _rd().from_arrow(schema.empty_table()).union(
        out.map_batches(norm, batch_format="pyarrow")
    )


def q_collocations_docs(sf_dir: str):
    """Top-30 adjacent-bigram collocations by PMI (stages/text.py
    collocations_pmi — Church & Hanks 1990), min bigram count 5, over
    lowercased \\S+ tokens. One tagged exchange reduces bigram/unigram/total
    partials; two attach exchanges bring the unigram counts to each
    surviving bigram; PMI in lnq fixed-point so the hash matches the SQL
    replay exactly."""
    from fdpg_query_data_validation_ray.stages.text import collocations_pmi

    return collocations_pmi(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_count=5,
        k=30,
    )


def q_fuzzy_supplier_names(sf_dir: str):
    """Fuzzy entity-name self-join: all supplier-name pairs within
    Levenshtein distance 1 (stages/fuzzy.py fuzzy_pairs_ed1 — SymSpell
    deletion neighborhoods with exact vectorized verification; the bucket
    join only prunes, so results hash-match DuckDB's levenshtein() cross
    join). Names longer than 32 chars excluded on both sides."""
    from fdpg_query_data_validation_ray.stages.fuzzy import fuzzy_pairs_ed1

    return fuzzy_pairs_ed1(
        _read(sf_dir, "supplier", ["s_name"]), column="s_name", max_len=32
    )


def q_dedup_lines_docs(sf_dir: str):
    """Intra-document duplicate-line removal (stages/text.py
    DedupLinesStage): deterministic 2-word lines planted (same parity
    punctuation as the C4 planting, narrower so real intra-doc repeats
    exist), repeated lines keep their first occurrence. Pure map — no
    exchange; byte-exact text_clean vs the SQL ROW_NUMBER replay."""
    from fdpg_query_data_validation_ray.stages.text import DedupLinesStage

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: _plant_lines(t, group_w=2), batch_format="pyarrow"
    )
    return ds.map_batches(
        DedupLinesStage(), batch_format="pyarrow", batch_size=2048
    )


def q_intersect_docs_halves(sf_dir: str):
    """Distributed INTERSECT ALL with counts (stages/stats.py
    multiset_intersect): the (lang, n_chars // 10) tuples present in BOTH
    the even-doc_id and odd-doc_id halves, with n_common = min
    multiplicity — the complement of diff_docs_halves. (The synthetic
    `source` column correlates with doc_id parity, so the intersect keys
    use the length bucket instead.) Same combiner/one-groupby shape."""
    from fdpg_query_data_validation_ray.stages.stats import multiset_intersect

    def half(par: int):
        ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

        def prep(t: pa.Table, p=par) -> pa.Table:
            t = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), p))
            nb = pc.if_else(
                pc.is_valid(t["n_chars"]),
                pc.cast(
                    pc.floor(pc.divide(pc.cast(t["n_chars"], pa.float64()),
                                       10.0)),
                    pa.int64(),
                ),
                pa.scalar(None, pa.int64()),
            )
            return pa.table({"lang": t["lang"], "nb": nb})

        return ds.map_batches(prep, batch_format="pyarrow")

    out = multiset_intersect(half(0), half(1), ["lang", "nb"])
    schema = pa.schema(
        [
            ("lang", pa.string()),
            ("nb", pa.int64()),
            ("n_common", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["lang", "nb", "n_common"]).cast(schema),
        batch_format="pyarrow",
    )


def q_unpivot_lineitem(sf_dir: str):
    """UNPIVOT/melt: the four lineitem measures unpivoted into skinny
    (l_orderkey, l_linenumber, measure, value_cents) rows — the inverse of
    events_type_pivot and the standard reshape before per-measure stats.
    Pure map, no exchange; cents fixed-point so hashes can't drift."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

    def melt(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(t["l_orderkey"]), pc.is_valid(t["l_linenumber"])
        )
        t = t.filter(m)
        ok = pc.cast(t["l_orderkey"], pa.int64())
        ln = pc.cast(t["l_linenumber"], pa.int64())
        frames = [
            pa.table(
                {
                    "l_orderkey": ok,
                    "l_linenumber": ln,
                    "measure": pa.array([c] * t.num_rows, pa.string()),
                    "value_cents": _cents(t[c]),
                }
            )
            for c in cols
        ]
        return pa.concat_tables(frames)

    return _read(
        sf_dir, "lineitem", ["l_orderkey", "l_linenumber"] + cols
    ).map_batches(melt, batch_format="pyarrow", batch_size=16384)


def q_median_value_by_type(sf_dir: str):
    """EXACT grouped median (lower median, ROW_NUMBER semantics) of the
    high-cardinality value column per event_type — the grouped companion to
    exact_quantiles_events, via the ccnet_buckets composite-key plan:
    per-type counts give contiguous rank bases, ONE range_rank exchange
    over key = type_idx << 40 | value_cents ranks all groups at once, the
    5 median ranks filter down to 5 rows, and their values come back from
    one broadcast-id scan (no join exchange). Works for any per-group
    cardinality — nothing per-group ever materializes."""
    import ray

    from fdpg_query_data_validation_ray.stages.topk import range_rank

    def valid(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["event_id"])),
            pc.and_kleene(
                pc.is_valid(t["value"]), pc.invert(pc.is_nan(t["value"]))
            ),
        )
        return t.filter(pc.fill_null(m, False))

    counts = (
        _read(sf_dir, "events", ["event_type", "event_id", "value"])
        .map_batches(
            lambda t: valid(t).select(["event_type"]), batch_format="pyarrow"
        )
        .groupby("event_type")
        .count()
        .to_pandas()
        .sort_values("event_type")
    )
    types = counts["event_type"].to_numpy(object)
    n_per = counts["count()"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int64)
    cum = np.cumsum(n_per)
    targets = bases + (n_per + 1) // 2  # 1-based lower-median global ranks
    types_sorted = types  # already sorted

    def composite(t: pa.Table) -> pa.Table:
        t = valid(t)
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        if len(vc) and (vc.min() < 0 or vc.max() >= (1 << 40)):
            raise ValueError("median_value_by_type: cents outside composite range")
        tidx = np.searchsorted(
            types_sorted, t["event_type"].to_numpy(zero_copy_only=False)
        )
        ckey = (tidx.astype(np.int64) << 40) | vc
        return pa.table(
            {"event_id": t["event_id"], "ckey": pa.array(ckey, pa.int64())}
        )

    scored = _read(
        sf_dir, "events", ["event_id", "event_type", "value"]
    ).map_batches(composite, batch_format="pyarrow")
    ranked = range_rank(scored, "ckey", "event_id")

    tgt = np.sort(targets)

    def hit(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(tgt, r)
        pos_c = np.minimum(pos, len(tgt) - 1)
        m = tgt[pos_c] == r
        return pa.table(
            {
                "event_id": pc.filter(t["event_id"], pa.array(m)),
                "rank": pa.array(r[m], pa.int64()),
            }
        )

    hits = ranked.map_batches(hit, batch_format="pyarrow").to_pandas()
    # one broadcast-id scan recovers the median values (O(groups) ids)
    ids = np.sort(hits["event_id"].to_numpy(np.int64))

    def pick(t: pa.Table) -> pa.Table:
        t = valid(t)
        ev = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, ev)
        pos_c = np.minimum(pos, len(ids) - 1)
        m = ids[pos_c] == ev if len(ids) else np.zeros(len(ev), bool)
        t = t.filter(pa.array(m))
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "median_cents": _cents(t["value"]),
            }
        )

    vals = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    merged = hits.merge(vals, on="event_id")
    lidx = np.searchsorted(cum, merged["rank"].to_numpy(np.int64), side="left")
    out = pa.table(
        {
            "event_type": pa.array(types[lidx], pa.string()),
            "median_cents": pa.array(
                merged["median_cents"].to_numpy(np.int64), pa.int64()
            ),
        }
    )
    return out


def q_latest_event_per_user(sf_dir: str):
    """Upsert compaction / latest-snapshot: each user's most recent event
    (ORDER BY ts DESC, event_id DESC, row 1) — the keep-latest-record
    primitive of CDC/feature-store builds, by composition over
    first_n_per_key (per-batch local cap → one key-hash exchange)."""
    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["user_id"]), pc.is_valid(t["ts"])),
            pc.is_valid(t["event_id"]),
        )
        t = t.filter(pc.fill_null(m, False))
        return pa.table(
            {
                "user_id": pc.cast(t["user_id"], pa.int64()),
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "ts_us": pc.cast(
                    pc.cast(t["ts"], pa.timestamp("us")), pa.int64()
                ),
                "value_cents": _cents(t["value"]),
            }
        )

    ds = _read(
        sf_dir, "events", ["user_id", "event_id", "ts", "value"]
    ).map_batches(prep, batch_format="pyarrow", batch_size=16384)
    out = first_n_per_key(
        ds, 1, "user_id", ["ts_us", "event_id"],
        ascending=[False, False], rank_column=None,
    )
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("value_cents", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "ts_us", "value_cents"]
        ).cast(schema),
        batch_format="pyarrow",
    )


BM25_QUERIES = {
    1: ["hash", "table"],
    2: ["fast", "scan", "merge"],
    3: ["window", "sort"],
}


def q_bm25_topk_docs(sf_dir: str):
    """BM25 sparse retrieval (stages/text.py bm25_topk): top-10 documents
    per query for a fixed 3-query set over the corpus vocabulary —
    integer-exact k1=1.2/b=0.75 scoring (rational tf saturation + lnq idf),
    hash-exact vs the SQL replay. One stats pass (driver scalars), one
    vectorized scoring pass, per-query distributed top-k."""
    from fdpg_query_data_validation_ray.stages.text import bm25_topk

    return bm25_topk(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        BM25_QUERIES,
        k=10,
    )


def q_chi2_lang_source(sf_dir: str):
    """Chi-square independence test on the lang × source contingency table
    (the drift-family hypothesis test beside PSI/KS): per-cell contribution
    floor(1e6·(o·N − r·c)² / (N·r·c)) summed exactly — numerators exceed
    int64 so the engine uses PYTHON INTS over the driver-bounded cell table
    (cells = |langs|·|sources|, a combiner groupby away) and the oracle uses
    HUGEINT; both floor the same rational, so the statistic hash-matches.
    Output: one row (n_cells, dof, chi2_e6)."""
    from ray.data.aggregate import Sum

    def cell_partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t["lang"]), pc.is_valid(t["source"]))
        )
        g = (
            t.select(["lang", "source"])
            .group_by(["lang", "source"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"lang": g["lang"], "source": g["source"],
             "o": pc.cast(g["count_all"], pa.int64())}
        )

    cells = (
        _read(sf_dir, "documents", ["lang", "source"])
        .map_batches(cell_partial, batch_format="pyarrow", batch_size=16384)
        .groupby(["lang", "source"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()  # O(cells) — bounded by the two cardinalities
    )
    n = int(cells["o"].sum())
    r = cells.groupby("lang")["o"].sum().to_dict()
    c = cells.groupby("source")["o"].sum().to_dict()
    obs = {
        (row["lang"], row["source"]): int(row["o"])
        for _, row in cells.iterrows()
    }
    # the FULL cross product: unseen (lang, source) combos contribute
    # r·c/N each (observed 0 against a positive expectation)
    chi2 = 0
    for lg, rr in r.items():
        for src, cc in c.items():
            o = obs.get((lg, src), 0)
            chi2 += (1_000_000 * (o * n - rr * cc) ** 2) // (n * rr * cc)
    dof = (len(r) - 1) * (len(c) - 1)
    return pa.table(
        {
            "n_cells": pa.array([len(r) * len(c)], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "chi2_e6": pa.array([chi2], pa.int64()),
        }
    )


def q_events_user_cumsum(sf_dir: str):
    """Per-user running total: SUM(value) OVER (PARTITION BY user_id ORDER
    BY ts, event_id ROWS UNBOUNDED PRECEDING) in cents
    (stages/temporal.py running_sum — coarse-partition kernel, one cumsum
    with per-key base subtraction). Hash-exact vs the window oracle."""
    from fdpg_query_data_validation_ray.stages.temporal import running_sum

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = running_sum(ds, "user_id", "ts", "event_id", "value", scale=100)
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("value_e", pa.int64()),
            ("run_sum_e", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "value_e", "run_sum_e"]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_returned_revenue_customers(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue from RETURNED items
    (l_returnflag = 'R') — lineitem ⋈ orders on orderkey, then customer
    attributes on custkey, exact e4 revenue. Two co-partitioned exchanges
    on DIFFERENT keys, each kernel pre-aggregating (per-orderkey revenue
    partials inside batches, per-custkey sums inside parts), so exchange 2
    moves O(customers-with-returns) rows; distributed top-k caps the
    result. Same join plan family as revenue_by_nation (Q5)."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts
    from fdpg_query_data_validation_ray.stages.topk import top_k

    n_parts = _verify_parts()

    # ---- exchange 1 (by orderkey): returned-line revenue meets custkey ---
    def line_rows(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(pc.cast(t["l_returnflag"], pa.string()), "R"),
            pc.is_valid(t["l_orderkey"]),
        )
        t = t.filter(pc.fill_null(m, False))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        rev = (
            _cents(t["l_extendedprice"]).to_numpy(zero_copy_only=False)
            * (100 - _cents(t["l_discount"]).to_numpy(zero_copy_only=False))
        ).astype(np.int64)
        # per-batch per-order combiner: sort + reduceat keeps the sums
        # int64-exact end to end
        order = np.argsort(ok, kind="stable")
        oks, revs = ok[order], rev[order]
        first = np.empty(len(oks), bool)
        if len(oks):
            first[0] = True
            first[1:] = oks[1:] != oks[:-1]
            bounds = np.flatnonzero(first)
            sums_i = np.add.reduceat(revs, bounds)
            uo = oks[bounds]
        else:
            sums_i = np.zeros(0, np.int64)
            uo = oks
        return pa.table(
            {
                "part": pa.array(
                    (hash64(uo) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(len(uo), np.int8)),
                "a": pa.array(uo, pa.int64()),
                "b": pa.array(sums_i.astype(np.int64), pa.int64()),
            }
        )

    def order_rows(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(pc.is_valid(t["o_orderkey"]), pc.is_valid(t["o_custkey"]))
        )
        k = t["o_orderkey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(len(k), np.int8)),
                "a": pc.cast(k, pa.int64()),
                "b": pc.cast(t["o_custkey"], pa.int64()).combine_chunks(),
            }
        )

    def join1(g: pd.DataFrame) -> pd.DataFrame:
        rev = g[g["kind"] == 0]
        od = g[g["kind"] == 1]
        if len(rev) == 0 or len(od) == 0:
            return pd.DataFrame(
                {"part": pd.Series(dtype="int32"),
                 "kind": pd.Series(dtype="int8"),
                 "a": pd.Series(dtype="int64"),
                 "b": pd.Series(dtype="int64")}
            )
        m = rev.merge(
            od[["a", "b"]].rename(columns={"b": "cust"}), on="a", how="inner"
        )
        s = m.groupby("cust", sort=False)["b"].sum()
        ck = s.index.to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": (hash64(ck) & np.uint64(n_parts - 1)).astype(np.int32),
                "kind": np.zeros(len(ck), np.int8),
                "a": ck,
                "b": s.to_numpy(np.int64),
            }
        )

    # ---- exchange 2 (by custkey): revenue sums meet customer attrs -------
    def cust_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["c_custkey"]))
        k = pc.cast(t["c_custkey"], pa.int64()).combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(len(k), np.int8)),
                "a": k,
                "b": _cents(t["c_acctbal"]),
                "name": pc.cast(t["c_name"], pa.string()),
            }
        )

    def join2(g: pd.DataFrame) -> pd.DataFrame:
        rev = g[g["kind"] == 0]
        cu = g[g["kind"] == 1]
        if len(rev) == 0 or len(cu) == 0:
            return pd.DataFrame(
                {"c_custkey": pd.Series(dtype="int64"),
                 "c_name": pd.Series(dtype="object"),
                 "acctbal_cents": pd.Series(dtype="int64"),
                 "revenue_e4": pd.Series(dtype="int64")}
            )
        s = rev.groupby("a", sort=False)["b"].sum().reset_index()
        m = s.merge(cu[["a", "b", "name"]].rename(
            columns={"b": "acct"}), on="a", how="inner")
        return pd.DataFrame(
            {
                "c_custkey": m["a"].to_numpy(np.int64),
                "c_name": m["name"].to_numpy(object),
                "acctbal_cents": m["acct"].to_numpy(np.int64),
                "revenue_e4": m["b"].to_numpy(np.int64),
            }
        )

    lines = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(line_rows, batch_format="pyarrow", batch_size=65536)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        order_rows, batch_format="pyarrow", batch_size=65536
    )
    mixed_schema = pa.schema(
        [("part", pa.int32()), ("kind", pa.int8()),
         ("a", pa.int64()), ("b", pa.int64())]
    )
    stage1 = (
        lines.union(orders)
        .groupby("part")
        .map_groups(join1, batch_format="pandas")
        .map_batches(
            lambda t: t.cast(mixed_schema)
            if t.num_columns
            else mixed_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
    cust_schema = pa.schema(
        [("part", pa.int32()), ("kind", pa.int8()), ("a", pa.int64()),
         ("b", pa.int64()), ("name", pa.string())]
    )
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"]
    ).map_batches(cust_rows, batch_format="pyarrow", batch_size=65536)
    joined = (
        stage1.map_batches(
            lambda t: t.append_column(
                "name", pa.array([None] * t.num_rows, pa.string())
            ).cast(cust_schema),
            batch_format="pyarrow",
        )
        .union(cust)
        .groupby("part")
        .map_groups(join2, batch_format="pandas")
    )
    return top_k(
        joined, 20, ["revenue_e4", "c_custkey"], descending=[True, False]
    )


def q_fuzzy_supplier_clusters(sf_dir: str):
    """Entity resolution end-to-end: ED≤1 fuzzy name pairs
    (stages/fuzzy.py) → name→key translation against the broadcast
    supplier dimension → connected components (stages/cluster.py,
    large/small-star) → every qualifying supplier labeled with its
    cluster's min suppkey (singletons label themselves). The composition
    of three operator families; hash-exact vs a recursive-CTE oracle."""
    import pyarrow.parquet as pq

    import ray

    from fdpg_query_data_validation_ray.stages.cluster import (
        connected_components,
    )
    from fdpg_query_data_validation_ray.stages.fuzzy import fuzzy_pairs_ed1

    # supplier is a bounded dimension: name→key for the pair translation
    dim = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    m = pc.and_(
        pc.and_(pc.is_valid(dim["s_name"]), pc.is_valid(dim["s_suppkey"])),
        pc.less_equal(pc.utf8_length(dim["s_name"]), 32),
    )
    dim = dim.filter(m)
    names = dim["s_name"].to_numpy(zero_copy_only=False).astype("U")
    keys = dim["s_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(names)
    names_s, keys_s = names[order], keys[order]
    dim_ref = ray.put((names_s, keys_s))

    pairs = fuzzy_pairs_ed1(
        _read(sf_dir, "supplier", ["s_name"]), column="s_name", max_len=32
    )

    def to_ids(t: pa.Table, _ref=dim_ref) -> pa.Table:
        ns, ks = ray.get(_ref)
        w1 = t["w1"].to_numpy(zero_copy_only=False).astype("U")
        w2 = t["w2"].to_numpy(zero_copy_only=False).astype("U")
        a = ks[np.searchsorted(ns, w1)]
        b = ks[np.searchsorted(ns, w2)]
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
        )

    cc = connected_components(
        pairs.map_batches(to_ids, batch_format="pyarrow"), "id_a", "id_b"
    ).to_pandas()  # O(paired suppliers) — dimension-bounded
    label = (
        dict(zip(cc["node"].astype(np.int64), cc["cluster_id"].astype(np.int64)))
        if len(cc)
        else {}
    )
    lab_nodes = np.array(sorted(label), np.int64)
    lab_vals = np.array([label[n] for n in lab_nodes], np.int64)
    lab_ref = ray.put((lab_nodes, lab_vals))

    def attach(t: pa.Table, _ref=lab_ref) -> pa.Table:
        ln, lv = ray.get(_ref)
        m = pc.and_(
            pc.and_(
                pc.is_valid(t["s_name"]), pc.is_valid(t["s_suppkey"])
            ),
            pc.less_equal(pc.utf8_length(t["s_name"]), 32),
        )
        t = t.filter(pc.fill_null(m, False))
        k = pc.cast(t["s_suppkey"], pa.int64()).to_numpy(zero_copy_only=False)
        if len(ln):
            pos = np.searchsorted(ln, k)
            pos_c = np.minimum(pos, len(ln) - 1)
            hit = ln[pos_c] == k
            lab = np.where(hit, lv[pos_c], k)
        else:
            lab = k
        return pa.table(
            {
                "s_suppkey": pa.array(k, pa.int64()),
                "cluster_id": pa.array(lab, pa.int64()),
            }
        )

    return _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        attach, batch_format="pyarrow"
    )


def q_weighted_sample_docs(sf_dir: str):
    """Exact-k weighted sample without replacement (Efraimidis–Spirakis,
    stages/sampling.py weighted_sample_k): 100 documents weighted by
    n_chars — longer docs proportionally more likely, deterministic under
    re-runs/partitioning, integer-exact order key so the SQL replay
    hash-matches."""
    from fdpg_query_data_validation_ray.stages.sampling import (
        weighted_sample_k,
    )

    out = weighted_sample_k(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        100,
        "doc_id",
        "n_chars",
    )
    schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("es_key", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_chars", "es_key"]).cast(schema),
        batch_format="pyarrow",
    )


def _copurchase_edges(sf_dir: str):
    """Shared edge derivation for the graph-operator queries: supplier
    pairs sharing ≥ 2 distinct orders, md5-thinned to ~1/4 (the
    triangle_suppliers recipe — replayed verbatim in every oracle)."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts
    from fdpg_query_data_validation_ray.stages.text import md5_low60

    n_parts = _verify_parts()

    def route(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["l_orderkey"]), pc.is_valid(t["l_suppkey"]))
        t = t.filter(m)
        o = t["l_orderkey"].combine_chunks()
        return pa.table(
            {
                "order": o,
                "supp": t["l_suppkey"].combine_chunks(),
                "part": pa.array(
                    (hash64(o) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
            }
        )

    _E = {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")}

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(dict(_E, c=pd.Series(dtype="int64"),
                                     part2=pd.Series(dtype="int32")))
        s = g[["order", "supp"]].drop_duplicates()
        m = s.merge(s, on="order", suffixes=("_a", "_b"))
        m = m[m["supp_a"] < m["supp_b"]]
        cnt = (
            m.groupby(["supp_a", "supp_b"], sort=False)
            .size()
            .reset_index(name="c")
        )
        u = cnt["supp_a"].to_numpy(np.int64)
        v = cnt["supp_b"].to_numpy(np.int64)
        h = md5_low60([f"tri|{x}|{y}" for x, y in zip(u, v)])
        keep = (h % np.uint64(4)) == 0
        u, v, c = u[keep], v[keep], cnt["c"].to_numpy(np.int64)[keep]
        pk = hash64(u * np.int64(1_000_003) + v)
        return pd.DataFrame(
            {"a": u, "b": v, "c": c,
             "part2": (pk & np.uint64(n_parts - 1)).astype(np.int32)}
        )

    def sum_filter(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_E)
        s = g.groupby(["a", "b"], sort=False)["c"].sum().reset_index()
        s = s[s["c"] >= 2]
        return pd.DataFrame(
            {"a": s["a"].to_numpy(np.int64), "b": s["b"].to_numpy(np.int64)}
        )

    return (
        _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        .map_batches(route, batch_format="pyarrow", batch_size=65536)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("part2")
        .map_groups(sum_filter, batch_format="pandas")
    )


def q_kcore_suppliers(sf_dir: str):
    """k-core peeling (Seidman 1983; k = 2, 4 fixed rounds) over the
    supplier co-purchase graph — surviving nodes with their in-core degree
    (pendant/tree suppliers peel away). Fully distributed: one degree
    exchange + two endpoint-filter exchanges per round
    (stages/graph.py k_core); rounds are part of the semantics and the
    oracle unrolls the same four."""
    from fdpg_query_data_validation_ray.stages.graph import k_core

    return k_core(_copurchase_edges(sf_dir), k=2, rounds=4, a="a", b="b")


def q_events_user_next(sf_dir: str):
    """Per-user LEAD window: each event's next event id and exact
    microsecond gap (stages/temporal.py lead_gap) — LEAD(event_id)/
    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), the
    inter-event-gap signal. Hash-exact vs the window oracle."""
    from fdpg_query_data_validation_ray.stages.temporal import lead_gap

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = lead_gap(ds, "user_id", "ts", "event_id")
    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("next_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            ["user_id", "event_id", "ts_us", "next_id", "gap_us"]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_centroid_similarity_labels(sf_dir: str):
    """Pairwise label-centroid similarity: per-label mean embeddings
    (e3-quantized — the exact-floor trick keeps both sides integer), then
    every label pair's dot product and squared norms as exact int64 — the
    cluster-geometry diagnostic after a centroid build. One combiner
    exchange produces the bounded (label, dim) table; the L×L×d pair
    assembly is driver-side over that reduced state (labels are a class
    axis, never data-scale)."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        embedding_centroid_sums,
    )

    sums = (
        embedding_centroid_sums(
            _read(sf_dir, "embeddings", ["label", "embedding"]),
            "embedding",
            "label",
        )
        .to_pandas()  # O(labels × dims)
    )
    labels = np.sort(sums["label"].unique())
    dims = int(sums["dim"].max()) if len(sums) else 0
    L = len(labels)
    M = np.zeros((L, dims), dtype=np.int64)
    li = np.searchsorted(labels, sums["label"].to_numpy())
    di = sums["dim"].to_numpy(np.int64) - 1
    # exact floor of sum_e6 / (n·1000) — matches FLOOR(double) in SQL
    # because |sum_e6| < 2^53 (see oracle comment)
    M[li, di] = sums["sum_e6"].to_numpy(np.int64) // (
        sums["n_vectors"].to_numpy(np.int64) * 1000
    )
    norm2 = (M.astype(object) ** 2).sum(axis=1)  # python ints, no overflow
    rows = []
    for i in range(L):
        for j in range(i + 1, L):
            dot = int((M[i].astype(object) * M[j].astype(object)).sum())
            rows.append(
                (int(labels[i]), int(labels[j]), dot,
                 int(norm2[i]), int(norm2[j]))
            )
    return pa.table(
        {
            "label_a": pa.array([r[0] for r in rows], pa.int64()),
            "label_b": pa.array([r[1] for r in rows], pa.int64()),
            "dot_e6": pa.array([r[2] for r in rows], pa.int64()),
            "norm2_a_e6": pa.array([r[3] for r in rows], pa.int64()),
            "norm2_b_e6": pa.array([r[4] for r in rows], pa.int64()),
        }
    )


def q_customers_without_orders(sf_dir: str):
    """NOT EXISTS anti-join as a named relational operator: customers with
    no HIGH-VALUE order (totalprice > 300k — every customer has SOME order
    in the synthetic data). One custkey-hash exchange: qualifying-order
    count partials and customer rows co-partition; customers whose part
    shows zero qualifying orders survive."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def order_partials(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(t["o_custkey"]),
            pc.fill_null(pc.greater(t["o_totalprice"], 300000.0), False),
        )
        t = t.filter(m)
        agg = t.select(["o_custkey"]).group_by("o_custkey").aggregate(
            [([], "count_all")]
        )
        k = agg["o_custkey"].combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.zeros(len(k), np.int8)),
                "custkey": pc.cast(k, pa.int64()),
                "seg": pa.array([""] * len(k), pa.string()),
            }
        )

    def customer_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["c_custkey"]))
        k = pc.cast(t["c_custkey"], pa.int64()).combine_chunks()
        return pa.table(
            {
                "part": pa.array(
                    (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
                ),
                "kind": pa.array(np.ones(len(k), np.int8)),
                "custkey": k,
                "seg": pc.cast(t["c_mktsegment"], pa.string()).combine_chunks(),
            }
        )

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        cust = g[g["kind"] == 1]
        if len(cust) == 0:
            return pd.DataFrame(
                {"c_custkey": pd.Series(dtype="int64"),
                 "c_mktsegment": pd.Series(dtype="object")}
            )
        have = np.unique(g.loc[g["kind"] == 0, "custkey"].to_numpy(np.int64))
        ck = cust["custkey"].to_numpy(np.int64)
        if len(have):
            pos = np.searchsorted(have, ck)
            pos_c = np.minimum(pos, len(have) - 1)
            keep = have[pos_c] != ck
        else:
            keep = np.ones(len(ck), bool)
        return pd.DataFrame(
            {
                "c_custkey": ck[keep],
                "c_mktsegment": cust["seg"].to_numpy(object)[keep],
            }
        )

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_totalprice"]
    ).map_batches(order_partials, batch_format="pyarrow", batch_size=65536)
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"]
    ).map_batches(customer_rows, batch_format="pyarrow", batch_size=65536)
    schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_mktsegment", pa.string())]
    )
    out = (
        orders.union(cust)
        .groupby("part")
        .map_groups(anti, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["c_custkey", "c_mktsegment"]).cast(schema)
            if t.num_columns
            else schema.empty_table(),
            batch_format="pyarrow",
        )
    )
    return _rd().from_arrow(schema.empty_table()).union(out)


def q_quartiles_value_by_type_exact(sf_dir: str):
    """EXACT grouped quartiles (q25/q50/q75, lower-value discrete
    quantiles) of the high-cardinality value column per event_type — the
    arbitrary-q generalization of median_value_by_type over the SAME
    composite-key range_rank plan: per-type counts → 3 target ranks per
    group → one rank exchange → 3·G rows filtered → one broadcast-id scan.
    Rank definition: ROW_NUMBER (n·q + 3) // 4 with q∈{1,2,3} (ceil of
    n·q/4, ≥ 1), replayed verbatim in SQL."""
    import ray

    from fdpg_query_data_validation_ray.stages.topk import range_rank

    def valid(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["event_id"])),
            pc.and_kleene(
                pc.is_valid(t["value"]), pc.invert(pc.is_nan(t["value"]))
            ),
        )
        return t.filter(pc.fill_null(m, False))

    counts = (
        _read(sf_dir, "events", ["event_type", "event_id", "value"])
        .map_batches(
            lambda t: valid(t).select(["event_type"]), batch_format="pyarrow"
        )
        .groupby("event_type")
        .count()
        .to_pandas()
        .sort_values("event_type")
    )
    types = counts["event_type"].to_numpy(object)
    n_per = counts["count()"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int64)
    cum = np.cumsum(n_per)
    quarters = np.array([1, 2, 3], np.int64)
    # target global ranks: base + ceil(n*q/4) per (group, quarter)
    tgt_local = (n_per[:, None] * quarters[None, :] + 3) // 4
    targets = (bases[:, None] + tgt_local).ravel()
    tgt = np.sort(targets)

    def composite(t: pa.Table) -> pa.Table:
        t = valid(t)
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        if len(vc) and (vc.min() < 0 or vc.max() >= (1 << 40)):
            raise ValueError("quartiles: cents outside composite range")
        tidx = np.searchsorted(
            types, t["event_type"].to_numpy(zero_copy_only=False)
        )
        ckey = (tidx.astype(np.int64) << 40) | vc
        return pa.table(
            {"event_id": t["event_id"], "ckey": pa.array(ckey, pa.int64())}
        )

    scored = _read(
        sf_dir, "events", ["event_id", "event_type", "value"]
    ).map_batches(composite, batch_format="pyarrow")
    ranked = range_rank(scored, "ckey", "event_id")

    def hit(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(tgt, r)
        pos_c = np.minimum(pos, len(tgt) - 1)
        m = tgt[pos_c] == r
        return pa.table(
            {
                "event_id": pc.filter(t["event_id"], pa.array(m)),
                "rank": pa.array(r[m], pa.int64()),
            }
        )

    hits = ranked.map_batches(hit, batch_format="pyarrow").to_pandas()
    ids = np.sort(hits["event_id"].to_numpy(np.int64))

    def pick(t: pa.Table) -> pa.Table:
        t = valid(t)
        ev = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(ids, ev)
        pos_c = np.minimum(pos, len(ids) - 1)
        m = ids[pos_c] == ev if len(ids) else np.zeros(len(ev), bool)
        t = t.filter(pa.array(m))
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "vc": _cents(t["value"]),
            }
        )

    vals = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(pick, batch_format="pyarrow")
        .to_pandas()
    )
    merged = hits.merge(vals, on="event_id")
    r = merged["rank"].to_numpy(np.int64)
    lidx = np.searchsorted(cum, r, side="left")
    # a rank can satisfy several quarters at tiny n (e.g. n=1 → all three
    # targets coincide): emit one row per matching quarter
    out_rows = []
    for i in range(len(merged)):
        li = int(lidx[i])
        for qi, quarter in enumerate((25, 50, 75)):
            if bases[li] + tgt_local[li, qi] == r[i]:
                out_rows.append(
                    (types[li], quarter, int(merged["vc"].to_numpy()[i]))
                )
    return pa.table(
        {
            "event_type": pa.array([x[0] for x in out_rows], pa.string()),
            "quartile": pa.array([x[1] for x in out_rows], pa.int64()),
            "value_cents": pa.array([x[2] for x in out_rows], pa.int64()),
        }
    )


def q_revenue_share_by_nation(sf_dir: str):
    """Percent-of-total composition: each nation's exact share of global
    revenue (share_e6 = rev·1e6 // total) on top of the Q5 star join —
    the nation axis is bounded (25 rows), so the share divides at the
    driver over the already-reduced aggregate; exact integer both sides."""
    rev = q_revenue_by_nation(sf_dir).to_pandas()  # O(nations)
    total = int(rev["revenue_e4"].sum())
    r = rev["revenue_e4"].to_numpy(np.int64)
    share = (r.astype(object) * 1_000_000) // total  # python ints: no overflow
    return pa.table(
        {
            "n_name": pa.array(rev["n_name"].to_numpy(object), pa.string()),
            "revenue_e4": pa.array(r, pa.int64()),
            "share_e6": pa.array([int(x) for x in share], pa.int64()),
        }
    )


def q_mad_outliers_by_type(sf_dir: str):
    """Robust per-group outlier audit: per event_type the lower median, the
    MAD (lower median of |value − median|), and the count of rows with
    |value − median| > 5·MAD — the robust-z screen that, unlike the
    z-score stage, a few extreme rows cannot poison. Three bounded passes
    over the same composite-key rank plan: (1) medians, (2) MADs (ranking
    the absolute deviations against the broadcast medians), (3) one
    combiner count pass — every per-group structure stays G-bounded."""
    import ray

    from fdpg_query_data_validation_ray.stages.topk import range_rank

    def valid(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["event_id"])),
            pc.and_kleene(
                pc.is_valid(t["value"]), pc.invert(pc.is_nan(t["value"]))
            ),
        )
        return t.filter(pc.fill_null(m, False))

    counts = (
        _read(sf_dir, "events", ["event_type", "event_id", "value"])
        .map_batches(
            lambda t: valid(t).select(["event_type"]), batch_format="pyarrow"
        )
        .groupby("event_type")
        .count()
        .to_pandas()
        .sort_values("event_type")
    )
    types = counts["event_type"].to_numpy(object)
    n_per = counts["count()"].to_numpy(np.int64)
    bases = np.concatenate([[0], np.cumsum(n_per)[:-1]]).astype(np.int64)
    cum = np.cumsum(n_per)
    targets = np.sort(bases + (n_per + 1) // 2)

    def rank_values(value_of):
        """One composite-key rank pass; returns the per-group value at the
        lower-median rank (G-bounded driver frame)."""

        def composite(t: pa.Table) -> pa.Table:
            t = valid(t)
            v = value_of(t)
            if len(v) and (v.min() < 0 or v.max() >= (1 << 40)):
                raise ValueError("mad_outliers: value outside composite range")
            tidx = np.searchsorted(
                types, t["event_type"].to_numpy(zero_copy_only=False)
            )
            return pa.table(
                {
                    "event_id": t["event_id"],
                    "ckey": pa.array(
                        (tidx.astype(np.int64) << 40) | v, pa.int64()
                    ),
                }
            )

        scored = _read(
            sf_dir, "events", ["event_id", "event_type", "value"]
        ).map_batches(composite, batch_format="pyarrow")
        ranked = range_rank(scored, "ckey", "event_id")

        def hit(t: pa.Table) -> pa.Table:
            r = t["rank"].to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(targets, r), len(targets) - 1)
            m = targets[pos] == r
            return pa.table(
                {
                    "event_id": pc.filter(t["event_id"], pa.array(m)),
                    "rank": pa.array(r[m], pa.int64()),
                }
            )

        hits = ranked.map_batches(hit, batch_format="pyarrow").to_pandas()
        ids = np.sort(hits["event_id"].to_numpy(np.int64))

        def pick(t: pa.Table) -> pa.Table:
            t = valid(t)
            ev = pc.cast(t["event_id"], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            pos = np.minimum(np.searchsorted(ids, ev), len(ids) - 1)
            m = ids[pos] == ev if len(ids) else np.zeros(len(ev), bool)
            t = t.filter(pa.array(m))
            return pa.table(
                {
                    "event_id": pc.cast(t["event_id"], pa.int64()),
                    "v": pa.array(value_of(t), pa.int64()),
                }
            )

        vals = (
            _read(sf_dir, "events", ["event_id", "event_type", "value"])
            .map_batches(pick, batch_format="pyarrow")
            .to_pandas()
        )
        merged = hits.merge(vals, on="event_id")
        lidx = np.searchsorted(
            cum, merged["rank"].to_numpy(np.int64), side="left"
        )
        out = np.zeros(len(types), np.int64)
        out[lidx] = merged["v"].to_numpy(np.int64)
        return out

    def vc_of(t: pa.Table) -> np.ndarray:
        return _cents(t["value"]).to_numpy(zero_copy_only=False)

    med = rank_values(vc_of)  # per-type lower median, types order
    med_sorted_by_type = med  # types already sorted

    def dev_of(t: pa.Table) -> np.ndarray:
        tidx = np.searchsorted(
            types, t["event_type"].to_numpy(zero_copy_only=False)
        )
        return np.abs(vc_of(t) - med_sorted_by_type[tidx])

    mad = rank_values(dev_of)

    # pass 3: outlier counts per type (bounded axis combiner)
    def count_partial(t: pa.Table) -> pa.Table:
        t = valid(t)
        tidx = np.searchsorted(
            types, t["event_type"].to_numpy(zero_copy_only=False)
        )
        dev = np.abs(vc_of(t) - med_sorted_by_type[tidx])
        out = dev > 5 * mad[tidx]
        c = np.bincount(tidx[out], minlength=len(types)).astype(np.int64)
        return pa.table(
            {
                "tidx": np.arange(len(types), dtype=np.int64),
                "c": c,
            }
        )

    parts = (
        _read(sf_dir, "events", ["event_id", "event_type", "value"])
        .map_batches(count_partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()  # O(batches × types) — bounded axis
    )
    n_out = parts.groupby("tidx")["c"].sum()
    n_arr = np.zeros(len(types), np.int64)
    n_arr[n_out.index.to_numpy(np.int64)] = n_out.to_numpy(np.int64)
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "median_cents": pa.array(med, pa.int64()),
            "mad_cents": pa.array(mad, pa.int64()),
            "n_outliers": pa.array(n_arr, pa.int64()),
        }
    )


def q_minmax_events_by_type(sf_dir: str):
    """Per-group min-max feature scaling: norm_e6 = (v − min)·1e6 //
    (max − min) within each event_type — the [0,1] scaling leg beside the
    z-score. Two-pass broadcast plan: one tiny (key, min, max) groupby
    (cents exact), ray.put of the O(keys) LUT, zero-exchange scoring in
    pure integer arithmetic (hash-exact; degenerate max == min groups emit
    0, replayed in the oracle)."""
    import ray
    from ray.data.aggregate import Max, Min

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t["event_type"]), pc.is_valid(t["event_id"])),
            pc.and_kleene(
                pc.is_valid(t["value"]), pc.invert(pc.is_nan(t["value"]))
            ),
        )
        t = t.filter(pc.fill_null(m, False))
        return pa.table(
            {
                "event_id": pc.cast(t["event_id"], pa.int64()),
                "event_type": pc.cast(t["event_type"], pa.string()),
                "vc": _cents(t["value"]),
            }
        )

    rows = _read(
        sf_dir, "events", ["event_id", "event_type", "value"]
    ).map_batches(prep, batch_format="pyarrow", batch_size=65536)
    bands = (
        rows.groupby("event_type")
        .aggregate(Min("vc", alias_name="lo"), Max("vc", alias_name="hi"))
        .to_pandas()  # O(types)
        .sort_values("event_type")
    )
    keys = bands["event_type"].to_numpy(object).astype("U")
    lo = bands["lo"].to_numpy(np.int64)
    hi = bands["hi"].to_numpy(np.int64)
    ref = ray.put((keys, lo, hi))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        ks, lov, hiv = ray.get(_ref)
        ti = np.searchsorted(
            ks, t["event_type"].to_numpy(zero_copy_only=False).astype("U")
        )
        vc = t["vc"].to_numpy(zero_copy_only=False)
        rng = hiv[ti] - lov[ti]
        norm = np.where(
            rng > 0, ((vc - lov[ti]) * 1_000_000) // np.maximum(rng, 1), 0
        )
        return pa.table(
            {
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "norm_e6": pa.array(norm.astype(np.int64), pa.int64()),
            }
        )

    return rows.map_batches(score, batch_format="pyarrow", batch_size=65536)


def q_clustering_coeff_suppliers(sf_dir: str):
    """Local clustering coefficient per node: 1e6 · 2·triangles /
    (deg·(deg−1)) over the co-purchase graph — triangle_counts composed
    with one degree exchange; integer floor on both sides. Nodes with
    degree < 2 are excluded (coefficient undefined)."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts
    from fdpg_query_data_validation_ray.stages.graph import (
        _canon_edges,
        triangle_counts,
    )

    n_parts = _verify_parts()
    edges = _copurchase_edges(sf_dir)
    tri = triangle_counts(edges, a="a", b="b")

    # exact degrees over the SAME canonical edge set
    def deg_partials(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                t["u"].to_numpy(zero_copy_only=False),
                t["v"].to_numpy(zero_copy_only=False),
            ]
        )
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "part": (hash64(un) & np.uint64(n_parts - 1)).astype(np.int32),
                "node": un,
                "c": cnt.astype(np.int64),
            }
        )

    def deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "degree": pd.Series(dtype="int64")}
            )
        s = g.groupby("node", sort=False)["c"].sum()
        return pd.DataFrame(
            {"node": s.index.to_numpy(np.int64),
             "degree": s.to_numpy(np.int64)}
        )

    deg = (
        _canon_edges(_copurchase_edges(sf_dir), "a", "b", n_parts)
        .map_batches(deg_partials, batch_format="pyarrow")
        .groupby("part")
        .map_groups(deg_reduce, batch_format="pandas")
        .to_pandas()  # O(V) — the graph's node axis (suppliers) is bounded
    )
    tri_pd = tri.to_pandas()
    m = deg.merge(tri_pd, on="node", how="left").fillna({"n_triangles": 0})
    m = m[m["degree"] >= 2]
    d = m["degree"].to_numpy(np.int64)
    t3 = m["n_triangles"].to_numpy(np.int64)
    cc = (2_000_000 * t3) // (d * (d - 1))
    return pa.table(
        {
            "node": pa.array(m["node"].to_numpy(np.int64), pa.int64()),
            "degree": pa.array(d, pa.int64()),
            "cc_e6": pa.array(cc, pa.int64()),
        }
    )


def q_events_ohlc_hourly(sf_dir: str):
    """OHLC per (event_type, hour): open/close = the value at the
    min/max (ts, event_id) of the bucket, high/low = max/min value — the
    FIRST_VALUE/LAST_VALUE order-dependent aggregate family as MERGEABLE
    combiners: each batch emits one partial row per touched bucket
    carrying (argmin key + its value, argmax key + its value, min, max,
    n); one small groupby merges by re-applying the same min/max rules.
    Exact cents; hash-exact vs the ROW_NUMBER replay."""
    import pandas as pd

    from fdpg_query_data_validation_ray.functions.hashing import hash64
    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.is_valid(t["event_type"]),
                pc.and_kleene(
                    pc.is_valid(t["value"]), pc.invert(pc.is_nan(t["value"]))
                ),
            ),
            pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["event_id"])),
        )
        t = t.filter(pc.fill_null(m, False))
        if t.num_rows == 0:
            return pa.table(
                {
                    "part": pa.array([], pa.int32()),
                    "event_type": pa.array([], pa.string()),
                    "hour_us": pa.array([], pa.int64()),
                    "o_ts": pa.array([], pa.int64()),
                    "o_id": pa.array([], pa.int64()),
                    "o_v": pa.array([], pa.int64()),
                    "c_ts": pa.array([], pa.int64()),
                    "c_id": pa.array([], pa.int64()),
                    "c_v": pa.array([], pa.int64()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ts = pc.cast(pc.cast(t["ts"], pa.timestamp("us")), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        hour = (ts // 3_600_000_000) * 3_600_000_000
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        eid = pc.cast(t["event_id"], pa.int64()).to_numpy(zero_copy_only=False)
        vc = _cents(t["value"]).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {"ty": ty, "h": hour, "ts": ts, "id": eid, "v": vc}
        )
        # order by (ts, id) inside each bucket: first row = open, last = close
        df = df.sort_values(["ty", "h", "ts", "id"], kind="mergesort")
        g = df.groupby(["ty", "h"], sort=False)
        first = g.head(1).reset_index(drop=True)
        last = g.tail(1).reset_index(drop=True)
        agg = g["v"].agg(["min", "max", "size"]).reset_index()
        out = pd.DataFrame(
            {
                "event_type": first["ty"],
                "hour_us": first["h"].to_numpy(np.int64),
                "o_ts": first["ts"].to_numpy(np.int64),
                "o_id": first["id"].to_numpy(np.int64),
                "o_v": first["v"].to_numpy(np.int64),
                "c_ts": last["ts"].to_numpy(np.int64),
                "c_id": last["id"].to_numpy(np.int64),
                "c_v": last["v"].to_numpy(np.int64),
                "lo": agg["min"].to_numpy(np.int64),
                "hi": agg["max"].to_numpy(np.int64),
                "n": agg["size"].to_numpy(np.int64),
            }
        )
        key = out["event_type"].astype(str) + "\x1f" + out["hour_us"].astype(str)
        out.insert(
            0,
            "part",
            (hash64(key.to_numpy(object)) & np.uint64(n_parts - 1)).astype(
                np.int32
            ),
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype="object"),
                    "hour_us": pd.Series(dtype="int64"),
                    "open_cents": pd.Series(dtype="int64"),
                    "high_cents": pd.Series(dtype="int64"),
                    "low_cents": pd.Series(dtype="int64"),
                    "close_cents": pd.Series(dtype="int64"),
                    "n_events": pd.Series(dtype="int64"),
                }
            )
        rows = []
        for (ty, h), grp in g.groupby(["event_type", "hour_us"], sort=False):
            oi = np.lexsort((grp["o_id"].to_numpy(), grp["o_ts"].to_numpy()))[0]
            ci = np.lexsort((grp["c_id"].to_numpy(), grp["c_ts"].to_numpy()))[-1]
            rows.append(
                (
                    ty,
                    int(h),
                    int(grp["o_v"].to_numpy()[oi]),
                    int(grp["hi"].max()),
                    int(grp["lo"].min()),
                    int(grp["c_v"].to_numpy()[ci]),
                    int(grp["n"].sum()),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "hour_us", "open_cents", "high_cents",
                "low_cents", "close_cents", "n_events",
            ],
        )

    out = (
        _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
    )
    schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("hour_us", pa.int64()),
            ("open_cents", pa.int64()),
            ("high_cents", pa.int64()),
            ("low_cents", pa.int64()),
            ("close_cents", pa.int64()),
            ("n_events", pa.int64()),
        ]
    )
    return out.map_batches(
        lambda t: t.select(
            [
                "event_type", "hour_us", "open_cents", "high_cents",
                "low_cents", "close_cents", "n_events",
            ]
        ).cast(schema),
        batch_format="pyarrow",
    )


def q_supplier_hhi_by_nation(sf_dir: str):
    """Herfindahl–Hirschman concentration index per nation: each
    supplier's share of its nation's positive account-balance mass,
    hhi_e6 = Σ share_e6² // 1e6 — the market-concentration aggregate.
    Two-pass broadcast plan (the minmax/zscore shape): one tiny
    (nation, total) groupby, LUT broadcast, per-batch integer share²
    partials, one bounded final sum."""
    import ray
    from ray.data.aggregate import Sum

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.is_valid(t["s_nationkey"]),
            pc.fill_null(pc.greater(t["s_acctbal"], 0.0), False),
        )
        t = t.filter(m)
        return pa.table(
            {
                "nk": pc.cast(t["s_nationkey"], pa.int64()),
                "bc": _cents(t["s_acctbal"]),
            }
        )

    rows = _read(
        sf_dir, "supplier", ["s_nationkey", "s_acctbal"]
    ).map_batches(prep, batch_format="pyarrow", batch_size=65536)
    tot = (
        rows.groupby("nk")
        .aggregate(Sum("bc", alias_name="total"))
        .to_pandas()
        .sort_values("nk")
    )
    nk = tot["nk"].to_numpy(np.int64)
    total = tot["total"].to_numpy(np.int64)
    ref = ray.put((nk, total))

    def partial(t: pa.Table, _ref=ref) -> pa.Table:
        ks, tv = ray.get(_ref)
        n = t["nk"].to_numpy(zero_copy_only=False)
        b = t["bc"].to_numpy(zero_copy_only=False)
        ti = np.searchsorted(ks, n)
        share = (b * 1_000_000) // tv[ti]
        sq = share * share  # ≤ 1e12 per row, int64-safe
        # exact integer per-nation sum of share² via sort-reduce
        order = np.argsort(ti, kind="stable")
        tis, sqs = ti[order], sq[order]
        first = np.empty(len(tis), bool)
        if len(tis):
            first[0] = True
            first[1:] = tis[1:] != tis[:-1]
            bounds = np.flatnonzero(first)
            sums = np.add.reduceat(sqs, bounds)
            idx = tis[bounds]
        else:
            sums = np.zeros(0, np.int64)
            idx = tis
        return pa.table(
            {
                "nk": pa.array(ks[idx], pa.int64()),
                "sq": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        rows.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("nk")
        .aggregate(Sum("sq", alias_name="sq"))
        .to_pandas()  # O(nations)
        .sort_values("nk")
    )
    return pa.table(
        {
            "n_nationkey": pa.array(agg["nk"].to_numpy(np.int64), pa.int64()),
            "hhi_e6": pa.array(
                agg["sq"].to_numpy(np.int64) // 1_000_000, pa.int64()
            ),
        }
    )


QUERIES = {
    "split_docs": q_split_docs,
    "sample_docs": q_sample_docs,
    "mixture_docs": q_mixture_docs,
    "row_checks_documents": q_row_checks_documents,
    "events_asof_purchase": q_events_asof_purchase,
    "events_sessionize": q_events_sessionize,
    "events_range_neighbors": q_events_range_neighbors,
    "events_user_deltas": q_events_user_deltas,
    "events_user_window": q_events_user_window,
    "issue_dedup_counts": q_issue_dedup_counts,
    "unique_docs_lang_nchars": q_unique_docs_lang_nchars,
    "fk_orders_customer": q_fk_orders_customer,
    "fk_lineitem_orders_hash": q_fk_lineitem_orders_hash,
    "col_stats_lineitem": q_col_stats_lineitem,
    "distinct_exact": q_distinct_exact,
    "lang_distribution": q_lang_distribution,
    "content_length_hist": q_content_length_hist,
    "events_hourly": q_events_hourly,
    "events_hourly_moving": q_events_hourly_moving,
    "events_props_k": q_events_props_k,
    "pricing_summary": q_pricing_summary,
    "top_building_orders": q_top_building_orders,
    "top_users_by_events": q_top_users_by_events,
    "events_recent_topk": q_events_recent_topk,
    "segment_order_totals": q_segment_order_totals,
    "knn_cosine_ivf": q_knn_cosine_ivf,
    "drift_docs": q_drift_docs,
    "first_docs_per_lang": q_first_docs_per_lang,
    "top_docs_per_lang": q_top_docs_per_lang,
    "entropy_docs": q_entropy_docs,
    "dedup_exact_docs": q_dedup_exact_docs,
    "dedup_exact_props": q_dedup_exact_props,
    "dedup_keep_first": q_dedup_keep_first,
    "dedup_minhash": q_dedup_minhash,
    "dedup_simhash": q_dedup_simhash,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "dedup_jaccard_keep": q_dedup_jaccard_keep,
    "dedup_minhash_keep": q_dedup_minhash_keep,
    "supplier_balance_by_region": q_supplier_balance_by_region,
    "parts_by_brand_size": q_parts_by_brand_size,
    "knn_cosine": q_knn_cosine,
    "cosine_near_dup": q_cosine_near_dup,
    "cosine_dedup_keep": q_cosine_dedup_keep,
    "top_words": q_top_words,
    "bpe_pair_counts": q_bpe_pair_counts,
    "token_count_docs": q_token_count_docs,
    "normalize_docs": q_normalize_docs,
    "lang_id_docs": q_lang_id_docs,
    "quality_docs": q_quality_docs,
    "fingerprint_docs": q_fingerprint_docs,
    "multimodal_decode": q_multimodal_decode,
    "stats_sketches": q_stats_sketches,
    "quantiles_nchars": q_quantiles_nchars,
    "psi_terms_lang": q_psi_terms_lang,
    "multimodal_frames": q_multimodal_frames,
    "pack_sequences": q_pack_sequences,
    "redact_pii_docs": q_redact_pii_docs,
    "decontaminate_docs": q_decontaminate_docs,
    "pretrain_corpus": q_pretrain_corpus,
    "pretrain_corpus_fuzzy": q_pretrain_corpus_fuzzy,
    "repetition_docs": q_repetition_docs,
    "lm_score_docs": q_lm_score_docs,
    "dsir_weights_docs": q_dsir_weights_docs,
    "dsir_resample_docs": q_dsir_resample_docs,
    "decontaminate_fuzzy_docs": q_decontaminate_fuzzy_docs,
    "chunk_docs": q_chunk_docs,
    "ccnet_buckets": q_ccnet_buckets,
    "heavy_terms_docs": q_heavy_terms_docs,
    "quantize_embeddings": q_quantize_embeddings,
    "pq_codes_embeddings": q_pq_codes_embeddings,
    "knn_cosine_pq": q_knn_cosine_pq,
    "hash_vectorize_docs": q_hash_vectorize_docs,
    "classifier_score_docs": q_classifier_score_docs,
    "subsample_docs": q_subsample_docs,
    "shuffle_docs": q_shuffle_docs,
    "embedding_centroids": q_embedding_centroids,
    "docs_ranked_by_len": q_docs_ranked_by_len,
    "events_ranked_by_value": q_events_ranked_by_value,
    "span_dedup_docs": q_span_dedup_docs,
    "sample_n_per_lang": q_sample_n_per_lang,
    "tfidf_topk_docs": q_tfidf_topk_docs,
    "kmeans_embeddings": q_kmeans_embeddings,
    "embedding_gram": q_embedding_gram,
    "semdedup_embeddings": q_semdedup_embeddings,
    "incremental_new_lineitem": q_incremental_new_lineitem,
    "top_fraction_docs": q_top_fraction_docs,
    "sample_k_docs": q_sample_k_docs,
    "c4_filter_docs": q_c4_filter_docs,
    "distinct_terms_per_lang": q_distinct_terms_per_lang,
    "quantiles_value_by_type": q_quantiles_value_by_type,
    "zscore_events_by_type": q_zscore_events_by_type,
    "events_type_pivot": q_events_type_pivot,
    "top_terms_per_lang": q_top_terms_per_lang,
    "ntile_docs": q_ntile_docs,
    "events_funnel": q_events_funnel,
    "clip_events_by_type": q_clip_events_by_type,
    "diff_docs_halves": q_diff_docs_halves,
    "corr_lineitem": q_corr_lineitem,
    "truncate_docs": q_truncate_docs,
    "bpe_encode_docs": q_bpe_encode_docs,
    "user_features": q_user_features,
    "ewma_events_by_user": q_ewma_events_by_user,
    "locf_events_by_user": q_locf_events_by_user,
    "distinct_terms_per_lang_hll": q_distinct_terms_per_lang_hll,
    "events_funnel_dropoff": q_events_funnel_dropoff,
    "percent_rank_docs": q_percent_rank_docs,
    "tag_docs": q_tag_docs,
    "exact_quantiles_events": q_exact_quantiles_events,
    "user_retention": q_user_retention,
    "new_users_hourly": q_new_users_hourly,
    "vocab_overlap_langs": q_vocab_overlap_langs,
    "k_anonymity_docs": q_k_anonymity_docs,
    "compression_ratio_docs": q_compression_ratio_docs,
    "pagerank_lineitem": q_pagerank_lineitem,
    "triangle_suppliers": q_triangle_suppliers,
    "collocations_docs": q_collocations_docs,
    "fuzzy_supplier_names": q_fuzzy_supplier_names,
    "dedup_lines_docs": q_dedup_lines_docs,
    "intersect_docs_halves": q_intersect_docs_halves,
    "unpivot_lineitem": q_unpivot_lineitem,
    "median_value_by_type": q_median_value_by_type,
    "latest_event_per_user": q_latest_event_per_user,
    "bm25_topk_docs": q_bm25_topk_docs,
    "chi2_lang_source": q_chi2_lang_source,
    "events_user_cumsum": q_events_user_cumsum,
    "returned_revenue_customers": q_returned_revenue_customers,
    "fuzzy_supplier_clusters": q_fuzzy_supplier_clusters,
    "weighted_sample_docs": q_weighted_sample_docs,
    "kcore_suppliers": q_kcore_suppliers,
    "events_user_next": q_events_user_next,
    "centroid_similarity_labels": q_centroid_similarity_labels,
    "customers_without_orders": q_customers_without_orders,
    "quartiles_value_by_type_exact": q_quartiles_value_by_type_exact,
    "revenue_share_by_nation": q_revenue_share_by_nation,
    "mad_outliers_by_type": q_mad_outliers_by_type,
    "minmax_events_by_type": q_minmax_events_by_type,
    "clustering_coeff_suppliers": q_clustering_coeff_suppliers,
    "events_ohlc_hourly": q_events_ohlc_hourly,
    "supplier_hhi_by_nation": q_supplier_hhi_by_nation,
    "copurchase_suppliers": q_copurchase_suppliers,
    "user_event_paths": q_user_event_paths,
    "active_users_24h": q_active_users_24h,
    "customer_order_counts": q_customer_order_counts,
    "inverted_index_terms": q_inverted_index_terms,
    "multimodal_phash_dups": q_multimodal_phash_dups,
    "order_reconciliation": q_order_reconciliation,
    "token_budget_docs": q_token_budget_docs,
    "revenue_by_nation": q_revenue_by_nation,
    "chunk_pairs_docs": q_chunk_pairs_docs,
    "events_hourly_anomaly": q_events_hourly_anomaly,
    "lang_confusion_docs": q_lang_confusion_docs,
    "rollup_lineitem": q_rollup_lineitem,
    "cube_events": q_cube_events,
    "corpus_validate": q_corpus_validate,
}

