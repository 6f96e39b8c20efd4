"""Column statistics: mergeable per-batch partials → actor-pool merge → driver.

Reference analog: distribution analysis (`analyse_distribution`,
extraction/main.py:270-293 — per-type totals + per-code-system counts via
count queries) generalized to streaming column profiles per SURVEY.md §2.5 A7:
count, null-count, min/max, sum/sum², HLL distinct, KLL quantiles,
categorical value counts.

Execution shape (no shuffle — everything is partial+merge):
  read → map_batches(partial_stats_fn)          [stateless tasks, Arrow in]
       → map_batches(StatsMerger, concurrency=K) [actor pool: each actor folds
                                                  many partial rows into few]
       → driver merge of ≤ K·|columns| rows      [tiny]

Partial rows travel as an Arrow table with binary sketch columns, so the merge
stage is itself a Dataset stage with backpressure, not a driver loop.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from fdpg_query_data_validation_ray.functions.hashing import hash64
from fdpg_query_data_validation_ray.functions.sketches import HLL, KLL, DDSketch

# categorical value-count maps larger than this are truncated to the heaviest
# keys (a column that is effectively an ID is not categorical)
MAX_CATEGORICAL = 1024

PARTIAL_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n_rows", pa.int64()),
        ("n_nulls", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("sum_num", pa.float64()),
        ("sum_sq", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("hll", pa.binary()),
        ("kll", pa.binary()),
        # DDSketch: input-deterministic quantiles (state is a pure function of
        # the value multiset — invariant to batch splits and merge order; the
        # KLL column stays for drift KS and for legacy-artifact fallback)
        ("dd", pa.binary()),
        ("cat_counts", pa.binary()),  # pickled dict[str,int] or None
    ]
)


@dataclass
class ColumnPartial:
    column: str
    n_rows: int = 0
    n_nulls: int = 0
    min_num: float | None = None
    max_num: float | None = None
    sum_num: float = 0.0
    sum_sq: float = 0.0
    min_str: str | None = None
    max_str: str | None = None
    hll: HLL = field(default_factory=HLL)
    kll: KLL = field(default_factory=KLL)
    # None (not an empty sketch) when this partial was loaded from a legacy
    # artifact that predates the dd column — finalize then falls back to KLL
    dd: DDSketch | None = field(default_factory=DDSketch)
    cat_counts: dict | None = None
    # True once ANY truncation to MAX_CATEGORICAL happened anywhere in this
    # partial's merge lineage — per-value counts downstream are then lower
    # bounds, not exact (partial merges drop tail keys lossily)
    cat_overflow: bool = False

    def merge(self, o: "ColumnPartial") -> "ColumnPartial":
        self.n_rows += o.n_rows
        self.n_nulls += o.n_nulls
        for attr, op in (("min_num", min), ("max_num", max), ("min_str", min), ("max_str", max)):
            a, b = getattr(self, attr), getattr(o, attr)
            setattr(self, attr, b if a is None else (a if b is None else op(a, b)))
        self.sum_num += o.sum_num
        self.sum_sq += o.sum_sq
        self.hll.merge(o.hll)
        self.kll.merge(o.kll)
        if self.dd is None or o.dd is None:
            self.dd = None  # any legacy partial in the lineage poisons dd
        else:
            self.dd.merge(o.dd)
        self.cat_overflow = self.cat_overflow or o.cat_overflow
        if o.cat_counts is not None:
            if self.cat_counts is None:
                self.cat_counts = dict(o.cat_counts)
            else:
                for k, v in o.cat_counts.items():
                    self.cat_counts[k] = self.cat_counts.get(k, 0) + v
        if self.cat_counts is not None and len(self.cat_counts) > MAX_CATEGORICAL:
            keep = sorted(self.cat_counts.items(), key=lambda kv: (-kv[1], kv[0]))
            self.cat_counts = dict(keep[:MAX_CATEGORICAL])
            self.cat_overflow = True
        return self


def _partial_from_array(name: str, col: pa.ChunkedArray, categorical: bool) -> ColumnPartial:
    import pyarrow.compute as pc

    p = ColumnPartial(name)
    p.n_rows = len(col)
    p.n_nulls = col.null_count
    valid = pc.drop_null(col)
    if len(valid) == 0:
        return p
    is_num = pa.types.is_integer(valid.type) or pa.types.is_floating(valid.type)
    if is_num:
        arr = valid.to_numpy(zero_copy_only=False).astype(np.float64)
        p.min_num = float(arr.min())
        p.max_num = float(arr.max())
        p.sum_num = float(arr.sum())
        p.sum_sq = float((arr * arr).sum())
        p.kll.add_values(arr)
        p.dd.add_values(arr)
        p.hll.add_hashes(hash64(arr))
    else:
        svals = pc.cast(valid, pa.string())
        mm = pc.min_max(svals)
        p.min_str = mm["min"].as_py()
        p.max_str = mm["max"].as_py()
        p.hll.add_hashes(hash64(svals))
        # string length profile feeds the quantile sketches (content-length
        # drift, SURVEY §2.5 A3)
        slens = pc.utf8_length(svals).to_numpy(zero_copy_only=False).astype(np.float64)
        p.kll.add_values(slens)
        p.dd.add_values(slens)
    if categorical:
        vc = pc.value_counts(pc.cast(valid, pa.string()))
        p.cat_counts = {
            d["values"]: d["counts"] for d in vc.to_pylist()
        }
        if len(p.cat_counts) > MAX_CATEGORICAL:
            keep = sorted(p.cat_counts.items(), key=lambda kv: (-kv[1], kv[0]))
            p.cat_counts = dict(keep[:MAX_CATEGORICAL])
            p.cat_overflow = True
    return p


def _partials_to_table(partials: list[ColumnPartial]) -> pa.Table:
    return pa.table(
        {
            "column": [p.column for p in partials],
            "n_rows": [p.n_rows for p in partials],
            "n_nulls": [p.n_nulls for p in partials],
            "min_num": [p.min_num for p in partials],
            "max_num": [p.max_num for p in partials],
            "sum_num": [p.sum_num for p in partials],
            "sum_sq": [p.sum_sq for p in partials],
            "min_str": [p.min_str for p in partials],
            "max_str": [p.max_str for p in partials],
            "hll": [p.hll.to_bytes() for p in partials],
            "kll": [p.kll.to_bytes() for p in partials],
            "dd": [None if p.dd is None else p.dd.to_bytes() for p in partials],
            # (dict, overflow) tuple — the overflow flag rides inside the
            # existing binary column so legacy artifacts stay readable and the
            # union schema is unchanged; loads handle both forms
            "cat_counts": [
                None
                if p.cat_counts is None
                else pickle.dumps((p.cat_counts, p.cat_overflow), protocol=4)
                for p in partials
            ],
        },
        schema=PARTIAL_SCHEMA,
    )


def _partials_from_table(t: pa.Table) -> list[ColumnPartial]:
    out = []
    for row in t.to_pylist():
        p = ColumnPartial(row["column"])
        p.n_rows = row["n_rows"]
        p.n_nulls = row["n_nulls"]
        p.min_num = row["min_num"]
        p.max_num = row["max_num"]
        p.sum_num = row["sum_num"] or 0.0
        p.sum_sq = row["sum_sq"] or 0.0
        p.min_str = row["min_str"]
        p.max_str = row["max_str"]
        p.hll = HLL.from_bytes(row["hll"])
        p.kll = KLL.from_bytes(row["kll"])
        # legacy artifacts (pre-dd) have no dd column / a null cell: mark the
        # partial so merge/finalize fall back to KLL instead of understating
        raw_dd = row.get("dd")
        p.dd = DDSketch.from_bytes(raw_dd) if raw_dd is not None else None
        if row["cat_counts"] is None:
            p.cat_counts = None
        else:
            loaded = pickle.loads(row["cat_counts"])
            if isinstance(loaded, tuple):
                p.cat_counts, p.cat_overflow = loaded[0], bool(loaded[1])
            else:  # legacy artifacts: bare dict, overflow unknown → False
                p.cat_counts = loaded
        out.append(p)
    return out


class PartialStats:
    """Stateless-shaped stage (used as an actor pool so column config is
    parsed once): one Arrow batch in → one partial row per profiled column."""

    def __init__(self, columns: list[str] | None = None, categorical: list[str] | None = None):
        self.columns = columns
        self.categorical = set(categorical or [])

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        partials = [
            _partial_from_array(c, batch.column(c), c in self.categorical) for c in cols
        ]
        return _partials_to_table(partials)


class StatsMerger:
    """Actor-pool merge stage: folds many partial rows into one row per column
    per incoming batch. Stacking this stage gives a merge tree; the driver
    only ever merges (#actors × #columns) rows."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        merged: dict[str, ColumnPartial] = {}
        for p in _partials_from_table(batch):
            if p.column in merged:
                merged[p.column].merge(p)
            else:
                merged[p.column] = p
        return _partials_to_table([merged[k] for k in sorted(merged)])


QUANTILES = (0.01, 0.25, 0.5, 0.75, 0.9, 0.99)


def finalize(partials: list[ColumnPartial]) -> dict[str, dict]:
    """Merge partials per column (deterministic order) and emit plain-dict
    stats — the shape embedded into verdicts and the drift snapshot."""
    by_col: dict[str, ColumnPartial] = {}
    for p in partials:
        if p.column in by_col:
            by_col[p.column].merge(p)
        else:
            by_col[p.column] = p
    out = {}
    for name in sorted(by_col):
        p = by_col[name]
        non_null = p.n_rows - p.n_nulls
        stats = {
            "count": p.n_rows,
            "nulls": p.n_nulls,
            "null_ratio": (p.n_nulls / p.n_rows) if p.n_rows else 0.0,
            "distinct_hll": round(p.hll.estimate(), 1),
        }
        if p.min_num is not None:
            # mean/std rounded: float partial sums regroup across batch splits,
            # so last-ulp noise must not leak into the deterministic report
            stats.update(
                min=p.min_num,
                max=p.max_num,
                mean=round(p.sum_num / non_null, 6) if non_null else None,
            )
            if non_null > 1:
                var = max(0.0, p.sum_sq / non_null - (p.sum_num / non_null) ** 2)
                stats["std"] = round(float(np.sqrt(var)), 6)
        if p.min_str is not None:
            stats.update(min=p.min_str, max=p.max_str)
        # quantiles come from the DDSketch (input-deterministic: same multiset
        # → same answer, regardless of batch split / merge order); the KLL is
        # the fallback for partials loaded from legacy artifacts
        qsk = p.dd if (p.dd is not None and p.dd.n) else (p.kll if p.kll.n else None)
        if qsk is not None:
            stats["quantiles"] = {
                f"p{int(q * 100):02d}": round(qsk.quantile(q), 6) for q in QUANTILES
            }
        if p.cat_counts is not None:
            stats["value_counts"] = dict(
                sorted(p.cat_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
            )
        out[name] = stats
    return out


def collect_partials(
    ds,
    columns: list[str] | None = None,
    categorical: list[str] | None = None,
    merge_concurrency: int = 2,
    batch_size: int = 8192,
) -> dict[str, ColumnPartial]:
    """Stream a Dataset into merged ColumnPartials (sketches intact — input to
    both `finalize` and drift `Snapshot.from_partials`).

    Partial per batch → actor-pool merge → driver fold; the driver sees only
    merged partial rows, never data rows.
    """
    # both stages are stateless tasks (elastic, no CPU reservation ahead of
    # time). The merge stage folds each 256-partial batch within one task —
    # StatsMerger keeps no cross-batch state, so an actor pool here bought
    # nothing but its ~0.5-1 s startup latency (measured; removing it cut
    # col_stats_lineitem ~2.4 → ~1.5 s at sf0.1/32). merge_concurrency now
    # caps the merge stage's task parallelism (sketch payloads are the big
    # per-task heap item) rather than reserving actors.
    partial_fn = PartialStats(columns=columns, categorical=categorical)
    partial_ds = ds.map_batches(
        partial_fn,
        batch_format="pyarrow",
        batch_size=batch_size,
    ).map_batches(
        StatsMerger(),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=int(merge_concurrency) if merge_concurrency else None,
    )
    merged: dict[str, ColumnPartial] = {}
    for b in partial_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for p in _partials_from_table(t):
            if p.column in merged:
                merged[p.column].merge(p)
            else:
                merged[p.column] = p
    return merged


def column_stats(
    ds,
    columns: list[str] | None = None,
    categorical: list[str] | None = None,
    merge_concurrency: int = 2,
    batch_size: int = 8192,
) -> dict[str, dict]:
    """End-to-end column profile of a Dataset. Returns {column: stats dict}."""
    merged = collect_partials(
        ds, columns=columns, categorical=categorical,
        merge_concurrency=merge_concurrency, batch_size=batch_size,
    )
    return finalize(list(merged.values()))


def distinct_count_per_key(ds, key_column: str, value_column: str,
                           alias: str = "n_distinct",
                           batch_size: int = 8192):
    """Exact COUNT(DISTINCT value) GROUP BY key — the grouped-distinct
    workhorse next to the global `q_distinct_exact` plan and the HLL
    estimate (`hll_column`): per-batch LOCAL (key, value) dedup acts as the
    combiner (each batch contributes each pair once, so the exchange moves
    distinct-pair rows, never data rows), ONE groupby dedups pairs globally,
    and a tiny per-key Count finishes. Null keys and null values are
    excluded, matching SQL COUNT(DISTINCT) + non-null grouping. Driver never
    sees data; output is O(distinct keys)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def local_pairs(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_column], pa.string())
        v = pc.cast(t[value_column], pa.string())
        mask = pc.and_(pc.is_valid(k), pc.is_valid(v))
        df = pd.DataFrame(
            {
                key_column: k.filter(mask).to_numpy(zero_copy_only=False),
                value_column: v.filter(mask).to_numpy(zero_copy_only=False),
            }
        ).drop_duplicates()
        return pa.table(
            {
                key_column: pa.array(df[key_column], pa.string()),
                value_column: pa.array(df[value_column], pa.string()),
            }
        )

    pairs = (
        ds.map_batches(local_pairs, batch_format="pyarrow", batch_size=batch_size)
        .groupby([key_column, value_column])
        .aggregate(Count(alias_name="_n"))
    )
    return pairs.groupby(key_column).aggregate(Count(alias_name=alias))


def quantile_by_key(ds, key_column: str, value_column: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                    alpha: float = 0.01,
                    batch_size: int = 8192,
                    high_cardinality: bool = False):
    """Grouped quantiles at scale: per-key DDSketch — GROUP BY key +
    percentile, the grouped leg next to the global `quantiles_nchars` plan.

    Per batch, ONE lexsort groups the batch's rows by key and each key's
    positive values feed a DDSketch (the per-key loop is over distinct keys
    in the batch, not rows; add_values is vectorized). The exchange then
    moves (key, sketch-bytes) rows — O(keys × blocks), bounded per row by
    the sketch's bucket count, never data rows. A key-hash COARSE partition
    merge (one pandas group per part, same plan as stages/temporal.py)
    merges each key's sketches — commutative counter addition, so results
    are identical under any batching/partitioning — and emits len(qs) rows
    per key.

    Exactness contract: the DD bucket index is a pure function of the value
    (ceil(ln(x)/ln(gamma))), so a SQL oracle that replays the bucket math
    per group reproduces the SAME quantile values, hash-exact (see the
    quantiles_nchars oracle). Only positive values rank (DD positive store;
    mirror with WHERE x > 0); null/≤0-only keys emit nothing.

    Cardinality contract (the pivot_counts lesson): the per-batch sketch
    combiner pays only when keys-per-batch ≪ batch rows — at key
    cardinality ≈ batch size it emits O(keys × blocks) sketch blobs. Set
    `high_cardinality=True` to instead route SKINNY (key, value, part)
    rows once and build each key's single sketch inside its part —
    exchange O(rows) skinny rows, output O(keys), results IDENTICAL (DD
    state is a pure function of the value multiset)."""
    import pandas as pd
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def local_sketch(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_column], pa.string())
        x = pc.cast(t[value_column], pa.float64())
        mask = pc.and_(pc.is_valid(k), pc.greater(x, 0.0))
        k = k.filter(mask).to_numpy(zero_copy_only=False)
        x = x.filter(mask).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table(
                {
                    key_column: pa.array([], pa.string()),
                    "dd": pa.array([], pa.binary()),
                    "part": pa.array([], pa.int32()),
                }
            )
        codes, uniques = pd.factorize(pd.Series(k), sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s, x_s = codes[order], x[order]
        starts = np.flatnonzero(
            np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        )
        ends = np.append(starts[1:], len(codes_s))
        keys_out, blobs = [], []
        for s, e in zip(starts, ends):
            sk = DDSketch(alpha)
            sk.add_values(x_s[s:e])
            keys_out.append(uniques[codes_s[s]])
            blobs.append(sk.to_bytes())
        ko = pa.array(keys_out, pa.string())
        part = pa.array(
            (hash64(ko) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pa.table(
            {key_column: ko, "dd": pa.array(blobs, pa.binary()), "part": part}
        )

    qs_arr = np.asarray(qs, dtype=np.float64)

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        keys_out, q_out, v_out = [], [], []
        for key, grp in g.groupby(key_column, sort=False):
            merged = DDSketch(alpha)
            for raw in grp["dd"]:
                merged.merge(DDSketch.from_bytes(raw))
            if merged.n == 0:
                continue
            for q in qs_arr:
                keys_out.append(key)
                q_out.append(float(q))
                v_out.append(int(np.floor(merged.quantile(q) * 1e6 + 0.5)))
        return pd.DataFrame(
            {
                key_column: pd.Series(keys_out, dtype="string"),
                "q": pd.Series(q_out, dtype="float64"),
                "value_micro": pd.Series(v_out, dtype="int64"),
            }
        )

    def route_rows(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_column], pa.string()).combine_chunks()
        x = pc.cast(t[value_column], pa.float64())
        mask = pc.and_(pc.is_valid(k), pc.greater(x, 0.0))
        k = pc.filter(k, mask).combine_chunks()
        x = pc.filter(x, mask).combine_chunks()
        part = pa.array(
            (hash64(k) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pa.table({key_column: k, "x": x, "part": part})

    def sketch_part(g: pd.DataFrame) -> pd.DataFrame:
        keys_out, q_out, v_out = [], [], []
        codes, uniques = pd.factorize(g[key_column], sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s = codes[order]
        x_s = g["x"].to_numpy(dtype=np.float64)[order]
        starts = np.flatnonzero(
            np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        ) if len(codes_s) else np.array([], np.int64)
        ends = np.append(starts[1:], len(codes_s))
        for s_, e_ in zip(starts, ends):
            sk = DDSketch(alpha)
            sk.add_values(x_s[s_:e_])
            if sk.n == 0:
                continue
            for q in qs_arr:
                keys_out.append(uniques[codes_s[s_]])
                q_out.append(float(q))
                v_out.append(int(np.floor(sk.quantile(q) * 1e6 + 0.5)))
        return pd.DataFrame(
            {
                key_column: pd.Series(keys_out, dtype="string"),
                "q": pd.Series(q_out, dtype="float64"),
                "value_micro": pd.Series(v_out, dtype="int64"),
            }
        )

    if high_cardinality:
        routed = ds.map_batches(route_rows, batch_format="pyarrow",
                                batch_size=batch_size)
        return routed.groupby("part").map_groups(sketch_part,
                                                 batch_format="pandas")
    sketches = ds.map_batches(
        local_sketch, batch_format="pyarrow", batch_size=batch_size
    )
    return sketches.groupby("part").map_groups(merge_part, batch_format="pandas")


def zscore_by_key(ds_moments, ds_rows, key_column: str, value_column: str,
                  id_column: str, scale: int = 100,
                  max_keys: int = 1_000_000):
    """Per-group standardization: z = (x − mean_key) / std_key — the score-
    normalization step quality pipelines apply before combining signals
    across heterogeneous groups (per-language perplexity, per-source length,
    …). Two-pass broadcast plan, NO row shuffle:

      pass 1 (ds_moments): values quantize to `scale` fixed-point ints, a
        per-batch groupby emits (key, n, sum_e, ssq_e) partials — the
        combiner — and ONE tiny groupby sums them; the driver receives only
        O(keys) moment rows (guarded by `max_keys`), never data.
      pass 2 (ds_rows): the moment dict broadcasts via ray.put and a
        map_batches computes each row's z with ZERO exchange.

    Exactness contract: n, sum_e = Σx_e, ssq_e = Σx_e² are exact int64
    (x_e ≤ ~3e6 ⇒ x_e² ≤ ~9e12 ⇒ ~1e6 rows/key before int64 pressure —
    guard asserts), and the float finish is ONE fixed IEEE sequence
    replayed verbatim in the oracle:

        z_e6 = FLOOR((x_e − sum_e/n) / sqrt(ssq_e/n − (sum_e/n)*(sum_e/n))
                     * 1e6 + 0.5)

    Rows whose key has n < 2 or zero variance emit NULL z (SQL STDDEV-ish
    degeneracy); null keys/values are excluded on both sides."""
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    def partial_moments(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_column], pa.string())
        x = pc.cast(t[value_column], pa.float64())
        mask = pc.and_(pc.is_valid(k), pc.and_(pc.is_valid(x),
                                               pc.invert(pc.is_nan(x))))
        k = k.filter(mask)
        x_e = pc.cast(
            pc.floor(pc.add(pc.multiply(x.filter(mask), float(scale)), 0.5)),
            pa.int64(),
        )
        pt = pa.table({key_column: k, "x_e": x_e})
        sq = pc.multiply(pt["x_e"], pt["x_e"])
        pt = pt.append_column("sq", sq)
        g = pt.group_by([key_column]).aggregate(
            [("x_e", "count"), ("x_e", "sum"), ("sq", "sum")]
        )
        return g.rename_columns([key_column, "n", "sum_e", "ssq_e"])

    from ray.data.aggregate import Sum

    moments = (
        ds_moments.map_batches(partial_moments, batch_format="pyarrow",
                               batch_size=16384)
        .groupby(key_column)
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_e", alias_name="sum_e"),
                   Sum("ssq_e", alias_name="ssq_e"))
    )
    mt = moments.to_pandas()
    if len(mt) > max_keys:
        raise ValueError(
            f"zscore_by_key: {len(mt)} keys exceed the broadcast budget "
            f"({max_keys}); standardize within coarser groups or raise it"
        )
    keys = mt[key_column].tolist()
    lut = (
        dict(zip(keys, mt["n"].astype("int64"))),
        dict(zip(keys, mt["sum_e"].astype("int64"))),
        dict(zip(keys, mt["ssq_e"].astype("int64"))),
    )
    lut_ref = ray.put(lut)

    def score(t: pa.Table) -> pa.Table:
        import ray as _ray

        m = _ray.get(lut_ref) if isinstance(lut_ref, _ray.ObjectRef) else lut_ref
        k = pc.cast(t[key_column], pa.string())
        x = pc.cast(t[value_column], pa.float64())
        mask = pc.and_(pc.is_valid(k), pc.and_(pc.is_valid(x),
                                               pc.invert(pc.is_nan(x))))
        t = t.filter(mask)
        k = pc.cast(t[key_column], pa.string()).to_pandas()
        x_e = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(t[value_column], pa.float64()),
                                        float(scale)), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        d_n, d_s, d_q = m
        nn = k.map(d_n).to_numpy(dtype=np.float64, na_value=0.0)
        se = k.map(d_s).to_numpy(dtype=np.float64, na_value=0.0)
        sq = k.map(d_q).to_numpy(dtype=np.float64, na_value=0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = se / nn
            var = sq / nn - mean * mean
            std = np.sqrt(var)
            z = (x_e - mean) / std
            z_e6 = np.floor(z * 1e6 + 0.5)
        ok = (nn >= 2) & (var > 0) & np.isfinite(z_e6)
        out = pd.array(np.where(ok, z_e6, 0).astype(np.int64), dtype="Int64")
        out[~ok] = pd.NA
        return pa.table(
            {
                id_column: t[id_column],
                key_column: t[key_column],
                "z_e6": pa.array(out, pa.int64()),
            }
        )

    return ds_rows.map_batches(score, batch_format="pyarrow",
                               batch_size=16384)


def pivot_counts(ds, key_column: str, pivot_column: str,
                 values: list[str], other_alias: str = "n_other",
                 sum_columns: dict[str, str] | None = None,
                 batch_size: int = 16384):
    """Pivot / one-hot aggregate: one row per key with COUNT(*) per pivot
    value as WIDE columns (n_<value> …, plus `other_alias` for values
    outside the list) — the GROUP BY + COUNT(*) FILTER / PIVOT workhorse
    that turns an event log into a per-entity feature vector.

    The pivot domain must be declared (same contract as SQL PIVOT … IN):
    wide schemas need fixed columns.

    Plan: the COARSE key-hash partition shape (stages/temporal.py), not a
    per-batch wide combiner — measured at 12M rows / 50k keys, a per-batch
    combiner compresses almost nothing when key cardinality ≈ batch size
    (each 16k-row batch still holds ~14k distinct keys), so it shipped
    ~10M WIDE partial rows into the final groupby: 126 s. This plan moves
    each input row ONCE as a skinny (key, value-index, part) triple, and
    each part builds its keys' full count matrix with ONE factorize +
    np.add.at scatter — output is O(keys) rows, 11 s on the same input.
    Null keys are excluded (SQL non-null grouping); null pivot values
    count toward `other_alias`.

    `sum_columns={"out": "in"}` additionally emits per-key int64 SUMs of
    the listed input columns riding the SAME exchange (nulls add 0) —
    measured vs a separate native groupby-Sum of 12M skinny rows: 49 s
    saved by not shuffling twice."""
    import pandas as pd
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    val_cols = [f"n_{v}" for v in values]
    val_idx = {v: i for i, v in enumerate(values)}
    n_vals = len(values)
    n_parts = _verify_parts()
    sums = sum_columns or {}

    def route(t: pa.Table) -> pa.Table:
        k = t[key_column].combine_chunks()
        t = t.filter(pc.is_valid(k))
        pv = t[pivot_column].to_pandas()
        vi = pv.map(val_idx).fillna(n_vals).to_numpy(dtype=np.int64)
        k2 = t[key_column].combine_chunks()
        part = pa.array(
            (hash64(k2) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        cols = {key_column: k2, "_vi": pa.array(vi, pa.int64()),
                "part": part}
        for out_c, in_c in sums.items():
            cols[out_c] = pc.fill_null(pc.cast(t[in_c], pa.int64()), 0)
        return pa.table(cols)

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {key_column: pd.Series(dtype="object"),
                 **{c: pd.Series(dtype="int64")
                    for c in val_cols + [other_alias] + list(sums)}}
            )
        codes, uniques = pd.factorize(g[key_column], sort=False)
        m = np.zeros((len(uniques), n_vals + 1), dtype=np.int64)
        np.add.at(m, (codes, g["_vi"].to_numpy()), 1)
        out = {key_column: np.asarray(uniques)}
        for j, c in enumerate(val_cols):
            out[c] = m[:, j]
        out[other_alias] = m[:, n_vals]
        for out_c in sums:
            acc = np.zeros(len(uniques), dtype=np.int64)
            np.add.at(acc, codes, g[out_c].to_numpy(dtype=np.int64))
            out[out_c] = acc
        return pd.DataFrame(out)

    routed = ds.map_batches(route, batch_format="pyarrow",
                            batch_size=batch_size)
    return routed.groupby("part").map_groups(per_part, batch_format="pandas")


def clip_by_key_quantiles(ds_build, ds_rows, key_column: str,
                          value_column: str, id_column: str,
                          lo_q: float = 0.05, hi_q: float = 0.95,
                          alpha: float = 0.01, max_keys: int = 1_000_000):
    """Per-group winsorization: clamp every row's value to its key's
    [lo_q, hi_q] quantile band — the robust-clipping step feature pipelines
    apply before scaling (outlier capping that adapts per group). Two-pass
    broadcast plan like zscore_by_key:

      pass 1: `quantile_by_key` (per-key DDSketch, (key, sketch) exchange)
        yields the per-key band; the driver holds O(keys) rows
        (budget-guarded) and broadcasts a {key: (lo_e6, hi_e6)} LUT.
      pass 2: zero-exchange map_batches clamps each row's e6-quantized
        value with two vectorized min/max.

    Exactness: the DD bucket index is a pure function of the value, so the
    SQL oracle replays the SAME band (the quantiles_value_by_type bucket
    math) and LEAST/GREATEST on the same e6 ints — hash-exact. DD ranks
    positive values only; rows with value ≤ 0 / null / null key are
    excluded on both sides."""
    import pandas as pd
    import pyarrow.compute as pc

    import ray

    bands = quantile_by_key(ds_build, key_column, value_column,
                            qs=(lo_q, hi_q), alpha=alpha).to_pandas()
    n_keys = bands[key_column].nunique()
    if n_keys > max_keys:
        raise ValueError(
            f"clip_by_key_quantiles: {n_keys} keys exceed the broadcast "
            f"budget ({max_keys})"
        )
    lo = bands[bands["q"] == lo_q].set_index(key_column)["value_micro"]
    hi = bands[bands["q"] == hi_q].set_index(key_column)["value_micro"]
    lut_ref = ray.put((lo.to_dict(), hi.to_dict()))

    def clamp(t: pa.Table) -> pa.Table:
        d_lo, d_hi = ray.get(lut_ref) if isinstance(
            lut_ref, ray.ObjectRef) else lut_ref
        k = pc.cast(t[key_column], pa.string())
        x = pc.cast(t[value_column], pa.float64())
        mask = pc.and_(pc.is_valid(k),
                       pc.and_(pc.is_valid(x), pc.greater(x, 0.0)))
        t = t.filter(mask)
        ks = pc.cast(t[key_column], pa.string()).to_pandas()
        x_e6 = pc.cast(
            pc.floor(pc.add(pc.multiply(pc.cast(t[value_column],
                                                pa.float64()),
                                        1e6), 0.5)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        lo_v = ks.map(d_lo).to_numpy(dtype=np.float64, na_value=np.nan)
        hi_v = ks.map(d_hi).to_numpy(dtype=np.float64, na_value=np.nan)
        ok = ~np.isnan(lo_v)
        clipped = np.clip(x_e6, np.where(ok, lo_v, -np.inf),
                          np.where(ok, hi_v, np.inf)).astype(np.int64)
        return pa.table(
            {
                id_column: t[id_column],
                key_column: t[key_column],
                "value_e6": pa.array(x_e6, pa.int64()),
                "clipped_e6": pa.array(clipped, pa.int64()),
            }
        )

    return ds_rows.map_batches(clamp, batch_format="pyarrow",
                               batch_size=16384)


def _null_fill_scalar(dtype: pa.DataType):
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return pa.scalar("", dtype)
    if pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
        return pa.scalar(b"", dtype)
    return pa.scalar(0, dtype)


def _null_safe_keys(columns: list[str]):
    """Ray's native groupby exchange partitions blocks with
    np.searchsorted over raw key values; a sampled NULL boundary against a
    string column raises `'<' not supported between NoneType and str`
    (layout-dependent — it depends which values the sort sampler picks).
    Encode each key column as (filled value, is-null flag) before the
    groupby and restore nulls after: exact for every type, no sentinel
    collisions. Returns (encode_fn, decode_fn, grouped_column_names)."""
    import pyarrow.compute as pc

    flags = [f"__nn_{c}" for c in columns]

    def enc(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            cols[c] = t[c]
        for c in columns:
            col = t[c]
            typ = col.type if not isinstance(col, pa.ChunkedArray) else col.type
            cols[f"__nn_{c}"] = pc.is_valid(col)
            cols[c] = pc.fill_null(col, _null_fill_scalar(typ))
        return pa.table(cols)

    def dec(t: pa.Table) -> pa.Table:
        cols = {}
        for c in t.column_names:
            if c in flags:
                continue
            if c in columns:
                col = t[c]
                cols[c] = pc.if_else(
                    t[f"__nn_{c}"], col, pa.scalar(None, col.type)
                )
            else:
                cols[c] = t[c]
        return pa.table(cols)

    return enc, dec, columns + flags


def multiset_diff(ds_a, ds_b, columns: list[str],
                  batch_size: int = 16384):
    """Distributed multiset comparison — EXCEPT ALL in both directions at
    once: one row per `columns` tuple whose multiplicity differs between
    the two datasets, with both counts (n_a, n_b). The pipeline-regression
    primitive: "did this refactor change the output?", "what did the new
    filter remove?" — a full-row diff that never collects rows.

    Per side, a per-batch groupby-count partial is the combiner (the
    exchange moves distinct-tuple count rows, never data rows); the two
    partial streams UNION (Ray Dataset union is zero-copy lazy) into ONE
    groupby over the tuple columns summing per-side counts; equal-count
    tuples drop. Null tuple components group like SQL's IS NOT DISTINCT
    (DuckDB GROUP BY treats NULLs as equal), so diffs are exact on null
    rows too. Output is O(distinct differing tuples)."""
    from ray.data.aggregate import Sum

    def partial(side: int):
        def f(t: pa.Table) -> pa.Table:
            g = t.select(columns).group_by(columns).aggregate(
                [([], "count_all")]
            )
            n = g.column("count_all")
            zero = pa.array(np.zeros(len(n), np.int64))
            return pa.table(
                {
                    **{c: g[c] for c in columns},
                    "n_a": n if side == 0 else zero,
                    "n_b": zero if side == 0 else n,
                }
            )
        return f

    enc, dec, group_cols = _null_safe_keys(columns)
    pa_ = ds_a.map_batches(partial(0), batch_format="pyarrow",
                           batch_size=batch_size).map_batches(
        enc, batch_format="pyarrow")
    pb_ = ds_b.map_batches(partial(1), batch_format="pyarrow",
                           batch_size=batch_size).map_batches(
        enc, batch_format="pyarrow")
    summed = (
        pa_.union(pb_)
        .groupby(group_cols)
        .aggregate(Sum("n_a", alias_name="n_a"),
                   Sum("n_b", alias_name="n_b"))
    )

    def keep_diff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = dec(t)
        return t.filter(pc.invert(pc.equal(t["n_a"], t["n_b"])))

    return summed.map_batches(keep_diff, batch_format="pyarrow")


def multiset_intersect(ds_a, ds_b, columns: list[str],
                       batch_size: int = 16384):
    """Distributed INTERSECT ALL with counts — the complement of
    multiset_diff: one row per `columns` tuple present in BOTH multisets,
    with n_common = min(multiplicity_a, multiplicity_b) (exactly the
    number of rows SQL INTERSECT ALL would emit for that tuple). Same
    combiner/exchange shape as multiset_diff: per-batch count partials,
    one union, one groupby — output O(distinct shared tuples)."""
    from ray.data.aggregate import Sum

    def partial(side: int):
        def f(t: pa.Table) -> pa.Table:
            g = t.select(columns).group_by(columns).aggregate(
                [([], "count_all")]
            )
            n = g.column("count_all")
            zero = pa.array(np.zeros(len(n), np.int64))
            return pa.table(
                {
                    **{c: g[c] for c in columns},
                    "n_a": n if side == 0 else zero,
                    "n_b": zero if side == 0 else n,
                }
            )

        return f

    enc, dec, group_cols = _null_safe_keys(columns)
    pa_ = ds_a.map_batches(partial(0), batch_format="pyarrow",
                           batch_size=batch_size).map_batches(
        enc, batch_format="pyarrow")
    pb_ = ds_b.map_batches(partial(1), batch_format="pyarrow",
                           batch_size=batch_size).map_batches(
        enc, batch_format="pyarrow")
    summed = (
        pa_.union(pb_)
        .groupby(group_cols)
        .aggregate(Sum("n_a", alias_name="n_a"),
                   Sum("n_b", alias_name="n_b"))
    )

    def keep_common(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = dec(t)
        common = pc.min_element_wise(t["n_a"], t["n_b"])
        t = t.append_column("n_common", pc.cast(common, pa.int64()))
        t = t.filter(pc.greater(t["n_common"], 0))
        return t.drop_columns(["n_a", "n_b"])

    return summed.map_batches(keep_common, batch_format="pyarrow")


def corr_by_key(ds, key_column: str, x_column: str, y_column: str,
                x_scale: int = 1, y_scale: int = 1,
                batch_size: int = 16384):
    """Per-group Pearson correlation — the feature-screening aggregate
    ("which quality signals move together, per language/source?"). Pure
    combiner shape: per batch, ONE pyarrow groupby emits the five exact
    integer moments (n, Σx, Σy, Σxy, Σx², Σy²) over scale-quantized
    values; a tiny Sum groupby merges them; a final zero-exchange map
    finishes

        r = (n·Σxy − Σx·Σy)
            / (sqrt(n·Σx² − Σx·Σx) · sqrt(n·Σy² − Σy·Σy))

    in ONE fixed IEEE sequence (each moment exact int64 → float64), so the
    SQL oracle replays it verbatim, hash-exact. Rows with null key/x/y or
    NaN are excluded; keys with n < 2 or zero variance on either side emit
    NULL. Int64 headroom: per-key Σ(x_e²) must stay below 2^63 — pick
    scales so max|x_e| ≤ ~3e6 at ~1e6 rows/key (the zscore_by_key bound);
    beyond that, standardize per partition first."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        k = t[key_column].combine_chunks()
        x = pc.cast(t[x_column], pa.float64())
        y = pc.cast(t[y_column], pa.float64())
        m = pc.and_(pc.is_valid(k), pc.and_(
            pc.and_(pc.is_valid(x), pc.invert(pc.is_nan(x))),
            pc.and_(pc.is_valid(y), pc.invert(pc.is_nan(y))),
        ))
        t2 = pa.table({key_column: k, "x": x, "y": y}).filter(m)
        xe = pc.cast(pc.floor(pc.add(pc.multiply(t2["x"], float(x_scale)),
                                     0.5)), pa.int64())
        ye = pc.cast(pc.floor(pc.add(pc.multiply(t2["y"], float(y_scale)),
                                     0.5)), pa.int64())
        pt = pa.table(
            {
                key_column: t2[key_column],
                "sx": xe,
                "sy": ye,
                "sxy": pc.multiply(xe, ye),
                "sxx": pc.multiply(xe, xe),
                "syy": pc.multiply(ye, ye),
            }
        )
        g = pt.group_by([key_column]).aggregate(
            [("sx", "count"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum"), ("syy", "sum")]
        )
        return g.rename_columns(
            [key_column, "n", "sx", "sy", "sxy", "sxx", "syy"]
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=batch_size)
        .groupby(key_column)
        .aggregate(*(Sum(c, alias_name=c)
                     for c in ("n", "sx", "sy", "sxy", "sxx", "syy")))
    )

    def finish(t: pa.Table) -> pa.Table:
        import pandas as pd

        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (n * sxy - sx * sy) / (np.sqrt(vx) * np.sqrt(vy))
            r_e6 = np.floor(r * 1e6 + 0.5)
        ok = (n >= 2) & (vx > 0) & (vy > 0) & np.isfinite(r_e6)
        out = pd.array(np.where(ok, r_e6, 0).astype(np.int64), dtype="Int64")
        out[~ok] = pd.NA
        return pa.table(
            {
                key_column: t[key_column],
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "corr_e6": pa.array(out, pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def hll_count_per_key(ds, key_column: str, value_column: str,
                      alias: str = "n_distinct_est",
                      batch_size: int = 8192):
    """Approximate COUNT(DISTINCT value) GROUP BY key via per-key
    HyperLogLog — the SCALE path next to the exact
    `distinct_count_per_key`: when per-key distinct cardinalities are huge
    (URLs per domain, tokens per language at 100 TB), the exact pair
    exchange moves O(distinct pairs) rows while this plan's exchange moves
    (key, 2^p-byte sketch) rows — O(keys × blocks) bounded bytes
    regardless of cardinality.

    Same kernel shape as quantile_by_key: per batch ONE lexsort groups
    rows by key, each key's values feed an HLL (add_hashes over hash64 —
    input-deterministic, so results are identical under any
    batching/partitioning: register maxima are order-free); a coarse
    key-hash partition merge ORs registers and emits one estimate row per
    key. Null keys/values excluded (COUNT(DISTINCT) semantics). Estimate
    error ~1.04/sqrt(2^p) (p=12 → ~1.6%); rows-only correctness (the
    estimator has no SQL form), tolerance-pinned against the exact plan."""
    import pandas as pd
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.stages.dedup import _verify_parts

    n_parts = _verify_parts()

    def local_sketch(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_column], pa.string()).combine_chunks()
        v = t[value_column].combine_chunks()
        mask = pc.and_(pc.is_valid(k), pc.is_valid(v))
        k = k.filter(mask).to_numpy(zero_copy_only=False)
        hv = hash64(v.filter(mask))
        if len(k) == 0:
            return pa.table(
                {
                    key_column: pa.array([], pa.string()),
                    "hll": pa.array([], pa.binary()),
                    "part": pa.array([], pa.int32()),
                }
            )
        codes, uniques = pd.factorize(pd.Series(k), sort=False)
        order = np.argsort(codes, kind="stable")
        codes_s, hv_s = codes[order], hv[order]
        starts = np.flatnonzero(
            np.concatenate([[True], codes_s[1:] != codes_s[:-1]])
        )
        ends = np.append(starts[1:], len(codes_s))
        keys_out, blobs = [], []
        for s, e in zip(starts, ends):
            sk = HLL()
            sk.add_hashes(hv_s[s:e])
            keys_out.append(uniques[codes_s[s]])
            blobs.append(sk.to_bytes())
        ko = pa.array(keys_out, pa.string())
        part = pa.array(
            (hash64(ko) & np.uint64(n_parts - 1)).astype(np.int32)
        )
        return pa.table(
            {key_column: ko, "hll": pa.array(blobs, pa.binary()),
             "part": part}
        )

    def merge_part(g: pd.DataFrame) -> pd.DataFrame:
        keys_out, est = [], []
        for key, grp in g.groupby(key_column, sort=False):
            merged = HLL()
            for raw in grp["hll"]:
                merged.merge(HLL.from_bytes(raw))
            keys_out.append(key)
            est.append(int(round(merged.estimate())))
        return pd.DataFrame(
            {
                key_column: pd.Series(keys_out, dtype="string"),
                alias: pd.Series(est, dtype="int64"),
            }
        )

    sketches = ds.map_batches(
        local_sketch, batch_format="pyarrow", batch_size=batch_size
    )
    return sketches.groupby("part").map_groups(merge_part,
                                               batch_format="pandas")
