"""Scale datapoints for the behavioral operators: funnel_first_conversion
and the composed user_features build, on a synthetic 12M-row event log
(50k users, 5 event types, 30-day span, 2% null values).

Funnel exactness at scale is cross-checked against DuckDB's nested-EXISTS
form on a user-sliced subset (every 20th user — the subset is decided by
key, so engine-vs-oracle parity on it is exact), because the full 12M
nested EXISTS is quadratic in DuckDB; engine-side partition invariance at
the full size is covered by the unit tests' invariance property.

Usage: python tools/funnel_scale.py [n_rows] [n_users]   # default 12M, 50k
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1_000_000
SPAN_US = 30 * 24 * 3600 * 1_000_000
W_US = 6 * 3600 * 1_000_000
TYPES = np.array(["click", "view", "purchase", "signup", "error"],
                 dtype=object)


def gen(path: str, n_rows: int, n_users: int) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(59)
    for part, lo in enumerate(range(0, n_rows, CHUNK)):
        n = min(CHUNK, n_rows - lo)
        vals = np.round(rng.normal(40, 15, n), 2)
        vals[rng.random(n) < 0.02] = np.nan
        t = pa.table(
            {
                "event_id": pa.array(np.arange(lo, lo + n), pa.int64()),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "ts": pa.array(
                    rng.integers(0, SPAN_US, n).astype("datetime64[us]")
                ),
                "event_type": pa.array(TYPES[rng.integers(0, 5, n)]),
                "value": pa.array(vals, pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(path, f"part-{part:05d}.parquet"))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    path = f"/tmp/funnel_scale_{n_rows}"
    if not os.path.isdir(path):
        print(f"generating {n_rows} rows at {path}", flush=True)
        gen(path, n_rows, n_users)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion,
    )

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["user_id", "ts", "event_type"])
    out = funnel_first_conversion(
        ds, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], window_us=W_US,
    )
    conv = out.to_pandas()  # O(converting users) — bounded by n_users
    wall = time.perf_counter() - t0
    print(f"funnel: rows={n_rows} users={n_users} converted={len(conv)} "
          f"wall={wall:.2f}s rows/s={n_rows / wall:,.0f}", flush=True)
    ray.shutdown()

    import duckdb

    t1 = time.perf_counter()
    ref = duckdb.sql(
        f"""
        WITH e AS (
            SELECT user_id, ts, event_type
            FROM read_parquet('{path}/*.parquet')
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
                  AND user_id % 20 = 0
        )
        SELECT a.user_id, MIN(a.ts) AS first_start_ts
        FROM e a
        WHERE a.event_type = 'view' AND EXISTS (
            SELECT 1 FROM e b
            WHERE b.user_id = a.user_id AND b.event_type = 'click'
              AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
              AND EXISTS (
                SELECT 1 FROM e c
                WHERE c.user_id = b.user_id AND c.event_type = 'purchase'
                  AND c.ts > b.ts AND c.ts <= b.ts + INTERVAL 6 HOUR))
        GROUP BY a.user_id
        """
    ).df()
    sub = conv[conv["user_id"] % 20 == 0].sort_values("user_id")
    ref = ref.sort_values("user_id")
    assert len(sub) == len(ref), (len(sub), len(ref))
    assert (sub["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()
    assert (
        sub["first_start_ts"].to_numpy().astype("datetime64[us]")
        == ref["first_start_ts"].to_numpy().astype("datetime64[us]")
    ).all()
    print(f"duckdb parity on user%20 slice: {len(ref)} converting users, "
          f"exact ({time.perf_counter() - t1:.1f}s)", flush=True)

    # user_features composition at the same scale
    import fdpg_query_data_validation_ray  # noqa: F401  (re-import after shutdown)
    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    import fdpg_query_data_validation_ray.pipelines.queries as q

    t2 = time.perf_counter()
    orig = q._read

    def patched(sf_dir, table, columns):
        assert table == "events"
        return rd.read_parquet(path, columns=columns)

    q._read = patched
    try:
        feats = QUERIES["user_features"](path)
        nrows = 0
        for b in feats.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
            nrows += b.num_rows
    finally:
        q._read = orig
    wall2 = time.perf_counter() - t2
    print(f"user_features: rows={n_rows} feature_rows={nrows} "
          f"wall={wall2:.2f}s rows/s={n_rows / wall2:,.0f}", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
