"""Scale datapoint for rolling_window_sum (per-row time-RANGE window).

Synthetic event log: N_ROWS rows over N_USERS users, integer-microsecond
timestamps drawn over a ~30-day span, cent-valued amounts with 2% NaNs
(the stage treats NaN as SQL NULL). Sharded parquet so the read
parallelizes. The timed window covers the full pipeline including the
partitioned parquet write (read -> route -> part exchange -> window
kernel -> write). Afterwards DuckDB recomputes the same RANGE window on
the same input and compares both directions with EXCEPT — exact, every
row.

Usage: python tools/window_scale.py [n_rows] [n_users]   # default 12M, 50k
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 1_000_000
SPAN_US = 30 * 24 * 3600 * 1_000_000
WINDOW_US = 3_600_000_000  # 1 hour


def gen_events(path: str, n_rows: int, n_users: int) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(41)
    for part, lo in enumerate(range(0, n_rows, CHUNK)):
        n = min(CHUNK, n_rows - lo)
        vals = np.round(rng.normal(50, 20, n), 2)
        vals[rng.random(n) < 0.02] = np.nan
        t = pa.table(
            {
                "event_id": pa.array(np.arange(lo, lo + n), pa.int64()),
                "user_id": pa.array(rng.integers(0, n_users, n), pa.int64()),
                "ts": pa.array(rng.integers(0, SPAN_US, n), pa.int64()),
                "value": pa.array(vals, pa.float64()),
            }
        )
        pq.write_table(t, os.path.join(path, f"part-{part:05d}.parquet"))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    path = f"/tmp/window_scale_{n_rows}"
    out_path = f"/tmp/window_scale_out_{n_rows}"
    if not os.path.isdir(path):
        print(f"generating {n_rows} rows at {path}", flush=True)
        gen_events(path, n_rows, n_users)
    shutil.rmtree(out_path, ignore_errors=True)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import rolling_window_sum

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    ds = rd.read_parquet(path, columns=["event_id", "user_id", "ts", "value"])
    out = rolling_window_sum(ds, "user_id", "ts", "event_id", "value",
                             window_us=WINDOW_US, scale=100)
    out.write_parquet(out_path)
    wall = time.perf_counter() - t0
    print(f"rows={n_rows} users={n_users} wall={wall:.2f}s "
          f"rows/s={n_rows / wall:,.0f}", flush=True)
    ray.shutdown()

    import duckdb

    t1 = time.perf_counter()
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW got AS
        SELECT event_id, user_id, COALESCE(win_sum_e, -1) AS s, win_n AS c
        FROM read_parquet('{out_path}/*.parquet');
        CREATE VIEW ref AS
        WITH q AS (
            SELECT event_id, user_id, ts,
                   CASE WHEN isnan(value) THEN NULL
                        ELSE CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)
                   END AS x_e
            FROM read_parquet('{path}/*.parquet')
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT event_id, user_id,
               COALESCE(CAST(SUM(x_e) OVER win AS BIGINT), -1) AS s,
               CAST(COUNT(*) OVER win AS BIGINT) AS c
        FROM q
        WINDOW win AS (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN {WINDOW_US} PRECEDING AND CURRENT ROW);
        """
    )
    n_got, n_ref = (con.sql(f"SELECT COUNT(*) FROM {v}").fetchone()[0]
                    for v in ("got", "ref"))
    d1 = con.sql("SELECT COUNT(*) FROM (FROM got EXCEPT FROM ref)").fetchone()[0]
    d2 = con.sql("SELECT COUNT(*) FROM (FROM ref EXCEPT FROM got)").fetchone()[0]
    print(f"duckdb n={n_ref} got={n_got} diff={d1}+{d2} "
          f"({time.perf_counter() - t1:.1f}s)", flush=True)
    assert n_got == n_ref and d1 == 0 and d2 == 0, "mismatch vs DuckDB window"
    print("EXACT: full-row parity with the DuckDB RANGE window", flush=True)


if __name__ == "__main__":
    main()
