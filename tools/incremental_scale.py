"""Scale datapoint for stages/incremental.py filter_new_keys.

Generates a deterministic two-snapshot parquet pair under /tmp (seen: N keys;
incoming: M rows with a controlled seen-fraction), runs the bloom-sieve plan
at full CPUs, cross-checks the row count against DuckDB's NOT EXISTS, and
prints one JSON line. Usage: python tools/incremental_scale.py [n_seen n_inc]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n_seen = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    n_inc = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    root = "/tmp/incr_scale"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(42)
    # seen keyspace [0, K); incoming draws half from seen space, half above it
    K = n_seen // 2
    seen = pa.table(
        {
            "k1": pa.array(rng.integers(0, K, size=n_seen), pa.int64()),
            "k2": pa.array(rng.integers(0, 13, size=n_seen), pa.int64()),
        }
    )
    inc = pa.table(
        {
            "k1": pa.array(rng.integers(0, 2 * K, size=n_inc), pa.int64()),
            "k2": pa.array(rng.integers(0, 13, size=n_inc), pa.int64()),
            "payload": pa.array(np.arange(n_inc), pa.int64()),
        }
    )
    # sharded directories (16 files/side): a single monolithic file caps the
    # read at ONE task and serializes every pass — real crawl snapshots are
    # many files, so the benchmark layout should be too
    for name, tbl in (("seen", seen), ("incoming", inc)):
        d = f"{root}/{name}"
        os.makedirs(d, exist_ok=True)
        shard = -(-tbl.num_rows // 16)
        for i in range(16):
            pq.write_table(
                tbl.slice(i * shard, shard),
                f"{d}/part-{i:02d}.parquet",
                row_group_size=1 << 18,
            )

    import duckdb

    want = duckdb.sql(
        f"""SELECT count(*) FROM read_parquet('{root}/incoming/*.parquet') i
            WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{root}/seen/*.parquet') s
                              WHERE s.k1 = i.k1 AND s.k2 = i.k2)"""
    ).fetchone()[0]

    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    from fdpg_query_data_validation_ray.stages.incremental import filter_new_keys

    t0 = time.perf_counter()
    out = filter_new_keys(
        rd.read_parquet(f"{root}/incoming"),
        rd.read_parquet(f"{root}/seen"),
        ["k1", "k2"],
        n_seen_hint=n_seen,
    )
    got = out.count()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_seen": n_seen,
                "n_incoming": n_inc,
                "new_rows": got,
                "oracle_rows": want,
                "match": got == want,
                "sec": round(dt, 2),
                "rows_per_s": int((n_seen + n_inc) / dt),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
