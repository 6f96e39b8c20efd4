"""Scale datapoint for k-core peeling (stages/graph.py k_core): the
triangle_scale power-law graph (default 10M edge rows / 500k nodes), k
chosen so several rounds actually peel, with FULL exact parity against a
DuckDB unrolled-round oracle (same fixed round count on both sides).

Usage: python tools/kcore_scale.py [n_edge_rows] [n_nodes] [k] [rounds]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from triangle_scale import gen  # same generator → same graph


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    path = f"/tmp/triangle_scale_{n_rows}"
    if not os.path.isdir(path):
        print(f"generating {n_rows} edge rows at {path}", flush=True)
        gen(path, n_rows, n_nodes)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.graph import k_core

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    out = (
        k_core(rd.read_parquet(path), k=k, rounds=rounds, a="a", b="b")
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    wall = time.time() - t0
    print(f"k={k} rounds={rounds}: wall {wall:.2f}s   survivors "
          f"{len(out):,}   ({n_rows / wall:,.0f} edge rows/s)", flush=True)
    ray.shutdown()

    import duckdb

    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
    # round references the previous one three times — unmaterialized, r0 is
    # re-evaluated 3^rounds times and the spill fills the disk.
    ctes = [f"""raw AS MATERIALIZED (
            SELECT a, b FROM '{path}/*.parquet' WHERE a <> b),
        r0 AS MATERIALIZED (
            SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
            FROM raw)"""]
    for i in range(rounds):
        ctes.append(f"""d{i} AS MATERIALIZED (
            SELECT node, COUNT(*) AS d FROM (
                SELECT u AS node FROM r{i} UNION ALL SELECT v FROM r{i})
            GROUP BY 1),
        a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k}),
        r{i + 1} AS MATERIALIZED (
            SELECT u, v FROM r{i}
            WHERE u IN (SELECT node FROM a{i})
              AND v IN (SELECT node FROM a{i}))""")
    sql = "WITH " + ",\n".join(ctes)
    sql += f"""
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT u AS node FROM r{rounds} UNION ALL SELECT v FROM r{rounds})
        GROUP BY 1 ORDER BY node"""
    t0 = time.time()
    oracle = duckdb.sql(sql).df()
    dw = time.time() - t0
    same = (len(oracle) == len(out)
            and (oracle["node"].to_numpy() == out["node"].to_numpy()).all()
            and (oracle["degree"].to_numpy()
                 == out["degree"].to_numpy()).all())
    print(f"duckdb wall {dw:.2f}s   parity: "
          f"{'exact' if same else 'MISMATCH'} ({len(out):,} nodes)",
          flush=True)
    assert same


if __name__ == "__main__":
    main()
