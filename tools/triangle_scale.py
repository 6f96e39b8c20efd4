"""Scale datapoint for distributed triangle counting (stages/graph.py
triangle_counts): a synthetic power-law undirected graph (default 10M edge
rows over 500k nodes — hub-heavy, the regime where naive neighbor pairing
explodes), both physical plans, with exact parity between them and a
DuckDB triple-self-join oracle on the per-node counts.

The oracle's e1-e2-e3 join is itself O(wedges), so at default scale it
doubles as a single-node baseline for the same computation.

Usage: python tools/triangle_scale.py [n_edge_rows] [n_nodes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 2_000_000


def gen(path: str, n_rows: int, n_nodes: int) -> None:
    """Both endpoints power-law (x^2 toward 0): hot hubs on each side, many
    parallel duplicates — exercises canonical dedup AND degree orientation."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(71)
    for part, lo in enumerate(range(0, n_rows, CHUNK)):
        n = min(CHUNK, n_rows - lo)
        a = (rng.random(n) ** 2 * n_nodes).astype(np.int64)
        b = (rng.random(n) ** 2 * n_nodes).astype(np.int64)
        t = pa.table({"a": pa.array(a, pa.int64()),
                      "b": pa.array(b, pa.int64())})
        pq.write_table(t, os.path.join(path, f"part-{part:05d}.parquet"))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    path = f"/tmp/triangle_scale_{n_rows}"
    if not os.path.isdir(path):
        print(f"generating {n_rows} edge rows at {path}", flush=True)
        gen(path, n_rows, n_nodes)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.graph import triangle_counts

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    results = {}
    for mode in ("broadcast", "exchange"):
        t0 = time.time()
        out = (
            triangle_counts(rd.read_parquet(path), a="a", b="b", mode=mode)
            .to_pandas()
        )
        wall = time.time() - t0
        out = out.sort_values("node").reset_index(drop=True)
        results[mode] = (wall, out)
        tri_total = int(out["n_triangles"].sum()) // 3
        print(f"{mode:10s} wall {wall:7.2f}s   nodes-in-triangles "
              f"{len(out):>9,}   triangles {tri_total:>12,}", flush=True)

    bw, bo = results["broadcast"]
    ew, eo = results["exchange"]
    assert bo.equals(eo), "plan parity violated"
    print("plan parity: exact (every per-node count equal)", flush=True)
    ray.shutdown()

    import duckdb

    t0 = time.time()
    con = duckdb.connect()
    oracle = con.sql(f"""
        WITH raw AS (SELECT a, b FROM '{path}/*.parquet' WHERE a <> b),
        e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw),
        tri AS (
            SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        n AS (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM n GROUP BY node ORDER BY node
    """).df()
    dw = time.time() - t0
    print(f"duckdb     wall {dw:7.2f}s", flush=True)
    same = (len(oracle) == len(bo)
            and (oracle["node"].to_numpy() == bo["node"].to_numpy()).all()
            and (oracle["n_triangles"].to_numpy()
                 == bo["n_triangles"].to_numpy()).all())
    print(f"oracle parity: {'exact' if same else 'MISMATCH'} "
          f"({len(bo):,} nodes)", flush=True)
    assert same


if __name__ == "__main__":
    main()
