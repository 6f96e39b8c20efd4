"""Scale datapoint for fixed-point PageRank (stages/graph.py): a synthetic
power-law directed multigraph (default 12M edges over 1M nodes), 3 damped
iterations on 32 CPUs, with FULL exact parity against DuckDB's unrolled
3-iteration CTE oracle (integer arithmetic is order-independent, so the
comparison is equality on every node, not a tolerance).

Usage: python tools/pagerank_scale.py [n_edges] [n_nodes]  # default 12M/1M
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


def gen(path: str, n_edges: int, n_nodes: int) -> None:
    """Zipf-ish destinations (hubs) over uniform sources — hot in-degree
    keys are the skew case that matters for the collect exchange."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(61)
    for part, lo in enumerate(range(0, n_edges, CHUNK)):
        n = min(CHUNK, n_edges - lo)
        src = rng.integers(0, n_nodes, n)
        # power-law dst: x^3 concentrates mass near 0
        dst = (rng.random(n) ** 3 * n_nodes).astype(np.int64)
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        pq.write_table(t, os.path.join(path, f"part-{part:05d}.parquet"))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    n_nodes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    path = f"/tmp/pagerank_scale_{n_edges}"
    if not os.path.isdir(path):
        print(f"generating {n_edges} edges at {path}", flush=True)
        gen(path, n_edges, n_nodes)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.graph import pagerank_int

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    edges = rd.read_parquet(path, columns=["src", "dst"])
    ranks = pagerank_int(edges, iters=3).to_pandas()  # O(nodes)
    wall = time.perf_counter() - t0
    print(
        f"pagerank[auto]: edges={n_edges} nodes={len(ranks)} iters=3 "
        f"wall={wall:.2f}s edges/s={3 * n_edges / wall:,.0f} (per-iter "
        f"edge throughput {n_edges / (wall / 3):,.0f})",
        flush=True,
    )
    # the fully-distributed plan (the 100-TB path, no O(V) driver state);
    # results are byte-equal — assert it on a slice
    t0 = time.perf_counter()
    edges2 = rd.read_parquet(path, columns=["src", "dst"])
    ranks_ex = pagerank_int(edges2, iters=3, mode="exchange").to_pandas()
    wall_ex = time.perf_counter() - t0
    a = ranks.sort_values("node").reset_index(drop=True)
    b = ranks_ex.sort_values("node").reset_index(drop=True)
    assert (a["node"].to_numpy() == b["node"].to_numpy()).all()
    assert (a["rank"].to_numpy() == b["rank"].to_numpy()).all()
    print(
        f"pagerank[exchange]: wall={wall_ex:.2f}s edges/s="
        f"{3 * n_edges / wall_ex:,.0f} — byte-equal to broadcast plan",
        flush=True,
    )
    ray.shutdown()

    import duckdb

    t1 = time.perf_counter()
    it = """
        s{i} AS (SELECT e.dst AS node, SUM(r.r // r.d) AS s
                 FROM edges e JOIN r{p} r ON e.src = r.node
                 WHERE r.d > 0 GROUP BY 1),
        r{i} AS (SELECT n.node,
                        CAST(150000000 + (85 * COALESCE(s.s, 0)) // 100
                             AS BIGINT) AS r, n.d
                 FROM r{p} n LEFT JOIN s{i} s USING (node))"""
    q = (
        f"""
        WITH edges AS (SELECT src, dst FROM read_parquet('{path}/*.parquet')),
        deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d
                FROM edges GROUP BY 1),
        nodes AS (SELECT DISTINCT node FROM (
                      SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges)),
        r0 AS (SELECT n.node, CAST(1000000000 AS BIGINT) AS r,
                      COALESCE(g.d, 0) AS d
               FROM nodes n LEFT JOIN deg g USING (node)),"""
        + ",".join(it.format(i=i, p=i - 1) for i in (1, 2, 3))
        + " SELECT node, r FROM r3"
    )
    ref = duckdb.sql(q).df()
    dt_oracle = time.perf_counter() - t1
    got = ranks.sort_values("node").reset_index(drop=True)
    ref = ref.sort_values("node").reset_index(drop=True)
    assert len(got) == len(ref), (len(got), len(ref))
    assert (got["node"].to_numpy() == ref["node"].to_numpy()).all()
    diff = int((got["rank"].to_numpy() != ref["r"].to_numpy()).sum())
    assert diff == 0, f"{diff} rank mismatches"
    print(
        f"duckdb parity: {len(ref)} nodes, EXACT on every rank "
        f"(oracle itself took {dt_oracle:.1f}s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
