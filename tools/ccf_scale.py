"""At-scale evidence for the distributed CCF connected-components path.

Builds a >=1M-pair synthetic graph with the two adversarial shapes
(long chains -> diameter stress on the rewiring rounds; one giant
component -> per-round min-aggregate skew), forces QDV_SIEVE_MODE=shuffle
through connected_components, asserts exact label parity with the driver
min-label-propagation mode, and prints wall time + converged round count
for NOTES.md.

Usage:  python tools/ccf_scale.py [n_chain_edges] [n_giant_edges] [n_rand_edges]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_graph(n_chain=200_000, n_giant=600_000, n_rand=250_000, seed=5):
    """(id_a, id_b) edge table: 10 disjoint chains of n_chain/10 edges each,
    one giant random-attachment component of n_giant edges over n_giant
    nodes (every new node attaches to a random earlier node => connected,
    modest diameter), and n_rand random edges over a sparse id range
    (many small components)."""
    rng = np.random.default_rng(seed)
    parts_a, parts_b = [], []
    base = 0
    per_chain = n_chain // 10
    for _ in range(10):
        ids = np.arange(base, base + per_chain + 1, dtype=np.int64)
        parts_a.append(ids[:-1])
        parts_b.append(ids[1:])
        base += per_chain + 1
    giant = np.arange(base, base + n_giant + 1, dtype=np.int64)
    attach = giant[0] + (rng.random(n_giant) * np.arange(1, n_giant + 1)).astype(
        np.int64
    )
    parts_a.append(giant[1:])
    parts_b.append(attach)
    base += n_giant + 1
    ra = base + rng.integers(0, 4 * n_rand, n_rand).astype(np.int64)
    rb = base + rng.integers(0, 4 * n_rand, n_rand).astype(np.int64)
    keep = ra != rb
    parts_a.append(ra[keep])
    parts_b.append(rb[keep])
    return pa.table(
        {"id_a": np.concatenate(parts_a), "id_b": np.concatenate(parts_b)}
    )


def labels_frame(mode: str, tbl: pa.Table):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.cluster import connected_components

    os.environ["QDV_SIEVE_MODE"] = mode
    try:
        t0 = time.perf_counter()
        out = (
            connected_components(rd.from_arrow(tbl).repartition(32), mode=mode)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        return out, time.perf_counter() - t0
    finally:
        del os.environ["QDV_SIEVE_MODE"]


def main():
    import ray

    from fdpg_query_data_validation_ray.stages import cluster

    args = [int(a) for a in sys.argv[1:4]]
    tbl = build_graph(*args) if args else build_graph()
    print(f"edges: {tbl.num_rows:,}")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    drv, t_drv = labels_frame("sieve", tbl)
    print(f"driver mode: {t_drv:.2f}s, {len(drv):,} labels, "
          f"{drv['cluster_id'].nunique():,} components")
    shf, t_shf = labels_frame("shuffle", tbl)
    print(f"shuffle (CCF) mode: {t_shf:.2f}s, {cluster.LAST_CCF_ROUNDS} rounds, "
          f"{len(shf):,} labels, {shf['cluster_id'].nunique():,} components")
    assert drv.equals(shf), "label parity FAILED between driver and CCF modes"
    print("label parity: EXACT")
    ray.shutdown()


if __name__ == "__main__":
    main()
