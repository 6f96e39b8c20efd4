"""Fixed-point PageRank (stages/graph.py): parity with an independent
in-memory reference on small graphs (incl. dangling nodes and parallel
edges), partition-count invariance, and the rank-mass sanity bound."""

import numpy as np
import pytest


def _reference(edges, iters=3, scale=10**9, num=85, den=100):
    """Plain-dict PageRank with identical integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    base = (den - num) * scale // den
    r = {n: scale for n in nodes}
    for _ in range(iters):
        sums = {n: 0 for n in nodes}
        for s, d in edges:
            if deg[s] > 0:
                sums[d] += r[s] // deg[s]
        r = {n: base + num * sums[n] // den for n in nodes}
    return r


def _run(edges, **kw):
    import ray.data as rd
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.graph import pagerank_int

    t = pa.table(
        {
            "src": pa.array([s for s, _ in edges], pa.int64()),
            "dst": pa.array([d for _, d in edges], pa.int64()),
        }
    )
    out = pagerank_int(rd.from_arrow(t).repartition(3), **kw).to_pandas()
    return dict(zip(out["node"], out["rank"]))


@pytest.mark.usefixtures("ray_session")
def test_parity_with_reference_including_dangling_and_parallel_edges():
    # 1→2 doubled (parallel edges), 2→3, 3→1, 4→1 with 4 dangling-free,
    # 5 is a pure sink (dangling: receives from 3 but emits nothing)
    edges = [(1, 2), (1, 2), (2, 3), (3, 1), (4, 1), (3, 5)]
    got = _run(edges, iters=3, num_partitions=4)
    exp = _reference(edges, iters=3)
    assert got == exp
    # sink node got rank but contributed none; it must still be present
    assert 5 in got and got[5] > 0


@pytest.mark.usefixtures("ray_session")
def test_broadcast_and_exchange_plans_byte_equal():
    rng = np.random.default_rng(41)
    edges = [tuple(x) for x in rng.integers(0, 60, size=(500, 2)).tolist()]
    a = _run(edges, iters=3, num_partitions=8, mode="broadcast")
    b = _run(edges, iters=3, num_partitions=8, mode="exchange")
    assert a == b == _reference(edges, iters=3)


@pytest.mark.usefixtures("ray_session")
def test_partition_count_invariance_and_mass_bound():
    rng = np.random.default_rng(23)
    edges = [tuple(x) for x in rng.integers(0, 40, size=(300, 2)).tolist()]
    edges = [(s, d) for s, d in edges if s != d]
    a = _run(edges, iters=2, num_partitions=2)
    b = _run(edges, iters=2, num_partitions=16)
    assert a == b
    exp = _reference(edges, iters=2)
    assert a == exp
    # total rank mass stays ≤ V*scale and positive (floor losses only;
    # dangling nodes leak mass, they never create it)
    assert 0 < sum(a.values()) <= len(a) * 10**9
