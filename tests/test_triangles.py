"""Triangle counting (stages/graph.py triangle_counts): brute-force parity
on random graphs, broadcast/exchange plan parity, multigraph + self-loop
canonicalization, degenerate inputs, partition invariance."""

import itertools

import numpy as np
import pytest


def _brute(edges):
    """Per-node triangle counts by enumeration over the distinct simple
    undirected edge set."""
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in es for n in e})
    adj = {n: set() for n in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    counts = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _run(edges, **kw):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.graph import triangle_counts

    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    # take_all instead of to_pandas: Dataset.to_pandas drops column names on
    # 0-row datasets, and the triangle-free case is part of the contract
    rows = triangle_counts(ds, a="a", b="b", **kw).take_all()
    return {r["node"]: r["n_triangles"] for r in rows}


def test_k4_every_node_in_three_triangles(ray_session):
    edges = list(itertools.combinations(range(4), 2))
    assert _run(edges) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_random_graph_matches_brute_force(ray_session):
    rng = np.random.RandomState(7)
    edges = [
        (int(rng.randint(0, 25)), int(rng.randint(0, 25))) for _ in range(120)
    ]
    assert _run(edges) == _brute(edges)


def test_plan_parity_broadcast_vs_exchange(ray_session):
    rng = np.random.RandomState(11)
    edges = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 30))) for _ in range(150)
    ]
    bc = _run(edges, mode="broadcast")
    ex = _run(edges, mode="exchange")
    assert bc == ex == _brute(edges)


def test_multigraph_and_self_loops_collapse(ray_session):
    tri = [(1, 2), (2, 3), (1, 3)]
    noisy = tri + [(2, 1), (3, 2), (1, 1), (2, 2)] + tri
    assert _run(noisy) == {1: 1, 2: 1, 3: 1}


def test_triangle_free_graph_is_empty(ray_session):
    # a path and a star: no triangles
    edges = [(0, 1), (1, 2), (2, 3), (10, 11), (10, 12), (10, 13)]
    assert _run(edges) == {}
    assert _run(edges, mode="exchange") == {}


def test_partition_invariance(ray_session):
    rng = np.random.RandomState(3)
    edges = [
        (int(rng.randint(0, 20)), int(rng.randint(0, 20))) for _ in range(80)
    ]
    a = _run(edges, num_partitions=2)
    b = _run(edges, num_partitions=16)
    assert a == b == _brute(edges)


def test_wide_ids_fall_back_to_exchange(ray_session):
    # ids ≥ 2^31 disqualify the packed-key broadcast closure; auto mode
    # must still return exact counts via the exchange plan
    base = 1 << 40
    edges = [(base + a, base + b) for a, b in itertools.combinations(range(4), 2)]
    out = _run(edges)  # auto
    assert out == {base + i: 3 for i in range(4)}


def _run_kcore(edges, k, rounds=8, **kw):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.graph import k_core

    t = pa.table(
        {
            "a": pa.array([a for a, _ in edges], pa.int64()),
            "b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    rows = k_core(
        rd.from_arrow(t).repartition(3), k=k, rounds=rounds, **kw
    ).take_all()
    return {r["node"]: r["degree"] for r in rows}


def _brute_kcore(edges, k, rounds=8):
    es = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for _ in range(rounds):
        deg = {}
        for u, v in es:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        dead = {n for n, d in deg.items() if d < k}
        if not dead:
            break
        es = {(u, v) for u, v in es if u not in dead and v not in dead}
    deg = {}
    for u, v in es:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


def test_kcore_peels_chain_keeps_clique(ray_session):
    # K4 clique + a pendant chain hanging off it: 3-core = the clique
    clique = list(itertools.combinations(range(4), 2))
    chain = [(3, 10), (10, 11), (11, 12)]
    out = _run_kcore(clique + chain, k=3)
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_random_matches_brute(ray_session):
    rng = np.random.RandomState(13)
    edges = [
        (int(rng.randint(0, 30)), int(rng.randint(0, 30))) for _ in range(90)
    ]
    for k in (2, 3, 4):
        assert _run_kcore(edges, k=k) == _brute_kcore(edges, k=k)


def test_kcore_fixed_rounds_semantics(ray_session):
    # a long chain peels one pendant pair per round: with rounds=1 only the
    # endpoints drop; both sides (engine, brute) honor the cap identically
    chain = [(i, i + 1) for i in range(8)]
    assert _run_kcore(chain, k=2, rounds=1) == _brute_kcore(chain, 2, 1)
    assert _run_kcore(chain, k=2, rounds=8) == {}


def test_kcore_everything_survives_is_noop(ray_session):
    clique = list(itertools.combinations(range(5), 2))
    assert _run_kcore(clique, k=2) == {i: 4 for i in range(5)}
