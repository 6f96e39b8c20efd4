"""Pair → cluster resolution (stages/cluster.py): connected components over
near-dup pair sets and the keep-one-representative dedup filter. Driver and
distributed-CCF strategies must agree; a giant clique and a long chain are
the skew/diameter stress shapes; minhash_dedup_keep must agree with
exact_dedup on identical-duplicate corpora."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.cluster import (
    connected_components,
    dedup_keep_representative,
    minhash_dedup_keep,
)


@pytest.fixture()
def force_mode(monkeypatch):
    def set_mode(mode: str):
        monkeypatch.setenv("QDV_SIEVE_MODE", mode)

    yield set_mode
    monkeypatch.delenv("QDV_SIEVE_MODE", raising=False)


def _labels_of(pairs_tbl, mode="auto"):
    import ray.data as rd

    out = connected_components(rd.from_arrow(pairs_tbl), mode=mode).to_pandas()
    return dict(zip(out["node"], out["cluster_id"]))


def _ref_components(a, b):
    """Pure-python union-find reference."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {x: find(x) for x in parent}


def _random_pairs(n_nodes=500, n_edges=800, seed=7):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    b = rng.integers(0, n_nodes, n_edges).astype(np.int64)
    keep = a != b
    return pa.table({"id_a": a[keep], "id_b": b[keep]})


def test_driver_matches_union_find_reference(ray_session):
    t = _random_pairs()
    got = _labels_of(t, mode="driver")
    ref = _ref_components(t["id_a"].to_pylist(), t["id_b"].to_pylist())
    assert got == ref


def test_non_power_of_two_parts_rounded_up(ray_session, force_mode, monkeypatch):
    # the hash routing is `& (parts-1)`: a non-power-of-two env/caller count
    # must be rounded UP, never used verbatim (gaps in part space)
    from fdpg_query_data_validation_ray.stages.cluster import _ccf_parts, _next_pow2

    assert [_next_pow2(n) for n in (1, 2, 3, 5, 8, 9, 100)] == [
        1, 2, 4, 8, 8, 16, 128,
    ]
    with pytest.raises(ValueError):
        _next_pow2(0)
    monkeypatch.setenv("QDV_CCF_PARTS", "12")
    assert _ccf_parts() == 16
    # labels stay correct end-to-end under an odd env count
    t = _random_pairs(n_nodes=120, n_edges=200)
    force_mode("shuffle")
    assert _labels_of(t) == _ref_components(
        t["id_a"].to_pylist(), t["id_b"].to_pylist()
    )


def test_shuffle_matches_driver_on_random_graph(ray_session, force_mode):
    t = _random_pairs(n_nodes=200, n_edges=300)
    force_mode("sieve")
    drv = _labels_of(t)
    force_mode("shuffle")
    shf = _labels_of(t)
    assert drv == shf


def test_long_chain_converges_both_modes(ray_session, force_mode):
    # a path graph: worst-case diameter; CCF's rewiring must still converge
    # in O(log n) rounds (max_iters=64 would trip otherwise)
    n = 128
    t = pa.table(
        {
            "id_a": np.arange(n - 1, dtype=np.int64),
            "id_b": np.arange(1, n, dtype=np.int64),
        }
    )
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        labels = _labels_of(t)
        assert len(labels) == n
        assert set(labels.values()) == {0}


def test_giant_clique_skew(ray_session):
    # one 2000-member near-identical clique (≈2M pairs) + scattered smalls:
    # the driver path must stay O(pairs) and label everything to the min id
    n = 2000
    ia, ib = np.triu_indices(n, k=1)
    extra_a = np.array([10_000, 10_001], dtype=np.int64)
    extra_b = np.array([10_001, 10_002], dtype=np.int64)
    t = pa.table(
        {
            "id_a": np.concatenate([ia.astype(np.int64), extra_a]),
            "id_b": np.concatenate([ib.astype(np.int64), extra_b]),
        }
    )
    labels = _labels_of(t)
    assert len(labels) == n + 3
    assert all(v == 0 for k, v in labels.items() if k < n)
    assert labels[10_002] == 10_000


def test_keep_representative_modes_identical(ray_session, force_mode):
    import ray.data as rd

    rows = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "payload": [f"p{i}" for i in range(20)],
        }
    )
    pairs = pa.table(
        {"id_a": [1, 2, 7, 15], "id_b": [2, 3, 8, 1]}  # {1,2,3,15}, {7,8}
    )
    kept = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        out = dedup_keep_representative(
            rd.from_arrow(rows), rd.from_arrow(pairs), "doc_id"
        ).to_pandas()
        kept[mode] = sorted(out["doc_id"].tolist())
    expect = sorted(set(range(20)) - {2, 3, 15, 8})
    assert kept["sieve"] == expect
    assert kept["shuffle"] == expect


def test_minhash_dedup_keep_matches_exact_on_identical_cliques(ray_session):
    """On a corpus whose only near-dups are EXACT copies, minhash recall is
    perfect (est_jaccard == 1.0), so the fuzzy keep-one must equal
    exact_dedup's output."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import exact_dedup

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(300)]
    base = [
        " ".join(rng.choice(words, 30, replace=True)) for _ in range(40)
    ]
    texts, ids = [], []
    nid = 0
    for j, b in enumerate(base):
        copies = 3 if j % 4 == 0 else 1
        for _ in range(copies):
            texts.append(b)
            ids.append(nid)
            nid += 1
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    fuzzy = minhash_dedup_keep(rd.from_arrow(t), "text", "doc_id", threshold=0.9)
    exact = exact_dedup(rd.from_arrow(t), "text", "doc_id")
    got = sorted(fuzzy.to_pandas()["doc_id"].tolist())
    want = sorted(exact.to_pandas()["doc_id"].tolist())
    assert got == want


def test_minhash_dedup_keep_shuffle_mode_parity(ray_session, force_mode):
    """The full materializing fuzzy-dedup pipeline forced through the
    distributed path end-to-end (CCF components + LEFT ANTI keep filter)
    must return exactly the sieve-mode (driver) output."""
    import ray.data as rd

    rng = np.random.default_rng(23)
    words = [f"tok{i}" for i in range(300)]
    base = [" ".join(rng.choice(words, 30, replace=True)) for _ in range(40)]
    texts, ids = [], []
    nid = 0
    for j, b in enumerate(base):
        for _ in range(3 if j % 4 == 0 else 1):
            texts.append(b)
            ids.append(nid)
            nid += 1
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    kept = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        out = minhash_dedup_keep(rd.from_arrow(t), "text", "doc_id", threshold=0.9)
        kept[mode] = sorted(out.to_pandas()["doc_id"].tolist())
    assert kept["shuffle"] == kept["sieve"]
    assert 0 < len(kept["sieve"]) < len(ids)


def test_ccf_chain_plus_giant_component_parity_and_rounds(ray_session, force_mode):
    """The at-scale graph shapes (tools/ccf_scale.py): long chains (diameter
    stress) + one giant random-attachment component (min-aggregate skew) +
    random smalls. CCF must match the driver labels exactly and converge in
    O(log diameter) rounds — the 1M+-pair datapoint lives in NOTES.md."""
    from fdpg_query_data_validation_ray.stages import cluster
    from tools.ccf_scale import build_graph

    t = build_graph(n_chain=2000, n_giant=4000, n_rand=1500, seed=5)
    force_mode("sieve")
    drv = _labels_of(t)
    force_mode("shuffle")
    shf = _labels_of(t)
    assert drv == shf
    # chains of 200 edges dominate the diameter; rewiring-to-min converges
    # in ~log2(d) rounds — a generous bound still catches a linear regression
    assert 1 <= cluster.LAST_CCF_ROUNDS <= 16


def test_empty_pairs_passthrough(ray_session):
    import ray.data as rd

    rows = pa.table({"doc_id": pa.array([5, 6], pa.int64()), "x": ["a", "b"]})
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    assert connected_components(rd.from_arrow(empty)).count() == 0
    out = dedup_keep_representative(
        rd.from_arrow(rows), rd.from_arrow(empty), "doc_id"
    )
    assert sorted(out.to_pandas()["doc_id"].tolist()) == [5, 6]


def test_cosine_dedup_keep_drops_planted_duplicates(ray_session):
    """Embedding dedup keep-one: planted near-identical vector groups must
    collapse to exactly one representative (the min id) while singletons
    survive untouched — the embedding analog of the minhash cross-check."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.cluster import (
        dedup_keep_representative,
    )
    from fdpg_query_data_validation_ray.stages.similarity import (
        cosine_near_duplicates,
    )

    rng = np.random.default_rng(17)
    d = 32
    base = rng.standard_normal((30, d)).astype(np.float32)
    vecs, ids = [], []
    nid = 0
    expect_keep = set()
    for j in range(30):
        copies = 4 if j % 3 == 0 else 1
        first = nid
        for c in range(copies):
            v = base[j] + (1e-3 * c) * rng.standard_normal(d).astype(np.float32)
            vecs.append(v.tolist())
            ids.append(nid)
            nid += 1
        expect_keep.add(first)  # min id of each group survives
    t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": vecs})
    ds = rd.from_arrow(t).repartition(4).materialize()
    pairs = cosine_near_duplicates(ds, threshold=0.98, dim=d)
    kept = dedup_keep_representative(ds, pairs, "vec_id").to_pandas()
    got = set(kept["vec_id"])
    # every clique collapsed to its min id; no singleton lost
    assert got == expect_keep
