"""Distributed Lloyd's k-means (stages/similarity.py:
kmeans_fit_distributed / kmeans_assign) — the iterative broadcast-reduce
operator class.

`kmeans_embeddings` has no SQL oracle (iterative algorithm); these tests
are its correctness contract: bit-parity with a single-process reference
implementing the identical quantized update rule, invariance to batching /
partitioning, a non-decreasing objective on separated data, and the IVF
integration (corpus-exact trained centroids keep the pinned recall bar).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.similarity import (
    _normalize,
    kmeans_assign,
    kmeans_fit_distributed,
)


def _rd():
    import ray.data

    return ray.data


def _clustered(seed=5, k=4, per=60, d=8, spread=0.15):
    """Well-separated spherical clusters: argmax ties can't flip."""
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.standard_normal((k, d)).astype(np.float32)) * 3
    m = np.vstack(
        [
            c + spread * rng.standard_normal((per, d)).astype(np.float32)
            for c in centers
        ]
    )
    return m


def _reference_fit(m, n_clusters, dim, iters):
    """Single-process twin of kmeans_fit_distributed: same init (first k
    rows), same normalize→quantize→sum→normalize update, same argmax."""
    cents = _normalize(m[:n_clusters].astype(np.float32).copy())
    mn = _normalize(m.astype(np.float32))
    history = []
    counts = np.zeros(n_clusters, dtype=np.int64)
    for _ in range(iters):
        sims = mn @ cents.T
        assign = np.argmax(sims, axis=1)
        best = sims[np.arange(len(mn)), assign].astype(np.float64)
        history.append(int(np.floor(1e6 * best + 0.5).astype(np.int64).sum()))
        q = np.floor(1e6 * mn.astype(np.float64) + 0.5).astype(np.int64)
        sums = np.zeros((n_clusters, dim), dtype=np.int64)
        np.add.at(sums, assign, q)
        counts = np.bincount(assign, minlength=n_clusters).astype(np.int64)
        new = cents.copy()
        nz = counts > 0
        new[nz] = _normalize((sums[nz].astype(np.float64) / 1e6).astype(np.float32))
        cents = new
    return cents, counts, history


def _tbl(m):
    return pa.table(
        {
            "vec_id": list(range(len(m))),
            "embedding": [r.tolist() for r in m],
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_kmeans_matches_single_process_reference():
    m = _clustered()
    k, d = 4, m.shape[1]
    ds = _rd().from_arrow(_tbl(m))
    cents, counts, hist = kmeans_fit_distributed(ds, k, d, iters=4)
    ref_c, ref_n, ref_h = _reference_fit(m, k, d, iters=4)
    assert hist == ref_h
    assert np.array_equal(counts, ref_n)
    assert np.array_equal(cents, ref_c)  # bit-exact: quantized update


@pytest.mark.usefixtures("ray_session")
def test_kmeans_partition_invariant():
    m = _clustered(seed=9, k=3, per=70)
    k, d = 3, m.shape[1]
    runs = []
    for parts in (1, 6):
        ds = _rd().from_arrow(_tbl(m))
        if parts > 1:
            ds = ds.repartition(parts)
        runs.append(kmeans_fit_distributed(ds, k, d, iters=3))
    (c1, n1, h1), (c2, n2, h2) = runs
    assert h1 == h2 and np.array_equal(n1, n2) and np.array_equal(c1, c2)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_objective_non_decreasing_and_assign():
    m = _clustered(seed=13, k=5, per=50, d=12)
    k, d = 5, m.shape[1]
    ds = _rd().from_arrow(_tbl(m))
    cents, counts, hist = kmeans_fit_distributed(ds, k, d, iters=6)
    assert all(b >= a for a, b in zip(hist, hist[1:]))
    assert counts.sum() == len(m)
    out = kmeans_assign(ds, cents, "embedding", "vec_id").to_pandas()
    assert len(out) == len(m)
    # every label IS the argmax against the returned centroids
    mn = _normalize(m.astype(np.float32))
    expect = np.argmax(mn @ cents.T, axis=1)
    got = out.sort_values("vec_id")["cluster"].to_numpy()
    assert np.array_equal(got, expect)
    # converged separated fixture: clusters align with the generator's
    assert (counts > 0).sum() >= 4


@pytest.mark.usefixtures("ray_session")
def test_kmeans_centroids_keep_ivf_recall_bar():
    """Corpus-exact k-means centroids plug into knn_cosine_ivf (the
    `centroids=` pass-through) and keep the pinned recall bar."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        knn_cosine,
        knn_cosine_ivf,
    )

    rng = np.random.default_rng(33)
    d, n_clusters, per = 32, 20, 80
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    m = np.vstack(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    t = _tbl(m)
    ds = _rd().from_arrow(t).repartition(4)
    cents, _n, _h = kmeans_fit_distributed(ds, 24, d, iters=4)
    qids = list(rng.choice(len(m), 10, replace=False))
    qm = m[qids]
    bf = knn_cosine(ds, (qids, qm), k=10).to_pandas()
    ivf = knn_cosine_ivf(
        ds, (qids, qm), k=10, dim=d, n_centroids=24, n_probes=6,
        centroids=cents,
    ).to_pandas()
    hits = total = 0
    for q in qids:
        exp = set(bf[bf.query_id == q]["vec_id"])
        got = set(ivf[ivf.query_id == q]["vec_id"])
        hits += len(exp & got)
        total += len(exp)
    assert hits / total >= 0.85


@pytest.mark.usefixtures("ray_session")
def test_kmeans_query_runs_on_testdata():
    import __ray_entry__ as E

    out = E.queries()["kmeans_embeddings"]("/root/testdata/sf0.001").to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"vec_id", "cluster", "sim_e6"}
    assert out["cluster"].between(0, 7).all()
    assert out["vec_id"].is_unique
