"""Distributed top-k, IVF ANN, native hash join, and key_hash tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.topk import top_k
from fdpg_query_data_validation_ray.stages.unique import key_hash


def _rd():
    import ray.data as rd

    return rd


def test_top_k_exact_vs_local_sort(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table(
        {
            "a": rng.integers(0, 100, n),
            "b": rng.integers(0, 10**6, n),
        }
    )
    ds = _rd().from_arrow(t).repartition(13)
    got = top_k(ds, 25, ["a", "b"], descending=[True, False]).to_pandas()
    exp = (
        t.to_pandas()
        .sort_values(["a", "b"], ascending=[False, True], kind="mergesort")
        .head(25)
        .reset_index(drop=True)
    )
    assert got.reset_index(drop=True).equals(exp)


def test_top_k_smaller_than_k(ray_session):
    t = pa.table({"a": [3, 1, 2]})
    got = top_k(_rd().from_arrow(t), 10, ["a"], descending=True).to_pandas()
    assert list(got["a"]) == [3, 2, 1]


def test_knn_ivf_subset_of_bruteforce(ray_session):
    from fdpg_query_data_validation_ray.stages.similarity import (
        knn_cosine,
        knn_cosine_ivf,
    )

    rng = np.random.default_rng(9)
    n, d = 400, 16
    m = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({"vec_id": list(range(n)), "embedding": [r.tolist() for r in m]})
    qids = [0, 5]
    qm = m[qids]
    ds = _rd().from_arrow(t).repartition(4)
    bf = knn_cosine(ds, (qids, qm), k=5).to_pandas()
    ds2 = _rd().from_arrow(t).repartition(4)
    ivf = knn_cosine_ivf(
        ds2, (qids, qm), k=5, dim=d, n_centroids=8, n_probes=8
    ).to_pandas()
    # with n_probes == n_centroids every bucket is probed → recall is exact
    for q in qids:
        got = set(ivf[ivf.query_id == q]["vec_id"])
        exp = set(bf[bf.query_id == q]["vec_id"])
        assert got == exp
    assert set(ivf["rank"]) == {1, 2, 3, 4, 5}


def test_knn_ivf_partial_probe_recall(ray_session):
    from fdpg_query_data_validation_ray.stages.similarity import knn_cosine_ivf

    rng = np.random.default_rng(11)
    n, d = 300, 8
    m = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({"vec_id": list(range(n)), "embedding": [r.tolist() for r in m]})
    out = knn_cosine_ivf(
        _rd().from_arrow(t), ([7], m[[7]]), k=3, dim=d, n_centroids=16, n_probes=4
    ).to_pandas()
    assert len(out) <= 3
    assert (out["vec_id"] != 7).all()  # self excluded
    assert out["similarity"].is_monotonic_decreasing


def test_native_hash_join_matches_pyarrow(ray_session):
    rng = np.random.default_rng(4)
    left = pa.table(
        {"k": rng.integers(0, 50, 500), "x": rng.integers(0, 9, 500)}
    )
    right = pa.table({"rk": list(range(0, 50, 2)), "y": list(range(25))})
    lds = _rd().from_arrow(left).repartition(4)
    rds = _rd().from_arrow(right)
    j = lds.join(rds, join_type="inner", num_partitions=4, on=("k",), right_on=("rk",))
    got = j.to_pandas().sort_values(["k", "x", "y"]).reset_index(drop=True)
    exp = (
        left.join(right, keys="k", right_keys="rk", join_type="inner")
        .to_pandas()
        .sort_values(["k", "x", "y"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert got[["k", "x", "y"]].equals(exp[["k", "x", "y"]])


def test_key_hash_deterministic_and_order_sensitive():
    t = pa.table(
        {
            "a": ["x", "y", None, "x"],
            "b": [1, 2, 3, 1],
        }
    )
    h1 = key_hash(t, ["a", "b"])
    h2 = key_hash(t, ["a", "b"])
    assert (h1 == h2).all()
    assert h1[0] == h1[3]  # identical composite keys agree
    assert h1[0] != h1[1]
    h_rev = key_hash(t, ["b", "a"])
    assert h_rev[0] != h1[0]  # column order matters


def test_drift_docs_query_runs(ray_session):
    from fdpg_query_data_validation_ray.pipelines.queries import q_drift_docs

    out = q_drift_docs("/root/testdata/sf0.001").to_pandas()
    assert list(out["col_name"]) == ["lang", "n_chars"]
    # odd/even doc halves come from the same distribution → no drift
    assert not out["drifted"].any()


def test_knn_ivf_trained_centroids_recall(ray_session):
    """Trained (spherical k-means) centroids recover most brute-force
    neighbors at a small probe count on clustered data."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        knn_cosine,
        knn_cosine_ivf,
    )

    rng = np.random.default_rng(21)
    d, per = 16, 80
    centers = rng.standard_normal((6, d)).astype(np.float32) * 3
    m = np.vstack(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    t = pa.table({"vec_id": list(range(len(m))), "embedding": [r.tolist() for r in m]})
    qids = [0, 100, 250]
    qm = m[qids]
    bf = knn_cosine(_rd().from_arrow(t).repartition(4), (qids, qm), k=5).to_pandas()
    ivf = knn_cosine_ivf(
        _rd().from_arrow(t).repartition(4),
        (qids, qm),
        k=5,
        dim=d,
        n_centroids=12,
        n_probes=3,
        train=True,
    ).to_pandas()
    hits = total = 0
    for q in qids:
        exp = set(bf[bf.query_id == q]["vec_id"])
        got = set(ivf[ivf.query_id == q]["vec_id"])
        hits += len(exp & got)
        total += len(exp)
    assert hits / total >= 0.6  # clustered data, trained buckets: high recall


def test_knn_ivf_pinned_recall_bar(ray_session):
    """Regression-guards the measured recall/probe trade-off (NOTES.md):
    8/64 trained probes on clustered data measured 0.925 recall@10 at 20k
    vectors; this pins recall >= 0.85 at a 5k-vector version of the same
    fixture so a centroid-training or probe-routing regression fails loudly."""
    from fdpg_query_data_validation_ray.stages.similarity import (
        knn_cosine,
        knn_cosine_ivf,
    )

    rng = np.random.default_rng(33)
    d, n_clusters, per = 32, 50, 100
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    m = np.vstack(
        [c + rng.standard_normal((per, d)).astype(np.float32) for c in centers]
    )
    n = len(m)
    t = pa.table({"vec_id": list(range(n)), "embedding": [r.tolist() for r in m]})
    qids = list(rng.choice(n, 15, replace=False))
    qm = m[qids]
    bf = knn_cosine(_rd().from_arrow(t).repartition(8), (qids, qm), k=10).to_pandas()
    ivf = knn_cosine_ivf(
        _rd().from_arrow(t).repartition(8), (qids, qm), k=10,
        dim=d, n_centroids=64, n_probes=8, train=True,
    ).to_pandas()
    hits = total = 0
    for q in qids:
        exp = set(bf[bf.query_id == q]["vec_id"])
        got = set(ivf[ivf.query_id == q]["vec_id"])
        hits += len(exp & got)
        total += len(exp)
    assert hits / total >= 0.85
