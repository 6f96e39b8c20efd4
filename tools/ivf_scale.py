"""IVF build-side scale datapoint (round-5 verdict item #7).

5M synthetic clustered vectors (64 true clusters, dim 32): measure
centroid-train wall at sample 64k vs 256k, full-corpus assignment
throughput, and recall@10 of knn_cosine_ivf against the exact brute-force
knn_cosine on the SAME materialized dataset (so generation determinism is
irrelevant to the comparison).

Usage: python tools/ivf_scale.py [n_vectors]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 32
N_CENTROIDS = 64
K = 10
N_QUERIES = 64
N_PROBES = 8


def build_dataset(n: int):
    import ray

    rng = np.random.default_rng(5)
    true_centers = rng.standard_normal((N_CENTROIDS, DIM)).astype(np.float32)
    true_centers /= np.linalg.norm(true_centers, axis=1, keepdims=True)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        r = np.random.default_rng(int(ids[0]) + 1)
        base = true_centers[ids % N_CENTROIDS]
        noise = 0.25 * r.standard_normal((len(ids), DIM)).astype(np.float32)
        v = base + noise
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(v.reshape(-1), pa.float32()), DIM
                ),
            }
        )

    return (
        ray.data.range(n)
        .map_batches(gen, batch_format="pyarrow", batch_size=65536)
        .materialize()
    )


def main() -> None:
    import ray

    from fdpg_query_data_validation_ray.stages.similarity import (
        _normalize,
        batch_matrix,
        knn_cosine,
        knn_cosine_ivf,
        train_centroids,
    )

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    ds = build_dataset(n)

    qrows = ds.limit(N_QUERIES).take_all()
    qids = [r["vec_id"] for r in qrows]
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float32)

    t0 = time.time()
    exact = knn_cosine(ds, (qids, qm), K).to_pandas()
    exact_wall = time.time() - t0
    truth = {
        q: set(g["vec_id"]) for q, g in exact.groupby("query_id")
    }

    out = {"n_vectors": n, "dim": DIM, "n_centroids": N_CENTROIDS,
           "exact_knn_wall_s": round(exact_wall, 2)}
    for sample in (65536, 262144):
        t0 = time.time()
        cents = train_centroids(ds, N_CENTROIDS, DIM, sample_size=sample)
        train_wall = time.time() - t0

        # full-corpus assignment throughput (the IVF build pass)
        def assign(t: pa.Table) -> pa.Table:
            m = _normalize(batch_matrix(t["embedding"]))
            a = np.argmax(m @ cents.T, axis=1).astype(np.int32)
            return pa.table({"vec_id": t["vec_id"], "c": pa.array(a)})

        t0 = time.time()
        n_assigned = ds.map_batches(
            assign, batch_format="pyarrow", batch_size=65536
        ).count()
        assign_wall = time.time() - t0

        t0 = time.time()
        approx = knn_cosine_ivf(
            ds, (qids, qm), K, DIM, n_centroids=N_CENTROIDS,
            n_probes=N_PROBES, centroids=cents,
        ).to_pandas()
        ivf_wall = time.time() - t0
        hits = tot = 0
        for q, g in approx.groupby("query_id"):
            hits += len(set(g["vec_id"]) & truth[q])
            tot += len(truth[q])
        out[f"sample_{sample}"] = {
            "train_wall_s": round(train_wall, 2),
            "assign_wall_s": round(assign_wall, 2),
            "assign_vectors_per_s": round(n_assigned / assign_wall),
            "ivf_query_wall_s": round(ivf_wall, 2),
            "recall_at_10": round(hits / tot, 4),
        }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
