"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the correctness baseline. The query matrix is
  broadcast ONCE (`ray.put` → read in each actor's __init__, never re-shipped
  per batch); each batch computes a (batch × queries) matmul in numpy and
  emits per-batch top-k partials; a tiny groupby(query) finishes the top-k.
  Driver never sees full similarity matrices.
- LSH-bucketed variant (random hyperplanes, seeded): the scale path — both
  queries and data are bucketed by sign-pattern; only same-bucket (and
  optionally neighboring-bucket) pairs are scored. Recall < 1 by construction;
  `n_planes` trades recall vs. candidate volume.
- Cosine near-duplicate pairs: LSH buckets → within-bucket pairwise cosine.

Batches stay Arrow; vectors are converted zero-copy-ish to a contiguous
float32 matrix per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fdpg_query_data_validation_ray.functions.hashing import mix64


def batch_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n × d) float32 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool stage: per-batch cosine top-k against the broadcast queries."""

    def __init__(self, queries_ref, k: int, vec_column: str, id_column: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qm = q
        self.qm = _normalize(np.asarray(qm, dtype=np.float32))
        self.k = k
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(batch_matrix(batch.column(self.vec_column)))
        ids = np.asarray(batch.column(self.id_column).to_pylist())
        sims = m @ self.qm.T  # (batch × queries)
        out = {"query_id": [], "vec_id": [], "similarity": []}
        k = min(self.k + 1, len(ids))  # +1: self-match removed downstream
        for qi, qid in enumerate(self.query_ids):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if len(s) > k else np.arange(len(s))
            for t in top:
                out["query_id"].append(qid)
                out["vec_id"].append(ids[t])
                out["similarity"].append(float(s[t]))
        return pa.table(out)


def knn_cosine(
    ds,
    queries: tuple[list, np.ndarray],
    k: int,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    exclude_self: bool = True,
    concurrency=(1, 4),
):
    """Top-k cosine neighbors for each query vector.

    Returns a Dataset (query_id, vec_id, similarity, rank) with rank 1..k,
    deterministically tie-broken by (−similarity, vec_id).
    """
    # task-based: the query matrix is a few KB, so the instance (built once
    # at the driver) ships per task with no actor-pool startup latency
    partials = ds.map_batches(
        BruteForceTopK(
            queries_ref=queries, k=k, vec_column=vec_column, id_column=id_column
        ),
        batch_format="pyarrow",
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = group["query_id"].iloc[0]
        g = group
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.sort_values(
            ["similarity", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        return g

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# -- IVF (inverted-file) ANN --------------------------------------------------


class IVFTopK:
    """Actor-pool stage for IVF ANN: assign each data vector to its nearest
    (seeded, data-independent) centroid; score it ONLY against queries that
    probe that centroid; emit per-batch top-k partials.

    At scale the win is the early filter: rows whose bucket is outside every
    query's probe set are dropped before any query matmul. Recall < 1 by
    construction (n_probes/n_centroids trade-off)."""

    def __init__(self, queries_ref, centroids: np.ndarray, probe: np.ndarray,
                 k: int, vec_column: str, id_column: str):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids = np.asarray(q[0], dtype=np.int64)
        self.qm = _normalize(np.asarray(q[1], dtype=np.float32))
        self.centroids = centroids          # (n_centroids × d), normalized
        # bucket → queries inverted index as a dense bool mask, built ONCE:
        # probe_mask[c, qi] ⇔ query qi probes centroid c. Replaces the old
        # per-query np.isin loop (O(queries × batch) Python per batch).
        n_q = len(self.query_ids)
        # query-major (n_q × n_centroids): scoring below works on
        # (queries × kept) C-contiguous rows so the per-query top-k
        # partition streams each query's row, not a strided column
        self.probe_mask_q = np.zeros((n_q, len(centroids)), dtype=bool)
        self.probe_mask_q[np.repeat(np.arange(n_q), probe.shape[1]),
                          probe.ravel()] = True
        self.probed_centroids = np.zeros(len(centroids), dtype=bool)
        self.probed_centroids[np.unique(probe)] = True
        self.k = k
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "similarity": pa.array([], pa.float64()),
            }
        )
        m = _normalize(batch_matrix(batch.column(self.vec_column)))
        ids = np.asarray(batch.column(self.id_column).to_pylist())
        if len(ids) == 0:
            return empty
        bucket = np.argmax(m @ self.centroids.T, axis=1)
        keep = self.probed_centroids[bucket]
        m, ids, bucket = m[keep], ids[keep], bucket[keep]
        if len(ids) == 0:
            return empty
        s = self.qm @ m.T                         # (queries × kept), float32
        k = min(self.k + 1, len(ids))
        kth = s.shape[1] - k
        out_q, out_v, out_s = [], [], []
        # per-query row processing: each iteration touches one contiguous
        # 4·kept-byte row plus a bool LUT gather — the working set stays
        # cache-resident, so 32 concurrent tasks don't fight for memory
        # bandwidth (a full (queries × kept) masked argpartition collapsed
        # from 92 ms to 6.7 s/task under concurrency — see NOTES.md)
        for qi in range(s.shape[0]):
            sv = np.where(self.probe_mask_q[qi][bucket], s[qi], -np.inf)
            top = np.argpartition(sv, kth)[kth:] if kth > 0 else np.arange(len(sv))
            vals = sv[top]
            finite = np.isfinite(vals)
            if not finite.any():
                continue
            out_q.append(np.full(int(finite.sum()), self.query_ids[qi]))
            out_v.append(ids[top[finite]])
            out_s.append(vals[finite])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "similarity": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )


def train_centroids(
    ds,
    n_centroids: int,
    dim: int,
    vec_column: str = "embedding",
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 11,
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic sample (`ds.limit`,
    one small pass): Lloyd iterations at the driver over ≤ sample_size
    vectors. Data-adapted centroids concentrate probes where vectors actually
    live — higher recall per probe than data-independent random directions."""
    sample = ds.limit(sample_size).take_all()
    m = _normalize(
        np.array([r[vec_column] for r in sample], dtype=np.float32).reshape(-1, dim)
    )
    rng = np.random.default_rng(seed)
    if len(m) == 0:
        return _normalize(rng.standard_normal((n_centroids, dim)).astype(np.float32))
    init_ix = rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)
    cents = m[init_ix].copy()
    if len(cents) < n_centroids:
        extra = _normalize(
            rng.standard_normal((n_centroids - len(cents), dim)).astype(np.float32)
        )
        cents = np.vstack([cents, extra])
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(n_centroids):
            members = m[assign == c]
            if len(members):
                cents[c] = members.sum(axis=0)
        cents = _normalize(cents)
    return cents


def knn_cosine_ivf(
    ds,
    queries: tuple[list, np.ndarray],
    k: int,
    dim: int,
    n_centroids: int = 32,
    n_probes: int = 8,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    exclude_self: bool = True,
    seed: int = 11,
    concurrency=(1, 4),
    train: bool = True,
    centroids: np.ndarray | None = None,
):
    """Approximate top-k cosine neighbors via IVF bucketing (the scale path
    next to the brute-force baseline `knn_cosine`). Same output shape.
    train=True fits spherical-k-means centroids on a sample (better recall
    per probe); train=False uses seeded data-independent directions; a
    caller that already trained (e.g. at a larger sample size, or reusing
    an index across query rounds) passes `centroids` directly."""
    if centroids is not None:
        pass
    elif train:
        centroids = train_centroids(
            ds, n_centroids, dim, vec_column=vec_column, seed=seed
        )
    else:
        rng = np.random.default_rng(seed)
        centroids = _normalize(
            rng.standard_normal((n_centroids, dim)).astype(np.float32)
        )
    qids, qm = queries
    qmn = _normalize(np.asarray(qm, dtype=np.float32))
    probe = np.argsort(-(qmn @ centroids.T), axis=1)[:, :n_probes]

    partials = ds.map_batches(
        IVFTopK(
            queries_ref=(list(qids), qmn), centroids=centroids, probe=probe,
            k=k, vec_column=vec_column, id_column=id_column,
        ),
        batch_format="pyarrow",
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = group["query_id"].iloc[0]
        g = group
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.sort_values(
            ["similarity", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g.assign(rank=np.arange(1, len(g) + 1))

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


# -- LSH (random hyperplanes) ------------------------------------------------


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_bucket(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row (uint64, n_planes ≤ 63)."""
    bits = (m @ planes.T) > 0
    out = np.zeros(len(m), dtype=np.uint64)
    for b in range(planes.shape[0]):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out


class LSHSignStage:
    """Vector batch → compact (id, vec, patterns) rows: ONE row per vector —
    the normalized float32 vector and the per-table sign patterns (uint64
    each), computed once. Patterns are carried as exact integers so the
    canonical-table pair suppression downstream compares ints instead of
    re-deriving float sign bits (which BLAS could round differently per
    matrix shape)."""

    def __init__(self, planes: np.ndarray, vec_column: str, id_column: str):
        # planes: (n_tables, n_planes, dim)
        self.planes = planes
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tables = self.planes.shape[0]
        m = _normalize(batch_matrix(batch.column(self.vec_column)))
        n = len(m)
        patterns = np.zeros((n, n_tables), dtype=np.uint64)
        for t in range(n_tables):
            patterns[:, t] = lsh_bucket(m, self.planes[t])
        return pa.table(
            {
                self.id_column: batch.column(self.id_column).cast(pa.int64()),
                "vec": pa.array([row.tobytes() for row in m], pa.binary()),
                "patterns": pa.array(
                    [patterns[i].tobytes() for i in range(n)], pa.binary()
                ),
            }
        )


class TableExplodeStage:
    """(id, patterns) → exploded (table, bucket, id) rows — 28 B/row. The
    vector/pattern payload is NOT replicated into the explosion (round 2
    shipped tables× the bytes through the exchange); _attach_payload re-joins
    it to the post-sieve survivors."""

    def __init__(self, n_tables: int, id_column: str):
        self.n_tables = n_tables
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        pat_col = batch["patterns"].combine_chunks()
        n = len(pat_col)
        patterns = (
            np.frombuffer(b"".join(pat_col.to_pylist()), dtype=np.uint64).reshape(
                n, self.n_tables
            )
            if n
            else np.empty((0, self.n_tables), np.uint64)
        )
        with np.errstate(over="ignore"):
            buckets = mix64(
                patterns
                ^ (np.arange(1, self.n_tables + 1, dtype=np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))[None, :]
            )
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        tables_col = np.repeat(np.arange(self.n_tables, dtype=np.int32), n)
        return pa.table(
            {
                "table": pa.array(tables_col),
                "bucket": pa.array(buckets.T.reshape(-1).view(np.int64)),
                self.id_column: pa.array(np.tile(ids, self.n_tables)),
            }
        )


def cosine_near_duplicates(
    ds,
    threshold: float = 0.95,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 8,
    seed: int = 7,
    dim: int | None = None,
    concurrency=(1, 4),
):
    """Embedding near-duplicate pairs via OR-amplified multi-table hyperplane
    LSH: n_tables independent tables of n_planes hyperplanes each; a pair is
    a candidate when it collides in ANY table (per-plane collision prob
    1 − θ/π, so P(candidate) = 1 − (1 − p^n_planes)^n_tables — e.g. ≈ 0.94
    at cosine 0.9 with 8×8, vs ≈ 0.28 for the old single 12-plane table).
    Within-bucket exact cosine verification keeps precision at 1.

    Canonical-table emission (the minhash_near_duplicates trick): a pair is
    emitted only by the FIRST table in which it collides — earlier-table sign
    patterns are carried as exact uint64s — so the pair set is unique with no
    pair-dedup shuffle. Returns (id_a < id_b, cosine ≥ threshold)."""
    if dim is None:
        first = ds.take(1)[0]
        dim = len(first[vec_column])
    planes = np.stack(
        [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]
    )

    # task-based: planes are ~16KB, cheap to ship per task; avoids pool
    # startup. The normalized vectors + sign patterns land in a compact
    # 1-row-per-vector table; the explosion ships (table, bucket, id) only.
    from fdpg_query_data_validation_ray.stages.dedup import (
        _attach_payload,
        _empty_pairs_arrow,
        _iter_bucket_groups,
        _sieve_multi_buckets,
        _verify_parts,
        _with_part,
    )

    sign_schema = pa.schema(
        [(id_column, pa.int64()), ("vec", pa.binary()), ("patterns", pa.binary())]
    )
    signs = ds.map_batches(
        LSHSignStage(planes=planes, vec_column=vec_column, id_column=id_column),
        batch_format="pyarrow",
        # coalesce small reader blocks: the per-batch matmul/sign kernel has
        # fixed setup cost that tiny batches multiply
        batch_size=1024,
    ).materialize()
    exploded = signs.map_batches(
        TableExplodeStage(n_tables=n_tables, id_column=id_column),
        batch_format="pyarrow",
    )

    def part_pairs(part: pa.Table) -> pa.Table:
        # one part = many buckets (same coarse-partition verify as minhash —
        # per-bucket map_groups paid Ray's per-group machinery once per
        # bucket): decode vecs/patterns ONCE for the part, then slice
        # arithmetic per bucket
        n = part.num_rows
        if n == 0:
            return _empty_pairs_arrow("cosine", pa.float64())
        ids_all = part[id_column].to_numpy()
        bucket = part["bucket"].to_numpy()
        table_all = part["table"].to_numpy()
        vec_col = part["vec"].combine_chunks()
        m_all = np.frombuffer(b"".join(vec_col.to_pylist()), dtype=np.float32).reshape(
            n, dim
        )
        pat_col = part["patterns"].combine_chunks()
        pats_all = np.frombuffer(
            b"".join(pat_col.to_pylist()), dtype=np.uint64
        ).reshape(n, -1)
        out_a, out_b, out_s = [], [], []
        for rows in _iter_bucket_groups(bucket, ids_all):
            table_ix = int(table_all[rows[0]])
            ia, ib = np.triu_indices(len(rows), k=1)
            if table_ix > 0:
                pats = pats_all[rows][:, :table_ix]
                fresh = ~(pats[ia] == pats[ib]).any(axis=1)
                ia, ib = ia[fresh], ib[fresh]
            if len(ia) == 0:
                continue
            m = m_all[rows]
            s = np.einsum("ij,ij->i", m[ia], m[ib])
            keep = s >= threshold
            if keep.any():
                ids = ids_all[rows]
                out_a.append(ids[ia[keep]])
                out_b.append(ids[ib[keep]])
                out_s.append(s[keep])
        if not out_a:
            return _empty_pairs_arrow("cosine", pa.float64())
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "id_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    sieved, _n = _sieve_multi_buckets(exploded, "bucket")
    if sieved is None:
        import ray.data as rd

        return rd.from_arrow(_empty_pairs_arrow("cosine", pa.float64()))
    sieved = _attach_payload(
        sieved, signs, key=id_column, payload_columns=["vec", "patterns"],
        payload_schema=sign_schema, payload_width=4 * dim + 8 * n_tables + 8,
    )
    n_parts = _verify_parts()
    return (
        sieved.map_batches(lambda t: _with_part(t, n_parts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pyarrow")
    )


def embedding_centroid_sums(ds, vec_column: str = "embedding",
                            group_column: str = "label"):
    """Per-group embedding centroid SUMS, integer-exact: every element is
    quantized to floor(1e6*x + 0.5) int64 BEFORE aggregation, so the
    (group, dim) sums are order-independent and hash-exact against a SQL
    oracle (float centroid = sum_e6 / n / 1e6 to within quantization —
    callers divide at the edge). The combiner collapses each batch to one
    row per (group, dim) before the exchange; variable-length vectors are
    handled via the Arrow list offsets (row i contributes to dims
    1..len(i)). The centroid is the training step of IVF/spherical k-means
    (stages/similarity.py train path) — this operator is that step as a
    first-class, oracle-checkable aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        arr = t[vec_column].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.asarray(arr.offsets)
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = np.diff(offs).astype(np.int64)
        grp = t[group_column].to_numpy(zero_copy_only=False)
        g_el = np.repeat(grp, lens)
        total = int(lens.sum())
        dim_el = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs[:-1].astype(np.int64), lens)
            + 1
        )
        q = np.floor(1e6 * vals + 0.5).astype(np.int64)
        order = np.lexsort((dim_el, g_el))
        g_s, d_s, q_s = g_el[order], dim_el[order], q[order]
        first = np.empty(total, dtype=bool)
        if total:
            first[0] = True
            first[1:] = (g_s[1:] != g_s[:-1]) | (d_s[1:] != d_s[:-1])
        bounds = np.flatnonzero(first)
        sums = np.add.reduceat(q_s, bounds) if total else np.empty(0, np.int64)
        cnts = np.diff(np.append(bounds, total))
        return pa.table(
            {
                group_column: pa.array(g_s[bounds]),
                "dim": pa.array(d_s[bounds]),
                "sum_e6": pa.array(sums, pa.int64()),
                "n_vectors": pa.array(cnts, pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby([group_column, "dim"])
        .aggregate(
            Sum("sum_e6", alias_name="sum_e6"),
            Sum("n_vectors", alias_name="n_vectors"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed Lloyd's k-means (spherical) — the canonical ITERATIVE
# broadcast-reduce operator: per round the centroids broadcast to every
# batch task, each batch emits e6-quantized per-cluster partial sums (one
# (k × d)-bounded table per batch, NEVER the vectors), a bundled combine +
# stream-compacted driver merge reduces them, and the driver — holding only
# O(k × d) state — updates the centroids. `train_centroids`
# (stages/similarity.py above) is the sampled single-process variant this
# generalizes: same update rule, but the assignment/summation pass streams
# the FULL dataset, so the fit is corpus-exact, not sample-approximate.
# Reference analog: none (prompt-mandated "iterative algorithms" class).
# ---------------------------------------------------------------------------


def _kmeans_partial_table(assign, mn_q, best_e6, n_clusters, dim):
    """Flatten one batch's partials: (cluster, dim, s) rows — per-cluster
    per-dim quantized sums, counts (dim = -1) and the batch objective
    (cluster = -1, dim = -1)."""
    sums = np.zeros((n_clusters, dim), dtype=np.int64)
    np.add.at(sums, assign, mn_q)
    counts = np.bincount(assign, minlength=n_clusters).astype(np.int64)
    cl = np.concatenate(
        [
            np.repeat(np.arange(n_clusters, dtype=np.int64), dim),
            np.arange(n_clusters, dtype=np.int64),
            np.full(1, -1, np.int64),
        ]
    )
    dm = np.concatenate(
        [
            np.tile(np.arange(dim, dtype=np.int64), n_clusters),
            np.full(n_clusters, -1, np.int64),
            np.full(1, -1, np.int64),
        ]
    )
    s = np.concatenate(
        [sums.ravel(), counts, np.asarray([int(best_e6.sum())], np.int64)]
    )
    return pa.table({"cluster": cl, "dim": dm, "s": s})


def kmeans_fit_distributed(
    ds,
    n_clusters: int,
    dim: int,
    vec_column: str = "embedding",
    iters: int = 8,
    seed: int = 11,
):
    """Fit spherical k-means over the WHOLE dataset, one streamed pass per
    Lloyd iteration. Deterministic: init = the dataset's first `n_clusters`
    vectors (padded with seeded random directions if short), members are
    L2-normalized then QUANTIZED to floor(1e6·x + 0.5) int64 before
    summation — per-cluster sums are exact integers, so the update is
    independent of batching / partitioning / reduce order (asserted in
    tests/test_kmeans.py). Assignment is argmax over a float32 matmul —
    ties and sub-ulp near-ties go to the lowest cluster index; on
    well-separated data the whole fit is bit-reproducible against a
    single-process reference (test-pinned). Empty clusters keep their
    previous centroid.

    Returns (centroids float32 (k × d) L2-normalized, counts int64 per
    cluster at the last iteration, objective history: one exact int per
    iteration = Σ floor(1e6·cos(x, centroid(x)) + 0.5))."""
    from fdpg_query_data_validation_ray.stages.text import _streamed_combine

    head = ds.limit(n_clusters).take_all()
    init = [r[vec_column] for r in head]
    rng = np.random.default_rng(seed)
    cents = np.zeros((n_clusters, dim), dtype=np.float32)
    if init:
        cents[: len(init)] = _normalize(
            np.asarray(init, dtype=np.float32).reshape(len(init), dim)
        )
    if len(init) < n_clusters:
        cents[len(init):] = _normalize(
            rng.standard_normal((n_clusters - len(init), dim)).astype(
                np.float32
            )
        )

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["cluster", "dim"]).aggregate([("s", "sum")])
            .rename_columns(["cluster", "dim", "s"])
        )

    history: list[int] = []
    counts = np.zeros(n_clusters, dtype=np.int64)
    for _ in range(iters):
        c_now = cents  # rebind: the closure ships the CURRENT round's array

        def partial(t: pa.Table, _c=c_now) -> pa.Table:
            m = batch_matrix(t[vec_column])
            if not len(m):
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "s": pa.array([], pa.int64()),
                    }
                )
            mn = _normalize(m)
            sims = mn @ _c.T
            assign = np.argmax(sims, axis=1)
            best_e6 = np.floor(
                1e6 * sims[np.arange(len(mn)), assign].astype(np.float64)
                + 0.5
            ).astype(np.int64)
            q = np.floor(1e6 * mn.astype(np.float64) + 0.5).astype(np.int64)
            return _kmeans_partial_table(assign, q, best_e6, n_clusters, dim)

        lvl = ds.map_batches(
            partial, batch_format="pyarrow", batch_size=4096
        ).map_batches(combine, batch_format="pyarrow", batch_size=1_000_000)
        agg = _streamed_combine(lvl, combine)
        if agg is None:
            break
        cl = agg["cluster"].to_numpy(zero_copy_only=False)
        dm = agg["dim"].to_numpy(zero_copy_only=False)
        sv = agg["s"].to_numpy(zero_copy_only=False)
        history.append(int(sv[(cl == -1) & (dm == -1)].sum()))
        counts = np.zeros(n_clusters, dtype=np.int64)
        cmask = (dm == -1) & (cl >= 0)
        counts[cl[cmask]] = sv[cmask]
        sums = np.zeros((n_clusters, dim), dtype=np.int64)
        smask = dm >= 0
        sums[cl[smask], dm[smask]] = sv[smask]
        new = cents.copy()
        nz = counts > 0
        if nz.any():
            new[nz] = _normalize(
                (sums[nz].astype(np.float64) / 1e6).astype(np.float32)
            )
        cents = new
    return cents, counts, history


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
):
    """Label every vector with its nearest (cosine) centroid. Emits
    (id_column, cluster, sim_e6) — sim quantized e6 so downstream
    aggregates stay order-free exact."""
    cents = np.ascontiguousarray(centroids, dtype=np.float32)

    def label(t: pa.Table) -> pa.Table:
        m = batch_matrix(t[vec_column])
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(m):
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "sim_e6": pa.array([], pa.int64()),
                }
            )
        mn = _normalize(m)
        sims = mn @ cents.T
        assign = np.argmax(sims, axis=1)
        sim_e6 = np.floor(
            1e6 * sims[np.arange(len(mn)), assign].astype(np.float64) + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "sim_e6": pa.array(sim_e6, pa.int64()),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow", batch_size=4096)


# ---------------------------------------------------------------------------
# Distributed second-moment (Gram) matrix + PCA — the covariance step of
# PCA / whitening as a first-class, oracle-checkable aggregate. Each batch
# contributes ONE d×d integer matmul over e3-quantized vectors; the
# O(d²)-bounded partials reduce through the same bundled-combine +
# stream-compacted merge as the k-means/LM builders, so the driver never
# holds more than O(d²) state. The eigen-solve then runs at the driver on
# the tiny d×d result (power iteration with deflation — deterministic).
# ---------------------------------------------------------------------------


def embedding_gram_matrix(ds, vec_column: str = "embedding",
                          dim: int | None = None) -> pa.Table:
    """Upper-triangle Gram matrix Σ x xᵀ over e3-quantized vectors, plus a
    (0, 0, n_vectors) sentinel row. Quantization q = floor(1e3·x + 0.5)
    makes every entry an exact integer — order-free under any batching, and
    hash-exact against a DuckDB oracle replaying the same expression.
    e3 (not the repo's usual e6) bounds the per-pair product at ~1e6 for
    unit-scale features, so the int64 sums hold to ~9e12 vectors; callers
    with larger corpora shard by vector range and merge (documented bound,
    like global_rank's cardinality precondition). Dims are 1-based to match
    the embedding_centroids oracle convention. Fixed-dimension vectors only
    (the per-batch kernel is one (d × n)·(n × d) integer matmul)."""
    from fdpg_query_data_validation_ray.stages.text import _streamed_combine

    def partial(t: pa.Table) -> pa.Table:
        m = batch_matrix(t[vec_column])
        if not len(m):
            return pa.table(
                {
                    "dim_i": pa.array([], pa.int64()),
                    "dim_j": pa.array([], pa.int64()),
                    "sum_q2": pa.array([], pa.int64()),
                }
            )
        q = np.floor(1e3 * m.astype(np.float64) + 0.5).astype(np.int64)
        g = q.T @ q
        d = q.shape[1]
        iu, ju = np.triu_indices(d)
        return pa.table(
            {
                "dim_i": pa.array(
                    np.concatenate([iu + 1, np.zeros(1, np.int64)]), pa.int64()
                ),
                "dim_j": pa.array(
                    np.concatenate([ju + 1, np.zeros(1, np.int64)]), pa.int64()
                ),
                "sum_q2": pa.array(
                    np.concatenate(
                        [g[iu, ju], np.asarray([len(m)], np.int64)]
                    ),
                    pa.int64(),
                ),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["dim_i", "dim_j"]).aggregate([("sum_q2", "sum")])
            .rename_columns(["dim_i", "dim_j", "sum_q2"])
        )

    lvl = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    ).map_batches(combine, batch_format="pyarrow", batch_size=1_000_000)
    agg = _streamed_combine(lvl, combine)
    if agg is None:
        return pa.table(
            {
                "dim_i": pa.array([], pa.int64()),
                "dim_j": pa.array([], pa.int64()),
                "sum_q2": pa.array([], pa.int64()),
            }
        )
    import pyarrow.compute as _pc

    order = _pc.sort_indices(
        agg, sort_keys=[("dim_i", "ascending"), ("dim_j", "ascending")]
    )
    return agg.take(order).combine_chunks()


def gram_to_dense(gram: pa.Table) -> tuple[np.ndarray, int]:
    """(symmetric float64 d×d matrix of E[x xᵀ] (un-quantized), n_vectors)
    from `embedding_gram_matrix`'s triangle table."""
    di = gram["dim_i"].to_numpy(zero_copy_only=False)
    dj = gram["dim_j"].to_numpy(zero_copy_only=False)
    sv = gram["sum_q2"].to_numpy(zero_copy_only=False)
    sent = (di == 0) & (dj == 0)
    n = int(sv[sent].sum()) if sent.any() else 0
    di, dj, sv = di[~sent], dj[~sent], sv[~sent]
    d = int(di.max()) if len(di) else 0
    m = np.zeros((d, d), dtype=np.float64)
    m[di - 1, dj - 1] = sv
    m[dj - 1, di - 1] = sv
    return m / max(n, 1) / 1e6, n  # e3 quantization → 1e6 on products


def pca_top_components(gram_dense: np.ndarray, n_components: int,
                       iters: int = 200, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Top principal directions of the (driver-resident, d×d) second-moment
    matrix via power iteration with deflation — deterministic (seeded init,
    fixed iteration count, sign pinned to the largest-magnitude coordinate).
    Returns (components (n × d), eigenvalues (n,))."""
    rng = np.random.default_rng(seed)
    a = gram_dense.copy()
    d = a.shape[0]
    comps, vals = [], []
    for _ in range(min(n_components, d)):
        v = rng.standard_normal(d)
        v /= np.linalg.norm(v)
        for _ in range(iters):
            w = a @ v
            nw = np.linalg.norm(w)
            if nw == 0:
                break
            v = w / nw
        lam = float(v @ a @ v)
        pin = int(np.argmax(np.abs(v)))
        if v[pin] < 0:
            v = -v
        comps.append(v)
        vals.append(lam)
        a = a - lam * np.outer(v, v)
    return np.asarray(comps), np.asarray(vals)


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication (Abbas et al. 2023, arXiv:2303.09540):
# k-means-cluster the embeddings, then within each cluster drop all but one
# member of every quantized-cosine-connected duplicate component, keeping
# the member FARTHEST from the centroid (the paper's keep-low-centroid-
# similarity rule — it preserves diversity). The only exchange is ONE
# groupby("cluster") co-locating each cluster's vectors; pairwise work is
# O(Σ c²) flops per cluster, bounded by sizing k ~ n/c_target (and by the
# optional `pairwise_cap` sorted-window fallback for pathological clusters).
# Pairwise similarity is computed on e6-quantized normalized vectors with
# exact integer dot products (float64 matmul of integers ≤ 2^53 is exact),
# so keep/drop decisions are bit-identical under any batching/partitioning.
# ---------------------------------------------------------------------------


def _uf_components(n: int, ia: np.ndarray, ib: np.ndarray) -> np.ndarray:
    """Union-find connected-component labels for n nodes and edge arrays
    (ia, ib). Returns root index per node (path-compressed)."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(ia.tolist(), ib.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.asarray([find(i) for i in range(n)], dtype=np.int64)


def semdedup(
    ds,
    n_clusters: int,
    dim: int | None = None,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    threshold: float = 0.95,
    iters: int = 4,
    seed: int = 11,
    centroids: np.ndarray | None = None,
    pairwise_cap: int = 8192,
    concurrency=None,
):
    """Semantic dedup decision table: (id, cluster, sim_e6, keep, rep_id).
    `rep_id` is the kept representative of the row's duplicate component
    (rows with keep=True are their own rep). Within a cluster two vectors
    are duplicates when their quantized cosine q_a·q_b ≥ floor(1e12·θ)
    (q = floor(1e6·normalize(x) + 0.5) int per coordinate — ~1e-4-relative
    agreement with true cosine, and exactly deterministic). The kept member
    of each component is the (sim_e6, id)-minimum: lowest similarity to the
    cluster centroid, id as tie-break — the SemDeDup keep rule.

    Clusters larger than `pairwise_cap` fall back to a sorted-window
    compare (order by (sim_e6, id), compare within a `pairwise_cap`-wide
    band) — a documented approximation: near-duplicates have near-equal
    centroid similarity, so they stay inside the band; pass
    pairwise_cap=None to force the exact O(c²) path.

    Reference analog: the IssueSet dedup-semantics family
    (/root/reference/extraction/IssueSet.py) — the reference has no
    embedding ops; this is the LLM-pipeline extension the build mandates."""
    import ray
    import ray.data as rd  # noqa: F401

    if dim is None:
        first = ds.take(1)
        if not first:
            return rd.from_arrow(
                pa.table(
                    {
                        id_column: pa.array([], pa.int64()),
                        "cluster": pa.array([], pa.int64()),
                        "sim_e6": pa.array([], pa.int64()),
                        "keep": pa.array([], pa.bool_()),
                        "rep_id": pa.array([], pa.int64()),
                    }
                )
            )
        dim = len(first[0][vec_column])
    if centroids is None:
        centroids, _, _ = kmeans_fit_distributed(
            ds, n_clusters, dim, vec_column=vec_column, iters=iters, seed=seed
        )
    cents_ref = ray.put(np.ascontiguousarray(centroids, dtype=np.float32))
    thr_q = int(np.floor(1e12 * threshold))

    def label_carry(t: pa.Table, _ref=cents_ref) -> pa.Table:
        # (id, cluster, sim_e6, qvec int32-e6 bytes) — the carried payload
        # is 4·d B/vector; the groupby ships it exactly once
        cents = ray.get(_ref)
        m = batch_matrix(t[vec_column])
        if not len(m):
            return pa.table(
                {
                    id_column: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "sim_e6": pa.array([], pa.int64()),
                    "qvec": pa.array([], pa.binary()),
                }
            )
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        mn = _normalize(m)
        sims = mn @ cents.T
        assign = np.argmax(sims, axis=1)
        sim_e6 = np.floor(
            1e6 * sims[np.arange(len(mn)), assign].astype(np.float64) + 0.5
        ).astype(np.int64)
        q = np.floor(1e6 * mn.astype(np.float64) + 0.5).astype(np.int32)
        step = 4 * q.shape[1]
        raw = q.tobytes()
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "sim_e6": pa.array(sim_e6, pa.int64()),
                "qvec": pa.array(
                    [raw[i * step:(i + 1) * step] for i in range(len(mn))],
                    pa.binary(),
                ),
            }
        )

    labeled = ds.map_batches(
        label_carry, batch_format="pyarrow", batch_size=2048
    )

    def prune(g: pa.Table) -> pa.Table:
        c = g.num_rows
        ids = g[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        sim = g["sim_e6"].to_numpy(zero_copy_only=False).astype(np.int64)
        # canonical in-group order: (sim_e6, id) — the keep rule's order,
        # so component roots land on keepers and the window band is tight
        order = np.lexsort((ids, sim))
        ids, sim = ids[order], sim[order]
        qcol = g["qvec"].combine_chunks().take(pa.array(order))
        q = np.frombuffer(b"".join(qcol.to_pylist()), dtype=np.int32).reshape(
            c, dim
        ).astype(np.float64)
        banded = pairwise_cap is not None and c > pairwise_cap
        band = pairwise_cap if banded else c
        ia_l, ib_l = [], []
        tile = 1024
        for s in range(0, c, tile):
            e = min(s + tile, c)
            hi = min(c, e + band) if banded else c
            sims_q = q[s:e] @ q[s:hi].T  # exact: integer values < 2^53
            ti, tj = np.nonzero(sims_q >= thr_q)
            gi, gj = ti + s, tj + s
            mask = gj > gi
            if banded:
                mask &= (gj - gi) <= band
            if mask.any():
                ia_l.append(gi[mask])
                ib_l.append(gj[mask])
        if ia_l:
            roots = _uf_components(
                c, np.concatenate(ia_l), np.concatenate(ib_l)
            )
        else:
            roots = np.arange(c, dtype=np.int64)
        keep = roots == np.arange(c)
        cluster = int(g["cluster"][0].as_py()) if c else -1
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "cluster": pa.array(
                    np.full(c, cluster, dtype=np.int64), pa.int64()
                ),
                "sim_e6": pa.array(sim, pa.int64()),
                "keep": pa.array(keep),
                "rep_id": pa.array(ids[roots], pa.int64()),
            }
        )

    return labeled.groupby("cluster").map_groups(
        prune, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (per-dimension min/max -> uint8 codes)
# ---------------------------------------------------------------------------


def embedding_dim_minmax(ds, vec_column: str = "embedding"):
    """Exact per-dimension (min, max) over an embedding column — the train
    step of FAISS-style SQ8 scalar quantization. Per-batch combiner emits
    one (dim, mn, mx) row per dimension (min/max are order-free, so the
    result is exact under any batching); a dimension-count-bounded groupby
    reduces the partials and the driver receives only O(d) rows. Returns
    (mn, mx) float64 arrays indexed by 0-based dim; ragged vectors
    contribute to the dims they have."""
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        arr = t[vec_column].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.asarray(arr.offsets)
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = np.diff(offs).astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.float64()),
                 "mx": pa.array([], pa.float64())}
            )
        dim_el = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs[:-1].astype(np.int64), lens)
        )
        order = np.argsort(dim_el, kind="stable")
        d_s, v_s = dim_el[order], vals[order]
        first = np.empty(total, dtype=bool)
        first[0] = True
        first[1:] = d_s[1:] != d_s[:-1]
        bounds = np.flatnonzero(first)
        return pa.table(
            {
                "dim": pa.array(d_s[bounds], pa.int64()),
                "mn": pa.array(np.minimum.reduceat(v_s, bounds), pa.float64()),
                "mx": pa.array(np.maximum.reduceat(v_s, bounds), pa.float64()),
            }
        )

    mm = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    d = int(mm["dim"].max()) + 1 if len(mm) else 0
    mn = np.full(d, np.inf)
    mx = np.full(d, -np.inf)
    mn[mm["dim"].to_numpy(np.int64)] = mm["mn"].to_numpy(np.float64)
    mx[mm["dim"].to_numpy(np.int64)] = mm["mx"].to_numpy(np.float64)
    return mn, mx


class SQ8Stage:
    """Quantize float embeddings to uint8 codes with broadcast per-dim
    bounds:  code = FLOOR((x - mn) / (mx - mn) * 255 + 0.5)  (constant
    dims -> 0). The subtract/divide/multiply/add/floor sequence is replayed
    verbatim by the DuckDB oracle in float64, so codes are hash-exact; the
    stage emits packed list<uint8> (4x memory reduction before ANN), and
    query layers explode to rows where SQL comparability is needed.
    Bounds live in the actor/task closure once (O(d) state), never per
    batch."""

    def __init__(self, mn: np.ndarray, mx: np.ndarray,
                 vec_column: str = "embedding", id_column: str = "vec_id"):
        self.mn = np.asarray(mn, np.float64)
        rng = np.asarray(mx, np.float64) - self.mn
        self.rng = rng
        self.const = rng == 0
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.vec_column].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.asarray(arr.offsets)
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = np.diff(offs).astype(np.int64)
        total = int(lens.sum())
        dim_el = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs[:-1].astype(np.int64), lens)
        )
        mn_el = self.mn[dim_el]
        rng_el = self.rng[dim_el]
        safe = np.where(self.const[dim_el], 1.0, rng_el)
        code = np.floor((vals - mn_el) / safe * 255.0 + 0.5)
        code[self.const[dim_el]] = 0.0
        codes = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(code.astype(np.uint8), pa.uint8()),
        )
        return pa.table(
            {
                self.id_column: batch[self.id_column],
                "codes": codes,
            }
        )


# ---------------------------------------------------------------------------
# Product quantization (PQ: per-subspace k-means codebooks -> uint8 codes)
# ---------------------------------------------------------------------------


def pq_train(ds, m: int = 4, k: int = 64, vec_column: str = "embedding",
             dim: int | None = None, sample_size: int = 65536,
             iters: int = 10, seed: int = 13) -> np.ndarray:
    """PQ codebooks (Jégou et al. 2011, "Product Quantization for Nearest
    Neighbor Search"): split dims into m contiguous subspaces, k-means each
    (Euclidean Lloyd) on a deterministic bounded sample — the FAISS-standard
    train path (PQ training is sample-based by design; the full corpus is
    only ever ASSIGNED, never pulled). Returns float32 (m, k, dim/m).
    Empty clusters keep their previous centroid (deterministic)."""
    sample = ds.limit(sample_size).take_all()
    if not sample:
        raise ValueError("pq_train: empty dataset")
    X = np.asarray([r[vec_column] for r in sample], dtype=np.float64)
    d = X.shape[1] if dim is None else dim
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = X[:, j * dsub:(j + 1) * dsub]
        init = rng.choice(len(S), size=min(k, len(S)), replace=False)
        C = S[init].copy()
        if len(C) < k:
            C = np.vstack([C, S[rng.integers(0, len(S), k - len(C))]
                           + rng.normal(scale=1e-6, size=(k - len(C), dsub))])
        for _ in range(iters):
            d2 = (
                (C * C).sum(axis=1)[None, :]
                - 2.0 * (S @ C.T)
            )
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books.astype(np.float32)


class PQAssignStage:
    """Assign PQ codes with broadcast codebooks: each vector maps to m
    uint8 sub-codes (nearest codebook entry per subspace, Euclidean).
    Vectorized: one einsum over (n, m, dsub) x (m, k, dsub) per batch.
    O(m·k·dsub) closure state, zero exchange — the corpus-wide assignment
    streams at any scale (codes are a 4·d/m-fold memory cut)."""

    def __init__(self, codebooks: np.ndarray, vec_column: str = "embedding",
                 id_column: str = "vec_id", append_to_batch: bool = False):
        self.cb = np.asarray(codebooks, np.float64)
        self.cb_sq = (self.cb * self.cb).sum(axis=2)  # (m, k)
        self.vec_column = vec_column
        self.id_column = id_column
        # append: keep the batch's other columns (e.g. the float vectors a
        # downstream exact re-ranker needs) instead of emitting codes only
        self.append_to_batch = append_to_batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        mb, kb, dsub = self.cb.shape
        arr = batch[self.vec_column].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        n = len(arr)
        X = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
        if n == 0:
            packed = pa.array([], pa.list_(pa.uint8()))
            if self.append_to_batch:
                return batch.append_column("codes", packed)
            return pa.table(
                {self.id_column: batch[self.id_column], "codes": packed}
            )
        d = X.size // n
        if d != mb * dsub:
            raise ValueError(f"PQAssign: vector dim {d} != m*dsub {mb * dsub}")
        Xs = X.reshape(n, mb, dsub)
        sims = np.einsum("nmd,mkd->nmk", Xs, self.cb)
        codes = np.argmin(self.cb_sq[None, :, :] - 2.0 * sims, axis=2)
        packed = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * mb, mb, dtype=np.int32)),
            pa.array(codes.ravel().astype(np.uint8), pa.uint8()),
        )
        if self.append_to_batch:
            return batch.append_column("codes", packed)
        return pa.table(
            {self.id_column: batch[self.id_column], "codes": packed}
        )


def pq_reconstruct(codebooks: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Decode (n, m) uint8 codes back to (n, d) float vectors — the ADC
    lookup used by tests and PQ-based scorers."""
    cb = np.asarray(codebooks, np.float64)
    m = cb.shape[0]
    return np.concatenate(
        [cb[j][codes[:, j]] for j in range(m)], axis=1
    )


class PQTopK:
    """ADC-pruned, exact-re-ranked per-batch top-k — the production PQ
    search pattern: asymmetric-distance scores from an O(Q·m·k) lookup
    table prune each batch to `shortlist` candidates per query (m gathers
    per row instead of d multiplies), then ONLY the shortlist gets exact
    cosine before the batch emits k+1 rows per query. Cosine over codes
    uses the subspace decomposition ||recon(x)||² = Σ_j ||cb_j[code_j]||²
    (subspaces concatenate orthogonally), so no reconstruction happens in
    the prune."""

    def __init__(self, queries_ref, codebooks: np.ndarray, k: int,
                 shortlist: int = 128, vec_column: str = "embedding",
                 id_column: str = "vec_id"):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.query_ids, qm = q
        self.qm = _normalize(np.asarray(qm, dtype=np.float32)).astype(np.float64)
        cb = np.asarray(codebooks, np.float64)
        mb, kb, dsub = cb.shape
        # LUT[q, j, c] = q_sub[j] · cb[j][c];  norms2[j, c] = ||cb[j][c]||²
        self.lut = np.einsum(
            "qjd,jcd->qjc", self.qm.reshape(len(self.qm), mb, dsub), cb
        )
        self.norms2 = (cb * cb).sum(axis=2)
        self.m = mb
        self.k = k
        self.shortlist = shortlist
        self.vec_column = vec_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(self.id_column).to_pylist())
        n = len(ids)
        out = {"query_id": [], "vec_id": [], "similarity": []}
        if n == 0:
            return pa.table(
                {k: pa.array(v, pa.int64() if k != "similarity" else pa.float64())
                 for k, v in out.items()}
            )
        codes_arr = batch["codes"].combine_chunks()
        if isinstance(codes_arr, pa.ChunkedArray):
            codes_arr = codes_arr.combine_chunks()
        codes = (
            codes_arr.values.to_numpy(zero_copy_only=False)
            .astype(np.int64)
            .reshape(n, self.m)
        )
        # ADC prune: scores (Q, n) by m gathers; norm² by m gathers
        s = np.zeros((len(self.qm), n))
        n2 = np.zeros(n)
        for j in range(self.m):
            s += self.lut[:, j, :][:, codes[:, j]]
            n2 += self.norms2[j, codes[:, j]]
        adc = s / np.sqrt(np.maximum(n2, 1e-30))[None, :]
        cand_n = min(self.shortlist, n)
        exact_m = _normalize(batch_matrix(batch.column(self.vec_column)))
        k_emit = min(self.k + 1, n)
        for qi, qid in enumerate(self.query_ids):
            if cand_n < n:
                cand = np.argpartition(-adc[qi], cand_n - 1)[:cand_n]
            else:
                cand = np.arange(n)
            exact = exact_m[cand].astype(np.float64) @ self.qm[qi]
            top = (
                np.argpartition(-exact, k_emit - 1)[:k_emit]
                if len(exact) > k_emit
                else np.arange(len(exact))
            )
            for t in top:
                out["query_id"].append(qid)
                out["vec_id"].append(ids[cand[t]])
                out["similarity"].append(float(exact[t]))
        return pa.table(out)


def knn_cosine_pq(
    ds,
    queries: tuple[list, np.ndarray],
    k: int,
    m: int = 4,
    n_codes: int = 64,
    shortlist: int = 128,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    exclude_self: bool = True,
    codebooks: np.ndarray | None = None,
):
    """PQ-accelerated top-k cosine: sample-trained codebooks (reusable via
    `codebooks=`), one streaming assign pass (codes appended beside the
    vectors), ADC prune + exact re-rank per batch, then the same
    deterministic (−similarity, vec_id) global merge as `knn_cosine`.
    Same output schema as knn_cosine/knn_cosine_ivf."""
    books = codebooks if codebooks is not None else pq_train(
        ds, m=m, k=n_codes, vec_column=vec_column
    )
    partials = ds.map_batches(
        PQAssignStage(books, vec_column, id_column, append_to_batch=True),
        batch_format="pyarrow",
    ).map_batches(
        PQTopK(queries, books, k, shortlist, vec_column, id_column),
        batch_format="pyarrow",
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        qid = group["query_id"].iloc[0]
        g = group
        if exclude_self:
            g = g[g["vec_id"] != qid]
        g = g.sort_values(
            ["similarity", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return g.assign(rank=np.arange(1, len(g) + 1))

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
