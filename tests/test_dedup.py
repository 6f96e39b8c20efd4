"""Dedup operator tests: exact, MinHash+LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.dedup import (
    exact_dedup,
    exact_duplicate_groups,
    hamming64,
    jaccard,
    minhash_near_duplicates,
    minhash_signatures,
    ngram_jaccard_pairs,
    ngram_set,
    simhash_near_duplicates,
    simhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)


def docs_table():
    rng = np.random.default_rng(3)
    words = BASE.split()
    texts, ids = [], []
    for i in range(60):  # unrelated docs
        texts.append(" ".join(rng.choice(words, size=30)) + f" unique{i}")
        ids.append(i)
    # exact dup triple (100, 101, 102), near-dup 103: one word changed
    texts += [BASE, BASE, BASE, BASE.replace("dog", "wolf")]
    ids += [100, 101, 102, 103]
    return pa.table({"doc_id": ids, "text": texts, "lang": ["en"] * len(ids)})


def test_minhash_signature_properties():
    sigs = minhash_signatures([BASE, BASE, BASE.replace("dog", "wolf"), "zzz yyy xxx"])
    assert np.array_equal(sigs[0], sigs[1])  # identical text → identical sig
    near = (sigs[0] == sigs[2]).mean()
    far = (sigs[0] == sigs[3]).mean()
    # 128-perm estimator std ≈ sqrt(J(1−J)/128) ≈ 0.04 — assert the gap, not
    # a razor-thin point estimate
    assert near > 0.6
    assert far < 0.2
    assert near - far > 0.35


def test_exact_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_table()).repartition(4)
    groups = exact_duplicate_groups(ds, "text", "doc_id").to_pandas()
    assert len(groups) == 1
    assert groups.iloc[0]["keep_id"] == 100
    assert groups.iloc[0]["n_copies"] == 3
    kept = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert len(kept) == 62  # 64 docs, two exact copies removed
    assert {101, 102}.isdisjoint(set(kept["doc_id"]))
    assert 100 in set(kept["doc_id"])


def test_minhash_lsh_pairs(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_table()).repartition(3)
    pairs = minhash_near_duplicates(ds, "text", "doc_id", threshold=0.6).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (100, 101) in got
    assert (100, 102) in got and (101, 102) in got  # 102 is exact copy of BASE too
    assert (102, 103) in got  # near-dup
    # no false positives among unrelated docs
    assert all(a >= 100 for a, b in got)
    est = pairs.set_index(["id_a", "id_b"])["est_jaccard"]
    assert est[(100, 101)] == 1.0


def test_simhash_pairs(ray_session):
    import ray.data as rd

    sigs = simhash_signatures([BASE, BASE.replace("dog", "wolf"), "zzz yyy xxx"])
    assert hamming64(sigs[0:1], sigs[1:2])[0] <= 6
    assert hamming64(sigs[0:1], sigs[2:3])[0] > 10

    ds = rd.from_arrow(docs_table()).repartition(3)
    pairs = simhash_near_duplicates(ds, "text", "doc_id", max_hamming=6).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (100, 101) in got
    assert (102, 103) in got
    assert pairs.set_index(["id_a", "id_b"])["hamming"][(100, 101)] == 0


def test_ngram_jaccard(ray_session):
    import ray.data as rd

    assert jaccard(ngram_set(BASE), ngram_set(BASE)) == 1.0
    near = jaccard(ngram_set(BASE), ngram_set(BASE.replace("dog", "wolf")))
    assert 0.5 < near < 1.0

    ds = rd.from_arrow(docs_table())
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (100, 101) in got and (102, 103) in got
    assert pairs.set_index(["id_a", "id_b"])["jaccard"][(100, 101)] == 1.0


def test_exact_dedup_cross_batch_full_row_duplicates(ray_session):
    """Regression: the SAME (id, text) row in two different input blocks must
    yield exactly one output row (pre-join sieve), and null texts keep one
    representative."""
    import ray.data as rd
    from fdpg_query_data_validation_ray.stages.dedup import exact_dedup

    t1 = pa.table({"doc_id": [1, 2, 7], "text": ["a", "b", "dup"]})
    t2 = pa.table({"doc_id": [7, 3, 4], "text": ["dup", None, None]})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = exact_dedup(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    # a, b, dup (once, id 7), one null representative (min id 3)
    assert list(out["doc_id"]) == [1, 2, 3, 7]
