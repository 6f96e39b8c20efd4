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


def test_jaccard_verify_buckets_parity(ray_session):
    """The bucket-scoped exact verifier (LSH candidates → exact ngram-Jaccard
    inside buckets) returns EXACTLY what the whole-group all-pairs reference
    verifier returns on a multi-lang corpus — including the same-lang
    constraint: identical texts in DIFFERENT langs must not pair."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import jaccard_verify_buckets

    t = docs_table()
    extra = pa.table(
        {
            "doc_id": [200, 201, 202, 203],
            "text": [BASE, BASE, BASE.replace("cat", "kitten"), BASE],
            "lang": ["de", "de", "de", "fr"],  # 203 same text, different lang
        }
    )
    full = pa.concat_tables([t, extra])
    ds = rd.from_arrow(full).repartition(5)
    ref = (
        ngram_jaccard_pairs(ds, "text", "doc_id", "lang", threshold=0.5)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    got = (
        jaccard_verify_buckets(ds, "text", "doc_id", threshold=0.5, group_column="lang")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ref, got, check_exact=True)
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (200, 201) in pairs and (100, 203) not in pairs and (200, 203) not in pairs


def test_jaccard_verify_buckets_giant_language(ray_session):
    """One-giant-language fixture: 12k docs ALL in one lang. The old
    whole-language groupby would put all 12k docs (and the 72M-pair loop) in
    ONE worker group; the bucket-scoped path only ever groups LSH bucket
    survivors. Asserts (a) the exact planted pair set comes back, (b) the
    post-sieve survivor volume — the largest unit any worker holds — is a
    tiny fraction of the corpus."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import (
        BandExplodeStage,
        MinHashSignatureStage,
        VERIFY_BANDS,
        _sieve_multi_buckets,
        jaccard_verify_buckets,
    )

    rng = np.random.default_rng(11)
    vocab = np.array([f"w{i}" for i in range(50_000)])
    n_background = 11_880
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(n_background)]
    ids = list(range(n_background))
    # 40 planted near-dup cliques of 3 (one word substituted per variant)
    planted_ids, planted_texts = [], []
    for c in range(40):
        base_toks = rng.choice(vocab, size=30)
        base = " ".join(base_toks)
        v1 = base_toks.copy(); v1[5] = "subA"
        v2 = base_toks.copy(); v2[17] = "subB"
        for k, tx in enumerate([base, " ".join(v1), " ".join(v2)]):
            planted_ids.append(1_000_000 + c * 10 + k)
            planted_texts.append(tx)
    all_ids = ids + planted_ids
    all_texts = texts + planted_texts
    tbl = pa.table(
        {"doc_id": all_ids, "text": all_texts, "lang": ["xx"] * len(all_ids)}
    )
    ds = rd.from_arrow(tbl).repartition(8)
    got = (
        jaccard_verify_buckets(ds, "text", "doc_id", threshold=0.5, group_column="lang")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # ground truth: the reference verifier over just the planted docs
    # (30-token docs over a 50k vocab: background cross-jaccard ≈ 0)
    ref = (
        ngram_jaccard_pairs(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": planted_ids,
                        "text": planted_texts,
                        "lang": ["xx"] * len(planted_ids),
                    }
                )
            ),
            "text",
            "doc_id",
            "lang",
            threshold=0.5,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(ref) == 120  # 40 cliques × 3 pairs, all above 0.5
    pd.testing.assert_frame_equal(ref, got, check_exact=True)

    # scale shape: survivors of the singleton-bucket sieve are the ONLY rows
    # that ever reach a verify worker — they must be a sliver of the corpus
    sigs = ds.map_batches(
        MinHashSignatureStage(text_column="text", id_column="doc_id"),
        batch_format="pyarrow",
    ).materialize()
    exploded = sigs.map_batches(
        BandExplodeStage(bands=VERIFY_BANDS), batch_format="pyarrow"
    )
    sieved, n_multi = _sieve_multi_buckets(exploded, "bucket")
    n_survivors = sieved.count()
    assert n_survivors < len(all_ids)  # << 12k docs × 64 bands = 768k rows
