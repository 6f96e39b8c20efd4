"""Bigram-PMI collocations (stages/text.py collocations_pmi): handmade
corpus parity with an independent reference, batch-split invariance,
min_count gating, empty input."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _ref_pmi(texts, min_count, k):
    lnq = lambda x: math.floor(math.log(x) * 1e6 + 0.5)
    uni, big = {}, {}
    nu = nb = 0
    for t in texts:
        toks = (t or "").lower().split()
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
            nu += 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            nb += 1
    rows = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = lnq(c) - lnq(nb) - lnq(uni[a]) - lnq(uni[b]) + 2 * lnq(nu)
        rows.append((a, b, c, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def _run(texts, min_count=2, k=10, parallelism=3):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import collocations_pmi

    t = pa.table({"text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(parallelism)
    out = collocations_pmi(ds, min_count=min_count, k=k).take_all()
    return [(r["w1"], r["w2"], r["c_xy"], r["pmi_e6"]) for r in out]


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox likes the quick red fox",
    "a quick brown dog and the quick brown fox",
    "new york is not old york but new york",
    "new york new york so good they named it twice",
    None,
    "",
]


def test_matches_reference(ray_session):
    assert _run(TEXTS) == _ref_pmi(TEXTS, 2, 10)


def test_partition_invariance(ray_session):
    assert _run(TEXTS, parallelism=1) == _run(TEXTS, parallelism=7)


def test_min_count_gates_pairs(ray_session):
    out = _run(TEXTS, min_count=3)
    assert out == _ref_pmi(TEXTS, 3, 10)
    assert all(c >= 3 for _, _, c, _ in out)


def test_no_cross_doc_bigrams(ray_session):
    # last word of doc 1 + first word of doc 2 must not pair
    out = _run(["alpha beta", "beta gamma"] * 3, min_count=2)
    pairs = {(a, b) for a, b, _, _ in out}
    assert ("beta", "beta") not in pairs
    assert ("alpha", "beta") in pairs and ("beta", "gamma") in pairs


def test_empty_input(ray_session):
    assert _run([None, "", "   "]) == []


def _bm25_ref(texts, queries, k=10):
    """Independent float BM25 (k1=1.2, b=0.75) with the same idf variant —
    used for RANK agreement (the engine quantizes to e6)."""
    import math

    toks = [(t or "").lower().split() for t in texts]
    docs = [(i, tk) for i, tk in enumerate(toks)]
    n = len(docs)
    sl = sum(len(tk) for _, tk in docs)
    avg = sl / n
    out = {}
    for qid, terms in queries.items():
        scores = []
        for i, tk in docs:
            sc = 0.0
            hit = False
            for t in set(terms):
                tf = tk.count(t)
                if tf == 0:
                    continue
                hit = True
                df = sum(1 for _, o in docs if t in o)
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
                sc += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avg))
            if hit:
                scores.append((i, sc))
        scores.sort(key=lambda x: (-x[1], x[0]))
        out[qid] = [i for i, _ in scores[:k]]
    return out


def test_bm25_ranks_match_float_reference(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import bm25_topk

    texts = [
        "alpha beta gamma delta",
        "alpha alpha alpha beta",
        "gamma gamma delta delta epsilon",
        "beta beta beta beta beta beta beta beta",
        "zeta eta theta",
        "alpha gamma",
        None,
        "",
    ]
    queries = {1: ["alpha", "gamma"], 2: ["beta"], 3: ["epsilon", "zeta"]}
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    rows = bm25_topk(
        rd.from_arrow(t).repartition(3), queries, k=10
    ).take_all()
    got = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], -r["score_e6"], r["doc_id"])):
        got.setdefault(r["query_id"], []).append(r["doc_id"])
    assert got == _bm25_ref(texts, queries)


def test_bm25_term_stuffed_doc_saturates(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import bm25_topk

    # tf saturation: 100 repeats must NOT score 100x a doc with 2 mentions
    texts = ["rare " * 100, "rare rare common words here", "common words"]
    t = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    rows = bm25_topk(rd.from_arrow(t), {1: ["rare"]}, k=3).take_all()
    by_doc = {r["doc_id"]: r["score_e6"] for r in rows}
    assert set(by_doc) == {0, 1}
    assert by_doc[0] < 3 * by_doc[1]  # saturated, not linear in tf
