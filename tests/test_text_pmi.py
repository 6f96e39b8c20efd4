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
