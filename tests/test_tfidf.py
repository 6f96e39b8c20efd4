"""TF-IDF keyword extraction (stages/text.py: doc_frequency_distributed +
TfIdfStage).

The driver's oracle gate checks `tfidf_topk_docs` hash-exact against the
DuckDB replay; the tests here pin the pieces independently: the distributed
df builder is batching-invariant and equals a brute-force single-process
count, and the scoring stage's top-k / tie-break / fixed-point idf match a
plain-python reference on a corpus with known term statistics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.text import (
    TfIdfStage,
    _term_hashes_low60,
    doc_frequency_distributed,
)

DOCS = [
    "apple banana apple cherry",
    "banana banana date",
    "apple elderberry",
    "",  # empty doc: no rows out, still counts toward n_docs
    None,  # null doc: same
    "fig fig fig fig",
    "apple banana cherry date elderberry fig",
]


def _brute_df(docs):
    """term -> number of docs containing it, plus n_docs."""
    df: dict[str, int] = {}
    for t in docs:
        for w in set((t or "").lower().split()):
            df[w] = df.get(w, 0) + 1
    return df, len(docs)


def _brute_tfidf_topk(docs, k_top):
    """(doc_idx, term, rank, tfidf_e6) via the exact fixed-point formula."""
    df, n_docs = _brute_df(docs)
    hashes = {w: int(_term_hashes_low60(np.array([w], object))[0]) for w in df}
    rows = []
    for i, t in enumerate(docs):
        words = (t or "").lower().split()
        if not words:
            continue
        tf: dict[str, int] = {}
        for w in words:
            tf[w] = tf.get(w, 0) + 1
        scored = []
        for w, c in tf.items():
            idf_e6 = int(np.floor(np.log(n_docs / df[w]) * 1e6 + 0.5))
            scored.append((c * idf_e6, hashes[w], w))
        scored.sort(key=lambda s: (-s[0], s[1]))
        for rank, (score, hv, w) in enumerate(scored[:k_top], 1):
            rows.append((i, hv, rank, score))
    return rows


def test_tfidf_stage_matches_brute_force():
    docs = DOCS
    df, n_docs = _brute_df(docs)
    th = _term_hashes_low60(np.array(sorted(df), object))
    order = np.argsort(th)
    state = (
        th[order],
        np.array([df[w] for w in sorted(df)], np.int64)[order],
        n_docs,
    )
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    out = TfIdfStage(state, k_top=3)(batch)
    got = list(
        zip(
            out["doc_id"].to_pylist(),
            out["term_hash"].to_pylist(),
            out["rank"].to_pylist(),
            out["tfidf_e6"].to_pylist(),
        )
    )
    assert sorted(got) == sorted(_brute_tfidf_topk(docs, 3))


def test_tfidf_singleton_and_short_docs():
    # fewer distinct terms than k_top -> fewer rows; ubiquitous term -> 0
    docs = ["only one", "one", "one"]
    df, n_docs = _brute_df(docs)
    th = _term_hashes_low60(np.array(sorted(df), object))
    order = np.argsort(th)
    state = (
        th[order],
        np.array([df[w] for w in sorted(df)], np.int64)[order],
        n_docs,
    )
    out = TfIdfStage(state, k_top=3)(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": docs})
    )
    by_doc = {}
    for d, h, r, s in zip(
        out["doc_id"].to_pylist(),
        out["term_hash"].to_pylist(),
        out["rank"].to_pylist(),
        out["tfidf_e6"].to_pylist(),
    ):
        by_doc.setdefault(d, []).append((r, h, s))
    assert len(by_doc[0]) == 2 and len(by_doc[1]) == 1
    # "one" is in all docs -> idf 0 -> ranked below "only" in doc 0
    one_h = int(_term_hashes_low60(np.array(["one"], object))[0])
    assert by_doc[1] == [(1, one_h, 0)]
    assert by_doc[0][0][2] > 0 and by_doc[0][1] == (2, one_h, 0)


@pytest.mark.usefixtures("ray_session")
def test_doc_frequency_distributed_batching_invariant():
    import ray.data as rd

    docs = [DOCS[i % len(DOCS)] or "" for i in range(257)]
    brute_df, n_docs = _brute_df(docs)

    results = []
    for n_blocks in (1, 7):
        ds = rd.from_pandas(
            np.array_split(pd.DataFrame({"text": docs}), n_blocks)
        )
        results.append(doc_frequency_distributed(ds, "text"))
    (h1, d1, n1), (h2, d2, n2) = results
    assert n1 == n2 == n_docs
    assert np.array_equal(h1, h2) and np.array_equal(d1, d2)

    # equals the brute-force single-process count
    terms = sorted(brute_df)
    th = _term_hashes_low60(np.array(terms, object))
    order = np.argsort(th)
    assert np.array_equal(h1, th[order])
    assert np.array_equal(
        d1, np.array([brute_df[w] for w in terms], np.int64)[order]
    )


def test_bpe_pair_counts_hand_computed(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import bpe_pair_counts

    # 'ab' appears twice, 'abc' once, 'x' once (no pairs), plus a null doc
    t = pa.table({"text": pa.array(["ab ab", "abc x", None], pa.string())})
    out = (
        bpe_pair_counts(rd.from_arrow(t), top_n=10)
        .to_pandas()
        .set_index("pair")["freq"]
        .to_dict()
    )
    # pair 'ab': 2 (from two 'ab' tokens) + 1 (inside 'abc'); 'bc': 1
    assert out == {"ab": 3, "bc": 1}


def test_bpe_pair_counts_partition_invariant(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.text import bpe_pair_counts

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "ab", "x", "éü"]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(0, 12))) for _ in range(400)
    ]
    t = pa.table({"text": pa.array(texts, pa.string())})
    a = (
        bpe_pair_counts(rd.from_arrow(t).repartition(2), top_n=100)
        .to_pandas().reset_index(drop=True)
    )
    b = (
        bpe_pair_counts(rd.from_arrow(t).repartition(13), top_n=100)
        .to_pandas().reset_index(drop=True)
    )
    assert a.equals(b)
    # brute-force reference: pair counts over the raw token stream
    from collections import Counter

    ref = Counter()
    for txt in texts:
        for tok in txt.lower().split():
            for i in range(len(tok) - 1):
                ref[tok[i : i + 2]] += 1
    got = a.set_index("pair")["freq"].to_dict()
    top = dict(sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:100])
    assert got == top
