"""ChunkStage (sliding-window training chunks) + the ccnet_buckets NTILE
formula. End-to-end hash parity vs DuckDB is covered by the oracle gate
(chunk_docs / ccnet_buckets); these tests pin the stage semantics and the
rank→bucket arithmetic directly."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fdpg_query_data_validation_ray.stages.text import ChunkStage


def _chunk_slow(text: str, window: int, stride: int):
    toks = text.split()
    out = []
    i = 0
    while i * stride < len(toks):
        a = i * stride
        b = min(a + window, len(toks))
        out.append((i, " ".join(toks[a:b]), b - a))
        i += 1
    return out


def test_chunk_stage_planted():
    st = ChunkStage(window=4, stride=2)
    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d e", "x", None, "  two   spaced\ttokens  "],
        }
    )
    out = st(t).to_pandas()
    # doc 1: starts 0,2,4 -> (a b c d), (c d e), (e)
    d1 = out[out.doc_id == 1]
    assert list(d1.chunk_text) == ["a b c d", "c d e", "e"]
    assert list(d1.n_tokens) == [4, 3, 1]
    assert list(d1.chunk_id) == [0, 1, 2]
    # single-token doc -> one chunk; null doc -> none
    assert list(out[out.doc_id == 2].chunk_text) == ["x"]
    assert len(out[out.doc_id == 3]) == 0
    # whitespace runs collapse to single-space joins; 3 tokens at stride 2
    # -> chunk starts 0 and 2 (matching generate_series(1, n, stride))
    assert list(out[out.doc_id == 4].chunk_text) == [
        "two spaced tokens",
        "tokens",
    ]


def test_chunk_stage_empty_batch_schema_stable():
    st = ChunkStage()
    empty = st(pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())}))
    full = st(pa.table({"doc_id": [7], "text": ["a b"]}))
    assert empty.schema == full.schema
    assert empty.num_rows == 0
    # all-empty texts also emit zero chunks with the same schema
    none = st(pa.table({"doc_id": [1, 2], "text": ["", "   "]}))
    assert none.schema == full.schema and none.num_rows == 0


def test_chunk_stage_bruteforce_crosscheck():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(0, 70, size=60)
    ]
    for window, stride in [(32, 16), (8, 8), (5, 3), (1, 1)]:
        st = ChunkStage(window=window, stride=stride)
        got = st(pa.table({"doc_id": list(range(60)), "text": docs})).to_pandas()
        want = [
            (i, cid, txt, n)
            for i, d in enumerate(docs)
            for (cid, txt, n) in _chunk_slow(d, window, stride)
        ]
        assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_chunk_stage_batch_split_invariant():
    rng = np.random.default_rng(5)
    docs = [" ".join(map(str, rng.integers(0, 9, size=int(n))))
            for n in rng.integers(1, 50, size=40)]
    t = pa.table({"doc_id": list(range(40)), "text": docs})
    st = ChunkStage(window=6, stride=4)
    whole = st(t)
    parts = pa.concat_tables([st(t.slice(0, 13)), st(t.slice(13, 9)),
                              st(t.slice(22))])
    assert whole.equals(parts)


def test_chunk_stage_pandas_input_accepted():
    st = ChunkStage(window=3, stride=2)
    out = st(pd.DataFrame({"doc_id": [1], "text": ["a b c d"]}))
    assert isinstance(out, pa.Table)
    assert list(out.to_pandas().chunk_text) == ["a b c", "c d"]


def _ntile_bucket(n: int, r: np.ndarray) -> np.ndarray:
    """The vectorized NTILE(3) formula from q_ccnet_buckets.to_bucket."""
    big, base = n % 3, n // 3
    size1 = base + 1
    in_first = r <= big * size1
    return (
        np.where(
            in_first,
            (r - 1) // size1,
            big + (r - 1 - big * size1) // np.maximum(base, 1),
        )
        + 1
    )


def test_ntile_formula_matches_definition():
    # SQL NTILE(k): first n % k buckets take ceil(n/k) rows, rest floor.
    for n in list(range(1, 40)) + [97, 1000, 1001, 1002]:
        r = np.arange(1, n + 1, dtype=np.int64)
        sizes = [n // 3 + (1 if i < n % 3 else 0) for i in range(3)]
        want = np.repeat([1, 2, 3], sizes)
        got = _ntile_bucket(n, r)
        assert np.array_equal(got, want), n


def test_hash_vectorize_stage_semantics():
    """Feature hashing: signed counts per occupied (doc, dim); batch-split
    invariance; empty/null docs emit nothing; oracle bit-parity is covered
    by the gate (hash_vectorize_docs)."""
    from fdpg_query_data_validation_ray.stages.text import (
        HashVectorizeStage,
        md5_low60,
    )

    st = HashVectorizeStage(n_dims=16)
    t = pa.table(
        {"doc_id": [1, 2, 3], "text": ["x y x", None, ""]}
    )
    out = st(t).to_pandas()
    assert set(out.doc_id) == {1}
    hx, hy = md5_low60(["x"]), md5_low60(["y"])
    sx = 1 if (int(hx[0]) >> 6) & 1 == 0 else -1
    row_x = out[out.dim == int(hx[0]) % 16]
    if int(hx[0]) % 16 == int(hy[0]) % 16:
        assert len(out) == 1
    else:
        assert int(row_x.val.iloc[0]) == 2 * sx
        assert len(out) == 2
    # batch-split invariance
    big = pa.table(
        {"doc_id": list(range(30)),
         "text": [f"w{i % 5} w{i % 3} shared" for i in range(30)]}
    )
    whole = st(big)
    parts = pa.concat_tables([st(big.slice(0, 11)), st(big.slice(11, 8)),
                              st(big.slice(19))])
    assert whole.equals(parts)
    import pytest

    with pytest.raises(ValueError):
        HashVectorizeStage(n_dims=128)


def test_linear_score_stage_matches_bruteforce():
    from fdpg_query_data_validation_ray.stages.text import (
        LinearScoreStage,
        md5_low60,
    )

    st = LinearScoreStage(n_dims=16)
    docs = ["alpha beta alpha", "", None, "gamma"]
    out = st(pa.table({"doc_id": [1, 2, 3, 4], "text": docs})).to_pandas()

    def slow(text):
        if not text:
            return 0
        total = 0
        for tok in text.lower().split():
            h = int(md5_low60([tok])[0])
            sign = 1 if (h >> 6) & 1 == 0 else -1
            total += sign * int(st.w[h % 16])
        return total

    assert list(out.score_i) == [slow(d) for d in docs]
    assert list(out.n_tokens) == [3, 0, 0, 1]
    # custom trained weights use identical plumbing
    custom = LinearScoreStage(n_dims=16, weights=np.arange(16))
    o2 = custom(pa.table({"doc_id": [1], "text": ["alpha"]})).to_pandas()
    h = int(md5_low60(["alpha"])[0])
    sgn = 1 if (h >> 6) & 1 == 0 else -1
    assert int(o2.score_i.iloc[0]) == sgn * (h % 16)
