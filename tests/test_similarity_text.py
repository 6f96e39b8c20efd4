"""Similarity search, text analysis, and multimodal stage tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.multimodal import (
    DecodeStage,
    ResizeStage,
    encode_fake_image,
    frame_sample_plan,
)
from fdpg_query_data_validation_ray.stages.similarity import (
    batch_matrix,
    cosine_near_duplicates,
    knn_cosine,
)
from fdpg_query_data_validation_ray.stages.text import (
    FingerprintStage,
    LangIdStage,
    QualityScoreStage,
    TokenCountStage,
)


def emb_table(n=300, d=16, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    if n > 21:
        # make 10/11 near-identical, 20/21 near-identical
        m[11] = m[10] + 0.001 * rng.standard_normal(d).astype(np.float32)
        m[21] = m[20] + 0.001 * rng.standard_normal(d).astype(np.float32)
    return pa.table(
        {"vec_id": list(range(n)), "embedding": [row.tolist() for row in m]}
    ), m


def test_knn_matches_numpy_bruteforce(ray_session):
    import ray.data as rd

    t, m = emb_table()
    ds = rd.from_arrow(t).repartition(5)
    qids = [0, 1, 2]
    out = knn_cosine(ds, (qids, m[qids]), k=5).to_pandas()
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    for q in qids:
        sims = mn @ mn[q]
        sims[q] = -np.inf  # exclude self
        expect = list(np.argsort(-sims, kind="stable")[:5])
        got = list(
            out[out["query_id"] == q].sort_values("rank")["vec_id"]
        )
        assert got == expect, (q, got, expect)


def test_cosine_near_duplicates(ray_session):
    import ray.data as rd

    t, m = emb_table()
    ds = rd.from_arrow(t).repartition(4)
    pairs = cosine_near_duplicates(ds, threshold=0.99, n_planes=8).to_pandas()
    got = {(a, b) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (10, 11) in got
    assert (20, 21) in got
    assert all(c >= 0.99 for c in pairs["cosine"])


def test_batch_matrix_shape():
    t, m = emb_table(7, 4)
    mat = batch_matrix(t["embedding"])
    assert mat.shape == (7, 4)
    np.testing.assert_allclose(mat, m, rtol=1e-6)


def test_lang_id():
    st = LangIdStage()
    df = pd.DataFrame(
        {
            "text": [
                "the cat and the dog sat on the mat for a while",
                "der Hund und die Katze sind nicht mit der Maus",
                "le chat est une belle créature pour les enfants",
                "这是一个中文句子的例子这是测试",
                "",
                None,
            ]
        }
    )
    out = st(df)
    assert list(out["lang_pred"]) == ["en", "de", "fr", "zh", "und", "und"]


def test_token_count():
    st = TokenCountStage()
    df = pd.DataFrame({"text": ["a b  c", "hello", "", None, "  x  "]})
    out = st(df)
    assert list(out["n_tokens"]) == [3, 1, 0, 0, 1]
    assert out["n_bpe_tokens"][0] >= 3


def test_quality_score():
    st = QualityScoreStage()
    good = "the quick brown fox jumps over the lazy dog and runs into the forest"
    bad_rep = "spam spam spam spam spam spam spam spam spam spam spam spam"
    df = st(pd.DataFrame({"text": [good, bad_rep, ""]}))
    assert df["quality_score"][0] > df["quality_score"][1]
    assert df["distinct_word_ratio"][1] < 0.2
    assert df["quality_score"][2] <= 0.5


def test_fingerprint_stability():
    st = FingerprintStage()
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    edited = base.replace("theta", "THETA-x", 1)
    df = st(pd.DataFrame({"text": [base, base, edited, ""]}))
    assert df["fingerprint_min"][0] == df["fingerprint_min"][1]
    assert df["n_fingerprints"][3] == 1


def test_multimodal_decode_and_resize(ray_session):
    import ray.data as rd

    rows = [
        {"img_id": i, "payload": encode_fake_image(32, 16, seed=i)} for i in range(20)
    ]
    rows.append({"img_id": 99, "payload": b"not an image"})
    rows.append({"img_id": 100, "payload": None})
    ds = rd.from_items(rows)
    out = ds.map_batches(
        DecodeStage, fn_constructor_kwargs=dict(mode="fake"),
        batch_format="pyarrow", batch_size=8, concurrency=2,
    ).to_pandas()
    ok = out[out["img_id"] < 99]
    assert (ok["width"] == 32).all() and (ok["height"] == 16).all()
    assert ok["mean_intensity"].between(100, 155).all()
    bad = out[out["img_id"] >= 99]
    assert bad["width"].isna().all()

    resized = (
        ds.map_batches(
            ResizeStage, fn_constructor_kwargs=dict(factor=2),
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
        .map_batches(
            DecodeStage, fn_constructor_kwargs=dict(mode="fake"),
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
        .to_pandas()
    )
    ok2 = resized[resized["img_id"] < 99]
    assert (ok2["width"] == 16).all() and (ok2["height"] == 8).all()


def test_multimodal_real_mode_is_stubbed():
    with pytest.raises(NotImplementedError, match="decode"):
        DecodeStage(mode="real")(pa.table({"payload": [b"x"]}))
    assert frame_sample_plan(10, 3) == [0, 3, 6, 9]
