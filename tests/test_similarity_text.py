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
            ResizeStage, fn_constructor_kwargs=dict(factor=2, mode="fake"),
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


def test_multimodal_real_bmp_codec(ray_session):
    """mode='real' decodes an actual image format: spec-conformant 8-bit
    grayscale BMPs round-trip through encode → resize → decode with exact
    dimensions and pixel means; garbage payloads yield null metadata."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.multimodal import (
        decode_bmp,
        encode_bmp_gray,
    )

    # golden: a known 3x2 image round-trips exactly
    px = np.array([[0, 128, 255], [10, 20, 30]], dtype=np.uint8)
    buf = encode_bmp_gray(px)
    w, h, back = decode_bmp(buf)
    assert (w, h) == (3, 2)
    np.testing.assert_array_equal(back.astype(np.uint8), px)
    # header facts: BM magic, 8 bpp, BI_RGB
    assert buf[:2] == b"BM"

    rows = []
    rng = np.random.default_rng(0)
    for i in range(12):
        img = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        rows.append({"img_id": i, "payload": encode_bmp_gray(img), "want": float(img.mean())})
    rows.append({"img_id": 99, "payload": b"JFIF not a bmp", "want": None})
    rows.append({"img_id": 100, "payload": None, "want": None})
    ds = rd.from_items(rows)
    out = (
        ds.map_batches(
            ResizeStage, fn_constructor_kwargs=dict(factor=2, mode="real"),
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
        .map_batches(
            DecodeStage, fn_constructor_kwargs=dict(mode="real"),
            batch_format="pyarrow", batch_size=8, concurrency=2,
        )
        .to_pandas()
    )
    ok = out[out["img_id"] < 99]
    assert (ok["width"] == 16).all() and (ok["height"] == 8).all()
    # subsampled mean stays near the original mean
    assert (ok["mean_intensity"] - ok["want"]).abs().max() < 20
    bad = out[out["img_id"] >= 99]
    assert bad["width"].isna().all() and bad["mean_intensity"].isna().all()


def test_frame_sample_plan():
    assert frame_sample_plan(10, 3) == [0, 3, 6, 9]


def test_cosine_lsh_multitable_recall_and_uniqueness(ray_session):
    """OR-amplified multi-table LSH recall vs brute force at threshold 0.9
    (VERDICT r1 item 5): the default 8 planes x 8 tables config must recover
    >= 0.9 of the true pairs (expected candidate prob at cosine exactly 0.9 is
    1-(1-0.8564^8)^8 ~ 0.935, higher above), with an exactly-unique pair set
    (canonical-table emission) and precision 1 (exact in-bucket verify)."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.similarity import (
        _normalize,
        cosine_near_duplicates,
    )

    rng = np.random.default_rng(123)
    n_base, d = 150, 32
    base = _normalize(rng.standard_normal((n_base, d)).astype(np.float32))
    vecs, true_pairs = [], set()
    vid = 0
    ids_of = []
    for i in range(n_base):
        vecs.append(base[i]); ids_of.append(vid); a = vid; vid += 1
        # perturbed twin with high cosine (mix of easy and near-threshold)
        # cosine(base, twin) ~ 1/sqrt(1 + eps^2 * d): eps 0.05..0.09 at d=32
        # gives cosines ~0.96 down to ~0.89, straddling the 0.9 threshold
        eps = 0.05 + 0.04 * (i % 4) / 3
        twin = _normalize((base[i] + eps * rng.standard_normal(d).astype(np.float32))[None])[0]
        c = float(twin @ base[i])
        vecs.append(twin); b = vid; vid += 1
        if c >= 0.9:
            true_pairs.add((a, b))
    m = np.stack(vecs)
    # brute-force ground truth (all pairs, incl. accidental cross pairs)
    sims = m @ m.T
    ia, ib = np.triu_indices(len(m), k=1)
    truth = {(int(a), int(b)) for a, b in zip(ia[sims[ia, ib] >= 0.9], ib[sims[ia, ib] >= 0.9])}
    assert len(truth) >= 60  # enough signal

    t = pa.table({"vec_id": list(range(len(m))), "embedding": [r.tolist() for r in m]})
    pairs = cosine_near_duplicates(
        rd.from_arrow(t).repartition(4), threshold=0.9, dim=d
    ).to_pandas()
    got = list(zip(pairs["id_a"], pairs["id_b"]))
    assert len(got) == len(set(got))  # exactly unique, no pair-dedup needed
    got_set = set(got)
    assert got_set <= truth  # precision 1 (exact verify)
    recall = len(got_set & truth) / len(truth)
    assert recall >= 0.9, recall


def test_md5_low60_backends_agree():
    """DuckDB fast path and hashlib fallback are bit-identical (incl. the
    short-input cutoff boundary and non-ASCII)."""
    from fdpg_query_data_validation_ray.stages.text import (
        _md5_low60_py,
        md5_low60,
    )

    strs = [f"tok {i} öäß€" for i in range(1000)] + ["", " ", "a b c"]
    assert (md5_low60(strs) == _md5_low60_py(strs)).all()


def test_fingerprint_batch_matches_per_doc_reference():
    """The batch-vectorized FingerprintStage equals the per-doc winnowing
    reference on a mix of empty/short/boundary-length/long docs."""
    import random

    import numpy as np
    import pandas as pd

    from fdpg_query_data_validation_ray.stages.text import FingerprintStage

    st = FingerprintStage()
    rng = random.Random(11)
    words = [f"w{i}" for i in range(60)]
    texts = [
        " ".join(rng.choice(words) for _ in range(n))
        for n in [0, 1, 2, 4, 5, 6, 8, 9, 40, 200]
        for _ in range(5)
    ] + ["", None, "ONE two\tthree\nfour five six", "x " * 300]
    out = st(pd.DataFrame({"text": texts}))
    mins, counts = [], []
    for t in texts:
        fp = st._fingerprints(t)
        mins.append(int(fp.min()) if len(fp) else 0)
        counts.append(len(fp))
    assert (
        out["fingerprint_min"].to_numpy()
        == np.array(mins, dtype=np.uint64).view(np.int64)
    ).all()
    assert (out["n_fingerprints"].to_numpy() == np.array(counts)).all()


def test_split_frames_and_frame_sample_stage():
    """Container split by declared BMP sizes; sampled frames decode; bad
    tails end the scan without killing the row."""
    import numpy as np

    from fdpg_query_data_validation_ray.stages.multimodal import (
        FrameSampleStage,
        encode_bmp_gray,
        split_frames,
    )

    rng = np.random.default_rng(0)
    frames = [encode_bmp_gray(rng.integers(0, 256, (8 + f, 10), dtype=np.uint8))
              for f in range(5)]
    buf = b"".join(frames)
    assert split_frames(buf) == frames
    assert split_frames(buf + b"garbage") == frames  # bad tail dropped
    assert split_frames(b"") == [] and split_frames(None) == []

    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "payload": pa.array([buf], pa.binary())})
    out = FrameSampleStage(every=2)(t)
    assert out["frame_index"].to_pylist() == [0, 2, 4]
    assert out["width"].to_pylist() == [10, 10, 10]
    assert out["height"].to_pylist() == [8, 10, 12]


def test_multimodal_frames_matches_formula_oracle(ray_session):
    import duckdb

    import __ray_entry__ as E

    d = "/root/testdata/sf0.001"
    r = E.queries()["multimodal_frames"](d)
    ray_df = (r.to_pandas() if hasattr(r, "to_pandas") else r)
    ray_df = ray_df.sort_values(["doc_id", "frame_index"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = (
        con.execute(E.oracle_sql()["multimodal_frames"]).df()
        .sort_values(["doc_id", "frame_index"]).reset_index(drop=True)
    )
    assert ray_df.equals(ora)


def test_split_frames_rejects_plausible_garbage_boundary():
    """A tail starting with 'BM' but failing the info-header checks must end
    the scan (no phantom frames, no misaligned real frames)."""
    import struct

    import numpy as np

    from fdpg_query_data_validation_ray.stages.multimodal import (
        encode_bmp_gray,
        split_frames,
    )

    frame = encode_bmp_gray(np.zeros((8, 8), dtype=np.uint8))
    garbage = b"BM" + struct.pack("<I", 20) + b"\x00" * 60  # bad info header
    assert split_frames(frame + garbage) == [frame]


def test_c4_line_filter_rules(ray_session):
    """Both published line rules + the doc-level min_lines cut, plus empty /
    null / no-newline edge cases and within-doc line-order preservation."""
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.text import C4LineFilterStage

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": [
                # 3 qualifying lines, 1 short, 1 unpunctuated → kept, n=3
                "alpha beta gamma delta.\nshort one.\nfive words on this line!\n"
                "no terminal punct here at all\nfinal line has four words?",
                # only 2 qualifying lines → dropped by min_lines
                "one two three four.\nfive six seven eight!",
                None,
                "",
                # single long line, no newline, punctuated → 1 line → dropped
                "a b c d e f g h i.",
            ],
        }
    )
    out = C4LineFilterStage(min_words=4, min_lines=3)(t)
    assert out["doc_id"].to_pylist() == [1]
    assert out["n_lines"].to_pylist() == [3]
    assert out["text_clean"].to_pylist() == [
        "alpha beta gamma delta.\nfive words on this line!\n"
        "final line has four words?"
    ]
    # batch-split invariance: same rows regardless of batching
    a = C4LineFilterStage(min_words=4, min_lines=1)(t.slice(0, 2))
    b = C4LineFilterStage(min_words=4, min_lines=1)(t.slice(2))
    whole = C4LineFilterStage(min_words=4, min_lines=1)(t)
    import pyarrow as pa2

    assert pa2.concat_tables([a, b]).equals(whole)
