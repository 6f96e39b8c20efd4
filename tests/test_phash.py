"""PerceptualHashStage (stages/multimodal.py) + the phash-dedup query:
brute-force cross-check (no SQL form exists — no BMP codec in DuckDB),
invariance properties, and the near-dup behavior the hash exists for."""

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.multimodal import (
    PerceptualHashStage,
    decode_bmp,
    encode_bmp_gray,
)


def _hash_bytes(buf, grid=8):
    t = pa.table({"payload": pa.array([buf], pa.binary())})
    return PerceptualHashStage("payload", grid=grid)(t)["phash"][0].as_py()


def test_identical_images_same_hash_and_null_for_garbage():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (12, 20), dtype=np.uint8)
    a = encode_bmp_gray(px)
    b = encode_bmp_gray(px.copy())
    assert _hash_bytes(a) == _hash_bytes(b)
    assert _hash_bytes(b"not a bmp") is None
    assert _hash_bytes(None) is None


def test_near_duplicate_images_hamming_close_distinct_images_far():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    # mild noise: a few pixels tweaked — perceptually the same image
    noisy = base.copy()
    noisy[:2, :2] = np.clip(noisy[:2, :2].astype(int) + 3, 0, 255)
    other = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    ha = _hash_bytes(encode_bmp_gray(base))
    hn = _hash_bytes(encode_bmp_gray(noisy))
    ho = _hash_bytes(encode_bmp_gray(other))
    d_near = bin((ha ^ hn) & ((1 << 64) - 1)).count("1")
    d_far = bin((ha ^ ho) & ((1 << 64) - 1)).count("1")
    assert d_near <= 4
    assert d_far > 10


def _brute_force_phashes(sf_dir):
    """Independent recomputation of the query's payloads + aHash."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    out = {}
    for i in ids:
        i = int(i)
        seed = i % 40 if i % 4 == 0 else i
        rng = np.random.default_rng(seed)
        w, h = 8 + seed % 24, 8 + seed % 16
        px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        dec = decode_bmp(encode_bmp_gray(px))
        assert dec is not None
        w2, h2, plane = dec
        ys, xs = (np.arange(8) * h2) // 8, (np.arange(8) * w2) // 8
        lat = plane[np.ix_(ys, xs)]
        bits = (lat > lat.mean()).astype(np.uint8).ravel()
        u = int.from_bytes(np.packbits(bits).tobytes(), "big")
        out[i] = u - (1 << 64) if u >= (1 << 63) else u
    return out


@pytest.mark.usefixtures("ray_session")
def test_query_matches_brute_force_dup_groups():
    from collections import Counter

    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["multimodal_phash_dups"](sf).to_pandas()
    ref = Counter(_brute_force_phashes(sf).values())
    exp = {h: n for h, n in ref.items() if n > 1}
    assert len(got) == len(exp)
    got_map = dict(zip(got["phash"], got["dup_count"]))
    assert got_map == exp
