"""CompressionRatioStage (stages/text.py): no SQL form exists (DuckDB has
no deflate), so correctness is pinned by properties — byte-length
exactness, determinism, and the separation the signal exists to provide:
repetitive ≪ prose < random-noise ratios."""

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.text import CompressionRatioStage


def _run(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    return CompressionRatioStage("text")(t)


def test_byte_lengths_and_determinism():
    texts = ["héllo wörld", "", None, "abc" * 100]
    a = _run(texts)
    b = _run(texts)
    assert a.equals(b)
    exp = [len(("" if s is None else s).encode("utf-8")) for s in texts]
    assert a["n_bytes"].to_pylist() == exp
    # ratio = zlib_bytes * 1e6 // max(raw, 1), exactly
    for nb, nz, r in zip(
        a["n_bytes"].to_pylist(),
        a["n_bytes_zlib"].to_pylist(),
        a["compression_ratio_e6"].to_pylist(),
    ):
        assert r == nz * 1_000_000 // max(nb, 1)
        assert nz > 0  # zlib header even for empty input


def test_signal_separates_repetitive_prose_random():
    rng = np.random.default_rng(11)
    rep = "spam ham " * 400
    prose = " ".join(
        rng.choice(
            ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dogs", "while", "seven", "wizards", "watch"],
            800,
        ).tolist()
    )
    noise = "".join(chr(c) for c in rng.integers(0x21, 0x2FA0, 3000))
    t = _run([rep, prose, noise])
    r_rep, r_prose, r_noise = t["compression_ratio_e6"].to_pylist()
    assert r_rep < r_prose < r_noise
    assert r_rep < 100_000          # highly repetitive: < 0.1
    assert r_noise > 500_000        # random: > 0.5


@pytest.mark.usefixtures("ray_session")
def test_query_runs_and_batch_split_invariant():
    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES

    out = QUERIES["compression_ratio_docs"]("/root/testdata/sf0.001")
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 500
    # recompute one doc standalone: batch membership must not matter
    import pyarrow.parquet as pq

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    row = docs.iloc[17]
    solo = _run([row["text"]])
    got = df[df.doc_id == row["doc_id"]].iloc[0]
    assert got["n_bytes_zlib"] == solo["n_bytes_zlib"][0].as_py()
    assert got["compression_ratio_e6"] == solo["compression_ratio_e6"][0].as_py()
