"""Scale datapoint for span_dedup (C4 §2.2 duplicate-span removal).

Synthetic corpus: N_DOCS docs x WORDS_PER_DOC tokens drawn from a 300k-word
vocabulary (random 3-token span collisions ~0.005 expected across the whole
corpus, so every removal is attributable), with ONE known 3-token phrase
planted at span 0 of every PLANT_EVERY-th document. Expected removals are
therefore exactly n_planted - 1 (the first doc_id keeps its copy), which the
run asserts before printing throughput.

Corpus generation is vectorized end-to-end (token-index matrix ->
pyarrow ListArray -> pc.binary_join), so the measured window is the
operator, not Python string assembly.

Usage: python tools/span_scale.py [n_docs]   # default 1_000_000
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

VOCAB = 300_000
WORDS_PER_DOC = 48
PLANT_EVERY = 50
CHUNK = 100_000
K = 3


def gen_corpus(path: str, n_docs: int) -> int:
    """One parquet FILE PER CHUNK (a directory): a single file caps Ray's
    read parallelism at the row-group count, which starves a 32-CPU run."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i:06d}" for i in range(VOCAB)], dtype=object)
    planted = 0
    for part, lo in enumerate(range(0, n_docs, CHUNK)):
        n = min(CHUNK, n_docs - lo)
        ids = np.arange(lo, lo + n, dtype=np.int64)
        idx = rng.integers(0, VOCAB, (n, WORDS_PER_DOC))
        plant_rows = np.nonzero(ids % PLANT_EVERY == 0)[0]
        idx[plant_rows, 0:K] = (11, 22, 33)
        planted += len(plant_rows)
        flat = pa.array(vocab[idx.ravel()], pa.string())
        offsets = pa.array(
            np.arange(0, (n + 1) * WORDS_PER_DOC, WORDS_PER_DOC, dtype=np.int32)
        )
        texts = pc.binary_join(
            pa.ListArray.from_arrays(offsets, flat), " "
        )
        t = pa.table({"doc_id": pa.array(ids), "text": texts})
        pq.write_table(t, os.path.join(path, f"part-{part:04d}.parquet"),
                       row_group_size=25_000)
    return planted


def main() -> None:
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = "/tmp/span_scale_corpus"
    t0 = time.perf_counter()
    planted = gen_corpus(path, n_docs)
    t_gen = time.perf_counter() - t0
    print(f"gen: {n_docs} docs x {WORDS_PER_DOC} tokens, "
          f"{planted} planted, {t_gen:.1f}s")

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    from fdpg_query_data_validation_ray.stages.text import span_dedup

    t0 = time.perf_counter()
    out = span_dedup(rd.read_parquet(path), k=K)
    agg = out.map_batches(
        lambda t: pa.table(
            {
                "docs": pa.array([t.num_rows], pa.int64()),
                "removed": pa.array(
                    [pc.sum(t["n_spans_removed"]).as_py() or 0], pa.int64()
                ),
                "spans": pa.array(
                    [pc.sum(t["n_spans"]).as_py() or 0], pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas().sum()
    wall = time.perf_counter() - t0
    print(f"span_dedup: {wall:.2f}s  docs={int(agg.docs)} "
          f"spans={int(agg.spans)} removed={int(agg.removed)}  "
          f"{int(agg.docs) / wall / 1e3:.0f}k docs/s  "
          f"{int(agg.spans) / wall / 1e6:.1f}M spans/s")
    expected = planted - 1
    assert int(agg.docs) == n_docs, (int(agg.docs), n_docs)
    assert abs(int(agg.removed) - expected) <= 2, (int(agg.removed), expected)
    print(f"planted-duplicate check: removed {int(agg.removed)} "
          f"(expected {expected} +/- random collisions) OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
