"""Scale datapoint for the two-pass exact heavy-hitters plan
(q_heavy_terms_docs: Misra-Gries candidate superset -> exact recount).

Synthetic corpus: N_DOCS docs x WORDS_PER_DOC tokens from a 300k-word
uniform vocabulary (each term lands far below the n/1000 threshold), plus
N_HOT planted hot terms appended to EVERY doc — so the exact heavy set is
precisely the planted terms with exactly n_docs occurrences each. The MG
pass is deep in its forced-truncation regime (k = 4096 counters vs 300k
live terms), which is the 100-TB posture: the candidate exchange stays
bounded at k rows per bundle no matter the vocabulary.

The run ASSERTS the output equals the planted set with exact counts before
printing throughput.

Usage: python tools/heavy_scale.py [n_docs]   # default 1_000_000
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
WORDS_PER_DOC = 40
N_HOT = 5
CHUNK = 100_000


def gen_corpus(path: str, n_docs: int) -> None:
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    vocab = np.array([f"tok{i:06d}" for i in range(VOCAB)], dtype=object)
    hot = np.array([f"hot{i}" for i in range(N_HOT)], dtype=object)
    per_doc = WORDS_PER_DOC + N_HOT
    for part, lo in enumerate(range(0, n_docs, CHUNK)):
        n = min(CHUNK, n_docs - lo)
        ids = np.arange(lo, lo + n, dtype=np.int64)
        body = vocab[rng.integers(0, VOCAB, (n, WORDS_PER_DOC))]
        toks = np.concatenate(
            [body, np.broadcast_to(hot, (n, N_HOT))], axis=1
        )
        flat = pa.array(toks.ravel(), pa.string())
        offsets = pa.array(
            np.arange(0, (n + 1) * per_doc, per_doc, dtype=np.int32)
        )
        texts = pc.binary_join(pa.ListArray.from_arrays(offsets, flat), " ")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids), "text": texts}),
            os.path.join(path, f"part-{part:04d}.parquet"),
            row_group_size=25_000,
        )


def main() -> None:
    import ray
    import ray.data as rd

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = "/tmp/heavy_scale_corpus"
    t0 = time.perf_counter()
    gen_corpus(path, n_docs)
    print(f"gen: {n_docs} docs x {WORDS_PER_DOC + N_HOT} tokens, "
          f"{time.perf_counter() - t0:.1f}s")

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    # q_heavy_terms_docs reads {sf_dir}/documents.parquet; the generated
    # corpus is a directory, so point a symlink-shaped sf_dir at it.
    sf_dir = "/tmp/heavy_scale_sf"
    os.makedirs(sf_dir, exist_ok=True)
    link = os.path.join(sf_dir, "documents.parquet")
    if os.path.islink(link) or os.path.exists(link):
        os.remove(link) if not os.path.isdir(link) else None
    if not os.path.exists(link):
        os.symlink(path, link)

    from fdpg_query_data_validation_ray.pipelines.queries import (
        q_heavy_terms_docs,
    )

    t0 = time.perf_counter()
    got = q_heavy_terms_docs(sf_dir).to_pandas().sort_values("term")
    wall = time.perf_counter() - t0
    n_tok = n_docs * (WORDS_PER_DOC + N_HOT)
    print(f"heavy_terms: {wall:.2f}s  {n_docs / wall / 1e3:.0f}k docs/s  "
          f"{n_tok / wall / 1e6:.1f}M tokens/s  rows={len(got)}")
    want = [(f"hot{i}", n_docs) for i in range(N_HOT)]
    assert [tuple(r) for r in got.itertuples(index=False)] == want, got
    print(f"exactness check: {N_HOT} planted heavies, exact counts OK "
          f"(MG truncation regime: 300k live terms vs 4096 counters)")
    ray.shutdown()


if __name__ == "__main__":
    main()
