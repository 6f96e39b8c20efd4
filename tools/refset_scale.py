"""Driver-RSS scaling evidence for the distributed reference-set builders.

The round-4 verdict's #1 finding: the LM/decontamination family pulled a
corpus-proportional reference subset to the driver (`.to_pandas()`), so
driver memory grew with the corpus. This tool measures driver peak RSS for
both builder paths at two corpus sizes (10x apart): the distributed path
must stay ~flat while the legacy driver-side pull grows with the subset.

Each (mode, n_docs) cell runs in a FRESH subprocess with its own
ray.init so RSS readings don't contaminate each other.

Usage: python tools/refset_scale.py            # run the experiment
       python tools/refset_scale.py --cell distributed 100000   # internal
"""
from __future__ import annotations

import json
import os
import resource
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 1000
WORDS_PER_DOC = 60
CHUNK = 50_000


def gen_corpus(path: str, n_docs: int) -> None:
    rng = np.random.default_rng(42)
    vocab = np.array([f"tok{i:04d}" for i in range(VOCAB)], dtype=object)
    writer = None
    for lo in range(0, n_docs, CHUNK):
        n = min(CHUNK, n_docs - lo)
        ids = np.arange(lo, lo + n, dtype=np.int64)
        texts = [
            " ".join(vocab[rng.integers(0, VOCAB, WORDS_PER_DOC)])
            for _ in range(n)
        ]
        t = pa.table({"doc_id": ids, "text": pa.array(texts, pa.string())})
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t)
    if writer is not None:
        writer.close()


def run_cell(mode: str, n_docs: int, corpus: str) -> None:
    import pyarrow.compute as pc
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from fdpg_query_data_validation_ray.stages.text import (
        train_bigram_lm,
        train_bigram_lm_distributed,
    )

    ds = ray.data.read_parquet(corpus, columns=["doc_id", "text"]).map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"], pc.multiply(pc.divide(t["doc_id"], 17), 17)
                ),
                0,
            )
        ),
        batch_format="pyarrow",
    )
    if mode == "distributed":
        model = train_bigram_lm_distributed(ds, "text")
    else:  # legacy driver-side pull (the round-4 scale defect, kept here
        # only as the experimental control)
        df = ds.to_pandas()
        model = train_bigram_lm(df["text"])
    rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "mode": mode, "n_docs": n_docs, "subset_docs": n_docs // 17 + 1,
        "vocab": int(model[5]), "bigrams": int(len(model[2])),
        "driver_peak_rss_mb": round(rss_mb, 1),
    }))
    ray.shutdown()


def main() -> None:
    if "--cell" in sys.argv:
        i = sys.argv.index("--cell")
        run_cell(sys.argv[i + 1], int(sys.argv[i + 2]), sys.argv[i + 3])
        return
    sizes = [100_000, 1_000_000]
    corpora = {}
    for n in sizes:
        path = f"/tmp/refset_corpus_{n}.parquet"
        if not os.path.exists(path):
            gen_corpus(path, n)
        corpora[n] = path
    for mode in ("distributed", "driver"):
        for n in sizes:
            subprocess.run(
                [sys.executable, __file__, "--cell", mode, str(n), corpora[n]],
                check=True,
            )


if __name__ == "__main__":
    main()
