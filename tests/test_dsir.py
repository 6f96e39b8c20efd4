"""DSIR importance weights (stages/text.py DSIRWeightStage).

`dsir_weights_docs` is hash-exact against its DuckDB oracle (the gate);
these tests pin the operator semantics the oracle can't express: docs
drawn from the target distribution outscore off-target docs, and the
per-batch kernel is batch-split invariant (exact integer sums)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from fdpg_query_data_validation_ray.stages.text import (
    DSIRWeightStage,
    train_bigram_lm,
)


def _models():
    target = ["the cat sat on the mat"] * 20 + ["a dog ran in the park"] * 5
    raw = (
        ["the cat sat on the mat"] * 5
        + ["a dog ran in the park"] * 5
        + ["stock market crashed again today badly"] * 15
    )
    return train_bigram_lm(target), train_bigram_lm(raw)


def test_target_like_docs_outscore_off_target():
    mt, mr = _models()
    stage = DSIRWeightStage(mt, mr, text_column="text")
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                [
                    "the cat sat on the mat",
                    "stock market crashed again today badly",
                ]
            ),
        }
    )
    out = stage(batch).to_pandas()
    # same token count → comparable sums; target-like doc must win
    assert out.loc[0, "dsir_e6_sum"] > out.loc[1, "dsir_e6_sum"]
    assert out.loc[0, "dsir_e6_sum"] > 0  # more likely under target
    assert out.loc[1, "dsir_e6_sum"] < 0  # more likely under raw


def test_batch_split_invariance():
    rng = np.random.default_rng(3)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    docs = [
        " ".join(rng.choice(words, size=rng.integers(0, 12)))
        for _ in range(64)
    ]
    mt, mr = _models()
    stage = DSIRWeightStage(mt, mr, text_column="text")
    whole = pa.table(
        {
            "doc_id": pa.array(range(64), pa.int64()),
            "text": pa.array(docs),
        }
    )
    full = stage(whole).to_pandas()
    parts = [
        stage(whole.slice(s, 7)).to_pandas() for s in range(0, 64, 7)
    ]
    re = pd.concat(parts, ignore_index=True)
    assert full.equals(re)
    # empty and whitespace-only docs get zero features and zero weight
    z = stage(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array([" "])})
    ).to_pandas()
    assert int(z.loc[0, "n_feats"]) == 0
    assert int(z.loc[0, "dsir_e6_sum"]) == 0
