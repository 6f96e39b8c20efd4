"""Distributed Gram matrix + PCA (stages/similarity.py:
embedding_gram_matrix / gram_to_dense / pca_top_components).

The gate checks `embedding_gram` hash-exact vs its DuckDB replay; here we
pin batching invariance of the distributed reduce, the dense round-trip,
and that power-iteration PCA recovers numpy's eigendecomposition on a
matrix with a clear spectral gap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.similarity import (
    embedding_gram_matrix,
    gram_to_dense,
    pca_top_components,
)


def _rd():
    import ray.data

    return ray.data


def _vecs(n=300, d=10, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions with a clear spectral gap
    base = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    base[:, 0] += rng.standard_normal(n).astype(np.float32) * 3.0
    base[:, 1] += rng.standard_normal(n).astype(np.float32) * 1.5
    return base


def _tbl(m):
    return pa.table({"embedding": [r.tolist() for r in m]})


@pytest.mark.usefixtures("ray_session")
def test_gram_batching_invariant_and_matches_numpy():
    m = _vecs()
    outs = []
    for parts in (1, 6):
        ds = _rd().from_arrow(_tbl(m))
        if parts > 1:
            ds = ds.repartition(parts)
        outs.append(embedding_gram_matrix(ds, "embedding"))
    assert outs[0].equals(outs[1])  # bit-identical reduce

    q = np.floor(1e3 * m.astype(np.float64) + 0.5).astype(np.int64)
    expect = q.T @ q
    dense, n = gram_to_dense(outs[0])
    assert n == len(m)
    np.testing.assert_allclose(dense, expect / n / 1e6, rtol=0, atol=0)


@pytest.mark.usefixtures("ray_session")
def test_pca_matches_numpy_eigh():
    m = _vecs(n=500, d=8, seed=11)
    ds = _rd().from_arrow(_tbl(m)).repartition(3)
    dense, _n = gram_to_dense(embedding_gram_matrix(ds, "embedding"))
    comps, vals = pca_top_components(dense, 3)
    ew, ev = np.linalg.eigh(dense)
    top = np.argsort(ew)[::-1][:3]
    np.testing.assert_allclose(vals, ew[top], rtol=1e-8)
    for i, j in enumerate(top):
        # eigenvectors up to sign; components pin sign deterministically
        dot = abs(float(comps[i] @ ev[:, j]))
        assert dot > 1 - 1e-8
    # deterministic: a second run is bit-identical
    comps2, vals2 = pca_top_components(dense, 3)
    assert np.array_equal(comps, comps2) and np.array_equal(vals, vals2)


@pytest.mark.usefixtures("ray_session")
def test_gram_query_on_testdata():
    import __ray_entry__ as E

    out = E.queries()["embedding_gram"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    d = 64
    assert len(df) == d * (d + 1) // 2 + 1  # triangle + sentinel
    sent = df[(df.dim_i == 0) & (df.dim_j == 0)]
    assert sent["sum_q2"].iloc[0] == 500
    # diagonal entries are positive (non-degenerate vectors)
    diag = df[(df.dim_i == df.dim_j) & (df.dim_i > 0)]
    assert (diag["sum_q2"] > 0).all() and len(diag) == d
