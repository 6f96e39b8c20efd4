"""SemDeDup semantic deduplication (stages/similarity.py:semdedup).

`semdedup_embeddings` has no SQL oracle (k-means is iterative); these
tests are its correctness contract: planted near-duplicate clone families
collapse to exactly one kept member each, the kept member is the
(sim_e6, id)-minimum of its component (the paper's keep-low-centroid-
similarity rule), the decision table is invariant to input partitioning,
any two kept vectors in the same cluster are below the quantized-cosine
threshold, and the banded-window fallback still removes exact clones.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fdpg_query_data_validation_ray.stages.similarity import (
    _normalize,
    semdedup,
)


def _rd():
    import ray.data

    return ray.data


def _corpus(seed=9, k=4, per=30, d=16, clones_per_cluster=3, clone_size=4):
    """Well-separated clusters; in each, `clones_per_cluster` families of
    `clone_size` near-identical vectors (cosine > 0.999 within a family)
    plus `per` distinct background vectors (pairwise cosine < 0.9)."""
    rng = np.random.default_rng(seed)
    centers = _normalize(rng.standard_normal((k, d)).astype(np.float32)) * 4
    vecs, families = [], []
    vid = 0
    for c in centers:
        for _ in range(per):
            vecs.append(c + 0.6 * rng.standard_normal(d).astype(np.float32))
            vid += 1
        for _ in range(clones_per_cluster):
            base = c + 0.6 * rng.standard_normal(d).astype(np.float32)
            fam = []
            for _ in range(clone_size):
                vecs.append(base + 1e-4 * rng.standard_normal(d).astype(np.float32))
                fam.append(vid)
                vid += 1
            families.append(fam)
    m = np.asarray(vecs, dtype=np.float32)
    ids = np.arange(len(m), dtype=np.int64)
    return m, ids, families


def _table(m, ids):
    return pa.table(
        {"vec_id": pa.array(ids), "embedding": pa.array(list(m))}
    )


def _run(m, ids, blocks=4, **kw):
    ds = _rd().from_arrow(_table(m, ids)).repartition(blocks)
    out = semdedup(
        ds,
        n_clusters=4,
        dim=m.shape[1],
        threshold=0.99,
        iters=4,
        **kw,
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def test_planted_clone_families_collapse_to_one():
    m, ids, families = _corpus()
    out = _run(m, ids)
    assert len(out) == len(ids)
    by_id = out.set_index("vec_id")
    for fam in families:
        kept = [i for i in fam if bool(by_id.loc[i, "keep"])]
        # one survivor per family, and it is the family's (sim_e6, id) min
        assert len(kept) == 1, fam
        sims = [(int(by_id.loc[i, "sim_e6"]), i) for i in fam]
        assert kept[0] == min(sims)[1]
        # every dropped member points at the survivor
        for i in fam:
            assert int(by_id.loc[i, "rep_id"]) == kept[0]
    # background vectors all survive (pairwise cosine far below 0.99)
    fam_ids = {i for fam in families for i in fam}
    bg = out[~out["vec_id"].isin(fam_ids)]
    assert bool(bg["keep"].all())


def test_partition_invariance():
    m, ids, _ = _corpus(seed=17)
    a = _run(m, ids, blocks=1)
    b = _run(m, ids, blocks=7)
    assert a.equals(b)


def test_kept_pairs_below_threshold():
    m, ids, _ = _corpus(seed=23)
    out = _run(m, ids)
    thr_q = int(np.floor(1e12 * 0.99))
    mn = _normalize(m)
    q = np.floor(1e6 * mn.astype(np.float64) + 0.5)
    for cl, grp in out[out["keep"]].groupby("cluster"):
        kept = grp["vec_id"].to_numpy()
        sims = q[kept] @ q[kept].T
        off = sims[np.triu_indices(len(kept), k=1)]
        assert (off < thr_q).all()


def test_banded_window_fallback_removes_exact_clones():
    # tiny pairwise_cap forces the sorted-window path; exact clones have
    # identical sim_e6 so they stay adjacent in the band and still collapse
    m, ids, families = _corpus(seed=31, per=20)
    for fam in families:  # make families byte-identical clones
        m[fam[1:]] = m[fam[0]]
    out = _run(m, ids, pairwise_cap=8)
    by_id = out.set_index("vec_id")
    for fam in families:
        kept = [i for i in fam if bool(by_id.loc[i, "keep"])]
        assert len(kept) == 1, fam
