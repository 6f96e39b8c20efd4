"""Round-2 scale-path tests: the distributed (shuffle) candidate sieve must
produce identical results to the driver sieve, dense-duplicate corpora must
not concatenate at the driver, and the unambiguous key_enc encoding must keep
colliding CONCAT_WS strings apart."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.unique import (
    duplicate_keys,
    resolve_sieve_mode,
)


@pytest.fixture()
def force_mode(monkeypatch):
    def set_mode(mode: str):
        monkeypatch.setenv("QDV_SIEVE_MODE", mode)

    yield set_mode
    monkeypatch.delenv("QDV_SIEVE_MODE", raising=False)


def _dup_table(n=2000):
    """Composite-key table: every 10th row shares one of 50 hot keys (4 copies
    each at n=2000); the rest are unique."""
    a = [f"d{i % 50}" if i % 10 == 0 else f"u{i}" for i in range(n)]
    b = [0 if i % 10 == 0 else i % 13 for i in range(n)]
    return pa.table({"ka": a, "kb": b})


def test_shuffle_and_sieve_modes_identical(ray_session, force_mode):
    import ray.data as rd

    t = _dup_table()
    results = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        ds = rd.from_arrow(t).repartition(6)
        out = duplicate_keys(ds, ["ka", "kb"]).to_pandas()
        results[mode] = out.reset_index(drop=True)
    assert results["sieve"].equals(results["shuffle"])
    assert (results["sieve"]["dup_count"] > 1).all()
    assert len(results["sieve"]) > 0


def test_auto_mode_selects_by_size(ray_session, monkeypatch):
    import ray.data as rd

    monkeypatch.delenv("QDV_SIEVE_MODE", raising=False)
    # metadata count unavailable after a transform → scale-safe shuffle
    ds = rd.from_arrow(_dup_table(100)).map_batches(lambda t: t, batch_format="pyarrow")
    assert resolve_sieve_mode(ds, "auto") == "shuffle"
    # tiny budget forces shuffle even for known-small inputs
    monkeypatch.setattr(
        "fdpg_query_data_validation_ray.stages.unique.SIEVE_MAX_DRIVER_ROWS", 10
    )
    ds2 = rd.from_arrow(_dup_table(100))
    assert resolve_sieve_mode(ds2, "auto") == "shuffle"


def test_dense_duplicates_distributed_verify(ray_session, force_mode):
    """50% duplicate rows: pass 2 must count by true keys without a driver
    concat of the duplicate rows (verified by bounding what iter_batches
    delivers to the driver)."""
    import ray.data as rd

    n = 100_000
    # every key appears exactly twice → 50% duplicate rate, n/2 dup groups
    ka = np.repeat(np.arange(n // 2), 2)
    t = pa.table({"ka": ka, "kb": ka % 5})
    force_mode("shuffle")
    ds = rd.from_arrow(t).repartition(8)
    out = duplicate_keys(ds, ["ka", "kb"])
    assert out.num_rows == n // 2
    assert out["dup_count"].to_pylist() == [2] * (n // 2)


def test_shuffle_mode_driver_rows_bounded(ray_session, force_mode, monkeypatch):
    """In shuffle mode nothing O(rows) reaches the driver: meter every
    iter_batches row during duplicate_keys and assert the total is bounded by
    the (small) dup-group count, not the input size."""
    import ray.data as rd
    from ray.data import Dataset

    n = 50_000
    ka = [f"u{i}" for i in range(n)]
    ka[10] = ka[20] = ka[30]  # one triplicate key
    t = pa.table({"ka": ka, "kb": [1] * n})

    seen = {"rows": 0}
    orig = Dataset.iter_batches

    def metered(self, *a, **kw):
        for b in orig(self, *a, **kw):
            seen["rows"] += b.num_rows if hasattr(b, "num_rows") else len(b)
            yield b

    monkeypatch.setattr(Dataset, "iter_batches", metered)
    force_mode("shuffle")
    ds = rd.from_arrow(t).repartition(4)
    out = duplicate_keys(ds, ["ka", "kb"])
    assert out.num_rows == 1
    assert out["dup_count"].to_pylist() == [3]
    # candidates (1 hash) + pass-2 totals (1 group); allow generous slack for
    # per-batch partial rows but far below the 50k input
    assert seen["rows"] < 1000, seen["rows"]


def test_exact_dedup_shuffle_mode(ray_session, force_mode):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import exact_dedup

    force_mode("shuffle")
    t1 = pa.table({"doc_id": [1, 2, 7], "text": ["a", "b", "dup"]})
    t2 = pa.table({"doc_id": [7, 3, 4], "text": ["dup", None, None]})
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    out = exact_dedup(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 3, 7]


def test_minhash_shuffle_mode_matches_sieve(ray_session, force_mode):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import minhash_near_duplicates

    base = "the quick brown fox jumps over the lazy dog " * 5
    texts = [base, base + "extra tail", "completely different words here " * 6]
    t = pa.table({"doc_id": [0, 1, 2], "text": texts})
    outs = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        ds = rd.from_arrow(t)
        pairs = minhash_near_duplicates(ds, "text", "doc_id", threshold=0.5)
        df = pairs.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
        outs[mode] = df
    assert outs["sieve"].equals(outs["shuffle"])
    assert list(outs["sieve"][["id_a", "id_b"]].itertuples(index=False, name=None)) == [(0, 1)]


def test_key_enc_disambiguates_concat_collisions(ray_session, force_mode, tmp_path):
    """Distinct composite keys whose '|'-joined strings collide — ('a|b','c')
    vs ('a','b|c') — and null-vs-empty keys must be separate groups in the
    global uniqueness phase (both sieve strategies)."""
    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.rules import Rule, Suite

    from fdpg_query_data_validation_ray.pipelines.validate import (
        _uniqueness_from_artifacts,
    )
    from fdpg_query_data_validation_ray.state.checkpoint import RunManifest

    t = pa.table(
        {
            "ka": ["a|b", "a", "x", "x", None, ""],
            "kb": ["c", "b|c", "y", "y", "z", "z"],
            "v": [1, 2, 3, 4, 5, 6],
        }
    )
    f = str(tmp_path / "in.parquet")
    pq.write_table(t, f)
    suite = Suite("s", [Rule("not_null", "v")], key_columns=("ka", "kb"))
    out = str(tmp_path / "out")
    plan = ValidationPlan(suite=suite, unique_keys=["ka", "kb"])
    run_validation([f], out, plan, num_partitions=1)

    manifest = RunManifest(out)
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        viols = _uniqueness_from_artifacts(manifest, ["ka", "kb"])
        # only ('x','y') ×2 is a true duplicate; the CONCAT_WS collisions
        # ('a|b','c') vs ('a','b|c') and (None,'z') vs ('','z') must NOT merge
        assert [(v["row_key"], v["actual"]) for v in viols] == [("x|y", "2")], (
            mode,
            viols,
        )


def test_fk_anti_join_sieve_and_shuffle_identical(ray_session, force_mode, monkeypatch):
    """dangling_keys_hash: the no-shuffle dim-sieve path, the forced shuffle
    path, and the overflow bail-out (tiny budget → fallback) must all agree."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.fk import dangling_keys_hash

    fact = pa.table({"k": [1, 2, 2, 3, 9, 9, 9, None], "v": list(range(8))})
    dim = pa.table({"k": [1, 2, 3, 4]})
    results = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        out = dangling_keys_hash(
            rd.from_arrow(fact).repartition(3), ["k"], rd.from_arrow(dim)
        ).to_pandas().sort_values("fk_key").reset_index(drop=True)
        results[mode] = out
    assert results["sieve"].equals(results["shuffle"])
    assert list(results["sieve"]["fk_key"]) == ["9"]
    assert list(results["sieve"]["n_rows"]) == [3]

    # overflow bail-out: dim bigger than the (patched) budget → shuffle plan
    monkeypatch.delenv("QDV_SIEVE_MODE", raising=False)
    monkeypatch.setattr(
        "fdpg_query_data_validation_ray.stages.unique.SIEVE_MAX_DRIVER_ROWS", 2
    )
    out = dangling_keys_hash(
        rd.from_arrow(fact).repartition(3), ["k"], rd.from_arrow(dim)
    ).to_pandas()
    assert list(out["fk_key"]) == ["9"] and list(out["n_rows"]) == [3]


def test_legacy_union_keyhash_artifacts_still_resume(ray_session, force_mode, tmp_path):
    """A round-1-style output dir (keyhash rows inside the tagged union, no
    key_enc column, no compact keyhash/ dir) must still produce uniqueness
    violations on resume — via raw row_key grouping — in both strategies."""
    import json
    import os as _os

    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.validate import (
        _uniqueness_from_artifacts,
    )
    from fdpg_query_data_validation_ray.state.checkpoint import RunManifest

    out = tmp_path / "legacy"
    pdir = out / "partitions" / "p00000"
    (pdir / "combined").mkdir(parents=True)
    # hand-written legacy union shard: record_type + row_key + khash only
    legacy = pa.table(
        {
            "record_type": ["keyhash"] * 5 + ["violation"],
            "row_key": ["a|1", "a|1", "b|2", "b|2", "b|2", "x"],
            "khash": pa.array([11, 11, 22, 22, 22, 0], pa.int64()),
            "severity": [None] * 5 + ["error"],
        }
    )
    pq.write_table(legacy, str(pdir / "combined" / "part.parquet"))
    with open(pdir / "verdict.json", "w") as f:
        json.dump({"complete": True, "rows_checked": 5, "passed": True,
                   "violation_count": 0, "warning_count": 0,
                   "lineage": {}, "metrics": {}}, f)

    m = RunManifest(str(out))
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        v = _uniqueness_from_artifacts(m, ["k", "n"])
        got = sorted((x["row_key"], x["actual"]) for x in v)
        assert got == [("a|1", "2"), ("b|2", "3")], (mode, got)


def test_minhash_and_cosine_pairs_mode_parity(ray_session, force_mode):
    """The compact-explode + _attach_payload rework must yield an identical
    pair set whether the survivor payload is broadcast (sieve) or re-joined
    with the native hash join (shuffle)."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import minhash_near_duplicates
    from fdpg_query_data_validation_ray.stages.similarity import (
        cosine_near_duplicates,
    )

    rng = np.random.default_rng(23)
    words = [f"w{i}" for i in range(400)]
    texts, ids = [], []
    nid = 0
    for j in range(30):
        base = rng.choice(words, 40, replace=True).tolist()
        copies = 4 if j % 3 == 0 else 1
        for c in range(copies):
            t = list(base)
            if c:
                t[c] = "mut%d" % c  # near (not exact) duplicates
            texts.append(" ".join(t))
            ids.append(nid)
            nid += 1
    docs = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})

    base_vecs = rng.standard_normal((20, 16)).astype(np.float32)
    vecs, vids = [], []
    nid = 0
    for j in range(20):
        copies = 3 if j % 2 == 0 else 1
        for c in range(copies):
            v = base_vecs[j] + (0.01 * c) * rng.standard_normal(16).astype(np.float32)
            vecs.append(v.tolist())
            vids.append(nid)
            nid += 1
    emb = pa.table({"vec_id": pa.array(vids, pa.int64()), "embedding": vecs})

    got = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        mh = minhash_near_duplicates(
            rd.from_arrow(docs), "text", "doc_id", threshold=0.6
        ).to_pandas()
        cs = cosine_near_duplicates(
            rd.from_arrow(emb), threshold=0.95, dim=16
        ).to_pandas()
        got[mode] = (
            sorted(map(tuple, mh[["id_a", "id_b"]].to_numpy())),
            sorted(map(tuple, cs[["id_a", "id_b"]].to_numpy())),
        )
    assert got["sieve"][0] == got["shuffle"][0]
    assert got["sieve"][1] == got["shuffle"][1]
    assert len(got["sieve"][0]) >= 10  # the cliques actually collided
    assert len(got["sieve"][1]) >= 10


def test_fk_partitioned_shuffle_composite_string_keys(ray_session, force_mode):
    """The partitioned shuffle plan routes by hash64(fk_key) over COARSE
    partitions; composite (string-joined) keys must land identically to the
    sieve plan — same dangling keys, same per-key row counts."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.fk import dangling_keys_hash

    rng = np.random.default_rng(5)
    n = 20_000
    a = rng.integers(0, 400, n)
    b = rng.integers(0, 50, n)
    fact = pa.table(
        {
            "ka": pa.array([f"r{v}" for v in a]),
            "kb": pa.array([f"p{v}" for v in b]),
        }
    )
    # dim covers only ka < 380 → every composite with ka >= 380 dangles
    da, db = np.meshgrid(np.arange(380), np.arange(50))
    dim = pa.table(
        {
            "ka": pa.array([f"r{v}" for v in da.ravel()]),
            "kb": pa.array([f"p{v}" for v in db.ravel()]),
        }
    )
    got = {}
    for mode in ("sieve", "shuffle"):
        force_mode(mode)
        out = dangling_keys_hash(
            rd.from_arrow(fact).repartition(8),
            ["ka", "kb"],
            rd.from_arrow(dim).repartition(4),
        ).to_pandas().sort_values("fk_key").reset_index(drop=True)
        got[mode] = out
    assert got["sieve"].equals(got["shuffle"])
    assert (got["sieve"]["n_rows"] >= 1).all()
    expect = {(f"r{x}", f"p{y}") for x, y in zip(a, b) if x >= 380}
    assert len(got["sieve"]) == len(expect)


def test_tree_sieve_units():
    """Binary-counter tree merge helpers: exact cross-partition candidates."""
    from fdpg_query_data_validation_ray.pipelines.validate import (
        _khash_tree_leaf,
        _khash_tree_merge,
        _khash_tree_root,
    )

    def leaf(vals):
        return _khash_tree_leaf((np.asarray(sorted(vals), np.int64), None))

    a = leaf([1, 2, 3])
    b = leaf([3, 4, 5])
    c = leaf([5, 6, 1])
    ab = _khash_tree_merge(a, b)
    assert ab[0].tolist() == [1, 2, 3, 4, 5] and ab[1].tolist() == [3]
    assert _khash_tree_root(ab, c).tolist() == [1, 3, 5]
    # empty leaves and empty candidates
    assert _khash_tree_root(leaf([]), leaf([])).tolist() == []
    # poisoned leaf → None all the way to the root
    assert _khash_tree_merge(a, _khash_tree_leaf(None)) is None
    assert _khash_tree_root(ab, None) is None


def test_tree_sieve_end_to_end_matches_pairwise(ray_session, tmp_path, monkeypatch):
    """Forcing the tree path (pairwise cap 1) must give a byte-identical
    report to the pairwise path on a corpus with within-partition AND
    cross-partition duplicates."""
    import json

    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.rules import Rule, Suite

    files = []
    for p in range(5):
        ks = (
            [f"cross{i}" for i in range(p * 3, p * 3 + 6)]  # overlaps p+1
            + [f"win{p}"] * 3                                # within-partition
            + [f"uniq{p}_{i}" for i in range(30)]
        )
        t = pa.table({"k": ks, "v": list(range(len(ks)))})
        f = str(tmp_path / f"in{p}.parquet")
        pq.write_table(t, f)
        files.append(f)
    suite = Suite("s", [Rule("not_null", "v")], key_columns=("k",))

    reports = {}
    for label, cap in (("pairwise", "40"), ("tree", "1")):
        monkeypatch.setenv("QDV_PAIRWISE_MAX_PARTS", cap)
        out = str(tmp_path / label)
        plan = ValidationPlan(suite=suite, unique_keys=["k"])
        reports[label] = run_validation(files, out, plan, num_partitions=5)
    monkeypatch.delenv("QDV_PAIRWISE_MAX_PARTS", raising=False)

    assert json.dumps(reports["pairwise"], sort_keys=True) == json.dumps(
        reports["tree"], sort_keys=True
    )
    uv = [g for g in reports["tree"]["validation"] if g["rule_id"].startswith("unique")]
    # 5 win keys (3 copies each) + cross keys shared between adjacent
    # partitions (p*3..p*3+6 overlaps the next partition's start by 3)
    assert uv and uv[0]["count"] == 5 + 4 * 3


def test_tree_sieve_resume_after_kill_byte_identical(
    ray_session, tmp_path, monkeypatch
):
    """Interrupted run resumed in TREE mode (cap forced below the partition
    count): pre-committed partitions feed the merge tree up front, new ones
    as they commit — the merged report must be byte-identical to an
    uninterrupted tree run and to the pairwise run."""
    import json

    import pyarrow.parquet as pq

    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.rules import Rule, Suite
    from fdpg_query_data_validation_ray.state import checkpoint as cp

    files = []
    for p in range(6):
        ks = [f"cross{(p * 2 + i) % 9}" for i in range(4)] + [
            f"u{p}_{i}" for i in range(40)
        ]
        f = str(tmp_path / f"in{p}.parquet")
        pq.write_table(pa.table({"k": ks, "v": list(range(len(ks)))}), f)
        files.append(f)
    suite = Suite("s", [Rule("not_null", "v")], key_columns=("k",))

    def run(out, cap):
        monkeypatch.setenv("QDV_PAIRWISE_MAX_PARTS", cap)
        plan = ValidationPlan(suite=suite, unique_keys=["k"])
        return run_validation(files, str(tmp_path / out), plan, num_partitions=6)

    ref_pair = run("pairwise", "40")
    ref_tree = run("tree_full", "1")
    assert json.dumps(ref_pair, sort_keys=True) == json.dumps(ref_tree, sort_keys=True)

    # interrupted run (threads dispatch so the monkeypatched commit is seen),
    # then a TREE-mode resume under task dispatch
    monkeypatch.setenv("QDV_PARTITION_DISPATCH", "threads")
    orig = cp.RunManifest.commit_partition
    calls = {"n": 0}

    def dying(self, pid, verdict, tmp_dir):
        if calls["n"] >= 3:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return orig(self, pid, verdict, tmp_dir)

    monkeypatch.setattr(cp.RunManifest, "commit_partition", dying)
    with pytest.raises(RuntimeError):
        run("resumed", "1")
    monkeypatch.setattr(cp.RunManifest, "commit_partition", orig)
    monkeypatch.delenv("QDV_PARTITION_DISPATCH", raising=False)
    m = cp.RunManifest(str(tmp_path / "resumed"))
    assert len(m.completed_partitions()) == 3  # partial progress persisted

    resumed = run("resumed", "1")
    monkeypatch.delenv("QDV_PAIRWISE_MAX_PARTS", raising=False)
    assert json.dumps(resumed, sort_keys=True) == json.dumps(ref_tree, sort_keys=True)
