"""Deterministic split/sample operator tests (stages/split.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.split import (
    _thresholds,
    assign_split,
    sample_fraction,
)


def _docs(n=5_000, seed=1):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(rng.permutation(n).astype(np.int64)),
            "lang": pa.array(rng.choice(["en", "de", "fr"], n)),
        }
    )


def test_split_deterministic_and_partition_invariant(ray_session):
    import ray.data as rd

    t = _docs()
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = (
        assign_split(rd.from_arrow(t).repartition(3), "doc_id", fr)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        assign_split(rd.from_arrow(t).repartition(17), "doc_id", fr)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a["split"].equals(b["split"])
    # proportions within sampling noise
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # stable under corpus growth: the first half's assignment is unchanged
    # when computed on the full corpus (pure function of the id)
    half = pa.table({"doc_id": t["doc_id"].slice(0, 2500), "lang": t["lang"].slice(0, 2500)})
    c = (
        assign_split(rd.from_arrow(half), "doc_id", fr)
        .to_pandas().set_index("doc_id")["split"]
    )
    full = a.set_index("doc_id")["split"]
    assert (full.loc[c.index] == c).all()


def test_split_salt_derives_independent_assignment(ray_session):
    import ray.data as rd

    t = _docs(2_000)
    fr = {"a": 0.5, "b": 0.5}
    s1 = assign_split(rd.from_arrow(t), "doc_id", fr, salt="s1").to_pandas()
    s2 = assign_split(rd.from_arrow(t), "doc_id", fr, salt="s2").to_pandas()
    m = s1.merge(s2, on="doc_id", suffixes=("_1", "_2"))
    agree = (m["split_1"] == m["split_2"]).mean()
    assert 0.4 < agree < 0.6  # independent hashes: ~50% agreement


def test_sample_fraction_subset_semantics(ray_session):
    import ray.data as rd

    t = _docs(4_000)
    s20 = set(
        sample_fraction(rd.from_arrow(t), "doc_id", 0.2).to_pandas()["doc_id"]
    )
    s10 = set(
        sample_fraction(rd.from_arrow(t), "doc_id", 0.1).to_pandas()["doc_id"]
    )
    # threshold sampling is NESTED: the 10% sample is a subset of the 20%
    assert s10 <= s20
    assert abs(len(s20) / 4_000 - 0.2) < 0.03
    assert sample_fraction(rd.from_arrow(t), "doc_id", 0.0).count() == 0
    assert sample_fraction(rd.from_arrow(t), "doc_id", 1.0).count() == 4_000


def test_split_validation_errors():
    with pytest.raises(ValueError, match="sum to 1"):
        _thresholds({"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="fraction"):
        import ray.data as rd  # noqa: F401

        sample_fraction(None, "id", 1.5)


def test_mixture_weighted_union(ray_session):
    """Mixture: rates honored deterministically, source tags correct, rate
    1.0 keeps everything, repeated runs identical."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.split import mixture

    a = rd.from_items([{"id": i, "src_val": "a"} for i in range(400)])
    b = rd.from_items([{"id": i, "src_val": "b"} for i in range(400)])

    def run():
        out = mixture([("a", a, 1.0), ("b", b, 0.3)], "id")
        return out.to_pandas().sort_values(["source", "id"]).reset_index(drop=True)

    r1, r2 = run(), run()
    assert r1.equals(r2)  # deterministic
    na = (r1["source"] == "a").sum()
    nb = (r1["source"] == "b").sum()
    assert na == 400  # rate 1.0 keeps all
    assert 60 <= nb <= 180  # Bernoulli(0.3) of 400, generous bounds
    # per-source salting: 'b' keeps a DIFFERENT subset than rate-matched 'a'
    out2 = mixture([("b", b, 0.3)], "id").to_pandas()
    assert set(out2["id"]) == set(r1[r1["source"] == "b"]["id"])


def test_mixture_docs_matches_sql_oracle(ray_session):
    import duckdb

    import __ray_entry__ as E

    d = "/root/testdata/sf0.001"
    r = E.queries()["mixture_docs"](d)
    ray_df = r.to_pandas().sort_values(["doc_id", "source"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = (
        con.execute(E.oracle_sql()["mixture_docs"]).df()
        .sort_values(["doc_id", "source"]).reset_index(drop=True)
    )
    assert ray_df.equals(ora)


def test_mixture_rules_single_pass_equals_mixture(ray_session):
    """mixture_rules (single-scan tag+threshold) returns exactly what
    mixture() over pre-split views returns when the predicates partition the
    input — and its executed plan reads the input ONCE (the old union of two
    filtered views scanned the shared read per source)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.split import mixture, mixture_rules

    rows = [{"id": i, "grp": "a" if i % 3 == 0 else "b"} for i in range(600)]
    ds = rd.from_items(rows)
    a = ds.map_batches(
        lambda t: t.filter(pc.equal(t["grp"], "a")), batch_format="pyarrow"
    )
    b = ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["grp"], "a")), batch_format="pyarrow"
    )
    ref = (
        mixture([("a", a, 1.0), ("b", b, 0.3)], "id")
        .to_pandas().sort_values(["source", "id"]).reset_index(drop=True)
    )
    got = (
        mixture_rules(
            ds, "id", [("a", lambda t: pc.equal(t["grp"], "a"), 1.0), ("b", None, 0.3)]
        )
        .to_pandas().sort_values(["source", "id"]).reset_index(drop=True)
    )
    assert ref.equals(got)


def test_mixture_docs_plan_scans_input_once(ray_session):
    """The shipped mixture_docs query reads the parquet input exactly once."""
    import __ray_entry__ as E

    out = E.queries()["mixture_docs"]("/root/testdata/sf0.001").materialize()
    stats = out.stats()
    assert stats.count("ReadParquet") == 1, stats


def test_subsample_balanced_properties(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.split import subsample_balanced

    # three groups: tiny (saturated), exactly strength^2 (boundary: the max
    # hash 2^60-1 times sqrt(256)=16 is still < 16*2^60, so all kept), large
    n_small, n_edge, n_big = 50, 256, 20_000
    ids = np.arange(n_small + n_edge + n_big, dtype=np.int64)
    langs = np.array(
        ["sm"] * n_small + ["ed"] * n_edge + ["bg"] * n_big, dtype=object
    )
    t = pa.table({"doc_id": pa.array(ids), "lang": pa.array(langs)})
    out_a = (
        subsample_balanced(rd.from_arrow(t).repartition(3), "doc_id", "lang")
        .to_pandas()
    )
    out_b = (
        subsample_balanced(rd.from_arrow(t).repartition(17), "doc_id", "lang")
        .to_pandas()
    )
    # deterministic and partition-invariant
    assert sorted(out_a["doc_id"]) == sorted(out_b["doc_id"])
    counts = out_a["lang"].value_counts()
    # groups with n <= strength^2 keep every row
    assert counts["sm"] == n_small
    assert counts["ed"] == n_edge
    # large group: keep-rate ≈ strength/sqrt(n) = 16/sqrt(20000) ≈ 0.113
    assert abs(counts["bg"] / n_big - 16.0 / np.sqrt(n_big)) < 0.02
    # pinned external counts: rows of groups absent from the manifest drop
    pinned = subsample_balanced(
        rd.from_arrow(t),
        "doc_id",
        "lang",
        group_counts={"sm": n_small, "ed": n_edge},
    ).to_pandas()
    assert set(pinned["lang"]) == {"sm", "ed"}
    assert len(pinned) == n_small + n_edge


def test_subsample_balanced_rejects_bad_strength():
    from fdpg_query_data_validation_ray.stages.split import subsample_balanced

    with pytest.raises(ValueError):
        subsample_balanced(None, "doc_id", "lang", strength=0.0)
