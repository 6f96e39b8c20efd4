"""Uniqueness / FK anti-join / drift tests (Ray Data end-to-end on small data)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from fdpg_query_data_validation_ray.functions.sketches import KLL
from fdpg_query_data_validation_ray.rules import drift as drift_rule
from fdpg_query_data_validation_ray.sources.corpus import DefectSpec, generate_corpus, repo_dim
from fdpg_query_data_validation_ray.stages.drift import (
    Snapshot,
    drift_violations,
    ks_from_kll,
    psi,
)
from fdpg_query_data_validation_ray.stages.fk import (
    dangling_keys_hash,
    fk_violations_broadcast,
)
from fdpg_query_data_validation_ray.stages.stats import PartialStats, _partials_from_table
from fdpg_query_data_validation_ray.stages.unique import (
    duplicate_keys,
    uniqueness_violations,
)

KEYS = ["repo", "path", "commit"]


def corpus_ds(defects, n=1000, parts=5):
    import ray.data as rd

    t = generate_corpus(n, seed=42, defects=defects)
    return rd.from_arrow(t).repartition(parts), t


def test_uniqueness_finds_dup_groups(ray_session):
    ds, _ = corpus_ds(DefectSpec(dup_groups=(2, 3, 50)))
    dups = duplicate_keys(ds, KEYS).to_pandas()
    assert sorted(dups["dup_count"]) == [2, 3, 50]
    v = uniqueness_violations(ds, KEYS).to_pandas()
    assert len(v) == 3
    assert sorted(v["actual"].astype(int)) == [2, 3, 50]
    assert set(v["rule_id"]) == {"unique(repo,path,commit)"}
    assert all("|" in k for k in v["row_key"])


def test_uniqueness_clean_corpus_empty(ray_session):
    ds, _ = corpus_ds(DefectSpec())
    assert duplicate_keys(ds, KEYS).num_rows == 0


def test_fk_broadcast(ray_session):
    ds, t = corpus_ds(DefectSpec(dangling_repo=7))
    dim = repo_dim(t)
    ref = ray.put(dim["repo"].to_pylist())
    v = fk_violations_broadcast(
        ds, ["repo"], ref, key_columns=KEYS, dim_name="repos"
    ).to_pandas()
    assert len(v) == 7
    assert set(v["actual"]) == {"ghost/never-registered"}
    assert set(v["rule_id"]) == {"foreign_key(repo->repos)"}


def test_fk_broadcast_null_keys_not_dangling(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "repo": pa.array(["a", None, "zz"]),
            "path": pa.array(["p1", "p2", "p3"]),
        }
    )
    v = fk_violations_broadcast(
        rd.from_arrow(t), ["repo"], ["a", "b"], key_columns=["path"]
    ).to_pandas()
    # null FK is a not_null concern, not a dangling reference
    assert list(v["actual"]) == ["zz"]


def test_fk_hash_antijoin_matches_broadcast(ray_session):
    import ray.data as rd

    ds, t = corpus_ds(DefectSpec(dangling_repo=7), n=2000, parts=7)
    dim = repo_dim(t)
    out = dangling_keys_hash(
        ds, ["repo"], rd.from_arrow(dim), ["repo"], num_buckets=8
    ).to_pandas()
    assert list(out["fk_key"]) == ["ghost/never-registered"]
    assert list(out["n_rows"]) == [7]


def test_psi_and_ks():
    same = {"en": 500, "de": 300, "fr": 200}
    assert psi(same, same) < 1e-9
    shifted = {"en": 100, "de": 300, "fr": 600}
    assert psi(same, shifted) > 0.2
    rng = np.random.default_rng(0)
    a = KLL().add_values(rng.normal(0, 1, 50_000))
    b = KLL().add_values(rng.normal(0, 1, 50_000))
    c = KLL().add_values(rng.normal(2, 1, 50_000))
    assert ks_from_kll(a, b) < 0.05
    assert ks_from_kll(a, c) > 0.5


def test_drift_violations_end_to_end():
    ref_t = pa.table(
        {"lang": ["python"] * 500 + ["go"] * 500, "n": list(range(1000))}
    )
    cur_t = pa.table(
        {"lang": ["python"] * 100 + ["go"] * 900, "n": [x * 4 for x in range(1000)]}
    )
    ps = PartialStats(categorical=["lang"])
    ref = Snapshot.from_partials(_partials_from_table(ps(ref_t)))
    cur = Snapshot.from_partials(_partials_from_table(ps(cur_t)))
    rules = [drift_rule("lang", "categorical"), drift_rule("n", "numeric")]
    v = drift_violations(cur, ref, rules)
    assert {d["location"] for d in v} == {"lang", "n"}
    assert all(d["severity"] == "warning" for d in v)
    # no drift against itself
    assert drift_violations(ref, ref, rules) == []
    # snapshot JSON round-trip preserves the verdicts
    ref2 = Snapshot.from_json(ref.to_json())
    assert {d["location"] for d in drift_violations(cur, ref2, rules)} == {"lang", "n"}


def test_drift_missing_column_error_channel():
    ref = Snapshot({"lang": {"kind": "categorical", "counts": {"a": 1}}})
    for cur, reference in ((ref, Snapshot({})), (Snapshot({}), ref)):
        v = drift_violations(cur, reference, [drift_rule("lang")])
        assert v[0]["rule_id"] == "error:drift(lang)"
        assert v[0]["severity"] == "error"


def test_psi_terms_lang_matches_sql_replay(ray_session):
    """The drift-PSI formula is oracle-checkable per category: exact counts
    plus one fixed-order float term each, replayed verbatim in DuckDB."""
    import duckdb

    import __ray_entry__ as E

    d = "/root/testdata/sf0.001"
    ray_df = E.queries()["psi_terms_lang"](d).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = con.execute(E.oracle_sql()["psi_terms_lang"]).df().reset_index(drop=True)
    assert ray_df.equals(ora)
    # the summed terms reproduce the engine's psi() (same clamps)
    from fdpg_query_data_validation_ray.stages.drift import psi

    e = dict(zip(ray_df["lang"], ray_df["e_count"]))
    a = dict(zip(ray_df["lang"], ray_df["a_count"]))
    assert abs(sum(ray_df["psi_term_micro"]) / 1e6 - psi(e, a)) < 5e-6
