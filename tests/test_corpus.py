"""Synthetic corpus generator tests: determinism + defect injection."""

from __future__ import annotations

import pyarrow.compute as pc

from fdpg_query_data_validation_ray.sources.corpus import (
    DefectSpec,
    corpus_from_documents,
    generate_corpus,
    repo_dim,
)


def test_generator_deterministic():
    a = generate_corpus(500, seed=42)
    b = generate_corpus(500, seed=42)
    assert a.equals(b)
    c = generate_corpus(500, seed=43)
    assert not a.equals(c)


def test_schema_and_shapes():
    t = generate_corpus(200, seed=1)
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    assert t.num_rows == 200
    assert str(t.schema.field("content").type) == "large_string"
    # commits are 40-hex
    assert pc.all(pc.match_substring_regex(t["commit"], "^[0-9a-f]{40}$")).as_py()


def test_defect_injection_counts():
    d = DefectSpec(
        null_content=10, null_commit=2, bad_commit=8, bad_lang=15,
        dup_groups=(2, 3, 50), dangling_repo=7, dangling_commit=5,
        missing_suite_lang=4,
    )
    t = generate_corpus(1000, seed=42, defects=d)
    assert t.num_rows == 1000
    assert t["content"].null_count == 10
    assert t["commit"].null_count == 2
    bad_commit = pc.sum(
        pc.invert(
            pc.fill_null(pc.match_substring_regex(t["commit"], "^[0-9a-f]{40}$"), True)
        )
    ).as_py()
    # 8 bad-format + 5 dangling 'f'*40 are still hex → only 8 + the 3 dup-group
    # commits "c"*39+digit are hex too → exactly 8 fail the regex
    assert bad_commit == 8
    langs = set(pc.unique(t["lang"]).to_pylist())
    assert {"klingon", "cobol77", "fortran"} <= langs
    # duplicate groups on (repo,path,commit)
    import duckdb

    dup = duckdb.sql(
        "SELECT COUNT(*) n FROM t GROUP BY repo, path, \"commit\" HAVING n > 1 ORDER BY n"
    ).fetchall()
    assert [r[0] for r in dup] == [2, 3, 50]
    dim = repo_dim(t)
    assert "ghost/never-registered" not in dim["repo"].to_pylist()


def test_corpus_from_documents():
    t = corpus_from_documents("/root/testdata/sf0.001")
    assert t.num_rows == 500
    assert t.column_names == ["repo", "path", "commit", "lang", "content"]
    assert t["repo"].to_pylist()[0].startswith("corpus/src")
    assert t["path"].to_pylist()[0].startswith("docs/")
    # deterministic
    assert t.equals(corpus_from_documents("/root/testdata/sf0.001"))
