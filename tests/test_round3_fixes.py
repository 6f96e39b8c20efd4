"""Round-3 ADVICE fixes: decode provenance, cat-count overflow flag,
bounded dangling-key driver merge, schema-bearing all-empty recovery, and
the input-stamp guard for the concurrent keyhash re-read."""

import numpy as np
import pyarrow as pa
import pytest


def test_decode_provenance_legacy_raw_key_not_rewritten():
    """A legacy raw row_key that coincidentally parses as a length-prefixed
    encoding ('3:abc') must pass through verbatim (genc=0); only true
    key_enc values (genc=1) are decoded for display."""
    from fdpg_query_data_validation_ray.pipelines.validate import (
        _uniqueness_violation_rows,
    )

    g = pa.table(
        {
            "gkey": ["3:abc", "3:abc;2:xy"],
            "count_all": pa.array([2, 3], pa.int64()),
            "genc": pa.array([0, 1], pa.int8()),
        }
    )
    rows = _uniqueness_violation_rows(g, ["k"])
    by_count = {r["actual"]: r["row_key"] for r in rows}
    assert by_count["2"] == "3:abc"  # legacy: verbatim
    assert by_count["3"] == "abc|xy"  # key_enc: decoded


def test_grouping_key_provenance_column():
    from fdpg_query_data_validation_ray.pipelines.validate import _grouping_key

    t = pa.table(
        {
            "row_key": ["r1", "r2"],
            "key_enc": pa.array(["2:r1", None], pa.string()),
            "khash": pa.array([1, 2], pa.int64()),
        }
    )
    gk = _grouping_key(t)
    assert gk["gkey"].to_pylist() == ["2:r1", "r2"]
    assert gk["genc"].to_pylist() == [1, 0]
    # pre-computed provenance passes through untouched
    t2 = t.append_column("genc", pa.array([0, 0], pa.int8())).set_column(
        t.schema.get_field_index("key_enc"),
        "key_enc",
        pa.array(["x", "y"], pa.string()),
    )
    gk2 = _grouping_key(t2)
    assert gk2["genc"].to_pylist() == [0, 0]


def test_cat_overflow_flag_roundtrip_and_report():
    from fdpg_query_data_validation_ray.pipelines.report import (
        distribution_by_system,
    )
    from fdpg_query_data_validation_ray.stages.stats import (
        MAX_CATEGORICAL,
        ColumnPartial,
        _partial_from_array,
        _partials_from_table,
        _partials_to_table,
    )

    vals = pa.chunked_array(
        [pa.array([f"v{i:05d}" for i in range(MAX_CATEGORICAL + 10)])]
    )
    p = _partial_from_array("c", vals, categorical=True)
    assert p.cat_overflow is True
    assert len(p.cat_counts) == MAX_CATEGORICAL
    # merge propagates the flag into a clean partial
    clean = _partial_from_array(
        "c", pa.chunked_array([pa.array(["a", "b"])]), categorical=True
    )
    assert clean.cat_overflow is False
    clean.merge(p)
    assert clean.cat_overflow is True
    # artifact round-trip keeps the flag (tuple payload) and legacy bare-dict
    # payloads still load
    rt = _partials_from_table(_partials_to_table([p]))[0]
    assert rt.cat_overflow is True and rt.cat_counts == p.cat_counts
    import pickle

    legacy = _partials_to_table([p])
    legacy = legacy.set_column(
        legacy.schema.get_field_index("cat_counts"),
        "cat_counts",
        pa.array([pickle.dumps({"a": 1})], pa.binary()),
    )
    lp = _partials_from_table(legacy)[0]
    assert lp.cat_overflow is False and lp.cat_counts == {"a": 1}

    # report marks the column approximate iff the cap was hit
    rep = distribution_by_system({"c": p}, {"c": {"sys": ["v00001"]}})
    assert rep["c"]["approximate"] is True
    rep2 = distribution_by_system({"c": clean2()}, {"c": {"sys": ["a"]}})
    assert "approximate" not in rep2["c"]


def clean2():
    from fdpg_query_data_validation_ray.stages.stats import _partial_from_array

    return _partial_from_array(
        "c", pa.chunked_array([pa.array(["a", "b"])]), categorical=True
    )


def test_merge_partials_driver_hard_limit(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.unique import (
        MERGE_OVERFLOW,
        _merge_partials_driver,
    )

    t = pa.table(
        {
            "fk_key": [f"k{i}" for i in range(100)],
            "count_all": pa.array([1] * 100, pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    assert (
        _merge_partials_driver(ds, ["fk_key"], cap=10, hard_limit=50)
        is MERGE_OVERFLOW
    )
    ok = _merge_partials_driver(ds, ["fk_key"], cap=10, hard_limit=1000)
    assert ok.num_rows == 100


def test_dangling_sieve_overflow_falls_back_to_shuffle(ray_session, monkeypatch):
    """When the sieve bails (None — e.g. dangling result over budget), the
    shuffle plan still produces the exact dangling set."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages import fk as fk_mod

    fact = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3, 3, 9], pa.int64())}))
    dim = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    monkeypatch.setattr(fk_mod, "_dangling_sieve", lambda *a, **kw: None)
    out = fk_mod.dangling_keys_hash(fact, ["k"], dim).to_pandas()
    out = out.sort_values("fk_key").reset_index(drop=True)
    assert out["fk_key"].tolist() == ["3", "9"]
    assert out["n_rows"].tolist() == [2, 1]


def test_drop_schemaless_all_empty_keeps_schema(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.dedup import (
        drop_schemaless_empty_blocks,
    )

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    ds = rd.from_arrow(schema.empty_table())
    out = drop_schemaless_empty_blocks(ds, empty_schema=schema)
    assert out.count() == 0
    assert out.schema().base_schema.equals(schema)


def test_file_stamps_detect_change(tmp_path):
    import os

    from fdpg_query_data_validation_ray.pipelines.validate import _file_stamps

    f = tmp_path / "x.parquet"
    f.write_bytes(b"abc")
    s1 = _file_stamps([str(f)])
    f.write_bytes(b"abcd")
    s2 = _file_stamps([str(f)])
    assert s1 != s2
    os.utime(f, ns=(1, 1))
    assert _file_stamps([str(f)]) != s2


def test_uniqueness_sidecar_within_and_cross_partition(ray_session, tmp_path, monkeypatch):
    """Within-partition dup groups resolve from commit-time sidecars; cross-
    partition candidates go through pass B's input re-read — and the merged
    report is byte-identical to the threads-dispatch (sort-merge) path."""
    import json

    import pyarrow.parquet as pq

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )

    def mk(rows):
        return pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array(["a" * 40] * len(rows)),
                "lang": pa.array(["python"] * len(rows)),
                "content": pa.array(["x = 1\n"] * len(rows)),
            }
        )

    filler = [(f"org/r{i}", f"src/f{i}.py") for i in range(6)]
    # file0: key X twice (within-partition dup); file1: key Y once;
    # file2: key Z three times (within); file3: key Y again (cross-partition)
    tables = [
        mk([("org/x", "dup.py"), ("org/x", "dup.py")] + filler[:2]),
        mk([("org/y", "cross.py")] + filler[2:4]),
        mk([("org/z", "tri.py")] * 3),
        mk([("org/y", "cross.py")] + filler[4:]),
    ]
    files = []
    for i, t in enumerate(tables):
        p = str(tmp_path / f"part-{i}.parquet")
        pq.write_table(t, p)
        files.append(p)

    suite = qdv.Suite(
        "code", [qdv.not_null("content")], key_columns=["repo", "path", "commit"]
    )
    plan = ValidationPlan(suite=suite, unique_keys=["repo", "path", "commit"])

    rep_tasks = run_validation(files, str(tmp_path / "t"), plan, num_partitions=4)
    monkeypatch.setenv("QDV_PARTITION_DISPATCH", "threads")
    rep_threads = run_validation(files, str(tmp_path / "th"), plan, num_partitions=4)
    monkeypatch.delenv("QDV_PARTITION_DISPATCH")

    uniq = [g for g in rep_tasks["validation"] if g["rule_id"].startswith("unique(")]
    assert len(uniq) == 1 and uniq[0]["count"] == 3  # X, Y, Z groups
    keys = " ".join(uniq[0]["sample_row_keys"])
    assert "org/x|dup.py" in keys and "org/y|cross.py" in keys and "org/z|tri.py" in keys
    assert json.dumps(rep_tasks, sort_keys=True) == json.dumps(
        rep_threads, sort_keys=True
    )


def test_append_mode_incremental_validation(ray_session, tmp_path):
    """--append: new files become new partitions; committed partitions are
    untouched; the global phase catches duplicates BETWEEN old and new data;
    removed files and changed configs are refused."""
    import json
    import os

    import pyarrow.parquet as pq
    import pytest

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )

    def mk(rows):
        return pa.table(
            {
                "repo": pa.array([r[0] for r in rows]),
                "path": pa.array([r[1] for r in rows]),
                "commit": pa.array(["b" * 40] * len(rows)),
                "lang": pa.array(["python"] * len(rows)),
                "content": pa.array(["y = 2\n"] * len(rows)),
            }
        )

    old_files = []
    for i, rows in enumerate(
        [[("org/a", "a.py"), ("org/b", "b.py")], [("org/c", "c.py"), ("org/d", "d.py")]]
    ):
        p = str(tmp_path / f"old-{i}.parquet")
        pq.write_table(mk(rows), p)
        old_files.append(p)

    suite = qdv.Suite(
        "code", [qdv.not_null("content")], key_columns=["repo", "path", "commit"]
    )
    plan = ValidationPlan(suite=suite, unique_keys=["repo", "path", "commit"])
    out = str(tmp_path / "run")
    rep1 = run_validation(old_files, out, plan, num_partitions=2)
    assert rep1["total_rows_checked"] == 4 and rep1["passed"]
    verdict_mtimes = {
        pid: os.path.getmtime(os.path.join(out, "partitions", pid, "verdict.json"))
        for pid in ("p00000", "p00001")
    }

    # append a file that duplicates org/c (cross old-new) and adds org/e
    new_file = str(tmp_path / "new-0.parquet")
    pq.write_table(mk([("org/c", "c.py"), ("org/e", "e.py")]), new_file)
    rep2 = run_validation(
        old_files + [new_file], out, plan, num_partitions=2, append=True
    )
    assert rep2["total_rows_checked"] == 6
    uniq = [g for g in rep2["validation"] if g["rule_id"].startswith("unique(")]
    assert len(uniq) == 1 and uniq[0]["count"] == 1
    assert "org/c|c.py" in uniq[0]["sample_row_keys"][0]
    assert not rep2["passed"]
    # old partitions untouched (no recompute, no re-commit)
    for pid, mt in verdict_mtimes.items():
        assert os.path.getmtime(os.path.join(out, "partitions", pid, "verdict.json")) == mt
    run_cfg = json.load(open(os.path.join(out, "run.json")))
    assert "p00002" in run_cfg["partitions"]
    assert run_cfg["partitions"]["p00002"] == [new_file]

    # removed input file → refused
    with pytest.raises(ValueError, match="removed"):
        run_validation([old_files[0], new_file], out, plan, num_partitions=2, append=True)
    # changed config → refused
    plan2 = ValidationPlan(
        suite=qdv.Suite("code", [qdv.not_null("commit")], key_columns=["repo", "path", "commit"]),
        unique_keys=["repo", "path", "commit"],
    )
    with pytest.raises(ValueError, match="different config"):
        run_validation(old_files + [new_file], out, plan2, num_partitions=2, append=True)
    # idempotent re-append (resume of appended run): byte-identical report
    rep3 = run_validation(
        old_files + [new_file], out, plan, num_partitions=2, append=True
    )
    assert json.dumps(rep3, sort_keys=True) == json.dumps(rep2, sort_keys=True)


def test_keyhash_mode_equivalence(ray_session, tmp_path, monkeypatch):
    """partial (default), artifact (per-row keyhash parquet), and
    artifact+shuffle (distributed verify over compact artifacts) must
    produce identical reports — artifact mode is the at-scale evidence path
    and must not rot while partial mode is the small-partition default."""
    import json
    import os

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.sources.corpus import (
        DefectSpec,
        generate_corpus,
        write_corpus_partitioned,
    )

    t = generate_corpus(3000, seed=11, defects=DefectSpec(dup_groups=(2, 3, 6)))
    files = write_corpus_partitioned(t, str(tmp_path / "corpus"), 8)
    suite = qdv.Suite(
        "code", [qdv.not_null("content")], key_columns=["repo", "path", "commit"]
    )
    plan = ValidationPlan(suite=suite, unique_keys=["repo", "path", "commit"])

    reports = {}
    for tag, env in (
        ("partial", {}),
        ("artifact", {"QDV_KEYHASH_MODE": "artifact"}),
        ("artifact_shuffle", {"QDV_KEYHASH_MODE": "artifact", "QDV_SIEVE_MODE": "shuffle"}),
    ):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        reports[tag] = json.dumps(
            run_validation(files, str(tmp_path / tag), plan, num_partitions=4),
            sort_keys=True,
        )
        for k in env:
            monkeypatch.delenv(k)
    # artifact mode must really have written per-row keyhash parquet
    assert os.path.isdir(tmp_path / "artifact" / "partitions" / "p00000" / "keyhash")
    assert not os.path.isdir(tmp_path / "partial" / "partitions" / "p00000" / "keyhash")
    assert reports["partial"] == reports["artifact"] == reports["artifact_shuffle"]


def test_decode_key_display_array_matches_scalar_fuzz():
    """The vectorized flat-buffer decoder must agree with the scalar parser
    byte-for-byte on valid encodings, garbage, and truncations (incl. on a
    sliced array, whose logical element 0 is not buffer offset 0)."""
    import random
    import string

    from fdpg_query_data_validation_ray.pipelines.validate import (
        decode_key_display,
        decode_key_display_array,
    )

    rng = random.Random(1234)
    # non-ASCII chars exercise the byte-vs-character length-prefix split
    # (char-counting prefixes over multi-byte UTF-8 route to the scalar
    # parser); huge digit runs exercise the int64 length-cap guard
    alphabet = string.printable[:70] + ";:|Né日ß€"
    cases = [
        "", "N", "N;", "3:abc", "3:abc;2:xy", "3:abc;N;2:xy", "1:N", "0:;0:",
        "5:a;b:c;1:d", "repo|path|commit", "3:ab", "3:abc;", "3:abc;;",
        "03:abc", "0:", "N;N", "NN", "N:x", "2:ab3:cd", "3:abc;2:xy;",
        "5:héllo", "4:éé;N", "1:é;1:y", "3:日本語", "9:日本語", "N;2:éz", "é",
        "9999999999999999999:ab", "99999999999999999999999999:x",
    ]
    for _ in range(1500):
        parts = []
        for _ in range(rng.randint(1, 4)):
            if rng.random() < 0.15:
                parts.append("N")
            else:
                data = "".join(rng.choices(alphabet, k=rng.randint(0, 12)))
                parts.append(f"{len(data)}:{data}")
        cases.append(";".join(parts))
    for _ in range(1500):
        cases.append("".join(rng.choices(alphabet + "0123456789", k=rng.randint(0, 15))))
    for c in cases[:100]:
        for i in range(len(c)):
            cases.append(c[:i])

    expected = [decode_key_display(c) for c in cases]
    got = decode_key_display_array(pa.array(cases, pa.string())).to_pylist()
    assert got == expected

    sl = pa.array(cases, pa.string()).slice(7, 900)
    assert decode_key_display_array(sl).to_pylist() == [
        decode_key_display(c) for c in sl.to_pylist()
    ]

    # null in, null out (input validity restored, not coerced to "")
    withnulls = pa.array(["4:abcd", None, "", None, "N;3:xyz"], pa.string())
    assert decode_key_display_array(withnulls).to_pylist() == [
        "abcd", None, "", None, "|xyz"
    ]
