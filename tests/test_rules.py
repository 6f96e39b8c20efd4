"""Rule DSL + row-level check engine unit tests (no Ray needed — pure Arrow).

Mirrors the reference's targeted-defect test style: each fixture injects one
defect class and asserts the exact issue (severity + location), per
/root/reference/extraction/test/test_profiles.py:7-215.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.rules import (
    Rule,
    Suite,
    SuiteRegistry,
    in_set,
    length_range,
    not_null,
    regex,
    value_range,
)
from fdpg_query_data_validation_ray.stages.row_checks import (
    MISSING_SUITE_RULE_ID,
    RowChecker,
    add_sha256,
    check_batch,
)


def mk_table(**cols):
    return pa.table(cols)


KEY = ["repo", "path"]


def base_table():
    return mk_table(
        repo=pa.array(["a/r", "a/r", "b/r", "b/r"]),
        path=pa.array(["f1", "f2", "f3", "f4"]),
        commit=pa.array(["0" * 40, "deadbeef", None, "1" * 40]),
        lang=pa.array(["python", "klingon", "go", "python"]),
        content=pa.array(["x = 1", None, "fn main", "ok"], pa.large_string()),
    )


def test_not_null_violations():
    suite = Suite("s", [not_null("content"), not_null("commit")], KEY)
    v = check_batch(base_table(), suite)
    rows = sorted(zip(v["rule_id"].to_pylist(), v["row_key"].to_pylist()))
    assert rows == [("not_null(commit)", "b/r|f3"), ("not_null(content)", "a/r|f2")]
    assert set(v["severity"].to_pylist()) == {"error"}
    assert set(v["diagnostics"].to_pylist()) == {"minimum required = 1, but only found 0"}


def test_regex_commit_40hex():
    suite = Suite("s", [regex("commit", "[0-9a-f]{40}")], KEY)
    v = check_batch(base_table(), suite)
    # null commit is NOT a regex violation (null handled by not_null only)
    assert v["row_key"].to_pylist() == ["a/r|f2"]
    assert v["actual"].to_pylist() == ["deadbeef"]
    assert v["location"].to_pylist() == ["commit"]


def test_in_set_lang():
    suite = Suite("s", [in_set("lang", ["python", "go"])], KEY)
    v = check_batch(base_table(), suite)
    assert v["row_key"].to_pylist() == ["a/r|f2"]
    assert v["actual"].to_pylist() == ["klingon"]


def test_length_and_value_range():
    t = mk_table(
        repo=pa.array(["r"] * 4),
        path=pa.array(["p1", "p2", "p3", "p4"]),
        content=pa.array(["ab", "abcdef", "a", None]),
        n=pa.array([1, 5, 99, None]),
    )
    suite = Suite(
        "s", [length_range("content", 2, 5), value_range("n", 0, 10)], KEY
    )
    v = check_batch(t, suite)
    got = sorted(zip(v["rule_id"].to_pylist(), v["row_key"].to_pylist()))
    assert got == [("length_range(content)", "r|p2"), ("length_range(content)", "r|p3"),
                   ("range(n)", "r|p3")]


def test_clean_pass_no_violations():
    # sentinel path: zero violations → empty table with the right schema
    # (reference: "No issues detected during validation", extraction/main.py:154)
    suite = Suite("s", [not_null("repo"), in_set("lang", ["python", "go", "klingon"])], KEY)
    v = check_batch(base_table(), suite)
    assert v.num_rows == 0
    assert v.schema.names == ["rule_id", "severity", "location", "diagnostics", "row_key", "actual"]


def test_error_channel_on_missing_column():
    suite = Suite("s", [not_null("no_such_col")], KEY)
    v = check_batch(base_table(), suite)
    assert v.num_rows == 4
    assert set(v["rule_id"].to_pylist()) == {"error:not_null(no_such_col)"}
    assert set(v["severity"].to_pylist()) == {"error"}


def test_registry_routing_and_missing_suite_warning():
    py = Suite("py", [regex("commit", "[0-9a-f]{40}")], KEY)
    reg = SuiteRegistry(routing_column="lang", routes={"python": py, "go": py})
    checker = RowChecker(registry=reg)
    v = checker(base_table())
    by_rule = sorted(zip(v["rule_id"].to_pylist(), v["row_key"].to_pylist(), v["severity"].to_pylist()))
    # klingon row → missing_suite warning; python row with bad commit would be
    # f2 but f2 is klingon → routed python rows are f1,f4 (clean commits)
    assert by_rule == [(MISSING_SUITE_RULE_ID, "a/r|f2", "warning")]


def test_registry_json_roundtrip():
    py = Suite("py", [not_null("content"), in_set("lang", ["python"])], KEY)
    reg = SuiteRegistry(routing_column="lang", routes={"python": py}, default=None)
    reg2 = SuiteRegistry.from_json(reg.to_json())
    assert reg2.routing_column == "lang"
    assert reg2.routes["python"].rules == py.rules
    assert reg2.routes["python"].key_columns == tuple(KEY)


def test_sha256_invariant():
    import hashlib

    t = base_table()
    out = add_sha256(t)
    expect = [
        None if c is None else hashlib.sha256(c.encode()).hexdigest()
        for c in t["content"].to_pylist()
    ]
    assert out["content_sha256"].to_pylist() == expect


def test_rule_validation_errors():
    with pytest.raises(ValueError):
        Rule("nope", "c")
    with pytest.raises(ValueError):
        Rule("not_null", "c", severity="mild")


def test_dtype_rule_enforced_per_schema():
    import pyarrow as pa

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.stages.row_checks import schema_violations

    suite = qdv.Suite(
        "s",
        [qdv.dtype("content", "large_string"), qdv.dtype("repo", "string")],
        key_columns=["repo"],
    )
    ok = pa.schema([("repo", pa.string()), ("content", pa.large_string())])
    assert schema_violations(ok, suite, "f.parquet").num_rows == 0
    bad = pa.schema([("repo", pa.string()), ("content", pa.string())])
    v = schema_violations(bad, suite, "f.parquet").to_pandas()
    assert list(v["rule_id"]) == ["dtype(content)"]
    assert v.iloc[0]["actual"] == "string"
    assert v.iloc[0]["row_key"] == "f.parquet"

    missing = pa.schema([("repo", pa.string())])
    v2 = schema_violations(missing, suite, "g.parquet").to_pandas()
    assert v2.iloc[0]["actual"] == "<missing>"


def test_dtype_violations_deterministic_in_pipeline(ray_session, tmp_path):
    """dtype issue counts depend only on the input FILES, not batch size."""
    import pyarrow as pa

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.pipelines.validate import (
        ValidationPlan,
        run_validation,
    )
    from fdpg_query_data_validation_ray.sources.corpus import (
        generate_corpus,
        write_corpus_partitioned,
    )

    t = generate_corpus(1200, seed=2)
    # content is large_string; declare it as string so every file violates
    files = write_corpus_partitioned(t, str(tmp_path / "in"), 3)
    suite = qdv.Suite(
        "s",
        [qdv.not_null("content"), qdv.dtype("content", "string")],
        key_columns=["repo", "path", "commit"],
    )
    counts = []
    for i, bs in enumerate((128, 999)):
        plan = ValidationPlan(suite=suite, stats_columns=["lang"])
        rep = run_validation(
            files, str(tmp_path / f"out{i}"), plan, num_partitions=3, batch_size=bs
        )
        g = [x for x in rep["validation"] if x["rule_id"] == "dtype(content)"]
        counts.append(g[0]["count"] if g else 0)
    assert counts[0] == counts[1] == 3  # one per input file, any batch size


def test_json_extract_int_field_with_fallback():
    import pyarrow as pa

    from fdpg_query_data_validation_ray.functions.jsonfield import extract_int_field

    col = pa.array(
        ['{"k": 42}', '{"k":-7}', None, '{"other": 1}',
         '{ "k" : 5 , "x": 2}', '{"nested": {"k": 9}, "k": 3}', "not json"]
    )
    out = extract_int_field(col, "k").to_pylist()
    assert out == [42, -7, None, None, 5, 3, None]
