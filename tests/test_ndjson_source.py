"""NDJSON source: read → normalize → validate end-to-end parity with the
parquet path (the reference's native wire format is NDJSON)."""

from __future__ import annotations

import pyarrow as pa


def test_ndjson_roundtrip_and_validation_parity(ray_session, tmp_path):
    import ray.data as rd

    import fdpg_query_data_validation_ray as qdv
    from fdpg_query_data_validation_ray.sources.corpus import (
        DefectSpec,
        generate_corpus,
    )
    from fdpg_query_data_validation_ray.sources.ndjson import (
        ndjson_to_parquet,
        read_ndjson,
        write_ndjson,
    )
    from fdpg_query_data_validation_ray.stages.row_checks import RowChecker

    t = generate_corpus(500, seed=9, defects=DefectSpec(null_content=5, bad_commit=4))
    f1, f2 = str(tmp_path / "a.ndjson"), str(tmp_path / "b.ndjson")
    write_ndjson(t.slice(0, 250), f1)
    write_ndjson(t.slice(250), f2)

    schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]
    )
    suite = qdv.Suite(
        "code",
        [qdv.not_null("content"), qdv.regex("commit", "[0-9a-f]{40}")],
        key_columns=["repo", "path", "commit"],
    )

    def violations(ds):
        out = ds.map_batches(
            RowChecker(suite=suite), batch_format="pyarrow"
        ).to_pandas()
        return out.sort_values(["rule_id", "row_key"]).reset_index(drop=True)

    v_ndjson = violations(read_ndjson([f1, f2], schema=schema))
    assert (v_ndjson.groupby("rule_id").size().to_dict()
            == {"not_null(content)": 5, "regex(commit)": 4})

    # parity with the parquet path over the converted copy
    pq_dir = ndjson_to_parquet([f1, f2], str(tmp_path / "pq"), schema=schema)
    v_parquet = violations(rd.read_parquet(pq_dir))
    assert v_ndjson.equals(v_parquet)

    # missing columns normalize to typed nulls
    f3 = str(tmp_path / "ragged.ndjson")
    write_ndjson(pa.table({"repo": ["r1"], "path": ["p"]}), f3)
    ragged = read_ndjson([f3], schema=schema).to_pandas()
    assert list(ragged.columns) == [f.name for f in schema]
    assert ragged["content"].isna().all()
