"""Sequence packing (stages/pack.py): distributed prefix sum + chunking."""

from __future__ import annotations

import pyarrow as pa

from fdpg_query_data_validation_ray.stages.pack import pack_sequences


def _run(t, budget, n_ranges=4):
    import ray.data as rd

    out = pack_sequences(rd.from_arrow(t).repartition(3), "id", "tok", budget, n_ranges)
    df = out.to_pandas().sort_values(["id", "seq_id"]).reset_index(drop=True)
    return list(map(tuple, df.itertuples(index=False)))


def test_pack_sequences_hand_case(ray_session):
    # ids 1..5, tokens 3,4,2,5,1; budget 4:
    # offsets: 0,3,7,9,14 → spans [0,3) [3,7) [7,9) [9,14) [14,15)
    # windows: doc1→seq0; doc2→seq0,1; doc3→seq1,2; doc4→seq2,3; doc5→seq3
    t = pa.table({"id": [1, 2, 3, 4, 5], "tok": [3, 4, 2, 5, 1]})
    assert _run(t, 4) == [
        (1, 0), (2, 0), (2, 1), (3, 1), (3, 2), (4, 2), (4, 3), (5, 3),
    ]


def test_pack_sequences_null_zero_and_wide_spans(ray_session):
    # null id / null tokens / zero tokens excluded; a doc spanning many
    # windows emits one row per window
    t = pa.table(
        {
            "id": pa.array([1, None, 3, 4], pa.int64()),
            "tok": pa.array([10, 5, None, 0], pa.int64()),
        }
    )
    assert _run(t, 3) == [(1, 0), (1, 1), (1, 2), (1, 3)]


def test_pack_sequences_single_range_and_unsorted_input(ray_session):
    # n_ranges=1 (everything in one group) and shuffled input order must
    # give the same doc_id-ordered packing
    t = pa.table({"id": [5, 1, 3, 2, 4], "tok": [1, 3, 2, 4, 5]})
    assert _run(t, 4, n_ranges=1) == _run(t, 4, n_ranges=4) == [
        (1, 0), (2, 0), (2, 1), (3, 1), (3, 2), (4, 2), (4, 3), (5, 3),
    ]


def test_pack_sequences_matches_sql_oracle(ray_session):
    import duckdb

    import __ray_entry__ as E

    d = "/root/testdata/sf0.001"
    r = E.queries()["pack_sequences"](d)
    ray_df = r.to_pandas().sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = (
        con.execute(E.oracle_sql()["pack_sequences"]).df()
        .sort_values(["doc_id", "seq_id"]).reset_index(drop=True)
    )
    assert ray_df.equals(ora)
