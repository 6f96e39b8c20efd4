"""Column-stats pipeline tests (Ray Data end-to-end, small data)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.stats import (
    PartialStats,
    StatsMerger,
    _partials_from_table,
    column_stats,
    finalize,
)


def make_table(n=10_000, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.lognormal(3, 1, n)
    vals[:: n // 50] = np.nan  # ~50 nulls worth (NaN → null on Arrow conversion below)
    cat = rng.choice(["en", "de", "fr", "zh"], size=n, p=[0.5, 0.2, 0.2, 0.1])
    return pa.table(
        {
            "x": pa.array(vals, from_pandas=True),
            "lang": pa.array(cat),
            "uid": pa.array([f"u{i}" for i in range(n)]),
        }
    )


def test_partial_and_finalize_no_ray():
    t = make_table()
    partial = PartialStats(categorical=["lang"])(t)
    stats = finalize(_partials_from_table(partial))
    assert stats["x"]["count"] == 10_000
    assert stats["x"]["nulls"] == 50
    exact = t.column("x").drop_null().to_numpy(zero_copy_only=False)
    assert stats["x"]["min"] == pytest.approx(exact.min())
    assert stats["x"]["max"] == pytest.approx(exact.max())
    assert stats["x"]["mean"] == pytest.approx(exact.mean())
    assert abs(stats["uid"]["distinct_hll"] - 10_000) / 10_000 < 0.05
    assert stats["lang"]["distinct_hll"] == pytest.approx(4, abs=0.5)
    assert sum(stats["lang"]["value_counts"].values()) == 10_000
    p50 = stats["x"]["quantiles"]["p50"]
    rank = np.searchsorted(np.sort(exact), p50) / len(exact)
    assert abs(rank - 0.5) < 0.03


def test_merge_stage_preserves_totals():
    t = make_table()
    ps = PartialStats(categorical=["lang"])
    # simulate 8 batches → merge → finalize must equal single-pass totals
    parts = []
    for i in range(8):
        parts.append(ps(t.slice(i * 1250, 1250)))
    merged = StatsMerger()(pa.concat_tables(parts))
    stats = finalize(_partials_from_table(merged))
    assert stats["x"]["count"] == 10_000
    assert stats["x"]["nulls"] == 50
    assert sum(stats["lang"]["value_counts"].values()) == 10_000


def test_column_stats_on_dataset(ray_session):
    import ray.data as rd

    t = make_table()
    ds = rd.from_arrow(t).repartition(6)
    stats = column_stats(ds, categorical=["lang"], batch_size=1024)
    assert stats["x"]["count"] == 10_000
    assert stats["x"]["nulls"] == 50
    assert stats["lang"]["value_counts"]["en"] == pytest.approx(5000, rel=0.1)
    exact = t.column("x").drop_null().to_numpy(zero_copy_only=False)
    assert stats["x"]["min"] == pytest.approx(exact.min())
    assert stats["x"]["max"] == pytest.approx(exact.max())


def test_quantiles_nchars_matches_dd_sql_replay(ray_session):
    """quantiles_nchars must be hash-exact against the DuckDB replay of the
    DDSketch bucket math — the property that makes the 'approximate'
    quantile family oracle-checkable (same float expressions → same IEEE
    doubles on both sides)."""
    import duckdb

    import __ray_entry__ as E

    d = "/root/testdata/sf0.001"
    ray_df = E.queries()["quantiles_nchars"](d).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = con.execute(E.oracle_sql()["quantiles_nchars"]).df().reset_index(drop=True)
    assert ray_df.equals(ora)


def test_quantiles_nchars_no_positive_values_matches_oracle(ray_session, tmp_path):
    """No positive n_chars → engine returns 0 rows, exactly like the
    oracle's WHERE x>0 (previously int(NaN) crashed)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    d = str(tmp_path)
    pq.write_table(
        pa.table({"n_chars": pa.array([0, 0, None, -3], pa.int64())}),
        f"{d}/documents.parquet",
    )
    ray_df = E.queries()["quantiles_nchars"](d).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = con.execute(E.oracle_sql()["quantiles_nchars"]).df()
    assert len(ray_df) == 0 == len(ora)
    assert list(ray_df.columns) == ["q", "value_micro"]


def test_psi_terms_lang_null_doc_id_and_lang_match_oracle(ray_session, tmp_path):
    """Null doc_id / null lang rows are excluded on BOTH sides (the oracle's
    %2 predicate and IS NOT NULL filter drop them)."""
    import duckdb
    import pyarrow.parquet as pq

    import __ray_entry__ as E

    d = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, None, 6], pa.int64()),
                "lang": pa.array(["en", "en", "de", "de", "en", None]),
            }
        ),
        f"{d}/documents.parquet",
    )
    ray_df = E.queries()["psi_terms_lang"](d).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    ora = con.execute(E.oracle_sql()["psi_terms_lang"]).df().reset_index(drop=True)
    assert ray_df.equals(ora)
    assert ray_df["e_count"].sum() == 2 and ray_df["a_count"].sum() == 2


def test_distinct_count_per_key_exact_and_null_safe(ray_session):
    """Grouped distinct equals pandas groupby-nunique; nulls on either side
    are excluded; result invariant to partitioning."""
    import pandas as pd
    import ray

    from fdpg_query_data_validation_ray.stages.stats import distinct_count_per_key

    rng = np.random.default_rng(5)
    n = 5000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.2, 0.1]),
            "v": rng.choice([str(i) for i in range(40)] + [None], n),
        }
    )
    want = (
        df.dropna(subset=["k", "v"]).groupby("k")["v"].nunique().to_dict()
    )
    for parts in (1, 9):
        ds = ray.data.from_pandas(df).repartition(parts)
        got = (
            distinct_count_per_key(ds, "k", "v", alias="n")
            .to_pandas()
            .set_index("k")["n"]
            .to_dict()
        )
        assert got == want


def test_quantile_by_key_grouped(ray_session):
    """Per-key DDSketch quantiles: partition invariance, per-key relative
    error ≤ alpha vs exact quantiles, positive-only + null-key exclusion."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import quantile_by_key

    rng = np.random.default_rng(11)
    n = 6000
    keys = rng.choice(["a", "b", "c"], n).astype(object)
    keys[:5] = None                       # null keys excluded
    vals = rng.lognormal(0.0, 1.5, n)
    vals[rng.random(n) < 0.05] *= -1.0    # negatives excluded from ranks
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "x": pa.array(vals, pa.float64())})

    def run(parts, batch):
        return (
            quantile_by_key(rd.from_arrow(t).repartition(parts), "k", "x",
                            qs=(0.25, 0.5, 0.9), batch_size=batch)
            .to_pandas().sort_values(["k", "q"]).reset_index(drop=True)
        )

    a, b = run(2, 8192), run(11, 257)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["k"]) == {"a", "b", "c"}
    assert len(a) == 9

    df = pd.DataFrame({"k": keys, "x": vals})
    df = df[df["k"].notna() & (df["x"] > 0)]
    for (k, q), grp in a.groupby(["k", "q"]):
        got = grp["value_micro"].iloc[0] / 1e6
        xs = np.sort(df[df["k"] == k]["x"].to_numpy())
        exact = xs[int(q * (len(xs) - 1))]
        assert abs(got - exact) <= 0.0101 * exact + 1e-9


def test_quantile_by_key_empty_and_nonpositive(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import quantile_by_key

    t = pa.table({"k": pa.array(["z", "z", None], pa.string()),
                  "x": pa.array([-1.0, 0.0, 5.0], pa.float64())})
    out = quantile_by_key(rd.from_arrow(t), "k", "x").to_pandas()
    assert len(out) == 0  # no positive values for any non-null key


def test_zscore_by_key_matches_numpy_and_degenerates(ray_session):
    """z values match a float brute force within quantization; single-row
    and zero-variance keys emit NULL; null keys/values dropped; result
    invariant to partitioning."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import zscore_by_key

    rng = np.random.default_rng(17)
    n = 4000
    keys = rng.choice(["a", "b", "c"], n).astype(object)
    keys[:4] = None
    vals = np.round(rng.normal(50, 20, n), 2)
    vals[4:8] = np.nan
    t = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(keys, pa.string()),
        "v": pa.array(vals, pa.float64()),
    })
    # degenerate keys: one singleton, one constant
    extra = pa.table({
        "id": pa.array([90001, 90002, 90003], pa.int64()),
        "k": pa.array(["solo", "const", "const"], pa.string()),
        "v": pa.array([5.0, 7.0, 7.0], pa.float64()),
    })
    t = pa.concat_tables([t, extra])

    def run(parts):
        ds = rd.from_arrow(t).repartition(parts)
        return (
            zscore_by_key(ds, rd.from_arrow(t).repartition(parts),
                          "k", "v", "id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )

    a, b = run(2), run(13)
    pd.testing.assert_frame_equal(a, b)

    got = a.set_index("id")
    assert set(a["id"]) == set(
        int(i) for i, k, v in zip(t["id"].to_pylist(), t["k"].to_pylist(),
                                  t["v"].to_pylist())
        if k is not None and v is not None and v == v
    )
    assert pd.isna(got.loc[90001, "z_e6"])  # singleton
    assert pd.isna(got.loc[90002, "z_e6"])  # zero variance
    assert pd.isna(got.loc[90003, "z_e6"])

    df = pd.DataFrame({"id": t["id"].to_pylist(), "k": t["k"].to_pylist(),
                       "v": t["v"].to_pylist()})
    df = df[df["k"].isin(["a", "b", "c"]) & df["v"].notna()]
    df["x"] = np.floor(df["v"] * 100 + 0.5)
    for k, g in df.groupby("k"):
        mu, sd = g["x"].mean(), g["x"].std(ddof=0)
        for _, r in g.sample(30, random_state=0).iterrows():
            want = (r["x"] - mu) / sd
            assert abs(got.loc[r["id"], "z_e6"] / 1e6 - want) < 2e-5


def test_zscore_by_key_budget_guard(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import zscore_by_key

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "k": pa.array(["a", "b", "c"], pa.string()),
        "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
    })
    with pytest.raises(ValueError, match="broadcast budget"):
        zscore_by_key(rd.from_arrow(t), rd.from_arrow(t), "k", "v", "id",
                      max_keys=2)


def test_pivot_counts_exact_and_null_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import pivot_counts

    rng = np.random.default_rng(23)
    n = 3000
    keys = rng.integers(0, 40, n).astype(object)
    keys[:3] = None                          # null keys dropped
    pvs = rng.choice(["x", "y", "z", "weird"], n).astype(object)
    pvs[3:6] = None                          # null pivot values -> other
    t = pa.table({"k": pa.array(keys, pa.int64()),
                  "p": pa.array(pvs, pa.string())})

    def run(parts):
        return (
            pivot_counts(rd.from_arrow(t).repartition(parts), "k", "p",
                         values=["x", "y", "z"])
            .to_pandas().sort_values("k").reset_index(drop=True)
        )

    a, b = run(2), run(11)
    pd.testing.assert_frame_equal(a, b)

    df = pd.DataFrame({"k": keys, "p": pvs})
    df = df[df["k"].notna()]
    for _, r in a.iterrows():
        g = df[df["k"] == r["k"]]
        for v in ["x", "y", "z"]:
            assert r[f"n_{v}"] == (g["p"] == v).sum()
        assert r["n_other"] == ((g["p"] == "weird") | g["p"].isna()).sum()
    assert a["k"].notna().all()


def test_clip_by_key_quantiles_band_and_invariance(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import clip_by_key_quantiles

    rng = np.random.default_rng(43)
    n = 5000
    keys = rng.choice(["a", "b"], n).astype(object)
    keys[:3] = None
    vals = rng.lognormal(1.0, 1.2, n)
    vals[3:6] = -1.0  # non-positive excluded

    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.float64())})

    def run(parts):
        ds = rd.from_arrow(t).repartition(parts)
        return (
            clip_by_key_quantiles(ds, rd.from_arrow(t).repartition(parts),
                                  "k", "v", "id")
            .to_pandas().sort_values("id").reset_index(drop=True)
        )

    a, b = run(2), run(13)
    pd.testing.assert_frame_equal(a, b)

    df = pd.DataFrame({"id": np.arange(n), "k": keys, "v": vals})
    df = df[df["k"].notna() & (df["v"] > 0)]
    assert set(a["id"]) == set(df["id"])
    # clipped within band; interior values untouched; band ~ [p5, p95]
    # within DD relative error
    for k, g in a.groupby("k"):
        lo, hi = g["clipped_e6"].min(), g["clipped_e6"].max()
        assert (g["clipped_e6"] >= lo).all() and (g["clipped_e6"] <= hi).all()
        inner = g[(g["value_e6"] > lo) & (g["value_e6"] < hi)]
        assert (inner["clipped_e6"] == inner["value_e6"]).all()
        xs = np.sort(df[df["k"] == k]["v"].to_numpy())
        p5 = xs[int(0.05 * (len(xs) - 1))]
        p95 = xs[int(0.95 * (len(xs) - 1))]
        assert abs(lo / 1e6 - p5) <= 0.011 * p5 + 1e-9
        assert abs(hi / 1e6 - p95) <= 0.011 * p95 + 1e-9
    # clip fraction sane: at most ~12% of rows clipped per side
    frac = (a["clipped_e6"] != a["value_e6"]).mean()
    assert frac <= 0.25


def test_multiset_diff_exact_with_nulls(ray_session):
    """Multiset EXCEPT-with-counts: exact multiplicities both directions,
    null tuple components group as equal, identical multisets vanish,
    partition-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import multiset_diff

    a = pa.table({
        "x": pa.array(["p", "p", "q", None, None, "r"], pa.string()),
        "y": pa.array([1, 1, 2, 3, 3, None], pa.int64()),
    })
    b = pa.table({
        "x": pa.array(["p", "q", "q", None, "r"], pa.string()),
        "y": pa.array([1, 2, 2, 3, None], pa.int64()),
    })

    def run(parts):
        return (
            multiset_diff(rd.from_arrow(a).repartition(parts),
                          rd.from_arrow(b).repartition(parts), ["x", "y"])
            .to_pandas()
            .sort_values(["x", "y"], na_position="last")
            .reset_index(drop=True)
        )

    r1, r2 = run(1), run(3)
    pd.testing.assert_frame_equal(r1, r2)
    want = {
        ("p", 1): (2, 1),
        ("q", 2): (1, 2),
        (None, 3): (2, 1),
    }
    got = {
        (None if pd.isna(r["x"]) else r["x"],
         None if pd.isna(r["y"]) else int(r["y"])): (int(r["n_a"]), int(r["n_b"]))
        for _, r in r1.iterrows()
    }
    assert got == want
    # identical multisets -> empty diff
    empty = multiset_diff(rd.from_arrow(a), rd.from_arrow(a), ["x", "y"])
    assert empty.count() == 0


def test_corr_by_key_matches_numpy_and_degenerates(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import corr_by_key

    rng = np.random.default_rng(47)
    n = 3000
    keys = rng.choice(["a", "b"], n)
    x = rng.integers(1, 50, n).astype(np.float64)
    y = 3.0 * x + rng.normal(0, 10, n)          # strong positive corr
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "x": pa.array(x, pa.float64()),
                  "y": pa.array(y, pa.float64())})
    extra = pa.table({"k": pa.array(["solo", "const", "const"], pa.string()),
                      "x": pa.array([1.0, 2.0, 3.0], pa.float64()),
                      "y": pa.array([1.0, 5.0, 5.0], pa.float64())})
    t = pa.concat_tables([t, extra])

    def run(parts):
        return (
            corr_by_key(rd.from_arrow(t).repartition(parts), "k", "x", "y",
                        x_scale=1, y_scale=100)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )

    a, b = run(2), run(9)
    pd.testing.assert_frame_equal(a, b)
    got = a.set_index("k")
    assert pd.isna(got.loc["solo", "corr_e6"])    # n < 2
    assert pd.isna(got.loc["const", "corr_e6"])   # zero y variance
    df = pd.DataFrame({"k": keys,
                       "xe": np.floor(x + 0.5),
                       "ye": np.floor(y * 100 + 0.5)})
    for k, g in df.groupby("k"):
        want = np.corrcoef(g["xe"], g["ye"])[0, 1]
        assert abs(got.loc[k, "corr_e6"] / 1e6 - want) < 1e-4
        assert int(got.loc[k, "n"]) == len(g)


def test_hll_count_per_key_tolerance_and_invariance(ray_session):
    """Per-key HLL estimates land within 5% of exact distinct counts and
    are identical under any partitioning/batching (register maxima are
    order-free)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import hll_count_per_key

    rng = np.random.default_rng(67)
    n = 30000
    keys = rng.choice(["a", "b", "c"], n).astype(object)
    keys[:5] = None
    vals = np.array([f"v{int(i)}" for i in
                     rng.integers(0, 5000, n)], dtype=object)
    vals[5:10] = None
    t = pa.table({"k": pa.array(keys, pa.string()),
                  "v": pa.array(vals, pa.string())})

    def run(parts, batch):
        return (
            hll_count_per_key(rd.from_arrow(t).repartition(parts), "k", "v",
                              batch_size=batch)
            .to_pandas().sort_values("k").reset_index(drop=True)
        )

    a, b = run(2, 8192), run(13, 311)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["k"]) == {"a", "b", "c"}

    df = pd.DataFrame({"k": keys, "v": vals})
    df = df[df["k"].notna() & df["v"].notna()]
    for k, g in df.groupby("k"):
        exact = g["v"].nunique()
        est = int(a.set_index("k").loc[k, "n_distinct_est"])
        assert abs(est - exact) <= 0.05 * exact, (k, est, exact)


def test_quantile_by_key_high_cardinality_mode_identical(ray_session):
    """The routed high-cardinality plan returns IDENTICAL rows to the
    combiner plan (DD state is a pure function of the value multiset)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.stats import quantile_by_key

    rng = np.random.default_rng(71)
    n = 8000
    t = pa.table({
        "k": pa.array([f"u{int(i)}" for i in rng.integers(0, 900, n)],
                      pa.string()),
        "x": pa.array(rng.lognormal(0, 1, n), pa.float64()),
    })

    def run(hc, parts):
        return (
            quantile_by_key(rd.from_arrow(t).repartition(parts), "k", "x",
                            qs=(0.5, 0.9), high_cardinality=hc)
            .to_pandas().sort_values(["k", "q"]).reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(False, 3), run(True, 3))
    pd.testing.assert_frame_equal(run(True, 3), run(True, 11))
