"""As-of join and sessionization operator tests (stages/temporal.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _events_table():
    # user 1: purchases at t=100, t=200; clicks at 50 (no match), 150 (→100),
    #         200 (tie → 200), 250 (→200)
    # user 2: clicks only (never matches)
    # user 3: purchase only (no left rows)
    rows = [
        (1, 1, 100, "purchase"),
        (2, 1, 200, "purchase"),
        (3, 1, 50, "click"),
        (4, 1, 150, "click"),
        (5, 1, 200, "click"),
        (6, 1, 250, "click"),
        (7, 2, 10, "click"),
        (8, 3, 10, "purchase"),
    ]
    return pa.table(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": [r[3] for r in rows],
        }
    )


def test_asof_join_semantics(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import asof_join_events

    ds = rd.from_arrow(_events_table()).repartition(3)
    out = asof_join_events(
        ds, by="user_id", on="ts", id_column="event_id",
        left_filter=lambda t: pc.equal(t["event_type"], "click"),
        right_filter=lambda t: pc.equal(t["event_type"], "purchase"),
        out_right_id="purchase_id", out_gap="gap_us",
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    got = {
        int(r.event_id): (None if pd.isna(r.purchase_id) else int(r.purchase_id),
                          None if pd.isna(r.gap_us) else int(r.gap_us))
        for r in out.itertuples()
    }
    assert got == {
        3: (None, None),      # before any purchase
        4: (1, 50),           # latest ≤ 150 is t=100
        5: (2, 0),            # tie: ts >= ts matches the t=200 purchase
        6: (2, 50),
        7: (None, None),      # user 2 never purchases
    }
    assert set(out["event_id"]) == {3, 4, 5, 6, 7}  # user 3 has no left rows


def test_asof_join_tie_breaks_by_last_id(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import asof_join_events

    t = pa.table(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": pa.array([100, 100, 150], pa.int64()),
            "event_type": ["purchase", "purchase", "click"],
        }
    )
    out = asof_join_events(
        rd.from_arrow(t), by="user_id", on="ts", id_column="event_id",
        left_filter=lambda x: pc.equal(x["event_type"], "click"),
        right_filter=lambda x: pc.equal(x["event_type"], "purchase"),
    ).to_pandas()
    # two purchases at the same ts → the larger event_id wins (deterministic)
    assert int(out["right_id"].iloc[0]) == 2


def test_sessionize(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import sessionize

    us = 1_000_000
    rows = []
    # user 1: events at 0s, 10s, 40min, 41min, 100min → sessions {2, 2, 1}
    for i, sec in enumerate([0, 10, 2400, 2460, 6000]):
        rows.append((i, 1, sec * us))
    # user 2: single event
    rows.append((10, 2, 0))
    t = pa.table(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = (
        sessionize(rd.from_arrow(t).repartition(2), "user_id", "ts", "event_id",
                   gap_seconds=1800)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert list(out["n_events"]) == [5, 1]
    assert list(out["n_sessions"]) == [3, 1]
    assert list(out["longest_session"]) == [2, 1]


def test_range_join_count(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import range_join_count

    # user 1 at t = 0, 100, 250, 1000 with window ±200:
    #   0 → {100}, 100 → {0, 250}, 250 → {100}, 1000 → {}
    t = pa.table(
        {
            "event_id": [1, 2, 3, 4, 9],
            "user_id": [1, 1, 1, 1, 2],
            "ts": pa.array([0, 100, 250, 1000, 0], pa.int64()),
        }
    )
    out = (
        range_join_count(rd.from_arrow(t).repartition(2), "user_id", "ts",
                         "event_id", lo_us=-200, hi_us=200)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    assert list(out["n_neighbors"]) == [1, 2, 1, 0, 0]
    # window boundaries are inclusive both sides (BETWEEN semantics)
    t2 = pa.table(
        {"event_id": [1, 2], "user_id": [1, 1], "ts": pa.array([0, 200], pa.int64())}
    )
    out2 = range_join_count(
        rd.from_arrow(t2), "user_id", "ts", "event_id", lo_us=-200, hi_us=200
    ).to_pandas()
    assert list(out2["n_neighbors"]) == [1, 1]


def test_temporal_partition_invariance(ray_session):
    """As-of join, sessionization and range join outputs are independent of
    the input's block split (§2.9 order-insensitivity: per-group bodies sort
    internally, groupby co-locates keys)."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        asof_join_events,
        range_join_count,
        sessionize,
    )

    rng = np.random.default_rng(3)
    n = 400
    t = pa.table(
        {
            "event_id": list(range(n)),
            "user_id": rng.integers(0, 7, n),
            "ts": pa.array(np.sort(rng.integers(0, 10_000_000, n)), pa.int64()),
            "event_type": rng.choice(["click", "purchase", "view"], n),
        }
    )

    def run_all(parts):
        ds = rd.from_arrow(t).repartition(parts)
        a = asof_join_events(
            ds, by="user_id", on="ts", id_column="event_id",
            left_filter=lambda x: pc.equal(x["event_type"], "click"),
            right_filter=lambda x: pc.equal(x["event_type"], "purchase"),
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        s = sessionize(ds, "user_id", "ts", "event_id", gap_seconds=100).to_pandas(
        ).sort_values("user_id").reset_index(drop=True)
        r = range_join_count(
            ds, "user_id", "ts", "event_id", lo_us=-5000, hi_us=5000
        ).to_pandas().sort_values("event_id").reset_index(drop=True)
        return a, s, r

    a1, s1, r1 = run_all(1)
    a2, s2, r2 = run_all(9)
    assert a1.equals(a2)
    assert s1.equals(s2)
    assert r1.equals(r2)


def _synthetic_stream(n_users, events_per_user, seed=3, hot_user=None, hot_rows=0):
    rng = np.random.default_rng(seed)
    users = np.repeat(np.arange(n_users, dtype=np.int64), events_per_user)
    if hot_user is not None:
        users = np.concatenate([users, np.full(hot_rows, hot_user, np.int64)])
    n = len(users)
    ts = rng.integers(0, 10_000_000, n)
    ids = np.arange(n, dtype=np.int64)
    perm = rng.permutation(n)
    return pa.table(
        {
            "event_id": pa.array(ids[perm]),
            "user_id": pa.array(users[perm]),
            "ts": pa.array(ts[perm], pa.int64()),
        }
    )


def test_range_join_presplit_matches_unsplit(ray_session):
    """Time-range pre-split of a hot key (ghost-margin mirroring) must give
    exactly the unsplit plan's neighbor counts — for every row, including
    rows at chunk boundaries."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import range_join_count

    t = _synthetic_stream(40, 30, hot_user=7, hot_rows=2_000)
    ds = rd.from_arrow(t).repartition(8)
    base = (
        range_join_count(ds, "user_id", "ts", "event_id", -5_000, 5_000)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    split = (
        range_join_count(
            ds, "user_id", "ts", "event_id", -5_000, 5_000,
            presplit={7: 100_000},
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert base.equals(split)
    assert (base[base["user_id"] == 7]["n_neighbors"] > 0).any()


def test_range_join_presplit_rejects_narrow_span(ray_session):
    import pytest
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import range_join_count

    ds = rd.from_arrow(_synthetic_stream(4, 4))
    with pytest.raises(ValueError, match="presplit chunk spans"):
        range_join_count(
            ds, "user_id", "ts", "event_id", -5_000, 5_000, presplit={1: 1_000}
        )


def test_hot_key_guard_error_policy(ray_session):
    """A key whose rows exceed hot_key_limit must raise under
    policy='error' and still compute exact results under policy='warn'."""
    import pytest
    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        range_join_count,
        sessionize,
    )

    t = _synthetic_stream(5, 10, hot_user=2, hot_rows=500)
    ds = rd.from_arrow(t)
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        sessionize(
            ds, "user_id", "ts", "event_id",
            hot_key_limit=100, hot_key_policy="error",
        ).to_pandas()
    # warn policy: exact results, job completes
    out = sessionize(
        ds, "user_id", "ts", "event_id", hot_key_limit=100, hot_key_policy="warn"
    ).to_pandas()
    assert int(out[out["user_id"] == 2]["n_events"].iloc[0]) == 510
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        range_join_count(
            ds, "user_id", "ts", "event_id", -5_000, 5_000,
            hot_key_limit=100, hot_key_policy="error",
        ).to_pandas()


def test_pathological_single_user_stream(ray_session):
    """The documented hot-key behavior end-to-end: EVERY row belongs to one
    user (the partitioning assumption is maximally violated). The coarse-part
    kernels must still complete with exact results (vectorized, no per-key
    frames) — the guard warns, nothing OOMs, nothing drops."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        detect_hot_keys,
        sessionize,
    )

    n = 200_000
    rng = np.random.default_rng(9)
    ts = np.sort(rng.integers(0, 10_000_000_000, n))
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(np.full(n, 42, np.int64)),
            "ts": pa.array(ts, pa.int64()),
        }
    )
    ds = rd.from_arrow(t).repartition(16)
    hot = detect_hot_keys(ds, "user_id", limit_rows=50_000)
    assert hot == {42: n}
    out = sessionize(
        ds, "user_id", "ts", "event_id", gap_seconds=1, hot_key_limit=50_000
    ).to_pandas()
    assert len(out) == 1 and int(out["n_events"].iloc[0]) == n
    # cross-check session count against a direct numpy computation
    expect_sessions = 1 + int((np.diff(ts) > 1_000_000).sum())
    assert int(out["n_sessions"].iloc[0]) == expect_sessions


def _hot_user_events(n_hot=6000, n_cold_users=40, seed=9):
    """One pathological hot user (n_hot events spread over a wide time range,
    ~10% purchases) + normal users."""
    rng = np.random.default_rng(seed)
    hot_ts = np.sort(rng.integers(0, 50_000_000, n_hot))
    rows = {
        "event_id": list(range(1, n_hot + 1)),
        "user_id": [777] * n_hot,
        "ts": hot_ts.tolist(),
        "event_type": rng.choice(
            ["click", "purchase"], size=n_hot, p=[0.9, 0.1]
        ).tolist(),
    }
    eid = n_hot + 1
    for u in range(1, n_cold_users + 1):
        k = int(rng.integers(3, 12))
        for t in np.sort(rng.integers(0, 50_000_000, k)):
            rows["event_id"].append(eid)
            rows["user_id"].append(u)
            rows["ts"].append(int(t))
            rows["event_type"].append(
                "purchase" if rng.random() < 0.2 else "click"
            )
            eid += 1
    return pa.table(
        {
            "event_id": pa.array(rows["event_id"], pa.int64()),
            "user_id": pa.array(rows["user_id"], pa.int64()),
            "ts": pa.array(rows["ts"], pa.int64()),
            "event_type": pa.array(rows["event_type"], pa.string()),
        }
    )


def test_asof_presplit_hot_user_exact_and_bounded(ray_session):
    """Single-hot-user fixture: the time-range presplit keeps every per-part
    key block under the hot-key limit (policy='error' proves it — the
    UNSPLIT run raises under the same limit) while the as-of results stay
    exactly those of the unsplit plan (cross-chunk seeds carry the latest
    earlier right row into each chunk)."""
    import pytest
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import asof_join_events

    tbl = _hot_user_events()
    ds = rd.from_arrow(tbl).repartition(8).materialize()
    kw = dict(
        by="user_id", on="ts", id_column="event_id",
        left_filter=lambda t: pc.equal(t["event_type"], "click"),
        right_filter=lambda t: pc.equal(t["event_type"], "purchase"),
    )
    ref = (
        asof_join_events(ds, **kw)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # unsplit + tight limit: the hot user's block violates the budget
    with pytest.raises(Exception):
        asof_join_events(
            ds, **kw, hot_key_limit=2000, hot_key_policy="error"
        ).to_pandas()
    # presplit: 5ms chunks → ~10 chunks of ≤~1k rows; same limit passes
    got = (
        asof_join_events(
            ds, **kw, hot_key_limit=2000, hot_key_policy="error",
            presplit={777: 5_000_000},
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ref, got, check_exact=True)


def test_sessionize_presplit_hot_user_exact_and_bounded(ray_session):
    """Same fixture through sessionize: chunk partials + seam stitching give
    exactly the unsplit per-user session stats, with per-part key blocks
    bounded (policy='error' under a limit the unsplit run violates)."""
    import pytest
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import sessionize

    tbl = _hot_user_events()
    ds = rd.from_arrow(tbl).repartition(8).materialize()
    # gap tuned so the hot user has many sessions, some crossing chunk seams
    kw = dict(user_col="user_id", ts_col="ts", id_column="event_id",
              gap_seconds=10)  # 10s = 10M us vs 50M us span: sessions merge
    ref = (
        sessionize(ds, **kw)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    with pytest.raises(Exception):
        sessionize(
            ds, **kw, hot_key_limit=2000, hot_key_policy="error"
        ).to_pandas()
    got = (
        sessionize(
            ds, **kw, hot_key_limit=2000, hot_key_policy="error",
            presplit={777: 12_000_000},
        )
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(ref, got, check_exact=True)


def test_sessionize_presplit_mixed_seams(ray_session):
    """Fractional gap so roughly half the hot user's event gaps break
    sessions: chunk seams now both merge AND not-merge, exercising every
    stitch branch. Exactness vs the unsplit plan."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import sessionize

    tbl = _hot_user_events()
    ds = rd.from_arrow(tbl).repartition(8).materialize()
    kw = dict(user_col="user_id", ts_col="ts", id_column="event_id",
              gap_seconds=0.005)  # 5000 us vs ~8300 us mean spacing
    ref = (
        sessionize(ds, **kw)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    got = (
        sessionize(ds, **kw, presplit={777: 5_000_000})
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert ref.loc[ref["user_id"] == 777, "n_sessions"].iloc[0] > 100
    pd.testing.assert_frame_equal(ref, got, check_exact=True)


def test_lag_delta_semantics(ray_session):
    """LAG per key: first row of each key gets NULL prev/delta; ties on ts
    break by id; null values propagate NULL like SQL LAG arithmetic."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import lag_delta

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, None], pa.int64()),
            "ts": pa.array([100, 200, 200, 50, 60, 10], pa.int64()),
            "value": pa.array([1.5, 2.25, None, 4.0, 3.0, 9.0], pa.float64()),
        }
    )
    out = (
        lag_delta(rd.from_arrow(t).repartition(3), "user_id", "ts",
                  "event_id", "value")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # null key dropped
    assert set(out["event_id"]) == {1, 2, 3, 4, 5}

    def row(eid):
        r = out[out["event_id"] == eid].iloc[0]
        g = lambda v: None if pd.isna(v) else int(v)
        return (g(r["value_e"]), g(r["prev_value_e"]), g(r["delta_e"]))

    assert row(1) == (1_500_000, None, None)
    assert row(2) == (2_250_000, 1_500_000, 750_000)
    assert row(3) == (None, 2_250_000, None)   # null value, non-null prev
    assert row(4) == (4_000_000, None, None)
    assert row(5) == (3_000_000, 4_000_000, -1_000_000)


def test_lag_delta_partition_invariance(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import lag_delta

    rng = np.random.default_rng(7)
    n = 4000
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 37, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
            "value": pa.array(rng.normal(0, 10, n), pa.float64()),
        }
    )

    def run(parts):
        return (
            lag_delta(rd.from_arrow(t).repartition(parts), "user_id", "ts",
                      "event_id", "value")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )

    a, b = run(2), run(13)
    pd.testing.assert_frame_equal(a, b)

    # brute-force oracle: pandas groupby shift over the (ts, id) order
    df = t.to_pandas()
    df["value_e"] = np.floor(df["value"] * 1e6 + 0.5).astype(np.int64)
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    df["prev_value_e"] = df.groupby("user_id")["value_e"].shift(1)
    ref = df.sort_values("event_id").reset_index(drop=True)
    got = a.set_index("event_id")
    for eid, r in ref.set_index("event_id").iterrows():
        g = got.loc[eid]
        assert int(g["value_e"]) == int(r["value_e"])
        if pd.isna(r["prev_value_e"]):
            assert pd.isna(g["prev_value_e"]) and pd.isna(g["delta_e"])
        else:
            assert int(g["prev_value_e"]) == int(r["prev_value_e"])
            assert int(g["delta_e"]) == int(r["value_e"] - r["prev_value_e"])


def test_rolling_window_sum_brute_force_and_invariance(ray_session):
    """RANGE-window semantics vs an O(n^2) brute force: trailing window
    includes boundary (ts == cur-W) and ALL current-ts peers; null values
    count rows but add nothing; all-null windows sum to NULL."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import rolling_window_sum

    rng = np.random.default_rng(13)
    n = 3000
    ts = rng.integers(0, 400, n)          # dense ints -> many exact ties
    vals = rng.normal(0, 50, n)
    vals[rng.random(n) < 0.08] = np.nan   # null values
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 23, n), pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    W = 50

    def run(parts, batch=16384):
        return (
            rolling_window_sum(
                rd.from_arrow(t).repartition(parts), "user_id", "ts",
                "event_id", "value", window_us=W, scale=100)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a, b = run(2), run(17)
    pd.testing.assert_frame_equal(a, b)

    df = t.to_pandas()
    v_e = np.floor(df["value"].to_numpy() * 100 + 0.5)
    got = a.set_index("event_id")
    for i in range(0, n, 7):  # sample rows; full loop is slow
        u, cur = df["user_id"][i], df["ts"][i]
        m = (df["user_id"].to_numpy() == u) & (df["ts"].to_numpy() >= cur - W) \
            & (df["ts"].to_numpy() <= cur)
        g = got.loc[i]
        assert int(g["win_n"]) == int(m.sum())
        w = v_e[m]
        w = w[~np.isnan(w)]
        if len(w) == 0:
            assert pd.isna(g["win_sum_e"])
        else:
            assert int(g["win_sum_e"]) == int(w.sum())


def test_rolling_window_sum_null_and_edge_semantics(ray_session):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import rolling_window_sum

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([7, 7, 7, None, 8, 8], pa.int64()),
            "ts": pa.array([100, 150, 150, 100, 100, None], pa.int64()),
            "value": pa.array([1.0, None, 2.0, 9.0, None, 4.0], pa.float64()),
        }
    )
    out = (
        rolling_window_sum(rd.from_arrow(t), "user_id", "ts", "event_id",
                           "value", window_us=50, scale=100)
        .to_pandas().set_index("event_id")
    )
    # null key (4) and null ts (6) dropped
    assert set(out.index) == {1, 2, 3, 5}
    # row 1: only itself
    assert (int(out.loc[1, "win_sum_e"]), int(out.loc[1, "win_n"])) == (100, 1)
    # rows 2,3: ts peers at 150, window [100,150] -> rows 1,2,3; null row 2
    # counts but adds nothing; peers share the same window
    for eid in (2, 3):
        assert int(out.loc[eid, "win_n"]) == 3
        assert int(out.loc[eid, "win_sum_e"]) == 300
    # row 5: alone, null value -> NULL sum, count 1
    assert pd.isna(out.loc[5, "win_sum_e"]) and int(out.loc[5, "win_n"]) == 1


def test_funnel_first_conversion_brute_force(ray_session):
    """3-step funnel vs an O(n^3) brute force over random event logs:
    strict time order, per-gap window, earliest qualifying start; keys
    with no chain emit nothing; partition-invariant."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion,
    )

    rng = np.random.default_rng(37)
    n = 4000
    t = pa.table(
        {
            "u": pa.array(rng.integers(0, 60, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 2000, n), pa.int64()),
            "et": pa.array(rng.choice(["A", "B", "C", "noise"], n),
                           pa.string()),
        }
    )
    W = 40

    def run(parts):
        return (
            funnel_first_conversion(
                rd.from_arrow(t).repartition(parts), "u", "ts", "et",
                steps=["A", "B", "C"], window_us=W)
            .to_pandas().sort_values("u").reset_index(drop=True)
        )

    a, b = run(2), run(17)
    pd.testing.assert_frame_equal(a, b)

    df = t.to_pandas()
    want = {}
    for u, g in df.groupby("u"):
        ta = sorted(g[g["et"] == "A"]["ts"])
        tb = sorted(g[g["et"] == "B"]["ts"])
        tc = sorted(g[g["et"] == "C"]["ts"])
        best = None
        for x in ta:
            if any(x < y <= x + W and any(y < z <= y + W for z in tc)
                   for y in tb):
                best = x
                break
        if best is not None:
            want[u] = best
    got = dict(zip(a["u"], a["first_start_ts"]))
    assert {int(k): int(v) for k, v in got.items()} == want


def test_funnel_edge_semantics(ray_session):
    """Boundary inclusion (gap == window), strictness (gap 0 fails),
    non-greedy start (early A that can't chain doesn't block a later A
    from converting — but the emitted ts is the earliest QUALIFYING A)."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        funnel_first_conversion,
    )

    rows = [
        # u1: A@0 orphan; A@100 -> B@110 -> C@120 converts; first = 100
        (1, 0, "A"), (1, 100, "A"), (1, 110, "B"), (1, 120, "C"),
        # u2: exact-boundary gaps (10) both steps -> converts at 0
        (2, 0, "A"), (2, 10, "B"), (2, 20, "C"),
        # u3: zero gap A==B ts -> strict > fails
        (3, 0, "A"), (3, 0, "B"), (3, 5, "C"),
        # u4: B before A only -> no chain
        (4, 5, "B"), (4, 6, "C"), (4, 7, "A"),
    ]
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.int64()),
            "et": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = (
        funnel_first_conversion(rd.from_arrow(t), "u", "ts", "et",
                                steps=["A", "B", "C"], window_us=10)
        .to_pandas().set_index("u")
    )
    assert set(out.index) == {1, 2}
    assert int(out.loc[1, "first_start_ts"]) == 100
    assert int(out.loc[2, "first_start_ts"]) == 0


def test_ewma_by_key_brute_force_and_invariance(ray_session):
    """Recursive EWMA per key vs a Python loop; nulls skipped/carried
    (pandas ignore_na); partition-invariant."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import ewma_by_key

    rng = np.random.default_rng(61)
    n = 2500
    vals = rng.normal(10, 5, n)
    vals[rng.random(n) < 0.07] = np.nan
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 31, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 800, n), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )
    alpha = 0.3

    def run(parts):
        return (
            ewma_by_key(rd.from_arrow(t).repartition(parts), "user_id",
                        "ts", "event_id", "value", alpha=alpha)
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a, b = run(2), run(15)
    pd.testing.assert_frame_equal(a, b)

    df = (t.to_pandas().sort_values(["user_id", "ts", "event_id"])
          .reset_index(drop=True))
    got = a.set_index("event_id")
    for u, g in df.groupby("user_id"):
        ema = None
        for _, r in g.iterrows():
            x = r["value"]
            if not np.isnan(x):
                ema = x if ema is None else alpha * x + (1 - alpha) * ema
            want = (pd.NA if ema is None
                    else int(np.floor(ema * 1e6 + 0.5)))
            have = got.loc[r["event_id"], "ewma_e6"]
            if want is pd.NA:
                assert pd.isna(have)
            else:
                assert int(have) == want, (u, r["event_id"])


def test_forward_fill_by_key_brute_force(ray_session):
    """LOCF vs pandas groupby-ffill: nulls carried forward within a key
    only; rows before a key's first observation stay NULL; cross-key
    leakage impossible; partition-invariant."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import (
        forward_fill_by_key,
    )

    rng = np.random.default_rng(73)
    n = 3000
    vals = np.round(rng.normal(5, 2, n), 3)
    vals[rng.random(n) < 0.45] = np.nan  # heavy gaps
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), pa.int64()),
            "user_id": pa.array(rng.integers(0, 29, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 600, n), pa.int64()),
            "value": pa.array(vals, pa.float64()),
        }
    )

    def run(parts):
        return (
            forward_fill_by_key(rd.from_arrow(t).repartition(parts),
                                "user_id", "ts", "event_id", "value")
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )

    a, b = run(2), run(19)
    pd.testing.assert_frame_equal(a, b)

    df = (t.to_pandas().sort_values(["user_id", "ts", "event_id"])
          .reset_index(drop=True))
    df["e"] = np.floor(df["value"] * 1e6 + 0.5)
    df["want"] = df.groupby("user_id")["e"].ffill()
    got = a.set_index("event_id")
    for _, r in df.iterrows():
        have = got.loc[r["event_id"], "filled_e"]
        if np.isnan(r["want"]):
            assert pd.isna(have)
        else:
            assert int(have) == int(r["want"])


def test_user_retention_matrix(ray_session):
    """Cohort retention over a planted event log: user 1 joins week0 and
    returns week2; user 2 joins week0 only; user 3 joins week1, active
    weeks 1 and 2. Partition-invariant."""
    import ray.data as rd

    import fdpg_query_data_validation_ray.pipelines.queries as q

    W = 7 * 24 * 3600 * 1_000_000
    base = 1_700_000_000_000_000  # anchor inside some week
    # align to a Monday week boundary so planted weeks are unambiguous
    import datetime as dt
    anchor = dt.datetime(2024, 1, 1)  # a Monday
    t0 = int(anchor.timestamp() * 1e6)
    rows = [
        (1, t0 + 1), (1, t0 + 2 * W + 5), (2, t0 + 3),
        (3, t0 + W + 1), (3, t0 + 2 * W + 1),
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
        }
    )

    def run(parts):
        orig = q._read
        q._read = lambda sf, table, columns: (
            rd.from_arrow(t.select(columns)).repartition(parts)
        )
        try:
            return (
                q.QUERIES["user_retention"]("ignored").to_pandas()
                .sort_values(["cohort", "week"]).reset_index(drop=True)
            )
        finally:
            q._read = orig

    a, b = run(1), run(4)
    pd.testing.assert_frame_equal(a, b)
    got = {
        (r["cohort"].to_pydatetime(), r["week"].to_pydatetime()): r["n_users"]
        for _, r in a.iterrows()
    }
    w0 = anchor
    w1 = anchor + dt.timedelta(weeks=1)
    w2 = anchor + dt.timedelta(weeks=2)
    assert got == {
        (w0, w0): 2,          # users 1, 2 active in their cohort week
        (w0, w2): 1,          # user 1 returns in week 2
        (w1, w1): 1,          # user 3 cohort week
        (w1, w2): 1,          # user 3 active week 2
    }


def test_running_sum_nulls_and_key_reset(ray_session):
    """running_sum: NULL values add nothing, rows before a key's first
    non-null emit NULL, and the carry never crosses keys."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.temporal import running_sum

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "ts": pa.array([1, 2, 3, 1, 2, 3], pa.int64()),
            "id": pa.array([10, 11, 12, 20, 21, 22], pa.int64()),
            "v": pa.array([None, 1.0, 2.5, 4.0, None, 0.5], pa.float64()),
        }
    )
    out = (
        running_sum(rd.from_arrow(t).repartition(3), "k", "ts", "id", "v",
                    scale=100)
        .to_pandas()
        .sort_values(["k", "id"])
        .reset_index(drop=True)
    )
    got = [None if pd.isna(x) else int(x) for x in out["run_sum_e"]]
    assert got == [None, 100, 350, 400, 400, 450]
