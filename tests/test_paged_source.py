"""Live/paged source tests (sources/paged.py) — fetcher-agnostic machinery
driven with fakes (this container has no network; the HTTP fetcher itself is
covered by header/url construction tests).

NOTE: fetcher factories are built INSIDE the tests (closures) so cloudpickle
ships them by VALUE; a module-level function would serialize by reference to
this test module, which Ray workers cannot import."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fdpg_query_data_validation_ray.sources.paged import (
    HttpJsonFetcher,
    read_paged_offset,
    read_paged_tokens,
)

N = 3_333

SCHEMA = pa.schema(
    [("rid", pa.int64()), ("val", pa.string()), ("missing_col", pa.float64())]
)


def _make_rows():
    return [
        {"rid": int(i), "val": f"v{i}", **({"extra": 1} if i % 7 == 0 else {})}
        for i in range(N)
    ]


def test_read_paged_offset_full_parity(ray_session):
    rows = _make_rows()

    def factory(rows=rows):
        def fetch(params):
            off, lim = params["offset"], params["limit"]
            return {"entry": rows[off : off + lim], "total": N}

        return fetch

    ds = read_paged_offset(
        factory, page_size=256, count_probe=lambda: N, schema=SCHEMA
    )
    df = ds.to_pandas().sort_values("rid").reset_index(drop=True)
    assert len(df) == N
    assert (df["rid"].to_numpy() == np.arange(N)).all()
    assert df["val"].iloc[100] == "v100"
    # schema normalization: absent column null-filled, ragged 'extra' dropped
    assert df["missing_col"].isna().all()
    assert list(df.columns) == ["rid", "val", "missing_col"]


def test_read_paged_offset_max_rows_cap(ray_session):
    rows = _make_rows()

    def factory(rows=rows):
        def fetch(params):
            off, lim = params["offset"], params["limit"]
            return {"entry": rows[off : off + lim]}

        return fetch

    ds = read_paged_offset(
        factory, page_size=100, total=N, max_rows=517, schema=SCHEMA
    )
    df = ds.to_pandas().sort_values("rid").reset_index(drop=True)
    assert len(df) == 517
    assert df["rid"].iloc[-1] == 516  # exact trim, reference max_cnt semantics


def test_read_paged_tokens_spool_and_reuse(ray_session, tmp_path):
    rows = _make_rows()
    calls = {"n": 0}

    def fetch(token):
        calls["n"] += 1
        start = 0 if token is None else int(token)
        page = rows[start : start + 500]
        nxt = str(start + 500) if start + 500 < N else None
        return {"entry": page, "next": nxt}

    spool = str(tmp_path / "spool")
    ds = read_paged_tokens(fetch, spool, schema=SCHEMA)
    df = ds.to_pandas().sort_values("rid").reset_index(drop=True)
    assert len(df) == N
    fetches_first = calls["n"]
    assert fetches_first == 7  # ceil(3333/500)

    # finished spool reused: no new fetches on re-read
    ds2 = read_paged_tokens(fetch, spool, schema=SCHEMA)
    assert ds2.count() == N
    assert calls["n"] == fetches_first


def test_read_paged_tokens_max_rows(ray_session, tmp_path):
    rows = _make_rows()

    def fetch(token):
        start = 0 if token is None else int(token)
        page = rows[start : start + 500]
        nxt = str(start + 500) if start + 500 < N else None
        return {"entry": page, "next": nxt}

    ds = read_paged_tokens(
        fetch, str(tmp_path / "spool2"), schema=SCHEMA, max_rows=1_234
    )
    assert ds.count() == 1_234


def test_http_fetcher_auth_modes():
    bearer = HttpJsonFetcher("http://svc/fhir/", token="tok123")
    assert bearer.headers["Authorization"] == "Bearer tok123"
    basic = HttpJsonFetcher("http://svc/fhir", user="u", password="p")
    import base64

    assert basic.headers["Authorization"] == "Basic " + base64.b64encode(
        b"u:p"
    ).decode()
    assert (
        bearer.url_for({"_summary": "count", "x": 1})
        == "http://svc/fhir?_summary=count&x=1"
    )
    assert bearer.url_for(None) == "http://svc/fhir"
