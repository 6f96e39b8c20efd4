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


def test_job_cli_from_paged_offset_endpoint(ray_session, tmp_path):
    """Job CLI end-to-end from a REAL (loopback) offset-paged HTTP endpoint:
    count probe → parallel page fetch through HttpJsonFetcher (Bearer auth
    verified server-side) → parquet staging (manifest keyed on spec + probed
    total) → full validation; a re-submit makes exactly ONE request (the
    count probe) and reuses the staged parquet."""
    import json as json_mod
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    from fdpg_query_data_validation_ray.sources.corpus import (
        DefectSpec,
        generate_corpus,
    )
    from jobs.validate_job import main as job_main

    t = generate_corpus(400, seed=13, defects=DefectSpec(null_content=5, bad_commit=3))
    rows = t.to_pylist()
    hits = {"count": 0, "pages": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.headers.get("Authorization") != "Bearer sesame":
                self.send_response(401)
                self.end_headers()
                return
            q = parse_qs(urlparse(self.path).query)
            if q.get("_summary") == ["count"]:
                hits["count"] += 1
                body = {"total": len(rows)}
            else:
                hits["pages"] += 1
                off, lim = int(q["offset"][0]), int(q["limit"][0])
                body = {"entry": rows[off : off + lim]}
            payload = json_mod.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        spec = {
            "base_url": f"http://127.0.0.1:{srv.server_address[1]}/corpus",
            "auth": {"token": "sesame"},
            "rows_key": "entry",
            "page_size": 64,
            "schema": {
                "repo": "string", "path": "string", "commit": "string",
                "lang": "string", "content": "string",
            },
            "concurrency": [1, 4],
        }
        spec_path = tmp_path / "endpoint.json"
        spec_path.write_text(json_mod.dumps(spec))
        out = tmp_path / "out"
        args = [
            "--input", str(spec_path),
            "--input-format", "paged-offset",
            "--out", str(out),
            "--config", "configs/code_suite.json",
            "--partitions", "2",
        ]
        rc = job_main(args)
        assert rc == 1  # defects injected → failed verdict
        report = json_mod.load(open(out / "report.json"))
        assert report["total_rows_checked"] == 400
        assert report["total_violations"] >= 5
        assert hits == {"count": 1, "pages": 7}  # ceil(400/64)

        # the staging manifest lives in the shareable output tree: it must
        # carry a digest of the auth block, never the plaintext credential
        manifest_text = (out / "_staging_manifest.json").read_text()
        assert "sesame" not in manifest_text
        manifest = json_mod.loads(manifest_text)
        assert set(manifest["spec"]["auth"]) == {"sha256"}

        # unchanged endpoint → one probe, zero page fetches, same report
        staged = sorted((out / "_staged_parquet").glob("*.parquet"))
        mtimes = [p.stat().st_mtime_ns for p in staged]
        rc2 = job_main(args)
        assert rc2 == 1
        assert hits == {"count": 2, "pages": 7}
        assert [p.stat().st_mtime_ns for p in staged] == mtimes
        assert json_mod.load(open(out / "report.json")) == report
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_fetcher_retries_transient_5xx(ray_session, tmp_path):
    """A flaky endpoint (one 500 per page before succeeding) must not kill
    the ingest: HttpJsonFetcher retries transient failures with bounded
    backoff; a 401 (config error) must NOT be retried."""
    import json as json_mod
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pytest

    from fdpg_query_data_validation_ray.sources.paged import (
        HttpJsonFetcher,
        read_paged_offset,
    )

    rows = [{"x": i} for i in range(40)]
    state = {"failed_once": set(), "auth_hits": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            if q.get("mode") == ["denied"]:
                state["auth_hits"] += 1
                self.send_response(401)
                self.end_headers()
                return
            key = self.path
            if key not in state["failed_once"]:
                state["failed_once"].add(key)
                self.send_response(503)  # transient: must be retried
                self.end_headers()
                return
            off, lim = int(q["offset"][0]), int(q["limit"][0])
            body = json_mod.dumps({"rows": rows[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/api"

        def factory():
            return HttpJsonFetcher(url, max_retries=2, backoff_s=0.01)

        ds = read_paged_offset(
            factory, page_size=16, total=len(rows), rows_key="rows",
            schema=None, concurrency=(1, 2),
        )
        got = sorted(r["x"] for r in ds.take_all())
        assert got == list(range(40))  # every page survived its 503

        # non-transient 4xx: exactly one request, immediate raise
        with pytest.raises(Exception) as ei:
            factory()({"mode": "denied"})
        assert "401" in str(ei.value)
        assert state["auth_hits"] == 1
    finally:
        srv.shutdown()
        srv.server_close()
