"""Live/paged external source: the reference's HTTP paged reader, Ray-native.

Reference analog (behavior, not code): the reference's only ingest is an HTTP
paging client — a `_summary=count` probe for the total, then sequential
next-link page iteration with Basic or Bearer auth and a `max_cnt` cap
(/root/reference/extraction/fhir.py:12-45,120-131). Here the same surface
splits into the two physically different cases:

- **offset paging** (`read_paged_offset`): the endpoint accepts
  (offset, limit) — the scale path. One count probe sizes the page grid, then
  EVERY page is an independent Ray task (one fetch per page spec, actor pool
  so per-worker session/auth state is built once in `__init__`). Pages flow
  straight into the streaming executor as Arrow blocks — no driver
  accumulation, natural backpressure, retries per page.
- **token paging** (`read_paged_tokens`): the endpoint only hands out opaque
  next-page tokens (FHIR bundles' next link) — inherently sequential. The
  driver walks the chain holding ONE page at a time and spools each page to
  a parquet part file; the returned Dataset streams from the spool, so
  driver memory is O(page) and a re-run can reuse the finished spool
  (same manifest discipline as the NDJSON staging in jobs/validate_job.py).

The fetcher is a plain callable so tests (and this sandbox, which has no
network) drive the full pipeline with fakes; `HttpJsonFetcher` is the
stdlib-urllib production implementation of the same signature with the
reference's two auth modes.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _normalize(t: pa.Table, schema: pa.Schema | None) -> pa.Table:
    """Project/cast a fetched page onto the target schema: present columns
    cast, missing ones null-filled (ragged live endpoints normalize to one
    shape — same contract as sources/ndjson.py)."""
    if schema is None:
        return t
    cols = {}
    for f in schema:
        if f.name in t.column_names:
            col = t[f.name]
            cols[f.name] = pc.cast(col, f.type) if col.type != f.type else col
        else:
            cols[f.name] = pa.nulls(t.num_rows, f.type)
    return pa.table(cols, schema=schema)


def _rows_to_table(rows: list[dict], schema: pa.Schema | None) -> pa.Table:
    if schema is not None:
        return pa.Table.from_pylist(rows, schema=schema)
    return pa.Table.from_pylist(rows)


class HttpJsonFetcher:
    """Production fetcher: GET `{base_url}?{params}` returning parsed JSON.

    Auth modes mirror the reference client: `token` → `Authorization: Bearer`,
    else `user`/`password` → HTTP Basic. Built on stdlib urllib (this
    container has no network — the class is exercised by header-construction
    tests; the paging machinery itself is fetcher-agnostic and fully tested
    through fakes)."""

    def __init__(self, base_url: str, user: str | None = None,
                 password: str | None = None, token: str | None = None,
                 timeout_s: float = 30.0, max_retries: int = 3,
                 backoff_s: float = 0.5):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.headers = {"Content-Type": "application/json"}
        if token:
            self.headers["Authorization"] = f"Bearer {token}"
        elif user is not None:
            import base64

            cred = base64.b64encode(f"{user}:{password or ''}".encode()).decode()
            self.headers["Authorization"] = f"Basic {cred}"

    def url_for(self, params: dict | None) -> str:
        if not params:
            return self.base_url
        from urllib.parse import urlencode

        return f"{self.base_url}?{urlencode(params)}"

    def __call__(self, params: dict | None) -> dict:
        """GET with bounded retries on TRANSIENT failures (HTTP 5xx / 429,
        socket errors, truncated bodies) and deterministic linear backoff —
        a live endpoint hiccup must not kill a multi-hour ingest, and Ray's
        default task retry does not cover application exceptions. 4xx other
        than 429 (auth, bad request) raise immediately: retrying those only
        hides a config error."""
        import time
        import urllib.error
        from urllib.request import Request, urlopen

        last: Exception | None = None
        for attempt in range(self.max_retries + 1):
            if attempt:
                time.sleep(self.backoff_s * attempt)
            try:
                req = Request(self.url_for(params), headers=self.headers)
                with urlopen(req, timeout=self.timeout_s) as resp:  # noqa: S310
                    if resp.status != 200:
                        raise RuntimeError(
                            f"paged fetch failed: HTTP {resp.status}"
                        )
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                if e.code < 500 and e.code != 429:
                    raise
                last = e
            except (urllib.error.URLError, TimeoutError, OSError,
                    json.JSONDecodeError) as e:
                last = e
        raise RuntimeError(
            f"paged fetch failed after {self.max_retries + 1} attempts: {last}"
        ) from last


class _OffsetPageFetch:
    """Actor-pool stage: one (offset, limit) page spec in, one Arrow page
    out. `fetcher_factory` runs ONCE per actor in __init__ (session setup,
    auth, connection pools) — per-page work is just the GET + parse."""

    def __init__(self, fetcher_factory, rows_key: str, schema: pa.Schema | None):
        self.fetch = fetcher_factory()
        self.rows_key = rows_key
        self.schema = schema

    def __call__(self, batch: pa.Table) -> pa.Table:
        tables = []
        for spec in batch.to_pylist():
            page = self.fetch({"offset": spec["offset"], "limit": spec["limit"]})
            rows = page[self.rows_key] if self.rows_key else page
            t = _rows_to_table(rows, self.schema)
            if spec.get("cap") is not None and t.num_rows > spec["cap"]:
                t = t.slice(0, spec["cap"])
            tables.append(_normalize(t, self.schema))
        out = [t for t in tables if t.num_rows]
        if not out:
            return (self.schema or pa.schema([])).empty_table()
        return pa.concat_tables(out)


def read_paged_offset(
    fetcher_factory,
    *,
    page_size: int = 1000,
    total: int | None = None,
    count_probe=None,
    rows_key: str = "entry",
    schema: pa.Schema | None = None,
    max_rows: int | None = None,
    concurrency=(1, 8),
):
    """Parallel offset-paged read → streaming Ray Dataset.

    fetcher_factory: zero-arg callable returning a `fetch(params) -> dict`
    (kept as a FACTORY so auth/session state builds per actor, never
    pickled from the driver). `total` or `count_probe()` (the reference's
    `_summary=count` probe) sizes the page grid; `max_rows` is the
    reference's max_cnt cap, applied exactly (the last page is trimmed)."""
    import ray.data as rd

    if total is None:
        if count_probe is None:
            raise ValueError("need total= or count_probe= to size the page grid")
        total = int(count_probe())
    if max_rows is not None:
        total = min(total, max_rows)
    specs = [
        {
            "offset": off,
            "limit": min(page_size, total - off),
            "cap": min(page_size, total - off),
        }
        for off in range(0, total, page_size)
    ]
    if not specs:
        return rd.from_arrow((schema or pa.schema([])).empty_table())
    return rd.from_items(specs).map_batches(
        _OffsetPageFetch,
        fn_constructor_kwargs=dict(
            fetcher_factory=fetcher_factory, rows_key=rows_key, schema=schema
        ),
        batch_format="pyarrow",
        batch_size=1,  # one page per task → per-page retry + backpressure
        concurrency=concurrency,
    )


def read_paged_tokens(
    fetch,
    spool_dir: str,
    *,
    first_params: dict | None = None,
    rows_key: str = "entry",
    next_key: str = "next",
    schema: pa.Schema | None = None,
    max_rows: int | None = None,
):
    """Sequential token-chained read → parquet spool → streaming Dataset.

    `fetch(params_or_token)` returns a page dict holding `rows_key` (list of
    row dicts) and `next_key` (opaque token for the next page, or None at the
    end — the FHIR bundle next-link shape). The chain is inherently
    sequential, so the driver walks it ONE page at a time, spooling each page
    as a zstd parquet part; the Dataset then streams from the spool with
    normal parallelism. A `_complete` marker makes the spool reusable: a
    finished spool is read directly on re-run (delete the dir to force a
    refetch)."""
    import ray.data as rd

    done_marker = os.path.join(spool_dir, "_complete")
    if not os.path.exists(done_marker):
        os.makedirs(spool_dir, exist_ok=True)
        n_rows = 0
        token = None
        part = 0
        page = fetch(first_params)
        while True:
            rows = page[rows_key] if rows_key else page
            if max_rows is not None and n_rows + len(rows) > max_rows:
                rows = rows[: max_rows - n_rows]
            if rows:
                t = _normalize(_rows_to_table(rows, schema), schema)
                pq.write_table(
                    t, os.path.join(spool_dir, f"part-{part:05d}.parquet"),
                    compression="zstd",
                )
                part += 1
                n_rows += t.num_rows
            token = page.get(next_key)
            if token is None or (max_rows is not None and n_rows >= max_rows):
                break
            page = fetch(token)
        with open(done_marker, "w") as f:
            f.write(json.dumps({"rows": n_rows, "parts": part}))
    parts = sorted(
        os.path.join(spool_dir, p)
        for p in os.listdir(spool_dir)
        if p.endswith(".parquet")
    )
    if not parts:
        return rd.from_arrow((schema or pa.schema([])).empty_table())
    return rd.read_parquet(parts)
