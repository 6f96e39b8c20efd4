"""`ray job submit` entry point for the validation engine.

Reference analog: the compose-orchestrated extraction container
(/root/reference/docker-compose.yml:85-103 + startup_and_run.sh) — here the
whole service graph collapses into one Ray job (SURVEY.md §3.2).

Usage (cluster):
    ray job submit --working-dir . -- \
        python jobs/validate_job.py \
            --input '/data/corpus/*.parquet' \
            --out /data/qdv_out \
            --config configs/code_suite.json \
            [--partitions 64] [--batch-size 4096]

The config JSON holds the declarative plan (extension surface, SURVEY.md
§2.10 — edit config, not code):
    {
      "registry": {"routing_column": "lang", "routes": {...}},   # or "suite"
      "unique_keys": ["repo", "path", "commit"],
      "fk": [{"columns": ["repo"], "dim_keys_file": "repos.json",
              "name": "repos"}],
      "stats_columns": ["repo", "lang", "content"],
      "categorical": ["lang"],
      "content_column": "content",
      "drift": [{"column": "lang", "kind": "categorical"}],
      "snapshot_file": "snapshot.json",
      "code_systems": {"lang": {"germanic": ["en", "de"],
                                "romance": "value_sets/romance.txt"}}
    }

Rules inside "suite"/"registry" may use every DSL kind, including
`in_set` with a `values_file` (content-hashed into the run lineage).

Resume: re-submit with the same --out; finished partitions are skipped
(per-partition verdict checkpoints, state/checkpoint.py). A changed config is
refused (config-hash lineage guard).

This script OWNS its Ray session (unlike __ray_entry__.py, whose caller
inits); `ray job submit` runs it as the driver inside the cluster.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys

# `ray job submit --working-dir .` ships the repo root; make it importable
# whether the job runs from the repo root or from the shipped working dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_plan(cfg: dict):
    from fdpg_query_data_validation_ray.pipelines.validate import ValidationPlan
    from fdpg_query_data_validation_ray.rules import Rule, Suite, SuiteRegistry
    from fdpg_query_data_validation_ray.stages.drift import Snapshot  # noqa: F401

    registry = suite = None
    if "registry" in cfg:
        registry = SuiteRegistry.from_json(json.dumps(cfg["registry"]))
    if "suite" in cfg:
        suite = Suite.from_json(json.dumps(cfg["suite"]))

    fk = []
    for f in cfg.get("fk", []):
        keys = f.get("dim_keys")
        if keys is None and "dim_keys_file" in f:
            keys = json.load(open(f["dim_keys_file"]))
        fk.append({"columns": f["columns"], "dim_keys": keys, "name": f.get("name", "dim")})

    drift_rules = [
        Rule(
            "drift",
            d["column"],
            d.get("severity", "warning"),
            {
                "hist_kind": d.get("kind", "categorical"),
                "psi_threshold": d.get("psi_threshold", 0.2),
                "ks_threshold": d.get("ks_threshold", 0.2),
            },
        )
        for d in cfg.get("drift", [])
    ]
    snapshot_json = None
    if "snapshot_file" in cfg:
        snapshot_json = open(cfg["snapshot_file"]).read()

    return ValidationPlan(
        registry=registry,
        suite=suite,
        unique_keys=cfg.get("unique_keys"),
        fk_broadcast=fk,
        drift_rules=drift_rules,
        snapshot_json=snapshot_json,
        stats_columns=cfg.get("stats_columns"),
        categorical=cfg.get("categorical", []),
        content_column=cfg.get("content_column"),
        # {column: {system_name: [values...] | "value_set_file"}} — nested
        # per-code-system distribution split in the report
        code_systems=cfg.get("code_systems", {}),
    )


def _stage_with_manifest(files: list[str], out_dir: str, convert) -> list[str]:
    """Stage flat-file inputs to `{out}/_staged_parquet` exactly once.

    The conversion is itself checkpointed: `_staging_manifest.json` records
    the input files' (path, size, mtime); a re-submit with an unchanged input
    set reuses the staged parquet (the validation pass then resumes off its
    own per-partition checkpoints as usual), while ANY input change triggers
    a full restage — staged parquet must never silently diverge from the
    files it claims to represent (mirrors the resume plan guard,
    state/checkpoint.py)."""
    import shutil

    staged = os.path.join(out_dir, "_staged_parquet")
    manifest_path = os.path.join(out_dir, "_staging_manifest.json")
    fingerprint = [
        {"path": f, "size": os.path.getsize(f), "mtime": os.path.getmtime(f)}
        for f in files
    ]
    if os.path.exists(manifest_path) and os.path.isdir(staged):
        if json.load(open(manifest_path)) == fingerprint:
            return sorted(glob.glob(os.path.join(staged, "*.parquet")))
        shutil.rmtree(staged)
        os.remove(manifest_path)
    os.makedirs(out_dir, exist_ok=True)
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    convert(files, staged)
    with open(manifest_path, "w") as f:
        json.dump(fingerprint, f)
    return sorted(glob.glob(os.path.join(staged, "*.parquet")))


def stage_ndjson(files: list[str], out_dir: str) -> list[str]:
    """NDJSON → staged parquet (see _stage_with_manifest)."""
    from fdpg_query_data_validation_ray.sources.ndjson import ndjson_to_parquet

    return _stage_with_manifest(files, out_dir, ndjson_to_parquet)


def stage_csv(files: list[str], out_dir: str) -> list[str]:
    """CSV → staged parquet (see _stage_with_manifest)."""
    from fdpg_query_data_validation_ray.sources.csvsrc import csv_to_parquet

    return _stage_with_manifest(files, out_dir, csv_to_parquet)


_PA_TYPES = {
    "string": "string", "int64": "int64", "int32": "int32",
    "float64": "float64", "float32": "float32", "bool": "bool_",
    "binary": "binary", "timestamp_us": None,
}


def _schema_from_spec(spec: dict | None):
    """{'col': 'string'|'int64'|...} → pa.Schema (None → schema inference)."""
    import pyarrow as pa

    if not spec:
        return None
    fields = []
    for name, tname in spec.items():
        if tname == "timestamp_us":
            typ = pa.timestamp("us")
        else:
            attr = _PA_TYPES.get(tname)
            if attr is None:
                raise ValueError(f"unsupported paged schema type {tname!r}")
            typ = getattr(pa, attr)()
        fields.append((name, typ))
    return pa.schema(fields)


def stage_paged(spec_path: str, out_dir: str) -> list[str]:
    """Stage a live offset-paged endpoint to `{out}/_staged_parquet` once.

    The endpoint spec JSON (the `--input` argument for
    `--input-format paged-offset`) mirrors the reference client's knobs
    (/root/reference/extraction/fhir.py:12-45,120-131 — base URL, Basic or
    Bearer auth, count probe, page size, max_cnt cap):

        {"base_url": "http://host/fhir/Patient",
         "auth": {"token": "..."} | {"user": "...", "password": "..."},
         "rows_key": "entry",
         "page_size": 1000,
         "max_rows": null,
         "count": {"params": {"_summary": "count"}, "key": "total"},
         "schema": {"repo": "string", "stars": "int64"},
         "concurrency": [1, 8]}

    Staging discipline matches stage_ndjson: the manifest fingerprints the
    spec AND the probed row count, so a re-submit against an unchanged
    endpoint reuses the staged parquet (one count probe on re-run, zero page
    fetches), while any spec edit or upstream row-count change triggers a
    full restage. Pages are fetched as independent Ray tasks
    (sources/paged.py:read_paged_offset) and land as partitioned zstd
    parquet — the checked pass then gets storage-level column pruning."""
    import shutil

    from fdpg_query_data_validation_ray.sources.paged import (
        HttpJsonFetcher,
        read_paged_offset,
    )

    spec = json.load(open(spec_path))
    auth = spec.get("auth", {})

    def fetcher_factory():
        return HttpJsonFetcher(
            spec["base_url"],
            user=auth.get("user"),
            password=auth.get("password"),
            token=auth.get("token"),
            timeout_s=spec.get("timeout_s", 30.0),
        )

    count_cfg = spec.get("count", {"params": {"_summary": "count"}, "key": "total"})
    probe = fetcher_factory()(count_cfg.get("params"))
    total = int(probe[count_cfg.get("key", "total")])

    staged = os.path.join(out_dir, "_staged_parquet")
    manifest_path = os.path.join(out_dir, "_staging_manifest.json")
    # The manifest lands in the (shareable) output tree — never persist
    # credentials there. Fingerprint the spec with the auth block replaced
    # by a sha256 digest: re-staging detection still fires on any credential
    # rotation, but the plaintext token/password never touches disk.
    spec_fp = dict(spec)
    if auth:
        auth_digest = hashlib.sha256(
            json.dumps(auth, sort_keys=True).encode()
        ).hexdigest()
        spec_fp["auth"] = {"sha256": auth_digest}
    fingerprint = {"kind": "paged-offset", "spec": spec_fp, "total": total}
    if os.path.exists(manifest_path) and os.path.isdir(staged):
        if json.load(open(manifest_path)) == fingerprint:
            return sorted(glob.glob(os.path.join(staged, "*.parquet")))
        shutil.rmtree(staged)
        os.remove(manifest_path)
    os.makedirs(out_dir, exist_ok=True)
    if os.path.isdir(staged):
        shutil.rmtree(staged)
    ds = read_paged_offset(
        fetcher_factory,
        page_size=spec.get("page_size", 1000),
        total=total,
        rows_key=spec.get("rows_key", "entry"),
        schema=_schema_from_spec(spec.get("schema")),
        max_rows=spec.get("max_rows"),
        concurrency=tuple(spec.get("concurrency", (1, 8))),
    )
    ds.write_parquet(staged, compression="zstd")
    with open(manifest_path, "w") as f:
        json.dump(fingerprint, f)
    return sorted(glob.glob(os.path.join(staged, "*.parquet")))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--input",
        required=True,
        help="input path or glob; for --input-format paged-offset, the "
        "endpoint spec JSON file (see stage_paged)",
    )
    p.add_argument(
        "--input-format",
        choices=["parquet", "ndjson", "csv", "paged-offset"],
        default="parquet",
        help="ndjson (incl. .gz) and csv inputs are staged ONCE to "
        "{out}/_staged_parquet (zstd) so the checked pass gets storage-level "
        "column pruning; a staging manifest makes the conversion resumable — "
        "re-submitting with unchanged inputs skips it",
    )
    p.add_argument("--out", required=True, help="checkpointed output directory")
    p.add_argument("--config", required=True, help="plan config JSON file")
    p.add_argument("--partitions", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument(
        "--append",
        action="store_true",
        help="incremental validation: input files not in the existing run's "
        "plan become NEW partitions (committed partitions and verdicts are "
        "untouched; the cross-partition phase re-runs over all of them, so "
        "old-vs-new duplicate keys are still caught). Same config required; "
        "removed input files are refused. Also use to resume an interrupted "
        "appended run.",
    )
    p.add_argument(
        "--export-violations-ndjson",
        action="store_true",
        help="after the run, stream all per-row violations to "
        "{out}/violations_ndjson as sharded NDJSON (the parquet artifacts "
        "remain the source of truth)",
    )
    p.add_argument(
        "--write-snapshot",
        action="store_true",
        help="after the run, write out/snapshot.json from the merged sketches "
        "(the drift baseline for a future run's 'snapshot_file')",
    )
    args = p.parse_args(argv)

    import ray

    owns_ray = not ray.is_initialized()
    if owns_ray:
        # under `ray job submit` RAY_ADDRESS points at the cluster; standalone
        # falls back to a local session. PYTHONPATH must reach the WORKERS
        # (the driver-side sys.path edit does not propagate), so ship it via
        # runtime_env — on a cluster `--working-dir` puts the repo there too.
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ray.init(
            ignore_reinit_error=True,
            runtime_env={
                "env_vars": {
                    "PYTHONPATH": repo_root
                    + os.pathsep
                    + os.environ.get("PYTHONPATH", "")
                }
            },
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from fdpg_query_data_validation_ray.pipelines.validate import run_validation

    if args.input_format == "paged-offset":
        files = stage_paged(args.input, args.out)
    else:
        files = sorted(glob.glob(args.input)) or [args.input]
        if args.input_format == "ndjson":
            files = stage_ndjson(files, args.out)
        elif args.input_format == "csv":
            files = stage_csv(files, args.out)
    plan = build_plan(json.load(open(args.config)))
    report = run_validation(
        files, args.out, plan,
        num_partitions=args.partitions, batch_size=args.batch_size,
        append=args.append,
    )
    if args.write_snapshot:
        from fdpg_query_data_validation_ray.pipelines.validate import snapshot_from_run

        snapshot_from_run(args.out)
    if args.export_violations_ndjson:
        from fdpg_query_data_validation_ray.pipelines.validate import (
            export_violations_ndjson,
        )

        export_violations_ndjson(args.out)
    print(
        json.dumps(
            {
                "passed": report["passed"],
                "total_rows_checked": report["total_rows_checked"],
                "total_violations": report["total_violations"],
                "partitions": len(report["verdicts"]),
                "report": f"{args.out}/report.json",
            }
        )
    )
    if owns_ray:  # under a caller-owned session (tests) the session survives
        ray.shutdown()
    return 0 if report["passed"] else 1


if __name__ == "__main__":
    sys.exit(main())
