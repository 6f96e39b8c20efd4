"""Benchmark harness for the Ray-Data validation engine.

Default mode: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=int($RAY_GRAFT_CPUS or 32)) and print ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "rows_per_s": ...}

--scaling: run the flagship corpus-validation pipeline twice in FRESH
subprocesses (num_cpus=8, then num_cpus=32) on the same input and report both
throughputs plus efficiency = (T32/T8)/4 — the sandbox substitute for the
north_rule's N vs 4N node cluster criterion (BASELINE.md).

Usage:
    python bench.py                 # headline suite, one JSON line
    python bench.py --scaling       # scaling evidence, one JSON line
    python bench.py --queries q1,q2 # subset
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline pipelines: the flagship validation run plus one representative per
# operator family (row checks, dedup-count agg, uniqueness shuffle, FK
# anti-join, column stats/sketches, distribution, TPC-H-ish aggregates,
# sort/top-k, dedup family, ANN, text analysis).
HEADLINE = [
    "corpus_validate",
    "row_checks_documents",
    "issue_dedup_counts",
    "unique_docs_lang_nchars",
    "fk_lineitem_orders_hash",
    "col_stats_lineitem",
    "stats_sketches",
    "lang_distribution",
    "events_hourly",
    "pricing_summary",
    "top_building_orders",
    "events_recent_topk",
    "dedup_exact_docs",
    "dedup_minhash",
    "dedup_simhash",
    "knn_cosine",
    "token_count_docs",
    "quality_docs",
]


def _consume(result) -> int:
    """Force full execution; return row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result.num_rows
    if isinstance(result, pd.DataFrame):
        return len(result)
    # ray.data.Dataset — stream it, never collect rows to the driver
    n = 0
    for batch in result.iter_batches(batch_format="pyarrow", batch_size=None):
        n += batch.num_rows
    return n


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False


def _input_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows


def run_suite(names: list[str], sf_dir: str, num_cpus: int) -> dict:
    _init_ray(num_cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = QUERIES[name]
        t0 = time.perf_counter()
        rows[name] = _consume(fn(sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    return {
        "metric": "headline pipeline wall time (validation + dedup + stats + agg suite)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "rows": rows,
    }


def _scaling_child(num_cpus: int, sf_dir: str) -> None:
    """Run the flagship pipeline in this fresh process; print rows & sec."""
    _init_ray(num_cpus)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fdpg_query_data_validation_ray.pipelines.queries import q_corpus_validate

    n_input = _input_rows(sf_dir)
    t0 = time.perf_counter()
    _consume(q_corpus_validate(sf_dir))
    dt = time.perf_counter() - t0
    print(json.dumps({"num_cpus": num_cpus, "sec": dt, "input_rows": n_input}))
    import ray

    ray.shutdown()


def run_scaling(sf_dir: str) -> dict:
    """Fresh ray session at 8 CPUs then 32 CPUs; efficiency = (T32/T8)/4."""
    results = {}
    for n in (8, 32):
        env = dict(os.environ)
        env.pop("RAY_ADDRESS", None)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_scaling-child", str(n), sf_dir],
            capture_output=True,
            text=True,
            env=env,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    tput8 = results[8]["input_rows"] / results[8]["sec"]
    tput32 = results[32]["input_rows"] / results[32]["sec"]
    eff = (tput32 / tput8) / 4.0
    return {
        "metric": "scaling efficiency (flagship corpus validation, 8 vs 32 CPUs, fresh sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "corpus_validate@8cpus_sec": round(results[8]["sec"], 3),
            "corpus_validate@32cpus_sec": round(results[32]["sec"], 3),
        },
        "throughput_rows_per_s": {"cpus8": round(tput8, 1), "cpus32": round(tput32, 1)},
        "sf": sf_dir,
        "num_cpus": 32,
        "input_rows": results[8]["input_rows"],
    }


def main() -> None:
    argv = sys.argv[1:]
    if argv and argv[0] == "--_scaling-child":
        _scaling_child(int(argv[1]), argv[2])
        return
    if argv and argv[0] == "--scaling":
        print(json.dumps(run_scaling(SF_DIR)))
        return
    names = HEADLINE
    if argv and argv[0] == "--queries":
        names = argv[1].split(",")
    out = run_suite(names, SF_DIR, NUM_CPUS)
    print(json.dumps(out))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
