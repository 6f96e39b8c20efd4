"""Deterministic synthetic source-code corpus (repo, path, commit, lang, content).

The engine's flagship input per BASELINE.json input_hint. Two constructors:

- `generate_corpus(n_rows, seed, defects=...)` — seeded, fully vectorized
  (numpy) generator with injectable defect classes mirroring FIXTURES.md
  (null_required, bad_format, bad_valueset, dup_key incl. a skewed duplicate
  group, dangling_fk). Used by tests and by bench at 10^6-row scale.
  Reference analog: the golden pass/fail corpus test/data/<type>/*_{pass,fail}.json.

- `corpus_from_documents(sf_dir)` — deterministic derivation of a corpus table
  from the driver's documents.parquet (doc → repo=source, path from doc_id,
  commit=md5(text), lang, content=text). No external data; reproducible from
  the sf tables alone.

Generation is pure: same (n_rows, seed, defects) → byte-identical table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from fdpg_query_data_validation_ray.schema import CORPUS_SCHEMA

LANGS = ("python", "javascript", "java", "go", "rust", "c", "cpp", "markdown")
EXT = {
    "python": "py", "javascript": "js", "java": "java", "go": "go",
    "rust": "rs", "c": "c", "cpp": "cc", "markdown": "md",
}
_WORDS = np.array(
    "def return import class self value table batch hash key row scan merge "
    "sort index buffer stream async await fn let const var void int str map "
    "filter reduce yield match case struct impl trait enum module package".split(),
    dtype=object,
)


@dataclass(frozen=True)
class DefectSpec:
    """Counts of injected defect rows (FIXTURES.md defect classes)."""

    null_content: int = 0       # content → null            (not_null violations)
    null_commit: int = 0        # commit → null
    bad_commit: int = 0         # commit not 40-hex          (regex violations)
    bad_lang: int = 0           # lang ∈ {klingon, cobol77}  (in_set violations)
    dup_groups: tuple = ()      # e.g. (2, 3, 50): duplicate-key group sizes; the
                                # largest lands in one repo (skew probe)
    dangling_repo: int = 0      # repo outside the dim table (FK violations)
    dangling_commit: int = 0
    missing_suite_lang: int = 0 # lang="fortran" → no routed suite (warning path)


def _commits(rng: np.random.Generator, n: int) -> np.ndarray:
    raw = rng.integers(0, 16, size=(n, 40))
    digits = np.array(list("0123456789abcdef"))
    # (n × 40) single chars reinterpreted as n 40-char strings — no row loop
    hex40 = np.ascontiguousarray(digits[raw]).view("<U40").reshape(n)
    return hex40.astype(object)


def generate_corpus(
    n_rows: int,
    seed: int = 42,
    n_repos: int | None = None,
    defects: DefectSpec = DefectSpec(),
    mean_lines: int = 12,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_repos = n_repos or max(4, n_rows // 200)

    repo_ix = rng.integers(0, n_repos, size=n_rows)
    repos = np.array([f"org{i % 37}/repo{i}" for i in range(n_repos)], dtype=object)[repo_ix]
    lang_ix = rng.integers(0, len(LANGS), size=n_rows)
    langs = np.array(LANGS, dtype=object)[lang_ix]
    exts = np.array([EXT[l] for l in LANGS], dtype=object)[lang_ix]
    fileno = rng.integers(0, 10_000, size=n_rows)
    depth = rng.integers(1, 4, size=n_rows)
    paths = np.array(
        [f"src/{'sub/' * d}file_{f}.{e}" for d, f, e in zip(depth, fileno, exts)],
        dtype=object,
    )
    commits = _commits(rng, n_rows)

    # content: log-normal-ish line counts of word-salad source text; fully
    # deterministic from the seed so sha256 is reproducible (FIXTURES.md)
    n_lines = np.clip(rng.lognormal(np.log(mean_lines), 0.6, n_rows).astype(int), 1, 400)
    word_ix = rng.integers(0, len(_WORDS), size=int(n_lines.sum()) * 6)
    # vectorized line assembly: object-array `+` concatenates strings in C
    w = _WORDS[word_ix].reshape(-1, 6)
    lines = w[:, 0]
    for j in range(1, 6):
        lines = lines + " " + w[:, j]
    headers = "// " + repos + ":" + paths + "\n"
    offsets = np.concatenate([[0], np.cumsum(n_lines)])
    contents = np.empty(n_rows, dtype=object)
    for i in range(n_rows):
        contents[i] = headers[i] + "\n".join(lines[offsets[i] : offsets[i + 1]])

    # -- defect injection (deterministic row positions from the tail) --------
    cursor = n_rows
    def take(k: int) -> np.ndarray:
        nonlocal cursor
        ix = np.arange(cursor - k, cursor)
        cursor -= k
        return ix

    d = defects
    if d.null_content:
        contents[take(d.null_content)] = None
    if d.null_commit:
        commits[take(d.null_commit)] = None
    if d.bad_commit:
        ix = take(d.bad_commit)
        half = len(ix) // 2
        commits[ix[:half]] = "deadbeef"                      # too short
        commits[ix[half:]] = "A" * 40                         # uppercase
    if d.bad_lang:
        ix = take(d.bad_lang)
        langs[ix] = np.where(np.arange(len(ix)) % 2 == 0, "klingon", "cobol77")
    if d.missing_suite_lang:
        langs[take(d.missing_suite_lang)] = "fortran"
    if d.dangling_repo:
        repos[take(d.dangling_repo)] = "ghost/never-registered"
    if d.dangling_commit:
        commits[take(d.dangling_commit)] = "f" * 40
    for gi, gsize in enumerate(d.dup_groups):
        ix = take(gsize)
        repos[ix] = repos[ix[0]] if gi == len(d.dup_groups) - 1 else f"org0/repo{gi}"
        paths[ix] = f"src/dup_{gi}.py"
        commits[ix] = "c" * 39 + str(gi)

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        },
        schema=CORPUS_SCHEMA,
    )


def repo_dim(corpus: pa.Table, drop: tuple[str, ...] = ("ghost/never-registered",)) -> pa.Table:
    """Dimension table of registered repos (FK target); `drop` simulates
    unregistered repos so dangling_repo rows really dangle."""
    import pyarrow.compute as pc

    repos = pc.unique(corpus.column("repo"))
    keep = pc.invert(pc.is_in(repos, value_set=pa.array(list(drop))))
    return pa.table({"repo": pc.filter(repos, keep)})


def write_corpus_partitioned(
    table: pa.Table, out_dir: str, n_files: int, overwrite: bool = True,
    row_group_size: int = 16384,
) -> list[str]:
    """Write the corpus as n_files parquet files (partition = file; the unit of
    checkpoint/resume). Returns the file paths, lexically ordered.

    row_group_size: real lakehouse writers emit multiple row groups per file;
    a single whole-file row group is the degenerate case that caps any
    reader's intra-file split parallelism at 1 task per file."""
    import os
    import shutil

    import pyarrow.parquet as pq

    if overwrite and os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    paths = []
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    for i in range(n_files):
        p = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(
            table.slice(bounds[i], bounds[i + 1] - bounds[i]), p,
            row_group_size=row_group_size,
        )
        paths.append(p)
    return paths


def _documents_to_corpus_batch(docs: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    from fdpg_query_data_validation_ray.functions.hashing import md5_column

    doc_id = pc.cast(docs.column("doc_id"), pa.string())
    # binary_join_element_wise: last arg is the separator; scalars broadcast
    return pa.table(
        {
            "repo": pc.binary_join_element_wise("corpus", docs.column("source"), "/"),
            "path": pc.binary_join_element_wise("docs/", doc_id, ".txt", ""),
            "commit": md5_column(docs.column("text")),
            "lang": docs.column("lang").combine_chunks(),
            "content": pc.cast(docs.column("text"), pa.large_string()),
        },
        schema=CORPUS_SCHEMA,
    )


def corpus_from_documents(sf_dir: str) -> pa.Table:
    """Deterministically map the driver's documents table into the corpus
    shape (driver-side table — small inputs / tests)."""
    import pyarrow.parquet as pq

    return _documents_to_corpus_batch(pq.read_table(f"{sf_dir}/documents.parquet"))


def corpus_dataset_from_documents(sf_dir: str):
    """Streaming variant: documents.parquet → corpus-shaped `ray.data.Dataset`
    (per-batch derivation, nothing materialized at the driver)."""
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "lang", "text"],
    ).map_batches(_documents_to_corpus_batch, batch_format="pyarrow")
