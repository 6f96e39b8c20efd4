"""Deterministic dataset splitting / sampling by key hash.

The training-data op every corpus pipeline needs before anything trains:
assign each row to train/val/test (or keep a p-fraction sample) so that the
assignment is (a) a pure function of the row's id — stable under re-runs,
re-partitioning, and incremental corpus growth (a doc keeps its split when
new docs arrive, unlike `ds.random_shuffle().split()`), (b) exactly
reproducible in SQL for the oracle gate.

Mechanism: `md5_low60(salt | id)` (stages/text.py — DuckDB-vectorized,
bit-identical to `md5_number_lower(s) & ((1<<60)-1)`) scaled against
cumulative fraction thresholds over 2^60. No shuffle, no state: one
`map_batches` column append; composes with any downstream stage.

Reference analog: none (the reference validates, it does not split); this is
prompt-mandated LLM-pipeline breadth alongside dedup/quality (SURVEY.md §2.6
sampling family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.stages.text import md5_low60

_SCALE = 1 << 60


def _thresholds(fractions: dict[str, float]) -> tuple[list[str], np.ndarray]:
    names = list(fractions)
    fracs = np.array([float(fractions[n]) for n in names])
    if (fracs < 0).any() or not np.isclose(fracs.sum(), 1.0, atol=1e-9):
        raise ValueError(f"fractions must be >= 0 and sum to 1: {fractions}")
    # cumulative upper bounds in hash space; the last bucket absorbs the
    # rounding remainder so every hash value lands somewhere
    cum = np.floor(np.cumsum(fracs) * _SCALE).astype(np.uint64)
    cum[-1] = _SCALE
    return names, cum


def _row_hashes(batch: pa.Table, id_column: str, salt: str) -> np.ndarray:
    ids = pc.cast(batch[id_column], pa.string()).to_pylist()
    return md5_low60([f"{salt}|{v}" for v in ids])


def assign_split(
    ds,
    id_column: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_column: str = "split",
):
    """Append `out_column` with the split name per row. `salt` derives
    independent splits from the same ids (e.g. a second holdout). Exact SQL
    equivalent (the oracle):

        CASE WHEN md5_number_lower(salt || '|' || id) & ((1<<60)-1) < t1
             THEN 'train' WHEN ... END
    """
    names, cum = _thresholds(fractions)

    def tag(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch, id_column, salt)
        ix = np.searchsorted(cum, h, side="right")
        arr = pa.array(np.array(names, dtype=object)[ix], pa.string())
        return batch.append_column(out_column, arr)

    return ds.map_batches(tag, batch_format="pyarrow")


def sample_fraction(ds, id_column: str, fraction: float, salt: str = "sample"):
    """Deterministic Bernoulli(p) row sample keyed on the id hash — the same
    rows survive on every run and on any partitioning. SQL equivalent:
    `WHERE md5_number_lower(...) & ((1<<60)-1) < floor(p * 2^60)`."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    threshold = np.uint64(int(fraction * _SCALE))

    def keep(batch: pa.Table) -> pa.Table:
        h = _row_hashes(batch, id_column, salt)
        return batch.filter(pa.array(h < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture(
    sources,
    id_column: str,
    salt: str = "mix",
    source_column: str = "source",
):
    """Weighted corpus mixture (the pretraining data-mixing op): each source
    contributes a deterministic Bernoulli(rate) sample of its rows, tagged
    with its name, and the tagged streams union into one Dataset.

    `sources` is [(name, ds, rate), ...] with rate in [0, 1]. Sampling is
    keyed on md5_low60(f"{salt}|{name}|{id}") — per-source-independent,
    stable under re-runs/repartitioning/corpus growth (same contract as
    sample_fraction), and exactly replayable in SQL (UNION ALL of
    md5-predicate selects). `Dataset.union` concatenates lazily — no
    shuffle; the streaming executor pulls blocks from each operand."""
    tagged = []
    for name, ds, rate in sources:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0, 1]: {name}={rate}")
        threshold = np.uint64(int(rate * _SCALE))

        def keep(batch: pa.Table, _n=name, _t=threshold) -> pa.Table:
            h = _row_hashes(batch, id_column, f"{salt}|{_n}")
            out = batch.filter(pa.array(h < _t))
            return out.append_column(
                source_column, pa.array([_n] * out.num_rows, pa.string())
            )

        tagged.append(ds.map_batches(keep, batch_format="pyarrow"))
    if not tagged:
        raise ValueError("mixture needs at least one source")
    out = tagged[0]
    return out.union(*tagged[1:]) if len(tagged) > 1 else out


def mixture_rules(
    ds,
    id_column: str,
    rules,
    salt: str = "mix",
    source_column: str = "source",
):
    """Single-pass weighted mixture over ONE dataset: `rules` is
    [(name, predicate, rate), ...] where predicate(batch: pa.Table) returns a
    boolean mask (pyarrow BooleanArray or numpy bool array) and None is the
    catch-all. Each row is tagged with the FIRST matching rule's name, then
    kept iff md5_low60(f"{salt}|{name}|{id}") < rate·2^60 — the per-source
    hash arithmetic is IDENTICAL to mixture()'s, so the SQL oracle (UNION ALL
    of md5-predicate selects) is unchanged, but the input is scanned ONCE
    instead of once per source (mixture() over k filtered views of the same
    read re-scans the input k times — at 100 TB that multiplies the read
    bill by k). Rows matching no rule are dropped."""
    names = []
    for name, _pred, rate in rules:
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0, 1]: {name}={rate}")
        names.append(name)
    if not rules:
        raise ValueError("mixture_rules needs at least one rule")
    thresholds = np.array(
        [np.uint64(int(rate * _SCALE)) for _, _, rate in rules], dtype=np.uint64
    )
    names_arr = np.array(names, dtype=object)

    def tag_and_keep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        rule_ix = np.full(n, -1, dtype=np.int64)
        unassigned = np.ones(n, dtype=bool)
        for i, (_name, pred, _rate) in enumerate(rules):
            if not unassigned.any():
                break
            if pred is None:
                m = unassigned.copy()
            else:
                pm = pred(batch)
                m = (
                    pm.to_numpy(zero_copy_only=False)
                    if isinstance(pm, (pa.Array, pa.ChunkedArray))
                    else np.asarray(pm, dtype=bool)
                ) & unassigned
            rule_ix[m] = i
            unassigned &= ~m
        matched = rule_ix >= 0
        ids = pc.cast(batch[id_column], pa.string()).to_pylist()
        srcs = np.where(matched, names_arr[np.maximum(rule_ix, 0)], "")
        h = md5_low60(
            [f"{salt}|{s}|{v}" for s, v in zip(srcs.tolist(), ids)]
        )
        keep = matched & (h < thresholds[np.maximum(rule_ix, 0)])
        out = batch.filter(pa.array(keep))
        return out.append_column(
            source_column, pa.array(srcs[keep].tolist(), pa.string())
        )

    return ds.map_batches(tag_and_keep, batch_format="pyarrow")


def subsample_balanced(
    ds,
    id_column: str,
    group_column: str,
    strength: float = 16.0,
    salt: str = "sub",
    group_counts: dict | None = None,
):
    """Frequency-balanced subsampling: keep each row of group g with
    probability min(1, strength / sqrt(n_g)) — the mC4/PaLM high-resource
    language downweighting and word2vec frequency-subsampling family.
    Over-represented groups shrink toward balance (expected survivors
    strength·sqrt(n_g)) while groups with n_g ≤ strength² keep every row.

    keep ⟺ float64(md5_low60(salt|id)) · sqrt(float64(n_g)) < strength·2^60.
    Every op in that predicate — int→double conversion, correctly-rounded
    sqrt, one multiply, one compare — is IEEE-bit-identical between numpy
    and DuckDB (no pow/exp, whose libm rounding differs), so the decision
    replays exactly in SQL for the oracle gate; and it is a pure function of
    (id, n_g): deterministic under re-runs and re-partitioning.

    Scale: per-group counts come from ONE bounded groupby (cardinality =
    number of groups — langs/domains/sources, not rows) and ride the task
    closure as two tiny arrays; the corpus pass itself is a single
    exchange-free map_batches filter. Pass `group_counts` to pin counts
    computed elsewhere (e.g. a frozen manifest so the keep-set is stable
    while the corpus grows); groups absent from it drop their rows.
    """
    if strength <= 0:
        raise ValueError(f"strength must be > 0: {strength}")
    if group_counts is None:
        lc = ds.groupby(group_column).count().to_pandas()
        group_counts = dict(zip(lc[group_column], lc["count()"]))
    groups_sorted = np.array(sorted(group_counts), dtype=object)
    sqrt_n = np.sqrt(
        np.array([group_counts[g] for g in groups_sorted], dtype=np.float64)
    )
    threshold = strength * float(_SCALE)

    def keep(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch[group_column].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(groups_sorted, g)
        known = (idx < len(groups_sorted)) & (
            groups_sorted[np.minimum(idx, len(groups_sorted) - 1)] == g
        )
        h = _row_hashes(batch, id_column, salt).astype(np.float64)
        m = known & (h * sqrt_n[np.minimum(idx, len(groups_sorted) - 1)] < threshold)
        return batch.filter(pa.array(m))

    return ds.map_batches(keep, batch_format="pyarrow")
