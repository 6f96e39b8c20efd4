"""Scale datapoint for the SymSpell ED<=1 fuzzy self-join
(stages/fuzzy.py): a synthetic vocabulary of random 8-16 char terms
(collision-free by construction at 26^8 density) with PLANTED
single-substitution neighbors for every 100th term. Exactness asserted two
ways: every planted pair is found (completeness — the deletion-neighborhood
theorem), and every found pair re-checks against a reference Levenshtein
(soundness of the vectorized verifier).

Usage: python tools/fuzzy_scale.py [n_terms]   # default 1,000,000
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ALPHA = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def gen(path: str, n_terms: int):
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(83)
    planted = []
    CH = 500_000
    for part, lo in enumerate(range(0, n_terms, CH)):
        n = min(CH, n_terms - lo)
        lens = rng.integers(8, 17, n)
        maxlen = 16
        mat = ALPHA[rng.integers(0, 26, (n, maxlen))]
        terms = ["".join(row[:l]) for row, l in zip(mat, lens)]
        extra = []
        for i in range(0, n, 100):
            t = terms[i]
            p = int(rng.integers(0, len(t)))
            repl = "z" if t[p] != "z" else "a"
            v = t[:p] + repl + t[p + 1 :]
            extra.append(v)
            planted.append((min(t, v), max(t, v)))
        pq.write_table(
            pa.table({"term": pa.array(terms + extra, pa.string())}),
            os.path.join(path, f"part-{part:05d}.parquet"),
        )
    return set(planted)


def main():
    n_terms = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    path = f"/tmp/fuzzy_scale_{n_terms}"
    print(f"generating {n_terms} terms at {path}", flush=True)
    planted = gen(path, n_terms)
    print(f"planted ED-1 pairs: {len(planted):,}", flush=True)

    import ray
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.fuzzy import fuzzy_pairs_ed1

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    rows = fuzzy_pairs_ed1(
        rd.read_parquet(path), "term", max_len=24
    ).take_all()
    wall = time.time() - t0
    found = {(r["w1"], r["w2"]) for r in rows}
    print(f"wall {wall:.2f}s   {n_terms / wall:,.0f} terms/s   "
          f"found {len(found):,}", flush=True)
    missing = planted - found
    assert not missing, f"completeness violated: {len(missing)} planted pairs missed"
    bad = [(a, b) for a, b in found if _lev(a, b) > 1]
    assert not bad, f"soundness violated: {bad[:5]}"
    extras = len(found) - len(planted)
    print(f"completeness: all {len(planted):,} planted pairs found; "
          f"soundness: all {len(found):,} found pairs verify at ED<=1 "
          f"({extras} random extras)", flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
