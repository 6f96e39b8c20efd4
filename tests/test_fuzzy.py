"""SymSpell ED ≤ 1 fuzzy join (stages/fuzzy.py): exact-kernel parity with a
reference Levenshtein, bucket-join completeness/soundness on adversarial
cases (transpositions share variants but are ED 2), length cap, unicode."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from fdpg_query_data_validation_ray.stages.fuzzy import _ed1_exact


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "cat", "cats", "bat", "bats", "cast", "act", "tac", "ab", "ba", "a",
    "b", "", "abc", "acb", "abcd", "xabc", "abcx", "hello", "hallo",
    "hell", "shell", "héllo", "hêllo", "identical", "identical2",
]


def test_kernel_matches_reference_levenshtein():
    pairs = [
        (a, b)
        for a, b in itertools.combinations(sorted(set(WORDS)), 2)
        if abs(len(a) - len(b)) <= 1
    ]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = _ed1_exact(a, b, 32)
    want = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()


def _run(values, **kw):
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.fuzzy import fuzzy_pairs_ed1

    t = pa.table({"v": pa.array(values, pa.string())})
    ds = rd.from_arrow(t).repartition(3)
    rows = fuzzy_pairs_ed1(ds, "v", **kw).take_all()
    return {(r["w1"], r["w2"]) for r in rows}


def _brute(values, max_len=32):
    vs = sorted({v for v in values if v is not None and len(v) <= max_len})
    return {
        (a, b)
        for a, b in itertools.combinations(vs, 2)
        if _lev(a, b) <= 1
    }


def test_join_matches_brute_force(ray_session):
    vals = WORDS + WORDS[:5] + [None]  # duplicates + nulls collapse
    assert _run(vals) == _brute(vals)


def test_transposition_is_not_ed1(ray_session):
    # "ab"/"ba" share deletion variants {a, b} — the verifier must cut them
    out = _run(["ab", "ba"])
    assert out == set()


def test_max_len_excludes_long_terms(ray_session):
    vals = ["x" * 40, "x" * 39, "short", "shirt"]
    assert _run(vals, max_len=32) == {("shirt", "short")}


def test_partition_invariance(ray_session):
    import ray.data as rd

    assert _run(WORDS, num_partitions=2) == _run(WORDS, num_partitions=16)
