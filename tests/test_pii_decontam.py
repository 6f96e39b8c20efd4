"""PII redaction + benchmark decontamination stages (stages/text.py).

The redaction patterns are pinned RE2-compatible so the DuckDB
regexp_replace oracle matches byte-for-byte — the fuzz test here asserts
that engine-vs-RE2 parity directly, independent of the driver's oracle gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fdpg_query_data_validation_ray.stages.text import (
    PII_RULES,
    DecontaminateStage,
    PIIRedactStage,
    benchmark_gram_hashes,
)


def _redact(texts):
    df = pd.DataFrame({"text": texts})
    return PIIRedactStage("text")(df)


def test_pii_redact_planted_cases():
    out = _redact(
        [
            "mail bob.smith+x@sub.example.org now",
            "call +4917012345678 or +123456 too-short",
            "host 10.0.255.1 and 999.999.999.999 both match",
            "combo a@b.co +9876543 1.2.3.4",
            "clean text with no pii at all",
            None,
            "",
        ]
    )
    red = [None if pd.isna(v) else v for v in out["text_redacted"]]
    assert red == [
        "mail <EMAIL> now",
        # +123456 is 6 digits — below the 7-digit minimum, kept
        "call <PHONE> or +123456 too-short",
        # the pattern is deliberately naive: any dotted digit quad matches
        "host <IP> and <IP> both match",
        "combo <EMAIL> <PHONE> <IP>",
        "clean text with no pii at all",
        None,  # null in, null out
        "",
    ]
    assert out["n_emails"].tolist() == [1, 0, 0, 1, 0, 0, 0]
    assert out["n_phones"].tolist() == [0, 1, 0, 1, 0, 0, 0]
    assert out["n_ips"].tolist() == [0, 0, 2, 1, 0, 0, 0]


def test_pii_redact_phone_boundary():
    # 16 digits: \b fails after any 7..15-digit prefix (a digit follows), so
    # the whole run is NOT a phone — identical in Python re and RE2
    out = _redact(["+1234567890123456", "+123456789012345"])
    assert out["text_redacted"].tolist() == ["+1234567890123456", "<PHONE>"]


def test_pii_redact_matches_duckdb_re2_fuzz():
    duckdb = pytest.importorskip("duckdb")
    rng = np.random.default_rng(7)
    pieces = [
        "user@example.com", "a.b-c_d%e+f@mail.sub.domain.io", "x@y.zz",
        "+4912345678901", "+1234567", "+12345678901234567890",
        "10.1.2.3", "256.256.256.256", "1.2.3", "no-pii", "dots...",
        "@@", "a@b", "word", "42", "+", ".", "a@-.xy", "9.9.9.9.9",
        # non-ASCII adjacent to digit runs: Unicode-aware \b (no re.ASCII)
        # diverges from RE2 here — these pieces pin the ASCII compile flag
        "+1234567é", "é+1234567", "1.2.3.4é", "é10.1.2.3", "ü@ü.de",
        "+49123456789 x", "名前+7654321", "7.7.7.7☃",
    ]
    texts = [
        " ".join(rng.choice(pieces, rng.integers(0, 8)).tolist())
        for _ in range(300)
    ]
    got = _redact(texts)
    con = duckdb.connect()
    import pyarrow as pa

    con.register("t", pa.table({"text": pa.array(texts, pa.string())}))
    expr = "text"
    for _, pat, repl in PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    want = con.execute(f"SELECT {expr} AS r FROM t").df()["r"]
    assert got["text_redacted"].tolist() == want.tolist()


def _decontam(texts, bench_texts, k=3, min_hits=1):
    bench = benchmark_gram_hashes(bench_texts, k=k)
    st = DecontaminateStage(bench, text_column="text", k=k, min_hits=min_hits)
    return st(pd.DataFrame({"text": texts}))


def test_decontaminate_known_overlap():
    bench = ["alpha beta gamma delta epsilon"]
    out = _decontam(
        [
            "alpha beta gamma delta epsilon",  # identical: all 3 grams hit
            "x alpha beta gamma y",            # shares exactly one 3-gram
            "alpha beta x gamma delta",        # no contiguous 3-gram shared
            "zeta eta theta iota",             # disjoint
            "alpha beta",                      # < k tokens: no grams
            None,
        ],
        bench,
    )
    assert out["n_contaminated"].tolist() == [3, 1, 0, 0, 0, 0]
    assert out["is_contaminated"].tolist() == [True, True, False, False, False, False]
    # distinct-gram counting: a doc repeating one gram counts it once
    rep = _decontam(["alpha beta gamma alpha beta gamma alpha beta gamma"], bench)
    # grams: [abg, bga, gab] x distinct — only 'alpha beta gamma' is in bench
    assert rep["n_contaminated"].tolist() == [1]
    assert rep["n_grams_distinct"].tolist() == [3]


def test_decontaminate_min_hits_threshold():
    bench = ["a b c d e f"]
    out = _decontam(["a b c d x", "a b c d e"], bench, k=3, min_hits=2)
    # doc 0 shares grams {abc, bcd}; doc 1 shares {abc, bcd, cde}
    assert out["n_contaminated"].tolist() == [2, 3]
    assert out["is_contaminated"].tolist() == [True, True]
    out1 = _decontam(["a b c x y"], bench, k=3, min_hits=2)
    assert out1["is_contaminated"].tolist() == [False]


def test_decontaminate_bruteforce_crosscheck():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab, 20).tolist()) for _ in range(60)]
    bench_texts = docs[:5]
    out = _decontam(docs, bench_texts, k=3, min_hits=1)

    def grams(t):
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    bench_set = set().union(*(grams(b) for b in bench_texts))
    want = [len(grams(d) & bench_set) for d in docs]
    assert out["n_contaminated"].tolist() == want


def test_decontaminate_objectref_broadcast(ray_session):
    import ray

    bench = benchmark_gram_hashes(["p q r s t"], k=3)
    ref = ray.put(bench)
    st = DecontaminateStage(ref, text_column="text", k=3)
    out = st(pd.DataFrame({"text": ["p q r s", "p q r z"]}))
    assert out["n_contaminated"].tolist() == [2, 1]


def test_distributed_builders_match_driver_side(ray_session):
    """The scale-safe reference-set builders (per-batch partials → groupby)
    must be BIT-identical to the driver-side kernels they twin — counts are
    additive and distinct sets order-free, so any divergence is a bug. Run
    at a batch size that forces multiple partials per subset."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import (
        benchmark_gram_hashes_distributed,
        train_bigram_lm,
        train_bigram_lm_distributed,
    )

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 30)))
        for _ in range(500)
    ] + ["", None, "solo"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(13)

    want = train_bigram_lm(texts)
    got = train_bigram_lm_distributed(ds, "text")
    for i, (g, w) in enumerate(zip(got, want)):
        if isinstance(w, np.ndarray):
            assert np.array_equal(g, w), f"model field {i}"
        else:
            assert g == w, f"model field {i}"

    want_h = benchmark_gram_hashes(texts, k=3)
    got_h = benchmark_gram_hashes_distributed(ds, "text", k=3)
    assert np.array_equal(got_h, want_h)

    # empty reference corpus: both builders agree on the degenerate shape
    empty = ray.data.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=object)}))
    g0 = train_bigram_lm_distributed(empty, "text")
    assert g0[4] == 0 and g0[5] == 0 and len(g0[0]) == 0
    assert len(benchmark_gram_hashes_distributed(empty, "text", k=3)) == 0


def test_queries_end_to_end_vs_duckdb(ray_session):
    """Both new queries hash-exact vs their oracles at sf0.001 — the same
    compare the driver gate runs, kept in-tree as a regression guard."""
    duckdb = pytest.importorskip("duckdb")
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for name in ("redact_pii_docs", "decontaminate_docs", "pretrain_corpus"):
        got = entrymod.queries()[name](sf).to_pandas()
        keys = list(got.columns[:2])  # (doc_id[, seq_id]) identify rows
        got = got.sort_values(keys).reset_index(drop=True)
        want = (
            con.execute(entrymod.oracle_sql()[name])
            .df()
            .sort_values(keys)
            .reset_index(drop=True)[got.columns]
        )
        for c in got.columns:
            assert got[c].astype(object).tolist() == want[c].astype(object).tolist(), (
                name,
                c,
            )


def test_repetition_stage_planted():
    from fdpg_query_data_validation_ray.stages.text import RepetitionStage

    out = RepetitionStage("text")(
        pd.DataFrame(
            {
                "text": [
                    "a a a a",          # top word 4/4, dup (4-1)/4, bigram 'a a' 3/3
                    "a b c d",          # all distinct
                    "spam spam eggs spam",  # top 3/4; bigram max 1/3
                    "",                 # zero tokens
                    None,
                    "solo",             # one token, no bigrams
                ]
            }
        )
    )
    assert out["rep_top_word_e6"].tolist() == [
        1000000, 250000, 750000, 0, 0, 1000000
    ]
    assert out["dup_word_frac_e6"].tolist() == [750000, 0, 500000, 0, 0, 0]
    assert out["rep_top_bigram_e6"].tolist() == [1000000, 333333, 333333, 0, 0, 0]


def test_repetition_stage_bruteforce_crosscheck():
    from collections import Counter

    from fdpg_query_data_validation_ray.stages.text import RepetitionStage

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(6)]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 15)).tolist()) for _ in range(200)]
    out = RepetitionStage("text")(pd.DataFrame({"text": docs}))
    import math

    for i, d in enumerate(docs):
        toks = d.lower().split()
        nw = len(toks)
        wc = Counter(toks)
        bg = Counter(zip(toks, toks[1:]))
        e6 = lambda num, den: math.floor(1e6 * num / den + 0.5) if den else 0
        assert out["rep_top_word_e6"][i] == e6(max(wc.values(), default=0), nw)
        assert out["dup_word_frac_e6"][i] == e6(nw - len(wc), nw)
        assert out["rep_top_bigram_e6"][i] == e6(
            max(bg.values(), default=0), max(nw - 1, 0)
        )


def test_new_stages_batch_split_invariant():
    """PII redaction, decontamination and repetition are per-doc pure
    functions: any batch split must produce identical rows (the engine-wide
    order-insensitivity invariant, SURVEY.md §2.9)."""
    from fdpg_query_data_validation_ray.stages.text import (
        DecontaminateStage,
        PIIRedactStage,
        RepetitionStage,
        benchmark_gram_hashes,
    )

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(8)] + ["a@b.co", "+1234567", "1.2.3.4"]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 12)).tolist()) for _ in range(97)]
    df = pd.DataFrame({"text": docs})
    bench = benchmark_gram_hashes(docs[:3], k=3)

    def run(stage_factory, frame, splits):
        outs = []
        for lo, hi in splits:
            outs.append(stage_factory()(frame.iloc[lo:hi].copy().reset_index(drop=True)))
        return pd.concat(outs, ignore_index=True)

    whole_splits = [(0, 97)]
    ragged = [(0, 1), (1, 40), (40, 41), (41, 97)]
    for factory in (
        lambda: PIIRedactStage("text"),
        lambda: DecontaminateStage(bench, text_column="text", k=3),
        lambda: RepetitionStage("text"),
    ):
        a = run(factory, df, whole_splits)
        b = run(factory, df, ragged)
        pd.testing.assert_frame_equal(a, b)


def test_lm_score_bruteforce_crosscheck():
    import math

    from fdpg_query_data_validation_ray.stages.text import (
        LMScoreStage,
        train_bigram_lm,
    )

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(10)]
    train = [" ".join(rng.choice(vocab, 25).tolist()) for _ in range(8)]
    score = [" ".join(rng.choice(vocab + ["oov1", "oov2"], rng.integers(0, 12)).tolist()) for _ in range(80)]
    score += ["", "solo", None, train[0]]

    model = train_bigram_lm(train)
    out = LMScoreStage(model, text_column="text")(pd.DataFrame({"text": score}))

    from collections import Counter

    uni = Counter()
    bi = Counter()
    for t in train:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    N, V = sum(uni.values()), len(uni)

    for i, t in enumerate(score):
        toks = (t or "").lower().split()
        grams = list(zip(toks, toks[1:]))
        want_n = max(len(toks) - 1, 0)
        want_sum = 0
        for a, b in grams:
            p_bi = bi.get((a, b), 0) / uni[a] if uni.get(a, 0) > 0 else 0.0
            p = 0.75 * p_bi + 0.25 * ((uni.get(b, 0) + 1) / (N + V))
            want_sum += math.floor(1e6 * -math.log(p) + 0.5)
        assert out["n_bigrams"][i] == want_n, (i, t)
        assert out["nll_e6_sum"][i] == want_sum, (i, t)

    # the training doc itself must score lower (per gram) than OOV-heavy docs
    in_dist = out.iloc[len(score) - 1]
    assert in_dist["nll_e6_sum"] / max(in_dist["n_bigrams"], 1) < 1e6 * math.log(N + V)


def test_embedding_centroid_sums_ragged_and_null(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.similarity import (
        embedding_centroid_sums,
    )

    t = pa.table(
        {
            "label": pa.array([0, 0, 1, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 2.0], [3.0], [0.5, -0.5, 2.25], None],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        embedding_centroid_sums(rd.from_arrow(t), "embedding", "label")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    # label 0: dim1 = 1e6+3e6 (2 vecs), dim2 = 2e6 (1 vec);
    # label 1: the null row contributes nothing
    assert out.to_records(index=False).tolist() == [
        (0, 1, 4_000_000, 2),
        (0, 2, 2_000_000, 1),
        (1, 1, 500_000, 1),
        (1, 2, -500_000, 1),
        (1, 3, 2_250_000, 1),
    ]


def test_global_rank_matches_row_number(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.topk import global_rank

    rng = np.random.default_rng(31)
    keys = rng.integers(0, 12, 200)  # heavy ties
    ids = rng.permutation(200).astype(np.int64)
    t = pa.table({"k": pa.array(keys, pa.int64()), "id": pa.array(ids)})
    for desc in (True, False):
        out = (
            global_rank(rd.from_arrow(t), "k", "id", descending=desc)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        df = pd.DataFrame({"k": keys, "id": ids}).sort_values(
            ["k", "id"], ascending=[not desc, True]
        )
        df["rank"] = np.arange(1, len(df) + 1)
        want = df.sort_values("id").reset_index(drop=True)
        assert out["rank"].tolist() == want["rank"].tolist(), desc

    # null keys excluded, ranks stay dense over the survivors
    t2 = pa.table(
        {"k": pa.array([5, None, 3, 5], pa.int64()),
         "id": pa.array([1, 2, 3, 4], pa.int64())}
    )
    out2 = (
        global_rank(rd.from_arrow(t2), "k", "id")
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert out2["id"].tolist() == [1, 4, 3]
    assert out2["rank"].tolist() == [1, 2, 3]


def test_sample_n_per_lang_growth_stability(ray_session):
    """Adding new docs must never evict a sampled doc unless the newcomer's
    own hash ranks inside the top-n — the property that makes hash-order
    stratified sampling safe on a growing corpus."""
    import pyarrow as pa
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key
    from fdpg_query_data_validation_ray.stages.split import _row_hashes

    def sample(ids):
        t = pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "lang": pa.array(["en"] * len(ids))}
        )
        h = _row_hashes(t, "doc_id", "strat").astype(np.int64)
        ds = rd.from_arrow(t.append_column("h", pa.array(h, pa.int64())))
        out = first_n_per_key(ds, 5, "lang", ["h", "doc_id"], rank_column="rank")
        return set(out.to_pandas()["doc_id"])

    base = list(range(100))
    s1 = sample(base)
    s2 = sample(base + list(range(100, 140)))
    # the old sample can only shrink by members displaced by new top-5 hashes
    assert s1 & s2 == s2 - set(range(100, 140)) or (s2 - s1) <= set(range(100, 140))
    assert len(s2) == 5 and len(s1) == 5
    # determinism: same input, same sample
    assert sample(base) == s1


def test_pretrain_fuzzy_crosscheck(ray_session):
    """pretrain_corpus_fuzzy has no SQL oracle (LSH + connected components);
    its correctness contract vs the exact-dedup variant: (a) the fuzzy
    keep-set is a SUBSET of the exact keep-set (exact duplicates have
    jaccard 1.0, so every exact loser is a fuzzy loser), and (b) every doc
    the fuzzy variant drops BEYOND exact dedup is a verified near-dup —
    3-gram jaccard >= the 0.7 threshold with some other pre-dedup survivor."""
    import ray

    from fdpg_query_data_validation_ray.pipelines.queries import QUERIES
    from fdpg_query_data_validation_ray.stages.text import (
        LangIdStage,
        NormalizeTextStage,
        RepetitionStage,
    )

    sf = "/root/testdata/sf0.001"
    exact = QUERIES["pretrain_corpus"](sf).to_pandas()
    fuzzy = QUERIES["pretrain_corpus_fuzzy"](sf).to_pandas()
    kept_e, kept_f = set(exact["doc_id"]), set(fuzzy["doc_id"])
    assert kept_f <= kept_e
    extra_dropped = kept_e - kept_f

    # rebuild the pre-dedup survivor corpus with the same stages
    import pyarrow as pa
    import pyarrow.compute as pc

    t = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).take_all()
    df = pd.DataFrame(t)
    tb = pa.Table.from_pandas(df)
    tb = NormalizeTextStage("text")(tb)
    tb = LangIdStage("text")(tb)
    tb = tb.filter(pc.equal(tb["lang_pred"], "en"))
    tb = RepetitionStage("text_norm")(tb)
    tb = tb.filter(pc.less_equal(tb["rep_top_word_e6"], 160000))
    survivors = tb.select(["doc_id", "text_norm"]).to_pandas()

    def grams(s):
        toks = s.lower().split()
        return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

    gmap = {r.doc_id: grams(r.text_norm) for r in survivors.itertuples()}
    for d in extra_dropped:
        g = gmap[d]
        best = max(
            (len(g & go) / max(1, len(g | go)))
            for o, go in gmap.items()
            if o != d
        )
        assert best >= 0.7, (d, best)


def test_dual_format_stage_equivalence():
    """Every dual-format text stage must produce IDENTICAL values whether it
    receives a pa.Table (Arrow-native path: only the text column converts)
    or a pd.DataFrame (legacy path) — the round-5 Arrow-native refactor's
    contract. Includes nulls, empties and PII-bearing strings."""
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.text import (
        DecontaminateStage,
        LangIdStage,
        LMScoreStage,
        PIIRedactStage,
        QualityScoreStage,
        RepetitionStage,
        TokenCountStage,
        benchmark_gram_hashes,
        train_bigram_lm,
    )

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(10)] + [
        "a@b.co", "+1234567", "1.2.3.4", "the", "and", "der", "die"
    ]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 15)).tolist())
            for _ in range(80)] + ["", None]
    df = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    tb = pa.Table.from_pandas(df)
    bench = benchmark_gram_hashes([d for d in docs if d][:3], k=3)
    model = train_bigram_lm([d for d in docs if d][:10])

    stages = [
        LangIdStage("text"),
        TokenCountStage("text"),
        QualityScoreStage("text"),
        PIIRedactStage("text"),
        RepetitionStage("text"),
        DecontaminateStage(bench, text_column="text", k=3),
        LMScoreStage(model, text_column="text"),
    ]
    for st in stages:
        out_pd = st(df.copy())
        out_pa = st(tb)
        assert isinstance(out_pa, pa.Table), type(st).__name__
        got = out_pa.to_pandas()
        for c in out_pd.columns:
            a = [None if pd.isna(v) else v for v in out_pd[c]]
            b = [None if pd.isna(v) else v for v in got[c]]
            assert a == b, (type(st).__name__, c)

    # empty batches agree on shape/columns in both formats
    for st in stages:
        e_pd = st(df.iloc[0:0].copy())
        e_pa = st(tb.slice(0, 0))
        assert list(e_pd.columns) == list(e_pa.column_names), type(st).__name__
        assert e_pa.num_rows == 0 and len(e_pd) == 0


def test_span_dedup_planted(ray_session):
    """span_dedup (C4 §2.2 duplicate-span removal): planted duplicate
    3-token spans across docs and within one doc; first (doc_id, span_idx)
    occurrence survives, later ones are cut; tail tokens (<k) always kept;
    repartitioning must not change anything (winner pick is a global
    groupby)."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import span_dedup

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "a b c d e f g",        # spans: [a b c], [d e f]; tail g
                "x y z a b c",          # [x y z], [a b c] <- dup of doc1 span0
                "a b c a b c tail",     # two identical spans in ONE doc
                "unique words only here",
                None,
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(3)
    out = (
        span_dedup(ds, k=3).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_spans"].tolist() == [2, 2, 2, 1, 0]
    # doc1 keeps everything (first occurrence of 'a b c'); doc2 loses its
    # second span; doc3's FIRST 'a b c' already lost to doc1, and its second
    # is a dup of its first -> both cut
    assert out["n_spans_removed"].tolist() == [0, 1, 2, 0, 0]
    assert out["text_clean"].tolist() == [
        "a b c d e f g",
        "x y z",
        "tail",
        "unique words only here",
        "",
    ]


@pytest.mark.parametrize("sieve,attach", [
    ("sieve", "broadcast"),   # the small-scale fast path
    ("sieve", "join"),        # join re-attach (beyond-budget fallback)
    ("shuffle", "broadcast"), # salted-shuffle sieve (the 100-TB pass-1 path)
    ("shuffle", "join"),      # full scale posture: nothing O(rows) at driver
])
def test_span_dedup_mode_matrix(ray_session, monkeypatch, sieve, attach):
    """All four (sieve x attach) strategy combinations must produce the
    byte-identical result — the env overrides force each path on a corpus
    small enough that auto-resolution would always pick sieve+broadcast."""
    import ray

    from fdpg_query_data_validation_ray.stages.text import span_dedup

    monkeypatch.setenv("QDV_SIEVE_MODE", sieve)
    monkeypatch.setenv("QDV_SPAN_ATTACH", attach)
    rng = np.random.default_rng(3)
    words = np.array([f"w{i}" for i in range(40)], dtype=object)
    texts = [" ".join(words[rng.integers(0, 40, 12)]) for _ in range(300)]
    texts[7] = texts[3]                    # whole-doc duplicate
    texts[25] = texts[11] + " zz qq"       # shared prefix spans + unique tail
    docs = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                         "text": texts})
    ds = ray.data.from_pandas(docs).repartition(5)
    out = (
        span_dedup(ds, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.delenv("QDV_SIEVE_MODE")
    monkeypatch.delenv("QDV_SPAN_ATTACH")
    expected = (
        span_dedup(ray.data.from_pandas(docs).repartition(2), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, expected)
    assert out["n_spans_removed"].sum() > 0  # the planted dups actually fired


def test_entropy_stage_planted_and_bruteforce():
    import math
    from collections import Counter

    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.text import UnigramEntropyStage

    def lnq(x):
        return int(math.floor(math.log(x) * 1e6 + 0.5))

    docs = ["a a a a", "a b c d", "spam spam eggs spam", "", None, "solo",
            "A a B b"]  # lowercased before counting
    out = UnigramEntropyStage("text")(pd.DataFrame({"text": docs}))
    for i, d in enumerate(docs):
        toks = (d or "").lower().split()
        n = len(toks)
        want = 0
        if n:
            want = n * lnq(n) - sum(c * lnq(c) for c in Counter(toks).values())
        assert int(out["n_tokens"][i]) == n
        assert int(out["ent_num_e6"][i]) == want, d
    # uniform docs: entropy == 0 exactly; 4 distinct: ent = n*lnq(n)
    assert int(out["ent_num_e6"][0]) == 0
    assert int(out["ent_num_e6"][1]) == 4 * lnq(4)
    # case folding merges A/a
    assert int(out["ent_num_e6"][6]) == 4 * lnq(4) - 2 * (2 * lnq(2))

    # dual format: pa.Table in == pandas in
    out2 = UnigramEntropyStage("text")(pa.table({"text": pa.array(docs)}))
    assert out2["ent_num_e6"].to_pylist() == [int(v) for v in out["ent_num_e6"]]


def test_entropy_stage_batch_split_invariance():
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.text import UnigramEntropyStage

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(9)]
    docs = [" ".join(rng.choice(vocab, rng.integers(0, 30)).tolist())
            for _ in range(300)]
    st = UnigramEntropyStage("text")
    whole = st(pa.table({"text": pa.array(docs)}))
    parts = [st(pa.table({"text": pa.array(docs[i:i + 37])}))
             for i in range(0, 300, 37)]
    merged = pa.concat_tables(parts)
    assert whole["ent_num_e6"].to_pylist() == merged["ent_num_e6"].to_pylist()
    assert whole["n_tokens"].to_pylist() == merged["n_tokens"].to_pylist()


def test_truncate_tokens_stage_edges():
    import pyarrow as pa

    from fdpg_query_data_validation_ray.stages.text import TruncateTokensStage

    docs = ["a b c d e", "one  two\tthree\n", "", None, "   ", "solo",
            "x " * 100]
    out = TruncateTokensStage("text", 3)(pa.table({"text": pa.array(docs)}))
    assert out["text_trunc"].to_pylist() == [
        "a b c", "one two three", "", "", "", "solo", "x x x"]
    assert out["n_tokens"].to_pylist() == [5, 3, 0, 0, 0, 1, 100]
    assert out["was_truncated"].to_pylist() == [
        True, False, False, False, False, False, True]
    # untruncated docs round-trip to the single-space-joined token stream
    keep = TruncateTokensStage("text", 1000)(
        pa.table({"text": pa.array(docs)}))
    assert keep["text_trunc"].to_pylist()[1] == "one two three"
    assert keep["was_truncated"].to_pylist() == [False] * 7
