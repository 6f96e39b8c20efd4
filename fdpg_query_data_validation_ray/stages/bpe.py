"""BPE tokenizer: sample-trained merge list + distributed encode.

The tokenization leg the pair-count statistic (`stages/text.py
bpe_pair_counts`) feeds: `train_bpe` learns an ordered merge list (Sennrich
et al. 2016, "Neural Machine Translation of Rare Words with Subword Units")
and `BPEEncodeStage` applies it corpus-wide as an actor-pool map_batches
stage.

Scale posture:
  - TRAINING is sample-based by design (like PQ codebooks / k-means
    centroids — every production tokenizer trains on a bounded sample, not
    the 100 TB corpus): a deterministic `ds.limit(...)` sample feeds the
    driver trainer; the merge list is vocabulary-sized (a few kB) and
    broadcasts inside the stage constructor args.
  - ENCODING memoizes per UNIQUE word in actor state: the classic greedy
    merge loop runs once per distinct word an actor ever sees (vocabulary-
    bounded, the md5-unique-tokens precedent), then batches encode via
    vectorized gather over per-word id lists. Output is list<int64> token
    ids per doc — exactly the layout a packing stage consumes.

No SQL form exists (the merge loop is iterative/greedy), so queries over
this stage are rows-only with property tests: round-trip (joining the
encoded symbols reproduces the word), greedy-rank order on planted merges,
partition/batch invariance, and a pure-Python reference cross-check.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def train_bpe(words: list[str], counts: list[int] | None = None,
              n_merges: int = 100) -> list[tuple[str, str]]:
    """Learn an ordered BPE merge list from a word sample.

    Greedy: each round merges the most frequent adjacent symbol pair
    (count-weighted when `counts` given), ties broken lexicographically so
    training is deterministic for any input order. Words are symbol
    sequences of their characters (no end-of-word marker — GPT-style)."""
    if counts is None:
        counts = [1] * len(words)
    agg: dict[str, int] = {}
    for w, c in zip(words, counts):
        if w:
            agg[w] = agg.get(w, 0) + int(c)
    seqs: dict[str, list[str]] = {w: list(w) for w in agg}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, seq in seqs.items():
            c = agg[w]
            for a, b in zip(seq, seq[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        ab = best[0] + best[1]
        for w, seq in seqs.items():
            i, out = 0, []
            while i < len(seq):
                if (i + 1 < len(seq)
                        and seq[i] == best[0] and seq[i + 1] == best[1]):
                    out.append(ab)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seqs[w] = out
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic symbol→id map: byte-char base vocab (0..255 by code
    point for ASCII, then sorted extras) would be corpus-dependent; instead
    ids are assigned 0.. over sorted base chars seen in merges plus merge
    products in merge order — stable for a fixed merge list. Unknown chars
    at encode time get fresh ids deterministically per stage instance."""
    base = sorted({c for m in merges for c in m if len(c) == 1})
    vocab = {c: i for i, c in enumerate(base)}
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


class BPEEncodeStage:
    """Encode a text column to BPE token ids (list<int64> per doc) with a
    fixed merge list. Actor-pool stage: rank table, vocab and the per-word
    memo cache live in actor state; the greedy merge loop runs once per
    DISTINCT word across the actor's lifetime."""

    def __init__(self, text_column: str, merges: list[tuple[str, str]],
                 out_column: str = "token_ids"):
        self.text_column = text_column
        self.out_column = out_column
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.vocab = bpe_vocab([tuple(m) for m in merges])
        self.word_re = re.compile(r"\S+")
        self._memo: dict[str, list[int]] = {}

    # chars outside the trained vocab can never merge (their pairs have no
    # rank), so unknown symbols are always single chars: give them the
    # deterministic id UNK_BASE + codepoint — identical on every actor,
    # every partitioning, every run (a grow-the-dict scheme would depend on
    # arrival order and break partition invariance)
    UNK_BASE = 1_000_000

    def _sym_id(self, s: str) -> int:
        v = self.vocab.get(s)
        if v is None:
            v = self.UNK_BASE + ord(s)
            self.vocab[s] = v
        return v

    def _encode_word(self, w: str) -> list[int]:
        got = self._memo.get(w)
        if got is not None:
            return got
        seq = list(w)
        while len(seq) > 1:
            best_rank, best_i = None, -1
            for i in range(len(seq) - 1):
                r = self.ranks.get((seq[i], seq[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            seq[best_i:best_i + 2] = [seq[best_i] + seq[best_i + 1]]
        ids = [self._sym_id(s) for s in seq]
        self._memo[w] = ids
        return ids

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch.column(self.text_column).to_pandas().fillna("")
        lists = s.str.findall(self.word_re)
        enc = self._encode_word
        ids = [
            [t for w in ws for t in enc(w)] for ws in lists
        ]
        n = np.array([len(x) for x in ids], dtype=np.int64)
        return (
            batch.append_column(
                self.out_column, pa.array(ids, pa.list_(pa.int64()))
            ).append_column("n_bpe_ids", pa.array(n, pa.int64()))
        )


def decode_ids(ids: list[int], vocab: dict[str, int]) -> str:
    """Inverse of BPEEncodeStage for tests: ids → symbols, concatenated."""
    rev = {v: k for k, v in vocab.items()}
    return "".join(
        rev[i] if i in rev else chr(i - BPEEncodeStage.UNK_BASE)
        for i in ids
    )
