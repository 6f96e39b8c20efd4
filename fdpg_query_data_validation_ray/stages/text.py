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

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from fdpg_query_data_validation_ray.functions.hashing import hash64, mix64

STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "des", "du", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "una", "un", "de", "que", "por"},
}


class LangIdStage:
    """Heuristic language ID: CJK-codepoint ratio for zh, else best
    stopword-profile hit; 'und' (undetermined) below confidence floor."""

    def __init__(self, text_column: str = "text", out_column: str = "lang_pred"):
        self.text_column = text_column
        self.out_column = out_column
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def _detect(self, t: str | None) -> str:
        if not t:
            return "und"
        if len(self.cjk_re.findall(t)) > 0.05 * max(1, len(t)):
            return "zh"
        words = self.word_re.findall(t.lower())
        if not words:
            return "und"
        best, best_score = "und", 0.0
        for lang, stops in STOPWORDS.items():
            score = sum(w in stops for w in words) / len(words)
            if score > best_score:
                best, best_score = lang, score
        return best if best_score > 0.01 else "und"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_column] = [self._detect(t) for t in batch[self.text_column]]
        return batch


TOKEN_RE = r"\s+"
# BPE-ish word/punct splitter (GPT-2-style contractions + word/number/punct runs)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-zà-ÿ]+| ?\d+| ?[^\sA-Za-zà-ÿ\d]+"


class TokenCountStage:
    """Whitespace token count + BPE-ish subword-run count, vectorized via
    pandas str.count (compiled once per actor)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.bpe = re.compile(BPE_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_column].fillna("")
        stripped = s.str.strip()
        batch["n_tokens"] = np.where(
            stripped.eq(""), 0, stripped.str.count(TOKEN_RE) + 1
        ).astype(np.int64)
        batch["n_bpe_tokens"] = s.str.count(self.bpe).astype(np.int64)
        return batch


class QualityScoreStage:
    """C4/Gopher-flavored quality features + composite score in [0, 1]:
    length, mean word length, stopword ratio, punctuation/symbol ratio,
    repetition (distinct-word ratio)."""

    def __init__(self, text_column: str = "text"):
        self.text_column = text_column
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = set().union(*STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = {k: [] for k in (
            "n_chars_q", "mean_word_len", "stopword_ratio", "punct_ratio",
            "distinct_word_ratio", "quality_score",
        )}
        for t in batch[self.text_column]:
            t = t or ""
            words = self.word_re.findall(t.lower())
            n_chars = len(t)
            mwl = float(np.mean([len(w) for w in words])) if words else 0.0
            stop_r = sum(w in self.stop for w in words) / len(words) if words else 0.0
            punct_r = len(self.punct_re.findall(t)) / n_chars if n_chars else 0.0
            distinct_r = len(set(words)) / len(words) if words else 0.0
            score = 1.0
            if not 50 <= n_chars <= 100_000:
                score *= 0.5
            if not 2.0 <= mwl <= 12.0:
                score *= 0.5
            if punct_r > 0.3:
                score *= 0.5
            if distinct_r < 0.2:
                score *= 0.5  # heavy repetition
            feats["n_chars_q"].append(n_chars)
            feats["mean_word_len"].append(round(mwl, 4))
            feats["stopword_ratio"].append(round(stop_r, 4))
            feats["punct_ratio"].append(round(punct_r, 4))
            feats["distinct_word_ratio"].append(round(distinct_r, 4))
            feats["quality_score"].append(score)
        for k, v in feats.items():
            batch[k] = v
        return batch


class FingerprintStage:
    """Winnowing fingerprint (Schleimer et al. 2003): rolling k-gram hashes,
    minimum per sliding window → a small, position-robust set of fingerprint
    hashes per document. Emits the min fingerprint (stable doc identity under
    local edits) and the fingerprint count."""

    def __init__(self, text_column: str = "text", k: int = 5, window: int = 4):
        self.text_column = text_column
        self.k = k
        self.window = window
        self.token_re = re.compile(r"\S+")

    def _fingerprints(self, t: str | None) -> np.ndarray:
        toks = self.token_re.findall(t.lower()) if t else []
        if len(toks) < self.k:
            basis = [" ".join(toks)] if toks else [""]
        else:
            basis = [" ".join(toks[i : i + self.k]) for i in range(len(toks) - self.k + 1)]
        h = hash64(np.array(basis, dtype=object))
        if len(h) <= self.window:
            return np.unique(h)
        sw = np.lib.stride_tricks.sliding_window_view(h, self.window)
        return np.unique(sw.min(axis=1))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mins, counts = [], []
        for t in batch[self.text_column]:
            fp = self._fingerprints(t)
            mins.append(int(fp.min()) if len(fp) else 0)
            counts.append(len(fp))
        batch["fingerprint_min"] = np.array(mins, dtype=np.uint64).view(np.int64)
        batch["n_fingerprints"] = np.array(counts, dtype=np.int64)
        return batch
