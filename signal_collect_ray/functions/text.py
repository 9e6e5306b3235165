"""Text analysis stages for large-scale training-data pipelines.

All stages are stateful map_batches callables (regexes/tables compiled
once per actor in ``__init__``) over a ``text`` column — the
``documents`` table shape. Vectorized where pandas/pyarrow kernels
exist; per-document work is regex/C-level.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# n-gram profiles for a tiny deterministic language-ID heuristic:
# frequent trigrams + stopwords per language (public linguistic facts).
_LANG_MARKERS = {
    "en": ["the", "and", "ing", "ion", "of", "to", "is", "that", "it"],
    "de": ["der", "die", "und", "sch", "ein", "ich", "nicht", "das", "ist"],
    "fr": ["les", "des", "ent", "que", "une", "est", "dans", "pour", "qui"],
    "es": ["que", "los", "ción", "una", "por", "con", "para", "las", "del"],
}

_STOPWORDS = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "as", "with", "was", "at", "by", "an", "be", "this", "are", "or",
}

# BPE-ish tokenizer: words, numbers, or single non-space symbols — a
# public GPT-2-style pre-tokenization pattern approximation.
_TOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_WORD_RE = re.compile(r"[A-Za-z]+")
_PUNCT_RE = re.compile(r"[^\w\s]")


class LanguageId:
    """n-gram/stopword-marker language ID → adds ``lang_pred``,
    ``lang_score`` columns. Deterministic; ties break by language order."""

    __name__ = "LanguageId"

    def __init__(self):
        self.markers = {
            lang: [re.compile(rf"(?<![a-z]){m}(?![a-z])" if len(m) > 3 else re.escape(m))
                   for m in ms]
            for lang, ms in _LANG_MARKERS.items()
        }

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        preds, scores = [], []
        for t in texts:
            tl = (t or "").lower()
            n = max(len(tl), 1)
            best_lang, best = "unknown", 0.0
            for lang, pats in self.markers.items():
                s = sum(len(p.findall(tl)) for p in pats) / n * 1000.0
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(best)
        return tbl.append_column("lang_pred", pa.array(preds, pa.string())) \
                  .append_column("lang_score", pa.array(scores, pa.float64()))


class QualityScore:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean word length, and a composite ``quality`` in [0,1]."""

    __name__ = "QualityScore"

    def __init__(self):
        self.word_re = _WORD_RE
        self.punct_re = _PUNCT_RE
        self.stop = _STOPWORDS

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        n_chars = np.empty(len(texts), dtype=np.int64)
        punct_ratio = np.empty(len(texts))
        stop_ratio = np.empty(len(texts))
        mean_wlen = np.empty(len(texts))
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            words = self.word_re.findall(t.lower())
            nw = max(len(words), 1)
            punct_ratio[i] = len(self.punct_re.findall(t)) / max(len(t), 1)
            stop_ratio[i] = sum(w in self.stop for w in words) / nw
            mean_wlen[i] = sum(map(len, words)) / nw
        quality = (
            np.clip(n_chars / 500.0, 0, 1) * 0.3
            + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.2
            + np.clip(stop_ratio * 3.0, 0, 1) * 0.3
            + np.clip(1.0 - np.abs(mean_wlen - 5.0) / 5.0, 0, 1) * 0.2
        )
        return (
            tbl.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
            .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
            .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64()))
            .append_column("mean_word_len", pa.array(mean_wlen, pa.float64()))
            .append_column("quality", pa.array(quality, pa.float64()))
        )


class TokenCount:
    """Whitespace word count + BPE-ish regex token count."""

    __name__ = "TokenCount"

    def __init__(self):
        self.tok_re = _TOKEN_RE

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
        bpe = np.array(
            [len(self.tok_re.findall(t or "")) for t in texts], dtype=np.int64
        )
        return tbl.append_column("n_words", pa.array(ws, pa.int64())) \
                  .append_column("n_tokens", pa.array(bpe, pa.int64()))


class Fingerprint:
    """Deterministic 64-bit document fingerprint: polynomial rolling hash
    of the whitespace-normalized text (stable across partitioning)."""

    __name__ = "Fingerprint"

    _MOD = (1 << 61) - 1
    _BASE = 1_000_003

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            norm = " ".join((t or "").split())
            h = 0
            for ch in norm.encode("utf-8"):
                h = (h * self._BASE + ch) % self._MOD
            out[i] = h
        return tbl.append_column("fingerprint", pa.array(out, pa.int64()))


def analyze_documents(docs_ds, concurrency=None):
    """Full text-analysis pipeline over a documents Dataset: language ID,
    quality scoring, token counting, fingerprinting — four chained
    stateful stages (actor pools when ``concurrency`` is set)."""
    stages = [LanguageId, QualityScore, TokenCount, Fingerprint]
    ds = docs_ds
    for cls in stages:
        if concurrency is None:
            ds = ds.map_batches(cls(), batch_format="pyarrow", batch_size=2048)
        else:
            ds = ds.map_batches(
                cls, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
            )
    return ds
