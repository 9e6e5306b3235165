"""Text analysis stages for large-scale training-data pipelines.

All stages are stateful map_batches callables (regexes/tables compiled
once per actor in ``__init__``) over a ``text`` column — the
``documents`` table shape. Vectorized where pandas/pyarrow kernels
exist; per-document work is regex/C-level.
"""

from __future__ import annotations

import hashlib
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
# RE2-exact \S+: RE2's \s is the ASCII set [\t\n\f\r ] only, while
# Python's str.split() (and even re.ASCII \s, which adds \v) split on
# more — NBSP / vertical-tab documents would diverge from the DuckDB
# oracles otherwise
_RE2_NONSPACE_RE = re.compile(r"[^ \t\n\f\r]+")
_WORD_RE = re.compile(r"[A-Za-z]+")
_PUNCT_RE = re.compile(r"[^\w\s]")


class LanguageId:
    """n-gram/stopword-marker language ID → adds ``lang_pred``,
    ``lang_score`` columns. Deterministic; ties break by language order.

    Scoring is plain (non-overlapping) substring counts of each marker
    in the lowercased text, per 1000 chars — 36 ``pc.count_substring``
    Arrow kernel calls per BATCH (not per document), and exactly
    mirrorable in ANSI SQL via
    ``(length(t) - length(replace(t, m, ''))) / length(m)``."""

    __name__ = "LanguageId"

    def __init__(self):
        self.langs = list(_LANG_MARKERS)
        self.marker_lists = [_LANG_MARKERS[lang] for lang in self.langs]

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = tbl.column("text").combine_chunks()
        lowered = pc.utf8_lower(pc.fill_null(col, ""))
        n_docs = len(lowered)
        lens = np.maximum(
            pc.utf8_length(lowered).to_numpy(zero_copy_only=False), 1
        )
        counts = np.zeros((n_docs, len(self.langs)), dtype=np.int64)
        for j, ms in enumerate(self.marker_lists):
            for m in ms:
                # non-overlapping occurrences, same as Python str.count
                counts[:, j] += pc.count_substring(lowered, m).to_numpy(
                    zero_copy_only=False
                )
        scores = counts / lens[:, None] * 1000.0
        # first max in language order wins (strict > over a 0.0 start:
        # an all-zero row is 'unknown')
        best = np.argmax(scores, axis=1)
        best_score = scores[np.arange(n_docs), best]
        lang_arr = np.array(self.langs, dtype=object)
        preds = [
            lang_arr[b] if s > 0 else "unknown"
            for b, s in zip(best, best_score)
        ]
        return tbl.append_column("lang_pred", pa.array(preds, pa.string())) \
                  .append_column("lang_score", pa.array(best_score, pa.float64()))


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
    """Deterministic 128-bit document fingerprint: md5 hex digest of the
    whitespace-normalized text (stable across partitioning). One C-level
    hash call per document, and exactly mirrorable in SQL as
    ``md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""

    __name__ = "Fingerprint"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        out = [
            hashlib.md5(" ".join((t or "").split()).encode("utf-8")).hexdigest()
            for t in tbl.column("text").to_pylist()
        ]
        return tbl.append_column("fingerprint", pa.array(out, pa.string()))


class ChunkDocuments:
    """Sliding-window document chunking — the sequence-prep step of a
    training-data pipeline (fixed context windows with overlap). A
    flat-map batch stage: each document yields

        ceil(max(n_words − size, 0) / stride) + 1

    chunks of up to ``size`` whitespace words starting every ``stride``
    words (the final window is the first one reaching the document
    end — no trailing sub-stride fragments); empty documents yield no
    rows. Output: ``doc_id, chunk_id, chunk_words, chunk_text``
    (words rejoined with single spaces, so chunk boundaries are stable
    however the source was whitespace-formatted). Exact SQL mirror via
    1-based end-inclusive list slicing ``w[c*stride+1 : c*stride+size]``.

    At 100 TB this is shape-changing but shuffle-free: one pass, output
    rows stay in the producing block, row count grows ~size/stride ×.
    """

    __name__ = "ChunkDocuments"

    def __init__(self, size: int = 64, stride: int = 48):
        if size < 1 or stride < 1:
            raise ValueError("size and stride must be >= 1")
        self.size, self.stride = size, stride

    def __call__(self, tbl: pa.Table) -> pa.Table:
        doc_ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        texts = tbl.column("text").to_pylist()
        out_doc, out_cid, out_nw, out_txt = [], [], [], []
        size, stride = self.size, self.stride
        for did, t in zip(doc_ids, texts):
            words = (t or "").split()
            nw = len(words)
            if nw == 0:
                continue
            c = 0
            start = 0
            while True:
                chunk = words[start : start + size]
                out_doc.append(did)
                out_cid.append(c)
                out_nw.append(len(chunk))
                out_txt.append(" ".join(chunk))
                if start + size >= nw:
                    break
                c += 1
                start += stride
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "chunk_words": pa.array(out_nw, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
            }
        )


class RepetitionScore:
    """Gopher-style repetition signals (Rae et al. 2021, public): the
    dominant text-quality filters for web-corpus curation. Per document,
    over lowercased whitespace words:

    * ``dup_word_frac``   = 1 − distinct words / words
    * ``top_word_frac``   = occurrences of the most frequent word / words
    * ``top_bigram_frac`` = occurrences of the most frequent adjacent
      word pair / total pairs

    All 0.0 for empty documents (and ``top_bigram_frac`` 0.0 for
    single-word ones). Rounded to 6 digits to match the SQL mirror
    (split → unnest → group counts). Counter work is C-level dict ops;
    no per-character Python."""

    __name__ = "RepetitionScore"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from collections import Counter

        texts = tbl.column("text").to_pylist()
        n = len(texts)
        dupw = np.zeros(n)
        topw = np.zeros(n)
        topb = np.zeros(n)
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            nw = len(words)
            if nw:
                wc = Counter(words)
                dupw[i] = 1.0 - len(wc) / nw
                topw[i] = max(wc.values()) / nw
            if nw >= 2:
                bc = Counter(zip(words, words[1:]))
                topb[i] = max(bc.values()) / (nw - 1)
        return (
            tbl.append_column("dup_word_frac", pa.array(np.round(dupw, 6)))
            .append_column("top_word_frac", pa.array(np.round(topw, 6)))
            .append_column("top_bigram_frac", pa.array(np.round(topb, 6)))
        )


class EntropyScore:
    """Unigram word entropy per document (bits) — low entropy flags
    machine-generated / keyword-stuffed / repetitive text that length
    and punctuation heuristics miss (standard web-corpus curation
    signal alongside the Gopher repetition fractions).

    H = −Σ p·log2(p) over the lowercased whitespace word distribution;
    0.0 for empty documents. Rounded to 6 digits (ulp-absorbing, same
    convention as every float mirror)."""

    __name__ = "EntropyScore"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from collections import Counter

        texts = tbl.column("text").to_pylist()
        ent = np.zeros(len(texts))
        for i, t in enumerate(texts):
            words = (t or "").lower().split()
            if words:
                c = np.fromiter(
                    Counter(words).values(), dtype=np.float64
                )
                p = c / len(words)
                ent[i] = -(p * np.log2(p)).sum()
        return tbl.append_column(
            "word_entropy", pa.array(np.round(ent, 6), pa.float64())
        )


# PII patterns — deliberately restricted to syntax with identical
# semantics in Python re and RE2 (DuckDB regexp_*): no lookaround, no
# backreferences, ASCII \b word boundaries, greedy quantifiers only —
# so the SQL oracle is an exact mirror, not an approximation.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


class PiiScrub:
    """PII detection + redaction over a ``text`` column — the curation
    stage every web-scale training corpus runs before release (emails,
    phone numbers, IP addresses → typed placeholder tokens).

    Adds ``n_emails``/``n_ips``/``n_phones`` (non-overlapping match
    counts on the ORIGINAL text) and ``scrubbed`` (redaction applied
    email → ip → phone, so an address embedded in an already-replaced
    span is not double-counted). Regexes compile once per actor;
    per-doc work is three C-level scans. Exact SQL mirror:
    ``length(regexp_extract_all(t, pat))`` + chained
    ``regexp_replace(..., 'g')``.
    """

    __name__ = "PiiScrub"

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.email = re.compile(PII_EMAIL)
        self.ipv4 = re.compile(PII_IPV4)
        self.phone = re.compile(PII_PHONE)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column(self.text_col).to_pylist()
        n = len(texts)
        n_em = np.empty(n, dtype=np.int64)
        n_ip = np.empty(n, dtype=np.int64)
        n_ph = np.empty(n, dtype=np.int64)
        scrubbed = []
        for i, t in enumerate(texts):
            t = t or ""
            n_em[i] = len(self.email.findall(t))
            n_ip[i] = len(self.ipv4.findall(t))
            n_ph[i] = len(self.phone.findall(t))
            s = self.email.sub("<EMAIL>", t)
            s = self.ipv4.sub("<IP>", s)
            s = self.phone.sub("<PHONE>", s)
            scrubbed.append(s)
        return (
            tbl.append_column("n_emails", pa.array(n_em, pa.int64()))
            .append_column("n_ips", pa.array(n_ip, pa.int64()))
            .append_column("n_phones", pa.array(n_ph, pa.int64()))
            .append_column("scrubbed", pa.array(scrubbed, pa.string()))
        )


def _strip_schema_metadata(tbl: pa.Table) -> pa.Table:
    """Drop pandas-writer schema metadata: pyarrow 16's Schema.__hash__
    chokes on it (unhashable dict), making Ray Data's block-unify log
    'Failed to hash the schemas' per batch — real log cost at 10^9
    batches. The metadata carries nothing the pipeline uses."""
    return tbl.replace_schema_metadata(None)


class _TfExplode:
    """documents → one row per (doc_id, word) with its in-doc term
    frequency. Words = whitespace split of the lowered text (the same
    tokenization as RepetitionScore, SQL-mirrorable via
    regexp_split_to_array)."""

    __name__ = "_TfExplode"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from collections import Counter

        texts = tbl.column("text").to_pylist()
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_w, out_tf = [], [], []
        for i, t in enumerate(texts):
            wc = Counter((t or "").lower().split())
            out_id.extend([int(ids[i])] * len(wc))
            out_w.extend(wc.keys())
            out_tf.extend(wc.values())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "word": pa.array(out_w, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )


class _DfAnnotate:
    """Per word group: document frequency = group size (each (doc,word)
    row is unique), annotated onto every row."""

    __name__ = "_DfAnnotate"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "df", pa.array(np.full(tbl.num_rows, tbl.num_rows), pa.int64())
        )


def tfidf_top_terms(docs_ds, k: int = 5, n_docs: int | None = None):
    """Top-k terms per document by tf-idf (tf · ln(N/df)) — the
    inverted-index scoring primitive for keyword extraction and search
    indexing over a web corpus.

    Exactly two shuffles: groupby(word) computes df WITHIN the same
    exchange that co-locates the postings (no separate df table, no
    join), then grouped_top_k's per-block partial top-k bounds the
    groupby(doc_id) shuffle to k rows per doc per block. ``n_docs``
    defaults to ``docs_ds.count()`` (metadata-only on Parquet reads).
    Known skew: a stopword's posting group holds one row per containing
    document — at extreme corpus sizes pre-drop a stopword list or
    df-cap the groups the way ngram_jaccard_pairs caps posting lists.
    Scores round to 6 digits (ulp-absorbing, same convention as every
    float mirror here); ties break by word ascending."""
    from signal_collect_ray.functions.aggregations import grouped_top_k

    n = float(n_docs if n_docs is not None else docs_ds.count())
    tf = docs_ds.map_batches(_TfExplode(), batch_format="pyarrow", batch_size=2048)
    wf = tf.groupby("word").map_groups(_DfAnnotate(), batch_format="pyarrow")

    def score(tbl: pa.Table) -> pa.Table:
        tfv = tbl.column("tf").to_numpy(zero_copy_only=False)
        dfv = tbl.column("df").to_numpy(zero_copy_only=False)
        s = np.round(tfv * np.log(n / dfv), 6)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "word": tbl.column("word"),
                "tfidf": pa.array(s, pa.float64()),
            }
        )

    scored = wf.map_batches(score, batch_format="pyarrow")
    return grouped_top_k(scored, "doc_id", "tfidf", "word", k, descending=True)


def top_bigrams(docs_ds, k: int = 20):
    """Global top-k adjacent word pairs (collocations) across the
    corpus — the n-gram LM counting primitive. Per-block Counter
    pre-combine → one groupby(bigram) sum → global top-k via
    grouped_top_k with a constant group (per-block prune bounds the
    final sort to k rows per block). Ties break by bigram ascending."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from signal_collect_ray.functions.aggregations import grouped_top_k

    def explode(tbl: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            words = (t or "").lower().split()
            c.update(zip(words, words[1:]))
        bgs = [f"{a} {b}" for a, b in c.keys()]
        return pa.table(
            {
                "bg": pa.array(bgs, pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(explode, batch_format="pyarrow", batch_size=2048)
        .groupby("bg")
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def tag(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "g", pa.array(np.zeros(tbl.num_rows, np.int64), pa.int64())
        )

    top = grouped_top_k(
        counts.map_batches(tag, batch_format="pyarrow"), "g", "n", "bg", k
    )
    return top.drop_columns(["g"])


# Vocabulary-size ceiling for the broadcast scoring path. Web-corpus
# unigram vocabularies are heavy-tailed but bounded (~10^7-10^8 distinct
# words at CC scale after lowercasing); above the cap the postings
# exchange scores without any driver materialization.
UNIGRAM_BROADCAST_LIMIT = 4_000_000


def unigram_logprob(docs_ds, max_broadcast_vocab: int = UNIGRAM_BROADCAST_LIMIT):
    """CCNet-style language-model quality signal: per-document mean log
    corpus-unigram probability (the cheap stand-in for the reference-LM
    perplexity filter used to rank web text for training corpora).

    Phase 1 — build the LM: per-block ``Counter`` pre-combine →
    ONE ``groupby(word).sum`` exchange = the corpus unigram counts;
    total token count N comes from the same small counts table
    (``sum('n')``), not a second pass over the documents.

    Phase 2 — score: when the vocabulary fits (≤ ``max_broadcast_vocab``
    rows) the {word → ln(count)} map is broadcast ONCE via ``ray.put``
    and every batch scores its documents with C-level dict lookups — no
    second shuffle. A larger vocabulary falls back to the postings
    exchange (the ``tfidf_top_terms`` trick): explode (doc_id, word,
    tf), annotate the corpus count INSIDE ``groupby(word)`` — Σ tf per
    group IS the count, no join — then ``groupby(doc_id)`` computes the
    tf-weighted mean. Either way the score is

        logprob = (1/n_words) · Σ_w ln(c(w) / N)

    over the lowercased whitespace words of the document (the same
    tokenization as EntropyScore/RepetitionScore), 0.0 for empty
    documents, rounded to 6 digits (ulp-absorbing float-mirror
    convention). Words absent from the model (only possible when
    scoring documents the model was not built from) use count 1.

    Returns a Dataset of (doc_id, n_words, logprob)."""
    import ray
    from ray.data.aggregate import Sum

    def explode_counts(tbl: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            c.update((t or "").lower().split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        docs_ds.map_batches(
            explode_counts, batch_format="pyarrow", batch_size=2048
        )
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="n"))
        .materialize()
    )
    n_total = float(counts.sum("n") or 1.0)
    vocab_rows = counts.count()

    if vocab_rows <= max_broadcast_vocab:
        lnc = {}
        for b in counts.iter_batches(batch_format="pyarrow", batch_size=None):
            words = b.column("word").to_pylist()
            ns = np.log(b.column("n").to_numpy(zero_copy_only=False))
            lnc.update(zip(words, ns))
        ref = ray.put(lnc)
        ln_n = np.log(n_total)

        def score(tbl: pa.Table) -> pa.Table:
            m = ray.get(ref)
            texts = tbl.column("text").to_pylist()
            nw = np.zeros(len(texts), dtype=np.int64)
            lp = np.zeros(len(texts))
            for i, t in enumerate(texts):
                ws = (t or "").lower().split()
                if ws:
                    nw[i] = len(ws)
                    lp[i] = sum(m.get(w, 0.0) for w in ws) / len(ws) - ln_n
            return pa.table(
                {
                    "doc_id": tbl.column("doc_id"),
                    "n_words": pa.array(nw, pa.int64()),
                    "logprob": pa.array(np.round(lp, 6), pa.float64()),
                }
            )

        return docs_ds.map_batches(score, batch_format="pyarrow", batch_size=2048)

    # postings-exchange fallback: no driver-side vocabulary at all
    def annotate(tbl: pa.Table) -> pa.Table:
        tf = tbl.column("tf").to_numpy(zero_copy_only=False)
        c = float(tf.sum())
        return tbl.append_column(
            "lnc", pa.array(np.full(tbl.num_rows, np.log(c)), pa.float64())
        )

    tf = docs_ds.map_batches(_TfExplode(), batch_format="pyarrow", batch_size=2048)
    wf = tf.groupby("word").map_groups(annotate, batch_format="pyarrow")

    def partial(tbl: pa.Table) -> pa.Table:
        # per-block partial (Σ tf·lnc, Σ tf) per doc bounds the doc shuffle
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        tfv = tbl.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        lnc = tbl.column("lnc").to_numpy(zero_copy_only=False)
        uid, inv = np.unique(ids, return_inverse=True)
        s = np.zeros(len(uid))
        w = np.zeros(len(uid))
        np.add.at(s, inv, tfv * lnc)
        np.add.at(w, inv, tfv)
        return pa.table(
            {
                "doc_id": pa.array(uid, pa.int64()),
                "s": pa.array(s, pa.float64()),
                "w": pa.array(w, pa.float64()),
            }
        )

    ln_n = np.log(n_total)

    def finish(tbl: pa.Table) -> pa.Table:
        s = tbl.column("sum(s)").to_numpy(zero_copy_only=False)
        w = tbl.column("sum(w)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_words": pa.array(w.astype(np.int64), pa.int64()),
                "logprob": pa.array(np.round(s / w - ln_n, 6), pa.float64()),
            }
        )

    agg = (
        wf.map_batches(partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s"), Sum("w"))
        .map_batches(finish, batch_format="pyarrow")
    )
    # empty documents never reach the postings exchange — union them back
    def empties(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        keep = [i for i, t in enumerate(texts) if not (t or "").split()]
        t = tbl.take(pa.array(keep, pa.int64()))
        z = np.zeros(t.num_rows)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_words": pa.array(z.astype(np.int64), pa.int64()),
                "logprob": pa.array(z, pa.float64()),
            }
        )

    return agg.union(
        docs_ds.map_batches(empties, batch_format="pyarrow", batch_size=2048)
    )


def curate_corpus(
    docs_ds,
    lang: str = "en",
    min_quality: float = 0.5,
    max_top_word_frac: float = 0.15,
    id_col: str = "doc_id",
):
    """End-to-end training-corpus curation — the composition every
    web-scale pipeline runs before tokenization: language filter →
    quality floor → Gopher repetition ceiling → exact dedup (min-id
    representative per normalized text).

    The three scoring stages are column-append ``map_batches`` over ONE
    streaming pass (no materialization); the only shuffle is exact
    dedup's groupby(content_hash), and it runs over the already-filtered
    survivors, not the full corpus. Threshold comparisons use the
    6-digit-rounded scores so the SQL oracle (same rounding) decides
    every boundary row identically. Returns (id_col, lang_pred,
    quality) for the surviving documents."""
    from signal_collect_ray.functions.dedup import dedup_exact

    ds = docs_ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
    for cls in (LanguageId, QualityScore, RepetitionScore):
        ds = ds.map_batches(cls(), batch_format="pyarrow", batch_size=2048)

    def flt(tbl: pa.Table) -> pa.Table:
        q = np.round(tbl.column("quality").to_numpy(zero_copy_only=False), 6)
        tw = tbl.column("top_word_frac").to_numpy(zero_copy_only=False)
        lp = tbl.column("lang_pred").to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(
            (lp == lang) & (q >= min_quality) & (tw <= max_top_word_frac)
        )
        t = tbl.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                id_col: t.column(id_col),
                "text": t.column("text"),
                "lang_pred": t.column("lang_pred"),
                "quality": pa.array(q[keep], pa.float64()),
            }
        )

    ds = ds.map_batches(flt, batch_format="pyarrow", batch_size=2048)
    return dedup_exact(ds, id_col=id_col).drop_columns(["text"])


def analyze_documents(docs_ds, concurrency=None):
    """Full text-analysis pipeline over a documents Dataset: language ID,
    quality scoring, token counting, fingerprinting — four chained
    stateful stages (actor pools when ``concurrency`` is set)."""
    stages = [LanguageId, QualityScore, TokenCount, Fingerprint]
    # batch_size=None: consume whole blocks — batching would CONCAT the
    # reader's row-group tables first, and that concat is itself the
    # unify that warns on pandas-metadata schemas
    ds = docs_ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None
    )
    for cls in stages:
        if concurrency is None:
            ds = ds.map_batches(cls(), batch_format="pyarrow", batch_size=2048)
        else:
            ds = ds.map_batches(
                cls, batch_format="pyarrow", batch_size=2048, concurrency=concurrency
            )
    return ds


class _BigramExplode:
    """documents → one row per distinct (doc_id, w1, w2) adjacent word
    pair with its in-doc count, crc32(w1)-routed so every bigram
    sharing a first word lands in one partition (c(w1) and c(w1,w2)
    are then both partition-local group sums)."""

    __name__ = "_BigramExplode"

    def __init__(self, num_partitions: int):
        self.num_partitions = num_partitions

    def __call__(self, tbl: pa.Table) -> pa.Table:
        from collections import Counter
        from zlib import crc32

        texts = tbl.column("text").to_pylist()
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_w1, out_w2, out_tf, out_part = [], [], [], [], []
        P = self.num_partitions
        for i, t in enumerate(texts):
            ws = (t or "").lower().split()
            if len(ws) < 2:
                continue
            c = Counter(zip(ws, ws[1:]))
            did = int(ids[i])
            for (w1, w2), tf in c.items():
                out_id.append(did)
                out_w1.append(w1)
                out_w2.append(w2)
                out_tf.append(tf)
                out_part.append(crc32(w1.encode("utf-8")) % P)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "w1": pa.array(out_w1, pa.string()),
                "w2": pa.array(out_w2, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
                "part": pa.array(out_part, pa.int32()),
            }
        )


class _BigramScore:
    """One w1-hash partition of bigram postings → per-(block, doc)
    partial (lp_sum, n) rows. Corpus counts come from partition-local
    Arrow group_by sums (Σ tf over (w1) / (w1, w2) groups — each w1's
    postings are wholly co-located), so no count table is ever built
    or broadcast."""

    __name__ = "_BigramScore"

    def __init__(self, alpha: float, vocab_size: int):
        self.alpha = alpha
        self.v = vocab_size

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tbl = tbl.drop_columns(["part"]).combine_chunks()
        uc = tbl.group_by("w1").aggregate([("tf", "sum")])
        uc = uc.rename_columns(["w1", "c_w1"])
        bc = tbl.group_by(["w1", "w2"]).aggregate([("tf", "sum")])
        bc = bc.rename_columns(["w1", "w2", "c_bg"])
        j = tbl.join(bc, keys=["w1", "w2"]).join(uc, keys="w1")
        tf = j.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        cbg = j.column("c_bg").to_numpy(zero_copy_only=False).astype(np.float64)
        cw1 = j.column("c_w1").to_numpy(zero_copy_only=False).astype(np.float64)
        lp = tf * np.log((cbg + self.alpha) / (cw1 + self.alpha * self.v))
        part = pa.table(
            {
                "doc_id": j.column("doc_id"),
                "lp": pa.array(lp, pa.float64()),
                "n": pa.array(tf.astype(np.int64), pa.int64()),
            }
        )
        agg = part.group_by("doc_id").aggregate([("lp", "sum"), ("n", "sum")])
        return agg.rename_columns(["doc_id", "lp", "n"])


def bigram_logprob(docs_ds, alpha: float = 0.5, num_partitions: int = 32):
    """Corpus-bigram language-model quality signal — the next step up
    from ``unigram_logprob`` toward the CCNet reference-LM perplexity
    filter (Wenzek et al. 2020, public): per-document mean log
    additive-smoothed bigram probability

        (1/n_bg) · Σ ln( (c(w1,w2) + α) / (c(w1) + α·V) )

    over adjacent lowercased whitespace word pairs, with V = corpus
    vocabulary size. Documents with fewer than 2 words have no bigrams
    and are omitted (the SQL mirror's joins drop them identically).

    Scale shape: vocabulary size V is one small counts aggregate; then
    a single crc32(w1)-routed exchange scores every posting with
    partition-local Arrow group-by sums (both corpus counts fall out
    of the same co-location — no count table, no join across
    partitions, no broadcast), and a ``groupby(doc_id)`` folds one
    partial row per (partition, doc). Hot first-words (stopwords) skew
    one partition's postings only — same note as tfidf.

    Returns a Dataset of (doc_id, n_bigrams, bigram_logprob)."""
    from ray.data.aggregate import Sum

    def explode_vocab(tbl: pa.Table) -> pa.Table:
        words = set()
        for t in tbl.column("text").to_pylist():
            words.update((t or "").lower().split())
        return pa.table({"word": pa.array(sorted(words), pa.string())})

    vocab_size = (
        docs_ds.map_batches(explode_vocab, batch_format="pyarrow",
                            batch_size=2048)
        .groupby("word")
        .count()
        .count()
    )

    postings = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        _BigramExplode(num_partitions), batch_format="pyarrow", batch_size=2048
    )
    partials = postings.groupby("part").map_groups(
        _BigramScore(alpha, vocab_size), batch_format="pyarrow"
    )
    agg = partials.groupby("doc_id").aggregate(
        Sum("lp", alias_name="lp"), Sum("n", alias_name="n_bigrams")
    )

    def final(tbl: pa.Table) -> pa.Table:
        lp = tbl.column("lp").to_numpy(zero_copy_only=False)
        n = tbl.column("n_bigrams").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "n_bigrams": tbl.column("n_bigrams"),
                "bigram_logprob": pa.array(
                    np.round(lp / np.maximum(n, 1), 6), pa.float64()
                ),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def bm25_top_docs(docs_ds, query_terms, k=10, k1=1.2, b=0.75,
                  n_docs: int | None = None):
    """BM25 ranking of the corpus against a fixed query — the retrieval
    scoring pass behind search-index evaluation and query-based corpus
    audits. ZERO word-level exchange: the query terms ride the task
    closure (broadcast), each block computes per-doc tf of JUST the
    query terms plus the doc length, one tiny per-block-partial
    aggregate derives N / avgdl / per-term df on the driver, and a
    second streaming pass scores docs vectorized with a per-block
    partial top-k bounding the final selection to k rows per block —
    at 10^12 docs nothing wider than (docs × q) per-doc counters moves.

    idf is the Lucene/Robertson form ln(1 + (N-df+0.5)/(df+0.5)).
    Scores round to 6 digits; only docs with score > 0 are candidates;
    ties break by doc_id ascending. Returns (doc_id, bm25) top-k."""
    from collections import Counter

    from signal_collect_ray.functions.aggregations import grouped_top_k

    terms = list(query_terms)
    q = len(terms)

    def tf_pass(tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(texts)
        dl = np.zeros(n, np.int64)
        tf = np.zeros((n, q), np.int64)
        for i, t in enumerate(texts):
            ws = (t or "").lower().split()
            dl[i] = len(ws)
            if ws:
                c = Counter(ws)
                for j, term in enumerate(terms):
                    tf[i, j] = c.get(term, 0)
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "dl": pa.array(dl, pa.int64()),
        }
        for j in range(q):
            cols[f"tf{j}"] = pa.array(tf[:, j], pa.int64())
        return pa.table(cols)

    tfd = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        tf_pass, batch_format="pyarrow", batch_size=2048
    ).materialize()

    def stats(tbl: pa.Table) -> pa.Table:
        row = {
            "n": pa.array([tbl.num_rows], pa.int64()),
            "sdl": pa.array(
                [int(tbl.column("dl").to_numpy(zero_copy_only=False).sum())],
                pa.int64(),
            ),
        }
        for j in range(q):
            v = tbl.column(f"tf{j}").to_numpy(zero_copy_only=False)
            row[f"df{j}"] = pa.array([int((v > 0).sum())], pa.int64())
        return pa.table(row)

    parts = tfd.map_batches(stats, batch_format="pyarrow").take_all()
    n_total = sum(r["n"] for r in parts)
    if n_docs is not None:
        n_total = n_docs
    avgdl = (sum(r["sdl"] for r in parts) / n_total) if n_total else 1.0
    df = [sum(r[f"df{j}"] for r in parts) for j in range(q)]
    idf = [
        float(np.log(1.0 + (n_total - d + 0.5) / (d + 0.5))) for d in df
    ]

    def score(tbl: pa.Table) -> pa.Table:
        dl = tbl.column("dl").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(dl), np.float64)
        for j in range(q):
            tfv = tbl.column(f"tf{j}").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            s += idf[j] * tfv * (k1 + 1.0) / (tfv + denom_base)
        s = np.round(s, 6)
        keep = s > 0
        return pa.table(
            {
                "doc_id": tbl.column("doc_id").filter(pa.array(keep)),
                "bm25": pa.array(s[keep], pa.float64()),
                "g": pa.array(np.zeros(int(keep.sum()), np.int64)),
            }
        )

    scored = tfd.map_batches(score, batch_format="pyarrow")
    top = grouped_top_k(scored, "g", "bm25", "doc_id", k, descending=True)
    return top.drop_columns(["g"])


def benchmark_grams_from_docs(docs_ds, mod: int = 97, n: int = 5,
                              skip: int = 10):
    """Deterministic stand-in for a benchmark/test-set shingle list:
    from every doc with doc_id % mod == 0, the n words starting at
    offset ``skip`` (docs shorter than skip+n contribute nothing).
    Returns a sorted list of space-joined n-grams — small by
    construction, suitable for broadcast."""

    def pick(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        texts = tbl.column("text").to_pylist()
        out = []
        for i, t in enumerate(texts):
            if int(ids[i]) % mod != 0:
                continue
            ws = (t or "").lower().split()
            if len(ws) >= skip + n:
                out.append(" ".join(ws[skip:skip + n]))
        return pa.table({"gram": pa.array(out, pa.string())})

    rows = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        pick, batch_format="pyarrow"
    ).take_all()
    return sorted({r["gram"] for r in rows})


def benchmark_contamination(docs_ds, bench_grams, n: int = 5):
    """Benchmark-contamination check (the decontamination pass every
    training-corpus build runs before release): flag documents whose
    text contains any of the benchmark's word n-grams as a consecutive
    word window. The benchmark set is broadcast (``ray.put`` once, read
    per task — it is small by definition); each block tokenizes its
    docs ONCE and intersects the doc's n-gram window set with the
    benchmark set — O(words) per doc, independent of benchmark size,
    no Python loop over grams. Returns (doc_id, n_hits) for
    contaminated docs only; n_hits counts DISTINCT benchmark grams
    present."""
    import ray

    from signal_collect_ray.util import pin_schema

    bench_ref = ray.put(frozenset(bench_grams))

    def scan(tbl: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        texts = tbl.column("text").to_pylist()
        out_id, out_hits = [], []
        for i, t in enumerate(texts):
            ws = (t or "").lower().split()
            if len(ws) < n:
                continue
            windows = {
                " ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)
            }
            hits = len(windows & bench)
            if hits:
                out_id.append(int(ids[i]))
                out_hits.append(hits)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "n_hits": pa.array(out_hits, pa.int64()),
            }
        )

    out = docs_ds.select_columns(["doc_id", "text"]).map_batches(
        scan, batch_format="pyarrow", batch_size=2048
    )
    return pin_schema(
        out, pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())])
    )


def top_pmi_bigrams(docs_ds, k: int = 20, min_count: int = 5):
    """Top-k collocations by pointwise mutual information —
    PMI(x,y) = ln( (c_xy/W) / ((c_x/U)(c_y/U)) ) with W = total bigram
    occurrences, U = total word occurrences; the classic collocation
    score that, unlike raw counts (``top_bigrams``), surfaces pairs
    that co-occur far above chance.

    Scale shape: per-block Counter partials for unigrams AND bigrams
    (one pass), two groupby sums; the bigram table then resolves both
    word marginals through ``hash_join`` (big-big co-partition — the
    unigram vocabulary at web scale is 10^7-10^8 rows, no broadcast);
    scoring is vectorized and the global top-k rides grouped_top_k's
    per-block prune. ``min_count`` floors c_xy (PMI of hapax pairs is
    noise). Ties break by bigram ascending; scores round to 6."""
    from collections import Counter

    from ray.data.aggregate import Sum

    from signal_collect_ray.functions.aggregations import grouped_top_k
    from signal_collect_ray.functions.joins import hash_join

    def explode_bi(tbl: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            words = (t or "").lower().split()
            c.update(zip(words, words[1:]))
        return pa.table(
            {
                "w1": pa.array([a for a, _ in c.keys()], pa.string()),
                "w2": pa.array([b for _, b in c.keys()], pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    def explode_uni(tbl: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            c.update((t or "").lower().split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    bi = (
        docs_ds.map_batches(explode_bi, batch_format="pyarrow",
                            batch_size=2048)
        .groupby(["w1", "w2"])
        .aggregate(Sum("cnt", alias_name="c_xy"))
        .materialize()
    )
    uni = (
        docs_ds.map_batches(explode_uni, batch_format="pyarrow",
                            batch_size=2048)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="c_w"))
        .materialize()
    )
    w_total = bi.sum("c_xy") or 0
    u_total = uni.sum("c_w") or 0
    if not w_total:
        return bi  # empty

    def floor_cnt(tbl: pa.Table) -> pa.Table:
        c = tbl.column("c_xy").to_numpy(zero_copy_only=False)
        return tbl.filter(pa.array(c >= min_count))

    bi_f = bi.map_batches(floor_cnt, batch_format="pyarrow")
    j1 = hash_join(
        bi_f,
        uni.map_batches(
            lambda t: pa.table({"w1": t.column("word"),
                                "c_x": t.column("c_w")}),
            batch_format="pyarrow",
        ),
        on="w1",
        how="inner",
    )
    j2 = hash_join(
        j1,
        uni.map_batches(
            lambda t: pa.table({"w2": t.column("word"),
                                "c_y": t.column("c_w")}),
            batch_format="pyarrow",
        ),
        on="w2",
        how="inner",
    )

    def score(tbl: pa.Table) -> pa.Table:
        cxy = tbl.column("c_xy").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cx = tbl.column("c_x").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        cy = tbl.column("c_y").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pmi = np.round(
            np.log((cxy / w_total) / ((cx / u_total) * (cy / u_total))), 6
        )
        w1 = tbl.column("w1").to_pylist()
        w2 = tbl.column("w2").to_pylist()
        return pa.table(
            {
                "bg": pa.array(
                    [f"{a} {b}" for a, b in zip(w1, w2)], pa.string()
                ),
                "n": tbl.column("c_xy"),
                "pmi": pa.array(pmi, pa.float64()),
                "g": pa.array(np.zeros(tbl.num_rows, np.int64), pa.int64()),
            }
        )

    top = grouped_top_k(
        j2.map_batches(score, batch_format="pyarrow"),
        "g",
        "pmi",
        "bg",
        k,
        descending=True,
    )
    return top.drop_columns(["g"])


def vocab_stats(docs_ds):
    """Corpus vocabulary statistics — total token occurrences, distinct
    vocabulary size, hapax legomena count (words seen exactly once) and
    type-token ratio: the Heaps/Zipf health check a corpus build runs
    to spot tokenizer breakage or boilerplate floods. Per-block Counter
    partials → one groupby(word) sum → a single tiny aggregate pass
    over the count table. Returns one row
    (n_tokens, n_distinct, n_hapax, ttr)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def explode(tbl: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            c.update((t or "").lower().split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    uni = (
        docs_ds.map_batches(explode, batch_format="pyarrow", batch_size=2048)
        .groupby("word")
        .aggregate(Sum("cnt", alias_name="c"))
    )

    def partial(tbl: pa.Table) -> pa.Table:
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tok": pa.array([int(c.sum())], pa.int64()),
                "dis": pa.array([len(c)], pa.int64()),
                "hap": pa.array([int((c == 1).sum())], pa.int64()),
            }
        )

    parts = uni.map_batches(partial, batch_format="pyarrow").take_all()
    tok = sum(r["tok"] for r in parts)
    dis = sum(r["dis"] for r in parts)
    hap = sum(r["hap"] for r in parts)
    return pa.table(
        {
            "n_tokens": pa.array([tok], pa.int64()),
            "n_distinct": pa.array([dis], pa.int64()),
            "n_hapax": pa.array([hap], pa.int64()),
            "ttr": pa.array(
                [round(dis * 1.0 / tok, 6) if tok else None], pa.float64()
            ),
        }
    )


def greedy_vocab_cover(docs_ds, k: int = 4):
    """Greedy maximum-coverage document selection (the classic
    submodular corpus-selection primitive — pick the k documents that
    together cover the most vocabulary, Nemhauser-Wolsey-Fisher greedy
    with its (1-1/e) guarantee; public literature). Each round: the
    covered-word set rides ``ray.put`` (bounded by the corpus
    vocabulary), every block reduces to ONE candidate (its best doc by
    marginal new-word count, ties by doc_id), the driver folds
    per-block candidates and extends the covered set with the winner's
    words — k streaming passes, no shuffle at all. Stops early when no
    document adds new vocabulary.

    Returns one row per pick: (round, doc_id, new_words)."""
    import ray

    mat = docs_ds.select_columns(["doc_id", "text"]).materialize()
    covered: frozenset = frozenset()
    picked_ids: set = set()
    out_round, out_id, out_new = [], [], []

    for rnd in range(1, k + 1):
        cref = ray.put(covered)
        exclude = frozenset(picked_ids)

        def cand(tbl: pa.Table) -> pa.Table:
            cov = ray.get(cref)
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            texts = tbl.column("text").to_pylist()
            best = None  # (neg_cnt, doc_id, words)
            for i, t in enumerate(texts):
                did = int(ids[i])
                if did in exclude:
                    continue
                ws = set((t or "").lower().split())
                new = len(ws - cov)
                if new == 0:
                    continue
                key = (-new, did)
                if best is None or key < (best[0], best[1]):
                    best = (-new, did, ws)
            if best is None:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "words": pa.array([], pa.list_(pa.string())),
                    }
                )
            return pa.table(
                {
                    "doc_id": pa.array([best[1]], pa.int64()),
                    "cnt": pa.array([-best[0]], pa.int64()),
                    "words": pa.array([sorted(best[2])],
                                      pa.list_(pa.string())),
                }
            )

        parts = mat.map_batches(cand, batch_format="pyarrow").take_all()
        if not parts:
            break
        win = min(parts, key=lambda r: (-r["cnt"], r["doc_id"]))
        if win["cnt"] == 0:
            break
        covered = covered | set(win["words"])
        picked_ids.add(win["doc_id"])
        out_round.append(rnd)
        out_id.append(win["doc_id"])
        out_new.append(int(win["cnt"]))

    return pa.table(
        {
            "round": pa.array(out_round, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "new_words": pa.array(out_new, pa.int64()),
        }
    )


def pack_sequences(counts_ds, seq_len: int, num_shards: int = 16,
                   count_col: str = "n"):
    """GPT-style concat-and-split sequence packing: within each
    deterministic shard (``util.part_of(doc_id) % num_shards`` — the
    training_shards mapper), documents are concatenated in doc_id order
    and the token stream is split into fixed ``seq_len`` blocks;
    straddling documents contribute a span to each block they cross.
    The standard LM training-batch layout (e.g. GPT-2/3 data pipelines,
    public): no padding waste, deterministic, join-free.

    Input: (doc_id, count_col) rows. Output rows
    (shard, block, doc_id, doc_off, n_tok): document ``doc_id``
    contributes tokens [doc_off, doc_off + n_tok) to block ``block`` of
    its shard. Zero-token documents are dropped.

    Scale shape: ONE groupby exchange on the shard id; packing inside a
    shard is a vectorized cumsum + repeat kernel. Shards are the
    parallelism AND memory unit — size num_shards so one shard's
    (doc_id, n) pairs fit a worker (16 B/doc ⇒ 10^8 docs/shard is a
    1.6 GB group; at 100 TB raise num_shards into the thousands, which
    also matches the resumable sink's per-shard Parquet layout).
    """
    from signal_collect_ray.util import part_of

    L = int(seq_len)

    def add_shard(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "shard",
            pa.array(part_of(ids, num_shards).astype(np.int64), pa.int64()),
        )

    empty = pa.table(
        {
            "shard": pa.array([], pa.int64()),
            "block": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "doc_off": pa.array([], pa.int64()),
            "n_tok": pa.array([], pa.int64()),
        }
    )

    def pack_group(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        n = tbl.column(count_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        shard = tbl.column("shard").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, n, shard = ids[order], n[order], shard[order]
        keep = n > 0
        ids, n, shard = ids[keep], n[keep], shard[keep]
        if not len(ids):
            return empty
        cum = np.cumsum(n)
        off = cum - n
        first = off // L
        last = (off + n - 1) // L
        k = (last - first + 1).astype(np.int64)
        tot = int(k.sum())
        rep = np.repeat(np.arange(len(ids)), k)
        intra = np.arange(tot) - np.repeat(np.cumsum(k) - k, k)
        block = first[rep] + intra
        lo = np.maximum(block * L, off[rep])
        hi = np.minimum((block + 1) * L, off[rep] + n[rep])
        return pa.table(
            {
                "shard": pa.array(shard[rep], pa.int64()),
                "block": pa.array(block, pa.int64()),
                "doc_id": pa.array(ids[rep], pa.int64()),
                "doc_off": pa.array(lo - off[rep], pa.int64()),
                "n_tok": pa.array(hi - lo, pa.int64()),
            }
        )

    return (
        counts_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack_group, batch_format="pyarrow")
    )


def source_vocab_overlap(docs_ds, num_partitions: int = 32):
    """Pairwise vocabulary overlap between corpus sources: for every
    source pair (a < b), the number of distinct words both contain and
    the vocabulary Jaccard |Va∩Vb| / |Va∪Vb| — the standard corpus-mix
    diagnostic for how much two crawls/dumps duplicate each other's
    lexicon. Word space is huge, source space tiny: per-block distinct
    (word, source) sets → ONE hash exchange on the word → per-partition
    dedup, per-word source combos (≤ C(n_sources,2) rows each) and
    per-source distinct-word marginals fold to O(n_sources²) partials
    per partition; the driver folds partitions. Returns a pyarrow Table
    (source_a, source_b, n_common, jaccard) sorted by pair."""
    import hashlib

    from signal_collect_ray.util import part_of

    def explode(tbl: pa.Table) -> pa.Table:
        seen = set()
        for s, t in zip(
            tbl.column("source").to_pylist(), tbl.column("text").to_pylist()
        ):
            # RE2-exact tokenization — must match the oracle's \S+
            for w in set(_RE2_NONSPACE_RE.findall((t or "").lower())):
                seen.add((w, s))
        if not seen:
            return pa.table(
                {
                    "gpart": pa.array([], pa.int32()),
                    "word": pa.array([], pa.string()),
                    "source": pa.array([], pa.string()),
                }
            )
        words = [w for w, _ in seen]
        srcs = [s for _, s in seen]
        h = np.array(
            [
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
                for w in words
            ],
            dtype=np.uint64,
        ).view(np.int64)
        return pa.table(
            {
                "gpart": pa.array(part_of(h, num_partitions), pa.int32()),
                "word": pa.array(words, pa.string()),
                "source": pa.array(srcs, pa.string()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {
                "word": tbl.column("word").to_pylist(),
                "source": tbl.column("source").to_pylist(),
            }
        ).drop_duplicates()
        marg = df.groupby("source").size()
        rows_a, rows_b, rows_n = [], [], []
        for s, nv in marg.items():
            rows_a.append(s)
            rows_b.append("")  # marginal row: |V_s| partial
            rows_n.append(int(nv))
        import itertools as it

        words_of = {
            s: grp["word"].to_numpy()
            for s, grp in df.groupby("source", sort=True)
        }
        for a, b in it.combinations(sorted(words_of), 2):
            c = len(np.intersect1d(words_of[a], words_of[b]))
            if c:
                rows_a.append(a)
                rows_b.append(b)
                rows_n.append(int(c))
        return pa.table(
            {
                "source_a": pa.array(rows_a, pa.string()),
                "source_b": pa.array(rows_b, pa.string()),
                "n": pa.array(rows_n, pa.int64()),
            }
        )

    parts = (
        docs_ds.map_batches(explode, batch_format="pyarrow", batch_size=2048)
        .groupby("gpart")
        .map_groups(fold, batch_format="pyarrow")
        .take_all()
    )
    marg: dict = {}
    common: dict = {}
    for r in parts:
        if r["source_b"] == "":
            marg[r["source_a"]] = marg.get(r["source_a"], 0) + r["n"]
        else:
            key = (r["source_a"], r["source_b"])
            common[key] = common.get(key, 0) + r["n"]
    keys = sorted(common)
    return pa.table(
        {
            "source_a": pa.array([k[0] for k in keys], pa.string()),
            "source_b": pa.array([k[1] for k in keys], pa.string()),
            "n_common": pa.array([common[k] for k in keys], pa.int64()),
            "jaccard": pa.array(
                [
                    round(
                        common[k]
                        / (marg[k[0]] + marg[k[1]] - common[k]),
                        6,
                    )
                    for k in keys
                ],
                pa.float64(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# TextRank extractive summarization (Mihalcea & Tarau 2004)
# ---------------------------------------------------------------------------

class TextRankSummary:
    """Per-document TextRank over fixed word-chunks: chunk the document
    into ``chunk_words``-word windows, weight every chunk pair by the
    number of DISTINCT shared words (integer), and run ``iters``
    damped-PageRank iterations over the weighted chunk graph
    (r = 0.15 + 0.85 Σ_j w_ij · r_j / Σ_k w_jk). Emits each document's
    top-ranked chunk — the extractive one-chunk summary.

    Documents are independent rows, so the whole computation is one
    embarrassing-parallel ``map_batches`` pass (no shuffle at all);
    per-doc graphs are ≤ ⌈words/chunk_words⌉ nodes, so the dense
    matmul is trivially small. Weights and weight sums are exact
    integers; only the rank recursion is float, rounded half-away at 6
    digits like every iterative oracle in this repo."""

    __name__ = "TextRankSummary"

    def __init__(self, chunk_words: int = 10, iters: int = 4):
        self.C = int(chunk_words)
        self.iters = int(iters)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        out_doc, out_chunk, out_score, out_n = [], [], [], []
        for i, t in enumerate(tbl.column("text").to_pylist()):
            words = _RE2_NONSPACE_RE.findall((t or "").lower())
            if not words:
                continue
            sets = [
                set(words[k : k + self.C])
                for k in range(0, len(words), self.C)
            ]
            n = len(sets)
            W = np.zeros((n, n))
            for a in range(n):
                for b in range(a + 1, n):
                    w = len(sets[a] & sets[b])
                    W[a, b] = W[b, a] = w
            sw = W.sum(axis=1)  # exact: float sums of small ints
            M = np.divide(
                W, sw[None, :], out=np.zeros_like(W), where=sw[None, :] > 0
            )
            r = np.full(n, 0.15)
            for _ in range(self.iters):
                r = 0.15 + 0.85 * (M @ r)
            score = _round_half_away_text(r, 6)
            best = int(np.lexsort((np.arange(n), -score))[0])
            out_doc.append(int(ids[i]))
            out_chunk.append(best + 1)  # 1-based like the SQL mirror
            out_score.append(float(score[best]))
            out_n.append(n)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "best_chunk": pa.array(out_chunk, pa.int64()),
                "score": pa.array(out_score, pa.float64()),
                "n_chunks": pa.array(out_n, pa.int64()),
            }
        )


def _round_half_away_text(x: np.ndarray, digits: int) -> np.ndarray:
    """DuckDB ROUND semantics (half away from zero); np.round is
    half-to-even."""
    f = 10.0 ** digits
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def textrank_summaries(docs_ds, chunk_words: int = 10, iters: int = 4):
    """Dataset (doc_id, best_chunk, score, n_chunks) — the top TextRank
    chunk per document. One map_batches pass, no exchange."""
    return docs_ds.map_batches(
        TextRankSummary(chunk_words, iters), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016) — first K merges
# ---------------------------------------------------------------------------

def bpe_merges(docs_ds, k: int = 8, subs: int = 4) -> "pa.Table":
    """The first ``k`` byte-pair-encoding merge operations learned from
    the corpus (Sennrich, Haddow & Birch 2016 — the tokenizer-training
    primitive): per round, the most frequent adjacent token pair
    (ties → lexicographic) is merged corpus-wide.

    Distributed shape: ONE word-count exchange builds the (word
    frequency) vocabulary; each round is then O(|vocab|) map_batches
    work — pair counting emits per-batch partial sums over the bounded
    pair domain, the argmax folds on the driver (O(distinct pairs)),
    and the merge applies as a broadcast string replace. The token
    string representation ``' t1 t2 … '`` with single-space separators
    makes the merge a PLAIN string replace; it is applied ``subs``
    times (fixed point for any word ≤ 2^subs tokens), with identical
    left-to-right non-overlap semantics in Python str.replace and the
    oracle's nested SQL replace()."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def word_counts(tbl: pa.Table) -> pa.Table:
        wc: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            wc.update(_WORD_RE.findall((t or "").lower()))
        return pa.table(
            {
                "word": pa.array(list(wc.keys()), pa.string()),
                "freq": pa.array(
                    np.fromiter(wc.values(), dtype=np.int64, count=len(wc)),
                    pa.int64(),
                ),
            }
        )

    vocab = (
        docs_ds.map_batches(word_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )

    def to_tokens(tbl: pa.Table) -> pa.Table:
        words = tbl.column("word").to_pylist()
        return pa.table(
            {
                "s": pa.array(
                    [" " + " ".join(w) + " " for w in words], pa.string()
                ),
                "freq": tbl.column("freq"),
            }
        )

    vocab = vocab.map_batches(to_tokens, batch_format="pyarrow").materialize()

    merges = []
    for step in range(1, k + 1):

        def pair_partial(tbl: pa.Table) -> pa.Table:
            pc: Counter = Counter()
            freqs = tbl.column("freq").to_numpy(zero_copy_only=False)
            for i, s in enumerate(tbl.column("s").to_pylist()):
                ts = s.split()
                n = int(freqs[i])
                for a, b in zip(ts, ts[1:]):
                    pc[(a, b)] += n
            ls, rs = zip(*pc.keys()) if pc else ((), ())
            return pa.table(
                {
                    "l": pa.array(list(ls), pa.string()),
                    "r": pa.array(list(rs), pa.string()),
                    "n": pa.array(list(pc.values()), pa.int64()),
                }
            )

        rows = (
            vocab.map_batches(pair_partial, batch_format="pyarrow")
            .groupby(["l", "r"])
            .aggregate(Sum("n", alias_name="n"))
            .take_all()
        )
        if not rows:
            break
        best = min(rows, key=lambda x: (-int(x["n"]), x["l"], x["r"]))
        l, r, n = best["l"], best["r"], int(best["n"])
        merges.append((step, l, r, n))
        pat, rep = f" {l} {r} ", f" {l}{r} "

        def apply(tbl: pa.Table, pat=pat, rep=rep) -> pa.Table:
            out = []
            for s in tbl.column("s").to_pylist():
                for _ in range(subs):
                    s2 = s.replace(pat, rep)
                    if s2 == s:
                        break
                    s = s2
                out.append(s)
            return pa.table(
                {"s": pa.array(out, pa.string()), "freq": tbl.column("freq")}
            )

        vocab = vocab.map_batches(apply, batch_format="pyarrow").materialize()

    return pa.table(
        {
            "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010)
# ---------------------------------------------------------------------------

def rake_keywords(docs_ds, top_k: int = 20, max_len: int = 4):
    """Rapid Automatic Keyword Extraction: candidate phrases are
    maximal stopword-free word runs (capped at ``max_len`` words);
    word score = deg/freq where freq counts phrase occurrences
    containing the word and deg additionally credits each co-occurring
    phrase word (deg += phrase length per occurrence); phrase score =
    Σ word scores. Top-k phrases by (rounded score DESC, phrase ASC)
    with occurrence counts.

    Distributed shape: one tokenizing pass emits per-batch PARTIAL
    word stats and phrase counts, folded in a single (kind, key)
    groupby; the final scoring join runs on the driver over the folded
    tables (O(vocab + distinct phrases) — fine for any corpus whose
    keyword table fits one machine; heavy_hitters is the documented
    sketch path beyond that, as for vocab_coverage_curve)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partials(tbl: pa.Table):
        wfreq: Counter = Counter()
        wdeg: Counter = Counter()
        pcount: Counter = Counter()
        for t in tbl.column("text").to_pylist():
            words = _WORD_RE.findall((t or "").lower())
            run: list = []
            runs = []
            for w in words:
                if w in _STOPWORDS:
                    if run:
                        runs.append(run)
                        run = []
                else:
                    run.append(w)
            if run:
                runs.append(run)
            for r in runs:
                if len(r) > max_len:
                    continue
                pcount[" ".join(r)] += 1
                for w in r:
                    wfreq[w] += 1
                    wdeg[w] += len(r)
        return wfreq, wdeg, pcount

    class _Stats:
        __name__ = "_Stats"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            wfreq, wdeg, pcount = partials(tbl)
            words = list(wfreq)
            return pa.table(
                {
                    "kind": pa.array(
                        ["w"] * len(words) + ["p"] * len(pcount), pa.string()
                    ),
                    "key": pa.array(words + list(pcount), pa.string()),
                    "freq": pa.array(
                        [wfreq[w] for w in words] + list(pcount.values()),
                        pa.int64(),
                    ),
                    "deg": pa.array(
                        [wdeg[w] for w in words] + [0] * len(pcount),
                        pa.int64(),
                    ),
                }
            )

    stats = (
        docs_ds.map_batches(_Stats(), batch_format="pyarrow")
        .groupby(["kind", "key"])
        .aggregate(Sum("freq", alias_name="freq"), Sum("deg", alias_name="deg"))
        .take_all()
    )
    wscore = {}
    phrases = {}
    for r in stats:
        if r["kind"] == "w":
            wscore[r["key"]] = int(r["deg"]) / int(r["freq"])
        else:
            phrases[r["key"]] = int(r["freq"])
    out = []
    for p, n in phrases.items():
        raw = sum(wscore[w] for w in p.split())
        score = float(_round_half_away_text(np.array([raw]), 6)[0])
        out.append((p, n, score))
    out.sort(key=lambda x: (-x[2], x[0]))
    out = out[:top_k]
    return pa.table(
        {
            "phrase": pa.array([x[0] for x in out], pa.string()),
            "n": pa.array([x[1] for x in out], pa.int64()),
            "score": pa.array([x[2] for x in out], pa.float64()),
        }
    )
