"""Model-inference stages for training-data curation.

The canonical web-corpus quality classifier (fastText-style: hashed
bag-of-words features × a linear layer + sigmoid — Joulin 2016, public
literature) as a stateful ``map_batches`` actor-pool stage: the weight
table is built ONCE per actor in ``__init__`` (the "load model once"
pattern — swap ``weights`` for a real trained vector at deployment;
it rides to every actor via Ray's implicit closure serialization, or
``ray.put`` it for multi-GB models), and ``__call__`` scores a whole
Arrow batch.

The default weights are derived deterministically from the bucket
index via md5 — not trained, but exercising the exact production
dataflow — which makes every score EXACTLY mirrorable in SQL
(md5-prefix arithmetic, the ``functions.sampling`` convention), so the
inference plumbing itself is oracle-checkable:

    bucket(word) = u32(md5(word)[:4]) mod D
    w[j]         = u32(md5(f"w:{j}")[:4]) / 2^32 − 0.5
    score(doc)   = σ(8 · mean over word tokens of w[bucket(word)])

Empty documents score σ(0) = 0.5. Scores round to 6 digits (the
float-mirror convention).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

DEFAULT_BUCKETS = 1024
_SCALE = 8.0


def _u32(b: bytes) -> int:
    return int.from_bytes(hashlib.md5(b).digest()[:4], "big")


def synthetic_weights(num_buckets: int = DEFAULT_BUCKETS) -> np.ndarray:
    """The deterministic md5-derived weight vector (see module doc)."""
    return np.fromiter(
        (_u32(f"w:{j}".encode()) / 4294967296.0 - 0.5
         for j in range(num_buckets)),
        dtype=np.float64,
        count=num_buckets,
    )


class LinearTextClassifier:
    """Hashed-bag-of-words linear classifier scoring → adds
    ``cls_score`` in (0, 1). Pass the CLASS to ``map_batches(...,
    concurrency=N)`` so each actor builds (or loads) its weights once."""

    __name__ = "LinearTextClassifier"

    def __init__(self, num_buckets: int = DEFAULT_BUCKETS, weights=None):
        self.D = num_buckets
        self.w = (
            np.asarray(weights, dtype=np.float64)
            if weights is not None
            else synthetic_weights(num_buckets)
        )
        if len(self.w) != self.D:
            raise ValueError(
                f"weights length {len(self.w)} != num_buckets {self.D}"
            )
        self._bucket_cache: dict = {}

    def _bucket(self, word: str) -> int:
        b = self._bucket_cache.get(word)
        if b is None:
            b = _u32(word.encode("utf-8")) % self.D
            self._bucket_cache[word] = b
        return b

    def __call__(self, tbl: pa.Table) -> pa.Table:
        texts = tbl.column("text").to_pylist()
        raw = np.zeros(len(texts))
        for i, t in enumerate(texts):
            ws = (t or "").lower().split()
            if ws:
                wsum = 0.0
                for word in ws:
                    wsum += self.w[self._bucket(word)]
                raw[i] = wsum / len(ws)
        score = 1.0 / (1.0 + np.exp(-_SCALE * raw))
        return tbl.append_column(
            "cls_score", pa.array(np.round(score, 6), pa.float64())
        )


def classify_documents(docs_ds, num_buckets: int = DEFAULT_BUCKETS,
                       weights=None, concurrency=None):
    """Score every document with the hashed linear classifier. With
    ``concurrency`` set this is an actor pool (weights built once per
    actor); otherwise a stateless per-task stage."""
    if concurrency is None:
        return docs_ds.map_batches(
            LinearTextClassifier(num_buckets, weights),
            batch_format="pyarrow", batch_size=2048,
        )
    return docs_ds.map_batches(
        LinearTextClassifier,
        fn_constructor_args=(num_buckets, weights),
        batch_format="pyarrow", batch_size=2048, concurrency=concurrency,
    )
