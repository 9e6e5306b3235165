"""Similarity search over an embedding column (list<float>).

* ``knn_brute_force``: exact cosine top-k — the query matrix is
  broadcast ONCE via ``ray.put`` and every batch does one numpy matmul
  against it (never re-shipped per batch).
* ``knn_lsh``: random-hyperplane LSH bucketing (Charikar 2002) — the
  scale path: candidates come only from matching buckets, then exact
  re-ranking; recall < 1 by design, controlled by (n_planes, n_tables).
* ``embedding_dedup_cosine``: near-duplicate pairs by cosine ≥ τ within
  LSH buckets.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _emb_matrix(tbl: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = tbl.column(col).combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


class _BruteForceScore:
    """Per-batch exact cosine scores vs the broadcast query matrix;
    emits per-batch partial top-k rows (id, query_idx, score)."""

    __name__ = "_BruteForceScore"

    def __init__(self, queries_ref, k: int, id_col: str, emb_col: str):
        self.queries_ref = queries_ref
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self._q: Optional[np.ndarray] = None

    def _queries(self) -> np.ndarray:
        if self._q is None:
            import ray

            q = self.queries_ref
            self._q = ray.get(q) if not isinstance(q, np.ndarray) else q
        return self._q

    def __call__(self, tbl: pa.Table) -> pa.Table:
        q = self._queries()  # (nq, d) already normalized
        m = _normalize(_emb_matrix(tbl, self.emb_col))  # (nb, d)
        scores = m @ q.T  # (nb, nq)
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        nb, nq = scores.shape
        k = min(self.k, nb)
        top = np.argpartition(-scores, k - 1, axis=0)[:k]  # (k, nq)
        out_ids = ids[top.reshape(-1)]
        out_q = np.repeat(np.arange(nq, dtype=np.int64)[None, :], k, axis=0).reshape(-1)
        out_s = scores[top.reshape(-1), np.tile(np.arange(nq), k)]
        return pa.table(
            {
                "qid": pa.array(out_q, pa.int64()),
                "id": pa.array(out_ids, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def knn_brute_force(
    embeddings_ds,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Exact cosine top-k per query: Dataset (qid, id, score), k rows per
    query. Per-batch partial top-k bounds the shuffle to k·n_blocks."""
    import ray

    qn = _normalize(np.asarray(query_vectors, dtype=np.float64))
    ref = ray.put(qn)
    partials = embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _BruteForceScore(ref, k, id_col, emb_col), batch_format="pyarrow",
        batch_size=4096,
    )

    class _FinalTopK:
        __name__ = "_FinalTopK"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            s = tbl.column("score").to_numpy(zero_copy_only=False)
            ids = tbl.column("id").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -s))[:k]
            return tbl.take(pa.array(order, pa.int64()))

    return partials.groupby("qid").map_groups(_FinalTopK(), batch_format="pyarrow")


def knn_lsh(
    embeddings_ds,
    query_vectors: np.ndarray,
    k: int = 10,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Approximate cosine top-k via random-hyperplane LSH — the scale
    path: a batch row is scored ONLY against queries whose bucket code
    matches in at least one table, so compute per batch is
    O(nb · n_tables) code compares instead of a full matmul against
    every query. Planes + query codes broadcast once; exact re-ranking
    on the surviving candidates. Recall < 1 by design (raise n_tables /
    lower n_planes to trade compute for recall)."""
    import ray

    qn = _normalize(np.asarray(query_vectors, dtype=np.float64))
    d = qn.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, d))
    pow2 = 1 << np.arange(n_planes, dtype=np.int64)
    qcodes = np.stack(
        [((qn @ planes[t].T) > 0).astype(np.int64) @ pow2 for t in range(n_tables)]
    )  # (n_tables, nq)
    state_ref = ray.put({"planes": planes, "q": qn, "qcodes": qcodes})

    class _LshScore:
        __name__ = "_LshScore"

        def __init__(self):
            self._s = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._s is None:
                self._s = ray.get(state_ref)
            planes_, qn_, qcodes_ = (
                self._s["planes"], self._s["q"], self._s["qcodes"],
            )
            m = _normalize(_emb_matrix(tbl, emb_col))
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            match = np.zeros((len(m), qn_.shape[0]), dtype=bool)
            for t in range(planes_.shape[0]):
                codes = ((m @ planes_[t].T) > 0).astype(np.int64) @ pow2
                match |= codes[:, None] == qcodes_[t][None, :]
            ri, qi = np.nonzero(match)
            if not len(ri):
                return pa.table(
                    {
                        "qid": pa.array([], pa.int64()),
                        "id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.float64()),
                    }
                )
            scores = np.einsum("ij,ij->i", m[ri], qn_[qi])
            return pa.table(
                {
                    "qid": pa.array(qi.astype(np.int64), pa.int64()),
                    "id": pa.array(ids[ri], pa.int64()),
                    "score": pa.array(scores, pa.float64()),
                }
            )

    partials = embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _LshScore(), batch_format="pyarrow", batch_size=4096
    )

    class _FinalTopK:
        __name__ = "_FinalTopK"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            s = tbl.column("score").to_numpy(zero_copy_only=False)
            ids = tbl.column("id").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -s))[:k]
            return tbl.take(pa.array(order, pa.int64()))

    return partials.groupby("qid").map_groups(_FinalTopK(), batch_format="pyarrow")


class _LshBucket:
    """Random-hyperplane signatures → (table_id, bucket, id) rows."""

    __name__ = "_LshBucket"

    def __init__(self, planes_ref, id_col: str, emb_col: str):
        self.planes_ref = planes_ref
        self.id_col = id_col
        self.emb_col = emb_col
        self._planes = None

    def _get(self):
        if self._planes is None:
            import ray

            p = self.planes_ref
            self._planes = ray.get(p) if not isinstance(p, np.ndarray) else p
        return self._planes

    def __call__(self, tbl: pa.Table) -> pa.Table:
        planes = self._get()  # (n_tables, n_planes, d)
        m = _normalize(_emb_matrix(tbl, self.emb_col))
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        t_ids, buckets, out_ids = [], [], []
        pow2 = 1 << np.arange(planes.shape[1], dtype=np.int64)
        for t in range(planes.shape[0]):
            bits = (m @ planes[t].T) > 0  # (nb, n_planes)
            code = bits.astype(np.int64) @ pow2
            t_ids.append(np.full(len(m), t, dtype=np.int32))
            buckets.append(code)
            out_ids.append(ids)
        return pa.table(
            {
                "table_id": pa.array(np.concatenate(t_ids), pa.int32()),
                "bucket": pa.array(np.concatenate(buckets), pa.int64()),
                "id": pa.array(np.concatenate(out_ids), pa.int64()),
            }
        )


def lsh_buckets(
    embeddings_ds,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Bucket assignments for hyperplane LSH: Dataset (table_id, bucket, id).

    Dimension is inferred from the first row. The planes are broadcast
    once via ray.put."""
    import ray

    first = embeddings_ds.take(1)[0]
    d = len(first[emb_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, d))
    ref = ray.put(planes)
    return embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _LshBucket(ref, id_col, emb_col), batch_format="pyarrow", batch_size=4096
    )


def embedding_dedup_cosine(
    embeddings_ds,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """Near-duplicate pairs (id_a < id_b, cosine ≥ threshold) found via
    LSH buckets then exact in-bucket verification. Candidate generation
    never compares across buckets — the scale path; exact verification
    happens on bucket-local matrices."""
    import ray

    first = embeddings_ds.take(1)[0]
    d = len(first[emb_col])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(n_tables, n_planes, d))
    ref = ray.put(planes)

    class _BucketWithVec:
        __name__ = "_BucketWithVec"

        def __init__(self):
            self._planes = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._planes is None:
                self._planes = ray.get(ref)
            planes = self._planes
            m = _normalize(_emb_matrix(tbl, emb_col))
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            emb = tbl.column(emb_col).combine_chunks()
            pow2 = 1 << np.arange(planes.shape[1], dtype=np.int64)
            pieces = []
            for t in range(planes.shape[0]):
                code = ((m @ planes[t].T) > 0).astype(np.int64) @ pow2
                pieces.append(
                    pa.table(
                        {
                            "table_id": pa.array(
                                np.full(len(m), t, dtype=np.int32), pa.int32()
                            ),
                            "bucket": pa.array(code, pa.int64()),
                            "id": pa.array(ids, pa.int64()),
                            "emb": emb,
                        }
                    )
                )
            return pa.concat_tables(pieces)

    class _VerifyBucket:
        __name__ = "_VerifyBucket"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            ids = tbl.column("id").to_numpy(zero_copy_only=False)
            uniq, first_idx = np.unique(ids, return_index=True)
            if len(uniq) < 2:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            m = _normalize(
                _emb_matrix(tbl.take(pa.array(first_idx, pa.int64())), "emb")
            )
            sims = m @ m.T
            ia, ib = np.triu_indices(len(uniq), k=1)
            keep = sims[ia, ib] >= threshold
            return pa.table(
                {
                    "id_a": pa.array(uniq[ia[keep]], pa.int64()),
                    "id_b": pa.array(uniq[ib[keep]], pa.int64()),
                    "cosine": pa.array(sims[ia[keep], ib[keep]], pa.float64()),
                }
            )

    buckets = embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _BucketWithVec(), batch_format="pyarrow", batch_size=4096
    )
    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        _VerifyBucket(), batch_format="pyarrow"
    )

    # dedup pairs found in multiple tables
    class _First:
        __name__ = "_First"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            return tbl.take(pa.array([0], pa.int64()))

    return pairs.groupby(["id_a", "id_b"]).map_groups(_First(), batch_format="pyarrow")
