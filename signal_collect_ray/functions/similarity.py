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

from signal_collect_ray.util import pin_schema


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


# Broadcast cap for the exact all-pairs path: a 1 GiB normalized
# matrix (float64) ≈ 2M vectors at d=64. Past it, exact all-pairs is
# O(n²) by definition — use the LSH-bucketed variant instead.
BROADCAST_EMB_BYTES_LIMIT = 1 << 30


def embedding_pairs_exact(
    embeddings_ds,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 4,
):
    """EXACT all-pairs cosine ≥ threshold — the brute-force baseline for
    the LSH near-dup path (and its recall oracle). The normalized
    matrix is broadcast ONCE via ``ray.put`` (byte-capped); every batch
    runs a column-chunked matmul against it and keeps pairs with
    id_a < id_b. Returns (id_a, id_b, cosine[rounded])."""
    import ray

    mats, idss, nbytes = [], [], 0
    for b in embeddings_ds.select_columns([id_col, emb_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        m = _emb_matrix(b, emb_col).astype(np.float64)
        nbytes += m.nbytes
        if nbytes > BROADCAST_EMB_BYTES_LIMIT:
            raise ValueError(
                "embedding matrix exceeds the exact-all-pairs broadcast cap "
                f"({BROADCAST_EMB_BYTES_LIMIT} bytes) — use "
                "embedding_dedup_cosine (LSH-bucketed) at this scale"
            )
        mats.append(m)
        idss.append(b.column(id_col).to_numpy(zero_copy_only=False).copy())
    full_ids = np.concatenate(idss) if idss else np.empty(0, np.int64)
    full_m = (
        _normalize(np.concatenate(mats)) if mats else np.empty((0, 0))
    )
    order = np.argsort(full_ids)
    full_ids, full_m = full_ids[order], full_m[order]
    ref = ray.put({"m": full_m, "ids": full_ids})

    col_chunk = 16384

    class _ExactPairs:
        __name__ = "_ExactPairs"

        def __init__(self):
            self._s = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._s is None:
                self._s = ray.get(ref)
            M, ids = self._s["m"], self._s["ids"]
            mb = _normalize(_emb_matrix(tbl, emb_col).astype(np.float64))
            idb = tbl.column(id_col).to_numpy(zero_copy_only=False)
            out_a, out_b, out_c = [], [], []
            for c0 in range(0, len(ids), col_chunk):
                sims = mb @ M[c0 : c0 + col_chunk].T  # (nb, chunk)
                mask = (sims >= threshold) & (
                    idb[:, None] < ids[None, c0 : c0 + col_chunk]
                )
                ri, ci = np.nonzero(mask)
                if len(ri):
                    out_a.append(idb[ri])
                    out_b.append(ids[c0 + ci])
                    out_c.append(sims[ri, ci])
            if not out_a:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            cos = np.concatenate(out_c)
            if round_digits is not None:
                cos = np.round(cos, round_digits)
            return pa.table(
                {
                    "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                    "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                    "cosine": pa.array(cos, pa.float64()),
                }
            )

    return embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _ExactPairs(), batch_format="pyarrow", batch_size=512
    )


def candidate_chunks(
    cand_ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    extra_cols=(),
    max_chunk_bytes: int = BROADCAST_EMB_BYTES_LIMIT,
):
    """The byte-capped candidate-side idiom for exact NN search: the
    candidate population is sorted by id (one exchange) and shipped to
    the object store as a LIST of refs, each holding an id-ascending
    slice (ids, normalized float64 matrix, extra columns) whose matrix
    fits ``max_chunk_bytes``. Under the cap that is exactly one ref —
    the classic single ``ray.put`` broadcast; above it the driver still
    only ever holds one batch at a time (never the whole matrix), and
    workers fetch one chunk at a time, so memory is capped end to end
    while the search stays EXACT (unlike IVF probing, which trades
    recall). Chunked vs single-ref results are bit-identical: each
    cosine is the same dot product, and id-ascending chunk order plus
    strictly-greater replacement preserves first-max = smallest-id tie
    breaks (pinned in tests/test_capped_broadcast.py)."""
    import ray

    cols = [id_col, emb_col, *extra_cols]
    sorted_ds = cand_ds.select_columns(cols).sort(id_col)
    refs = []
    ids_acc, mat_acc, nbytes = [], [], 0
    ex_acc = {c: [] for c in extra_cols}

    def flush():
        nonlocal ids_acc, mat_acc, ex_acc, nbytes
        if not ids_acc:
            return
        chunk = {
            "ids": np.concatenate(ids_acc),
            "mat": np.concatenate(mat_acc),
        }
        for c in extra_cols:
            chunk[c] = np.concatenate(ex_acc[c])
        refs.append(ray.put(chunk))
        ids_acc, mat_acc, nbytes = [], [], 0
        ex_acc = {c: [] for c in extra_cols}

    for b in sorted_ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        if not b.num_rows:
            continue
        m = _normalize(_emb_matrix(b, emb_col).astype(np.float64))
        if nbytes and nbytes + m.nbytes > max_chunk_bytes:
            flush()
        ids_acc.append(
            b.column(id_col).to_numpy(zero_copy_only=False).copy()
        )
        for c in extra_cols:
            ex_acc[c].append(
                b.column(c).to_numpy(zero_copy_only=False).copy()
            )
        mat_acc.append(m)
        nbytes += m.nbytes
    flush()
    return refs


def bipartite_nn_top1(
    query_ds,
    cand_ds,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_chunk_bytes: int = BROADCAST_EMB_BYTES_LIMIT,
):
    """EXACT bipartite top-1 cosine neighbor: for every query row the
    best candidate (ties → smallest candidate id). Candidates ship via
    ``candidate_chunks`` (one broadcast under the byte cap, a sequence
    of capped chunks above it); each query batch runs one matmul per
    chunk with a running argmax — strictly-greater replacement across
    id-ascending chunks keeps the smallest-id winner on ties, exactly
    the single-matrix ``np.argmax`` first-max rule. Returns
    (``id_col``, nn_id, score[raw float64 — callers round])."""
    import ray

    refs = candidate_chunks(
        cand_ds, id_col, emb_col, max_chunk_bytes=max_chunk_bytes
    )
    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "nn_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def nn(tbl: pa.Table) -> pa.Table:
        if not tbl.num_rows or not refs:
            return empty
        q = _normalize(_emb_matrix(tbl, emb_col).astype(np.float64))
        qids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        best_s = np.full(len(qids), -np.inf)
        best_i = np.zeros(len(qids), dtype=np.int64)
        for r in refs:
            ch = ray.get(r)
            sims = q @ ch["mat"].T
            j = np.argmax(sims, axis=1)  # first max = smallest id in chunk
            s = sims[np.arange(len(j)), j]
            upd = s > best_s  # strict: earlier (smaller-id) chunk wins ties
            best_s[upd] = s[upd]
            best_i[upd] = ch["ids"][j[upd]]
        return pa.table(
            {
                id_col: pa.array(qids, pa.int64()),
                "nn_id": pa.array(best_i, pa.int64()),
                "score": pa.array(best_s, pa.float64()),
            }
        )

    return query_ds.map_batches(nn, batch_format="pyarrow")


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


def _bucket_verifier(threshold, max_partners, verify_chunk, all_pairs_cap):
    """Exact in-bucket cosine verification kernel shared by the LSH
    dedup path (embedding_dedup_cosine) and semdedup (k-means
    buckets): chunked upper-triangle matmul bounds transient memory;
    buckets above ``all_pairs_cap`` distinct members min-link to the
    bucket minimum in O(n) (closure connectivity preserved)."""

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
            # uniq is ascending → row i's partners j>i have larger ids;
            # chunked upper-triangle matmul bounds transient memory to
            # verify_chunk × n regardless of bucket size
            m = _normalize(
                _emb_matrix(tbl.take(pa.array(first_idx, pa.int64())), "emb")
            )
            n = len(uniq)
            if n > all_pairs_cap:
                # degenerate bucket: O(n) min-link verify (see docstring)
                sims = m[1:] @ m[0]
                keep = np.flatnonzero(sims >= threshold)
                return pa.table(
                    {
                        "id_a": pa.array(
                            np.full(len(keep), uniq[0], dtype=np.int64), pa.int64()
                        ),
                        "id_b": pa.array(uniq[1:][keep], pa.int64()),
                        "cosine": pa.array(sims[keep], pa.float64()),
                    }
                )
            out_a, out_b, out_c = [], [], []
            for c0 in range(0, n, verify_chunk):
                c1 = min(c0 + verify_chunk, n)
                sims = m[c0:c1] @ m.T  # (chunk, n)
                # upper triangle only: global col > global row
                cols = np.arange(n)[None, :]
                rows = np.arange(c0, c1)[:, None]
                mask = (cols > rows) & (sims >= threshold)
                if max_partners is not None and mask.any():
                    # keep the first max_partners True cols per row
                    # (ascending id — preserves chain connectivity)
                    csum = np.cumsum(mask, axis=1)
                    mask &= csum <= max_partners
                ri, ci = np.nonzero(mask)
                if len(ri):
                    out_a.append(uniq[c0 + ri])
                    out_b.append(uniq[ci])
                    out_c.append(sims[ri, ci])
            if not out_a:
                return pa.table(
                    {
                        "id_a": pa.array([], pa.int64()),
                        "id_b": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                    "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_c), pa.float64()),
                }
            )

    return _VerifyBucket()


def embedding_dedup_cosine(
    embeddings_ds,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_partners: int | None = None,
    verify_chunk: int = 1024,
    all_pairs_cap: int = 1024,
):
    """Near-duplicate pairs (id_a < id_b, cosine ≥ threshold) found via
    LSH buckets then exact in-bucket verification. Candidate generation
    never compares across buckets — the scale path; exact verification
    happens on bucket-local matrices, CHUNKED so a degenerate bucket
    (mass-duplicated embedding — hyperplane splitting cannot separate
    identical vectors) never materializes an n×n similarity matrix.

    ``max_partners``: optional per-row output cap for dedup workloads —
    each row keeps only its first ``max_partners`` partners in ascending
    id order, which preserves cluster connectivity (every id links to
    its successors) while bounding output to O(n·max_partners) instead
    of O(n²) on duplicate-heavy buckets.

    ``all_pairs_cap``: COMPUTE bound per bucket, mirroring the minhash /
    simhash bucket-pair emitters (``dedup._BucketPairs`` /
    ``_HammingBucketPairs``): a bucket with more than this many distinct
    members (10M identical embeddings — hyperplanes cannot split
    identical vectors) min-links every member to the bucket minimum in
    O(n) dot products instead of the O(n²) all-pairs matmul. Min-links
    above the threshold still connect the whole cluster, so a
    transitive-closure dedup loses nothing; non-dedup callers that need
    every pair should raise the cap."""
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

    _verify = _bucket_verifier(
        threshold, max_partners, verify_chunk, all_pairs_cap
    )

    buckets = embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _BucketWithVec(), batch_format="pyarrow", batch_size=4096
    )
    pairs = buckets.groupby(["table_id", "bucket"]).map_groups(
        _verify, batch_format="pyarrow"
    )

    # dedup pairs found in multiple tables
    class _First:
        __name__ = "_First"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            return tbl.take(pa.array([0], pa.int64()))

    deduped = pairs.groupby(["id_a", "id_b"]).map_groups(
        _First(), batch_format="pyarrow"
    )
    # zero pairs ⇒ zero map_groups blocks ⇒ schema would be None
    return pin_schema(
        deduped,
        pa.schema(
            [("id_a", pa.int64()), ("id_b", pa.int64()), ("cosine", pa.float64())]
        ),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruning scale path
# ---------------------------------------------------------------------------

def train_ivf_centroids(
    embeddings_ds, n_clusters: int = 64, sample_size: int = 65536,
    n_iter: int = 10, seed: int = 42, emb_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (Lloyd, cosine assignment) on a bounded sample —
    the IVF coarse quantizer. The sample is the SMALL side (≤ sample_size
    rows through the driver, documented); at 100 TB the sample is still a
    fixed-size draw, never the corpus. Returns (n_clusters, d) normalized
    centroids."""
    rows = embeddings_ds.select_columns([emb_col]).limit(sample_size).take_all()
    m = _normalize(
        np.array([r[emb_col] for r in rows], dtype=np.float64)
    )
    rng = np.random.default_rng(seed)
    n_clusters = min(n_clusters, len(m))
    C = m[rng.choice(len(m), n_clusters, replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(m @ C.T, axis=1)
        sums = np.zeros_like(C)
        np.add.at(sums, assign, m)
        counts = np.bincount(assign, minlength=n_clusters)
        empty = counts == 0
        C = np.where(empty[:, None], C, sums / np.maximum(counts, 1)[:, None])
        C = _normalize(C)
    return C


def ivf_assign(
    embeddings_ds, centroids: np.ndarray, emb_col: str = "embedding",
):
    """Add an ``ivf_cell`` column (nearest centroid by cosine) — write
    the result partitioned by cell (``write_parquet(partition_cols=
    ["ivf_cell"])``) and later reads prune whole cells at the file
    listing, the IVF index proper."""
    import ray

    ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    class _Assign:
        __name__ = "_Assign"

        def __init__(self):
            self._c = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(ref)
            m = _normalize(_emb_matrix(tbl, emb_col))
            cell = np.argmax(m @ self._c.T, axis=1).astype(np.int32)
            return tbl.append_column("ivf_cell", pa.array(cell, pa.int32()))

    return embeddings_ds.map_batches(_Assign(), batch_format="pyarrow")


def knn_ivf(
    embeddings_ds,
    query_vectors: np.ndarray,
    k: int = 10,
    n_clusters: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: Optional[np.ndarray] = None,
):
    """IVF cosine top-k: score only rows whose cell is among the
    ``n_probe`` nearest centroids of SOME query (recall < 1, controlled
    by n_probe/n_clusters). One pass, no shuffle: each batch assigns its
    rows to cells, masks to probed cells, partial top-k, final per-query
    merge — same skeleton as knn_brute_force with candidate pruning.
    Pass precomputed ``centroids`` to reuse a trained quantizer."""
    import ray

    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings_ds, n_clusters, seed=seed, emb_col=emb_col
        )
    C = _normalize(np.asarray(centroids, dtype=np.float64))
    qn = _normalize(np.asarray(query_vectors, dtype=np.float64))
    probe = np.argpartition(-(qn @ C.T), min(n_probe, len(C)) - 1, axis=1)[
        :, : min(n_probe, len(C))
    ]
    allowed = np.zeros(len(C), dtype=bool)
    allowed[np.unique(probe)] = True
    ref = ray.put({"C": C, "q": qn, "allowed": allowed})

    class _IvfScore:
        __name__ = "_IvfScore"

        def __init__(self):
            self._s = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._s is None:
                self._s = ray.get(ref)
            C, q, allowed = self._s["C"], self._s["q"], self._s["allowed"]
            m = _normalize(_emb_matrix(tbl, emb_col))
            cell = np.argmax(m @ C.T, axis=1)
            keep = np.flatnonzero(allowed[cell])
            empty = pa.table(
                {
                    "qid": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                }
            )
            if not len(keep):
                return empty
            m = m[keep]
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)[keep]
            scores = m @ q.T  # (nb, nq)
            nb, nq = scores.shape
            kk = min(k, nb)
            top = np.argpartition(-scores, kk - 1, axis=0)[:kk]
            out_ids = ids[top.reshape(-1)]
            out_q = np.repeat(
                np.arange(nq, dtype=np.int64)[None, :], kk, axis=0
            ).reshape(-1)
            out_s = scores[top.reshape(-1), np.tile(np.arange(nq), kk)]
            return pa.table(
                {
                    "qid": pa.array(out_q, pa.int64()),
                    "id": pa.array(out_ids, pa.int64()),
                    "score": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings_ds.select_columns([id_col, emb_col]).map_batches(
        _IvfScore(), batch_format="pyarrow", batch_size=4096
    )

    class _FinalTopK:
        __name__ = "_FinalTopK"

        def __call__(self, tbl: pa.Table) -> pa.Table:
            s = tbl.column("score").to_numpy(zero_copy_only=False)
            ids = tbl.column("id").to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -s))[:k]
            return tbl.take(pa.array(order, pa.int64()))

    return partials.groupby("qid").map_groups(_FinalTopK(), batch_format="pyarrow")


def vector_mean_by_key(ds, key_col: str, emb_col: str = "embedding"):
    """Element-wise mean embedding per key — class centroids (the
    k-means / prototype primitive over an embedding column). Returns a
    Dataset of EXPLODED rows (key, pos, mean_val): scalar columns hash
    cleanly in any downstream compare and write to plain Parquet.

    Per block: one ``np.add.at`` scatter accumulates (key × dim) partial
    sums + counts (zero-copy flat-list → matrix via _emb_matrix); the
    only exchange is a hash-partitioned segment-sum over key·dim+pos
    composite keys — sums and counts merge in the SAME exchange, so the
    mean divides exactly once, at the end. Shuffle volume is
    O(distinct keys · dim) per block, independent of row count."""
    import pyarrow as pa

    from signal_collect_ray.algorithms.triangles import _np
    from signal_collect_ray.util import part_of, segment_sum

    def partial(tbl: pa.Table) -> pa.Table:
        m = _emb_matrix(tbl, emb_col).astype(np.float64)
        keys = _np(tbl, key_col).astype(np.int64)
        dim = m.shape[1]
        u, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros((len(u), dim))
        np.add.at(sums, inv, m)
        cnts = np.bincount(inv, minlength=len(u)).astype(np.float64)
        k2 = (u[:, None] * dim + np.arange(dim, dtype=np.int64)).ravel()
        return pa.table(
            {
                "gpart": pa.array(part_of(k2, 64), pa.int32()),
                "k2": pa.array(k2, pa.int64()),
                "s": pa.array(sums.ravel(), pa.float64()),
                "c": pa.array(np.repeat(cnts, dim), pa.float64()),
                "dim": pa.array(np.full(len(k2), dim, np.int64), pa.int64()),
            }
        )

    def final(tbl: pa.Table) -> pa.Table:
        k2 = _np(tbl, "k2")
        dim = int(tbl.column("dim")[0].as_py())
        ks, ss = segment_sum(k2, tbl.column("s").to_numpy(zero_copy_only=False))
        _, cs = segment_sum(k2, tbl.column("c").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                key_col: pa.array(ks // dim, pa.int64()),
                "pos": pa.array(ks % dim, pa.int64()),
                "mean_val": pa.array(ss / cs, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(final, batch_format="pyarrow")
    )


def pca_top_component(
    ds,
    emb_col: str = "embedding",
    iters: int = 30,
    tol: float = 1e-9,
    seed: int = 42,
):
    """Top principal component of an embedding column by distributed
    power iteration (classic numerical method — public literature).
    The covariance matvec never materializes the centered matrix:
    Cov·v = (1/n)·Σ_blocks Xᵀ(X v) − mean·(meanᵀv), so each iteration
    is ONE map_batches pass emitting a (d,)-vector partial per block
    (two BLAS-2 products on zero-copy Arrow floats) plus an O(d)
    driver fold — the 100-TB shape for d ≤ ~4k. The dataset is
    materialized once so the ``iters`` passes re-read object-store
    blocks, not parquet.

    Returns ``(component, eigenvalue, n)``: the unit eigenvector as
    float64 numpy (sign fixed: largest-|coord| entry positive), the
    explained variance (top eigenvalue of the sample covariance), and
    the row count."""
    ds = ds.select_columns([emb_col]).materialize()

    def stat_partial(tbl: pa.Table) -> pa.Table:
        x = _emb_matrix(tbl, emb_col).astype(np.float64)
        return pa.table(
            {
                "s": pa.array([x.sum(axis=0).tobytes()], pa.binary()),
                "n": pa.array([len(x)], pa.int64()),
            }
        )

    n = 0
    mean_sum = None
    for b in ds.map_batches(stat_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for buf, cnt in zip(b.column("s").to_pylist(), b.column("n").to_pylist()):
            v = np.frombuffer(buf, dtype=np.float64)
            mean_sum = v.copy() if mean_sum is None else mean_sum + v
            n += cnt
    if not n:
        raise ValueError("pca_top_component: empty dataset")
    mean = mean_sum / n
    d = len(mean)

    rng = np.random.default_rng(seed)
    v = rng.standard_normal(d)
    v /= np.linalg.norm(v)
    lam = 0.0
    import ray

    for _ in range(iters):
        vref = ray.put(v)

        def matvec_partial(tbl: pa.Table) -> pa.Table:
            x = _emb_matrix(tbl, emb_col).astype(np.float64)
            y = x.T @ (x @ ray.get(vref))
            return pa.table({"y": pa.array([y.tobytes()], pa.binary())})

        acc = np.zeros(d)
        for b in ds.map_batches(
            matvec_partial, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for buf in b.column("y").to_pylist():
                acc += np.frombuffer(buf, dtype=np.float64)
        s = acc / n - mean * float(mean @ v)
        lam = float(np.linalg.norm(s))
        if lam == 0.0:
            break
        s /= lam
        if abs(1.0 - abs(float(s @ v))) < tol:
            v = s
            break
        v = s
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    return v, lam, n


def pca_project(ds, component: np.ndarray, mean: "np.ndarray | None" = None,
                id_col: str = "vec_id", emb_col: str = "embedding",
                digits: int = 6):
    """Per-row projection score onto a (broadcast) principal component:
    one vectorized map_batches pass, no shuffle. Returns a Dataset
    ``(id_col, pc1)`` rounded to ``digits``."""
    import ray

    cref = ray.put((component.astype(np.float64),
                    None if mean is None else mean.astype(np.float64)))

    def proj(tbl: pa.Table) -> pa.Table:
        c, m = ray.get(cref)
        x = _emb_matrix(tbl, emb_col).astype(np.float64)
        if m is not None:
            x = x - m
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "pc1": pa.array(np.round(x @ c, digits), pa.float64()),
            }
        )

    return ds.select_columns([id_col, emb_col]).map_batches(
        proj, batch_format="pyarrow"
    )


def kmeans_lloyd(
    ds,
    k: int = 8,
    iters: int = 20,
    seed: int = 42,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 65536,
    tol: float = 1e-7,
    init: str = "sample",
):
    """Full-corpus Euclidean k-means (Lloyd 1982, public literature) —
    unlike ``train_ivf_centroids`` (sample-trained coarse quantizer)
    every iteration scans ALL rows: one ``map_batches`` pass emits a
    (k×d sums, k counts, inertia) partial per block (vectorized argmin
    over a broadcast centroid matrix), the driver folds k×d floats.
    ``init="sample"`` is a seeded draw from a bounded sample;
    ``init="maximin"`` is the deterministic Gonzalez farthest-point
    sweep over the same sample (start at row 0, repeatedly take the
    point farthest from its nearest chosen centroid, ties to the
    lower index) — on well-separated data it provably places one seed
    per cluster, which the planted-fixture oracle relies on. Empty
    clusters keep their previous centroid. Stops early when the max
    centroid shift drops below ``tol``.

    Returns ``(centroids, assignments_ds, inertia)`` where
    ``assignments_ds`` is a Dataset ``(id_col, cluster)`` from one
    final broadcast pass."""
    import ray

    ds = ds.select_columns([id_col, emb_col]).materialize()
    rows = ds.select_columns([emb_col]).limit(sample_size).take_all()
    m = np.array([r[emb_col] for r in rows], dtype=np.float64)
    k = min(k, len(m))
    if init == "maximin":
        picks = [0]
        d2min = ((m - m[0]) ** 2).sum(axis=1)
        while len(picks) < k:
            nxt = int(np.argmax(d2min))  # argmax ties → lowest index
            picks.append(nxt)
            d2min = np.minimum(d2min, ((m - m[nxt]) ** 2).sum(axis=1))
        C = m[picks].copy()
    elif init == "sample":
        rng = np.random.default_rng(seed)
        C = m[rng.choice(len(m), k, replace=False)].copy()
    else:
        raise ValueError(f"init must be sample|maximin, got {init!r}")
    inertia = float("inf")

    def _partials(cref):
        def fn(tbl: pa.Table) -> pa.Table:
            c = ray.get(cref)
            x = _emb_matrix(tbl, emb_col).astype(np.float64)
            d2 = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=len(c))
            j = float(d2[np.arange(len(x)), a].sum())
            return pa.table(
                {
                    "s": pa.array([sums.ravel().tobytes()], pa.binary()),
                    "n": pa.array([counts.tobytes()], pa.binary()),
                    "j": pa.array([j], pa.float64()),
                }
            )

        return fn

    for _ in range(iters):
        cref = ray.put(C)
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for b in ds.map_batches(
            _partials(cref), batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow", batch_size=None):
            for sb, nb, jb in zip(
                b.column("s").to_pylist(),
                b.column("n").to_pylist(),
                b.column("j").to_pylist(),
            ):
                sums += np.frombuffer(sb, dtype=np.float64).reshape(C.shape)
                counts += np.frombuffer(nb, dtype=np.int64)
                inertia += jb
        newC = np.where(
            (counts == 0)[:, None], C, sums / np.maximum(counts, 1)[:, None]
        )
        shift = float(np.abs(newC - C).max())
        C = newC
        if shift <= tol:
            break

    cref = ray.put(C)

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _emb_matrix(tbl, emb_col).astype(np.float64)
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "cluster": pa.array(np.argmin(d2, axis=1), pa.int64()),
            }
        )

    return C, ds.map_batches(assign, batch_format="pyarrow"), inertia


def intra_cluster_stats(
    ds, key_col: str = "label", emb_col: str = "embedding",
    id_col: str = "vec_id", digits: int = 6,
):
    """Per-cluster dispersion: mean squared distance of each vector to
    its own cluster centroid — the embedding-space quality diagnostic
    behind elbow plots and cluster drift monitors. Centroids come from
    ``vector_mean_by_key`` (rounded to ``digits`` so the SQL mirror can
    reproduce them exactly); the label×dim centroid matrix is the SMALL
    side (broadcast once), and one vectorized pass folds per-block
    per-label (Σd², n) partials into a tiny groupby.

    Returns a pyarrow-backed Dataset (label, n_vectors, avg_sq_dist)."""
    import ray
    from ray.data.aggregate import Sum

    rows = vector_mean_by_key(ds, key_col, emb_col).take_all()
    labels = sorted({r[key_col] for r in rows})
    dim = max(r["pos"] for r in rows) + 1
    lab_arr = np.array(labels, dtype=np.int64)
    C = np.zeros((len(labels), dim))
    lut = {l: i for i, l in enumerate(labels)}
    for r in rows:
        C[lut[r[key_col]], r["pos"]] = round(r["mean_val"], digits)
    ref = ray.put((lab_arr, C))

    def partial(tbl: pa.Table) -> pa.Table:
        la, c = ray.get(ref)
        x = _emb_matrix(tbl, emb_col).astype(np.float64)
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        li = np.searchsorted(la, keys)
        d2 = ((x - c[li]) ** 2).sum(axis=1)
        u, inv = np.unique(keys, return_inverse=True)
        s = np.bincount(inv, weights=d2)
        n = np.bincount(inv)
        return pa.table(
            {
                key_col: pa.array(u, pa.int64()),
                "s": pa.array(s, pa.float64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    agg = (
        ds.select_columns([id_col, key_col, emb_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n_vectors"))
    )

    def final(tbl: pa.Table) -> pa.Table:
        s = tbl.column("s").to_numpy(zero_copy_only=False)
        n = tbl.column("n_vectors").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: tbl.column(key_col),
                "n_vectors": tbl.column("n_vectors"),
                "avg_sq_dist": pa.array(np.round(s / n, digits), pa.float64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def semdedup(
    embeddings_ds,
    workdir: str,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 25,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_partners: int | None = 64,
    verify_chunk: int = 1024,
    all_pairs_cap: int = 4096,
    init: str = "sample",
):
    """SemDeDup (Abbas et al. 2023, public literature): semantic
    dedup by clustering THEN exact in-cluster cosine — the
    embedding-space sibling of MinHash dedup for training corpora.

    Scale shape: (1) k-means centroids from ``kmeans_lloyd`` (per-block
    partials, driver folds k×d floats); (2) ONE streaming pass assigns
    every row to its centroid — the centroid matrix rides the closure,
    so there is NO assignment join; (3) one hash exchange on the
    cluster id co-locates each cluster for the shared
    ``_bucket_verifier`` kernel (chunked matmul, degenerate clusters
    min-link above ``all_pairs_cap``); (4) transitive closure + min-id
    representative via the engine's own CC over the pair graph
    (``dedup.duplicate_ids_from_pairs``).

    Returns ``(pairs_ds, drop_ids_ds)``: near-dup pairs
    (id_a, id_b, cosine) and the non-representative ids to drop."""
    import ray

    from signal_collect_ray.functions.dedup import duplicate_ids_from_pairs

    C, _assign, _j = kmeans_lloyd(
        embeddings_ds,
        k=k,
        iters=iters,
        seed=seed,
        emb_col=emb_col,
        id_col=id_col,
        init=init,
    )
    cref = ray.put(C)

    def assign(tbl: pa.Table) -> pa.Table:
        c = ray.get(cref)
        x = _emb_matrix(tbl, emb_col).astype(np.float64)
        d2 = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return pa.table(
            {
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "id": tbl.column(id_col),
                "emb": tbl.column(emb_col).combine_chunks(),
            }
        )

    verifier = _bucket_verifier(
        threshold, max_partners, verify_chunk, all_pairs_cap
    )
    pairs = (
        embeddings_ds.select_columns([id_col, emb_col])
        .map_batches(assign, batch_format="pyarrow", batch_size=4096)
        .groupby("cluster")
        .map_groups(verifier, batch_format="pyarrow")
    )
    pairs = pin_schema(
        pairs,
        pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("cosine", pa.float64()),
            ]
        ),
    ).materialize()
    drops = duplicate_ids_from_pairs(pairs, workdir)
    return pairs, drops


def dbscan_cosine(
    embeddings_ds,
    workdir: str,
    threshold: float = 0.9,
    min_pts: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    num_partitions: int = 16,
):
    """DBSCAN over cosine similarity (Ester et al. 1996, public
    literature) — density clustering with noise, the classic
    complement to k-means/SemDeDup on embedding columns.

    ε-neighborhood = cosine ≥ ``threshold``; a CORE point has ≥
    ``min_pts`` points in its closed neighborhood (self included, the
    standard convention); clusters are the connected components of the
    core-core ε-graph (labeled by component min id via the engine's own
    ConnectedComponents, ``dedup.pair_cc_labels``); a BORDER point
    attaches to the minimum cluster label among its core ε-neighbors
    (deterministic tie-break); everything else is NOISE (label −1).

    Distribution shape: the ε-pair table comes from the exact all-pairs
    kernel below the broadcast cap (``embedding_pairs_exact``) — swap in
    the LSH-bucketed pair generator at scale, the downstream stages are
    pair-table-agnostic; degree counting and border attachment are
    per-block partials + one hash exchange; the core id set and the
    core label map are sorted-array broadcasts (ray.put once), bounded
    by the core count — the same gate-scale idiom as mis_validity, with
    the co-partitioned join as the documented 100-TB fallback.

    Returns a pyarrow Table (``id_col``, cluster:int64).
    """
    import ray

    from signal_collect_ray.functions.dedup import pair_cc_labels
    from signal_collect_ray.util import isin_sorted, part_of, segment_min

    pairs = embedding_pairs_exact(
        embeddings_ds, threshold, id_col=id_col, emb_col=emb_col
    ).materialize()

    # closed-neighborhood sizes: per-block partial counts, one exchange
    def deg_partial(tbl: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [
                tbl.column("id_a").to_numpy(zero_copy_only=False),
                tbl.column("id_b").to_numpy(zero_copy_only=False),
            ]
        )
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {
                "gpart": pa.array(part_of(u, num_partitions), pa.int32()),
                "id": pa.array(u, pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def deg_final(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("id").to_numpy(zero_copy_only=False)
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, c = ids[order], c[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        tot = np.add.reduceat(c, starts)
        return pa.table(
            {
                "id": pa.array(ids[starts], pa.int64()),
                "deg": pa.array(tot, pa.int64()),
            }
        )

    deg = (
        pairs.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(deg_final, batch_format="pyarrow")
    )
    def core_only(tbl: pa.Table) -> pa.Table:
        d = tbl.column("deg").to_numpy(zero_copy_only=False)
        keep = d >= (int(min_pts) - 1)  # closed neighborhood incl. self
        return pa.table(
            {"id": tbl.column("id").filter(pa.array(keep))}
        )

    core_ids = np.sort(
        np.concatenate(
            [
                b.column("id").to_numpy(zero_copy_only=False)
                for b in deg.map_batches(
                    core_only, batch_format="pyarrow"
                ).iter_batches(batch_format="pyarrow", batch_size=None)
            ]
            or [np.empty(0, np.int64)]
        )
    )
    core_ref = ray.put(core_ids)

    class _CorePairs:
        __name__ = "_CorePairs"

        def __init__(self, both: bool):
            self.both = both
            self._c = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(core_ref)
            a = tbl.column("id_a").to_numpy(zero_copy_only=False)
            b = tbl.column("id_b").to_numpy(zero_copy_only=False)
            ha, _ = isin_sorted(self._c, a)
            hb, _ = isin_sorted(self._c, b)
            if self.both:
                keep = ha & hb
                return pa.table(
                    {
                        "id_a": pa.array(a[keep], pa.int64()),
                        "id_b": pa.array(b[keep], pa.int64()),
                    }
                )
            # exactly one side core → (border candidate, its core nbr)
            keep = ha ^ hb
            border = np.where(ha[keep], b[keep], a[keep])
            corenb = np.where(ha[keep], a[keep], b[keep])
            return pa.table(
                {
                    "gpart": pa.array(part_of(border, num_partitions), pa.int32()),
                    "border": pa.array(border, pa.int64()),
                    "corenb": pa.array(corenb, pa.int64()),
                }
            )

    core_pairs = pairs.map_batches(
        _CorePairs(True), batch_format="pyarrow"
    ).materialize()
    lab_parts = (
        pair_cc_labels(core_pairs, f"{workdir}/dbscan_cc").take_all()
        if core_pairs.count()
        else []
    )
    lab_ids = np.array([r["id"] for r in lab_parts], np.int64)
    lab_lab = np.array([r["label"] for r in lab_parts], np.int64)
    order = np.argsort(lab_ids, kind="stable")
    lab_ids, lab_lab = lab_ids[order], lab_lab[order]
    # isolated cores (≥ min_pts neighbors, all of them border) form
    # their own singleton clusters
    iso = core_ids[~isin_sorted(lab_ids, core_ids)[0]]
    lab_ids = np.concatenate([lab_ids, iso])
    lab_lab = np.concatenate([lab_lab, iso])
    order = np.argsort(lab_ids, kind="stable")
    lab_ids, lab_lab = lab_ids[order], lab_lab[order]
    lab_ref = ray.put((lab_ids, lab_lab))

    class _BorderLabel:
        __name__ = "_BorderLabel"

        def __init__(self):
            self._m = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._m is None:
                self._m = ray.get(lab_ref)
            li, ll = self._m
            border = tbl.column("border").to_numpy(zero_copy_only=False)
            corenb = tbl.column("corenb").to_numpy(zero_copy_only=False)
            hit, pos = isin_sorted(li, corenb)
            b, lab = segment_min(border[hit], ll[pos[hit]])
            return pa.table(
                {
                    "id": pa.array(b, pa.int64()),
                    "label": pa.array(lab.astype(np.int64), pa.int64()),
                }
            )

    border_lab = (
        pairs.map_batches(_CorePairs(False), batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(_BorderLabel(), batch_format="pyarrow")
    )
    bparts = border_lab.take_all()
    b_ids = np.sort(np.array([r["id"] for r in bparts], np.int64))
    b_lab = np.array(
        [r["label"] for r in sorted(bparts, key=lambda r: r["id"])], np.int64
    )

    b_ref = ray.put((b_ids, b_lab))

    class _Assign:
        __name__ = "_Assign"

        def __init__(self):
            self._m = None

        def __call__(self, tbl: pa.Table) -> pa.Table:
            if self._m is None:
                self._m = (ray.get(lab_ref), ray.get(b_ref))
            (li, ll), (bi, bl) = self._m
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            out = np.full(len(ids), -1, np.int64)
            bhit, bpos = isin_sorted(bi, ids)
            out[bhit] = bl[bpos[bhit]]
            hit, pos = isin_sorted(li, ids)
            out[hit] = ll[pos[hit]]
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "cluster": pa.array(out, pa.int64()),
                }
            )

    out = embeddings_ds.select_columns([id_col]).map_batches(
        _Assign(), batch_format="pyarrow"
    )
    tbls = [b for b in out.iter_batches(batch_format="pyarrow", batch_size=None)]
    return pa.concat_tables(tbls) if tbls else pa.table(
        {id_col: pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
    )
