"""Deduplication family for training-data pipelines.

Every variant follows the scale pattern from the Ray Data guide: a
vectorized per-batch fingerprint/sketch stage, a groupby on the
fingerprint (the only shuffle), and per-group winner selection. Keys are
content hashes, so hub skew is bounded by true duplicate multiplicity.

* exact: normalized-text hash → hash-partition → keep min doc_id
* minhash_lsh: shingle → minhash → band buckets → candidate pairs →
  Jaccard verify (classic MinHash+LSH; Broder 1997 / MMDS ch.3)
* simhash: 64-bit simhash (Charikar 2002), duplicates = identical keys
  on rotated prefixes (hamming-adjacent buckets)
* ngram_jaccard: exact n-gram Jaccard verification for candidate pairs
* embedding cosine near-dup: see functions/similarity.py
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import segment_starts

_MERSENNE = (1 << 61) - 1


def _norm(t: str) -> str:
    return " ".join((t or "").lower().split())


def _hash64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big"
    ) & 0x7FFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

class _ExactKey:
    __name__ = "_ExactKey"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        keys = [
            _hash64(_norm(t)) for t in tbl.column("text").to_pylist()
        ]
        return tbl.append_column("content_hash", pa.array(keys, pa.int64()))


class _KeepMinId:
    __name__ = "_KeepMinId"

    def __init__(self, id_col: str):
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        return tbl.take(pa.array([int(np.argmin(ids))], pa.int64()))


def dedup_exact(docs_ds, id_col: str = "doc_id"):
    """Exact dedup on normalized text; keeps the min-id representative.

    hash → groupby(content_hash) → first (min id). One shuffle whose key
    cardinality ≈ distinct documents."""
    keyed = docs_ds.map_batches(_ExactKey(), batch_format="pyarrow")
    return (
        keyed.groupby("content_hash")
        .map_groups(_KeepMinId(id_col), batch_format="pyarrow")
        .drop_columns(["content_hash"])
    )


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def _shingles(text: str, k: int = 5) -> np.ndarray:
    """Word k-shingle 64-bit hashes of normalized text."""
    words = _norm(text).split()
    if len(words) < k:
        return np.array([_hash64(" ".join(words))], dtype=np.uint64)
    return np.array(
        [_hash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)],
        dtype=np.uint64,
    )


class MinHasher:
    """Per-batch minhash signatures: ``num_perm`` universal-hash permutations
    h_i(x) = (a_i x + b_i) mod p over shingle hashes (vectorized)."""

    __name__ = "MinHasher"

    def __init__(self, num_perm: int = 64, shingle_k: int = 5, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) permuted values; min over shingles
            vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(
                _MERSENNE
            )
        return vals.min(axis=1)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        sigs = np.stack(
            [self.signature(t) for t in tbl.column("text").to_pylist()]
        ).astype(np.int64)
        off = np.arange(0, (len(tbl) + 1) * self.num_perm, self.num_perm, dtype=np.int32)
        col = pa.ListArray.from_arrays(
            pa.array(off), pa.array(sigs.reshape(-1), pa.int64())
        )
        return tbl.append_column("minhash", col)


class _BandEmit:
    """signature → one (band_id, band_hash, id) row per band."""

    __name__ = "_BandEmit"

    def __init__(self, num_bands: int, id_col: str):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        mh = tbl.column("minhash").combine_chunks()
        sig = mh.values.to_numpy(zero_copy_only=False).reshape(len(tbl), -1)
        rows_per = sig.shape[1] // self.num_bands
        ids = tbl.column(self.id_col).to_numpy(zero_copy_only=False)
        band_ids, band_hashes, out_ids = [], [], []
        for b in range(self.num_bands):
            chunk = sig[:, b * rows_per : (b + 1) * rows_per]
            hashes = np.array(
                [_hash64(chunk[i].tobytes().hex()) for i in range(len(chunk))],
                dtype=np.int64,
            )
            band_ids.append(np.full(len(chunk), b, dtype=np.int32))
            band_hashes.append(hashes)
            out_ids.append(ids)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(band_ids), pa.int32()),
                "band_hash": pa.array(np.concatenate(band_hashes), pa.int64()),
                "id": pa.array(np.concatenate(out_ids), pa.int64()),
            }
        )


class _BucketPairs:
    """bucket group → candidate pairs (smaller id first, deduped)."""

    __name__ = "_BucketPairs"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = np.unique(tbl.column("id").to_numpy(zero_copy_only=False))
        if len(ids) < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        # pair every member with the bucket minimum — enough to link the
        # duplicate cluster (transitive closure via CC if needed)
        a = np.full(len(ids) - 1, ids[0], dtype=np.int64)
        return pa.table(
            {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(ids[1:], pa.int64())}
        )


def minhash_lsh_candidates(
    docs_ds, id_col: str = "doc_id", num_perm: int = 64, num_bands: int = 16,
    shingle_k: int = 5, seed: int = 42,
):
    """documents → candidate near-duplicate pairs (id_a < id_b, distinct).

    shingle→minhash per batch (vectorized), band→bucket groupby (the
    shuffle), min-link pairs per bucket, global pair dedup."""
    sigs = docs_ds.select_columns([id_col, "text"]).map_batches(
        MinHasher(num_perm, shingle_k, seed), batch_format="pyarrow"
    )
    bands = sigs.map_batches(_BandEmit(num_bands, id_col), batch_format="pyarrow")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        _BucketPairs(), batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda t: t.take(pa.array([0], pa.int64())), batch_format="pyarrow"
    )


# Above this many candidate pairs the verify joins texts via two
# co-partitioned attach shuffles; below it the involved texts (≤ 2·pairs)
# are broadcast once through the object store.
BROADCAST_PAIR_LIMIT = 500_000
# ... and regardless of pair count, the broadcast text map may not
# exceed this many bytes on the driver — past it the join path streams
# texts with no driver materialization.
BROADCAST_TEXT_BYTES_LIMIT = 1 << 30


def _verify_batch(tbl: pa.Table, lookup, shingle_k: int, threshold: float) -> pa.Table:
    ta = lookup(tbl, "a")
    tb = lookup(tbl, "b")
    jac = np.empty(len(ta))
    for i, (x, y) in enumerate(zip(ta, tb)):
        sa, sb = set(_shingles(x, shingle_k)), set(_shingles(y, shingle_k))
        inter = len(sa & sb)
        jac[i] = inter / max(len(sa | sb), 1)
    out = tbl.select(["id_a", "id_b"]).append_column(
        "jaccard", pa.array(jac, pa.float64())
    )
    keep = np.flatnonzero(jac >= threshold)
    return out.take(pa.array(keep, pa.int64()))


def jaccard_verify(
    docs_ds, pairs_ds, id_col: str = "doc_id", shingle_k: int = 5,
    threshold: float = 0.8,
):
    """Exact n-gram Jaccard over candidate pairs.

    Small candidate sets (≤ BROADCAST_PAIR_LIMIT, the common case after
    LSH): one semi-join filter pass over the corpus gathers the involved
    texts (≤ 2·pairs rows), ``ray.put`` once, verify in a stateless
    map over the pairs. Large candidate sets fall back to two explicit
    co-partitioned attach shuffles — no driver materialization."""
    texts = docs_ds.select_columns([id_col, "text"])
    pairs_small = pairs_ds.materialize()
    n_pairs = pairs_small.count()

    if n_pairs <= BROADCAST_PAIR_LIMIT:
        import ray

        pair_tbl = pa.concat_tables(
            list(pairs_small.iter_batches(batch_format="pyarrow", batch_size=None))
        ) if n_pairs else pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        need = np.unique(
            np.concatenate(
                [
                    pair_tbl.column("id_a").to_numpy(zero_copy_only=False),
                    pair_tbl.column("id_b").to_numpy(zero_copy_only=False),
                ]
            )
        ) if n_pairs else np.empty(0, np.int64)
        need_ref = ray.put(need)

        def semi(tbl: pa.Table) -> pa.Table:
            ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
            n = ray.get(need_ref)
            pos = np.searchsorted(n, ids)
            pos_c = np.minimum(pos, max(len(n) - 1, 0))
            hit = (len(n) > 0) & (pos < len(n))
            hit = hit & (n[pos_c] == ids) if len(n) else np.zeros(len(ids), bool)
            return tbl.take(pa.array(np.flatnonzero(hit), pa.int64()))

        involved = texts.map_batches(semi, batch_format="pyarrow")
        tmap = {}
        total_bytes = 0
        for b in involved.iter_batches(batch_format="pyarrow", batch_size=None):
            for i, t in zip(b.column(id_col).to_pylist(), b.column("text").to_pylist()):
                tmap[i] = t
                total_bytes += len(t or "")
            if total_bytes > BROADCAST_TEXT_BYTES_LIMIT:
                # the candidates are few but their texts are huge —
                # don't hold them on the driver; stream via the joins.
                tmap = None
                break
        if tmap is not None:
            tmap_ref = ray.put(tmap)

            def verify(tbl: pa.Table) -> pa.Table:
                tm = ray.get(tmap_ref)

                def lookup(t, side):
                    return [tm.get(i, "") for i in t.column(f"id_{side}").to_pylist()]

                return _verify_batch(tbl, lookup, shingle_k, threshold)

            return pairs_small.map_batches(verify, batch_format="pyarrow")

    # join fallback: pair rows routed with both texts via attach passes
    from signal_collect_ray.algorithms.triangles import _attach

    a_side = _attach(
        pairs_small, "id_a",
        texts.rename_columns({"text": "text_a", id_col: "aid"}), "aid", ["text_a"],
    )
    b_side = _attach(
        a_side, "id_b",
        texts.rename_columns({"text": "text_b", id_col: "bid"}), "bid", ["text_b"],
    )

    def verify_joined(tbl: pa.Table) -> pa.Table:
        def lookup(t, side):
            return t.column(f"text_{side}").to_pylist()

        return _verify_batch(tbl, lookup, shingle_k, threshold)

    return b_side.map_batches(verify_joined, batch_format="pyarrow")


def dedup_minhash(docs_ds, id_col: str = "doc_id", threshold: float = 0.8, **kw):
    """Near-dup dedup: LSH candidates → Jaccard verify → drop the larger
    id of each verified pair (cluster-min retention via min-link pairs)."""
    pairs = minhash_lsh_candidates(docs_ds, id_col, **kw)
    verified = jaccard_verify(docs_ds, pairs, id_col, threshold=threshold)
    dupes = verified.select_columns(["id_b"]).rename_columns({"id_b": id_col})
    from signal_collect_ray.algorithms.triangles import _attach  # noqa: F401

    dupe_ids = {r[id_col] for r in dupes.take_all()}

    def drop(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(~np.isin(ids, np.fromiter(dupe_ids, np.int64, len(dupe_ids)) if dupe_ids else np.empty(0, np.int64)))
        return tbl.take(pa.array(keep, pa.int64()))

    return docs_ds.map_batches(drop, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit simhash over word-shingle hashes (Charikar 2002)."""

    __name__ = "SimHasher"

    def __init__(self, shingle_k: int = 3):
        self.k = shingle_k

    def simhash(self, text: str) -> int:
        sh = _shingles(text, self.k)
        bits = ((sh[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        with np.errstate(over="ignore"):
            for b in range(64):
                if v[b] > 0:
                    out |= np.uint64(1) << np.uint64(b)
        return int(out & np.uint64(0x7FFFFFFFFFFFFFFF))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        hs = [self.simhash(t) for t in tbl.column("text").to_pylist()]
        return tbl.append_column("simhash", pa.array(hs, pa.int64()))


def simhash_signatures(docs_ds, shingle_k: int = 3):
    return docs_ds.map_batches(SimHasher(shingle_k), batch_format="pyarrow")
