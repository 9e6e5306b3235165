"""Distributed cardinality sketches — HyperLogLog approximate
distinct counting (Flajolet et al. 2007, public literature).

Exact distinct counting shuffles every value (``groupby(key)`` or the
two-phase partial the ``distinct_users_per_event`` query uses); at
10^12-row scale the HLL sketch replaces that exchange with a
fixed-size (2^p bytes) register vector per block that merges by
element-wise MAX — the canonical mergeable sketch: per-block partials,
one tiny reduction, no data shuffle at all. p=12 → 4 KiB registers,
~1.04/√4096 ≈ 1.6 % standard error.

Hashing is the engine's own splitmix64 finalizer (``util.mix64``) over
int64 keys — deterministic across runs/partitioning, so estimates are
reproducible bit-for-bit (pinned in tests); string keys hash via a
per-batch vectorized FNV-over-bytes fallback.

Estimator: the standard bias-corrected HLL with the small-range
(linear counting) correction; no sparse mode — at the scales this
matters the dense path is already tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import mix64


def _hash_col(arr) -> np.ndarray:
    """uint64 hashes of an Arrow array (int-like via mix64; strings via
    md5 of UTF-8 bytes, truncated to 64 bits)."""
    if pa.types.is_integer(arr.type):
        return mix64(arr.to_numpy(zero_copy_only=False).astype(np.uint64))
    import hashlib

    vals = arr.to_pylist()
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big"
            )
            for v in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )


def _registers(h: np.ndarray, p: int) -> np.ndarray:
    """Dense HLL register vector (uint8[2^p]) for a batch of hashes."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    # rho = leading-zero count of the (64-p)-bit suffix + 1;
    # integers below 2^53 are exact in float64, and 64-p ≤ 52
    nz = w > 0
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    rho[nz] = (64 - p) - np.floor(np.log2(w[nz].astype(np.float64))).astype(
        np.int64
    )
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray, p: int) -> float:
    """HLL estimate with the register sum Σ2^-M lifted to the EXACT
    integer Σ2^(64−M) (addition-order-independent, so the value is
    bit-identical no matter how partials merged — and SQL-mirrorable);
    the only float ops are the final alpha/division/ln. 2^64·Σ2^-M is
    an exact power-of-two rescale, so this equals the float form to the
    last ulp for p ≤ 12 while also covering rho > 53 (small p)."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    counts = np.bincount(regs, minlength=1)
    s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    e = alpha * m * m * float(1 << 64) / float(s_int)
    zeros = int(counts[0])
    if e <= 2.5 * m and zeros > 0:
        e = m * np.log(m / zeros)
    return float(e)


def approx_distinct(ds, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): per-block registers → one
    max-merge reduction (a tree of tiny fixed-size vectors), never a
    value shuffle."""

    def partial(tbl: pa.Table) -> pa.Table:
        regs = _registers(_hash_col(tbl.column(col).combine_chunks()), p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for r in b.column("regs").to_pylist():
            np.maximum(merged, np.asarray(r, dtype=np.uint8), out=merged)
    return _estimate(merged, p)


def approx_distinct_by_key(ds, key: str, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) GROUP BY key. Per-block partial
    registers per key bound the exchange to (distinct keys per block) ×
    2^p bytes; one groupby(key) max-merges and estimates. Returns a
    Dataset of (key, approx_n)."""

    def partial(tbl: pa.Table) -> pa.Table:
        keys = tbl.column(key).to_pylist()
        h = _hash_col(tbl.column(col).combine_chunks())
        uniq = {}
        for i, k in enumerate(keys):
            uniq.setdefault(k, []).append(i)
        out_k, out_r = [], []
        for k, idxs in uniq.items():
            out_k.append(k)
            out_r.append(_registers(h[np.asarray(idxs)], p))
        return pa.table(
            {
                key: pa.array(out_k, tbl.schema.field(key).type),
                "regs": pa.array(out_r, pa.list_(pa.uint8())),
            }
        )

    def merge(tbl: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for r in tbl.column("regs").to_pylist():
            np.maximum(regs, np.asarray(r, dtype=np.uint8), out=regs)
        return pa.table(
            {
                key: tbl.column(key).slice(0, 1),
                "approx_n": pa.array([_estimate(regs, p)], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Bloom filter — approximate membership for billion-key anti-joins.
# ---------------------------------------------------------------------------

def _bloom_hashes(h: np.ndarray, k: int, num_bits: int):
    """k bit positions per key via double hashing (Kirsch–Mitzenmacher
    2006, public literature): pos_i = (h1 + i·h2) mod m."""
    h1 = h % np.uint64(num_bits)
    h2 = mix64(h ^ np.uint64(0x9E3779B97F4A7C15)) % np.uint64(num_bits - 1) + np.uint64(1)
    for i in range(k):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)


def bloom_build(ds, col: str, num_bits: int = 1 << 20, k: int = 7) -> np.ndarray:
    """Build a Bloom filter over ``ds[col]`` — per-block partial bit
    arrays OR-merged (the mergeable-sketch pattern: fixed-size partials,
    no key shuffle). Returns a packed uint64 bit array of
    ``num_bits / 64`` words. Size it ~10 bits/key for ~1 % FPR.

    This is the 100-TB shape of ``dedup.drop_ids``'s broadcast: a
    billion dupe ids no longer fit a sorted int64 broadcast (8 GB), but
    their 10-bit/key Bloom image (~1.2 GB) does — membership then has
    no false NEGATIVES, so every true duplicate is still dropped, and
    the ~1 % false-positive overdrop is acceptable for corpus dedup (or
    verified exactly afterwards on the tiny flagged subset)."""
    words = num_bits // 64

    def partial(tbl: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        h = _hash_col(tbl.column(col).combine_chunks())
        for pos in _bloom_hashes(h, k, num_bits):
            np.bitwise_or.at(
                bits, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
        return pa.table({"bits": pa.array([bits], pa.list_(pa.uint64()))})

    merged = np.zeros(words, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for r in b.column("bits").to_pylist():
            np.bitwise_or(merged, np.asarray(r, dtype=np.uint64), out=merged)
    return merged


def bloom_contains(bits: np.ndarray, arr, k: int = 7) -> np.ndarray:
    """Vectorized membership test (no false negatives)."""
    num_bits = len(bits) * 64
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    h = _hash_col(arr)
    hit = np.ones(len(h), dtype=bool)
    for pos in _bloom_hashes(h, k, num_bits):
        word = bits[pos // 64]
        hit &= (word >> (pos % 64).astype(np.uint64)) & np.uint64(1) != 0
    return hit


def bloom_drop_ids(ds, dupes_ds, id_col: str = "doc_id",
                   num_bits: int = 1 << 20, k: int = 7):
    """Approximate anti-join: drop rows of ``ds`` whose id is (probably)
    in ``dupes_ds`` — every true member IS dropped (no false
    negatives); ~(1-e^{-kn/m})^k of the survivors are overdropped.
    One fixed-size broadcast via ``ray.put``, no shuffle."""
    import ray

    bits = bloom_build(dupes_ds, "id", num_bits=num_bits, k=k)
    ref = ray.put(bits)

    def drop(tbl: pa.Table) -> pa.Table:
        b = ray.get(ref)
        hit = bloom_contains(b, tbl.column(id_col).combine_chunks(), k=k)
        return tbl.filter(pa.array(~hit))

    return ds.map_batches(drop, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Space-Saving / Misra–Gries heavy hitters — mergeable top-k counts.
# ---------------------------------------------------------------------------

def _mg_merge(counters: dict, items, counts, capacity: int):
    """Fold (items, counts) into a Misra–Gries counter dict of bounded
    size, decrementing all by the evicted minimum when over capacity
    (Misra & Gries 1982; Metwally's Space-Saving merge — public
    literature)."""
    for it, c in zip(items, counts):
        if it in counters:
            counters[it] += int(c)
        else:
            counters[it] = int(c)
    if len(counters) > capacity:
        # evict smallest so that `capacity` remain; subtract the
        # (capacity+1)-th largest count from the survivors
        vals = sorted(counters.values(), reverse=True)
        cut = vals[capacity]
        counters2 = {
            it: c - cut for it, c in counters.items() if c - cut > 0
        }
        counters.clear()
        counters.update(counters2)
    return counters


def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 256):
    """Approximate top-k most frequent values with bounded memory: each
    block reduces to ≤ ``capacity`` Misra–Gries counters (np.unique per
    block, then the bounded fold), partials merge driver-side (tiny,
    fixed-size). Estimated counts undercount by at most N/capacity, so
    with capacity ≫ k·(skew factor) the top-k SET and ORDER match the
    exact counts — pinned in tests on Zipf data. Returns a pyarrow
    Table (value, approx_count) ordered by (count desc, value asc)."""

    def partial(tbl: pa.Table) -> pa.Table:
        arr = tbl.column(col).combine_chunks()
        if pa.types.is_integer(arr.type):
            vals, counts = np.unique(
                arr.to_numpy(zero_copy_only=False), return_counts=True
            )
            vals = vals.tolist()
        else:
            import collections

            c = collections.Counter(arr.to_pylist())
            vals, counts = list(c.keys()), np.fromiter(
                c.values(), dtype=np.int64, count=len(c)
            )
        counters = _mg_merge({}, vals, counts, capacity)
        return pa.table(
            {
                "item": pa.array(list(counters.keys()), arr.type),
                "cnt": pa.array(list(counters.values()), pa.int64()),
            }
        )

    counters: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        counters = _mg_merge(
            counters,
            b.column("item").to_pylist(),
            b.column("cnt").to_numpy(zero_copy_only=False),
            capacity,
        )
    top = sorted(counters.items(), key=lambda t: (-t[1], t[0]))[:k]
    return pa.table(
        {
            "value": pa.array([t[0] for t in top]),
            "approx_count": pa.array([t[1] for t in top], pa.int64()),
        }
    )


def _cm_rows(h: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(n,) hashes → (depth, n) bucket indices via independent
    splitmix64 re-mixes (seed = row index folded into the key)."""
    idx = np.empty((depth, len(h)), dtype=np.int64)
    hu = h.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        for d in range(depth):
            seed = np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
            idx[d] = (mix64(hu ^ seed) % np.uint64(width)).astype(np.int64)
    return idx


def cm_build(ds, col: str, depth: int = 4, width: int = 1 << 12) -> np.ndarray:
    """Count-Min sketch of a column (Cormode & Muthukrishnan 2005,
    public literature): a (depth × width) counter matrix where every
    value increments one counter per row. Mergeable by element-wise
    SUM — per-block partial sketches reduce driver-side with no data
    shuffle (the same shape as ``approx_distinct`` / ``bloom_build``).
    Point estimates (``cm_estimate``) NEVER undercount and overcount
    by ≤ e·N/width with probability ≥ 1 − e^-depth."""

    def partial(tbl: pa.Table) -> pa.Table:
        h = _hash_col(tbl.column(col))
        sk = np.zeros((depth, width), dtype=np.int64)
        rows = _cm_rows(h, depth, width)
        for d in range(depth):
            np.add.at(sk[d], rows[d], 1)
        return pa.table({"sk": pa.array([sk.ravel().tobytes()], pa.binary())})

    sk = np.zeros(depth * width, dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for buf in b.column("sk").to_pylist():
            sk += np.frombuffer(buf, dtype=np.int64)
    return sk.reshape(depth, width)


def cm_estimate(sketch: np.ndarray, arr) -> np.ndarray:
    """Point-frequency estimates (min over rows) for the queried
    values. ``arr`` is a pyarrow array / numpy int64s / python list."""
    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
        arr = pa.array(arr)
    h = _hash_col(arr)
    depth, width = sketch.shape
    rows = _cm_rows(h, depth, width)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        est = np.minimum(est, sketch[d][rows[d]])
    return est


def approx_quantiles_binned(ds, col: str, qs, bins: int = 4096):
    """Mergeable approximate quantiles via a fixed-width histogram
    (the classic two-pass binned sketch; public technique): pass 1
    folds per-block (min, max); pass 2 folds per-block ``bins``-cell
    counts (merge = element-wise SUM, like the Count-Min rows). The
    reported quantile is the LOWER EDGE of the first bin whose
    cumulative count reaches ⌈q·n⌉ — a deterministic definition with
    error ≤ (max−min)/bins that an SQL mirror reproduces exactly,
    unlike rank-interpolating sketches. For exact quantiles over
    discrete keys use ``aggregations.exact_quantiles_int``.

    Returns a pyarrow Table (q, approx_value) rounded to 6."""

    def minmax(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([v.min()], pa.float64()),
                         "mx": pa.array([v.max()], pa.float64()),
                         "n": pa.array([len(v)], pa.int64())})

    sel = ds.select_columns([col]).materialize()
    mn, mx, n = np.inf, -np.inf, 0
    for b in sel.map_batches(minmax, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for r in b.to_pylist():
            mn, mx, n = min(mn, r["mn"]), max(mx, r["mx"]), n + r["n"]
    if n == 0:
        raise ValueError("approx_quantiles_binned: no non-null values")
    width = (mx - mn) / bins if mx > mn else 1.0

    def hist(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.minimum(
            ((v - mn) / width).astype(np.int64), bins - 1
        )
        h = np.bincount(idx, minlength=bins)
        return pa.table({"h": pa.array([h.tobytes()], pa.binary())})

    h = np.zeros(bins, dtype=np.int64)
    for b in sel.map_batches(hist, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for buf in b.column("h").to_pylist():
            h += np.frombuffer(buf, dtype=np.int64)
    cum = np.cumsum(h)
    out_q, out_v = [], []
    for q in qs:
        target = max(1, int(np.ceil(q * n)))
        bin_i = int(np.searchsorted(cum, target))
        out_q.append(float(q))
        out_v.append(round(mn + bin_i * width if mx > mn else mn, 6))
    return pa.table(
        {
            "q": pa.array(out_q, pa.float64()),
            "approx_value": pa.array(out_v, pa.float64()),
        }
    )


def quantile_bucket(
    ds, id_col: str, col: str, n_buckets: int = 4, bins: int = 4096
):
    """Equi-depth bucketing: assign every row the quantile bucket of
    its ``col`` value, with bucket edges from the deterministic binned
    sketch (``approx_quantiles_binned`` at q = i/n_buckets) — the
    discretization step before stratified balancing or per-decile
    analyses. One extra broadcast-edges pass over the data; the edges
    themselves cost the two fixed-size sketch passes. Bucket b means
    ``edge_b <= value < edge_{b+1}`` (values below edge_1 get 0, at or
    above edge_{n-1} get n_buckets-1) — exactly reproducible in SQL
    from the same sketch definition.

    Returns a Dataset (id_col, bucket)."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_tbl = approx_quantiles_binned(ds, col, qs, bins=bins)
    edges = np.array(edges_tbl.column("approx_value").to_pylist())

    def assign(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(edges, v, side="right")
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "bucket": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, col]).map_batches(
        assign, batch_format="pyarrow"
    )
