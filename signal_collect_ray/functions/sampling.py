"""Deterministic sampling for training-data pipelines.

``hash_sample`` keeps a row iff the first 32 bits of
``md5(f"{seed}:{key}")`` fall below ``rate · 2³²`` — the canonical
reproducible train/validation split: stable across runs, machines,
repartitioning, and engines (the DuckDB oracle computes the identical
predicate), and composable (disjoint seed values give independent
samples; ``rate`` buckets nest, so a 1% sample is a subset of the 10%
sample taken with the same seed). Pure map — no shuffle, no driver
state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class _HashSampleFilter:
    __name__ = "_HashSampleFilter"

    def __init__(self, key: str, rate: float, seed: int):
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate must be in [0, 1], got {rate}")
        self.key = key
        self.thresh = int(rate * (1 << 32))
        self.prefix = f"{seed}:".encode("utf-8")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column(self.key).to_pylist()
        pre = self.prefix
        keep = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(pre + str(i).encode("utf-8")).digest()[:4],
                    "big",
                )
                < self.thresh
                for i in ids
            ),
            dtype=bool,
            count=len(ids),
        )
        return tbl.filter(pa.array(keep))


def hash_sample(ds, key: str = "doc_id", rate: float = 0.1, seed: int = 42):
    """Keep ~``rate`` of rows, deterministically by ``key`` (see module
    docstring). One C-level md5 per row, same cost class as
    ``text.Fingerprint``."""
    return ds.map_batches(
        _HashSampleFilter(key, rate, seed), batch_format="pyarrow"
    )


class _StratifiedSampleFilter:
    __name__ = "_StratifiedSampleFilter"

    def __init__(self, key, stratum_col, rates, default_rate, seed):
        for r in list(rates.values()) + [default_rate]:
            if not 0.0 <= r <= 1.0:
                raise ValueError(f"rate must be in [0, 1], got {r}")
        self.key = key
        self.stratum_col = stratum_col
        self.thresh = {s: int(r * (1 << 32)) for s, r in rates.items()}
        self.default_thresh = int(default_rate * (1 << 32))
        self.prefix = f"{seed}:".encode("utf-8")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ids = tbl.column(self.key).to_pylist()
        strata = tbl.column(self.stratum_col).to_pylist()
        pre = self.prefix
        th = self.thresh
        dt = self.default_thresh
        keep = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(pre + str(i).encode("utf-8")).digest()[:4],
                    "big",
                )
                < th.get(s, dt)
                for i, s in zip(ids, strata)
            ),
            dtype=bool,
            count=len(ids),
        )
        return tbl.filter(pa.array(keep))


def stratified_sample(
    ds,
    stratum_col: str,
    rates: dict,
    default_rate: float = 1.0,
    key: str = "doc_id",
    seed: int = 42,
):
    """Per-stratum deterministic downsampling — the corpus-rebalancing
    op (e.g. cap the dominant language at 10%, keep the rest whole).
    Same md5 predicate as ``hash_sample`` with the threshold chosen by
    the row's stratum: still a pure map (no shuffle), still nesting
    (a stratum's 1% sample ⊂ its 10% sample under the same seed), and
    the per-row hash depends only on ``key``, so changing one stratum's
    rate never reshuffles which rows OTHER strata keep."""
    return ds.map_batches(
        _StratifiedSampleFilter(key, stratum_col, rates, default_rate, seed),
        batch_format="pyarrow",
    )


def weighted_sample(ds, weight_col: str, k: int, key: str = "doc_id",
                    seed: int = 42):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    public — the A-ES one-pass scheme): each row gets
    ``score = u^(1/w)`` with u a deterministic md5-derived uniform in
    (0,1), and the k largest scores are the sample. Deterministic across
    runs/partitionings (same md5 predicate family as hash_sample),
    single streaming pass + the bounded top-k exchange of
    grouped_top_k. Rows with w ≤ 0 are excluded. Returns (key,
    weight_col, score) for the k sampled rows."""
    from signal_collect_ray.functions.aggregations import grouped_top_k

    prefix = f"{seed}:".encode("utf-8")

    def score(tbl: pa.Table) -> pa.Table:
        ids = tbl.column(key).to_pylist()
        w = tbl.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(prefix + str(i).encode("utf-8")).digest()[:4],
                    "big",
                )
                for i in ids
            ),
            dtype=np.float64,
            count=len(ids),
        )
        u = (h + 0.5) / 4294967296.0  # exact double, never 0 or 1
        keep = w > 0
        with np.errstate(invalid="ignore"):
            s = np.where(keep, u ** (1.0 / np.maximum(w, 1e-300)), -1.0)
        t = tbl.take(pa.array(np.flatnonzero(keep), pa.int64()))
        return pa.table(
            {
                key: t.column(key),
                weight_col: t.column(weight_col),
                "score": pa.array(s[keep], pa.float64()),
                "g": pa.array(np.zeros(int(keep.sum()), np.int64), pa.int64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow", batch_size=2048)
    return grouped_top_k(scored, "g", "score", key, k).drop_columns(["g"])
