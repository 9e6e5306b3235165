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
