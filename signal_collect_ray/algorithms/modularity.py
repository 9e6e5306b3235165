"""Partition modularity of a directed graph.

Newman modularity (Leicht & Newman 2008, directed form — public
literature) of a vertex partition ``c(v)``:

    Q = sum_c within_c / m  -  sum_c (ko_c * ki_c) / m^2

where ``m`` is the edge count, ``within_c`` the number of edges with
both endpoints in community ``c``, and ``ko_c`` / ``ki_c`` the total
out- / in-degree mass of ``c``. The reference frames community quality
through its label-propagation examples (``ChineseWhispers.scala``);
modularity is the standard score a user of those pipelines computes
next, so it belongs in the library surface.

Scale shape: one ``map_batches`` pass emits per-block per-community
partial rows (``|C|`` rows per block, pre-aggregated in numpy), a
``groupby(c)`` carries only ``blocks x |C|`` tiny rows, and the final
formula folds ``|C|`` rows on the driver. No edge ever crosses the
wire twice; skewed communities cost nothing beyond their edge scan.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


class _CommunityPartials:
    """Edge block → per-community (ko, ki, within) partial counts."""

    __name__ = "_CommunityPartials"

    def __init__(self, comm_fn: Callable[[np.ndarray], np.ndarray]):
        self.comm_fn = comm_fn

    def __call__(self, tbl: pa.Table) -> pa.Table:
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        cs = np.asarray(self.comm_fn(s), dtype=np.int64)
        cd = np.asarray(self.comm_fn(d), dtype=np.int64)
        comms, inv_s = np.unique(np.concatenate([cs, cd]), return_inverse=True)
        n = len(comms)
        ko = np.bincount(inv_s[: len(cs)], minlength=n)
        ki = np.bincount(inv_s[len(cs):], minlength=n)
        within = np.bincount(
            inv_s[: len(cs)], weights=(cs == cd).astype(np.float64), minlength=n
        ).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(comms, pa.int64()),
                "ko": pa.array(ko, pa.int64()),
                "ki": pa.array(ki, pa.int64()),
                "within": pa.array(within, pa.int64()),
            }
        )


def partition_modularity(edges_ds, comm_fn: Callable[[np.ndarray], np.ndarray]):
    """Directed-graph modularity of the partition induced by
    ``comm_fn`` (a vectorized vid→community map, e.g. a host prefix).
    Returns a one-row pyarrow Table ``{"modularity": float64}``
    (rounded to 6 digits, matching the repo's oracle convention)."""
    from ray.data.aggregate import Sum

    parts = edges_ds.select_columns(["src", "dst"]).map_batches(
        _CommunityPartials(comm_fn), batch_format="pyarrow"
    )
    rows = (
        parts.groupby("c")
        .aggregate(
            Sum("ko", alias_name="ko"),
            Sum("ki", alias_name="ki"),
            Sum("within", alias_name="within"),
        )
        .take_all()
    )
    ko = np.array([r["ko"] for r in rows], dtype=np.float64)
    ki = np.array([r["ki"] for r in rows], dtype=np.float64)
    within = np.array([r["within"] for r in rows], dtype=np.float64)
    m = ko.sum()
    q = 0.0 if m == 0 else within.sum() / m - float(ko @ ki) / (m * m)
    return pa.table({"modularity": pa.array([round(q, 6)], pa.float64())})
