"""Resumable partitioned Parquet sink.

The reference persists computation state as per-worker snapshot files
(``WorkerImplementation.scala:457-499``); the engines here already
checkpoint vertex state per superstep. This module is the DATASET
counterpart: write any Dataset as one Parquet file per key partition
with a per-partition ``_SUCCESS`` marker, so a failed 100-TB job rerun
skips every partition that already landed instead of rewriting the
world. One directory per partition — never one giant file.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class _PartitionWriter:
    """One hash partition → writes ``part=<p>/data.parquet`` + a
    ``_SUCCESS`` marker holding the row count; skips atomically if the
    marker already exists (resume). Emits one status row either way."""

    __name__ = "_PartitionWriter"

    def __init__(self, out_dir: str, resume: bool):
        self.out_dir = out_dir
        self.resume = resume

    def __call__(self, tbl: pa.Table) -> pa.Table:
        p = int(tbl.column("_sink_part")[0].as_py())
        pdir = os.path.join(self.out_dir, f"part={p:05d}")
        marker = os.path.join(pdir, "_SUCCESS")
        if self.resume and os.path.exists(marker):
            with open(marker) as f:
                n_prev = json.load(f)["n_rows"]
            return pa.table(
                {
                    "part": pa.array([p], pa.int64()),
                    "n_rows": pa.array([n_prev], pa.int64()),
                    "skipped": pa.array([True], pa.bool_()),
                }
            )
        os.makedirs(pdir, exist_ok=True)
        out = tbl.drop_columns(["_sink_part"])
        tmp = os.path.join(pdir, "data.parquet.tmp")
        pq.write_table(out, tmp)
        os.replace(tmp, os.path.join(pdir, "data.parquet"))
        with open(marker + ".tmp", "w") as f:
            json.dump({"n_rows": out.num_rows}, f)
        os.replace(marker + ".tmp", marker)  # marker last → atomic commit
        return pa.table(
            {
                "part": pa.array([p], pa.int64()),
                "n_rows": pa.array([out.num_rows], pa.int64()),
                "skipped": pa.array([False], pa.bool_()),
            }
        )


def write_partitioned(
    ds,
    out_dir: str,
    key: str,
    num_partitions: int = 64,
    resume: bool = True,
):
    """Write ``ds`` as ``num_partitions`` key-hashed Parquet partition
    directories under ``out_dir``, each committed atomically (tmp-file
    rename, then a ``_SUCCESS`` marker with the row count). With
    ``resume=True`` a rerun skips partitions whose marker exists — the
    failed-run recovery story for long sink jobs; rows re-route
    identically because the partitioner is the engine's own
    deterministic ``hash(key) % P``.

    Returns a pyarrow Table (part, n_rows, skipped) sorted by part."""
    from signal_collect_ray.util import part_of

    def route(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "_sink_part",
            pa.array(part_of(k, num_partitions).astype(np.int64), pa.int64()),
        )

    os.makedirs(out_dir, exist_ok=True)
    rows = (
        ds.map_batches(route, batch_format="pyarrow")
        .groupby("_sink_part")
        .map_groups(_PartitionWriter(out_dir, resume), batch_format="pyarrow")
        .take_all()
    )
    rows.sort(key=lambda r: r["part"])
    return pa.table(
        {
            "part": pa.array([r["part"] for r in rows], pa.int64()),
            "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
            "skipped": pa.array([r["skipped"] for r in rows], pa.bool_()),
        }
    )


def read_partitioned(out_dir: str):
    """Read back a ``write_partitioned`` directory as a Dataset,
    listing only partitions with a ``_SUCCESS`` marker (half-written
    partitions from a crashed run are invisible)."""
    import ray.data as rd

    files = []
    for d in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, d)
        if d.startswith("part=") and os.path.exists(
            os.path.join(pdir, "_SUCCESS")
        ):
            files.append(os.path.join(pdir, "data.parquet"))
    if not files:
        raise FileNotFoundError(f"no committed partitions under {out_dir}")
    return rd.read_parquet(files)
