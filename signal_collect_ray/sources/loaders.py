"""Text graph loaders — rebuild of the reference loading utilities.

* ``read_edge_list_text``: ASCII whitespace-separated unsigned int pairs
  with ``#`` comment lines (``util/FileReader.scala:26-93``,
  ``loading/Loading.scala:27-98`` — the notredame edge-list format).
* ``read_adjacency_list_text``: ``vertexId outDegree target1 target2 …``
  per line (``loading/AdjacencyListLoader.scala:40-94``).

Both return an edge Dataset (src:int64, dst:int64, weight:float64=1.0),
parsed vectorized per batch of lines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edge_table(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "src": pa.array(src.astype(np.int64), pa.int64()),
            "dst": pa.array(dst.astype(np.int64), pa.int64()),
            "weight": pa.array(np.ones(len(src)), pa.float64()),
        }
    )


def _parse_edge_lines(batch) -> pa.Table:
    lines = [
        l for l in batch["text"] if l.strip() and not l.lstrip().startswith("#")
    ]
    if not lines:
        return _edge_table(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    nums = np.array(" ".join(lines).split(), dtype=np.int64)
    assert len(nums) % 2 == 0, "edge list must contain (src dst) pairs"
    return _edge_table(nums[0::2], nums[1::2])


def _parse_adjacency_lines(batch) -> pa.Table:
    srcs: list = []
    dsts: list = []
    for line in batch["text"]:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        vid = int(parts[0])
        deg = int(parts[1])
        targets = [int(x) for x in parts[2 : 2 + deg]]
        assert len(targets) == deg, f"bad adjacency line: {line!r}"
        srcs.extend([vid] * deg)
        dsts.extend(targets)
    return _edge_table(
        np.asarray(srcs, dtype=np.int64), np.asarray(dsts, dtype=np.int64)
    )


def read_edge_list_text(paths):
    """ASCII (src dst) pairs, '#' comments → edge Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(_parse_edge_lines, batch_format="numpy")


def read_adjacency_list_text(paths):
    """``vid degree t1 t2 …`` lines → edge Dataset.

    Note: lines are independent; vertices with degree 0 appear as
    vertices only if referenced elsewhere (matching the reference, where
    a zero-degree line still adds the vertex — use ``vertices_from``
    below to recover isolated vertices if needed)."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(
        _parse_adjacency_lines, batch_format="numpy"
    )


def adjacency_vertices(paths):
    """All vertex ids declared in an adjacency-list file (including
    isolated, zero-degree ones — AdjacencyListLoaderSpec.scala:33-60)."""
    import ray.data as rd

    def vids(batch) -> pa.Table:
        out = [
            int(l.split()[0])
            for l in batch["text"]
            if l.strip() and not l.lstrip().startswith("#")
        ]
        return pa.table({"vid": pa.array(out, pa.int64())})

    return rd.read_text(paths).map_batches(vids, batch_format="numpy")
