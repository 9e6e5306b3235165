"""Single-source shortest paths.

Reference: ``examples/Sssp.scala:32-79`` — ``Location`` is a
DataFlowVertex with state ``Option[Int]`` (unknown = None) and ``Path``
an OptionalSignalEdge: signal = dist + weight when known, collect = min
(delta/on-delivery fold, ``DataFlowVertex.scala:47-54``). Min is
associative+commutative ⇒ combiner-safe. Unknown distance is encoded as
+inf; only vertices whose distance improved signal next round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_min


class SSSP(Algorithm):
    name = "sssp"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    dense_agg = "min"
    dense_identity = np.inf
    dense_dtype = np.float64

    def __init__(self, source_vid: int):
        self.source = int(source_vid)

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.full(n, np.inf)
        is_src = vid == self.source
        state[is_src] = 0.0
        return {
            "state": state,
            "last": state.copy(),
            "active": is_src.copy(),
            "residual": is_src.astype(np.float64),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"dist": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["dist"] + weight}

    def combine(self, dst, values):
        d, v = segment_min(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            idx = self._align(prev["vid"], dst)
            state[idx] = np.minimum(state[idx], sig["val"])
        changed = state < prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }

    def collect_dense(self, prev, inc, signal_threshold):
        state = np.minimum(prev["state"], inc)
        changed = state < prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }


class MultiSourceBFS(SSSP):
    """Unweighted BFS from a SOURCE SET: dist(v) = min hops from any
    source (finite ⇔ reachable). The reachability primitive of the
    Broder et al. (2000) bow-tie decomposition — run once forward from
    the core SCC and once on the reversed graph. Identical monotone
    min-fold to SSSP (dense min fast path, frontier-only signaling);
    only ``init`` seeds a set instead of a single vid."""

    name = "msbfs"

    def __init__(self, sources):
        self.sources = np.asarray(
            sorted(set(int(s) for s in sources)), np.int64
        )

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.full(n, np.inf)
        is_src = np.isin(vid, self.sources)
        state[is_src] = 0.0
        return {
            "state": state,
            "last": state.copy(),
            "active": is_src.copy(),
            "residual": is_src.astype(np.float64),
        }
