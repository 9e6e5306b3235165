"""Connected components — min-label propagation.

Not an explicit reference example; realized as the reference's SSSP
pattern (``examples/Sssp.scala:64-69``) with ``StateForwarderEdge``
(``StateForwarderEdge.scala:28-33``): state₀ = own id, signal = state,
collect = min(state, signals). Exact labels at convergence; min is
monotone, so fresh-only signaling (score-gated frontier) is exact.
Run over a symmetrized edge table for undirected components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_min


_SENTINEL = np.int64(2**62)


class ConnectedComponents(Algorithm):
    name = "connected_components"
    state_pa_type = pa.int64()
    signal_fields = [("val", pa.int64())]
    dense_agg = "min"
    dense_identity = float(2**62)
    dense_dtype = np.int64

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": vid.astype(np.int64).copy(),
            "last": vid.astype(np.int64).copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"val": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = segment_min(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            idx = self._align(prev["vid"], dst)
            state[idx] = np.minimum(state[idx], sig["val"])
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }

    def collect_dense(self, prev, inc, signal_threshold):
        state = np.minimum(prev["state"], inc.astype(np.int64))
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }
