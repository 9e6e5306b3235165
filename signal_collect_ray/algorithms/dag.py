"""DAG longest-path layering (topological levels).

``layer(v)`` = number of edges on the longest directed path ending at
``v`` — the canonical DAG scheduling depth / dependency level (critical
path layering; public literature). The vertex-centric form is the
monotone max fold

    layer(v) ← max(layer(v), max_{(u,v)∈E} layer(u) + 1),

a textbook Signal/Collect program (reference's DataFlowVertex fold with
a max collect, ``DataFlowVertex.scala:47-54``) expressed here — like
``scc._MaxColor`` — through the engine's dense MIN fast path on NEGATED
values: state = −layer, signal = state − 1, collect = min.

On a DAG the fold reaches its fixpoint after (longest path length)
supersteps; the iteration is Jacobi-monotone, so running the engine for
k bounded rounds equals a k-step unrolled SQL oracle even when the true
fixpoint lands earlier. On a cyclic input the fold never converges —
callers gate with ``max_supersteps`` (the query layer feeds edges
filtered to src < dst, acyclic by construction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_min


class DagLongestPath(Algorithm):
    name = "dag_layers"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    dense_agg = "min"
    dense_identity = np.inf
    dense_dtype = np.float64

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.zeros(n)  # −layer, layer 0 everywhere
        return {
            "state": state,
            "last": state.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"lay": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["lay"] - 1.0}

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


def layers_from_state(state_table: pa.Table) -> pa.Table:
    """(vid, state=−layer) → (vid, layer:int64)."""
    lay = -state_table.column("state").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "vid": state_table.column("vid"),
            "layer": pa.array(np.round(lay).astype(np.int64), pa.int64()),
        }
    )
