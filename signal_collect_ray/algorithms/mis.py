"""Maximal independent set — Luby's algorithm (Luby 1986, public) with
DETERMINISTIC per-vertex priorities (splitmix64 of the vid), so the
result is reproducible across runs and partitionings.

The reference has no MIS example, but the algorithm is the canonical
vertex-centric symmetry-breaking primitive (the same family as the
reference's randomized ``examples/VertexColoring.scala``); on the link
graph it yields a dominating set of "representative" pages.

Per round every vertex signals one float (min-combined, dense fast
path): an IN vertex sends −1, an UNDECIDED vertex its priority, an OUT
vertex the +inf identity. Collect: an undecided vertex with an IN
neighbor goes OUT; an undecided vertex whose priority beats the
smallest undecided-neighbor priority goes IN. Two adjacent vertices can
never both join in one round (each would need the strictly smaller
priority), so independence holds by construction; maximality follows
because while any vertex is undecided, the minimum-priority undecided
vertex in its closed neighborhood joins. Terminates when every vertex
is decided (state change stops → residual 0). Requires a SYMMETRIC
edge table, like ConnectedComponents.

Priorities are splitmix64 values rounded to float64 (53-bit): a
collision needs ~2^26 adjacent-vertex pairs sharing 53 bits —
negligible, and would only cost one extra round, not correctness of
independence (ties lose on the strict <).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import mix64, segment_min

UNDECIDED, IN, OUT = 0, 1, 2


def _priority(vid: np.ndarray) -> np.ndarray:
    return mix64(vid.astype(np.uint64)).astype(np.float64)


class MaximalIndependentSet(Algorithm):
    name = "mis"
    state_pa_type = pa.int64()
    signal_fields = [("val", pa.float64())]
    always_signal = True
    dense_agg = "min"
    dense_identity = np.inf
    dense_dtype = np.float64

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": np.zeros(n, dtype=np.int64),
            "last": np.zeros(n, dtype=np.int64),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        # priority is a pure function of the vid (splitmix64), so it is
        # derived on demand instead of carried as state — the engine's
        # signal path only ships the fixed state columns
        st = sub["state"]
        val = np.where(
            st == IN, -1.0,
            np.where(st == UNDECIDED, _priority(sub["vid"]), np.inf),
        )
        return {"val": val}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = segment_min(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        minval = np.full(len(prev["vid"]), np.inf)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            minval[idx] = sig["val"]
        return self._finish(prev, minval)

    def collect_dense(self, prev, inc, signal_threshold) -> StateDict:
        return self._finish(prev, inc)

    def _finish(self, prev, minval) -> StateDict:
        st = prev["state"].copy()
        prio = _priority(prev["vid"])
        undec = st == UNDECIDED
        st[undec & (minval < 0)] = OUT
        st[undec & (minval >= 0) & (prio < minval)] = IN
        changed = st != prev["state"]
        return {
            "state": st,
            "last": st.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }
