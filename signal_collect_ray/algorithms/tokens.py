"""Token diffusion — a PathQuery-style message-forwarding algorithm that
exercises the ``ResetStateAfterSignaling`` mixin (reference
``ResetStateAfterSignaling.scala:22-33``, used by the path-query family:
a vertex forwards what it received and returns to a resting state, so
state is a TRANSIENT message buffer, not an accumulator).

Each scheduled vertex splits its token mass evenly over its out-edges,
then resets to 0; the collect phase deposits incoming mass on top of the
(reset) state. Mass is conserved: sinks (out-degree 0) retain whatever
reaches them — on a DAG all mass eventually pools at the sinks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class TokenDiffusion(Algorithm):
    name = "token_diffusion"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    reset_after_signal = True
    reset_value = 0.0
    dense_agg = "sum"
    dense_identity = 0.0
    dense_dtype = np.float64

    def __init__(self, source: int, mass: float = 1.0):
        self.source = np.int64(source)
        self.mass = mass

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        state = np.where(vid == self.source, self.mass, 0.0)
        active = (state > 0) & (out_degree > 0)
        return {
            "state": state,
            "last": state.copy(),
            "active": active,
            "residual": state.copy(),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"val": sub["state"] / np.maximum(sub["out_degree"], 1)}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        # prev["state"] already has the engine's post-signal reset applied
        inc = np.zeros(len(prev["vid"]))
        if len(dst):
            idx = self._align(prev["vid"], dst)
            inc[idx] = sig["val"]
        return self._finish(prev, inc, signal_threshold)

    def collect_dense(self, prev, inc, signal_threshold) -> StateDict:
        return self._finish(prev, np.asarray(inc, dtype=np.float64), signal_threshold)

    def _finish(self, prev, inc, signal_threshold) -> StateDict:
        state = prev["state"] + inc
        # only vertices holding mass AND able to forward it stay scheduled;
        # sink mass is at rest (residual 0 there → clean convergence)
        active = (state > signal_threshold) & (prev["out_degree"] > 0)
        return {
            "state": state,
            "last": state.copy(),
            "active": active,
            "residual": np.where(active, state, 0.0),
        }
