"""Absorbing-random-walk hit probability (k-step reachability mass).

``h_0(v) = [v in T]``;
``h_{i+1}(v) = 1 if v in T else (1/outdeg(v)) * sum_{v->u} h_i(u)`` —
the probability a uniform random walk from ``v`` reaches the absorbing
target set ``T`` within ``i+1`` steps (Doyle & Snell, public
literature; the spam-mass / trust-absorption primitive on link
graphs). Vertex-centric formulation in the reference's style
(``examples/PageRank.scala:31-70`` signal/collect shape, recurrence
reversed): run on the REVERSED edge set with per-edge weight
``1/outdeg_orig(dst_rev)`` precomputed at build time, so the collect
is a plain signal sum — no receiver-side degree lookup, and the
per-block combiner stays a commutative ``segment_sum``.

Snapshot semantics (each round needs every out-neighbor's current h,
not a delta) => ``always_signal=True``, like ChineseWhispers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class AbsorptionProb(Algorithm):
    name = "absorption"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    always_signal = True

    def __init__(self, seed_mod: int = 17):
        self.seed_mod = seed_mod

    def _seed(self, vid: np.ndarray) -> np.ndarray:
        return vid % self.seed_mod == 0

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = self._seed(vid).astype(np.float64)
        return {
            "state": state,
            "last": state.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"val": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        # weight = 1/outdeg_orig(reversed dst), baked into the edge table
        return {"val": expanded["val"] * weight}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        # the recurrence REPLACES state each round: vertices with no
        # original out-edges revert to 0 unless absorbed
        vid = prev["vid"]
        state = np.zeros(len(vid))
        if len(dst):
            idx = self._align(vid, dst)
            ok = idx >= 0
            state[idx[ok]] = sig["val"][ok]
        seed = self._seed(vid)
        state[seed] = 1.0
        residual = np.abs(state - prev["state"])
        return {
            "state": state,
            "last": state.copy(),
            "active": residual > signal_threshold,
            "residual": residual,
        }


class HittingTime(AbsorptionProb):
    """Truncated expected hitting time to the target set (Doyle & Snell
    random-walk theory): ``h_0 = 0``; ``h_{i+1}(v) = 0`` for targets,
    else ``1 + (1/outdeg(v)) Σ_{v→u} h_i(u)`` — the k-step iterate of
    the standard linear system, converging from below (walks not yet
    absorbed contribute their elapsed steps). Same reversed-weighted
    snapshot shape as :class:`AbsorptionProb` (weights 1/outdeg_orig
    baked into the reversed edge table); dangling vertices contribute
    1 + 0 per the empty sum."""

    name = "hitting_time"

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.zeros(n)
        return {
            "state": state,
            "last": state.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        vid = prev["vid"]
        state = np.ones(len(vid))
        if len(dst):
            idx = self._align(vid, dst)
            ok = idx >= 0
            state[idx[ok]] += sig["val"][ok]
        state[self._seed(vid)] = 0.0
        residual = np.abs(state - prev["state"])
        return {
            "state": state,
            "last": state.copy(),
            "active": residual > signal_threshold,
            "residual": residual,
        }
