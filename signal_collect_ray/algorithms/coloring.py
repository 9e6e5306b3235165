"""Vertex coloring — randomized conflict repair, deterministic rebuild.

Reference semantics (``/root/reference/src/main/scala/com/signalcollect/
examples/VertexColoring.scala:38-94``): every vertex holds a color in
``[0, num_colors)``; neighbors exchange colors along ``StateForwarderEdge``;
a vertex seeing its own color among its neighbors picks a new random
color, otherwise keeps its color; converged when no conflicts remain
(the reference's IntegrationSpec checks "no neighbor shares my color"
on symmetric cycles / stars / grids, ``IntegrationSpec.scala:166-194``).

Rebuild differences (documented, results-equivalent):

* Signals carry the source color as a **bitmask** (``1 << color``) and
  the combiner is segment-OR — associative, commutative, idempotent, so
  a destination receives one int64 with every in-neighbor color, however
  many combiner passes ran. ``num_colors ≤ 63``.
* The reference's ``Random`` repair is replaced by a deterministic
  splitmix hash of ``(vid, state, neighbor_mask, round, seed)``: a
  conflicted vertex re-colors with probability ~1/2 (symmetry-breaking
  coin), preferring the lowest color absent from its neighbor mask
  (greedy), else a guaranteed-different hash pick. The round counter
  rides in the ``last`` column so coins vary across rounds (no
  deterministic state cycles) while staying identical across executors,
  partitionings, and checkpoint resume — same fixpoint class as the
  reference (a proper coloring at the given color budget).
* ``always_signal`` — like the reference's DataGraphVertex retention
  (``DataGraphVertex.scala:66-77``), a vertex needs ALL neighbor colors
  every round, not only changed ones.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import mix64 as _mix


class VertexColoring(Algorithm):
    name = "vertex_coloring"
    state_pa_type = pa.int64()
    signal_fields = [("mask", pa.int64())]
    always_signal = True
    dense_agg = None  # OR-monoid → sparse rows (still combiner-safe)

    def __init__(self, num_colors: int, seed: int = 42):
        assert 1 <= num_colors <= 63
        self.num_colors = num_colors
        self.seed = seed

    def _color_hash(self, vid, state, salt) -> np.ndarray:
        with np.errstate(over="ignore"):
            return _mix(
                vid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + state.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D)
                + np.uint64(self.seed * 1_000_003 + salt)
            )

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = (self._color_hash(vid, np.zeros(n), 0) % np.uint64(self.num_colors)).astype(
            np.int64
        )
        return {
            "state": state,
            # ``last`` holds the per-vertex round counter (coloring keeps
            # no lastSignalState): it survives checkpoints and is
            # identical across executors/partitionings, so the per-round
            # coin stays deterministic everywhere.
            "last": np.zeros(n, dtype=np.int64),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        color = sub["state"].astype(np.int64)
        return {"mask": (np.int64(1) << color).astype(np.int64)}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"mask": expanded["mask"]}

    def combine(self, dst, values):
        order = np.argsort(dst, kind="stable")
        d = dst[order]
        m = values["mask"][order]
        from signal_collect_ray.util import segment_starts

        starts = segment_starts(d)
        out = (
            np.bitwise_or.reduceat(m, starts)
            if len(d)
            else m[:0]
        )
        return d[starts] if len(d) else d, {"mask": out}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        color = prev["state"].astype(np.int64)
        n = len(color)
        mask = np.zeros(n, dtype=np.int64)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            ok = idx >= 0
            mask[idx[ok]] = sig["mask"][ok]
        conflict = ((mask >> color) & 1).astype(bool)
        rnd = prev["last"].astype(np.int64)
        # symmetry-breaking coin: conflicted vertices re-color with p≈1/2;
        # the round counter feeds the hash so a state-cycle cannot repeat
        # the same coins (deterministic, yet round-varying).
        h = self._color_hash(prev["vid"], color + mask * 7 + rnd * 104729, 1)
        coin = (h & np.uint64(1)).astype(bool)
        recolor = conflict & coin
        # greedy repair: lowest color NOT among the neighbors (exists
        # whenever deg < num_colors); else a guaranteed-different hash
        # pick — never re-choose the current color, so a vertex cannot
        # deterministically lock onto its own conflict.
        full = np.int64((1 << self.num_colors) - 1)
        free = ~mask & full
        # log2 of an isolated low bit is exact in float64 (bit ≤ 2^62)
        lowest_free = np.where(
            free != 0, np.log2(np.maximum(free & -free, 1)).astype(np.int64), -1
        )
        nc1 = max(self.num_colors - 1, 1)
        flip = (
            color
            + 1
            + (self._color_hash(prev["vid"], color * 31 + mask + rnd * 15485863, 2) % np.uint64(nc1)).astype(np.int64)
        ) % np.int64(self.num_colors)
        new_color = np.where(lowest_free >= 0, lowest_free, flip)
        state = np.where(recolor, new_color, color)
        residual = conflict.astype(np.float64)
        return {
            "state": state,
            "last": rnd + 1,
            "active": conflict,
            "residual": residual,
        }
