"""Densest-subgraph peeling — the parallel Charikar greedy.

Charikar's greedy 2-approximation (Charikar 2000) peels minimum-degree
vertices one at a time; the distributed variant (Bahmani, Kumar,
Vassilvitskii 2012, "Densest Subgraph in Streaming and MapReduce")
removes EVERY vertex whose degree is at most the current average in one
round, so the peel finishes in O(log n) supersteps. With the exact
average threshold (ε = 0) each round removes the entire minimum-degree
shell and the per-round comparison ``deg · V ≤ 2E`` is pure integer
arithmetic — bit-exact against an unrolled SQL mirror.

Engine mapping: a 2-superstep cadence on the durable engine's
per-superstep GLOBAL AGGREGATOR channel (``Algorithm.has_global``,
structured JSON partials). Odd supersteps MEASURE — every alive vertex
signals 1 over the symmetric graph, so the collected sum is its degree
in the alive-induced subgraph, and the written shard's global partial
folds to the exact ``[2E_r, V_r]`` of alive set ``A_r``. Even
supersteps PEEL — each vertex applies ``alive ∧ (deg · V > 2E)`` with
the PREVIOUS (measure) step's aggregate, which is consistent by
construction. The driver touches only the per-round ``[2E_r, V_r]``
scalars read from the step manifests — O(rounds) driver state, never
O(V) or O(E).

State packing (the durable checkpoint persists exactly state/last):
``state`` bit 0 = alive, bit 1 = parity of the superstep that wrote it;
``last`` = degree within the alive set at the latest superstep. The
web-scale use: extracting the densest community / link-farm core of a
crawl graph.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class DensestPeel(Algorithm):
    """Run on the SYMMETRIC, deduped graph with the durable engine at
    ``max_supersteps = 2 * rounds + 1`` and ``eps = 0.0``. Rounds past
    the empty-set fixpoint are no-ops on both sides, so a fixed unroll
    count R agrees with the engine wherever either converges."""

    name = "densest_peel"
    state_pa_type = pa.int64()
    signal_fields = [("val", pa.int64())]
    always_signal = True
    dense_agg = "sum"
    dense_identity = 0.0
    dense_dtype = np.int64
    has_global = True
    fresh_state_on_mutation = True

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            # alive = 1, writing-superstep parity = 0
            "state": np.ones(n, dtype=np.int64),
            # last = degree in the alive-induced subgraph (0 at init)
            "last": np.zeros(n, dtype=np.int64),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    # -- global channel: [2E, V] of the alive-induced subgraph ----------
    def global_partial(self, sub: StateDict):
        alive = (np.asarray(sub["state"]) & 1) == 1
        return [
            int(np.asarray(sub["last"])[alive].sum()),
            int(alive.sum()),
        ]

    def reduce_global(self, partials: list):
        if not partials:
            return [0, 0]
        return [int(sum(p[0] for p in partials)), int(sum(p[1] for p in partials))]

    # -- signal: alive vertices contribute 1 per out-edge ----------------
    def src_values(self, sub: StateDict) -> StateDict:
        return {"val": sub["state"] & 1}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v.astype(np.int64)}

    # -- collect: measure on odd supersteps, peel on even ----------------
    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        nsum = np.zeros(len(prev["vid"]), dtype=np.int64)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            nsum[idx] = sig["val"]
        return self._finish(prev, nsum)

    def collect_dense(self, prev, inc, signal_threshold) -> StateDict:
        return self._finish(prev, inc.astype(np.int64))

    def _finish(self, prev, nsum) -> StateDict:
        pstate = prev["state"].astype(np.int64)
        alive = pstate & 1
        parity = 1 - ((pstate >> 1) & 1)  # parity of THIS superstep
        if len(parity) and parity[0] == 0:
            # PEEL (even superstep): nsum re-measures the same alive set
            # the previous measure step folded into global_value, so the
            # integer rule deg·V > 2E is exact against [2E_r, V_r].
            g = self.global_value or [0, 0]
            two_e, n_v = int(g[0]), int(g[1])
            alive = ((alive == 1) & (nsum * n_v > two_e)).astype(np.int64)
        return {
            "state": alive | (parity << 1),
            "last": nsum,
            "active": alive == 1,
            "residual": alive.astype(np.float64),
        }


def peel_profile(info, rounds: int):
    """Per-round (peel_round, n_vertices, n_edges) from a DensestPeel
    run's step manifests: measure superstep 2r+1 folds the exact
    [2E_r, V_r] of alive set A_r. Rounds past engine convergence (the
    set peels to empty) are (0, 0). Manifests are keyed by their
    superstep number, so a RESUMED run (whose ``per_step`` starts at
    the resume point) reports its post-resume rounds correctly; rounds
    checkpointed before the resume are absent and come back (0, 0)."""
    by_step = {m.get("superstep"): m for m in info.per_step}
    out = []
    for r in range(rounds + 1):
        m = by_step.get(2 * r + 1)
        if m is not None:
            g = m.get("global_value") or [0, 0]
            out.append((r, int(g[1]), int(g[0]) // 2))
        else:
            out.append((r, 0, 0))
    return out
