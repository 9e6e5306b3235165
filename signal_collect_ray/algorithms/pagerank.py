"""PageRank — delta formulation, matching the reference exactly.

Reference semantics (``/root/reference/src/main/scala/com/signalcollect/
examples/PageRank.scala:31-70``): unnormalized, damping 0.85, initial
state ``1 - d = 0.15``, ``signal = state * weight / sumOfOutWeights``,
``collect = 0.15 + 0.85 * Σ (most recent signal per in-edge)``,
``scoreSignal = |state - lastSignalState|`` (residual). No dangling-mass
redistribution, no normalization.

The most-recent-signal retention of ``DataGraphVertex`` (DataGraphVertex
.scala:66-77) is reproduced without per-edge state via the delta form
(``examples/EfficientPageRank.scala:34-63``): an active source sends
``(state - last) * weight / sum_out_weight`` and the target accumulates
``state += 0.85 * Σ deltas`` — algebraically identical because the sum
of retained signals changes by exactly the deltas of re-signaling
sources. Deltas are additive ⇒ combiner-safe (pre-aggregated per signal
block before the shuffle — the hub-skew answer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class PageRank(Algorithm):
    name = "pagerank"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    dense_agg = "sum"
    dense_identity = 0.0
    dense_dtype = np.float64
    # delta state = f(retained signal sums under the CURRENT topology) —
    # a mutation invalidates the ledger, so restart from init (see
    # Algorithm.fresh_state_on_mutation)
    fresh_state_on_mutation = True

    def __init__(self, damping: float = 0.85):
        self.damping = damping
        self.baseline = 1.0 - damping

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": np.full(n, self.baseline),
            # lastSignalState is None at start (scoreSignal = 1): encode
            # as 0.0 so the first delta is the full initial state.
            "last": np.zeros(n),
            "active": np.ones(n, dtype=bool),
            "residual": np.full(n, self.baseline),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        delta = sub["state"] - sub["last"]
        return {"rate": delta / sub["sum_out_weight"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["rate"] * weight}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            idx = self._align(prev["vid"], dst)
            state[idx] += self.damping * sig["val"]
        # every vertex that was active signaled this round → its
        # lastSignalState catches up to its (previous) state.
        last = np.where(prev["active"], prev["state"], prev["last"])
        residual = np.abs(state - last)
        active = residual > signal_threshold
        return {"state": state, "last": last, "active": active, "residual": residual}

    def collect_dense(self, prev, inc, signal_threshold):
        state = prev["state"] + self.damping * inc
        last = np.where(prev["active"], prev["state"], prev["last"])
        residual = np.abs(state - last)
        active = residual > signal_threshold
        return {"state": state, "last": last, "active": active, "residual": residual}


class PersonalizedPageRank(PageRank):
    """Personalized / topic-sensitive PageRank (Haveliwala 2002, public):
    the teleport mass lands only on a source set S, so ranks measure
    proximity to S — the link-graph primitive behind related-page and
    seed-expansion queries at web scale.

    Identical recurrence to PageRank with per-vertex baseline
    ``b_v = (1-d)·[v ∈ S]``; only ``init`` differs — the delta engine
    (combiner pre-aggregation, dense fast path, checkpointing) is
    inherited unchanged. Non-source vertices start at 0 and inactive:
    at web scale with a small S, early supersteps touch only the
    expanding neighborhood of S instead of every vertex."""

    name = "ppr"

    def __init__(self, sources, damping: float = 0.85):
        super().__init__(damping)
        self.sources = np.asarray(sorted(set(int(s) for s in sources)), np.int64)

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        base = np.where(np.isin(vid, self.sources), self.baseline, 0.0)
        return {
            "state": base,
            "last": np.zeros(n),
            "active": base > 0.0,
            "residual": base.copy(),
        }


class TeleportWeightedPageRank(PageRank):
    """PageRank with a biased teleport distribution (TrustRank /
    topic-sensitive family, Gyöngyi et al. 2004 — public literature):
    per-vertex baseline ``b_v = (1−d)·w_v`` where ``w_v`` comes from a
    vectorized vid→weight function (a trust score, a quality prior, a
    topic indicator). PersonalizedPageRank is the special case
    ``w_v = [v ∈ S]``. Only ``init`` differs from PageRank — the delta
    engine is inherited unchanged; zero-weight vertices start inactive
    exactly like PPR's non-sources."""

    name = "twpr"

    def __init__(self, weight_fn, damping: float = 0.85):
        super().__init__(damping)
        self.weight_fn = weight_fn

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        w = np.asarray(self.weight_fn(vid), dtype=np.float64)
        base = self.baseline * w
        return {
            "state": base.copy(),
            "last": np.zeros(len(vid)),
            "active": base > 0.0,
            "residual": base.copy(),
        }


class KatzCentrality(PageRank):
    """Katz centrality (Katz 1953; public literature): the walk-counting
    sibling of PageRank for link graphs —

        ``x_v = beta + alpha * Σ_{u→v} x_u``

    i.e. the PageRank recurrence over RAW adjacency (no out-degree
    normalization; a hub's full score flows down every out-link). Same
    vertex-centric spec as the reference's PageRank vertex
    (``examples/PageRank.scala:31-70``), and the delta formulation is
    inherited from :class:`PageRank` unchanged: an active source sends
    ``state - last`` (NOT divided by ``sum_out_weight``) and the target
    accumulates ``state += alpha * Σ deltas`` — deltas stay additive, so
    the combiner pre-aggregation and the dense bincount fast path both
    apply as-is. ``alpha`` must be < 1/λ_max(A) for the open-ended run
    to converge; fixed-k runs reproduce the k-step recurrence exactly
    regardless of spectral radius (the oracle unrolls the same k steps).
    """

    name = "katz"

    def __init__(self, alpha: float = 0.05, beta: float = 0.15):
        super().__init__(damping=alpha)
        self.baseline = beta  # teleport constant beta, not 1 - alpha

    def src_values(self, sub: StateDict) -> StateDict:
        # attenuated adjacency: no division by sum_out_weight
        return {"rate": sub["state"] - sub["last"]}


class DanglingPageRank(Algorithm):
    """Textbook PageRank WITH dangling-mass redistribution — the term
    the reference's formulation (PageRank.scala:31-70) and the plain
    :class:`PageRank` above drop: each iteration the rank mass sitting
    on zero-out-degree vertices is redistributed uniformly,

        r_{k+1}(v) = (1−d) + d · (Σ_in r_k(u)/outd(u) + D_k/N),
        D_k = Σ_{outd(u)=0} r_k(u).

    D_k is the engine's per-superstep GLOBAL AGGREGATOR
    (``Algorithm.has_global``): partials piggyback on the collect
    metrics rows, the driver folds them into the step manifest, and the
    next superstep's stages read ``global_value`` — one scalar per
    superstep, no extra pass, resume-safe. Power-iteration form (full
    rates, every vertex active every step) rather than the delta form:
    the uniform D_k/N term touches every vertex each round, so there is
    no sparsity to exploit and deltas would force tracking two globals.
    Run with ``eps=0.0`` + a steps limit, on the durable engine only.
    """

    name = "dangling_pagerank"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    dense_agg = "sum"
    dense_identity = 0.0
    dense_dtype = np.float64
    has_global = True
    fresh_state_on_mutation = True

    def __init__(self, n_vertices: int, damping: float = 0.85):
        self.n = float(n_vertices)
        self.damping = damping
        self.baseline = 1.0 - damping

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": np.full(n, self.baseline),
            "last": np.zeros(n),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def global_partial(self, sub: StateDict) -> float:
        outd = np.asarray(sub["out_degree"])
        return float(np.asarray(sub["state"])[outd == 0].sum())

    def reduce_global(self, partials: list) -> float:
        return float(np.sum(partials))

    def src_values(self, sub: StateDict) -> StateDict:
        sow = np.asarray(sub["sum_out_weight"])
        rate = np.divide(
            sub["state"], sow, out=np.zeros_like(sub["state"]),
            where=sow > 0,
        )
        return {"rate": rate}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["rate"] * weight}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v}

    def _step(self, prev: StateDict, inc: np.ndarray) -> StateDict:
        gv = float(self.global_value or 0.0)
        state = self.baseline + self.damping * (inc + gv / self.n)
        residual = np.abs(state - prev["state"])
        return {
            "state": state,
            "last": prev["state"].copy(),
            "active": np.ones(len(state), dtype=bool),
            "residual": residual,
        }

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        inc = np.zeros(len(prev["vid"]))
        if len(dst):
            idx = self._align(prev["vid"], dst)
            inc[idx] = sig["val"]
        return self._step(prev, inc)

    def collect_dense(self, prev, inc, signal_threshold):
        return self._step(prev, np.asarray(inc, dtype=np.float64))
