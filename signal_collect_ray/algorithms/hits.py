"""HITS (hubs & authorities) — Kleinberg power iteration, simultaneous
update, over a *signed bidirected* build of the link graph.

Not in the reference's example library, but a canonical link-graph
companion to its PageRank (``examples/PageRank.scala:31-70``) and a
first-class need for web-corpus curation (authority scores feed crawl
frontier and training-data quality weighting). Expressed in the same
vertex-centric Algorithm spec the reference's vertices use
(``DataGraphVertex.scala:35-103``).

Signal/collect needs messages to flow along *both* directions of every
web link — ``auth(v) = Σ hub(u) over in-links u→v`` travels forward,
``hub(u) = Σ auth(v) over out-links u→v`` travels backward. The engine
ships signals strictly src→dst over the built CSR, so the graph is
built with TWO edges per link, direction encoded in the weight's sign:

    link u→v   ⇒   (u, v, +1)  carries hub(u)  into auth(v)
               ⇒   (v, u, -1)  carries auth(v) into hub(u)

(see :func:`signal_collect_ray.pipelines.queries.hits_edges`). State
packing: ``state`` = hub, ``last`` = auth (both float64 — the engine
persists exactly the canonical four state columns). Simultaneous
update: hub_k and auth_k are both computed from round k-1 values, so
one superstep = one HITS iteration and the fixed-k SQL oracle is two
plain joins per round. Scores are left UN-normalized during iteration
(power iteration is scale-invariant; fixed-k runs bound the growth) —
callers L1-normalize the final vectors, exactly as the oracle does.

``always_signal`` because hub/auth are full re-computations from the
current neighbor values each round, not deltas — a vertex whose score
did not change must still re-send it (the same most-recent-signal
argument as Chinese Whispers, ``DataGraphVertex.scala:66-77``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class Hits(Algorithm):
    name = "hits"
    state_pa_type = pa.float64()
    signal_fields = [("h", pa.float64()), ("a", pa.float64())]
    always_signal = True

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": np.ones(n),  # hub
            "last": np.ones(n),   # auth
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"hub": sub["state"], "auth": sub["last"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        fwd = weight > 0
        return {
            # contribution to dst's hub: auth(src) along backward edges
            "h": np.where(fwd, 0.0, expanded["auth"]),
            # contribution to dst's auth: hub(src) along forward edges
            "a": np.where(fwd, expanded["hub"], 0.0),
        }

    def combine(self, dst, values):
        d, h = segment_sum(dst, values["h"])
        _, a = segment_sum(dst, values["a"])
        return d, {"h": h, "a": a}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        n = len(prev["vid"])
        # full recomputation: a vertex with no incoming contribution of a
        # kind has score 0 (e.g. no out-links => hub 0), NOT its old value
        hub = np.zeros(n)
        auth = np.zeros(n)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            ok = idx >= 0
            hub[idx[ok]] = sig["h"][ok]
            auth[idx[ok]] = sig["a"][ok]
        residual = np.abs(hub - prev["state"]) + np.abs(auth - prev["last"])
        return {
            "state": hub,
            "last": auth,
            "active": np.ones(n, dtype=bool),
            "residual": residual,
        }


class EigenvectorCentrality(Algorithm):
    """Eigenvector centrality by power iteration (Bonacich 1972; public
    literature): ``x_i(v) = Σ_{u→v} x_{i-1}(u)``, started from the
    all-ones vector — the principal left eigenvector of the adjacency
    matrix, i.e. HITS restricted to its forward (authority) half over
    the plain directed graph (no signed bidirected build needed: signals
    already flow src→dst over the CSR).

    Same simultaneous-update / ``always_signal`` structure as
    :class:`Hits` (full recomputation from current in-neighbor values
    each round — the most-recent-signal argument of
    ``DataGraphVertex.scala:66-77``); scores stay UN-normalized during
    iteration (power iteration is scale-invariant, fixed-k bounds the
    growth) and callers L1-normalize the final vector, exactly like the
    HITS query does."""

    name = "eigenvector"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    always_signal = True

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": np.ones(n),
            "last": np.zeros(n),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"x": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["x"]}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        n = len(prev["vid"])
        # full recomputation: a vertex with no in-links has score 0
        state = np.zeros(n)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            ok = idx >= 0
            state[idx[ok]] = sig["val"][ok]
        residual = np.abs(state - prev["state"])
        return {
            "state": state,
            "last": prev["state"],
            "active": np.ones(n, dtype=bool),
            "residual": residual,
        }
