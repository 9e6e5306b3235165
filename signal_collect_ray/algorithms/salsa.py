"""SALSA (Stochastic Approach for Link-Structure Analysis) — the
degree-normalized sibling of HITS (Lempel & Moran 2000 — public
literature; TREC/web-search standard for "related pages" ranking).

Not in the reference's example library, but the same link-analysis
family as its PageRank (``examples/PageRank.scala:31-70``) and HITS
here: a random walk alternating forward/backward over web links, so
each contribution is divided by the emitting side's degree —

    auth_k(v) = Σ_{u→v} hub_{k-1}(u)  / outdeg(u)
    hub_k(u)  = Σ_{u→v} auth_{k-1}(v) / indeg(v)

Runs over the identical *signed bidirected* build HITS uses (two edges
per link, direction in the weight's sign — see
:func:`signal_collect_ray.pipelines.queries.hits_edges` and the
rationale in ``algorithms/hits.py``). The per-source degrees need no
extra state: on the doubled graph every vertex's persisted
``out_degree`` = outdeg + indeg and ``sum_out_weight`` = outdeg − indeg
(weights are ±1), so ``src_values`` recovers both exactly:

    outdeg = (out_degree + sum_out_weight) / 2
    indeg  = (out_degree - sum_out_weight) / 2

Simultaneous update from all-ones, un-normalized during iteration
(unlike HITS the SALSA operator is column-stochastic so scores cannot
blow up); callers L1-normalize the final vectors, exactly as the
fixed-k SQL oracle does. ``always_signal`` for the same
most-recent-signal reason as HITS (full recomputation each round,
``DataGraphVertex.scala:66-77``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_sum


class Salsa(Algorithm):
    name = "salsa"
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
        od = sub["out_degree"].astype(np.float64)
        sow = sub["sum_out_weight"]
        fwd = (od + sow) / 2.0   # original out-degree
        bwd = (od - sow) / 2.0   # original in-degree
        # a source with fwd == 0 has no forward edges, so its hub/outdeg
        # value never traverses one (and symmetrically for bwd) — the
        # guarded 0.0 is never read, it only avoids the div-by-zero.
        hub_n = np.divide(
            sub["state"], fwd, out=np.zeros_like(sow), where=fwd > 0
        )
        auth_n = np.divide(
            sub["last"], bwd, out=np.zeros_like(sow), where=bwd > 0
        )
        return {"hub_n": hub_n, "auth_n": auth_n}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        fwd = weight > 0
        return {
            # backward edge v→u carries auth(v)/indeg(v) into hub(u)
            "h": np.where(fwd, 0.0, expanded["auth_n"]),
            # forward edge u→v carries hub(u)/outdeg(u) into auth(v)
            "a": np.where(fwd, expanded["hub_n"], 0.0),
        }

    def combine(self, dst, values):
        d, h = segment_sum(dst, values["h"])
        _, a = segment_sum(dst, values["a"])
        return d, {"h": h, "a": a}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        n = len(prev["vid"])
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
