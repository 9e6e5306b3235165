"""Label propagation — Chinese Whispers clustering.

Reference: ``examples/ChineseWhispersClustering.scala:31-54`` — state₀ =
own id; signal = (state, edge weight); collect groups the most recent
signal per neighbor by label, sums weights per label including a
self-preference (own current label, weight 1.0), and keeps the heaviest
label. The reference's tie-break is the unstable sort order of a
hash-grouped list (lines 38-41); we define a DETERMINISTIC tie-break —
max total weight, then MIN label — and tests compare cluster
*partitions*, not raw labels (SURVEY §7.4.2).

Because collect depends on every neighbor's most recent label (the
DataGraphVertex retention map), it is not reconstructible from
fresh-only signals ⇒ ``always_signal=True``: every vertex re-signals
each round until no label changes anywhere. Synchronous label
propagation can 2-cycle on bipartite structures; bound with
max_supersteps (reference async mode sidesteps this nondeterministically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_starts


def _sum_by_dst_label(dst, label, w):
    order = np.lexsort((label, dst))
    d, l, v = dst[order], label[order], w[order]
    key_change = np.empty(len(d), dtype=bool)
    if len(d):
        key_change[0] = True
        key_change[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
    starts = np.flatnonzero(key_change)
    if len(starts) == 0:
        return d[:0], l[:0], v[:0]
    return d[starts], l[starts], np.add.reduceat(v, starts)


class ChineseWhispers(Algorithm):
    name = "chinese_whispers"
    state_pa_type = pa.int64()
    signal_fields = [("label", pa.int64()), ("w", pa.float64())]
    always_signal = True

    def __init__(self, self_preference: float = 1.0):
        self.self_preference = self_preference

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        return {
            "state": vid.astype(np.int64).copy(),
            "last": vid.astype(np.int64).copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"label": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"label": expanded["label"], "w": weight.astype(np.float64)}

    def combine(self, dst, values):
        d, l, v = _sum_by_dst_label(dst, values["label"], values["w"])
        return d, {"label": l, "w": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        n = len(prev["vid"])
        # candidate rows: incoming (dst,label,w) + self-preference rows
        cand_vid = np.concatenate([dst, prev["vid"]])
        cand_label = np.concatenate([sig.get("label", dst[:0]), prev["state"]])
        cand_w = np.concatenate(
            [sig.get("w", np.empty(0)), np.full(n, self.self_preference)]
        )
        v, l, w = _sum_by_dst_label(cand_vid, cand_label, cand_w)
        # winner per vertex: max weight, then min label (deterministic)
        order = np.lexsort((l, -w, v))
        v, l = v[order], l[order]
        firsts = segment_starts(v)
        win_vid, win_label = v[firsts], l[firsts]
        idx = self._align(prev["vid"], win_vid)
        state = prev["state"].copy()
        state[idx] = win_label
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }


class SeededLabelProp(Algorithm):
    """Semi-supervised label propagation (Zhu & Ghahramani 2002, public
    literature; vertex-centric formulation per the reference's
    DataGraphVertex retention pattern, ``ChineseWhispersClustering.scala``).

    Seeds (vid % 7 == 0) are CLAMPED to label vid % 5; every other
    vertex starts unlabeled (-1) and each round adopts the majority
    label among its neighbors' current labels (unlabeled neighbors
    ignored, ties -> MIN label); with no labeled neighbor it keeps its
    previous state. Collect needs every neighbor's latest label, not
    just fresh deltas => ``always_signal=True`` (same reasoning as
    ChineseWhispers above)."""

    name = "seeded_labelprop"
    state_pa_type = pa.int64()
    signal_fields = [("label", pa.int64()), ("w", pa.float64())]
    always_signal = True

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        v = vid.astype(np.int64)
        state = np.where(v % 7 == 0, v % 5, -1).astype(np.int64)
        n = len(v)
        return {
            "state": state,
            "last": state.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"label": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {
            "label": expanded["label"],
            "w": np.ones(len(expanded["label"]), dtype=np.float64),
        }

    def combine(self, dst, values):
        m = values["label"] >= 0  # unlabeled neighbors carry no vote
        d, l, v = _sum_by_dst_label(dst[m], values["label"][m], values["w"][m])
        return d, {"label": l, "w": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            lab = sig.get("label", dst[:0].astype(np.int64))
            w = sig.get("w", np.empty(0))
            m = lab >= 0
            d, l, c = _sum_by_dst_label(dst[m], lab[m], w[m])
            if len(d):
                order = np.lexsort((l, -c, d))
                d2, l2 = d[order], l[order]
                firsts = segment_starts(d2)
                idx = self._align(prev["vid"], d2[firsts])
                ok = idx >= 0
                state[idx[ok]] = l2[firsts][ok]
        v = prev["vid"]
        seed = v % 7 == 0
        state[seed] = v[seed] % 5  # clamp
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }
