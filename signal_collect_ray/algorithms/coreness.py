"""Core decomposition — the full coreness (core number) of every
vertex, via the distributed H-INDEX FIXPOINT (Lü, Chen, Ren, Zhang,
Zhou & Stanley 2016, "The H-index of a network node and its relation to
degree and coreness", public literature): starting from h₀ = degree,
repeatedly set h(v) to the H-index of its neighbors' current values;
the (monotonically non-increasing) fixpoint is exactly coreness.

This generalizes the fixed-k membership peeling (``cellular.KCore``,
query ``kcore``) to the whole onion decomposition in ONE run — the
standard way to compute core numbers vertex-centrically without the
inherently sequential global min-degree peel.

Engine shape: like Chinese Whispers, the collect needs every
neighbor's CURRENT value each round (not deltas) ⇒ ``always_signal``;
the signal is one int64, and the combine is a (dst, value) COUNT
histogram — associative, idempotent-safe under the per-block combiner.
Collect computes the H-index from the histogram: with the distinct
values of a destination sorted descending and their counts cumulated,
H = max(min(value, cumulative count)). All-integer arithmetic — the
unrolled SQL mirror is bit-exact with zero float-parity hazard, and
because the iteration is monotone and idempotent at the fixpoint, an
R-round engine run equals an R-round SQL unroll whether or not either
side converged earlier. Requires a SYMMETRIC edge table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.algorithms.labelprop import _sum_by_dst_label
from signal_collect_ray.util import segment_starts


def _h_index_per_dst(dst, val, cnt):
    """(dst, distinct value, count) rows → (dst, H-index). Vectorized:
    one lexsort, segment cumsums, one reduceat."""
    order = np.lexsort((-val, dst))
    d, v, c = dst[order], val[order], cnt[order]
    starts = segment_starts(d)
    if len(starts) == 0:
        return d[:0], v[:0]
    cum = np.cumsum(c)
    seg_base = np.repeat(np.r_[0, cum[starts[1:] - 1]], np.diff(np.r_[starts, len(d)]))
    within = cum - seg_base
    cand = np.minimum(v, within)
    h = np.maximum.reduceat(cand, starts)
    return d[starts], h.astype(np.int64)


class Coreness(Algorithm):
    name = "coreness"
    state_pa_type = pa.int64()
    signal_fields = [("val", pa.int64()), ("cnt", pa.int64())]
    always_signal = True
    dense_agg = None

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        state = out_degree.astype(np.int64).copy()  # symmetric ⇒ degree
        n = len(vid)
        return {
            "state": state,
            "last": state.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"val": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {
            "val": expanded["val"],
            "cnt": np.ones(len(expanded["val"]), np.int64),
        }

    def combine(self, dst, values):
        d, v, c = _sum_by_dst_label(
            dst,
            np.asarray(values["val"], np.int64),
            np.asarray(values["cnt"], np.int64).astype(np.float64),
        )
        return d, {"val": v, "cnt": c.astype(np.int64)}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            d, h = _h_index_per_dst(
                dst,
                np.asarray(sig["val"], np.int64),
                np.asarray(sig["cnt"], np.int64),
            )
            idx = self._align(prev["vid"], d)
            state[idx] = h
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }
