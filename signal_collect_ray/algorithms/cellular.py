"""Cellular / agent simulation algorithms on grid graphs.

Rebuilds of the reference's two cellular-automaton examples, proving the
Algorithm surface generalizes beyond numeric fixpoint algorithms:

* ``GameOfLife`` — Conway's rules, reference
  ``examples/GameOfLife.scala:35-48`` (DataGraphVertex with int state,
  ``collect = match signals.sum``), grid wiring at lines 63-92
  (8-neighborhood, ``StateForwarderEdge`` both directions).
* ``SchellingSegregation`` — reference
  ``examples/SchellingSegregation.scala:31-44`` (keep state when the
  equal-neighbor fraction ≥ threshold, else flip to the other type).

Both are ``always_signal`` (every cell needs its full neighborhood sum
every step — score-gating would starve unchanged neighbors) with the
``dense_agg="sum"`` fast path: the superstep exchange ships dense
per-partition int vectors and aggregation is one ``bincount``.

Initial states derive deterministically from the vertex id (vectorized,
no broadcast state), so the same configuration reconstructs at any
scale / partitioning.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import isin_sorted, segment_sum


def _binary_init(
    vid: np.ndarray,
    alive_vids: Optional[np.ndarray],
    init_fn: Optional[Callable[[np.ndarray], np.ndarray]],
) -> np.ndarray:
    """0/1 initial state per vid: explicit sorted id set, a vectorized
    vid→{0,1} function, or (default) all dead."""
    if init_fn is not None:
        return init_fn(vid).astype(np.int64)
    if alive_vids is None:
        return np.zeros(len(vid), dtype=np.int64)
    alive = np.sort(np.asarray(alive_vids, dtype=np.int64))
    hit, _ = isin_sorted(alive, vid)
    return hit.astype(np.int64)


def grid8_edges(w: int, h: int):
    """Vectorized 8-neighborhood grid edge arrays (both directions) —
    the reference examples' grid wiring (GameOfLife.scala:85-92)."""
    y, x = np.divmod(np.arange(w * h, dtype=np.int64), w)
    srcs, dsts = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            ok = (x + dx >= 0) & (x + dx < w) & (y + dy >= 0) & (y + dy < h)
            srcs.append((y[ok] * w + x[ok]))
            dsts.append(((y[ok] + dy) * w + x[ok] + dx))
    return np.concatenate(srcs), np.concatenate(dsts)


class _BinaryCellular(Algorithm):
    """Shared spec: signal own 0/1 state to every neighbor, collect from
    the neighborhood sum. Subclasses implement ``_rule``."""

    state_pa_type = pa.int64()
    signal_fields = [("val", pa.int64())]
    always_signal = True
    dense_agg = "sum"
    dense_identity = 0.0
    dense_dtype = np.int64

    def __init__(
        self,
        alive_vids: Optional[np.ndarray] = None,
        init_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        self.alive_vids = alive_vids
        self.init_fn = init_fn

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        state = _binary_init(vid, self.alive_vids, self.init_fn)
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
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = segment_sum(dst, values["val"])
        return d, {"val": v.astype(np.int64)}

    def _rule(self, state: np.ndarray, nsum: np.ndarray, deg: np.ndarray):
        raise NotImplementedError

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        nsum = np.zeros(len(prev["vid"]), dtype=np.int64)
        if len(dst):
            idx = self._align(prev["vid"], dst)
            nsum[idx] = sig["val"]
        return self._finish(prev, nsum)

    def collect_dense(self, prev, inc, signal_threshold) -> StateDict:
        return self._finish(prev, inc.astype(np.int64))

    def _finish(self, prev, nsum) -> StateDict:
        state = self._rule(
            prev["state"].astype(np.int64), nsum, prev["out_degree"]
        )
        changed = state != prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }


class GameOfLife(_BinaryCellular):
    """Conway's Game of Life (reference ``examples/GameOfLife.scala:38-48``):
    0-1 alive neighbors → dead, 2 → unchanged, 3 → alive, ≥4 → dead.
    Still lifes hit residual 0 and terminate; oscillators run to the
    superstep limit (the reference runs this interactively)."""

    name = "game_of_life"

    def _rule(self, state, nsum, deg):
        return np.where(nsum == 3, 1, np.where(nsum == 2, state, 0)).astype(
            np.int64
        )


class SchellingSegregation(_BinaryCellular):
    """Schelling segregation with two agent types (reference
    ``examples/SchellingSegregation.scala:34-42``): an agent keeps its
    type when ≥ ``threshold`` of its neighbors share it, else flips to
    the other type ((state+1) % 2 — the reference's discontent move).

    Neighborhood size is taken from ``out_degree``: the reference wires
    grids symmetrically (``SchellingSegregation.scala:59-66``), so
    in-degree == out-degree; for asymmetric graphs supply a symmetrized
    edge table (same requirement as ConnectedComponents)."""

    name = "schelling"

    def __init__(
        self,
        threshold: float = 0.45,
        alive_vids: Optional[np.ndarray] = None,
        init_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ):
        super().__init__(alive_vids, init_fn)
        self.threshold = threshold

    def _rule(self, state, nsum, deg):
        total = deg.astype(np.int64)
        equal = np.where(state == 1, nsum, total - nsum)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = equal / np.maximum(total, 1)
        content = (frac >= self.threshold) | (total == 0)
        return np.where(content, state, (state + 1) % 2).astype(np.int64)


class KCore(_BinaryCellular):
    """k-core peeling (Seidman 1983, public): every vertex starts alive;
    each round a vertex survives iff ≥ k of its neighbors are still
    alive. Monotone (dead stays dead), so the fixpoint is the exact
    k-core and any unrolled round count R agrees with the engine run at
    max_supersteps=R — converged-early rounds are no-ops on both sides.

    Same always-signal neighborhood-sum shape as the cellular automata
    (StateForwarderEdge semantics over a SYMMETRIC edge table), so the
    dense bincount exchange path applies unchanged. The web-scale use:
    graph cleaning / spam-farm pruning before PageRank."""

    name = "kcore"

    def __init__(self, k: int):
        super().__init__(init_fn=lambda vid: np.ones(len(vid), dtype=np.int64))
        self.k = int(k)

    def _rule(self, state, nsum, deg):
        return ((state == 1) & (nsum >= self.k)).astype(np.int64)
