"""Sudoku constraint propagation — reference ``examples/Sudoku.scala:33-62``.

Reference semantics: a cell's state is its determined digit (or None);
``SudokuAssociation`` is an ``OptionalSignalEdge`` that signals the
source's determined value only; collect removes every received digit
from the cell's possible set and the cell becomes determined when one
possibility remains (naked-singles propagation).

Here the vertex state IS the possible set, as an int64 bitmask over bits
1..9 (popcount 1 ⇔ determined — strictly richer than the reference's
Option[Int] + side map, same fixpoint). Signals carry the determined
cell's singleton mask (0 ≙ the suppressed Option None); the combiner is
bitwise OR — associative/commutative, so the signal exchange stays one
pre-aggregated row per (block, dst).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import isin_sorted

ALL_DIGITS = np.int64(0x3FE)  # bits 1..9 set

# popcount LUT for 10-bit masks
_POP10 = np.array(
    [bin(x).count("1") for x in range(1024)], dtype=np.int64
)


def sudoku_edges():
    """Both-direction peer edges of the 81-cell grid (row, column, 3x3
    box — the wiring of ``Sudoku.scala`` ``SudokuAssociation``)."""
    src, dst = [], []
    for a in range(81):
        ra, ca = divmod(a, 9)
        for b in range(81):
            if a == b:
                continue
            rb, cb = divmod(b, 9)
            if ra == rb or ca == cb or (ra // 3 == rb // 3 and ca // 3 == cb // 3):
                src.append(a)
                dst.append(b)
    return np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64)


def _or_by_dst(dst: np.ndarray, vals: np.ndarray):
    order = np.argsort(dst, kind="stable")
    d, v = dst[order], vals[order]
    starts = np.flatnonzero(np.concatenate([[True], d[1:] != d[:-1]]))
    return d[starts], np.bitwise_or.reduceat(v, starts)


class Sudoku(Algorithm):
    name = "sudoku"
    state_pa_type = pa.int64()
    signal_fields = [("val", pa.int64())]
    dense_agg = None  # OR-combine runs on the sparse row path

    def __init__(self, givens: Dict[int, int]):
        self.g_cells = np.array(sorted(givens), dtype=np.int64)
        self.g_masks = np.array(
            [np.int64(1) << np.int64(givens[int(c)]) for c in self.g_cells],
            dtype=np.int64,
        )

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        state = np.full(len(vid), ALL_DIGITS, dtype=np.int64)
        hit, pos_c = isin_sorted(self.g_cells, vid)
        state[hit] = self.g_masks[pos_c[hit]]
        determined = _POP10[state] == 1
        return {
            "state": state,
            "last": state.copy(),
            "active": determined,  # givens broadcast their digit once
            "residual": determined.astype(np.float64),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        st = sub["state"].astype(np.int64)
        # OptionalSignalEdge: only a determined cell has a value to send
        return {"val": np.where(_POP10[st] == 1, st, np.int64(0))}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["val"]}

    def combine(self, dst, values):
        d, v = _or_by_dst(dst, values["val"].astype(np.int64))
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].astype(np.int64).copy()
        if len(dst):
            idx = self._align(prev["vid"], dst)
            inc = np.zeros(len(state), dtype=np.int64)
            inc[idx] = sig["val"]
            undet = _POP10[state] > 1
            state[undet] &= ~inc[undet]
        changed = state != prev["state"]
        # a cell reduced to a single possibility is newly determined and
        # must broadcast it (the reference's collect returning Some(v))
        active = changed & (_POP10[state] == 1)
        return {
            "state": state,
            "last": state.copy(),
            "active": active,
            "residual": changed.astype(np.float64),
        }
