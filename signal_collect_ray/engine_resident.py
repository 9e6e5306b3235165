"""Resident BSP executor — the low-latency counterpart of engine.py.

The Ray-Data superstep engine (engine.py) pays one streaming-pipeline
launch (~0.5-1 s) per superstep — the right trade for durable,
per-superstep-checkpointed production runs, but pure overhead when a
superstep's compute is milliseconds. This executor mirrors the
reference's physical layout instead (one worker per core, partitions
hashed across workers — ``DefaultGraph.scala:171-205``,
``DefaultVertexToWorkerMapper.scala:28-35``): W Ray actors each hold
their partitions' CSR and vertex-state numpy arrays for the whole run;
a superstep is two actor rounds (signal → exchange refs → collect) with
signals pre-combined per destination partition before they enter the
object store (same combiner as engine.py's SignalStage).

Semantics are IDENTICAL to engine.py — both drive the same vectorized
``Algorithm`` kernels, and equality is asserted in tests. Checkpoint
shards + manifests use the same format, so a run started under one
executor resumes under the other. Durability is every
``checkpoint_interval`` supersteps (+ always at termination) instead of
every superstep.

Scale note: this is the executor for the throughput/scaling benchmarks
(BASELINE.md): worker count = cluster cores, exchange = P×P pre-combined
blocks through the object store — the same shuffle a multi-node Ray
cluster performs, minus per-step pipeline setup.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
import time
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from signal_collect_ray.algorithm import Algorithm
from signal_collect_ray.config import EngineConfig
from signal_collect_ray.engine import (
    ExecutionInformation,
    SuperstepEngine,
    _state_table,
    _to_np_dict,
)
from signal_collect_ray.util import expand_ranges, part_of

_logger = logging.getLogger("signal_collect_ray.resident")


class _Worker:
    """One resident worker: owns `parts`, their CSR and state arrays."""

    def __init__(
        self,
        worker_id: int,
        parts: List[int],
        csr_refs_wrapped: list,
        algo: Algorithm,
        num_partitions: int,
        num_workers: int,
        signal_threshold: float,
        part_offsets=None,
        part_sizes=None,
        part_fn=None,
    ):
        import ray

        self.wid = worker_id
        self.parts = parts
        self.algo = algo
        self.P = num_partitions
        self.W = num_workers
        self.threshold = signal_threshold
        self.part_fn = part_fn or part_of
        csr_refs = csr_refs_wrapped[0]
        self.csr = {p: ray.get(csr_refs[p]) for p in parts if p in csr_refs}
        self.state: Dict[int, dict] = {}
        self.meta: Dict[int, dict] = {}
        self.offsets = part_offsets
        self.sizes = part_sizes
        self.V = int(part_sizes.sum()) if part_sizes is not None else 0

    # -- state lifecycle ---------------------------------------------------
    def init_from_vertices(self, vertex_files: Dict[int, str]):
        for p in self.parts:
            f = vertex_files.get(p)
            if f is None:
                continue
            d = _to_np_dict(pq.read_table(f))
            st = self.algo.init(d["vid"], d["out_degree"], d["sum_out_weight"])
            st.setdefault("residual", np.ones(len(d["vid"])))
            self.meta[p] = {
                "vid": d["vid"],
                "out_degree": d["out_degree"],
                "sum_out_weight": d["sum_out_weight"],
            }
            self.state[p] = st
        return self._metrics()

    def load_checkpoint(self, step_dir: str):
        for p in self.parts:
            f = os.path.join(step_dir, f"part-{p:05d}.parquet")
            if not os.path.exists(f):
                continue
            d = _to_np_dict(pq.read_table(f))
            self.meta[p] = {
                "vid": d["vid"],
                "out_degree": d["out_degree"],
                "sum_out_weight": d["sum_out_weight"],
            }
            self.state[p] = {
                "state": d["state"],
                "last": d["last"],
                "active": d["active"].astype(bool),
                "residual": d["residual"],
            }
        return self._metrics()

    # -- superstep ---------------------------------------------------------
    def _active_edges(self, p: int):
        """Shared src selection + CSR fan-out for one owned partition.
        Returns (sub, eidx, counts) or None when nothing signals.
        ``eidx`` is None on the full-frontier fast path — every CSR
        source is signaling, so the edge set IS the CSR in storage order
        and callers index csr arrays directly instead of gathering
        through an explicit E-length index (saves building eidx plus the
        dst/weight/dst_gidx gathers — the dominant per-edge passes when
        a dense algorithm like PageRank has its whole frontier active)."""
        algo = self.algo
        st = self.state.get(p)
        csr = self.csr.get(p)
        if st is None or csr is None:
            return None
        m = self.meta[p]
        mask = (
            np.ones(len(m["vid"]), dtype=bool)
            if algo.always_signal
            else st["active"]
        )
        mask = mask & (m["out_degree"] > 0)
        if not mask.any():
            return None
        sub = {
            "vid": m["vid"][mask],
            "out_degree": m["out_degree"][mask],
            "sum_out_weight": m["sum_out_weight"][mask],
            "state": st["state"][mask],
            "last": st["last"][mask],
        }
        pos = np.searchsorted(csr["src_ids"], sub["vid"])
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == sub["vid"])
        if not found.any():
            return None
        sub = {k: v[found] for k, v in sub.items()}
        pos = pos_c[found]
        if len(pos) == len(csr["src_ids"]):
            # every source signals (pos is then 0..n-1 by construction)
            counts = np.diff(csr["indptr"])
            return sub, None, counts
        starts = csr["indptr"][pos]
        counts = csr["indptr"][pos + 1] - starts
        return sub, expand_ranges(starts, counts), counts

    def signal_dense(self):
        """Dense fast path: per-edge values scatter into ONE dense vector
        over the global vertex index (bincount for sum, minimum.at for
        min) — no sorting anywhere. The exchange ships ONE contiguous
        array per destination WORKER (that worker's partition slices
        concatenated, plus the part-id/length index to split it
        zero-copy on arrival): serializing W arrays per sender instead
        of P slice-objects is what keeps the per-round exchange near the
        raw Ray RPC floor (measured: the per-slice structure cost ~5x
        the RPC itself at W=30). Used when the signaling frontier is
        dense (edges_next ≥ num_vertices), where it strictly dominates
        the sparse row exchange in both compute and volume."""
        algo = self.algo
        field0 = algo.signal_fields[0][0]
        is_sum = algo.dense_agg == "sum"
        total = None
        for p in self.parts:
            sel = self._active_edges(p)
            if sel is None:
                continue
            sub, eidx, counts = sel
            csr = self.csr[p]
            src_vals = algo.src_values(sub)
            expanded = {k: np.repeat(v, counts) for k, v in src_vals.items()}
            if eidx is None:  # full frontier: csr arrays in storage order
                vals = algo.edge_values(expanded, csr["weight"])[field0]
                gidx = csr["dst_gidx"]
            else:
                vals = algo.edge_values(expanded, csr["weight"][eidx])[field0]
                gidx = csr["dst_gidx"][eidx]
            if total is None:
                total = (
                    np.zeros(self.V, dtype=np.float64)
                    if is_sum
                    else np.full(self.V, algo.dense_identity, dtype=algo.dense_dtype)
                )
            if is_sum:
                total += np.bincount(gidx, weights=vals, minlength=self.V)
            elif algo.dense_agg == "max":
                np.maximum.at(total, gidx, vals.astype(algo.dense_dtype))
            else:
                np.minimum.at(total, gidx, vals.astype(algo.dense_dtype))
        if total is None:
            return {}
        outbox: Dict[int, tuple] = {}
        ident = algo.dense_identity
        for w in range(self.W):
            plist, pieces = [], []
            for p in range(w, self.P, self.W):  # p % W == w
                lo = self.offsets[p]
                sl = total[lo : lo + self.sizes[p]]
                has = sl.any() if is_sum else (sl != ident).any()
                if has:
                    plist.append(p)
                    pieces.append(sl)
            if plist:
                outbox[w] = (
                    np.asarray(plist, dtype=np.int32),
                    np.asarray([len(x) for x in pieces], dtype=np.int64),
                    np.concatenate(pieces),
                )
        return outbox

    def signal(self):
        """Compute this worker's outgoing signals, pre-combined per
        destination partition, grouped per destination WORKER — ONE
        concatenated (dparts, dst, vals) triple per destination worker
        (not one per owned partition: fewer, larger arrays keep the
        exchange near the Ray RPC floor). The whole outbox is the task's
        return value; receivers slice only their pieces (numpy buffers
        ride pickle5 out-of-band in plasma)."""
        algo = self.algo
        acc: Dict[int, list] = {}
        for p in self.parts:
            sel = self._active_edges(p)
            if sel is None:
                continue
            sub, eidx, counts = sel
            csr = self.csr[p]
            src_vals = algo.src_values(sub)
            expanded = {k: np.repeat(v, counts) for k, v in src_vals.items()}
            if eidx is None:  # full frontier: csr arrays in storage order
                vals = algo.edge_values(expanded, csr["weight"])
                dst = csr["dst"]
            else:
                vals = algo.edge_values(expanded, csr["weight"][eidx])
                dst = csr["dst"][eidx]
            dst_u, combined = algo.combine(dst, vals)
            dparts = self.part_fn(dst_u, self.P)
            dwids = dparts % self.W
            order = np.argsort(dwids, kind="stable")
            dst_u, dparts, dwids = dst_u[order], dparts[order], dwids[order]
            combined = {k: v[order] for k, v in combined.items()}
            bounds = np.searchsorted(dwids, np.arange(self.W + 1))
            for w in range(self.W):
                lo, hi = bounds[w], bounds[w + 1]
                if lo == hi:
                    continue
                acc.setdefault(w, []).append(
                    (dparts[lo:hi], dst_u[lo:hi], {k: v[lo:hi] for k, v in combined.items()})
                )
        outbox: Dict[int, list] = {}
        for w, lst in acc.items():
            if len(lst) == 1:
                outbox[w] = lst
            else:
                outbox[w] = [
                    (
                        np.concatenate([x[0] for x in lst]),
                        np.concatenate([x[1] for x in lst]),
                        {
                            k: np.concatenate([x[2][k] for x in lst])
                            for k in lst[0][2]
                        },
                    )
                ]
        return outbox

    def collect_dense(self, entries: list):
        """Dense collect: elementwise sum/min of the received dense
        per-partition slices, then the algorithm's vectorized dense
        collect. Zero sorting, zero searching. ``entries`` are this
        worker's OWN inbox entries, one per sender (None = nothing)."""
        algo = self.algo
        is_sum = algo.dense_agg == "sum"
        acc: Dict[int, np.ndarray] = {}
        for entry in entries:
            if entry is None:
                continue
            plist, lens, data = entry
            # split the sender's contiguous block back into per-partition
            # views (zero-copy)
            splits = np.split(data, np.cumsum(lens)[:-1])
            for p, arr in zip(plist, splits):
                p = int(p)
                cur = acc.get(p)
                if cur is None:
                    acc[p] = arr.copy()
                elif is_sum:
                    np.add(cur, arr, out=cur)
                elif algo.dense_agg == "max":
                    np.maximum(cur, arr, out=cur)
                else:
                    np.minimum(cur, arr, out=cur)
        self._undeliverable = 0
        for p in self.parts:
            st = self.state.get(p)
            if st is None:
                continue
            m = self.meta[p]
            inc = acc.get(p)
            if inc is None:
                inc = (
                    np.zeros(len(m["vid"]))
                    if is_sum
                    else np.full(
                        len(m["vid"]), algo.dense_identity, dtype=algo.dense_dtype
                    )
                )
            prev = {
                "vid": m["vid"],
                "out_degree": m["out_degree"],
                "sum_out_weight": m["sum_out_weight"],
                "state": self._reset_state(st, m),
                "last": st["last"],
                "active": st["active"],
            }
            self.state[p] = algo.collect_dense(prev, inc, self.threshold)
        return self._metrics()

    def _reset_state(self, st, m):
        """ResetStateAfterSignaling.scala:22-33: vertices that executed
        the signal op this superstep expose the reset state to collect."""
        algo = self.algo
        if not algo.reset_after_signal:
            return st["state"]
        sched = (
            np.ones(len(m["vid"]), dtype=bool)
            if algo.always_signal
            else st["active"].astype(bool)
        )
        # only vertices that actually emitted (≥1 out-edge) reset — a
        # scheduled sink sent nothing, so it keeps its state
        sched &= m["out_degree"] > 0
        state = np.asarray(st["state"]).copy()
        state[sched] = algo.reset_value
        return state

    def collect(self, entries: list):
        """Apply incoming signals to owned partitions; returns metrics.

        ``entries`` are this worker's own inbox entries, one per sender
        (each a list of concatenated (dparts, dst, vals) triples, or
        None)."""
        algo = self.algo
        field_names = [n for n, _ in algo.signal_fields]
        per_part: Dict[int, list] = {p: [] for p in self.parts}
        inbox = []
        for ent in entries:
            if ent:
                inbox.extend(ent)
        for dparts, dst, vals in inbox:
                order = np.argsort(dparts, kind="stable")
                dp, ds = dparts[order], dst[order]
                vv = {k: v[order] for k, v in vals.items()}
                bounds = np.searchsorted(dp, np.arange(self.P + 1))
                for p in self.parts:
                    lo, hi = bounds[p], bounds[p + 1]
                    if lo < hi:
                        per_part[p].append(
                            (ds[lo:hi], {k: v[lo:hi] for k, v in vv.items()})
                        )
        self._undeliverable = 0
        for p in self.parts:
            st = self.state.get(p)
            if st is None:
                continue
            m = self.meta[p]
            pieces = per_part[p]
            if pieces:
                dst = np.concatenate([x[0] for x in pieces])
                vals = {
                    k: np.concatenate([x[1][k] for x in pieces])
                    for k in field_names
                }
                dst, vals = algo.combine(dst, vals)
                idx = Algorithm._align(m["vid"], dst)
                bad = idx < 0
                if bad.any():
                    self._undeliverable += int(bad.sum())
                    dst = dst[~bad]
                    vals = {k: v[~bad] for k, v in vals.items()}
            else:
                dst = np.empty(0, dtype=np.int64)
                vals = {k: np.empty(0) for k in field_names}
            prev = {
                "vid": m["vid"],
                "out_degree": m["out_degree"],
                "sum_out_weight": m["sum_out_weight"],
                "state": self._reset_state(st, m),
                "last": st["last"],
                "active": st["active"],
            }
            self.state[p] = algo.collect(prev, dst, vals, self.threshold)
        return self._metrics()

    def collect_and_signal(
        self, outbox_refs: list, mode_collect: str, mode_signal: str,
        skip_signal: bool = False,
    ):
        """Fused superstep round: collect step k's signals, then
        immediately compute step k+1's outbox — ONE actor barrier per
        superstep instead of two. Returns (outbox, metrics); the driver
        keeps the outbox as an unfetched ref for the next round. One
        PLASMA object per sender per round: returns must stay above
        Ray's inline-return path (small returns ship by value through
        the DRIVER — measured 3x slower than plasma at every W when the
        exchange was restructured to per-receiver return slots), and
        receivers map the sender outbox zero-copy and deserialize only
        W concatenated entries (see signal_dense / signal).
        ``skip_signal`` elides the signal half on the run's final
        possible step (its outbox could never be collected — notable for
        always_signal algorithms on fixed-k runs)."""
        import ray

        outs = ray.get(outbox_refs)
        entries = [o.get(self.wid) if o else None for o in outs]
        t0 = time.perf_counter()
        rows = (
            self.collect_dense(entries)
            if mode_collect == "dense"
            else self.collect(entries)
        )
        t1 = time.perf_counter()
        if skip_signal:
            outbox = {}
        else:
            outbox = self.signal_dense() if mode_signal == "dense" else self.signal()
        t2 = time.perf_counter()
        # Timeable rebuild (Timeable.scala:7-66) at partition granularity:
        # the vectorized engine processes a partition's vertices in one
        # fused kernel, so per-vertex timers are meaningless — worker
        # phase wall is attributed to owned partitions by vertex count.
        n_total = sum(len(self.meta[p]["vid"]) for p in self.parts if p in self.meta)
        for r in rows:
            frac = r["n_vertices"] / max(n_total, 1)
            r["collect_s"] = (t1 - t0) * frac
            r["signal_s"] = (t2 - t1) * frac
        return outbox, rows

    def aggregate_states(self, gt):
        """Worker-local phase of a global aggregation
        (≙ aggregationOnWorker, interfaces/AggregationOperation.scala:27-59)."""
        partials = []
        for p in self.parts:
            st = self.state.get(p)
            if st is None:
                continue
            m = self.meta[p]
            partials.append(
                gt.aggregate_partition({**m, **st})
            )
        return partials

    def out_neighbors(self, vids: list) -> dict:
        """Out-neighbor lists for the requested vertex ids, restricted to
        the CSR partitions this worker owns (≙ the cheap outgoing half of
        GraphDataProvider.findVicinity, reference
        console/DataProvider.scala:400-415: "a vertex already knows its
        outgoing edges"). O(len(vids) · log S) searchsorted probes per
        owned partition — no scans."""
        want = np.asarray(sorted(set(int(v) for v in vids)), dtype=np.int64)
        out: dict = {}
        if len(want) == 0:
            return out
        for p in self.parts:
            csr = self.csr.get(p)
            if csr is None or len(csr["src_ids"]) == 0:
                continue
            pos = np.searchsorted(csr["src_ids"], want)
            pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
            found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == want)
            for v, j in zip(want[found], pos_c[found]):
                s, e = int(csr["indptr"][j]), int(csr["indptr"][j + 1])
                out.setdefault(int(v), []).extend(
                    int(d) for d in csr["dst"][s:e]
                )
        return out

    def in_neighbor_sources(self, vids: list) -> list:
        """Source vertices of edges pointing INTO the requested set, over
        this worker's CSR partitions (≙ FindVertexVicinitiesByIdsAggregator
        — the reference documents the incoming direction as "an expensive
        operation", console/DataProvider.scala:390-399: one vectorized
        scan of each owned partition's dst array)."""
        want = np.asarray(sorted(set(int(v) for v in vids)), dtype=np.int64)
        srcs: set = set()
        if len(want) == 0:
            return []
        for p in self.parts:
            csr = self.csr.get(p)
            if csr is None or len(csr["dst"]) == 0:
                continue
            hit = np.flatnonzero(np.isin(csr["dst"], want))
            if len(hit) == 0:
                continue
            # edge i belongs to the src whose indptr range contains i
            owner = np.searchsorted(csr["indptr"], hit, side="right") - 1
            srcs.update(int(s) for s in np.unique(csr["src_ids"][owner]))
        return sorted(srcs)

    # -- durability --------------------------------------------------------
    def checkpoint(self, out_dir: str):
        for p in self.parts:
            st = self.state.get(p)
            if st is None:
                continue
            m = self.meta[p]
            tbl = _state_table(
                p, m["vid"], m["out_degree"], m["sum_out_weight"], st,
                self.algo.state_pa_type,
            )
            pq.write_table(tbl, os.path.join(out_dir, f"part-{p:05d}.parquet"))
        return True

    def _metrics(self):
        rows = []
        algo = self.algo
        for p in self.parts:
            st = self.state.get(p)
            if st is None:
                continue
            m = self.meta[p]
            send = (
                np.ones(len(m["vid"]), dtype=bool)
                if algo.always_signal
                else st["active"].astype(bool)
            )
            rows.append(
                {
                    "part": p,
                    "n_vertices": int(len(m["vid"])),
                    "n_active": int(st["active"].sum()),
                    "residual_max": float(st["residual"].max(initial=0.0)),
                    "edges_traversed": int(m["out_degree"][send].sum()),
                    "signal_rows_in": 0,
                    "undeliverable": int(getattr(self, "_undeliverable", 0)),
                }
            )
        return rows


class ResidentEngine:
    """Actor-resident BSP executor; same Algorithm/checkpoint contracts
    as SuperstepEngine."""

    @staticmethod
    def recalculate_scores(run_dir: str) -> int:
        """Checkpoint-level operation shared with the durable engine
        (same shard format) — see SuperstepEngine.recalculate_scores."""
        from signal_collect_ray.engine import SuperstepEngine

        return SuperstepEngine.recalculate_scores(run_dir)

    def __init__(self, config: Optional[EngineConfig] = None, num_workers: Optional[int] = None):
        import ray

        self.config = config or EngineConfig()
        # explicit num_workers is HONORED (capped only by CPUs and
        # partitions); None → auto-size with the per-step cost model
        # (EngineConfig.dense_worker_cost). A hard-coded heuristic
        # silently overriding an explicit pool size contradicts the
        # cluster-scale target — the caller may know its interconnect.
        self._explicit_workers = num_workers is not None
        if num_workers is None:
            num_workers = max(1, int(ray.cluster_resources().get("CPU", 4)))
        self.W = num_workers

    def _prepare(
        self,
        graph,
        algo: Algorithm,
        run_dir: Optional[str],
        resume: bool,
        eps: Optional[float],
        max_supersteps: Optional[int],
        signal_threshold: Optional[float],
        checkpoint_interval: Optional[int],
        time_limit_s: Optional[float],
        convergence_check_interval: Optional[int],
    ):
        """Shared setup for ``run`` and ``interactive``: validate, resolve
        config, spawn the worker pool, init-or-resume state, write the
        step-0 checkpoint. Returns a namespace the step loop drives."""
        import ray

        cfg = self.config
        if cfg.on_undeliverable != "drop":
            raise NotImplementedError(
                "the resident executor's dense routing requires a closed "
                "vertex set; use SuperstepEngine for "
                f"on_undeliverable={cfg.on_undeliverable!r}"
            )
        if algo.emits_mutations:
            raise NotImplementedError(
                f"{algo.name} emits graph mutations (GraphEditor surface) "
                "— the resident executor binds CSR blocks at start; run "
                "the durable SuperstepEngine"
            )
        if algo.has_global:
            raise NotImplementedError(
                f"{algo.name} uses the per-superstep global aggregator "
                "(has_global) — implemented on the durable SuperstepEngine "
                "(the value rides its checkpoint manifests); run that"
            )
        if graph.meta.get("n_dangling", 0):
            raise NotImplementedError(
                f"graph has {graph.meta['n_dangling']} edges to missing "
                "vertices; the resident dense path would misroute them — "
                "run SuperstepEngine (on_undeliverable drop/raise/create)"
            )
        eps = cfg.eps if eps is None else eps
        max_supersteps = (
            cfg.max_supersteps if max_supersteps is None else max_supersteps
        )
        threshold = (
            cfg.signal_threshold if signal_threshold is None else signal_threshold
        )
        ckpt_int = (
            cfg.checkpoint_interval if checkpoint_interval is None else checkpoint_interval
        )
        conv_int = (
            cfg.convergence_check_interval
            if convergence_check_interval is None
            else convergence_check_interval
        )
        time_limit_s = cfg.time_limit_s if time_limit_s is None else time_limit_s
        run_dir = run_dir or os.path.join(
            cfg.checkpoint_root,
            f"{algo.name}-{os.path.basename(graph.graph_dir)}-resident",
        )
        os.makedirs(run_dir, exist_ok=True)
        P = graph.num_partitions
        # leave ≥2 CPUs for the driver + raylet: at W == cluster CPUs the
        # barrier collapses ~5x from oversubscription (measured)
        cpu_cap = max(1, int(ray.cluster_resources().get("CPU", 4)) - 2)
        if self._explicit_workers:
            # explicit pool size: honored up to CPUs and partitions
            W = max(1, min(self.W, cpu_cap, P))
        else:
            # AUTO sizing: cap the pool so each worker has enough
            # per-step work to amortize the barrier (~50k edges/worker
            # floor).
            W = max(1, min(self.W, cpu_cap, P, graph.num_edges // 50_000 + 1))
            # Dense-exchange algorithms ship O(V/P) slices per partition
            # and touch an O(V) accumulator per worker, so past E/(2V)
            # workers the per-worker O(V) term dominates. Per-step cost ≈
            # α·W (exchange objects + barrier straggler tail grows with
            # pool size) + E/(W·σ) (scatter compute) → optimum scales as
            # sqrt(E)/C with C = EngineConfig.dense_worker_cost (measured
            # single-node optima: E=1.6M→W 5, E=2.6M→W 6, E=9.6M→W 6–16).
            # At cluster scale E is orders larger, so this cap stops
            # binding long before the CPU cap does.
            if algo.dense_agg is not None and graph.num_vertices > 0:
                W = max(1, min(W, graph.num_edges // (2 * graph.num_vertices) + 1))
                cost = max(cfg.dense_worker_cost, 1e-9)
                sqrt_cap = max(1, int(np.sqrt(graph.num_edges) / cost) + 1)
                if sqrt_cap < W:
                    _logger.info(
                        "resident pool auto-capped at W=%d by the dense "
                        "per-step cost model (sqrt(E)/%g, E=%d); CPUs would "
                        "allow %d — pass num_workers explicitly or tune "
                        "EngineConfig.dense_worker_cost to override",
                        sqrt_cap, cost, graph.num_edges, W,
                    )
                    W = sqrt_cap
        t0 = time.monotonic()

        lineage_base = {
            "graph_dir": os.path.abspath(graph.graph_dir),
            "algorithm": algo.name,
            "signal_threshold": threshold,
            "eps": eps,
            "num_partitions": P,
            "executor": "resident",
        }

        csr_refs = graph.csr_refs()
        vertex_files = {
            int(os.path.basename(f).split("-")[1].split(".")[0]): f
            for f in graph.vertex_files()
        }
        parts_by_worker = {w: [p for p in range(P) if p % W == w] for w in range(W)}
        offsets, sizes = (None, None)
        dense_capable = algo.dense_agg is not None and "part_sizes" in graph.meta
        if dense_capable:
            offsets, sizes = graph.part_offsets()
        WorkerActor = ray.remote(_Worker)
        workers = [
            WorkerActor.options(num_cpus=1).remote(
                w, parts_by_worker[w], [csr_refs], algo, P, W, threshold,
                offsets, sizes, graph.part_fn,
            )
            for w in range(W)
        ]

        per_step: List[dict] = []
        start_k = None
        if resume:
            latest = SuperstepEngine._latest_complete_step(run_dir)
            if latest is not None:
                with open(
                    os.path.join(
                        SuperstepEngine._step_dir(run_dir, latest), "manifest.json"
                    )
                ) as f:
                    m = json.load(f)
                lg = m.get("lineage", {})
                if (
                    lg.get("algorithm") == algo.name
                    and lg.get("graph_dir") == lineage_base["graph_dir"]
                ):
                    rows = _flatten(
                        ray.get(
                            [
                                w.load_checkpoint.remote(
                                    SuperstepEngine._step_dir(run_dir, latest)
                                )
                                for w in workers
                            ]
                        )
                    )
                    start_k = latest
                    per_step = [m]
        if start_k is None:
            for d in glob.glob(os.path.join(run_dir, "step=*")) + glob.glob(
                os.path.join(run_dir, ".tmp-step=*")
            ):
                shutil.rmtree(d)
            rows = _flatten(
                ray.get([w.init_from_vertices.remote(vertex_files) for w in workers])
            )
            manifest = SuperstepEngine._manifest(0, rows, lineage_base, None)
            self._checkpoint(workers, run_dir, 0, manifest,
                             retain=self.config.checkpoint_retain)
            per_step = [manifest]
            start_k = 0

        k = start_k
        last = per_step[-1]
        converged = SuperstepEngine._is_converged(last, eps, k)

        import types

        return types.SimpleNamespace(
            graph=graph,
            algo=algo,
            eps=eps,
            max_supersteps=max_supersteps,
            ckpt_int=ckpt_int,
            conv_int=conv_int,
            time_limit_s=time_limit_s,
            run_dir=run_dir,
            workers=workers,
            lineage_base=lineage_base,
            per_step=per_step,
            k=k,
            last=last,
            converged=converged,
            dense_capable=dense_capable,
            threshold=threshold,
            t0=t0,
        )

    def run(
        self,
        graph,
        algo: Algorithm,
        run_dir: Optional[str] = None,
        resume: bool = True,
        eps: Optional[float] = None,
        max_supersteps: Optional[int] = None,
        signal_threshold: Optional[float] = None,
        checkpoint_interval: Optional[int] = None,
        time_limit_s: Optional[float] = None,
        global_termination=None,
        convergence_check_interval: Optional[int] = None,
    ) -> ExecutionInformation:
        import ray

        ns = self._prepare(
            graph, algo, run_dir, resume, eps, max_supersteps,
            signal_threshold, checkpoint_interval, time_limit_s,
            convergence_check_interval,
        )
        self._last_ns = ns  # introspection / fault-injection tests
        restarts = 0
        t0_orig = ns.t0
        try:
            while True:
                try:
                    return self._run_loop(ns, graph, algo, global_termination)
                except ray.exceptions.RayActorError as e:
                    # a worker actor died mid-run (node loss, OOM kill).
                    # The per-superstep checkpoints exist precisely for
                    # this: rebuild the pool and resume from the latest
                    # complete step instead of losing the whole run —
                    # on a 256-node cluster a single lost worker must
                    # not cost a multi-hour 100-TB pass.
                    restarts += 1
                    if restarts > self.config.max_worker_restarts:
                        raise
                    _logger.warning(
                        "resident worker pool lost (%s); restarting from "
                        "the latest checkpoint (attempt %d/%d)",
                        e, restarts, self.config.max_worker_restarts,
                    )
                    for w in ns.workers:
                        ray.kill(w, no_restart=True)
                    old_steps = ns.per_step
                    ns = self._prepare(
                        graph, algo, ns.run_dir, True, eps, max_supersteps,
                        signal_threshold, checkpoint_interval, time_limit_s,
                        convergence_check_interval,
                    )
                    # splice pre-crash manifests below the resume point so
                    # per_step / edges_traversed_total stay complete
                    ns.per_step = [
                        m for m in old_steps if m["superstep"] < ns.k
                    ] + ns.per_step
                    ns.t0 = t0_orig  # wall / time-limit span the whole run
                    self._last_ns = ns
        finally:
            # release the pool whatever path ends the run: each worker
            # reserves a CPU slot until the actor dies, and leaving
            # teardown to async handle-GC starves the next pipeline in
            # the session (measured: 30 lingering workers left 2/32 CPUs
            # for a follow-on Ray Data stage)
            for w in ns.workers:
                ray.kill(w, no_restart=True)

    def _run_loop(self, ns, graph, algo, global_termination) -> ExecutionInformation:
        import ray

        eps, max_supersteps = ns.eps, ns.max_supersteps
        ckpt_int, conv_int, time_limit_s = ns.ckpt_int, ns.conv_int, ns.time_limit_s
        run_dir, workers, lineage_base = ns.run_dir, ns.workers, ns.lineage_base
        per_step, k, last, converged = ns.per_step, ns.k, ns.last, ns.converged
        dense_capable, t0 = ns.dense_capable, ns.t0
        reason = "Converged" if converged else None

        def _mode(manifest) -> str:
            # dense scatter exchange when the frontier is dense enough
            # that raw signal rows would exceed one dense vector
            return (
                "dense"
                if dense_capable
                and manifest.get("edges_next", 0) >= graph.num_vertices
                else "sparse"
            )

        # Fused loop: ONE actor barrier per superstep. Step k's signal
        # phase runs inside the same actor call that collects step k-1,
        # so the mode for step k+1's signals is decided from manifest
        # k-1 (one step stale — mode choice affects only performance,
        # never results). Outbox refs are never fetched on the driver —
        # workers exchange them directly through the object store.
        sig_refs = None
        pending_mode = None
        if not converged:
            pending_mode = _mode(last)
            sig_refs = [
                (w.signal_dense.remote() if pending_mode == "dense" else w.signal.remote())
                for w in workers
            ]
        # Sync batching: rounds are SUBMITTED without fetching metrics —
        # worker round r+1 depends on round r's outbox refs, so Ray
        # chains the supersteps actor-to-actor and the driver pays ONE
        # metrics fetch per `eff_int` rounds instead of one blocking
        # barrier per superstep (the dominant cost of small supersteps
        # under scheduler jitter). eff_int = 1 (default) is the exact
        # round-1 behavior: convergence checked after every superstep.
        # With eff_int > 1 an eps-run may overshoot the first converged
        # round by up to eff_int-1 extra rounds (harmless: the engine
        # keeps iterating the same fixpoint map; fixed-k runs still stop
        # at exactly k). Checkpoints and global-termination checks force
        # the sync cadence down to their own intervals.
        eff_int = max(1, conv_int)

        def _must_sync(kk: int) -> bool:
            # batch boundary, end of run, or a cadence the user asked to
            # observe exactly (checkpoint / global-termination multiples)
            return (
                len(pending) >= eff_int
                or kk >= max_supersteps
                or (bool(ckpt_int) and kk % ckpt_int == 0)
                or (
                    global_termination is not None
                    and kk % max(global_termination.interval, 1) == 0
                )
            )
        pending: List[tuple] = []  # (k, metrics_refs) awaiting sync

        def drain_pending():
            nonlocal last, converged, reason
            if not pending:
                return
            t_sync0 = pending_started[0]
            flat = ray.get([r for _, refs in pending for r in refs])
            per_round_wall = (time.monotonic() - t_sync0) / len(pending)
            i = 0
            for kk, refs in pending:
                rows = _flatten(flat[i : i + len(refs)])
                i += len(refs)
                manifest = SuperstepEngine._manifest(
                    kk, rows, lineage_base, prev_step=kk - 1,
                    wall_s=per_round_wall,
                )
                per_step.append(manifest)
                last = manifest
                if not converged and SuperstepEngine._is_converged(
                    manifest, eps, kk
                ):
                    converged = True
                    reason = "Converged"
            pending.clear()

        pending_started = [time.monotonic()]
        while not converged:
            if k >= max_supersteps:
                reason = "StepsLimitReached"
                break
            if time_limit_s is not None and time.monotonic() - t0 > time_limit_s:
                drain_pending()
                if not converged:
                    reason = "TimeLimitReached"
                break
            k += 1
            if not pending:
                pending_started[0] = time.monotonic()
            next_mode = _mode(last)
            rets = [
                w.collect_and_signal.options(num_returns=2).remote(
                    sig_refs, pending_mode, next_mode,
                    k >= max_supersteps,  # final step's outbox is dead
                )
                for w in workers
            ]
            sig_refs = [r[0] for r in rets]
            pending.append((k, [r[1] for r in rets]))
            pending_mode = next_mode
            if not _must_sync(k):
                continue
            drain_pending()
            if (
                not converged
                and global_termination is not None
                and k % max(global_termination.interval, 1) == 0
            ):
                agg = global_termination.reduce(
                    _flatten(
                        ray.get([w.aggregate_states.remote(global_termination) for w in workers])
                    )
                )
                if global_termination.should_terminate(agg):
                    converged = True
                    reason = "GlobalConstraintMet"
            if converged or (ckpt_int and k % ckpt_int == 0):
                self._checkpoint(workers, run_dir, k, last,
                                 retain=self.config.checkpoint_retain)
        drain_pending()
        # the final step must exist on disk whatever path ended the loop
        # (in-loop converged/interval checkpoints make this a no-op)
        if not os.path.exists(
            os.path.join(SuperstepEngine._step_dir(run_dir, k), "manifest.json")
        ):
            self._checkpoint(workers, run_dir, k, last,
                             retain=self.config.checkpoint_retain)

        return ExecutionInformation(
            algorithm=algo.name,
            supersteps=k,
            converged=converged,
            termination_reason=reason or "Converged",
            wall_s=time.monotonic() - t0,
            residual_max=last["residual_max"],
            n_active=last["n_active"],
            edges_traversed_total=sum(m.get("edges_next", 0) for m in per_step[:-1]),
            run_dir=run_dir,
            final_step_dir=SuperstepEngine._step_dir(run_dir, k),
            per_step=per_step,
        )

    def interactive(
        self,
        graph,
        algo: Algorithm,
        run_dir: Optional[str] = None,
        resume: bool = True,
        eps: Optional[float] = None,
        max_supersteps: Optional[int] = None,
        signal_threshold: Optional[float] = None,
        checkpoint_interval: Optional[int] = None,
        convergence_check_interval: Optional[int] = None,
    ) -> "InteractiveComputation":
        """ExecutionMode.Interactive equivalent (reference
        ``ExecutionMode.scala:80-88``): the console's step/continue
        control surface without the web UI — advance the computation one
        superstep at a time, observe aggregates and manifests between
        steps, checkpoint on demand, ``finish()`` when done."""
        ns = self._prepare(
            graph, algo, run_dir, resume, eps, max_supersteps,
            signal_threshold, checkpoint_interval, None,
            convergence_check_interval,
        )
        return InteractiveComputation(ns)

    @staticmethod
    def _checkpoint(workers, run_dir: str, k: int, manifest: dict,
                    retain=None):
        import ray

        step_dir = SuperstepEngine._step_dir(run_dir, k)
        if os.path.exists(step_dir):
            return
        tmp = os.path.join(run_dir, f".tmp-step={k:05d}")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        os.makedirs(tmp)
        ray.get([w.checkpoint.remote(tmp) for w in workers])
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(tmp, step_dir)
        SuperstepEngine._prune_checkpoints(run_dir, retain)


def _flatten(lists):
    return [r for rows in lists for r in rows]


class InteractiveComputation:
    """Step-wise control of a resident computation — the
    ExecutionMode.Interactive surface (reference
    ``ExecutionMode.scala:80-88``, console step/continue/terminate)
    without the web UI. One ``step()`` = one superstep (collect the
    previous signals, signal the next frontier) with metrics synced
    every step; ``aggregate`` reads live state between steps;
    ``finish()`` writes the final checkpoint and returns the
    ExecutionInformation (reason ``TerminatedByUser`` when stopped
    before convergence, mirroring the console's terminate button)."""

    def __init__(self, ns):
        self._ns = ns
        self._sig_refs = None
        self._pending_mode = None
        self.reason = "Converged" if ns.converged else None
        self._break_conditions: dict = {}
        self._next_bc_id = 0
        self.triggered: dict = {}  # condition id -> observed value

    # -- observation -------------------------------------------------------
    @property
    def converged(self) -> bool:
        return self._ns.converged

    @property
    def superstep(self) -> int:
        return self._ns.k

    @property
    def last_manifest(self) -> dict:
        return self._ns.last

    @property
    def manifests(self) -> list:
        return list(self._ns.per_step)

    def aggregate(self, agg):
        """Global aggregation over the live vertex states (the console's
        mid-run aggregate view). ``agg`` follows the GlobalTermination
        protocol: ``aggregate_partition(cols)`` + ``reduce(partials)``."""
        import ray

        partials = [
            x
            for part in ray.get(
                [w.aggregate_states.remote(agg) for w in self._ns.workers]
            )
            for x in part
        ]
        return agg.reduce(partials)

    def out_neighbors(self, vids) -> dict:
        """Merged out-neighbor lists for ``vids`` across the worker pool
        (console GraphDataProvider vicinity probes)."""
        import ray

        merged: dict = {}
        for part in ray.get(
            [w.out_neighbors.remote(list(vids)) for w in self._ns.workers]
        ):
            for v, ds in part.items():
                merged.setdefault(v, []).extend(ds)
        return merged

    def in_neighbor_sources(self, vids) -> list:
        """Vertices with an edge INTO ``vids`` (incoming-vicinity probe)."""
        import ray

        srcs: set = set()
        for part in ray.get(
            [w.in_neighbor_sources.remote(list(vids)) for w in self._ns.workers]
        ):
            srcs.update(part)
        return sorted(srcs)

    # -- break conditions (console BreakConditionsProvider surface,
    # reference DefaultGraph.scala:417-427 addCondition/removeCondition,
    # checked between steps like checkBreakConditions at :534-545) ---------
    def add_break_condition(self, cond) -> int:
        """Attach a ``modes.BreakCondition``; returns its id. Stepping
        pauses (``run_to_convergence`` returns early) when it fires."""
        cid = self._next_bc_id
        self._next_bc_id += 1
        self._break_conditions[cid] = cond
        if cond.kind == "state_changes" and cond.value is None:
            cond.check(self.aggregate(cond))  # capture the current state
        return cid

    def remove_break_condition(self, cid: int):
        self._break_conditions.pop(cid, None)

    def _check_break_conditions(self) -> bool:
        self.triggered = {}
        for cid, cond in self._break_conditions.items():
            if cond.check(self.aggregate(cond)):
                self.triggered[cid] = cond.observed
        return bool(self.triggered)

    # -- control -----------------------------------------------------------
    def _mode(self, manifest) -> str:
        ns = self._ns
        return (
            "dense"
            if ns.dense_capable
            and manifest.get("edges_next", 0) >= ns.graph.num_vertices
            else "sparse"
        )

    def step(self, n: int = 1) -> dict:
        """Advance up to ``n`` supersteps (stops early at convergence or
        the step limit); returns the latest manifest."""
        import ray

        ns = self._ns
        self.triggered = {}
        for _ in range(n):
            if ns.converged:
                break
            if ns.k >= ns.max_supersteps:
                self.reason = "StepsLimitReached"
                break
            if self._sig_refs is None:
                # first step after setup/resume: issue the initial signal
                # phase (one extra barrier, once)
                self._pending_mode = self._mode(ns.last)
                self._sig_refs = [
                    (
                        w.signal_dense.remote()
                        if self._pending_mode == "dense"
                        else w.signal.remote()
                    )
                    for w in ns.workers
                ]
            ns.k += 1
            t_step = time.monotonic()
            next_mode = self._mode(ns.last)
            rets = [
                w.collect_and_signal.options(num_returns=2).remote(
                    self._sig_refs, self._pending_mode, next_mode,
                    ns.k >= ns.max_supersteps,
                )
                for w in ns.workers
            ]
            self._sig_refs = [r[0] for r in rets]
            self._pending_mode = next_mode
            rows = _flatten(ray.get([r[1] for r in rets]))
            manifest = SuperstepEngine._manifest(
                ns.k, rows, ns.lineage_base, prev_step=ns.k - 1,
                wall_s=time.monotonic() - t_step,
            )
            ns.per_step.append(manifest)
            ns.last = manifest
            if SuperstepEngine._is_converged(manifest, ns.eps, ns.k):
                ns.converged = True
                self.reason = "Converged"
            if ns.ckpt_int and ns.k % ns.ckpt_int == 0:
                self.checkpoint()
            if self._break_conditions and self._check_break_conditions():
                # the console's pause-on-condition (DefaultGraph.scala:534-545)
                break
        return ns.last

    def run_to_convergence(self) -> dict:
        """The console's continue button: step until convergence or the
        step limit; returns the final manifest."""
        while not self._ns.converged and self._ns.k < self._ns.max_supersteps:
            self.step()
            if self.triggered:
                break
        return self._ns.last

    def checkpoint(self):
        """Write the current superstep's checkpoint now (no-op if it
        already exists on disk)."""
        ns = self._ns
        ResidentEngine._checkpoint(ns.workers, ns.run_dir, ns.k, ns.last)

    def finish(self) -> ExecutionInformation:
        """Persist the final step and return the execution information."""
        ns = self._ns
        if not os.path.exists(
            os.path.join(
                SuperstepEngine._step_dir(ns.run_dir, ns.k), "manifest.json"
            )
        ):
            self.checkpoint()
        if self.reason is None:
            self.reason = "TerminatedByUser"
        # NOTE: the pool is NOT killed here — the console surface stays
        # inspectable after finish() (live aggregates over final state);
        # resident workers hold no peer handles, so dropping this
        # InteractiveComputation reclaims their CPU slots via handle-GC.
        return ExecutionInformation(
            algorithm=ns.algo.name,
            supersteps=ns.k,
            converged=ns.converged,
            termination_reason=self.reason,
            wall_s=time.monotonic() - ns.t0,
            residual_max=ns.last["residual_max"],
            n_active=ns.last["n_active"],
            edges_traversed_total=sum(
                m.get("edges_next", 0) for m in ns.per_step[:-1]
            ),
            run_dir=ns.run_dir,
            final_step_dir=SuperstepEngine._step_dir(ns.run_dir, ns.k),
            per_step=ns.per_step,
        )
