"""HyperBall — approximate neighborhood function and effective
diameter (Boldi, Rosa & Vigna 2011; Palmer's ANF 2002 — public
literature). THE web-graph distance analysis: N(t) = number of ordered
pairs (v, u) with d(v, u) ≤ t, estimated by giving every vertex a
HyperLogLog counter of its ball and propagating

    ball_t(v) = ball_{t-1}(v) ∪ ⋃_{v→u} ball_{t-1}(u)

until no register changes. |ball_t(v)| summed over v estimates N(t);
the effective diameter is the smallest t with N(t) ≥ α·N(∞).

Ray shape: per-vertex register matrices (uint8[V_p × 2^p]) live in the
object store, one block per graph partition — the same
vertex→partition mapping as the engine CSRs. Each round is a typed
two-phase exchange mirroring the resident engine's outbox pattern:

  phase 1 (serve): partition r slices out the register rows OTHER
  partitions' edges point at — the (p, r) request lists are computed
  ONCE from the static CSR dst sets, so per round each pair ships
  exactly the needed rows, never the whole state;
  phase 2 (update): partition p gathers its edge-aligned neighbor
  rows and folds them with ONE ``np.maximum.reduceat`` over its CSR
  segments — the HLL union is element-wise max, the same
  commutative-associative combiner property every engine aggregation
  exploits (``AggregationOperation.scala:27-59``).

Memory per partition is V_p · 2^p bytes (p=8 → 256 B/vertex); rounds
are O(effective diameter), which is small on web graphs. All hashing
is ``util.mix64`` — deterministic across runs and partitioning (pinned
in tests against an exact BFS neighborhood function). Dangling
destinations (dropped-vertex handling) contribute empty balls, the
``on_undeliverable="drop"`` convention.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from signal_collect_ray.util import mix64, part_of


def _rho_of(h: np.ndarray, p: int):
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    nz = w > 0
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    rho[nz] = (64 - p) - np.floor(
        np.log2(w[nz].astype(np.float64))
    ).astype(np.int64)
    return idx, rho


def _init_regs(vids: np.ndarray, p: int) -> np.ndarray:
    """Each vertex's ball starts as {itself}."""
    regs = np.zeros((len(vids), 1 << p), dtype=np.uint8)
    idx, rho = _rho_of(mix64(vids.astype(np.uint64)), p)
    regs[np.arange(len(vids)), idx] = rho
    return regs


def _estimates(regs: np.ndarray, p: int) -> np.ndarray:
    """Row-wise HLL estimate with linear-counting small-range fix."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    e = alpha * m * m / s
    zeros = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    e[small] = lc[small]
    return e


def _exact_q20_sum(regs: np.ndarray, p: int) -> int:
    """Σ_v round_half_away(e_v · 2^20) as an exact int64 — each e_v is
    computed from the EXACT integer register sum Σ2^(64−r) (arbitrary
    precision; see sketches._estimate for the power-of-two-rescale
    equivalence with the float form), so the per-vertex estimate and
    the 2^20-quantized total are bit-reproducible in any merge order
    AND mirrorable in SQL (POW(2, 64−rho)::HUGEINT / ROUND(e·2^20)).
    Python-int per row: only the oracle-gated exact mode pays this;
    the bench path keeps the vectorized float `_estimates`."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    tot = 0
    for row in regs:
        counts = np.bincount(row, minlength=1)
        s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
        e = alpha * m * m * float(1 << 64) / float(s_int)
        zeros = int(counts[0])
        if e <= 2.5 * m and zeros > 0:
            e = m * np.log(m / zeros)
        tot += int(np.floor(e * 1048576.0 + 0.5))
    return tot


def _pnum(path: str) -> int:
    return int(os.path.basename(path).split("-")[1].split(".")[0])


def neighborhood_function(
    graph, p: int = 8, max_rounds: int = 64, alpha: float = 0.9,
    exchange_buckets: int = 16, exact: bool = False,
):
    """Run HyperBall over ``graph``. Returns a dict with

    - ``nf``: list of N(t) estimates, t = 0..T (monotone, converged)
    - ``effective_diameter``: smallest t with N(t) ≥ alpha · N(T)
    - ``rounds``: T

    The exchange runs over ``min(P, exchange_buckets)`` state BUCKETS
    (graph partitions grouped ``part % B``): register traffic per round
    is inherently Σ|shard dst sets| · 2^p bytes regardless of B, but
    task/ObjectRef count is O(B²) per round, so a measured B ≈ CPU
    count keeps Ray bookkeeping off the critical path where hundreds of
    engine-sized partitions would drown it (the same reasoning as the
    resident engine's worker-pool cost model). Per-bucket planning
    (unique dsts, owners, CSR concat) runs as one remote task per
    bucket, not on the driver."""
    import pyarrow.parquet as pq
    import ray

    csr_refs = graph.csr_refs()
    P = graph.num_partitions
    B = max(1, min(P, exchange_buckets))

    # all partition vertices (vid-sorted shards), not just sources —
    # sinks keep their singleton ball and must count in N(t)
    vids_by_part: Dict[int, np.ndarray] = {}
    for f in graph.vertex_files():
        q = _pnum(f)
        v = pq.read_table(f, columns=["vid"]).column("vid").to_numpy(
            zero_copy_only=False
        )
        vids_by_part[q] = np.asarray(v, dtype=np.int64)

    parts = sorted(set(list(csr_refs) + list(vids_by_part)))
    bucket_parts = {b: [q for q in parts if q % B == b] for b in range(B)}

    @ray.remote
    def build_plan(member_vids, *csrs):
        """one bucket's static routing plan: concatenated CSR segments,
        unique dsts + owner buckets, source rows in bucket vid order."""
        bucket_vids = (
            np.sort(np.concatenate(member_vids))
            if member_vids
            else np.empty(0, np.int64)
        )
        dsts, indptrs, srcs = [], [np.zeros(1, np.int64)], []
        off = 0
        for csr in csrs:
            dsts.append(csr["dst"])
            indptrs.append(csr["indptr"][1:] + off)
            off += len(csr["dst"])
            srcs.append(csr["src_ids"])
        dst_all = (
            np.concatenate(dsts) if dsts else np.empty(0, np.int64)
        )
        src_all = (
            np.concatenate(srcs) if srcs else np.empty(0, np.int64)
        )
        dst_u, dst_inv = np.unique(dst_all, return_inverse=True)
        plan = {
            "dst_unique": dst_u,
            "dst_inv": dst_inv.astype(np.int64),
            "owner": part_of(dst_u, P) % B,
            "src_rows": np.searchsorted(bucket_vids, src_all).astype(
                np.int64
            ),
            "indptr": np.concatenate(indptrs).astype(np.int64),
        }
        return plan, bucket_vids

    plan_outs = {
        b: build_plan.remote(
            [vids_by_part[q] for q in bucket_parts[b] if q in vids_by_part],
            *[csr_refs[q] for q in bucket_parts[b] if q in csr_refs],
        )
        for b in range(B)
    }
    plans: Dict[int, dict] = {}
    vids_by_bucket: Dict[int, np.ndarray] = {}
    for b in range(B):
        plans[b], vids_by_bucket[b] = ray.get(plan_outs[b])
    parts = list(range(B))
    vids_by_part = vids_by_bucket

    # request[r][q] = vids bucket q needs from owner bucket r (sorted)
    request: Dict[int, Dict[int, np.ndarray]] = {r: {} for r in parts}
    for q in parts:
        owner = plans[q]["owner"]
        for r in parts:
            sel = np.flatnonzero(owner == r)
            if len(sel):
                request[r][q] = plans[q]["dst_unique"][sel]

    @ray.remote
    def serve(state, vids, changed, *wanted_lists):
        """DELTA propagation (the HyperBall systolic optimization): a
        neighbor row that did not change last round is already absorbed
        by every receiver (max-merge is monotone), so only CHANGED rows
        ship — per-round traffic decays with the shrinking frontier.
        ONE task per owner partition per round with one return value per
        requesting partition (``num_returns``): O(P) tasks, and each
        requester fetches only its own (positions, rows) slice. Vids
        absent from this partition (dangling dsts) contribute nothing
        (empty balls)."""
        outs = []
        for wanted in wanted_lists:
            if len(vids):
                pos = np.searchsorted(vids, wanted)
                pos_c = np.minimum(pos, len(vids) - 1)
                hot = (pos < len(vids)) & (vids[pos_c] == wanted)
                hot &= changed[pos_c]
                idx = np.flatnonzero(hot)
                rows = state[pos_c[idx]]
            else:
                idx = np.empty(0, np.int64)
                rows = np.empty((0, state.shape[1]), np.uint8)
            outs.append((idx.astype(np.int64), rows))
        return outs[0] if len(outs) == 1 else tuple(outs)

    @ray.remote
    def update(state, plan_d, hll_p, exact_est, *served):
        """fold the served (positions-into-wanted, rows) deltas into
        each source's registers via one segment-max; unserved neighbor
        slots stay zero — a no-op under max."""
        m = state.shape[1]
        nbr = np.zeros((len(plan_d["dst_unique"]), m), dtype=np.uint8)
        i = 0
        owner = plan_d["owner"]
        for r in sorted(set(owner.tolist())):  # same order as `served`
            sel = np.flatnonzero(owner == r)
            idx, rows = served[i]
            nbr[sel[idx]] = rows
            i += 1
        if len(plan_d["src_rows"]):
            edge_rows = nbr[plan_d["dst_inv"]]
            seg_max = np.maximum.reduceat(
                edge_rows, plan_d["indptr"][:-1], axis=0
            )
            new_state = state.copy()
            rows_ = plan_d["src_rows"]
            new_state[rows_] = np.maximum(state[rows_], seg_max)
            changed_mask = (new_state != state).any(axis=1)
        else:
            new_state = state
            changed_mask = np.zeros(len(state), dtype=bool)
        if exact_est:
            est = _exact_q20_sum(new_state, hll_p)
        else:
            est = float(_estimates(new_state, hll_p).sum())
        # num_returns=3 at the call site: state and mask stay remote
        return new_state, changed_mask, (bool(changed_mask.any()), est)

    # ---- init
    state_refs, vids_refs, plan_refs = {}, {}, {}
    nf0 = 0 if exact else 0.0
    for q in parts:
        regs = _init_regs(vids_by_part[q], p)
        nf0 += (
            _exact_q20_sum(regs, p)
            if exact
            else float(_estimates(regs, p).sum())
        )
        state_refs[q] = ray.put(regs)
        vids_refs[q] = ray.put(vids_by_part[q])
        plan_refs[q] = ray.put(plans[q])

    # request[r] iterated in a fixed order so serve's return slots are
    # addressable: owner r serves sorted(request[r]) requesters
    req_order = {r: sorted(request[r]) for r in parts}
    # round 1: every row is "changed" (the initial singleton balls)
    mask_refs = {
        q: ray.put(np.ones(len(vids_by_part[q]), dtype=bool)) for q in parts
    }

    nf: List[float] = [nf0]
    for _t in range(1, max_rounds + 1):
        # one multi-return serve per OWNER partition, changed rows only
        slices: Dict[int, Dict[int, "object"]] = {q: {} for q in parts}
        for r in parts:
            qs = req_order[r]
            if not qs:
                continue
            out = serve.options(num_returns=len(qs)).remote(
                state_refs[r], vids_refs[r], mask_refs[r],
                *[request[r][q] for q in qs],
            )
            if len(qs) == 1:
                slices[qs[0]][r] = out
            else:
                for q, ref in zip(qs, out):
                    slices[q][r] = ref
        served = {q: [slices[q][r] for r in sorted(slices[q])] for q in parts}
        # num_returns=3: state and changed-mask refs feed the next round
        # WITHOUT round-tripping the driver; only (changed, estimate)
        # scalars are fetched
        results = {
            q: update.options(num_returns=3).remote(
                state_refs[q], plan_refs[q], p, exact, *served[q]
            )
            for q in parts
        }
        metas = ray.get([results[q][2] for q in parts])
        any_changed = False
        total = 0 if exact else 0.0
        for (changed, est), q in zip(metas, parts):
            any_changed |= changed
            total += est
            state_refs[q] = results[q][0]
            mask_refs[q] = results[q][1]
        if not any_changed:
            break
        nf.append(total)

    if exact:
        # quantized int64 totals → exact dyadic doubles (k/2^20)
        nf = [q20 / 1048576.0 for q20 in nf]
    n_inf = nf[-1]
    eff = next(t for t, x in enumerate(nf) if x >= alpha * n_inf)
    return {
        "nf": nf,
        "effective_diameter": int(eff),
        "rounds": len(nf) - 1,
    }
