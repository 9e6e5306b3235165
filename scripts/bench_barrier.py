"""Superstep-barrier decomposition: prove where the per-round floor is.

Three measurements, one JSON line each:

1. ``ray_floor``   — a MINIMAL Ray program: W chained actors, each round
   every actor ray.gets all W previous outputs and returns a W-entry
   dict of small arrays (the exact dependency/object structure of a BSP
   all-to-all), with ZERO compute. This is the cost Ray itself charges
   for a superstep at pool size W on this host.
2. ``engine_floor`` — the resident engine running PageRank on a tiny
   graph (~20k edges, sub-ms of per-round compute): the engine's real
   per-round cost at the same W.
3. ``engine_job``   — the engine on the strong-scaling job's graph
   (40k pages × 64 links ≈ 2.6M edges) across W, with the in-actor
   compute split out (collect_s + signal_s from the step manifests).

Reading the output: engine_floor ≈ ray_floor (small multiple) at every
W, both GROW with W (~1.5-3 ms per extra worker: task dispatch, W²
dependency resolution, straggler tail), and at the measured optimum W
the round is dominated by that floor, not by exchange volume or kernel
compute — i.e. the strong-scaling ceiling of ms-scale supersteps is
Ray-RPC-bound. At 100 TB scale each round carries 10^5-10^6 x more
compute per worker and the floor vanishes into it (the weak-scaling
regime bench.py --scaling-weak measures).

Usage: python scripts/bench_barrier.py  (RAY_GRAFT_CPUS, default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

WORKER_COUNTS = [2, 6, 14, 30]
ROUNDS = 60
CHAIN = 8  # rounds submitted per driver sync, same as conv_int batching


def _init():
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import logging

    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def ray_floor():
    import ray

    @ray.remote
    class W:
        def __init__(self, wid, n):
            self.wid, self.n = wid, n

        def step(self, refs, payload):
            if refs:
                ray.get(refs)
            return {w: np.zeros(payload) for w in range(self.n)}, {"wid": self.wid}

    out = {}
    for Wn in WORKER_COUNTS:
        best = None
        for _rep in range(2):  # min-of-2: a floor is a best-case number
            ws = [W.options(num_cpus=1).remote(i, Wn) for i in range(Wn)]
            rets = [w.step.options(num_returns=2).remote(None, 16) for w in ws]
            sig = [r[0] for r in rets]
            ray.get([r[1] for r in rets])  # warmup barrier
            t0 = time.monotonic()
            pend = []
            for _ in range(ROUNDS):
                rets = [w.step.options(num_returns=2).remote(sig, 16) for w in ws]
                sig = [r[0] for r in rets]
                pend.append([r[1] for r in rets])
                if len(pend) >= CHAIN:
                    ray.get([x for refs in pend for x in refs])
                    pend.clear()
            ray.get([x for refs in pend for x in refs])
            ms = round(1000 * (time.monotonic() - t0) / ROUNDS, 1)
            best = ms if best is None else min(best, ms)
            for w in ws:
                ray.kill(w)
        out[Wn] = best
    return {"metric": "ray_allreduce_floor_ms_per_round", "by_workers": out}


def _graph(pages: int, links: int, tag: str):
    from signal_collect_ray import Graph
    from signal_collect_ray.sources import pages_to_edges, synthesize_pages_dataset

    gdir = f"/tmp/scray_barrier/{tag}"
    if os.path.exists(os.path.join(gdir, "meta.json")):
        return Graph.load(gdir)
    pages_ds = synthesize_pages_dataset(pages, avg_links=links, seed=42)
    return Graph.build(pages_to_edges(pages_ds), gdir, num_partitions=64)


def engine_rounds(g, tag: str, with_compute_split: bool = False):
    from signal_collect_ray import EngineConfig
    from signal_collect_ray.algorithms import PageRank
    from signal_collect_ray.engine_resident import ResidentEngine

    out = {}
    for Wn in WORKER_COUNTS:
        best = None
        for _rep in range(2):  # min-of-2: a floor is a best-case number
            cfg = EngineConfig(
                num_partitions=64, eps=0.0, max_supersteps=ROUNDS,
                convergence_check_interval=CHAIN,
            )
            eng = ResidentEngine(cfg, num_workers=Wn)
            t0 = time.monotonic()
            info = eng.run(
                g, PageRank(), run_dir=f"/tmp/scray_barrier/run_{tag}_{Wn}",
                resume=False, checkpoint_interval=500,
            )
            ms = 1000 * (time.monotonic() - t0) / max(info.supersteps, 1)
            row = {"ms_per_round": round(ms, 1)}
            if with_compute_split:
                steps = [m for m in info.per_step if m.get("superstep", 0) > 0]
                comp = [
                    sum(
                        p.get("collect_s", 0) + p.get("signal_s", 0)
                        for p in m.get("parts", [])
                    )
                    for m in steps
                ]
                row["compute_ms_per_worker"] = round(
                    1000 * float(np.mean(comp)) / Wn, 1
                ) if comp else None
            if best is None or row["ms_per_round"] < best["ms_per_round"]:
                best = row
        out[Wn] = best
    return out


def _one(which: str):
    _init()
    import ray

    if which == "ray":
        print(json.dumps(ray_floor()))
    elif which == "tiny":
        g = _graph(5000, 4, "tiny")
        print(
            json.dumps(
                {
                    "metric": "engine_floor_ms_per_round",
                    "n_edges": g.num_edges,
                    "by_workers": engine_rounds(g, "tiny"),
                }
            )
        )
    else:
        g = _graph(40000, 64, "job")
        print(
            json.dumps(
                {
                    "metric": "engine_job_ms_per_round",
                    "n_edges": g.num_edges,
                    "by_workers": engine_rounds(g, "job", with_compute_split=True),
                }
            )
        )
    ray.shutdown()


def main():
    # one FRESH process per measurement — a shared Ray session pollutes
    # the later ones (lingering refs/pools from the earlier pools inflate
    # per-round walls up to 5x, measured)
    import subprocess

    for which in ("ray", "tiny", "job"):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", which],
            capture_output=True, text=True, check=True,
            env=dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ).stdout
        print(out.strip().splitlines()[-1])


if __name__ == "__main__":
    if "--one" in sys.argv:
        _one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
