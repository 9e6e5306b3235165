"""Benchmark harness (driver contract).

Plain run: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32); prints ONE JSON line.

--scaling: builds one large synthetic web graph (closed-form page_links
topology, ~40M edges) and runs the identical PageRank job in two fresh
processes at num_cpus=8 and num_cpus=32; prints both throughputs and the
scaling efficiency (T8/T32)/(32/8).
"""

from __future__ import annotations

import json
import logging
import os
import subprocess
import sys
import time
from typing import Optional

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Web density (~64 links/page, Common-Crawl-like) rather than the sparse
# 8-links default of the headline. 150k pages ≈ 9.6M links: big enough
# that the engine's auto pool cap (sqrt(E)/dense_worker_cost, see
# engine_resident.py) DIFFERS across the two CPU levels (W≈6 at 8 CPUs
# vs W≈13 at 32), so the strong-scaling run exercises engine
# parallelism, not just the build. The per-superstep floor itself is
# Ray-RPC-bound (scripts/bench_barrier.py measures the decomposition);
# weak scaling below remains the regime that models the 100 TB target.
SCALE_PAGES = int(os.environ.get("GRAFT_SCALE_PAGES", "150000"))
# weak-scaling keeps the smaller per-level base (the LO level's input;
# the HI level gets (hi/lo)x pages)
SCALE_PAGES_WEAK = int(os.environ.get("GRAFT_SCALE_PAGES_WEAK", "40000"))
SCALE_AVG_LINKS = int(os.environ.get("GRAFT_SCALE_AVG_LINKS", "64"))
SCALE_REPS = int(os.environ.get("GRAFT_SCALE_REPS", "2"))
SCALE_CPUS_LO = int(os.environ.get("GRAFT_SCALE_CPUS_LO", "8"))
SCALE_CPUS_HI = int(os.environ.get("GRAFT_SCALE_CPUS_HI", "32"))


# Pin the Ray Data logging config (see the YAML's header: drops the
# per-block-merge 'Failed to hash the schemas' noise at its source, in
# every worker — workers re-run dictConfig per dataset, so this is the
# only place the level sticks). Must be set BEFORE ray.init so the
# raylet's workers inherit it.
_LOGGING_YAML = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "signal_collect_ray", "ray_data_logging.yaml",
)
os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", _LOGGING_YAML)


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
            runtime_env={
                "env_vars": {
                    "RAY_DATA_LOGGING_CONFIG": os.environ[
                        "RAY_DATA_LOGGING_CONFIG"
                    ]
                }
            },
        )
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


def _cpu_jiffies() -> tuple:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line —
    the quiet-window protocol from BASELINE.md: the delta across a
    bench run attributes a slow wall to hypervisor CPU steal at a
    glance instead of leaving a 1.3x spread unexplained."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


class _StealMeter:
    """Context helper: .pct() = % of machine CPU time stolen by the
    hypervisor between construction and the call."""

    def __init__(self):
        self.s0, self.t0 = _cpu_jiffies()

    def pct(self) -> float:
        s1, t1 = _cpu_jiffies()
        dt = t1 - self.t0
        return round(100.0 * (s1 - self.s0) / dt, 2) if dt > 0 else 0.0


def run_headline(sf_dir: str, num_cpus: int) -> dict:
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import (
        ChineseWhispers,
        ConnectedComponents,
        PageRank,
        total_triangles,
    )
    from signal_collect_ray.engine_resident import ResidentEngine
    from signal_collect_ray.functions.dedup import (
        jaccard_verify,
        minhash_lsh_candidates,
    )
    from signal_collect_ray.functions.similarity import knn_brute_force
    from signal_collect_ray.functions.text import analyze_documents
    from signal_collect_ray.pipelines.queries import sym_edges
    from signal_collect_ray.sources import pages_to_edges
    from signal_collect_ray.sources.pages import pages_from_documents

    import numpy as np

    work = "/tmp/scray_bench/headline"
    P = max(2 * num_cpus, 16)
    cfg = EngineConfig(
        num_partitions=P, eps=1e-6, max_supersteps=200,
        convergence_check_interval=8,
    )
    queries: dict = {}
    extra: dict = {}

    docs = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    n_docs = docs.count()

    # page-graph scale follows the sf (lineitem rows), not the small
    # documents table: sf0.1 → ~200k pages / ~1.6M links.
    import pyarrow.parquet as pq

    n_pages = max(
        n_docs,
        pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows // 3,
    )
    extra["n_pages"] = n_pages

    # 1. pages synthesis + link extraction + partitioned graph build
    from signal_collect_ray.sources import synthesize_pages_dataset

    def build():
        pages = synthesize_pages_dataset(n_pages, avg_links=8, seed=42)
        edges = pages_to_edges(pages)
        return Graph.build(edges, os.path.join(work, "graph"), num_partitions=P)

    queries["extract_build"], g = _timed(build)
    extra["n_vertices"], extra["n_edges"] = g.num_vertices, g.num_edges

    # 2. PageRank to 1e-6 — resident executor (throughput path); pool
    # auto-sized by the engine's per-step cost model (explicit
    # num_workers would be honored verbatim since round 3)
    res_eng = ResidentEngine(cfg)
    queries["pagerank"], pr = _timed(
        lambda: res_eng.run(
            g, PageRank(), run_dir=os.path.join(work, "run_pr"), resume=False,
            checkpoint_interval=25,
        )
    )
    extra["pagerank_supersteps"] = pr.supersteps
    extra["pagerank_edges_per_sec"] = int(
        pr.edges_traversed_total / max(queries["pagerank"], 1e-9)
    )
    extra["pagerank_supersteps_per_hour"] = int(
        pr.supersteps / max(queries["pagerank"], 1e-9) * 3600
    )

    # 3. the durable per-superstep-checkpointed executor, 5 supersteps
    sse = SuperstepEngine(cfg)
    queries["pagerank_durable_k5"], _ = _timed(
        lambda: sse.run(
            g, PageRank(), run_dir=os.path.join(work, "run_pr_d"), resume=False,
            max_supersteps=5, eps=0.0,
        )
    )

    # 4. connected components on the symmetrized graph (reuses the
    # already-extracted edge shards — no second extraction pass)
    def cc():
        edges = sym_edges(g.edges_ds())
        gs = Graph.build(
            edges, os.path.join(work, "graph_sym"), num_partitions=P, dedup=True
        )
        info = res_eng.run(
            gs, ConnectedComponents(), run_dir=os.path.join(work, "run_cc"),
            resume=False, checkpoint_interval=25,
        )
        return gs, info

    queries["cc"], (gs, cc_info) = _timed(cc)
    extra["cc_supersteps"] = cc_info.supersteps

    # 5. label propagation, 5 rounds (reuses graph_sym's CSR object-store
    # blocks — no reload)
    queries["labelprop5"], _ = _timed(
        lambda: res_eng.run(
            gs, ChineseWhispers(), run_dir=os.path.join(work, "run_cw"),
            resume=False, max_supersteps=5, checkpoint_interval=25,
        )
    )

    # 6. triangle counting on the page graph
    queries["triangles"], extra["n_triangles"] = _timed(
        lambda: total_triangles(g.edges_ds(), num_partitions=64)
    )

    # 7. minhash near-dup candidates + jaccard verify over documents
    def dedup():
        pairs = minhash_lsh_candidates(docs, num_perm=64, num_bands=16)
        return jaccard_verify(docs, pairs, threshold=0.5).count()

    queries["dedup_minhash"], extra["n_near_dup_pairs"] = _timed(dedup)

    # 8. ANN brute-force cosine top-10, 8 queries
    def knn():
        emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        rows = emb.take(8)
        q = np.array([r["embedding"] for r in rows], dtype=np.float64)
        return knn_brute_force(emb, q, k=10).count()

    queries["knn"], _ = _timed(knn)

    # 9. full text-analysis chain over documents
    queries["text_analysis"], _ = _timed(
        lambda: analyze_documents(docs).count()
    )

    # 10. event-log operators: sessionize + tumbling windows + as-of
    # attribution over the events table (round-3 additions)
    from signal_collect_ray.pipelines.queries import (
        q_click_attribution,
        q_event_sessions,
        q_event_windows,
    )

    def events_ops():
        n = q_event_sessions(sf_dir).count()
        n += q_event_windows(sf_dir).count()
        n += q_click_attribution(sf_dir).count()
        return n

    queries["events_ops"], extra["n_event_rows_out"] = _timed(events_ops)

    # 11. corpus curation (lang → quality → repetition → exact dedup)
    # + tf-idf top terms + duplicated-n-gram fraction + paragraph-level
    # keep-first dedup over documents (round-3 curation additions)
    from signal_collect_ray.functions.dedup import (
        dedup_paragraphs,
        duplicated_ngram_fraction,
    )
    from signal_collect_ray.functions.text import curate_corpus, tfidf_top_terms

    def curation():
        n = curate_corpus(docs).count()
        n += tfidf_top_terms(docs, k=5, n_docs=n_docs).count()
        n += duplicated_ngram_fraction(docs, n=5).count()
        n += dedup_paragraphs(docs, chunk_words=10).count()
        return n

    queries["curation"], extra["n_curation_rows_out"] = _timed(curation)

    # 12. relational operators over the TPC-H-ish tables: broadcast
    # star join, big-big co-partitioned join, pivot (round-3 additions)
    from signal_collect_ray.pipelines.queries import (
        q_event_type_pivot,
        q_order_priority_lines,
        q_orders_by_nation,
    )

    def relational_ops():
        n = q_orders_by_nation(sf_dir).count()
        n += q_order_priority_lines(sf_dir).count()
        n += q_event_type_pivot(sf_dir).count()
        return n

    queries["relational_ops"], extra["n_relational_rows_out"] = _timed(
        relational_ops
    )

    # 13. graph-analytics statistics over the extracted page graph:
    # co-citation pairs + reciprocity-style self-join (round-3)
    from signal_collect_ray.algorithms.cocitation import cocitation_top_pairs
    from signal_collect_ray.algorithms.modularity import louvain_one_level

    def graph_stats():
        t = cocitation_top_pairs(
            g.edges_ds().select_columns(["src", "dst"]),
            k=20,
            max_out_degree=256,
        )
        n = t.num_rows
        sym = gs.edges_ds().select_columns(["src", "dst"])
        n += louvain_one_level(sym, rounds=2, num_partitions=32).count()
        return n

    queries["graph_stats"], extra["n_cocitation_rows"] = _timed(graph_stats)

    # 14. sketches + walk sampling (late round-3): HyperBall
    # neighborhood function over the page graph (p=6 HLL ball
    # exchange, delta-propagated), deterministic random walks, HLL
    # distinct users, Misra-Gries heavy hitters over events
    from signal_collect_ray.algorithms.hyperball import neighborhood_function
    from signal_collect_ray.algorithms.walks import random_walks
    from signal_collect_ray.functions.sketches import (
        approx_distinct,
        heavy_hitters,
    )

    def sketch_ops():
        hb = neighborhood_function(g, p=6, max_rounds=12)
        extra["effective_diameter"] = hb["effective_diameter"]
        n = len(hb["nf"])
        n += random_walks(g, walk_len=8, start_mod=64).count()
        ev = rd.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        extra["approx_distinct_users"] = int(approx_distinct(ev, "user_id"))
        n += heavy_hitters(ev, "event_type", k=5, capacity=64).num_rows
        return n

    queries["sketch_ops"], extra["n_sketch_rows"] = _timed(sketch_ops)

    total = sum(queries.values())
    return {
        "metric": "e2e_linkgraph_bench_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "num_cpus": num_cpus,
        **extra,
    }


# ---------------------------------------------------------------------------
# scaling mode
# ---------------------------------------------------------------------------

def _scaling_child(num_cpus: int) -> None:
    """The identical flagship job (pages → reference-regex link
    extraction → partitioned graph build → PageRank to 1e-6) on the same
    deterministic input, at whatever parallelism this process was given.
    Prints one JSON line with wall time + stage split + PR throughput."""
    import shutil

    _init_ray(num_cpus)
    import ray

    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import PageRank
    from signal_collect_ray.engine_resident import ResidentEngine
    from signal_collect_ray.sources import pages_to_edges, synthesize_pages_dataset

    work = f"/tmp/scray_bench/scale_{num_cpus}"
    shutil.rmtree(work, ignore_errors=True)

    # untimed warm-up (tiny) so code paths / JIT-ish costs don't skew
    wp = synthesize_pages_dataset(500, avg_links=4, seed=1)
    Graph.build(pages_to_edges(wp), os.path.join(work, "warm"), num_partitions=8)

    meter = _StealMeter()
    t0 = time.monotonic()
    pages = synthesize_pages_dataset(SCALE_PAGES, avg_links=SCALE_AVG_LINKS, seed=42)
    g = Graph.build(
        pages_to_edges(pages), os.path.join(work, "graph"), num_partitions=64
    )
    t_build = time.monotonic() - t0

    # conv_int=8: submit 8 superstep rounds per driver sync (actor-to-actor
    # ref chaining) — an eps-run may overshoot ≤7 idempotent rounds, in
    # exchange for amortizing the driver barrier over short supersteps
    cfg = EngineConfig(
        num_partitions=64, eps=1e-6, max_supersteps=200,
        convergence_check_interval=8,
    )
    eng = ResidentEngine(cfg)  # auto pool sizing (cost model)
    t1 = time.monotonic()
    info = eng.run(
        g, PageRank(), run_dir=os.path.join(work, "run"), resume=False,
        checkpoint_interval=50,
    )
    t_pr = time.monotonic() - t1
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "num_cpus": num_cpus,
                "wall_sec": round(wall, 3),
                "build_sec": round(t_build, 3),
                "pagerank_sec": round(t_pr, 3),
                "supersteps": info.supersteps,
                "n_edges": g.num_edges,
                "edges_traversed": info.edges_traversed_total,
                "pr_edges_per_sec": int(info.edges_traversed_total / max(t_pr, 1e-9)),
                "cpu_steal_pct": meter.pct(),
            }
        )
    )
    ray.shutdown()


def _scaling_run(ncpu: int, pages: Optional[int] = None) -> dict:
    """One parallelism level: SCALE_REPS fresh --scaling-child
    subprocesses; reports the MEDIAN wall (all reps kept in the JSON —
    this host's CPU-steal noise swings stage walls up to 3x between
    windows, and a minimum would overstate capability)."""
    import statistics

    def once() -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        if pages is not None:
            env["GRAFT_SCALE_PAGES"] = str(pages)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child"],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    runs = [once() for _ in range(max(1, SCALE_REPS))]
    med = sorted(runs, key=lambda r: r["wall_sec"])[(len(runs) - 1) // 2]
    rep = dict(med)
    rep["wall_sec"] = round(
        statistics.median(r["wall_sec"] for r in runs), 3
    )
    rep["build_sec"] = round(
        statistics.median(r["build_sec"] for r in runs), 3
    )
    rep["pagerank_sec"] = round(
        statistics.median(r["pagerank_sec"] for r in runs), 3
    )
    rep["reps"] = len(runs)
    rep["wall_sec_all"] = [r["wall_sec"] for r in runs]
    rep["pagerank_sec_all"] = [r["pagerank_sec"] for r in runs]
    rep["cpu_steal_pct_all"] = [r.get("cpu_steal_pct", 0.0) for r in runs]
    return rep


def run_scaling() -> dict:
    lo, hi = _scaling_run(SCALE_CPUS_LO), _scaling_run(SCALE_CPUS_HI)
    ratio = SCALE_CPUS_HI / SCALE_CPUS_LO
    eff = (lo["wall_sec"] / hi["wall_sec"]) / ratio
    return {
        "metric": f"scaling_efficiency_{SCALE_CPUS_LO}_to_{SCALE_CPUS_HI}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{SCALE_CPUS_LO}": lo["wall_sec"],
        f"sec_{SCALE_CPUS_HI}": hi["wall_sec"],
        # phase decomposition: where the speedup does / does not come from
        "build_eff": round(
            (lo["build_sec"] / max(hi["build_sec"], 1e-9)) / ratio, 3
        ),
        "pagerank_eff": round(
            (lo["pagerank_sec"] / max(hi["pagerank_sec"], 1e-9)) / ratio, 3
        ),
        "detail_lo": lo,
        "detail_hi": hi,
        "scale_pages": SCALE_PAGES,
        "scale_avg_links": SCALE_AVG_LINKS,
    }


def run_scaling_weak() -> dict:
    """Weak scaling: input grows with the CPU budget (lo CPUs on X pages
    vs hi CPUs on (hi/lo)·X pages); efficiency = T_lo/T_hi, ideal 1.0.
    This is the regime that represents the 100 TB target — per-worker
    work stays constant as the cluster grows, so the per-superstep
    barrier floor (fixed ~50-100 ms on this host regardless of W) is
    amortized identically at both levels instead of dominating the hi
    level the way it does in a strong-scaling run on toy input."""
    # exact CPU ratio (not floor division) so a non-multiple hi/lo pair
    # still grows the input proportionally to the CPU budget
    pages_hi = round(SCALE_PAGES_WEAK * SCALE_CPUS_HI / SCALE_CPUS_LO)
    lo = _scaling_run(SCALE_CPUS_LO, SCALE_PAGES_WEAK)
    hi = _scaling_run(SCALE_CPUS_HI, pages_hi)
    eff = lo["wall_sec"] / hi["wall_sec"]
    return {
        "metric": f"weak_scaling_efficiency_{SCALE_CPUS_LO}_to_{SCALE_CPUS_HI}",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{SCALE_CPUS_LO}": lo["wall_sec"],
        f"sec_{SCALE_CPUS_HI}": hi["wall_sec"],
        "detail_lo": lo,
        "detail_hi": hi,
        "scale_pages_lo": SCALE_PAGES_WEAK,
        "scale_pages_hi": pages_hi,
        "scale_avg_links": SCALE_AVG_LINKS,
    }


def run_rmat(num_cpus: int, scale: int = 18, n_edges: int = 5_000_000) -> dict:
    """Hub-skew stress: PageRank over a deterministic R-MAT graph
    (a=0.57 — far heavier-tailed than the web-density pages synth).
    Evidences the two skew paths: the resident engine's dense bincount
    exchange (hub-oblivious), and the durable executor's salted
    two-stage aggregation (salt_buckets A/B at fixed k supersteps)."""
    import time

    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import PageRank
    from signal_collect_ray.engine_resident import ResidentEngine
    from signal_collect_ray.sources import rmat_edges

    _init_ray(num_cpus)
    work = "/tmp/scray_bench/rmat"
    P = max(2 * num_cpus, 16)
    out: dict = {
        "metric": "rmat_pagerank_bench",
        "scale": scale,
        "n_edges_drawn": n_edges,
        "num_cpus": num_cpus,
    }
    t0 = time.perf_counter()
    edges = rmat_edges(scale, n_edges, seed=7, num_blocks=P)
    g = Graph.build(edges, os.path.join(work, "g"), num_partitions=P)
    out["build_sec"] = round(time.perf_counter() - t0, 3)
    out["n_vertices"] = g.num_vertices
    out["n_edges"] = g.num_edges
    # multiplicity-inclusive in-degree — the graph is built dedup=False,
    # so this is the actual largest collect group the A/B below stresses
    from signal_collect_ray.algorithms.triangles import _sum_by_key

    def ones(tbl):
        import pyarrow as pa

        return pa.table(
            {"key": tbl.column("dst"), "one": pa.array(
                [1] * tbl.num_rows, type=pa.int64())}
        )

    deg = _sum_by_key(
        edges.map_batches(ones, batch_format="pyarrow"), "key", "one", P
    )
    out["max_in_degree"] = int(deg.max("one"))

    t0 = time.perf_counter()
    eng = ResidentEngine(
        EngineConfig(num_partitions=P, eps=1e-6, max_supersteps=60,
                     convergence_check_interval=8)
    )
    info = eng.run(
        g, PageRank(), run_dir=os.path.join(work, "run_res"), resume=False,
        checkpoint_interval=100,
    )
    pr_s = time.perf_counter() - t0
    out["resident_pagerank_sec"] = round(pr_s, 3)
    out["resident_supersteps"] = info.supersteps
    out["resident_edges_per_sec"] = int(
        g.num_edges * info.supersteps / pr_s
    )

    for salt in (1, 8):
        t0 = time.perf_counter()
        eng_d = SuperstepEngine(
            EngineConfig(num_partitions=P, eps=0.0, max_supersteps=3,
                         salt_buckets=salt)
        )
        eng_d.run(
            g, PageRank(), run_dir=os.path.join(work, f"run_d{salt}"),
            resume=False,
        )
        out[f"durable_k3_salt{salt}_sec"] = round(
            time.perf_counter() - t0, 3
        )
    return out


def main():
    if "--rmat" in sys.argv:
        import ray

        print(json.dumps(run_rmat(NUM_CPUS)))
        ray.shutdown()
        return
    if "--scaling-child" in sys.argv:
        _scaling_child(NUM_CPUS)
        return
    if "--scaling-weak" in sys.argv:
        print(json.dumps(run_scaling_weak()))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
        return
    _init_ray(NUM_CPUS)
    import ray

    meter = _StealMeter()
    out = run_headline(SF_DIR, NUM_CPUS)
    out["cpu_steal_pct"] = meter.pct()
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
