"""Flagship end-to-end pipeline (north_star):

    Common-Crawl-style pages → link extraction (reference regex) →
    url→vid hashing → partitioned graph build → PageRank to 1e-6 →
    connected components → top-k ranks (with urls resolved).

Every stage is Ray Data; the only driver-side materializations are the
superstep metrics rows and the final top-k table.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pyarrow as pa

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import ConnectedComponents, PageRank
from signal_collect_ray.functions.aggregations import sum_of_states, top_k
from signal_collect_ray.sources import pages_to_edges, synthesize_pages_dataset
from signal_collect_ray.util import urls_to_vids


def build_graph_from_pages(pages_ds, graph_dir: str, num_partitions: int = 8) -> Graph:
    edges = pages_to_edges(pages_ds)
    return Graph.build(edges, graph_dir, num_partitions=num_partitions)


def resolve_urls(pages_ds, vids) -> dict:
    """vid → url for a SMALL vid set (e.g. top-k) — broadcast the wanted
    set, filter pages batches, collect the few matches."""
    want = np.asarray(sorted(vids), dtype=np.int64)

    def flt(tbl: pa.Table) -> pa.Table:
        v = urls_to_vids(tbl.column("url").to_pylist())
        keep = np.flatnonzero(np.isin(v, want))
        out = tbl.select(["url"]).take(pa.array(keep, pa.int64()))
        return out.append_column("vid", pa.array(v[keep], pa.int64()))

    rows = pages_ds.select_columns(["url"]).map_batches(
        flt, batch_format="pyarrow"
    ).take_all()
    return {r["vid"]: r["url"] for r in rows}


def run_flagship(
    pages_ds=None,
    n_pages: int = 1000,
    workdir: str = "/tmp/scray_flagship",
    num_partitions: int = 8,
    eps: float = 1e-6,
    max_supersteps: int = 150,
    k: int = 20,
    seed: int = 42,
    run_cc: bool = True,
    signal_mode: str = "tasks",
):
    """Returns a dict with graph stats, PageRank/CC ExecutionInformation,
    and the top-k ranked pages as a pyarrow Table (vid, state, url)."""
    if pages_ds is None:
        pages_ds = synthesize_pages_dataset(n_pages, avg_links=8, seed=seed)

    graph_dir = os.path.join(workdir, "graph")
    g = build_graph_from_pages(pages_ds, graph_dir, num_partitions)

    cfg = EngineConfig(
        num_partitions=num_partitions, eps=eps, max_supersteps=max_supersteps,
        signal_mode=signal_mode,
    )
    eng = SuperstepEngine(cfg)
    pr_info = eng.run(
        g, PageRank(), run_dir=os.path.join(workdir, "run_pagerank"), resume=False
    )
    state_ds = pr_info.final_state_ds()
    top_rows = top_k(state_ds, k).select_columns(["vid", "state"]).take_all()
    top_tbl = pa.table(
        {
            "vid": pa.array([r["vid"] for r in top_rows], pa.int64()),
            "state": pa.array([r["state"] for r in top_rows], pa.float64()),
        }
    )
    urls = resolve_urls(pages_ds, top_tbl.column("vid").to_pylist())
    top_tbl = top_tbl.append_column(
        "url", pa.array([urls.get(v) for v in top_tbl.column("vid").to_pylist()],
                        pa.string()),
    )

    result = {
        "n_vertices": g.num_vertices,
        "n_edges": g.num_edges,
        "pagerank": pr_info,
        "rank_sum": sum_of_states(state_ds),
        "top_k": top_tbl,
    }

    if run_cc:
        # undirected components need the symmetrized edge table — reuse
        # the already-built edge shards instead of re-running the full
        # link-extraction pass (same as bench.py's cc stage)
        from signal_collect_ray.pipelines.queries import sym_edges

        g_sym = Graph.build(
            sym_edges(g.edges_ds()),
            os.path.join(workdir, "graph_sym"),
            num_partitions=num_partitions,
            dedup=True,
        )
        cc_info = eng.run(
            g_sym,
            ConnectedComponents(),
            run_dir=os.path.join(workdir, "run_cc"),
            resume=False,
        )
        from ray.data.aggregate import Count

        comp_sizes = (
            cc_info.final_state_ds()
            .groupby("state")
            .aggregate(Count(alias_name="size"))
        )
        result["cc"] = cc_info
        result["n_components"] = comp_sizes.count()

    return result
