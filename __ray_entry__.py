"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001.

    documents → Common-Crawl-style pages (url, warc_ts, html, text,
    lang) → reference-regex link extraction → url-hash vertex ids →
    partitioned graph build → PageRank to 1e-6 with per-superstep
    Parquet checkpoints → final vertex-state Dataset.
    """
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import PageRank
    from signal_collect_ray.sources import pages_to_edges
    from signal_collect_ray.sources.pages import pages_from_documents

    docs = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    n_docs = docs.count()
    pages = pages_from_documents(docs, n_docs, avg_links=6, seed=42)
    edges = pages_to_edges(pages)
    g = Graph.build(edges, "/tmp/scray_entry/graph", num_partitions=8)
    eng = SuperstepEngine(
        EngineConfig(num_partitions=8, eps=1e-6, max_supersteps=150)
    )
    info = eng.run(
        g, PageRank(), run_dir="/tmp/scray_entry/run_pagerank", resume=False
    )
    return info.final_state_ds()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from signal_collect_ray.pipelines.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per SQL-expressible query."""
    from signal_collect_ray.pipelines.queries import oracle_sql as _o

    return _o()
