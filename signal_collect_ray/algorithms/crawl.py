"""Crawling PageRank — the reference WebCrawler example rebuilt.

Reference (``/root/reference/src/main/scala/com/signalcollect/examples/
WebCrawler.scala:27-66``): PageRank runs while the graph GROWS from
inside the computation — visiting a page fetches it, extracts its links,
and adds the new vertices/edges through the ``GraphEditor`` handed to
the vertex program (``GraphEditor.scala:37-201``).

Rebuild: ``CrawlingPageRank`` is plain delta PageRank plus the
``emit_edges`` hook — a vertex that is IN the graph but not yet crawled
(``out_degree == 0``) emits its out-links on its first collect; the
durable engine applies the emitted batch at the next superstep boundary
(``Graph.update`` + state migration + full re-enqueue), auto-creating
the newly discovered targets, which then crawl themselves on THEIR first
collect — the same frontier cascade as the reference's crawler. The
"fetch" here is a lookup into a deterministic ``link_map``; a real
deployment replaces it with an HTTP fetch + the reference-regex link
extraction (``sources/extract.py``) inside the same hook.

Emission is self-quiescing: once a vertex's edges are applied its
``out_degree`` is > 0 and it never emits again; vertices whose links are
all dangling (empty map entry) stay leaves. PageRank restarts from init
at every mutation boundary (``fresh_state_on_mutation`` — see
algorithm.py), so after the crawl frontier is exhausted the run
converges to exactly the static PageRank of the fully crawled graph
(pinned in tests/test_mutation.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from signal_collect_ray.algorithm import StateDict
from signal_collect_ray.algorithms.pagerank import PageRank


class CrawlingPageRank(PageRank):
    name = "crawling_pagerank"
    emits_mutations = True

    def __init__(self, link_map: Dict[int, List[int]], damping: float = 0.85):
        super().__init__(damping)
        self.link_map = link_map

    def emit_edges(self, prev: StateDict, new: StateDict) -> Optional[StateDict]:
        vids = np.asarray(prev["vid"], dtype=np.int64)
        pending = np.flatnonzero(np.asarray(prev["out_degree"]) == 0)
        src_l: list = []
        dst_l: list = []
        for i in pending:
            v = int(vids[i])
            outs = self.link_map.get(v)
            if outs:
                src_l.extend([v] * len(outs))
                dst_l.extend(outs)
        if not src_l:
            return None
        return {
            "src": np.asarray(src_l, dtype=np.int64),
            "dst": np.asarray(dst_l, dtype=np.int64),
        }
