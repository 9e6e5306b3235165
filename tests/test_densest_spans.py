"""Diamond count, densest-subgraph peel, and longest duplicated n-gram
span vs brute-force oracles on randomized inputs."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from signal_collect_ray.algorithms.triangles import diamond_count
from signal_collect_ray.functions.dedup import longest_duplicated_ngram


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )


def _brute_diamonds(src, dst):
    und = set()
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            und.add((min(a, b), max(a, b)))
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_edge = {}
    for a, b in und:
        for c in adj[a] & adj[b]:
            per_edge[(a, b)] = per_edge.get((a, b), 0) + 1
    return sum(t * (t - 1) // 2 for t in per_edge.values())


def test_diamond_count_random():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    assert diamond_count(_edges_ds(src, dst), num_partitions=8) == _brute_diamonds(
        src, dst
    )


def test_diamond_count_k4():
    # K4 contains exactly 3 diamonds (each of the 3 "missing-edge" picks
    # counted per shared edge: every edge lies in 2 triangles → C(2,2)=1
    # per edge × 6 edges... per-edge t_e = 2 for all 6 edges → 6·1 = 3·2
    src, dst = zip(*itertools.combinations(range(4), 2))
    got = diamond_count(_edges_ds(list(src), list(dst)), num_partitions=4)
    assert got == _brute_diamonds(src, dst) == 6


def _brute_peel(src, dst):
    und = set()
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a != b:
            und.add((min(a, b), max(a, b)))
    alive = {v for e in und for v in e}
    prof = []
    while True:
        edges = [(a, b) for a, b in und if a in alive and b in alive]
        e_cnt, v_cnt = len(edges), len(alive)
        prof.append((v_cnt, e_cnt))
        if not alive:
            break
        deg = {v: 0 for v in alive}
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        peel = {v for v in alive if deg[v] * v_cnt <= 2 * e_cnt}
        if not peel:
            break
        alive -= peel
    return prof


def test_densest_peel_engine_matches_brute(tmp_path):
    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import DensestPeel, peel_profile

    rng = np.random.default_rng(11)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 30, 200)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    sym = pa.table(
        {
            "src": pa.array(
                np.concatenate([src, dst]).astype(np.int64), pa.int64()
            ),
            "dst": pa.array(
                np.concatenate([dst, src]).astype(np.int64), pa.int64()
            ),
        }
    )
    g = Graph.build(
        rd.from_arrow(sym), str(tmp_path / "g"), num_partitions=4, dedup=True
    )
    rounds = 10
    eng = SuperstepEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=2 * rounds + 1)
    )
    info = eng.run(
        g, DensestPeel(), run_dir=str(tmp_path / "run"), resume=False
    )
    got = peel_profile(info, rounds)
    want = _brute_peel(src, dst)
    for r, v, e in got:
        wv, we = want[r] if r < len(want) else want[-1]
        assert (v, e) == (wv, we), (r, v, e, wv, we)


def test_longest_dup_span_planted():
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "prefix alpha beta gamma delta epsilon zeta other words here",
        "unrelated text with no overlap at all whatsoever",
        "single alpha token shared",
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    t = longest_duplicated_ngram(ds, cap=32, num_partitions=4)
    assert t.num_rows == 1
    assert t.column("length")[0].as_py() == 6
    assert (
        t.column("ngram")[0].as_py() == "alpha beta gamma delta epsilon zeta"
    )
    assert t.column("n_docs")[0].as_py() == 2


def test_longest_dup_span_no_dups():
    texts = ["aa bb cc", "dd ee ff", "gg hh ii"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    t = longest_duplicated_ngram(ds, cap=8, num_partitions=2)
    assert t.num_rows == 0
    assert t.column_names == ["length", "ngram", "n_docs"]


def test_longest_dup_span_identical_docs():
    txt = "the same exact document body repeated verbatim twice over"
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 20], pa.int64()),
                "text": pa.array([txt, txt], pa.string()),
            }
        )
    )
    t = longest_duplicated_ngram(ds, cap=32, num_partitions=2)
    assert t.num_rows == 1
    assert t.column("length")[0].as_py() == len(txt.split())
    assert t.column("n_docs")[0].as_py() == 2


def test_textrank_isolated_chunks_all_baseline():
    # no shared words between chunks → all ranks 0.15 → best = chunk 1
    from signal_collect_ray.functions.text import textrank_summaries

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array(
                    ["a b c d e f g h i j k l m n o p q r s t"], pa.string()
                ),
            }
        )
    )
    t = pa.concat_tables(
        list(
            textrank_summaries(ds).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    assert t.num_rows == 1
    assert t.column("best_chunk")[0].as_py() == 1
    assert t.column("score")[0].as_py() == 0.15
    assert t.column("n_chunks")[0].as_py() == 2


def test_textrank_shared_words_promote_chunk():
    # chunk 2 shares words with both 1 and 3; 1 and 3 share nothing
    from signal_collect_ray.functions.text import TextRankSummary

    txt = (
        "alpha beta gamma delta epsilon one two three four five "
        "alpha beta gamma aaa bbb ccc ddd eee six seven "
        "aaa bbb ccc xxx yyy zzz www vvv uuu ttt"
    )
    tbl = pa.table(
        {
            "doc_id": pa.array([9], pa.int64()),
            "text": pa.array([txt], pa.string()),
        }
    )
    t = TextRankSummary(10, 4)(tbl)
    assert t.column("best_chunk")[0].as_py() == 2
    assert t.column("n_chunks")[0].as_py() == 3


def test_edge_betweenness_pivots_brute(tmp_path):
    """edge_betweenness_pivots equals per-pivot brute Brandes edge
    dependencies on a random digraph."""
    import collections

    from signal_collect_ray import Graph
    from signal_collect_ray.algorithms.betweenness import (
        edge_betweenness_pivots,
    )

    rng = np.random.default_rng(61)
    src = rng.integers(0, 20, 120).astype(np.int64)
    dst = rng.integers(0, 20, 120).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = sorted(set(zip(src.tolist(), dst.tolist())))
    g = Graph.build(
        rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([a for a, _ in edges], pa.int64()),
                    "dst": pa.array([b for _, b in edges], pa.int64()),
                }
            )
        ),
        str(tmp_path / "g"),
        num_partitions=4,
        dedup=True,
    )
    pivots = sorted({int(s) for s in src})[:3]
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness_pivots(g, pivots, top_k=10 ** 6).to_pylist()
    }
    # brute per pivot
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    total = collections.defaultdict(float)
    for s0 in pivots:
        dist = {s0: 0}
        sigma = collections.defaultdict(float)
        sigma[s0] = 1.0
        order = [s0]
        frontier = [s0]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            for u in frontier:
                for w in adj[u]:
                    if dist.get(w) == dist[u] + 1:
                        sigma[w] += sigma[u]
            order.extend(nxt)
            frontier = nxt
        delta = collections.defaultdict(float)
        for u in reversed(order):
            for w in adj[u]:
                if dist.get(w) == dist[u] + 1:
                    c = sigma[u] / sigma[w] * (1 + delta[w])
                    total[(u, w)] += c
                    delta[u] += c
    for e, v in total.items():
        f = 10.0 ** 6
        want = np.sign(v) * np.floor(abs(v) * f + 0.5) / f
        if want > 0:
            assert got.get(e) == want, (e, got.get(e), want)


def test_event_value_mad_brute():
    """q_event_value_mad's histogram selection equals numpy median/MAD
    on the raw sf0.001 events."""
    import duckdb

    from signal_collect_ray.pipelines.queries import q_event_value_mad

    t = q_event_value_mad("/root/testdata/sf0.001")
    con = duckdb.connect()
    raw = con.execute(
        "SELECT event_type, ROUND(value * 100) AS cents FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchall()
    by_t = {}
    for et, c in raw:
        by_t.setdefault(et, []).append(c)
    for r in t.to_pylist():
        vals = np.array(sorted(by_t[r["event_type"]]))
        med = float(np.median(vals))
        mad = float(np.median(np.abs(vals - med)))
        assert r["median_value"] == round(med / 100.0, 6)
        assert r["mad_value"] == round(mad / 100.0, 6)


def test_longest_dup_span_random_property():
    """Property check on random small corpora: result equals the brute
    all-lengths scan (several seeds, incl. overlap-heavy vocab)."""
    for seed in (3, 9, 27):
        rng = np.random.default_rng(seed)
        vocab = ["a", "b", "c", "d"]
        texts = [
            " ".join(rng.choice(vocab, size=rng.integers(5, 25)))
            for _ in range(12)
        ]
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        got = longest_duplicated_ngram(ds, cap=32, num_partitions=2)
        # brute
        best_len, grams = 0, {}
        split = [t.split() for t in texts]
        for L in range(1, 33):
            seen = {}
            for i, ws in enumerate(split):
                for j in range(len(ws) - L + 1):
                    seen.setdefault(" ".join(ws[j : j + L]), set()).add(i)
            dup = {g: d for g, d in seen.items() if len(d) >= 2}
            if dup:
                best_len, grams = L, dup
        want = sorted((g, len(d)) for g, d in grams.items())
        have = sorted(
            zip(
                got.column("ngram").to_pylist(),
                got.column("n_docs").to_pylist(),
            )
        )
        assert have == want, (seed, best_len, have[:3], want[:3])
        if got.num_rows:
            assert got.column("length")[0].as_py() == best_len
