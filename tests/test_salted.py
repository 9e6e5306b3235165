"""Salted two-stage signal aggregation (hub-skew handling, north rule):
results must be bit-identical with and without salting; the star hub
(in-degree = n-1) exercises the skew path."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import PageRank, SSSP

from tests import fixtures as fx


def _hub_graph(tmp_path, n=2000):
    # every leaf points at vertex 0 (extreme in-degree hub) + a chain
    leaves = np.arange(1, n, dtype=np.int64)
    src = np.concatenate([leaves, np.arange(0, n - 1, dtype=np.int64)])
    dst = np.concatenate([np.zeros(n - 1, dtype=np.int64), np.arange(1, n, dtype=np.int64)])
    return Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=8)


def test_salted_equals_unsalted_pagerank(tmp_path):
    g = _hub_graph(tmp_path)
    a = SuperstepEngine(
        EngineConfig(num_partitions=8, eps=0.0, max_supersteps=6, salt_buckets=1)
    ).run(g, PageRank(), run_dir=str(tmp_path / "a"), resume=False)
    b = SuperstepEngine(
        EngineConfig(num_partitions=8, eps=0.0, max_supersteps=6, salt_buckets=4)
    ).run(g, PageRank(), run_dir=str(tmp_path / "b"), resume=False)
    ta, tb = a.state_table(), b.state_table()
    assert ta.column("vid").to_pylist() == tb.column("vid").to_pylist()
    assert np.allclose(
        ta.column("state").to_numpy(), tb.column("state").to_numpy(),
        rtol=0, atol=1e-12,
    )


def test_salted_sssp_min_agg(tmp_path):
    src, dst = fx.cycle(64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    a = SuperstepEngine(
        EngineConfig(num_partitions=4, max_supersteps=100, salt_buckets=3)
    ).run(g, SSSP(0), run_dir=str(tmp_path / "r"), resume=False)
    assert a.state_table().column("state").to_pylist() == [float(i) for i in range(64)]


def test_salted_multi_row_combiner_cw(tmp_path):
    # Chinese Whispers' combiner emits multiple rows per dst (one per
    # label) — the salted pre-combine must handle that (regression).
    from signal_collect_ray.algorithms import ChineseWhispers

    src, dst = fx.two_clusters()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    a = SuperstepEngine(
        EngineConfig(num_partitions=4, max_supersteps=10, salt_buckets=1)
    ).run(g, ChineseWhispers(), run_dir=str(tmp_path / "a"), resume=False)
    b = SuperstepEngine(
        EngineConfig(num_partitions=4, max_supersteps=10, salt_buckets=3)
    ).run(g, ChineseWhispers(), run_dir=str(tmp_path / "b"), resume=False)
    assert a.state_table().column("state").to_pylist() == b.state_table().column(
        "state"
    ).to_pylist()


def test_auto_salt_triggers_on_hub_and_matches(tmp_path):
    """auto_salt: the hub graph's skewed signal_rows_in census must
    flip salting on after the first superstep census, record the
    decision in the manifest (resume-safe), and converge to the same
    ranks as the unsalted run."""
    import glob
    import json
    import os

    g = _hub_graph(tmp_path)
    plain = SuperstepEngine(
        EngineConfig(num_partitions=8, eps=0.0, max_supersteps=6)
    ).run(g, PageRank(), run_dir=str(tmp_path / "p"), resume=False)
    auto_dir = str(tmp_path / "auto")
    auto = SuperstepEngine(
        EngineConfig(
            num_partitions=8, eps=0.0, max_supersteps=6,
            auto_salt=True, auto_salt_skew=2.0, auto_salt_buckets=4,
        )
    ).run(g, PageRank(), run_dir=auto_dir, resume=False)
    ta, tb = plain.state_table(), auto.state_table()
    assert ta.column("vid").to_pylist() == tb.column("vid").to_pylist()
    assert np.allclose(
        ta.column("state").to_numpy(), tb.column("state").to_numpy(),
        rtol=0, atol=1e-12,
    )
    # the decision is durable: some step manifest records it, and every
    # later manifest carries it forward
    manifests = sorted(glob.glob(os.path.join(auto_dir, "step=*", "manifest.json")))
    infos = [json.load(open(m)).get("auto_salt") for m in manifests]
    first = next(i for i, v in enumerate(infos) if v)
    assert infos[first]["buckets"] == 4
    assert all(v for v in infos[first:])
    # resume continues salted (auto_salt read back from the manifest)
    more = SuperstepEngine(
        EngineConfig(
            num_partitions=8, eps=0.0, max_supersteps=8,
            auto_salt=True, auto_salt_skew=2.0, auto_salt_buckets=4,
        )
    ).run(g, PageRank(), run_dir=auto_dir, resume=True)
    plain8 = SuperstepEngine(
        EngineConfig(num_partitions=8, eps=0.0, max_supersteps=8)
    ).run(g, PageRank(), run_dir=str(tmp_path / "p8"), resume=False)
    assert np.allclose(
        more.state_table().column("state").to_numpy(),
        plain8.state_table().column("state").to_numpy(),
        rtol=0, atol=1e-12,
    )
