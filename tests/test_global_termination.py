"""Global termination detection — user predicate on a two-phase global
aggregate every k supersteps (ExecutionConfiguration.scala:147-180,
ComputationTerminationSpec.scala global-termination cases)."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithm import SumStatesTermination
from signal_collect_ray.algorithms import PageRank
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def test_global_constraint_stops_early_both_engines(tmp_path):
    src, dst = fx.cycle(100)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    cfg = EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=300)

    # rank sum grows 15 -> 100 as PageRank converges; stop at >= 40
    a = SuperstepEngine(cfg).run(
        g, PageRank(), run_dir=str(tmp_path / "a"), resume=False,
        global_termination=SumStatesTermination(40.0, interval=1),
    )
    b = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "b"), resume=False,
        global_termination=SumStatesTermination(40.0, interval=1),
    )
    assert a.termination_reason == b.termination_reason == "GlobalConstraintMet"
    assert a.supersteps == b.supersteps
    full = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "c"), resume=False
    )
    assert a.supersteps < full.supersteps
    sa = a.state_table().column("state").to_numpy()
    sb = b.state_table().column("state").to_numpy()
    assert np.allclose(sa, sb, rtol=0, atol=1e-12)
    assert sa.sum() >= 40.0


def test_aggregation_interval_respected(tmp_path):
    src, dst = fx.cycle(100)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    cfg = EngineConfig(num_partitions=2, eps=1e-9, max_supersteps=300)
    # with interval=5 the stop can only happen on a multiple of 5
    info = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "r"), resume=False,
        global_termination=SumStatesTermination(40.0, interval=5),
    )
    assert info.termination_reason == "GlobalConstraintMet"
    assert info.supersteps % 5 == 0


def test_top_activity_partition_timing(ray_session, tmp_path):
    """Timeable/TopActivityAggregator rebuild: both executors record
    per-partition phase wall time in manifests; top_activity ranks."""
    import numpy as np

    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import PageRank
    from signal_collect_ray.engine import SuperstepEngine
    from signal_collect_ray.engine_resident import ResidentEngine
    from signal_collect_ray.functions.aggregations import top_activity

    rng = np.random.default_rng(2)
    src = rng.integers(0, 100, 600).astype(np.int64)
    dst = rng.integers(0, 100, 600).astype(np.int64)
    keep = src != dst
    g = Graph.from_edge_arrays(
        src[keep], dst[keep], str(tmp_path / "g"), num_partitions=4
    )
    for name, eng in (
        ("durable", SuperstepEngine(EngineConfig(num_partitions=4, max_supersteps=5, eps=0.0))),
        ("resident", ResidentEngine(EngineConfig(num_partitions=4, max_supersteps=5, eps=0.0), num_workers=2)),
    ):
        info = eng.run(g, PageRank(), run_dir=str(tmp_path / f"r{name}"), resume=False)
        t = top_activity(info, k=3)
        assert t.num_rows == 3
        totals = t.column("total_s").to_pylist()
        assert totals == sorted(totals, reverse=True)
        assert totals[0] > 0.0, name
