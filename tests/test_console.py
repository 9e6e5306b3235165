"""Console server conformance: the seven providers
(ConsoleServer.scala:436-447 dispatch) over a live interactive
computation, verified against the engine's own results."""

import json
import time
import urllib.request

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import PageRank
from signal_collect_ray.console import ConsoleServer
from signal_collect_ray.engine_resident import ResidentEngine


def _graph(tmp_path, P=4):
    rng = np.random.RandomState(7)
    n = 120
    src = rng.randint(0, n, 600).astype(np.int64)
    dst = rng.randint(0, n, 600).astype(np.int64)
    keep = src != dst
    return Graph.from_edge_arrays(
        src[keep], dst[keep], str(tmp_path / "g"), num_partitions=P
    )


def _post(url, payload):
    req = urllib.request.Request(
        url + "/api",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture()
def console(tmp_path):
    g = _graph(tmp_path)
    cfg = EngineConfig(num_partitions=4, eps=1e-6, max_supersteps=200)
    eng = ResidentEngine(cfg, num_workers=2)

    def fresh():
        return eng.interactive(
            g, PageRank(), run_dir=str(tmp_path / "run"), resume=False
        )

    with ConsoleServer(fresh(), reset_fn=fresh) as srv:
        yield srv, g, eng, tmp_path


def test_state_step_and_graph_parity(console, tmp_path):
    srv, g, eng, _ = console
    st = _post(srv.url, {"provider": "state"})
    assert st["state"] == "pausing" and st["iteration"] == 0

    # two console steps == a 2-superstep engine run, vertex for vertex
    _post(srv.url, {"provider": "controls", "control": "step"})
    out = _post(srv.url, {"provider": "controls", "control": "step"})
    assert out == {"provider": "controls", "control": "step"}
    st = _post(srv.url, {"provider": "state"})
    assert st["iteration"] == 2

    ref = ResidentEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=2),
        num_workers=2,
    ).run(g, PageRank(), run_dir=str(tmp_path / "ref"), resume=False)
    reft = ref.state_table()
    want = dict(
        zip(reft.column("vid").to_pylist(), reft.column("state").to_pylist())
    )

    ids = [str(v) for v in sorted(want)[:8]]
    gr = _post(
        srv.url, {"provider": "graph", "query": "vertexIds", "vertexIds": ids}
    )
    assert set(gr["vertices"]) == set(ids)
    for vid in ids:
        assert gr["vertices"][vid]["s"] == pytest.approx(
            want[int(vid)], abs=1e-12
        )
    assert gr["lowestState"] == pytest.approx(min(want.values()), abs=1e-12)
    assert gr["highestState"] == pytest.approx(max(want.values()), abs=1e-12)


def test_graph_queries_and_vicinity(console):
    srv, g, _, _ = console
    _post(srv.url, {"provider": "controls", "control": "step"})

    top = _post(
        srv.url, {"provider": "graph", "query": "topState", "targetCount": 3}
    )
    assert len(top["vertices"]) == 3
    states = [v["s"] for v in top["vertices"].values()]
    assert max(states) == pytest.approx(top["highestState"], abs=1e-12)

    deg = _post(
        srv.url, {"provider": "graph", "query": "topDegree", "targetCount": 4}
    )
    assert len(deg["vertices"]) == 4

    samp = _post(
        srv.url, {"provider": "graph", "query": "sample", "targetCount": 5}
    )
    assert len(samp["vertices"]) == 5
    # deterministic sample: same request, same ids
    samp2 = _post(
        srv.url, {"provider": "graph", "query": "sample", "targetCount": 5}
    )
    assert set(samp["vertices"]) == set(samp2["vertices"])

    sub = _post(
        srv.url,
        {"provider": "graph", "query": "substring", "substring": "1",
         "targetCount": 10},
    )
    assert all("1" in vid for vid in sub["vertices"])

    # radius-1 outgoing vicinity of one vertex == its CSR out-neighbors
    vid = sorted(int(v) for v in deg["vertices"])[0]
    vic = _post(
        srv.url,
        {"provider": "graph", "query": "vertexIds", "vertexIds": [str(vid)],
         "vicinityRadius": 1},
    )
    import pyarrow.compute as pc

    et = g.edges_ds().to_arrow_refs()
    import ray

    tbl = __import__("pyarrow").concat_tables([ray.get(r) for r in et])
    nbrs = {
        int(d)
        for d in tbl.filter(pc.equal(tbl.column("src"), vid)).column("dst").to_pylist()
    }
    assert set(map(int, vic["vertices"])) == {vid} | nbrs
    # edges listed for vid are exactly the in-view neighbors
    assert set(map(int, vic["edges"].get(str(vid), []))) == nbrs
    assert vic["vertices"][str(vid)]["es"] == len(nbrs)

    # above-threshold early in the run: every vertex residual > 0.01
    ab = _post(
        srv.url,
        {"provider": "graph", "query": "aboveThreshold",
         "signalThreshold": 0.01, "targetCount": 6},
    )
    assert 0 < len(ab["vertices"]) <= 6
    assert all(v["ss"] > 0.01 for v in ab["vertices"].values())


def test_break_conditions_and_continue(console):
    srv, _, _, _ = console
    # invalid name → reference's invalid-Name error shape
    bad = _post(
        srv.url,
        {"provider": "breakconditions", "action": "add",
         "name": "collect score above threshold",
         "props": {"vertexId": "3"}},
    )
    assert bad["comment"] == "invalid Name!"

    # missing vertexId
    bad = _post(
        srv.url,
        {"provider": "breakconditions", "action": "add",
         "name": "state above", "props": {"expectedState": "0.2"}},
    )
    assert "vertexId" in bad["error"]

    # valid: PageRank state of any vertex rises above 0.15 quickly
    ok = _post(
        srv.url,
        {"provider": "breakconditions", "action": "add",
         "name": "state changes", "props": {"vertexId": "3"}},
    )
    assert len(ok["active"]) == 1
    cid = ok["active"][0]["id"]
    assert float(ok["active"][0]["props"]["currentState"]) == pytest.approx(
        0.15, abs=1e-9
    )

    _post(srv.url, {"provider": "controls", "control": "continue"})
    deadline = time.time() + 60
    while time.time() < deadline:
        st = _post(srv.url, {"provider": "state"})
        if st["state"] in ("pausing", "converged") and st["iteration"] > 0:
            break
        time.sleep(0.05)
    bc = _post(srv.url, {"provider": "breakconditions"})
    assert str(cid) in bc["reached"]  # paused by the condition
    st = _post(srv.url, {"provider": "state"})
    assert st["iteration"] < 30  # stopped well before the step limit

    # remove → continue runs to convergence
    _post(
        srv.url,
        {"provider": "breakconditions", "action": "remove", "id": cid},
    )
    _post(srv.url, {"provider": "controls", "control": "continue"})
    deadline = time.time() + 120
    while time.time() < deadline:
        st = _post(srv.url, {"provider": "state"})
        if st["state"] == "converged":
            break
        time.sleep(0.1)
    assert st["state"] == "converged"

    log = _post(srv.url, {"provider": "log"})
    assert any("break condition added" in m for m in log["messages"])


def test_configuration_resources_reset_terminate(console):
    srv, g, _, _ = console
    cfg = _post(srv.url, {"provider": "configuration"})
    assert cfg["graphConfiguration"]["numVertices"] == g.num_vertices
    assert cfg["graphConfiguration"]["numEdges"] == g.num_edges
    assert cfg["executionConfiguration"]["mode"] == "Interactive"
    assert cfg["systemProperties"]["algorithm"] == "pagerank"

    _post(srv.url, {"provider": "controls", "control": "step"})
    res = _post(srv.url, {"provider": "resources"})
    assert sum(w["numVertices"] for w in res["workerStatistics"]) == g.num_vertices

    # reset → iteration back to 0
    out = _post(srv.url, {"provider": "controls", "control": "reset"})
    assert out["control"] == "reset"
    st = _post(srv.url, {"provider": "state"})
    assert st["iteration"] == 0 and st["state"] == "pausing"

    _post(srv.url, {"provider": "controls", "control": "step"})
    _post(srv.url, {"provider": "controls", "control": "terminate"})
    st = _post(srv.url, {"provider": "state"})
    assert st["terminationReason"] in ("TerminatedByUser", "Converged")

    # invalid provider mirrors fetchInvalid
    inv = _post(srv.url, {"provider": "nope"})
    assert inv["provider"] == "invalid"

    # status page served
    with urllib.request.urlopen(srv.url + "/", timeout=10) as r:
        assert b"console" in r.read()
