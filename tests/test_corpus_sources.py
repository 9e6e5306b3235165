"""JSONL reader, WARC-lite round-trip, and R-MAT generator
conformance."""

import json
import os

import numpy as np
import pytest

from signal_collect_ray.sources import (
    read_jsonl_docs,
    read_warc_lite,
    rmat_edges,
    write_warc_lite,
)


def test_jsonl_reader_with_ids(tmp_path, ray_session):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 7, "text": "hello world", "extra": 1},
        {"doc_id": 9, "text": "second doc", "extra": 2},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    got = sorted(
        (r["doc_id"], r["text"])
        for r in read_jsonl_docs(str(p), id_field="doc_id").take_all()
    )
    assert got == [(7, "hello world"), (9, "second doc")]


def test_jsonl_reader_derived_ids(tmp_path, ray_session):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        "\n".join(json.dumps({"text": t}) for t in ("aa", "bb", "aa")) + "\n"
    )
    rows = read_jsonl_docs(str(p)).take_all()
    ids = {r["text"]: r["doc_id"] for r in rows}
    assert len(rows) == 3
    assert all(i >= 0 for i in ids.values())
    by_text = [r["doc_id"] for r in rows if r["text"] == "aa"]
    assert by_text[0] == by_text[1]  # content-derived, stable
    assert ids["aa"] != ids["bb"]


def test_warc_roundtrip(tmp_path, ray_session):
    recs = [
        ("http://a.example/x", "2024-01-01T00:00:00Z", "alpha page\nbody"),
        ("http://b.example/y", "2024-01-02T00:00:00Z", "beta épage"),
        ("http://c.example/z", "2024-01-03T00:00:00Z", ""),
    ]
    p1 = tmp_path / "one.warc"
    p2 = tmp_path / "two.warc"
    write_warc_lite(str(p1), recs[:2])
    write_warc_lite(str(p2), recs[2:])
    got = sorted(
        (r["url"], r["warc_ts"], r["text"])
        for r in read_warc_lite([str(p1), str(p2)]).take_all()
    )
    assert got == sorted(recs)


def test_rmat_deterministic_and_skewed(ray_session):
    e1 = sorted(
        (r["src"], r["dst"])
        for r in rmat_edges(8, 4000, seed=1, num_blocks=4).take_all()
    )
    e2 = sorted(
        (r["src"], r["dst"])
        for r in rmat_edges(8, 4000, seed=1, num_blocks=13).take_all()
    )
    assert e1 == e2  # partitioning-independent
    src = np.array([s for s, _ in e1])
    assert src.max() < 256 and src.min() >= 0
    # R-MAT with a=0.57 concentrates mass on low ids: the top-decile
    # vertex by out-degree should far exceed the uniform expectation
    deg = np.bincount(src, minlength=256)
    assert deg.max() > 4 * (len(src) / 256)
    e3 = sorted(
        (r["src"], r["dst"])
        for r in rmat_edges(8, 4000, seed=2, num_blocks=4).take_all()
    )
    assert e3 != e1  # seed changes the graph


def test_rmat_feeds_graph_build(tmp_path, ray_session):
    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import ConnectedComponents
    from signal_collect_ray.engine_resident import ResidentEngine

    edges = rmat_edges(6, 600, seed=5, num_blocks=4)
    g = Graph.build(
        edges, os.path.join(str(tmp_path), "g"), num_partitions=4,
        dedup=True,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=60)
    )
    info = eng.run(
        g, ConnectedComponents(), run_dir=os.path.join(str(tmp_path), "r"),
        resume=False,
    )
    assert info.state_table().num_rows > 0
