"""The planted-fixture oracle queries, pinned under pytest: each runs
the full distributed pipeline on a fixture whose correct answer is pure
SQL arithmetic, and the comparison is the driver-style EXACT check
(bit-identical floats after each query's declared rounding) — the same
kernel scripts/check_oracles.py uses. These guard the invariants the
planted designs rely on (pointer-doubling MST contraction, maximin
k-means seeding, exact-copy ANN bucketing, rank-1 PCA exactness,
forced-cycle walks, clique-collapsing Louvain, closed-form tree
betweenness) against future refactors."""

import importlib.util
import os
import sys

import duckdb
import pytest

_SF = "/root/testdata/sf0.001"
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "_check_oracles", os.path.join(_REPO, "scripts", "check_oracles.py")
)
_chk = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_chk)

PLANTED = [
    "mst_planted",
    "betweenness_planted",
    "louvain_planted",
    "kmeans_planted",
    "pca_planted",
    "node2vec_planted",
    "semdedup_planted",
    "knn_ivf_planted",
    "knn_lsh_planted",
    "scc_planted",
    # not planted fixtures, but the same exact-oracle discipline: the
    # sketch-based pair queries whose recall-is-total argument
    # (fixed-seed LSH over a corpus with no pair in [0.3, 0.857);
    # pigeonhole blocks with deterministic radius-3 recall) these runs
    # pin against refactors
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
]


@pytest.fixture(scope="module")
def entrymod(ray_session):
    sys.path.insert(0, _REPO)
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in _chk.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{_SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", PLANTED)
def test_planted_oracle_exact(name, entrymod, oracle_con):
    got = _chk.to_pandas(entrymod.queries()[name](_SF))
    want = oracle_con.sql(entrymod.oracle_sql()[name]).df()
    problems = _chk.compare(name, got, want)
    assert not problems, problems
