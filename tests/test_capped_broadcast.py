"""A/B parity of the capped-broadcast lookup idiom: every query that
routes its small-side lookup through capped_broadcast_join must produce
BIT-identical results when the cap is forced to 0 (co-partitioned
hash-join fallback — what actually runs at 100 TB) as when the
broadcast path is taken."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

_SF = "/root/testdata/sf0.001"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        df = res
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _bit_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        ga, gb = a[c].values, b[c].values
        if ga.dtype.kind == "f":
            assert (
                ga.astype(np.float64).view(np.uint64)
                == gb.astype(np.float64).view(np.uint64)
            ).all(), c
        else:
            assert (ga == gb).all(), c


@pytest.mark.parametrize(
    "qname",
    [
        "avg_neighbor_degree",
        "degree_assortativity",
        "wl_refinement",
        "trigram_backoff",
        "morans_i_degree",
        "rich_club",
        "cross_label_nn",
        "mutual_nn_pairs",
        "knn_label_consistency",
        "ppr_sweep_cut",
    ],
)
def test_fallback_path_bit_equal(qname, ray_session, tmp_path, monkeypatch):
    from signal_collect_ray.pipelines import queries as qmod

    if qname == "wl_refinement":
        # 2 rounds exercise every join/fold in the loop; 12 rounds of
        # forced hash-join fallback is minutes of pure Ray overhead
        monkeypatch.setattr(qmod, "_WL_K", 2)
    q = qmod.queries()[qname]
    monkeypatch.setattr(qmod, "_LOOKUP_CAP_BYTES", None)
    broadcast = _to_df(q(_SF))
    monkeypatch.setattr(qmod, "_LOOKUP_CAP_BYTES", 0)
    fallback = _to_df(q(_SF))
    _bit_equal(broadcast, fallback)


def test_capped_join_unit(ray_session):
    import ray.data as rd

    from signal_collect_ray.functions.joins import capped_broadcast_join

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 9], pa.int64()),
                "x": pa.array([10.0, 20.0, 21.0, 30.0, 90.0], pa.float64()),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4], pa.int64()),
                "v": pa.array([100, 200, 300, 400], pa.int64()),
            }
        )
    )
    want = {(1, 10.0, 100), (2, 20.0, 200), (2, 21.0, 200), (3, 30.0, 300)}
    for cap in (1 << 30, 0):
        got = {
            (r["k"], r["x"], r["v"])
            for r in capped_broadcast_join(
                left, right, on="k", max_broadcast_bytes=cap
            ).take_all()
        }
        assert got == want, cap
