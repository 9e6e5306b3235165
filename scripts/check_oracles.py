"""Driver-style correctness check: run every queries() entry and its
oracle_sql() side-by-side over an sf dir, compare row count, schema
(sorted column names) and values EXACTLY (rows sorted by all columns;
floats bit-for-bit — the driver hashes values, so a last-ulp difference
the old 1e-9 tolerance masked is a real failure there).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import logging
import sys

import numpy as np
import pandas as pd


TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    df = res.to_pandas()  # ray Dataset
    if df.empty and not len(df.columns):
        # Ray's to_pandas drops columns on 0-row datasets; rebuild from
        # the dataset schema so schema comparison still works
        schema = res.schema()
        if schema is not None:  # None when the dataset has no blocks at all
            df = pd.DataFrame({n: [] for n in schema.names})
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        return [f"columns differ: {sorted(got.columns)} vs {sorted(want.columns)}"]
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    want = want[cols].sort_values(cols, na_position="last").reset_index(drop=True)
    if len(got) != len(want):
        return [f"row count {len(got)} vs {len(want)}"]
    for c in cols:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            gv = g.fillna(np.nan).values.astype(float)
            wv = w.fillna(np.nan).values.astype(float)
            # EXACT: identical IEEE bit patterns (NaN == NaN), like the
            # driver's value hash — no tolerance
            eq = gv.view(np.uint64) == wv.view(np.uint64)
            eq |= np.isnan(gv) & np.isnan(wv)
            # -0.0 vs +0.0 hash the same through repr-free value hashing
            eq |= (gv == 0.0) & (wv == 0.0)
            ok = bool(eq.all())
            bad = np.flatnonzero(~eq)[:5]
        else:
            eq = g.fillna(-(2**62)).values == w.fillna(-(2**62)).values
            ok = bool(eq.all())
            bad = np.flatnonzero(~eq)[:5]
        if not ok:
            problems.append(
                f"col {c} mismatch at rows {bad}: "
                f"got {g.iloc[bad].tolist()} want {w.iloc[bad].tolist()}"
            )
    return problems


def main():
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.monotonic() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok    {name}: rows-only ({len(got)} rows, {dt:.1f}s)")
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(problems))
        else:
            print(f"ok    {name}: {len(got)} rows match oracle ({dt:.1f}s)")
    print("FAILURES:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
