"""Property-based conformance: the temporal operators vs an in-process
DuckDB oracle on randomized inputs (hypothesis). These cover shapes the
fixed driver queries cannot — empty sides, single-row keys, boundary
equality, users present on only one side."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _events(draw, n_users=4, max_rows=30, unique_ts=True):
    n = draw(st.integers(0, max_rows))
    users = [draw(st.integers(0, n_users - 1)) for _ in range(n)]
    if unique_ts:
        ts = draw(
            st.lists(
                st.integers(0, 10_000), min_size=n, max_size=n, unique=True
            )
        )
    else:
        ts = [draw(st.integers(0, 10_000)) for _ in range(n)]
    vals = [round(draw(st.floats(0, 100, allow_nan=False)), 2) for _ in range(n)]
    return users, ts, vals


@st.composite
def _asof_inputs(draw):
    lu, lt, _ = _events(draw)
    ru, rt, rv = _events(draw)
    return (lu, lt), (ru, rt, rv)


@given(_asof_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_join_matches_duckdb(inputs):
    from signal_collect_ray.functions.joins import asof_join

    (lu, lt), (ru, rt, rv) = inputs
    left = pa.table(
        {
            "event_id": pa.array(list(range(len(lu))), pa.int64()),
            "user_id": pa.array(lu, pa.int64()),
            "ts_us": pa.array(lt, pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(ru, pa.int64()),
            "ts_us": pa.array(rt, pa.int64()),
            "value": pa.array(rv, pa.float64()),
        }
    )
    # right side must be tie-free per (user, ts): the as-of pick among
    # equal timestamps is implementation-defined on both engines
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    dedup = con.execute(
        "SELECT user_id, ts_us, MAX(value) AS value FROM r "
        "GROUP BY user_id, ts_us"
    ).arrow()
    want = {
        row[0]: row[1]
        for row in con.execute(
            "SELECT l.event_id, r2.value FROM l ASOF LEFT JOIN "
            "(SELECT user_id, ts_us, MAX(value) AS value FROM r "
            " GROUP BY user_id, ts_us) r2 "
            "ON l.user_id = r2.user_id AND r2.ts_us <= l.ts_us"
        ).fetchall()
    }
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            rd.from_arrow(left), rd.from_arrow(pa.table(dedup))
        ).take_all()
    }
    assert got == want


@st.composite
def _session_inputs(draw):
    u, t, v = _events(draw, n_users=3, max_rows=25, unique_ts=True)
    gap = draw(st.integers(1, 5_000))
    return u, t, v, gap


@given(_session_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_sessionize_matches_duckdb(inputs):
    from signal_collect_ray.functions.windows import sessionize

    u, t, v, gap = inputs
    ev = pa.table(
        {
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(t, pa.timestamp("us")),
            "value": pa.array(v, pa.float64()),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            f"""
            WITH o AS (SELECT user_id, ts, value, CASE WHEN
              epoch_us(ts) - epoch_us(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts)) > {gap} THEN 1
              ELSE 0 END AS brk FROM events),
            s AS (SELECT user_id, ts, value, SUM(brk) OVER
              (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session FROM o)
            SELECT user_id, session, COUNT(*),
                   epoch_us(MIN(ts)), epoch_us(MAX(ts))
            FROM s GROUP BY user_id, session
            """
        ).fetchall()
    }
    got = {
        (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(rd.from_arrow(ev), gap_s=gap / 1e6).take_all()
    }
    assert got == want


@st.composite
def _corpus(draw):
    words = ["alpha", "beta", "gamma", "delta", "x"]
    n_docs = draw(st.integers(2, 8))
    docs = []
    for _ in range(n_docs):
        n_w = draw(st.integers(0, 12))
        docs.append(" ".join(draw(st.sampled_from(words)) for _ in range(n_w)))
    # exercise normalization: random case + extra whitespace
    docs = [
        d.upper() if draw(st.booleans()) else (" " + d + "  ")
        for d in docs
    ]
    return docs


@given(_corpus(), st.sampled_from([0.2, 0.5, 0.8]))
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_ngram_jaccard_matches_duckdb(docs, threshold):
    """Random tiny corpora with short docs (< k words), empty docs, case
    and whitespace noise — pins the normalization and the whole-text
    short-doc shingle branch against the SQL mirror."""
    from signal_collect_ray.functions.dedup import ngram_jaccard_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"""
            WITH docs AS (SELECT doc_id, regexp_split_to_array(
              trim(lower(COALESCE(text, ''))), '\\s+') AS w FROM documents),
            sh AS (
              SELECT doc_id, array_to_string(w, ' ') AS s FROM docs
              WHERE len(w) < 5
              UNION ALL
              SELECT d.doc_id, array_to_string(d.w[i.i:i.i+4], ' ') AS s
              FROM docs d,
                LATERAL (SELECT unnest(range(1, len(d.w) - 3)) AS i) i
              WHERE len(d.w) >= 5),
            shs AS (SELECT doc_id, list(DISTINCT s) AS S FROM sh
                    GROUP BY doc_id),
            p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              len(list_intersect(a.S, b.S)) / GREATEST(len(a.S) + len(b.S)
              - len(list_intersect(a.S, b.S)), 1) AS j
              FROM shs a JOIN shs b ON a.doc_id < b.doc_id)
            SELECT id_a, id_b, ROUND(j, 6) FROM p WHERE j >= {threshold}
            """
        ).fetchall()
    }
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            rd.from_arrow(tbl), shingle_k=5, threshold=threshold
        ).take_all()
    }
    assert got == want


# ---------------------------------------------------------------------------
# PII scrub: Python `re` vs DuckDB RE2 dialect parity on adversarial text
# ---------------------------------------------------------------------------

_PII_FRAGMENTS = [
    "plain words here",
    "a.b-c_d@sub.example.org",
    "user+tag@host.io",
    "not@an@email",          # second @ starts no valid match? exercise it
    "x@y.z",                 # 1-char TLD: must NOT match ({2,})
    "10.0.0.1",
    "999.999.999.999",       # degenerate but matches \d{1,3} quads
    "1.2.3.4.5",             # 5 quads: leftmost 4 match, trailing .5 outside
    "555-123-4567",
    "5551-123-4567",         # 4-digit prefix: \b kills the match
    "call 555-123-4567.",
    "v1.2.3 release",        # version string: only 3 quads, no IP match
    "end@example.com",
]


@given(
    st.lists(
        st.lists(st.sampled_from(_PII_FRAGMENTS), min_size=0, max_size=6),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_pii_scrub_matches_duckdb(frag_lists):
    """Counts and redacted text must agree exactly between the Python-re
    stage and the DuckDB RE2 mirror, including the near-miss fragments —
    the dialect-parity risk the restricted pattern syntax is meant to
    remove."""
    from signal_collect_ray.functions.text import (
        PII_EMAIL, PII_IPV4, PII_PHONE, PiiScrub,
    )

    docs = [" ".join(f) for f in frag_lists]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = PiiScrub()(tbl)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT doc_id, len(regexp_extract_all(text, '{PII_EMAIL}')) AS n_emails, "
        f"len(regexp_extract_all(text, '{PII_IPV4}')) AS n_ips, "
        f"len(regexp_extract_all(text, '{PII_PHONE}')) AS n_phones, "
        f"regexp_replace(regexp_replace(regexp_replace(text, "
        f"'{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_IPV4}', '<IP>', 'g'), "
        f"'{PII_PHONE}', '<PHONE>', 'g') AS scrubbed "
        f"FROM t ORDER BY doc_id"
    ).fetchall()
    for i, (doc_id, n_em, n_ip, n_ph, scrubbed) in enumerate(want):
        assert got.column("n_emails")[i].as_py() == n_em
        assert got.column("n_ips")[i].as_py() == n_ip
        assert got.column("n_phones")[i].as_py() == n_ph
        assert got.column("scrubbed")[i].as_py() == scrubbed


@given(
    st.lists(
        st.lists(
            st.sampled_from(["the", "THE", "cat", "sat", "on", "mat", ""]),
            min_size=0,
            max_size=10,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_repetition_score_matches_duckdb(word_lists):
    """Empty docs, single-word docs, case noise, repeated words — pins
    the repetition signals against the SQL unnest/group mirror exactly
    (same rounding both sides)."""
    from signal_collect_ray.functions.text import RepetitionScore
    from signal_collect_ray.pipelines.queries import _REPETITION_SQL

    docs = [" ".join(w) for w in word_lists]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = RepetitionScore()(tbl)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(_REPETITION_SQL + " ORDER BY d.doc_id").fetchall()
    for i, (_, dup_w, top_w, top_b) in enumerate(want):
        assert got.column("dup_word_frac")[i].as_py() == dup_w, docs[i]
        assert got.column("top_word_frac")[i].as_py() == top_w, docs[i]
        assert got.column("top_bigram_frac")[i].as_py() == top_b, docs[i]


@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=12),
    st.sampled_from([(8, 8), (8, 4), (5, 3), (1, 1)]),
)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_chunk_documents_matches_duckdb(word_counts, size_stride):
    """Random doc lengths (incl. 0, exactly size, size±1, divisible and
    non-divisible strides) — chunk boundaries, final-window cut-off and
    empty-doc elision must agree exactly with the SQL slicing mirror."""
    from signal_collect_ray.functions.text import ChunkDocuments

    size, stride = size_stride
    docs = [" ".join(f"w{j}" for j in range(n)) for n in word_counts]
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    got = ChunkDocuments(size, stride)(tbl)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(f"""
        WITH d AS (SELECT doc_id,
            regexp_split_to_array(trim(COALESCE(text,'')), '\\s+') AS w
          FROM documents),
        dd AS (SELECT doc_id, w, len(w) AS nw FROM d WHERE w[1] <> ''),
        c AS (SELECT doc_id, w, unnest(range(0, 1 + CAST(CEIL(
            GREATEST(nw - {size}, 0) / {float(stride)}) AS BIGINT))) AS chunk_id
          FROM dd)
        SELECT doc_id, chunk_id,
          len(w[chunk_id*{stride}+1 : chunk_id*{stride}+{size}]) AS chunk_words,
          array_to_string(w[chunk_id*{stride}+1 : chunk_id*{stride}+{size}], ' ')
            AS chunk_text
        FROM c ORDER BY doc_id, chunk_id
    """).fetchall()
    assert got.num_rows == len(want)
    for i, (did, cid, cw, ct) in enumerate(want):
        assert got.column("doc_id")[i].as_py() == did
        assert got.column("chunk_id")[i].as_py() == cid
        assert got.column("chunk_words")[i].as_py() == cw
        assert got.column("chunk_text")[i].as_py() == ct


@st.composite
def _join_inputs(draw):
    nl = draw(st.integers(0, 25))
    lk = [draw(st.integers(0, 6)) for _ in range(nl)]
    rk = draw(st.lists(st.integers(0, 6), max_size=7, unique=True))
    return lk, rk


@given(_join_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_hash_join_matches_duckdb(inputs):
    from signal_collect_ray.functions.joins import hash_join

    lk, rk = inputs
    left = pa.table(
        {
            "k": pa.array(lk, pa.int64()),
            "x": pa.array(list(range(len(lk))), pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": pa.array(rk, pa.int64()),
            "name": pa.array([f"v{v}" for v in rk], pa.string()),
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    for how, sql in (
        ("inner", "SELECT l.k, l.x, r.name FROM l JOIN r USING (k)"),
        ("left", "SELECT l.k, l.x, r.name FROM l LEFT JOIN r USING (k)"),
        ("semi", "SELECT l.k, l.x FROM l SEMI JOIN r USING (k)"),
        ("anti", "SELECT l.k, l.x FROM l ANTI JOIN r USING (k)"),
    ):
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        rows = hash_join(
            rd.from_arrow(left), rd.from_arrow(right), on="k", how=how,
            num_partitions=3,
        ).take_all()
        if how in ("semi", "anti"):
            got = sorted((r["k"], r["x"]) for r in rows)
        else:
            got = sorted((r["k"], r["x"], r["name"]) for r in rows)
        assert got == want, how


@st.composite
def _topk_inputs(draw):
    n = draw(st.integers(0, 40))
    g = [draw(st.integers(0, 4)) for _ in range(n)]
    v = [draw(st.integers(0, 9)) for _ in range(n)]  # small ints force ties
    k = draw(st.integers(1, 4))
    return g, v, k


@given(_topk_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_grouped_top_k_matches_duckdb(inputs):
    from signal_collect_ray.functions.aggregations import grouped_top_k

    g, v, k = inputs
    tbl = pa.table(
        {
            "grp": pa.array(g, pa.int64()),
            "val": pa.array([float(x) for x in v], pa.float64()),
            "id": pa.array(list(range(len(g))), pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("t", tbl)
    want = sorted(
        map(
            tuple,
            con.execute(
                "SELECT grp, val, id FROM (SELECT *, ROW_NUMBER() OVER "
                "(PARTITION BY grp ORDER BY val DESC, id ASC) AS rn FROM t) "
                f"WHERE rn <= {k}"
            ).fetchall(),
        )
    )
    got = sorted(
        (r["grp"], r["val"], r["id"])
        for r in grouped_top_k(
            rd.from_arrow(tbl).repartition(3), "grp", "val", "id", k
        ).take_all()
    )
    assert got == want


@st.composite
def _interval_inputs(draw):
    nl = draw(st.integers(0, 20))
    lu = [draw(st.integers(0, 3)) for _ in range(nl)]
    lt = [draw(st.integers(0, 100)) for _ in range(nl)]
    # non-overlapping intervals per key: cut sorted boundary points
    ivs = []
    for u in range(4):
        pts = sorted(draw(st.lists(
            st.integers(0, 100), min_size=0, max_size=6, unique=True)))
        for i in range(0, len(pts) - 1, 2):
            ivs.append((u, pts[i], pts[i + 1] - 1))
    return lu, lt, ivs


@given(_interval_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_interval_join_matches_duckdb(inputs):
    from signal_collect_ray.functions.joins import interval_join

    lu, lt, ivs = inputs
    left = pa.table(
        {
            "eid": pa.array(list(range(len(lu))), pa.int64()),
            "u": pa.array(lu, pa.int64()),
            "t": pa.array(lt, pa.int64()),
        }
    )
    right = pa.table(
        {
            "u": pa.array([u for u, _, _ in ivs], pa.int64()),
            "s": pa.array([s for _, s, _ in ivs], pa.int64()),
            "e": pa.array([e for _, _, e in ivs], pa.int64()),
            "sid": pa.array(list(range(len(ivs))), pa.int64()),
        }
    )
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(
        map(tuple, con.execute(
            "SELECT l.eid, r.sid FROM l JOIN r ON r.u = l.u "
            "AND l.t BETWEEN r.s AND r.e"
        ).fetchall())
    )
    got = sorted(
        (row["eid"], row["sid"])
        for row in interval_join(
            rd.from_arrow(left), rd.from_arrow(right), by="u",
            time_col="t", start_col="s", end_col="e", value_cols=["sid"],
        ).take_all()
    )
    assert got == want


@given(
    st.lists(st.integers(0, 10_000), min_size=0, max_size=60, unique=True),
    st.sampled_from([0.0, 0.05, 0.3, 0.9, 1.0]),
)
@settings(
    max_examples=20, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_hash_sample_matches_duckdb(ids, rate):
    from signal_collect_ray.functions.sampling import hash_sample

    tbl = pa.table({"doc_id": pa.array(ids, pa.int64())})
    con = duckdb.connect()
    con.register("t", tbl)
    thresh = int(rate * (1 << 32))
    want = sorted(
        r[0] for r in con.execute(
            "SELECT doc_id FROM t WHERE "
            "CAST(('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 8)) "
            f"AS UBIGINT) < {thresh}"
        ).fetchall()
    )
    got = sorted(
        r["doc_id"]
        for r in hash_sample(rd.from_arrow(tbl), rate=rate).take_all()
    )
    assert got == want


def test_sql_mix64_matches_numpy_property():
    """The limb-split SQL mix64 (hll_registers / rmat oracles) is
    bit-identical to util.mix64 on random uint64 inputs."""
    import duckdb
    import numpy as np

    from signal_collect_ray.pipelines.queries import _mix64_mul_sql
    from signal_collect_ray.util import mix64

    rng = np.random.RandomState(17)
    vals = np.concatenate(
        [
            rng.randint(0, 2**63, 50).astype(np.uint64),
            rng.randint(0, 2**63, 50).astype(np.uint64) * 2 + 1,
            np.array([0, 1, 2**32, 2**52 - 1, 2**63, 2**64 - 1], np.uint64),
        ]
    )
    want = sorted(int(x) for x in mix64(vals))
    rows = ", ".join(f"({int(v)})" for v in vals.tolist())
    q = f"""
    WITH u AS (SELECT CAST(v AS UBIGINT) AS x FROM (VALUES {rows}) t(v)),
    h1 AS (SELECT xor(x, x >> 33) AS x FROM u),
    h2 AS (SELECT {_mix64_mul_sql('x', 0xFF51AFD7ED558CCD)} AS x FROM h1),
    h3 AS (SELECT xor(x, x >> 33) AS x FROM h2),
    h4 AS (SELECT {_mix64_mul_sql('x', 0xC4CEB9FE1A85EC53)} AS x FROM h3)
    SELECT xor(x, x >> 33) AS x FROM h4
    """
    got = sorted(int(r[0]) for r in duckdb.connect().execute(q).fetchall())
    assert got == want
