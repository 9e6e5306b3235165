"""Corpus / web-archive sources beyond parquet.

* ``read_jsonl_docs`` — JSONL document corpora (the common
  Common-Crawl-derivative distribution format: one JSON object per
  line with a text field), normalized to the engine's
  ``(doc_id, text)`` contract.
* ``read_warc_lite`` / ``write_warc_lite`` — a minimal WARC 1.0
  (ISO 28500, public spec) response-record reader: the archive format
  the reference's WebCrawler domain actually ships in. One archive
  file = one parse task, which is exactly Common Crawl's natural
  parallelism (segments of ~1 GB .warc files); records normalize to
  ``(url, warc_ts, text)`` rows ready for ``pages_to_edges``.
* ``rmat_edges`` — deterministic counter-based R-MAT generator
  (Chakrabarti et al. 2004, public): the standard synthetic power-law
  graph for scale benchmarking. No RNG state — every edge's quadrant
  path derives from ``mix64(seed, edge_index, level)``, so any block
  partitioning yields the same graph.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# JSONL corpora
# ---------------------------------------------------------------------------

def read_jsonl_docs(paths, text_field: str = "text", id_field=None):
    """JSONL → Dataset (doc_id:int64, text:string). When ``id_field``
    is None the doc id is the low 63 bits of md5(text) — stable across
    partitioning and re-runs (same convention as the exact-dedup
    fingerprint)."""
    import ray.data as rd

    ds = rd.read_json(paths)

    def norm(tbl: pa.Table) -> pa.Table:
        texts = [
            t if isinstance(t, str) else ""
            for t in tbl.column(text_field).to_pylist()
        ]
        if id_field is not None:
            ids = np.asarray(
                tbl.column(id_field).to_pylist(), dtype=np.int64
            )
        else:
            ids = np.array(
                [
                    int.from_bytes(
                        hashlib.md5(t.encode()).digest()[:8], "little"
                    )
                    >> 1
                    for t in texts
                ],
                dtype=np.int64,
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# WARC-lite (ISO 28500 response records, uncompressed)
# ---------------------------------------------------------------------------

_CRLF = b"\r\n"


def write_warc_lite(path: str, records) -> None:
    """Write (url, warc_ts, text) triples as minimal WARC 1.0 response
    records — the test/round-trip producer."""
    with open(path, "wb") as f:
        for url, ts, text in records:
            payload = text.encode("utf-8")
            headers = (
                b"WARC/1.0" + _CRLF
                + b"WARC-Type: response" + _CRLF
                + b"WARC-Target-URI: " + url.encode() + _CRLF
                + b"WARC-Date: " + ts.encode() + _CRLF
                + b"Content-Length: " + str(len(payload)).encode() + _CRLF
                + _CRLF
            )
            f.write(headers + payload + _CRLF + _CRLF)


def _parse_warc_bytes(buf: bytes):
    """One archive's bytes → (urls, tss, texts) lists. Record framing
    per the WARC spec: header block, blank line, Content-Length payload
    bytes, two CRLFs."""
    urls, tss, texts = [], [], []
    pos = 0
    n = len(buf)
    while pos < n:
        head_end = buf.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        head = buf[pos:head_end].decode("utf-8", "replace")
        fields = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body_start = head_end + 4
        payload = buf[body_start : body_start + length]
        if fields.get("warc-type") == "response":
            urls.append(fields.get("warc-target-uri", ""))
            tss.append(fields.get("warc-date", ""))
            texts.append(payload.decode("utf-8", "replace"))
        pos = body_start + length + 4  # skip payload + two CRLFs
    return urls, tss, texts


def read_warc_lite(paths):
    """WARC file(s) → Dataset (url:string, warc_ts:string,
    text:string), one parse task per archive file (Common Crawl's
    natural sharding; a 256-node cluster reads 10^5 archives as 10^5
    independent tasks with no exchange)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths)

    def parse(tbl: pa.Table) -> pa.Table:
        urls_all, tss_all, texts_all = [], [], []
        for buf in tbl.column("bytes").to_pylist():
            u, t, x = _parse_warc_bytes(bytes(buf))
            urls_all += u
            tss_all += t
            texts_all += x
        return pa.table(
            {
                "url": pa.array(urls_all, pa.string()),
                "warc_ts": pa.array(tss_all, pa.string()),
                "text": pa.array(texts_all, pa.string()),
            }
        )

    return ds.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# R-MAT generator
# ---------------------------------------------------------------------------

def rmat_edges(
    scale: int,
    n_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    num_blocks: int = 32,
    drop_self_loops: bool = True,
):
    """Deterministic R-MAT edge Dataset over 2**scale vertices: for
    each edge index e and recursion level l, quadrant choice is a
    counter-based uniform ``mix64(e·scale + l + (seed << 32))`` draw against
    the (a, b, c, d=1−a−b−c) split — stateless, so blocks generate
    independently and any partitioning yields bit-identical edges.
    Returns (src:int64, dst:int64, weight:float64=1)."""
    import ray.data as rd

    from signal_collect_ray.util import mix64

    d = 1.0 - a - b - c
    if d < 0:
        raise ValueError("a + b + c must be <= 1")
    # cumulative quadrant thresholds over [0, 1)
    t1, t2, t3 = a, a + b, a + b + c

    def gen(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("id").to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        src = np.zeros(len(ids), dtype=np.int64)
        dst = np.zeros(len(ids), dtype=np.int64)
        for lvl in range(scale):
            h = mix64(
                ids * np.uint64(scale)
                + np.uint64(lvl)
                + (np.uint64(seed) << np.uint64(32))
            )
            u = h.astype(np.float64) / 2.0**64
            right = (u >= t1) & (u < t2) | (u >= t3)  # quadrants b, d
            lower = u >= t2  # quadrants c, d
            src = (src << 1) | lower.astype(np.int64)
            dst = (dst << 1) | right.astype(np.int64)
        keep = (
            src != dst if drop_self_loops else np.ones(len(src), dtype=bool)
        )
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
                "weight": pa.array(np.ones(int(keep.sum())), pa.float64()),
            }
        )

    return (
        rd.range(n_edges, override_num_blocks=num_blocks)
        .map_batches(gen, batch_format="pyarrow")
    )
