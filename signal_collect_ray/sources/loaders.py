"""Text graph loaders — rebuild of the reference loading utilities.

* ``read_edge_list_text``: ASCII whitespace-separated unsigned int pairs
  with ``#`` comment lines (``util/FileReader.scala:26-93``,
  ``loading/Loading.scala:27-98`` — the notredame edge-list format).
* ``read_adjacency_list_text``: ``vertexId outDegree target1 target2 …``
  per line (``loading/AdjacencyListLoader.scala:40-94``).

Both return an edge Dataset (src:int64, dst:int64, weight:float64=1.0),
parsed vectorized per batch of lines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _edge_table(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "src": pa.array(src.astype(np.int64), pa.int64()),
            "dst": pa.array(dst.astype(np.int64), pa.int64()),
            "weight": pa.array(np.ones(len(src)), pa.float64()),
        }
    )


def _parse_edge_lines(batch) -> pa.Table:
    lines = [
        l for l in batch["text"] if l.strip() and not l.lstrip().startswith("#")
    ]
    if not lines:
        return _edge_table(np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    nums = np.array(" ".join(lines).split(), dtype=np.int64)
    assert len(nums) % 2 == 0, "edge list must contain (src dst) pairs"
    return _edge_table(nums[0::2], nums[1::2])


def _parse_adjacency_lines(batch) -> pa.Table:
    srcs: list = []
    dsts: list = []
    for line in batch["text"]:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split()
        vid = int(parts[0])
        deg = int(parts[1])
        targets = [int(x) for x in parts[2 : 2 + deg]]
        assert len(targets) == deg, f"bad adjacency line: {line!r}"
        srcs.extend([vid] * deg)
        dsts.extend(targets)
    return _edge_table(
        np.asarray(srcs, dtype=np.int64), np.asarray(dsts, dtype=np.int64)
    )


def read_edge_list_text(paths):
    """ASCII (src dst) pairs, '#' comments → edge Dataset."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(_parse_edge_lines, batch_format="numpy")


def read_adjacency_list_text(paths):
    """``vid degree t1 t2 …`` lines → edge Dataset.

    Note: lines are independent; vertices with degree 0 appear as
    vertices only if referenced elsewhere (matching the reference, where
    a zero-degree line still adds the vertex — use ``vertices_from``
    below to recover isolated vertices if needed)."""
    import ray.data as rd

    return rd.read_text(paths).map_batches(
        _parse_adjacency_lines, batch_format="numpy"
    )


def adjacency_vertices(paths):
    """All vertex ids declared in an adjacency-list file (including
    isolated, zero-degree ones — AdjacencyListLoaderSpec.scala:33-60)."""
    import ray.data as rd

    def vids(batch) -> pa.Table:
        out = [
            int(l.split()[0])
            for l in batch["text"]
            if l.strip() and not l.lstrip().startswith("#")
        ]
        return pa.table({"vid": pa.array(out, pa.int64())})

    return rd.read_text(paths).map_batches(vids, batch_format="numpy")


# ---------------------------------------------------------------------------
# binary split loader (web-split varint format)
# ---------------------------------------------------------------------------
# The reference's fastest loading path (``examples/EfficientSssp.scala:64-86``
# ``loadSplit``): each split file is a stream of
# ``[varint vertexId, varint outDegree, outDegree × varint targetId]``
# records, varints in the LEB128-style encoding of
# ``util/Ints.scala:82-142`` (7 data bits per byte, little-endian groups,
# MSB = continuation). One Ray task decodes one split — the same
# parallelism contract as the reference's one-GraphEditor-per-split.


def _encode_varints(vals: np.ndarray) -> np.ndarray:
    """Vectorized unsigned-varint encoder (Ints.writeUnsignedVarInt),
    full 64-bit range (up to 10 bytes/value — hash vids span 63 bits)."""
    vals = np.asarray(vals, dtype=np.uint64)
    conds = [vals < (np.uint64(1) << np.uint64(7 * j)) for j in range(1, 10)]
    nb = np.select(conds, list(range(1, 10)), default=10).astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
    out = np.zeros(int(nb.sum()), dtype=np.uint8)
    for j in range(10):
        sel = nb > j
        if not sel.any():
            break
        byte = (vals[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = np.where(nb[sel] > j + 1, 0x80, 0).astype(np.uint64)
        out[starts[sel] + j] = (byte | cont).astype(np.uint8)
    return out


def _decode_varints(buf: np.ndarray) -> np.ndarray:
    """Vectorized unsigned-varint decoder (Ints.readUnsignedVarInt):
    terminator bytes have MSB 0; each byte contributes 7 bits shifted by
    its position within its group. Exact int64 accumulation via reduceat
    over the (already sorted) group boundaries — no float round-trip."""
    if not len(buf):
        return np.empty(0, dtype=np.int64)
    ends = (buf & 0x80) == 0
    group_start = np.flatnonzero(np.concatenate([[True], ends[:-1]]))
    group_sizes = np.diff(np.append(group_start, len(buf)))
    pos_in = np.arange(len(buf), dtype=np.int64) - np.repeat(
        group_start, group_sizes
    )
    contrib = (buf & np.uint8(0x7F)).astype(np.int64) << (7 * pos_in)
    return np.add.reduceat(contrib, group_start)


def write_binary_splits(
    src: np.ndarray, dst: np.ndarray, out_dir: str, num_splits: int = 8,
    prefix: str = "web-split-",
):
    """Write edge arrays as reference-format binary splits (vertex → split
    by ``vid % num_splits``, matching the modulo mapper the loader's
    per-split GraphEditor assignment implies). Returns the file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    boundaries = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    vids = src[boundaries]
    degs = np.diff(np.append(boundaries, len(src)))
    paths = []
    for s in range(num_splits):
        sel = np.flatnonzero(vids % num_splits == s)
        stream = []
        for i in sel:
            b = boundaries[i]
            stream.append([vids[i], degs[i]])
            stream.append(dst[b : b + degs[i]])
        flat = (
            np.concatenate([np.asarray(x, dtype=np.int64).ravel() for x in stream])
            if stream
            else np.empty(0, dtype=np.int64)
        )
        path = os.path.join(out_dir, f"{prefix}{s}")
        _encode_varints(flat).tofile(path)
        paths.append(path)
    return paths


def read_binary_splits(paths):
    """Binary web-split files → edge Dataset (src, dst, weight=1).

    One decode task per split file; the varint stream is decoded
    vectorized, then the ``[vid, deg, targets…]`` records are segmented
    with a per-VERTEX (not per-byte) scan and expanded into edge arrays
    with repeat/fancy-indexing."""
    import ray.data as rd

    def decode(batch) -> pa.Table:
        srcs, dsts = [], []
        for path in batch["path"]:
            vals = _decode_varints(np.fromfile(path, dtype=np.uint8))
            starts, degs, vlist = [], [], []
            i = 0
            while i < len(vals):
                deg = int(vals[i + 1])
                vlist.append(vals[i])
                degs.append(deg)
                starts.append(i + 2)
                i += 2 + deg
            if not vlist:
                continue
            degs = np.asarray(degs, dtype=np.int64)
            starts = np.asarray(starts, dtype=np.int64)
            from signal_collect_ray.util import expand_ranges

            dsts.append(vals[expand_ranges(starts, degs)])
            srcs.append(np.repeat(np.asarray(vlist, dtype=np.int64), degs))
        if not srcs:
            return _edge_table(np.empty(0, np.int64), np.empty(0, np.int64))
        return _edge_table(np.concatenate(srcs), np.concatenate(dsts))

    paths = list(paths)
    return (
        rd.from_arrow(pa.table({"path": pa.array(paths, pa.string())}))
        .repartition(len(paths))
        .map_batches(decode, batch_format="numpy")
    )


# ---------------------------------------------------------------------------
# N-Triples loader (LodNeighbourhoodPageRank source)
# ---------------------------------------------------------------------------

def read_ntriples(paths, subject_prefix: str = ""):
    """N-Triples lines → IRI edge Dataset (src_url, dst_url, src, dst,
    weight) with deterministic hash vids (``util.url_to_vid`` — no
    global dictionary shuffle).

    The reference's ``LodNeighbourhoodPageRank``
    (``examples/LodNeighbourhoodPageRank.scala:30-59``) streams dbpedia
    ``.ntriples`` and adds a PageRank edge subject→object for every
    IRI-valued object; this loader reproduces that extraction over LOCAL
    ntriples text (no network in this environment): lines
    ``<s> <p> <o> .`` keep IRI objects only (literals dropped, like the
    reference's startswith filter); ``subject_prefix`` optionally
    restricts objects to a namespace the way the reference restricts to
    ``http://dbpedia.org/resource/``."""
    import ray.data as rd

    from signal_collect_ray.util import urls_to_vids

    def parse(batch) -> pa.Table:
        src_urls, dst_urls = [], []
        for line in batch["text"]:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            # <s> <p> <o> .   — object must be an IRI (starts with '<')
            parts = line.split(None, 2)
            if len(parts) < 3 or not (
                parts[0].startswith("<") and parts[2].startswith("<")
            ):
                continue
            obj = parts[2]
            end = obj.find(">")
            if end < 0:
                continue
            s = parts[0][1:-1]
            o = obj[1:end]
            if subject_prefix and not o.startswith(subject_prefix):
                continue
            if s == o:
                continue
            src_urls.append(s)
            dst_urls.append(o)
        if not src_urls:
            return pa.table(
                {
                    "src_url": pa.array([], pa.string()),
                    "dst_url": pa.array([], pa.string()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "src_url": pa.array(src_urls, pa.string()),
                "dst_url": pa.array(dst_urls, pa.string()),
                "src": pa.array(urls_to_vids(src_urls), pa.int64()),
                "dst": pa.array(urls_to_vids(dst_urls), pa.int64()),
                "weight": pa.array(np.ones(len(src_urls)), pa.float64()),
            }
        )

    return rd.read_text(paths).map_batches(parse, batch_format="numpy")
