"""Multimodal column plumbing — image/audio/video as opaque binary.

Two decode paths:

- ``decoder="real"`` — a REAL decode stage: PGM/PPM/BMP/PNG images,
  PCM16 WAV audio and Y4M (YUV4MPEG2 Cmono) video decode via the
  zero-dependency codecs in ``functions.codecs`` (pure stdlib/numpy);
  PIL, when installed, extends the image path to JPEG/WebP/etc.
  Images → grayscale → 4×4 nearest-neighbor thumbnail (16 features);
  audio → 16-segment amplitude envelope; video → 4-frame floor-grid
  sample → 2×2 thumbnails (16 features). Only a payload in a format
  none of those cover raises NotImplementedError.
- ``decoder="fake"`` — deterministic md5-derived features, kept for
  byte-exact SQL oracles over arbitrary (undecodable) payloads.

Everything around the kernel — schema, actor-pool stage shape, small
batch sizes for wide binary rows, typed metadata, output layout — is
shared by both paths.

Schema convention for a media table:
    (media_id:int64, kind:string, payload:binary,
     meta:struct<width:int32, height:int32, sample_rate:int32, n_frames:int32>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("payload", pa.binary()),
        (
            "meta",
            pa.struct(
                [
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("sample_rate", pa.int32()),
                    ("n_frames", pa.int32()),
                ]
            ),
        ),
    ]
)


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    payloads = [rng.bytes(64 + int(rng.randint(0, 192))) for _ in range(n)]
    metas = [
        {
            "width": int(rng.randint(16, 512)),
            "height": int(rng.randint(16, 512)),
            "sample_rate": 16000,
            "n_frames": int(rng.randint(1, 300)),
        }
        for _ in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "kind": pa.array(list(kinds), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
        }
    )


def media_from_documents(docs_ds):
    """Derive a media table from the ``documents`` table: payload =
    UTF-8 bytes of the text treated as an opaque binary column (the
    schema convention above), kind round-robined by doc_id. Gives the
    multimodal stage a REAL corpus-derived input whose fake-decoder
    features have an exact DuckDB mirror (md5 over the same bytes)."""
    kinds = np.array(["image", "audio", "video"], dtype=object)

    def to_media(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [(t or "") for t in tbl.column("text").to_pylist()]
        payloads = [t.encode("utf-8") for t in texts]
        sizes = np.array([len(p) for p in payloads], dtype=np.int64)
        metas = [
            {
                "width": int(s % 512 + 16),
                "height": int((s * 7) % 512 + 16),
                "sample_rate": 16000,
                "n_frames": int(s % 300 + 1),
            }
            for s in sizes
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(list(kinds[ids % 3]), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
            }
        )

    return docs_ds.map_batches(to_media, batch_format="pyarrow")


class MediaFeatureExtractor:
    """Actor-pool map_batches stage: payload bytes → fixed-dim feature
    vector + decoded metadata columns.

    ``__init__`` is where a real deployment loads the decoder/model once
    per actor. ``decoder="fake"`` derives a deterministic 16-dim float
    vector from the md5 digest of the payload (stable, testable, and
    exactly mirrorable in SQL via ``md5()`` hex-nibble arithmetic — the
    same trick that made ``doc_fingerprints`` oracle-checkable);
    ``decoder="real"`` marks exactly where the missing library goes.

    Use small ``batch_size`` (e.g. 64) with wide binary payloads so a
    batch × pool-concurrency fits worker heap (ray_guide: memory-aware).
    """

    __name__ = "MediaFeatureExtractor"
    DIM = 16

    def __init__(self, decoder: str = "fake"):
        if decoder not in ("fake", "real"):
            raise ValueError(decoder)
        self.decoder = decoder
        self._pil = None
        if decoder == "real":
            # decoder state loads ONCE PER ACTOR, here — never per batch.
            # The builtin codecs (functions.codecs: PGM/PPM/BMP/PNG + WAV,
            # pure stdlib) always exist; PIL, when installed, extends the
            # image path to everything else (JPEG/WebP/...).
            from signal_collect_ray.functions import codecs

            self._codecs = codecs
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError:
                self._pil = None

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        cx = self._codecs
        fmt = cx.sniff_format(payload)
        if fmt == "wav":
            samples, _sr = cx.decode_wav(payload)
            return cx.segment_envelope(samples, self.DIM)
        if fmt == "y4m":
            # frame-sample: 4 frames on the floor grid, each to a 2x2
            # grayscale thumbnail -> DIM=16 features
            frames, _fps = cx.decode_y4m(payload)
            picked = cx.sample_frames(frames, 4)
            return (
                np.stack(
                    [cx.resize_nearest(f, 2, 2).reshape(-1) for f in picked]
                ).reshape(-1)
                / 255.0
            )
        if fmt in ("pgm", "ppm", "bmp", "png"):
            img = cx.to_grayscale(cx.decode_image(payload))
            return cx.resize_nearest(img, 4, 4).reshape(-1) / 255.0
        if kind == "image" and self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((4, 4))  # DIM=16 grayscale thumbnail
            return np.asarray(img, dtype=np.float64).reshape(-1) / 255.0
        raise NotImplementedError(
            f"real decode of a non-PGM/PPM/BMP/PNG/WAV {kind} payload needs "
            + ("soundfile/av" if kind != "image" else "PIL")
            + " — not installed here; the import-try in __init__ activates "
            "it automatically where it exists"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        dig = hashlib.md5(payload).digest()  # 16 bytes = DIM features
        raw = np.frombuffer(dig, dtype=np.uint8).astype(np.float64)
        return raw / 255.0

    def __call__(self, tbl: pa.Table) -> pa.Table:
        fn = self._decode_fake if self.decoder == "fake" else self._decode_real
        feats = np.stack(
            [
                fn(p, k)
                for p, k in zip(
                    tbl.column("payload").to_pylist(), tbl.column("kind").to_pylist()
                )
            ]
        )
        off = np.arange(0, (len(tbl) + 1) * self.DIM, self.DIM, dtype=np.int32)
        col = pa.ListArray.from_arrays(
            pa.array(off), pa.array(feats.reshape(-1), pa.float64())
        )
        out = tbl.drop_columns(["payload"])  # project the wide column away
        return out.append_column("features", col).append_column(
            "payload_bytes",
            pa.array(
                [len(p) for p in tbl.column("payload").to_pylist()], pa.int64()
            ),
        )


def real_media_from_documents(docs_ds):
    """Derive a REAL-format media table from the ``documents`` table
    (kind = doc_id mod 3): images render an 8x8 PGM whose 2x2-replicated
    pixel grid is the md5 digest of the text (a 4x4 nearest-neighbor
    thumbnail recovers the digest exactly); audio renders a 64-sample
    PCM16 WAV whose 16 constant 4-sample segments encode the digest
    bytes as (b - 128) * 256; video renders a 4-frame 4x4 Y4M (Cmono)
    whose frame f's 2x2 pixel blocks are digest bytes 4f..4f+3 (the
    4-frame floor-grid sample + 2x2 thumbnails recover the digest).
    All three decode through the genuine codec path and have exact
    DuckDB mirrors via md5 hex-nibble arithmetic."""
    from signal_collect_ray.functions import codecs

    def to_media(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [(t or "") for t in tbl.column("text").to_pylist()]
        payloads, kinds, metas = [], [], []
        for i, t in zip(ids, texts):
            dig = np.frombuffer(
                hashlib.md5(t.encode("utf-8")).digest(), np.uint8
            )
            if i % 3 == 0:
                px = np.kron(dig.reshape(4, 4), np.ones((2, 2), np.uint8))
                payloads.append(codecs.encode_pgm(px))
                kinds.append("image")
                metas.append({"width": 8, "height": 8,
                              "sample_rate": 0, "n_frames": 1})
            elif i % 3 == 1:
                s = np.repeat(
                    (dig.astype(np.int64) - 128) * 256, 4
                ).astype(np.int16)
                payloads.append(codecs.encode_wav(s, 16000))
                kinds.append("audio")
                metas.append({"width": 0, "height": 0,
                              "sample_rate": 16000, "n_frames": 64})
            else:
                frames = np.stack(
                    [
                        np.kron(
                            dig[4 * f : 4 * f + 4].reshape(2, 2),
                            np.ones((2, 2), np.uint8),
                        )
                        for f in range(4)
                    ]
                )
                payloads.append(codecs.encode_y4m(frames))
                kinds.append("video")
                metas.append({"width": 4, "height": 4,
                              "sample_rate": 0, "n_frames": 4})
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, MEDIA_SCHEMA.field("meta").type),
            }
        )

    return docs_ds.map_batches(to_media, batch_format="pyarrow")


def extract_media_features(media_ds, concurrency=2, batch_size: int = 64,
                           decoder: str = "fake"):
    """Feature extraction as an actor-pool stage over a media Dataset."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
