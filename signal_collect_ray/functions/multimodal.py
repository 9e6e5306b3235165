"""Multimodal column plumbing — image/audio/video as opaque binary.

The decode/resample kernels themselves are STUBBED (no image/audio
libraries in this container): ``decoder="fake"`` produces deterministic
feature vectors from the bytes; ``decoder="real"`` raises
NotImplementedError where a PIL/libsndfile call would go. Everything
around the kernel — schema, actor-pool stage shape, small batch sizes
for wide binary rows, typed metadata, output layout — is real and
tested.

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


class MediaFeatureExtractor:
    """Actor-pool map_batches stage: payload bytes → fixed-dim feature
    vector + decoded metadata columns.

    ``__init__`` is where a real deployment loads the decoder/model once
    per actor. ``decoder="fake"`` derives a deterministic 16-dim float
    vector from a blake2b digest of the payload (stable, testable);
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

    def _decode_real(self, payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "real decode needs PIL/soundfile/av — not available in this "
            "environment; plug the library call here"
        )

    def _decode_fake(self, payload: bytes, kind: str) -> np.ndarray:
        dig = hashlib.blake2b(payload, digest_size=self.DIM * 2).digest()
        raw = np.frombuffer(dig, dtype=np.uint16).astype(np.float64)
        return raw / 65535.0

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


def extract_media_features(media_ds, concurrency=2, batch_size: int = 64):
    """Feature extraction as an actor-pool stage over a media Dataset."""
    return media_ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"decoder": "fake"},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
