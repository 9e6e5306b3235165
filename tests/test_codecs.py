"""Zero-dependency media codecs (functions/codecs.py) and the REAL
multimodal decode path they unlock.

Covers: PGM/PPM/BMP/PNG round-trips, PNG decode of all five filter
types (hand-assembled IDAT, since our encoder only emits filter 0),
WAV PCM16 round-trip, format sniffing, the deterministic resamplers,
and MediaFeatureExtractor(decoder="real") end-to-end on genuine
payloads — plus parity with PIL where PIL exists."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from signal_collect_ray.functions import codecs as cx


def _rand_img(h, w, c=None, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c is None else (h, w, c)
    return rng.randint(0, 256, size=shape).astype(np.uint8)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


def test_pgm_roundtrip():
    px = _rand_img(13, 7, seed=1)
    assert np.array_equal(cx.decode_pgm(cx.encode_pgm(px)), px)


def test_ppm_roundtrip():
    px = _rand_img(9, 11, 3, seed=2)
    assert np.array_equal(cx.decode_ppm(cx.encode_ppm(px)), px)


def test_pnm_comment_header():
    px = _rand_img(4, 4, seed=3)
    raw = cx.encode_pgm(px)
    # inject a comment line after the magic, as real netpbm tools emit
    commented = b"P5\n# made by test\n" + raw[3:]
    assert np.array_equal(cx.decode_pgm(commented), px)


def test_bmp_roundtrip_odd_width():
    # odd width exercises the 4-byte row padding
    px = _rand_img(5, 3, 3, seed=4)
    assert np.array_equal(cx.decode_bmp(cx.encode_bmp(px)), px)


def test_png_roundtrip_gray_and_rgb():
    for px in (_rand_img(6, 10, seed=5), _rand_img(10, 6, 3, seed=6)):
        assert np.array_equal(cx.decode_png(cx.encode_png(px)), px)


def test_y4m_roundtrip():
    rng = np.random.RandomState(15)
    frames = rng.randint(0, 256, size=(5, 6, 8)).astype(np.uint8)
    payload = cx.encode_y4m(frames, fps=(30, 1))
    out, fps = cx.decode_y4m(payload)
    assert fps == (30, 1)
    assert np.array_equal(out, frames)
    assert cx.sniff_format(payload) == "y4m"


def test_sample_frames_floor_grid():
    frames = np.arange(8, dtype=np.uint8).reshape(8, 1, 1)
    assert cx.sample_frames(frames, 4).reshape(-1).tolist() == [0, 2, 4, 6]
    # fewer frames than samples replicates (floor grid)
    two = np.arange(2, dtype=np.uint8).reshape(2, 1, 1)
    assert cx.sample_frames(two, 4).reshape(-1).tolist() == [0, 0, 1, 1]


def test_wav_roundtrip():
    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32768, size=160).astype(np.int16)
    out, sr = cx.decode_wav(cx.encode_wav(s, 8000))
    assert sr == 8000
    assert np.array_equal(out, s)


# ---------------------------------------------------------------------------
# PNG filters 1-4 (Sub/Up/Average/Paeth) — hand-built scanlines, since
# the encoder only emits filter 0
# ---------------------------------------------------------------------------


def _png_with_filters(px: np.ndarray, filters: list[int]) -> bytes:
    """Assemble a grayscale PNG whose row y uses filters[y]."""
    h, w = px.shape
    lines = bytearray()
    prev = np.zeros(w, np.int64)
    for y, f in enumerate(filters):
        cur = px[y].astype(np.int64)
        if f == 0:
            enc = cur.copy()
        elif f == 1:  # Sub
            enc = cur.copy()
            enc[1:] = (cur[1:] - cur[:-1]) % 256
        elif f == 2:  # Up
            enc = (cur - prev) % 256
        elif f == 3:  # Average
            enc = cur.copy()
            for x in range(w):
                left = cur[x - 1] if x else 0
                enc[x] = (cur[x] - (left + prev[x]) // 2) % 256
        elif f == 4:  # Paeth
            enc = cur.copy()
            for x in range(w):
                left = int(cur[x - 1]) if x else 0
                ul = int(prev[x - 1]) if x else 0
                enc[x] = (cur[x] - cx._paeth(left, int(prev[x]), ul)) % 256
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + cx._png_chunk(b"IHDR", ihdr)
        + cx._png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + cx._png_chunk(b"IEND", b"")
    )


def test_png_decode_all_filters():
    px = _rand_img(5, 8, seed=8)
    payload = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(cx.decode_png(payload), px)


def test_png_decode_matches_pil_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    px = _rand_img(12, 9, 3, seed=9)
    for payload in (cx.encode_png(px), cx.encode_bmp(px)):
        ours = cx.decode_image(payload)
        theirs = np.asarray(PIL.open(io.BytesIO(payload)).convert("RGB"))
        assert np.array_equal(ours, theirs)


# ---------------------------------------------------------------------------
# sniffing + resamplers
# ---------------------------------------------------------------------------


def test_sniff_format():
    gray, rgb = _rand_img(3, 3, seed=10), _rand_img(3, 3, 3, seed=11)
    s = np.zeros(8, np.int16)
    assert cx.sniff_format(cx.encode_pgm(gray)) == "pgm"
    assert cx.sniff_format(cx.encode_ppm(rgb)) == "ppm"
    assert cx.sniff_format(cx.encode_bmp(rgb)) == "bmp"
    assert cx.sniff_format(cx.encode_png(gray)) == "png"
    assert cx.sniff_format(cx.encode_wav(s)) == "wav"
    assert cx.sniff_format(b"\xff\xd8\xff\xe0 jpeg?") == "unknown"


def test_grayscale_weights_deterministic():
    img = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255]]], np.uint8)
    # BT.601 integer luma, half-away rounding
    assert cx.to_grayscale(img).tolist() == [[76, 150, 29]]
    g = _rand_img(4, 4, seed=12)
    assert cx.to_grayscale(g) is g  # grayscale passes through


def test_resize_nearest_floor_grid():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = cx.resize_nearest(img, 2, 2)
    assert out.tolist() == [[0, 2], [8, 10]]
    # identity when sizes match; upscale replicates
    assert np.array_equal(cx.resize_nearest(img, 4, 4), img)
    up = cx.resize_nearest(np.array([[1, 2]], np.uint8), 1, 4)
    assert up.tolist() == [[1, 1, 2, 2]]


def test_segment_envelope():
    s = np.concatenate(
        [np.full(8, 32768 // 2, np.int64), np.zeros(8, np.int64)]
    ).astype(np.int16)
    env = cx.segment_envelope(s, 4)
    assert env.tolist() == [0.5, 0.5, 0.0, 0.0]
    assert cx.segment_envelope(np.zeros(0, np.int16), 3).tolist() == [0, 0, 0]


# ---------------------------------------------------------------------------
# MediaFeatureExtractor(decoder="real") end-to-end on genuine payloads
# ---------------------------------------------------------------------------


def test_real_decoder_on_codec_payloads():
    from signal_collect_ray.functions import MediaFeatureExtractor

    ex = MediaFeatureExtractor(decoder="real")
    px = _rand_img(8, 8, seed=13)
    want_img = cx.resize_nearest(px, 4, 4).reshape(-1) / 255.0
    for payload in (cx.encode_pgm(px), cx.encode_png(px)):
        assert np.allclose(ex._decode_real(payload, "image"), want_img)
    rgb = _rand_img(8, 8, 3, seed=14)
    want_rgb = cx.resize_nearest(cx.to_grayscale(rgb), 4, 4).reshape(-1) / 255.0
    for payload in (cx.encode_ppm(rgb), cx.encode_bmp(rgb), cx.encode_png(rgb)):
        assert np.allclose(ex._decode_real(payload, "image"), want_rgb)

    s = np.repeat((np.arange(16, dtype=np.int64) * 1000 - 8000), 4).astype(
        np.int16
    )
    feats = ex._decode_real(cx.encode_wav(s), "audio")
    assert np.allclose(feats, np.abs(np.arange(16) * 1000 - 8000) / 32768.0)

    # video: 8 frames, floor-grid sample picks frames 0,2,4,6; each
    # frame is constant so the 2x2 thumbnails are 4 copies of its value
    vid = np.stack(
        [np.full((4, 4), 10 * f, np.uint8) for f in range(8)]
    )
    feats = ex._decode_real(cx.encode_y4m(vid), "video")
    want = np.repeat(np.array([0, 20, 40, 60], np.float64), 4) / 255.0
    assert np.allclose(feats, want)

    # a payload in no supported format still raises (unless PIL covers it)
    if ex._pil is None:
        with pytest.raises(NotImplementedError):
            ex._decode_real(b"\xff\xd8\xff\xe0 not decodable", "image")
