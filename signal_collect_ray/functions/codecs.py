"""Real media codecs with zero external dependencies.

Pure-stdlib/numpy encoders + decoders for genuinely real, publicly
specified formats:

- **PGM (P5)** / **PPM (P6)** — binary netpbm, 8-bit.
- **BMP** — 24-bit uncompressed Windows bitmap (BITMAPINFOHEADER).
- **PNG** — 8-bit grayscale / RGB, zlib-inflated IDAT, full filter
  set (None/Sub/Up/Average/Paeth) on decode; filter-0 on encode.
- **WAV** — PCM16 via the stdlib ``wave`` module.

These make ``MediaFeatureExtractor(decoder="real")`` a real operator in
this container: an image payload in any of the four formats decodes to
pixels, resizes, and featurizes; a WAV payload decodes to samples and
featurizes — no PIL/soundfile needed for these formats (PIL, when
installed, still handles everything else, e.g. JPEG).

Also provides the deterministic resamplers the extractor uses:
``resize_nearest`` (images) and ``segment_envelope`` (audio).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# netpbm (PGM P5 grayscale / PPM P6 RGB)
# ---------------------------------------------------------------------------


def encode_pgm(pixels: np.ndarray) -> bytes:
    """8-bit grayscale (H, W) uint8 → binary PGM (P5)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """8-bit RGB (H, W, 3) uint8 → binary PPM (P6)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _pnm_header(buf: bytes):
    """Parse the PNM magic + dims + maxval, tolerating comment lines."""
    tokens, i, n = [], 2, len(buf)
    while len(tokens) < 3 and i < n:
        ch = buf[i : i + 1]
        if ch == b"#":  # comment to end of line
            while i < n and buf[i : i + 1] != b"\n":
                i += 1
            i += 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < n and not buf[j : j + 1].isspace():
                j += 1
            tokens.append(int(buf[i:j]))
            i = j
    if len(tokens) != 3 or tokens[2] != 255:
        raise ValueError("unsupported PNM header")
    return tokens[0], tokens[1], i + 1  # w, h, data offset (skip 1 ws)


def decode_pgm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P5":
        raise ValueError("not a binary PGM")
    w, h, off = _pnm_header(payload)
    return np.frombuffer(payload, np.uint8, h * w, off).reshape(h, w)


def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM")
    w, h, off = _pnm_header(payload)
    return np.frombuffer(payload, np.uint8, h * w * 3, off).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER — the classic layout)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) RGB uint8 → 24-bit BMP (bottom-up rows, BGR order,
    rows padded to 4 bytes — the on-disk convention)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = px.shape
    assert c == 3
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes() + b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), np.uint8)
    for y in range(h):
        line = np.frombuffer(payload, np.uint8, row, data_off + y * stride)
        out[h - 1 - y if flip else y] = line.reshape(w, 3)[:, ::-1]
    return out


# ---------------------------------------------------------------------------
# PNG (8-bit grayscale / RGB)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → PNG (filter 0 rows)."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        h, w = px.shape
        ctype, nch = 0, 1
    else:
        h, w, nch = px.shape
        assert nch == 3
        ctype = 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    flat = px.reshape(h, w * nch)
    for y in range(h):
        raw += b"\x00" + flat[y].tobytes()
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode 8-bit non-interlaced grayscale/RGB PNG, all 5 filters."""
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = len(_PNG_SIG), 0
    h = ctype = 0
    idat = bytearray()
    while pos < len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in (0, 2) or ilace:
                raise ValueError("only 8-bit gray/RGB non-interlaced PNG")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    nch = 1 if ctype == 0 else 3
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:
            cur = line
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(nch, stride):
                cur[x] = (cur[x] + cur[x - nch]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = cur[x - nch] if x >= nch else 0
                ul = prev[x - nch] if x >= nch else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w) if nch == 1 else out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# WAV (PCM16) via the stdlib wave module
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 samples → mono PCM16 WAV bytes."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """WAV bytes → (int16 samples [n, channels] squeezed, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        nch = wv.getnchannels()
        if wv.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        sr = wv.getframerate()
        frames = wv.readframes(wv.getnframes())
    x = np.frombuffer(frames, np.int16)
    if nch > 1:
        x = x.reshape(-1, nch)
    return x, sr


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video, the ffmpeg/mjpegtools interchange
# format. Cmono = one 8-bit grayscale plane per frame (in the public
# spec), which keeps the codec pure stdlib/numpy.
# ---------------------------------------------------------------------------


def encode_y4m(frames: np.ndarray, fps=(25, 1)) -> bytes:
    """(T, H, W) uint8 grayscale frames → YUV4MPEG2 Cmono bytes."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w = f.shape
    head = b"YUV4MPEG2 W%d H%d F%d:%d Ip A0:0 Cmono\n" % (w, h, *fps)
    return head + b"".join(b"FRAME\n" + f[i].tobytes() for i in range(t))


def decode_y4m(payload: bytes):
    """YUV4MPEG2 Cmono bytes → ((T, H, W) uint8 frames, (fps_n, fps_d))."""
    nl = payload.index(b"\n")
    tokens = payload[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    w = h = 0
    fps = (25, 1)
    mono = False
    for tok in tokens[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            n, d = tok[1:].split(b":")
            fps = (int(n), int(d))
        elif tok[:1] == b"C":
            mono = tok == b"Cmono"
    if not mono:
        raise ValueError("only Cmono (8-bit grayscale) Y4M supported")
    frame_len = w * h
    pos, frames = nl + 1, []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)  # FRAME line (may carry params)
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        pos = fnl + 1
        frames.append(
            np.frombuffer(payload, np.uint8, frame_len, pos).reshape(h, w)
        )
        pos += frame_len
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), fps


def sample_frames(frames: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-frame sample over the time axis (the same floor
    grid as resize_nearest: index i ↦ floor(i·T/k))."""
    t = len(frames)
    if t == 0:
        raise ValueError("empty video")
    return frames[(np.arange(k) * t) // k]


# ---------------------------------------------------------------------------
# format sniffing + deterministic resamplers
# ---------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """Magic-byte format id: pgm|ppm|bmp|png|wav|unknown."""
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return "unknown"


_IMAGE_DECODERS = {
    "pgm": decode_pgm,
    "ppm": decode_ppm,
    "bmp": decode_bmp,
    "png": decode_png,
}


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode any supported image format → uint8 array
    ((H, W) grayscale or (H, W, 3) RGB)."""
    fmt = sniff_format(payload)
    dec = _IMAGE_DECODERS.get(fmt)
    if dec is None:
        raise ValueError(f"unsupported image format: {fmt}")
    return dec(payload)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """RGB → luma (ITU-R BT.601 integer weights, rounded half away —
    deterministic across platforms); grayscale passes through."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (floor sampling grid —
    source index = floor(i * in / out), the classic definition)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def segment_envelope(samples: np.ndarray, n_segments: int) -> np.ndarray:
    """Mean |amplitude| per equal time segment, normalized to [0, 1]
    (the standard fixed-dim audio envelope feature)."""
    if len(samples) == 0:
        return np.zeros(n_segments)
    x = np.abs(samples.astype(np.float64)).reshape(len(samples), -1).mean(axis=1)
    n = len(x)
    bounds = (np.arange(n_segments + 1) * n) // n_segments
    out = np.empty(n_segments)
    for i in range(n_segments):
        seg = x[bounds[i] : bounds[i + 1]]
        out[i] = seg.mean() if len(seg) else 0.0
    return out / 32768.0
