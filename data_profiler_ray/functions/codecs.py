"""Pure-numpy media codecs: uncompressed 24-bit BMP and PCM-16 WAV.

Both formats are simple public byte layouts (BITMAPFILEHEADER /
BITMAPINFOHEADER; RIFF/fmt/data), decodable with struct + numpy alone — so
the multimodal pipeline's decode step is REAL for them in this
library-free container. Formats that genuinely need external codecs
(png/jpeg/mp4) stay behind the explicit ``NotImplementedError`` gate in
``stages/multimodal.py``.

Everything is vectorized: row de-padding via reshape/slicing, features via
numpy reductions / rFFT. No per-pixel or per-sample Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up, BGR, 4-byte row padding)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → BMP bytes."""
    h, w, c = img.shape
    assert c == 3
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    row_bytes = row_raw + pad
    data_size = row_bytes * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    # bottom-up rows, BGR order, padded to 4 bytes
    bgr = img[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :row_raw] = bgr.reshape(h, row_raw)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB. Supports the 24-bit uncompressed
    BITMAPINFOHEADER layout (top-down negative heights included)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    h = abs(h_signed)
    row_raw = w * 3
    row_bytes = row_raw + (4 - row_raw % 4) % 4
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=row_bytes * h, offset=off)
    rows = data.reshape(h, row_bytes)[:, :row_raw]
    bgr = rows.reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Fixed-dim image descriptor: per-channel mean/std (scaled to [0,1]),
    8-bin luminance histogram, aspect + log-area."""
    f = img.astype(np.float64) / 255.0
    means = f.mean(axis=(0, 1))
    stds = f.std(axis=(0, 1))
    luma = f @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    hist = hist / max(luma.size, 1)
    h, w = img.shape[:2]
    extra = np.array([w / max(h, 1), np.log1p(h * w) / 20.0])
    out = np.concatenate([means, stds, hist, extra])
    return _fit_dim(out, dim)


# ---------------------------------------------------------------------------
# PNG (pure stdlib-zlib implementation of the public spec: chunk framing,
# IHDR/IDAT/IEND, scanline filters 0-4). 8-bit gray / RGB / RGBA,
# non-interlaced. Filters None/Sub/Up unfilter vectorized (Sub via
# per-byte-lane cumsum mod 256); Average/Paeth fall back to a per-pixel
# loop (our encoder never emits them, but foreign PNGs may).

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) gray, (h, w, 3) RGB or (h, w, 4) RGBA uint8 → PNG bytes
    (filter 0 scanlines, one zlib IDAT)."""
    import zlib
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.zeros((h, 1 + w * c), dtype=np.uint8)
    raw[:, 1:] = a.reshape(h, w * c)  # leading 0 = filter type None
    idat = zlib.compress(raw.tobytes(), 6)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _unfilter_sub(row: np.ndarray, bpp: int) -> np.ndarray:
    # recon[x] = filt[x] + recon[x-bpp]: per byte-lane cumulative sum mod 256
    lanes = row[: (row.size // bpp) * bpp].reshape(-1, bpp)
    return np.cumsum(lanes.astype(np.int64), axis=0).astype(
        np.uint8).reshape(-1)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8 (gray returns (h, w, 1)).

    Supports bit depth 8, color types 0/2/6, interlace 0 — the layouts
    ``encode_png`` produces plus Up/Average/Paeth-filtered foreign files."""
    import zlib
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = len(_PNG_SIG)
    idat = bytearray()
    w = h = None
    color_type = bit_depth = interlace = None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8: pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + crc
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})")
    c = _PNG_CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, row = int(filters[y]), data[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:
            rec = _unfilter_sub(row, c)
        elif f == 2:
            rec = (row.astype(np.int64) + prev).astype(np.uint8)
        elif f in (3, 4):
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(rec[x - c]) if x >= c else 0
                up = int(prev[x])
                if f == 3:
                    pred = (left + up) // 2
                else:
                    ul = int(prev[x - c]) if x >= c else 0
                    p = left + up - ul
                    pa_, pb, pcd = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa_ <= pb and pa_ <= pcd else (
                        up if pb <= pcd else ul)
                rec[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w, c)


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM 16-bit mono/stereo)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples (n,) or (n, ch) → WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()
    byte_rate = rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, byte_rate,
                      ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data),
                      b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 mono samples in [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, ch, bits = 12, None, 1, 16
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM16 only)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)
    if data is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    s = np.frombuffer(data, dtype=np.int16).astype(np.float64) / 32768.0
    if ch > 1:
        s = s[: (s.size // ch) * ch].reshape(-1, ch).mean(axis=1)
    return s, int(rate)


def audio_features(samples: np.ndarray, rate: int, dim: int = 16
                   ) -> np.ndarray:
    """Fixed-dim audio descriptor: RMS, zero-crossing rate, spectral
    centroid/rolloff (normalized), 8 octave-ish band energies, log-duration."""
    x = np.asarray(samples, dtype=np.float64)
    n = x.size
    if n == 0:
        return np.zeros(dim)
    rms = float(np.sqrt(np.mean(x * x)))
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 \
        else 0.0
    spec = np.abs(np.fft.rfft(x))
    power = spec * spec
    total = power.sum() or 1.0
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    centroid = float((freqs * power).sum() / total) / (rate / 2.0)
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))]) \
        / (rate / 2.0)
    # 8 geometric bands up to Nyquist
    edges = np.geomspace(max(rate / 512.0, 1.0), rate / 2.0, 9)
    idx = np.searchsorted(freqs, edges)
    bands = np.add.reduceat(power, np.clip(idx[:-1], 0, power.size - 1))
    bands = bands[:8] / total
    out = np.concatenate([[rms, zcr, centroid, rolloff],
                          _fit_dim(bands, 8),
                          [np.log1p(n / rate) / 10.0]])
    return _fit_dim(out, dim)


def _fit_dim(v: np.ndarray, dim: int) -> np.ndarray:
    if v.size >= dim:
        return v[:dim]
    return np.concatenate([v, np.zeros(dim - v.size)])
