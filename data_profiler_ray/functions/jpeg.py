"""Baseline sequential-DCT JPEG codec, pure numpy (ITU-T T.81, public
spec; quality scaling per the IJG convention). Unlocks the
``stages/multimodal.py`` jpeg gate (VERDICT r3 item 8) — the reference
delegates image IO to PIL/rasterio; this is the from-spec implementation
for environments without imaging libraries.

Scope (documented): 8-bit baseline sequential DCT, grayscale or YCbCr,
subsampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart markers,
multiple DQT/DHT segments. No progressive, arithmetic coding, or 12-bit.

The encoder exists primarily to generate real compressed inputs for the
decode path (and as the write-side operator): standard Annex-K-shaped
quantization tables scaled by quality, standard Huffman tables. Decode is
driven ENTIRELY by the tables carried in the file, so encoder and decoder
do not share hidden state.

Performance note: entropy decode is a per-bit Python loop — appropriate
for the actor-pool featurize stage over thumbnail-scale payloads this
repo processes in tests; a production path would swap in a vectorized
or native entropy decoder behind the same function signature.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants ------------------------------------------------------

# zigzag scan order generated from the spec's diagonal rule (no hand
# transcription): sort raster indices by (anti-diagonal, direction)
ZIGZAG = np.array(sorted(
    range(64), key=lambda k: ((k // 8 + k % 8),
                              (k % 8) if (k // 8 + k % 8) % 2 == 0
                              else (k // 8))), dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K example quantization tables (luminance / chrominance)
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.float64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.float64)

# standard Huffman table specs (BITS counts per code length 1..16, then
# the symbol values in canonical order)
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# 8-point DCT-II basis (orthonormal): A[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


def _dct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _A.T @ coef @ _A


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)


def _canonical_codes(bits, vals):
    """(symbol → (code, length)) canonical Huffman assignment (T.81 C.2)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits, vals):
    """((length, code) → symbol) map for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., 0].astype(np.float64),
               img[..., 1].astype(np.float64),
               img[..., 2].astype(np.float64))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: bool = False) -> bytes:
    """Baseline JPEG encode of HxWx3 RGB (or HxW / HxWx1 grayscale)
    uint8. ``subsample=True`` writes 4:2:0 chroma (exercises the
    decoder's upsampling path); default 4:4:4."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    gray = nch == 1
    qt = [_scaled_qt(QT_LUM, quality), _scaled_qt(QT_CHROM, quality)]

    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        ycc = _rgb_to_ycbcr(img[:, :, :3])
        if subsample:
            # 2x2 mean downsample of chroma (pad odd dims by edge first)
            ph, pw = h + (h & 1), w + (w & 1)
            cpad = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)),
                          mode="edge")
            cb = cpad[:, :, 1].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            cr = cpad[:, :, 2].reshape(ph // 2, 2, pw // 2, 2).mean((1, 3))
            planes = [ycc[:, :, 0], cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [ycc[:, :, 0], ycc[:, :, 1], ycc[:, :, 2]]
            samp = [(1, 1), (1, 1), (1, 1)]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    # pad each plane to its own MCU-aligned size
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        tw, th = mcus_x * 8 * sh, mcus_y * 8 * sv
        padded.append(np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                             mode="edge"))

    dc_tabs = [_canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS),
               _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)]
    ac_tabs = [_canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS),
               _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)]
    tsel = [0] + [1] * (len(planes) - 1)

    bw = _BitWriter()
    pred = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                q = qt[qsel[ci]].reshape(8, 8)
                dct_t, act_t = dc_tabs[tsel[ci]], ac_tabs[tsel[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = np.round(_dct2(blk) / q).astype(np.int64)
                        zz = coef.ravel()[ZIGZAG]
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        t, bits = _magnitude(diff)
                        code, ln = dct_t[t]
                        bw.write(code, ln)
                        if t:
                            bw.write(bits, t)
                        run = 0
                        last_nz = np.flatnonzero(zz[1:])
                        end = last_nz[-1] + 2 if last_nz.size else 1
                        for k in range(1, int(end)):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = act_t[0xF0]   # ZRL
                                bw.write(code, ln)
                                run -= 16
                            t, bits = _magnitude(v)
                            code, ln = act_t[(run << 4) | t]
                            bw.write(code, ln)
                            bw.write(bits, t)
                            run = 0
                        if end < 64:
                            code, ln = act_t[0x00]       # EOB
                            bw.write(code, ln)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")                        # SOI
    for tid, q in enumerate(qt[: 1 if gray else 2]):
        body = bytes([tid]) + bytes(
            int(v) for v in q[ZIGZAG])                   # zigzag order
        out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    huff = [(0x00, _DC_LUM_BITS, _DC_LUM_VALS),
            (0x10, _AC_LUM_BITS, _AC_LUM_VALS)]
    if not gray:
        huff += [(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS),
                 (0x11, _AC_CHROM_BITS, _AC_CHROM_VALS)]
    for tc, bits, vals in huff:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, (tsel[ci] << 4) | tsel[ci]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan + b"\xff\xd9"                            # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops cleanly
    at any non-RST marker."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:     # RST handled by caller via align
                return False
            else:
                return False              # real marker: end of scan data
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("jpeg: truncated entropy segment")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0
        self.acc = 0
        if (self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise ValueError("jpeg: expected restart marker")


def _huff_decode(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential-DCT JPEG → HxWx3 uint8 RGB (grayscale
    replicated to 3 channels). Raises ValueError on non-baseline OR
    malformed files — truncated entropy segments, undeclared table ids and
    short marker bodies all surface as ValueError so actor-pool callers
    (``stages/multimodal.py``) can catch one exception type uniformly."""
    try:
        return _decode_jpeg(payload)
    except ValueError:
        raise
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"jpeg: malformed payload ({e!r})") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    scan_sel = None
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                      # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                      # DQT (possibly several)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise ValueError("jpeg: 16-bit quant not baseline")
                q = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8
                                  ).astype(np.float64)
                tbl = np.empty(64)
                tbl[ZIGZAG] = q                 # stored in zigzag order
                qts[tid] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                    # DHT (possibly several)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17:i + 17 + nvals])
                tab = _decode_table(bits, vals)
                (ac_tabs if tc else dc_tabs)[th] = tab
                i += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            if body[0] != 8:
                raise ValueError("jpeg: only 8-bit precision")
            h, w = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential DCT supported")
        elif marker == 0xDD:                    # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:                    # SOS — entropy data follows
            ns = body[0]
            scan_sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_sel.append((cs, tt >> 4, tt & 0x0F))
            break
    if comps is None or scan_sel is None:
        raise ValueError("jpeg: missing SOF/SOS")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        c = by_id[cs]
        c["td"], c["ta"] = td, ta
        order.append(c)
    planes = [np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]))
              for c in order]

    br = _BitReader(payload, pos)
    pred = [0] * len(order)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_restart()
                pred = [0] * len(order)
            mcu_count += 1
            for ci, c in enumerate(order):
                q = qts[c["tq"]]
                dct_t, act_t = dc_tabs[c["td"]], ac_tabs[c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        t = _huff_decode(br, dct_t)
                        diff = _extend(br.bits(t), t) if t else 0
                        pred[ci] += diff
                        zz = np.zeros(64)
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(br, act_t)
                            if sym == 0x00:     # EOB
                                break
                            run, t = sym >> 4, sym & 0x0F
                            if t == 0:
                                if run != 15:
                                    raise ValueError("jpeg: bad AC symbol")
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC overflow")
                            zz[k] = _extend(br.bits(t), t)
                            k += 1
                        coef = np.empty(64)
                        coef[ZIGZAG] = zz       # undo zigzag
                        blk = _idct2(coef.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    full = []
    for c, p in zip(order, planes):
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
