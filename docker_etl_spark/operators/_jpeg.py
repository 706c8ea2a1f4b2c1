"""Minimal pure-stdlib baseline-JFIF (JPEG) codec for the multimodal
decode seam — the sibling of :mod:`docker_etl_spark.operators._png`.

The container ships no image library, but JPEG is the dominant crawl
format, so the multimodal kernels should decode it for REAL when the
payload allows: baseline sequential DCT (SOF0), Huffman entropy coding
(DHT), 8-bit precision, 1- or 3-component scans, any sampling factors
(2x2/2x1/1x1 chroma subsampling), restart markers. Everything else —
progressive (SOF2), arithmetic coding, 12-bit, CMYK — raises
``JpegFormatError`` so the caller's dispatch falls back to the stub
rather than mis-decoding.

The encoder exists for round-trip testing (4:4:4, Annex K quantization
scaled by a quality knob, Annex K Huffman tables); production
re-encoding is PIL's job when present.

All table data (zigzag order, Annex K quantization and Huffman
specs) is from the public JPEG standard (ITU-T T.81). Reference
parity note: the reference treats media as opaque bytes (SURVEY.md §2
multimodal row); this kernel is part of the beyond-reference
training-data operator family.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"


class JpegFormatError(ValueError):
    """Payload is not a JPEG this codec supports."""


# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# Orthonormal 8-point DCT-II basis: C[k, n] = c_k/2 * cos((2n+1)kπ/16).
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _ck = (0.5 ** 0.5) if _k == 0 else 1.0
        _C[_k, _n] = 0.5 * _ck * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _Huff:
    """Canonical Huffman table from a DHT (bits, values) spec."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        idx = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[idx]
                idx += 1
                code += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code")


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    un-stuffing and restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            # Past a marker: the standard pads with 1-bits.
            self.buf = (self.buf << 8) | 0xFF
            self.nbits += 8
            return
        if self.pos + 1 >= len(self.data):
            raise JpegFormatError("truncated entropy data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed literal FF
            else:
                self.marker = nxt
                self.pos += 1
                self.buf = (self.buf << 8) | 0xFF
                self.nbits += 8
                return
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet reached while draining padded bits; scan ahead
            while self.pos + 1 < len(self.data) and (
                self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00
            ):
                self.pos += 1
            if self.pos + 1 >= len(self.data):
                raise JpegFormatError("truncated before restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise JpegFormatError(f"expected RSTn, found {self.marker:#x}")
        self.marker = None


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decoding (T.81 F.2.2.1 EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF byte string to an (H, W, C) uint8 array
    (C = 3 RGB for YCbCr scans, 1 for grayscale).

    Raises :class:`JpegFormatError` on unsupported variants
    (progressive, arithmetic, 12-bit, >3 components) — callers
    dispatch on the exception and never get silently-wrong pixels.
    """
    if len(data) < 4 or data[:2] != JPEG_MAGIC:
        raise JpegFormatError("missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise JpegFormatError("truncated segment body")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.float64
                    )
                    p += 64
                else:
                    vals = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.float64)
                    p += 128
                q = np.zeros((8, 8))
                for k, (r, c) in enumerate(_ZZ):
                    q[r, c] = vals[k]
                qt[tq] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegFormatError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise JpegFormatError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(f"unsupported SOF marker {marker:#x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tables = seg[1 + 2 * i : 3 + 2 * i]
                scan[cs] = (tables >> 4, tables & 0xF)
            return _decode_scan(
                data, pos + seglen, frame, scan, qt, huff, restart_interval
            )
        pos += seglen
    raise JpegFormatError("no SOS scan found")


def _decode_scan(data, pos, frame, scan, qt, huff, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
    ]
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_t, ac_t = scan[comp["id"]]
                dc_h = huff.get((0, dc_t))
                ac_h = huff.get((1, ac_t))
                if dc_h is None or ac_h is None:
                    raise JpegFormatError("missing Huffman table")
                q = qt.get(comp["tq"])
                if q is None:
                    raise JpegFormatError("missing quantization table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = np.zeros((8, 8))
                        t = dc_h.decode(reader)
                        diff = _extend(reader.bits(t), t)
                        preds[ci] += diff
                        block[0, 0] = preds[ci]
                        k = 0
                        while k < 63:
                            rs = ac_h.decode(reader)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r + 1
                            if k > 63:
                                raise JpegFormatError("AC index overflow")
                            rr, cc = _ZZ[k]
                            block[rr, cc] = _extend(reader.bits(s), s)
                        pix = _idct2(block * q)
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            n_mcu += 1
    # Upsample each plane to full frame resolution (nearest neighbour).
    out_planes = []
    for comp, plane in zip(comps, planes):
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w] + 128.0)
    if len(out_planes) == 1:
        gray = np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (tests / round-trip capability): baseline, 4:4:4, Annex K.
# ---------------------------------------------------------------------------

# Annex K quantization tables (luminance, chrominance), natural order.
_QY = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)
_QC = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# Annex K Huffman specs: (counts per length 1..16, symbols).
_DC_Y_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_C_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_Y_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes([
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_AC_C_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes([
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
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _encode_table(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a (counts, symbols) spec."""
    counts, symbols = spec
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DIFF/AC value."""
    v = int(v)
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    raw = v if v > 0 else v + (1 << t) - 1
    return t, raw


def _encode_block(bw, tile, qtab, dc_tab, ac_tab, pred):
    """FDCT + quantize + entropy-encode one 8x8 tile; returns the new
    DC predictor."""
    blk = np.full((8, 8), 128.0)
    blk[: tile.shape[0], : tile.shape[1]] = tile
    qz = np.rint(_fdct2(blk - 128.0) / qtab).astype(int)
    zz = [qz[r, c] for r, c in _ZZ]
    diff = zz[0] - pred
    t, raw = _magnitude(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(raw, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        t, raw = _magnitude(zz[k])
        code, ln = ac_tab[(run << 4) | t]
        bw.write(code, ln)
        bw.write(raw, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return zz[0]


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (H, W, 1|3) uint8 array as baseline JFIF.

    Annex K tables scaled by ``quality`` (libjpeg's scaling curve);
    ``subsampling`` "444" or "420" (2x2 chroma averaging);
    ``restart_interval`` emits DRI/RSTn every N MCUs. Exists for the
    round-trip capability tests (including the decoder's interleaved-
    MCU upsample and restart paths); production re-encoding belongs to
    PIL when importable.
    """
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if nch not in (1, 3):
        raise JpegFormatError(f"unsupported channel count {nch}")
    if subsampling not in ("444", "420"):
        raise JpegFormatError(f"unsupported subsampling {subsampling}")
    sub = subsampling == "420" and nch == 3
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    qy = np.clip(np.floor((_QY * scale + 50) / 100), 1, 255)
    qc = np.clip(np.floor((_QC * scale + 50) / 100), 1, 255)
    a = arr.astype(np.float64)
    if nch == 3:
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        if sub:
            # edge-replicate to even dims, then 2x2 block mean — so
            # odd images keep their last chroma row/column (ceil, not
            # floor: truncating leaves the decoder upsampling from a
            # zero block at the edge)
            for i in (1, 2):
                p = planes[i]
                if p.shape[0] % 2:
                    p = np.vstack([p, p[-1:]])
                if p.shape[1] % 2:
                    p = np.hstack([p, p[:, -1:]])
                planes[i] = p.reshape(
                    p.shape[0] // 2, 2, p.shape[1] // 2, 2
                ).mean(axis=(1, 3))
        qtabs = [qy, qc, qc]
        tsel = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    else:
        planes = [a[:, :, 0]]
        qtabs = [qy]
        tsel = [0]
        samp = [(1, 1)]

    dc_enc = [_encode_table(_DC_Y_SPEC), _encode_table(_DC_C_SPEC)]
    ac_enc = [_encode_table(_AC_Y_SPEC), _encode_table(_AC_C_SPEC)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    bw = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, plane in enumerate(planes):
                ch, cv = samp[ci]
                for by in range(cv):
                    for bx in range(ch):
                        ys = (my * cv + by) * 8
                        xs = (mx * ch + bx) * 8
                        tile = plane[ys : ys + 8, xs : xs + 8]
                        preds[ci] = _encode_block(
                            bw, tile, qtabs[ci],
                            dc_enc[tsel[ci]], ac_enc[tsel[ci]], preds[ci],
                        )
            n_mcu += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(
            0xDB,
            bytes([tid]) + bytes(int(q[r, c]) for r, c in _ZZ),
        )

    def dht(tc: int, th: int, spec) -> bytes:
        counts, symbols = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts) + symbols)

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qy)
    if nch == 3:
        out += dqt(1, qc)
    comp_spec = b"".join(
        bytes([i + 1, (samp[i][0] << 4) | samp[i][1], tsel[i]])
        for i in range(len(planes))
    )
    out += seg(0xC0, struct.pack(">BHHB", 8, h, w, len(planes)) + comp_spec)
    out += dht(0, 0, _DC_Y_SPEC)
    out += dht(1, 0, _AC_Y_SPEC)
    if nch == 3:
        out += dht(0, 1, _DC_C_SPEC)
        out += dht(1, 1, _AC_C_SPEC)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos_comps = b"".join(
        bytes([i + 1, (tsel[i] << 4) | tsel[i]]) for i in range(len(planes))
    )
    out += seg(0xDA, bytes([len(planes)]) + sos_comps + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
