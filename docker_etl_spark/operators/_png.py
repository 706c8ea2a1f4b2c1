"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal
decode seam.

The container ships no image library, but the multimodal kernels
(`operators/multimodal.py`) should still be CAPABILITY-tested — a real
byte payload decoded to real pixels — not only contract-tested against
a digest stub. PNG is the one raster format simple enough to decode
correctly in ~150 lines of stdlib: chunked container (struct), DEFLATE
image data (zlib), five per-scanline predictive filters.

Scope (deliberately narrow — the production fast path is PIL when
present): 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace. Anything else raises ``PngFormatError`` so the
caller's dispatch can fall back rather than mis-decode.

Reference parity note: the reference pipelines treat media as opaque
bytes plus metadata (see SURVEY.md §2 multimodal row); the decode
kernel itself is beyond the reference and exists for the
training-data-pipeline operator family.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Payload is not a PNG this codec supports."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to an (H, W, C) uint8 array.

    Supports bit depth 8, color types {0, 2, 4, 6}, interlace 0.
    Raises :class:`PngFormatError` on anything else (including a
    missing signature) — callers dispatch on the exception, they never
    get silently-wrong pixels.
    """
    if len(data) < 8 or data[:8] != PNG_MAGIC:
        raise PngFormatError("missing PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngFormatError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width < 0 or not idat:
        raise PngFormatError("missing IHDR or IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt stream
        raise PngFormatError(f"bad IDAT deflate stream: {e}") from e

    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise PngFormatError("decompressed size mismatch")
    bpp = channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
        prev = line
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W, C) or (H, W) uint8 array as a PNG byte string.

    ``filter_type`` selects the per-scanline predictive filter (0-4,
    uniform across rows); round-tripping through every value exercises
    all of the decoder's reconstruction arms.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color is None:
        raise PngFormatError(f"unsupported channel count {c}")
    if not 0 <= filter_type <= 4:
        raise PngFormatError(f"unknown filter type {filter_type}")

    bpp = c
    stride = w * c
    flat = a.reshape(h, stride)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        line = flat[y].astype(np.int16)
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), line[:-bpp]])
        if filter_type == 0:
            enc = line
        elif filter_type == 1:
            enc = line - left
        elif filter_type == 2:
            enc = line - prev
        elif filter_type == 3:
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            ul = np.concatenate([np.zeros(bpp, dtype=np.int16), prev[:-bpp]])
            pred = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                pred[i] = _paeth(int(left[i]), int(prev[i]), int(ul[i]))
            enc = line - pred
        raw.append(filter_type)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def mean_luma(arr: np.ndarray) -> float:
    """Mean luminance of a decoded array: Rec. 601 weights for color
    (alpha ignored), plain mean for grayscale."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2 or a.shape[2] == 1:
        return float(a.mean())
    if a.shape[2] == 2:  # gray + alpha
        return float(a[:, :, 0].mean())
    rgb = a[:, :, :3]
    return float(
        (rgb[:, :, 0] * 0.299 + rgb[:, :, 1] * 0.587 + rgb[:, :, 2] * 0.114).mean()
    )
