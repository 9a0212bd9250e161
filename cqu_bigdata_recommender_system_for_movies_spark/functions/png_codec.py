"""Minimal pure-Python PNG codec (stdlib zlib/struct + numpy only).

Completes SURVEY.md S8: the reference actually decodes images into pixel
vectors for training (reference test/horovod_test.py:76-91 reads
``format("image")`` MNIST and trains on the decoded pixels), and this
container ships no imaging library — so the engine carries its own decoder
for the one format the pure stdlib can handle end-to-end: PNG (magic
signature, chunk/CRC framing, IHDR, concatenated IDAT zlib stream, and all
five scanline filters from the PNG spec §6). Supported: 8-bit depth,
greyscale (color type 0) and truecolor RGB (color type 2), non-interlaced —
the MNIST-class of images the reference consumed. Anything else (JPEG,
16-bit, palette, Adam7) raises cleanly; a full deployment swaps PIL into
``operators/multimodal.decode_image_real`` and keeps the same Spark plan.

The encoder exists to stage deterministic fixture images (and deliberately
rotates through ALL five filter types row by row, so decoding the staged
corpus proves the whole unfilter path, not just filter 0).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_FILTER_NONE, _FILTER_SUB, _FILTER_UP, _FILTER_AVG, _FILTER_PAETH = range(5)


def _paeth(a: int, b: int, c: int) -> int:
    """PNG spec §6.6 predictor: whichever of left/up/up-left is closest to
    a + b - c, ties broken left, then up."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ft: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward filter one scanline (encoder side); row/prev are uint8."""
    n = len(row)
    r = row.astype(np.int32)
    pv = prev.astype(np.int32)
    out = np.zeros(n, dtype=np.int32)
    for i in range(n):
        a = r[i - bpp] if i >= bpp else 0  # left
        b = pv[i]  # up
        c = pv[i - bpp] if i >= bpp else 0  # up-left
        if ft == _FILTER_NONE:
            pred = 0
        elif ft == _FILTER_SUB:
            pred = a
        elif ft == _FILTER_UP:
            pred = b
        elif ft == _FILTER_AVG:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (r[i] - pred) % 256
    return out.astype(np.uint8).tobytes()


def _unfilter_row(
    ft: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Reverse one scanline filter (decoder side). Sub/Avg/Paeth carry a
    sequential left-dependency, so the loop is per byte — fine for the
    fixture sizes this decoder exists for."""
    if ft == _FILTER_NONE:
        return line.copy()
    if ft == _FILTER_UP:
        return (line.astype(np.int32) + prev.astype(np.int32)).astype(np.uint8)
    n = len(line)
    out = np.zeros(n, dtype=np.int32)
    ln = line.astype(np.int32)
    pv = prev.astype(np.int32)
    for i in range(n):
        a = out[i - bpp] if i >= bpp else 0
        b = pv[i]
        c = pv[i - bpp] if i >= bpp else 0
        if ft == _FILTER_SUB:
            pred = a
        elif ft == _FILTER_AVG:
            pred = (a + b) // 2
        elif ft == _FILTER_PAETH:
            pred = _paeth(a, b, c)
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[i] = (ln[i] + pred) % 256
    return out.astype(np.uint8)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an (h, w) greyscale or (h, w, 3) RGB uint8 array. Rows rotate
    through filter types 0-4 so fixture corpora exercise every unfilter."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    if ch not in (1, 3):
        raise ValueError(f"encode_png supports 1 or 3 channels, got {ch}")
    color_type = 0 if ch == 1 else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        row = arr[r].reshape(-1)
        ft = r % 5
        raw.append(ft)
        raw.extend(_filter_row(ft, row, prev, ch))
        prev = row
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to an (h, w, channels) uint8 array. Verifies the magic
    signature and every chunk CRC; supports 8-bit grey/RGB non-interlaced."""
    if bytes(data[:8]) != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + ln])
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2) or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}): this decoder covers 8-bit grey/RGB "
            "non-interlaced; plug PIL into decode_image_real for the rest"
        )
    ch = 1 if ctype == 0 else 3
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(h):
        ft = raw[pos]
        line = np.frombuffer(raw[pos + 1 : pos + 1 + stride], dtype=np.uint8)
        out[r] = _unfilter_row(ft, line, prev, ch)
        prev = out[r]
        pos += 1 + stride
    return out.reshape(h, w, ch)
