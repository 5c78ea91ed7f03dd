"""Minimal PNG codec on stdlib zlib + numpy (no PIL in this container).

Encodes/decodes real, spec-conformant PNGs (8-bit gray / RGB / RGBA,
optional pHYs DPI chunk) so the image filter chain operates on genuine
bytes: magic sniffing, dimension/mode/DPI parsing and pixel decode are
all real work, matching what the reference does through PIL
(filtering_module.py:285, advanced_formats.py:76-119).  Decode handles
all five PNG scanline filters; encode uses filter 0.

Format reference: the public PNG specification (RFC 2083 / W3C).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_METER_PER_INCH = 0.0254


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, dpi: tuple[int, int] | None = None) -> bytes:
    """pixels: (H,W) gray, (H,W,3) RGB or (H,W,4) RGBA uint8."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {arr.shape}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = arr.reshape(h, w * channels)
    # filter byte 0 per scanline
    stream = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1
    ).tobytes()
    out = [PNG_MAGIC, _chunk(b"IHDR", ihdr)]
    if dpi is not None:
        ppm_x = int(round(dpi[0] / _METER_PER_INCH))
        ppm_y = int(round(dpi[1] / _METER_PER_INCH))
        out.append(_chunk(b"pHYs", struct.pack(">IIB", ppm_x, ppm_y, 1)))
    out.append(_chunk(b"IDAT", zlib.compress(stream, 1)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


class PngInfo:
    __slots__ = ("width", "height", "bit_depth", "color_type", "dpi")

    def __init__(self, width, height, bit_depth, color_type, dpi):
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.color_type = color_type
        self.dpi = dpi

    @property
    def mode(self) -> str:
        """PIL-style mode string (the reference filters on img.mode 'L',
        filtering_module.py:392-402)."""
        return {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}.get(
            self.color_type, "?"
        )

    @property
    def channels(self) -> int:
        return {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[self.color_type]


def _iter_chunks(data: bytes):
    pos = len(PNG_MAGIC)
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        yield tag, payload
        pos += 12 + length
        if tag == b"IEND":
            break


def parse_png_info(data: bytes) -> PngInfo:
    """Header-only parse: dimensions, mode, DPI — no pixel decode."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG")
    width = height = bit_depth = color_type = None
    dpi = None
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", payload[:10]
            )
        elif tag == b"pHYs":
            ppm_x, ppm_y, unit = struct.unpack(">IIB", payload)
            if unit == 1:
                dpi = (
                    round(ppm_x * _METER_PER_INCH),
                    round(ppm_y * _METER_PER_INCH),
                )
        elif tag == b"IDAT":
            break
    if width is None:
        raise ValueError("no IHDR")
    return PngInfo(width, height, bit_depth, color_type, dpi)


def _unfilter(stream: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    rowlen = w * ch
    stream = stream.reshape(h, rowlen + 1)
    ftypes = stream[:, 0]
    if not ftypes.any():
        # every scanline filter-0 (what encode_png writes): the
        # unfiltered data IS the payload — one contiguous slice copy,
        # no int32 conversion or per-row loop
        return np.ascontiguousarray(stream[:, 1:])
    data = stream[:, 1:].astype(np.int32)
    out = np.zeros((h, rowlen), dtype=np.int32)
    for y in range(h):
        f = ftypes[y]
        row = data[y]
        prev = out[y - 1] if y else np.zeros(rowlen, dtype=np.int32)
        if f == 0:
            out[y] = row
        elif f == 2:  # Up
            out[y] = (row + prev) & 0xFF
        else:  # Sub / Average / Paeth need left-neighbor recurrence
            cur = out[y]
            for x in range(rowlen):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    v = row[x] + a
                elif f == 3:
                    v = row[x] + ((a + b) >> 1)
                else:  # Paeth
                    c = prev[x - ch] if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = row[x] + pr
                cur[x] = v & 0xFF
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """→ (H,W) or (H,W,C) uint8 pixel array."""
    info = parse_png_info(data)
    if info.bit_depth != 8 or info.color_type not in (0, 2, 6):
        raise ValueError("only 8-bit gray/RGB/RGBA supported")
    idat = b"".join(p for t, p in _iter_chunks(data) if t == b"IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    ch = info.channels
    px = _unfilter(raw, info.height, info.width, ch)
    if ch == 1:
        return px.reshape(info.height, info.width)
    return px.reshape(info.height, info.width, ch)
