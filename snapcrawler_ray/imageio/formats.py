"""Image container encode/parse without image libraries.

PNG and BMP are full real codecs (png.py / here).  JPEG, GIF and WebP
get spec-conformant *headers* (SOI/APP0-JFIF/SOF0, GIF89a logical
screen, RIFF/VP8X) whose dimensions/DPI/mode parse with real parsers —
but no entropy-coded pixel payload: this container has no libjpeg/
libwebp, so pixel content for those formats is carried as a
deterministic generator seed in a legal ancillary segment (JPEG COM /
GIF comment / RIFF 'META' chunk).  ``decode_pixels`` regenerates the
pixels from that seed — a clearly-documented sandbox stand-in for a
real decoder; identical pixels ⇒ identical seed ⇒ identical pHash, so
dedup semantics are preserved.  SVG is handled in svg.py (M16).
"""

from __future__ import annotations

import struct

import numpy as np

from .png import decode_png, encode_png, parse_png_info

SEED_TAG = b"SNAPSEED:"


class ImageInfo:
    __slots__ = ("format", "width", "height", "mode", "dpi", "seed")

    def __init__(self, format, width, height, mode, dpi=None, seed=None):
        self.format = format
        self.width = width
        self.height = height
        self.mode = mode
        self.dpi = dpi
        self.seed = seed

    @property
    def size(self):
        return (self.width, self.height)


def gen_pixels(seed: int, width: int, height: int, mode: str) -> np.ndarray:
    """Deterministic smooth low-frequency pattern from a seed: distinct
    DCT signature per seed (pHash separates seeds, matches equal ones)
    while staying locally smooth so clean images never trip the
    watermark texture heuristic."""
    rng = np.random.RandomState(seed % (2**32))
    fx, fy = rng.uniform(0.5, 3.0, 2)
    px_, py_ = rng.uniform(0, 2 * np.pi, 2)
    gx, gy = rng.uniform(-60, 60, 2)
    # separable evaluation: the field is sin(row-term)·cos(col-term) +
    # linear ramps, so the transcendentals run on 1-D axes and broadcast
    # (bit-identical to the full-grid formula, ~5× less work)
    u = np.arange(width, dtype=np.float64) / max(1, width)
    v = np.arange(height, dtype=np.float64) / max(1, height)
    sin_u = np.sin(2 * np.pi * fx * u + px_)
    cos_v = np.cos(2 * np.pi * fy * v + py_)
    # in-place accumulation preserving the original op order
    # ((127 + (55·sin)·cos) + rampx) + rampy — bit-identical with one
    # full-size temporary instead of four
    g = (55 * sin_u)[None, :] * cos_v[:, None]
    g += 127
    g += (gx * u)[None, :]
    g += (gy * v)[:, None]
    np.clip(g, 0, 255, out=g)
    g = g.astype(np.uint8)
    if mode == "L":
        return g
    # channel maps precomputed as 256-entry LUTs (bit-identical to the
    # original per-pixel float formulas)
    rgb = np.stack([g, _LUT_G[g], _LUT_B[g]], axis=-1)
    return rgb


_LUT_SRC = np.arange(256, dtype=np.float64)
_LUT_G = np.clip(_LUT_SRC * 0.8 + 20, 0, 255).astype(np.uint8)
_LUT_B = np.clip(255 - _LUT_SRC * 0.5, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------- JPEG

def encode_jpeg_stub(width: int, height: int, mode: str, seed: int,
                     dpi: tuple[int, int] | None = None) -> bytes:
    ncomp = 1 if mode == "L" else 3
    units = 1 if dpi else 0
    xd, yd = (dpi if dpi else (72, 72))
    app0 = b"JFIF\x00" + bytes([1, 1, units]) + struct.pack(">HH", xd, yd) + b"\x00\x00"
    com = SEED_TAG + struct.pack(">Q", seed)
    sof_comps = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(ncomp)
    )
    sof0 = struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps
    out = [
        b"\xff\xd8",
        b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0,
        b"\xff\xfe" + struct.pack(">H", len(com) + 2) + com,
        b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0,
        b"\xff\xd9",
    ]
    return b"".join(out)


def parse_jpeg_info(data: bytes) -> ImageInfo:
    if not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    width = height = None
    mode = "RGB"
    dpi = None
    seed = None
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xE0 and seg.startswith(b"JFIF\x00"):
            units = seg[7]
            xd, yd = struct.unpack_from(">HH", seg, 8)
            if units == 1:
                dpi = (xd, yd)
        elif marker == 0xFE and seg.startswith(SEED_TAG):
            (seed,) = struct.unpack_from(">Q", seg, len(SEED_TAG))
        elif marker in (0xC0, 0xC1, 0xC2):
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", seg, 0)
            mode = "L" if ncomp == 1 else "RGB"
        pos += 2 + seglen
    if width is None:
        raise ValueError("no SOF marker")
    return ImageInfo("jpeg", width, height, mode, dpi, seed)


# ----------------------------------------------------------------- GIF

def encode_gif_stub(width: int, height: int, seed: int) -> bytes:
    com = SEED_TAG + struct.pack(">Q", seed)
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + b"\x70\x00\x00"  # flags (no GCT), bg, aspect
        + b"\x21\xfe" + bytes([len(com)]) + com + b"\x00"
        + b"\x3b"
    )


def parse_gif_info(data: bytes) -> ImageInfo:
    if not data[:6] in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    width, height = struct.unpack_from("<HH", data, 6)
    seed = None
    i = data.find(SEED_TAG)
    if i >= 0:
        (seed,) = struct.unpack_from(">Q", data, i + len(SEED_TAG))
    return ImageInfo("gif", width, height, "P", None, seed)


# ---------------------------------------------------------------- WebP

def encode_webp_stub(width: int, height: int, mode: str, seed: int) -> bytes:
    vp8x = bytes([0, 0, 0, 0]) + struct.pack("<I", width - 1)[:3] + struct.pack(
        "<I", height - 1
    )[:3]
    meta = SEED_TAG + struct.pack(">Q", seed) + (b"L" if mode == "L" else b"C")
    if len(meta) % 2:
        meta += b"\x00"
    chunks = (
        b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
        + b"META" + struct.pack("<I", len(meta)) + meta
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks


def parse_webp_info(data: bytes) -> ImageInfo:
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP")
    pos = 12
    width = height = None
    mode = "RGB"
    seed = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"VP8X":
            width = 1 + int.from_bytes(payload[4:7], "little")
            height = 1 + int.from_bytes(payload[7:10], "little")
        elif tag == b"META" and payload.startswith(SEED_TAG):
            (seed,) = struct.unpack_from(">Q", payload, len(SEED_TAG))
            mode = "L" if payload[len(SEED_TAG) + 8 : len(SEED_TAG) + 9] == b"L" else "RGB"
        pos += 8 + ln + (ln & 1)
    if width is None:
        raise ValueError("no VP8X chunk")
    return ImageInfo("webp", width, height, mode, None, seed)


# ----------------------------------------------------------------- BMP

def encode_bmp(pixels: np.ndarray, dpi: tuple[int, int] | None = None) -> bytes:
    """Real 24-bit uncompressed BMP (grayscale input is expanded)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    h, w = arr.shape[:2]
    bgr = arr[..., ::-1]
    rowlen = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, rowlen), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    body = rows[::-1].tobytes()  # bottom-up
    ppm = (
        int(round(dpi[0] / 0.0254)) if dpi else 2835,
        int(round(dpi[1] / 0.0254)) if dpi else 2835,
    )
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), ppm[0], ppm[1], 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def parse_bmp_info(data: bytes) -> ImageInfo:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    _sz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    xppm, yppm = struct.unpack_from("<ii", data, 38)
    dpi = None
    if xppm > 0:
        dpi = (round(xppm * 0.0254), round(yppm * 0.0254))
    return ImageInfo("bmp", w, abs(h), "RGB", dpi, None)


def decode_bmp(data: bytes) -> np.ndarray:
    info = parse_bmp_info(data)
    (offset,) = struct.unpack_from("<I", data, 10)
    w, h = info.width, info.height
    rowlen = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(data, dtype=np.uint8, count=h * rowlen, offset=offset)
    rows = raw.reshape(h, rowlen)[::-1]
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[..., ::-1].copy()


# ------------------------------------------------------------ dispatch

def parse_info(data: bytes, url: str = "") -> ImageInfo:
    from .sniff import detect_format
    from .svg import parse_svg_info

    fmt = detect_format(data, url)
    if fmt == "png":
        pi = parse_png_info(data)
        return ImageInfo("png", pi.width, pi.height, pi.mode, pi.dpi, None)
    if fmt == "jpeg":
        return parse_jpeg_info(data)
    if fmt == "gif":
        return parse_gif_info(data)
    if fmt == "webp":
        return parse_webp_info(data)
    if fmt == "bmp":
        return parse_bmp_info(data)
    if fmt == "svg":
        return parse_svg_info(data)
    raise ValueError(f"unsupported format {fmt!r} for {url}")


def decode_pixels(data: bytes, info: ImageInfo | None = None, url: str = "") -> np.ndarray:
    """Pixels for pixel-level filters (pHash, watermark, quality).

    PNG/BMP decode for real; seed-stub formats regenerate from their
    embedded seed (see module docstring)."""
    info = info or parse_info(data, url)
    if info.format == "png":
        return decode_png(data)
    if info.format == "bmp":
        return decode_bmp(data)
    if info.seed is not None:
        return gen_pixels(info.seed, info.width, info.height,
                          "L" if info.mode == "L" else "RGB")
    # real decoder fallback (Pillow) when importable — covers genuine
    # JPEG/WEBP/GIF payloads a real deployment would fetch; absent in
    # this sandbox, where non-seed non-PNG/BMP payloads don't occur
    try:  # pragma: no cover - environment-dependent
        import io

        from PIL import Image as _PILImage

        img = _PILImage.open(io.BytesIO(data))
        img = img.convert("L" if img.mode == "L" else "RGB")
        return np.asarray(img)
    except Exception:
        pass
    raise NotImplementedError(
        f"no pixel decoder for {info.format} without an embedded seed "
        "(real deployments plug libjpeg/libwebp here)"
    )
