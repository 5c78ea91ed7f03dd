"""Magic-byte image-format detection (rebuild of M14).

Matches the reference's sniffer semantics (advanced_formats.py:76-119):
signature table with RIFF/WEBP and `<svg` disambiguation, falling back
to the URL extension.  All signatures are public file-format magic.
"""

from __future__ import annotations

_SIGNATURES: list[tuple[bytes, str]] = [
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
]


def detect_format(data: bytes, url: str = "") -> str | None:
    head = bytes(data[:64])
    for sig, fmt in _SIGNATURES:
        if head.startswith(sig):
            return fmt
    # RIFF container → WebP when the form type says so
    if head.startswith(b"RIFF") and head[8:12] == b"WEBP":
        return "webp"
    # ISO-BMFF brands (AVIF/HEIC/HEIF)
    if head[4:8] == b"ftyp":
        brand = head[8:12]
        if brand in (b"avif", b"avis"):
            return "avif"
        if brand in (b"heic", b"heix", b"hevc", b"mif1"):
            return "heic"
    # JPEG XL
    if head.startswith(b"\xff\x0a") or head.startswith(
        b"\x00\x00\x00\x0cJXL \r\n\x87\n"
    ):
        return "jxl"
    # SVG: XML with an <svg root (reference checks text prefix)
    lowered = head.lstrip().lower()
    if lowered.startswith(b"<svg") or (
        lowered.startswith(b"<?xml") and b"<svg" in bytes(data[:512]).lower()
    ):
        return "svg"
    # fallback: URL extension
    low = url.lower().rsplit("?", 1)[0]
    for ext in ("jpg", "jpeg", "png", "gif", "webp", "bmp", "tiff", "svg", "ico"):
        if low.endswith("." + ext):
            return "jpeg" if ext in ("jpg", "jpeg") else ext
    return None
