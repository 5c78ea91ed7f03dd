"""Deterministic synthetic image "download" (sandbox stand-in for S4).

The reference downloads image bytes over HTTP
(filtering_module.py:184-258).  No network exists here, so the download
stage *synthesizes* the bytes as a pure function of the image URL —
every property (dimensions, mode, DPI, format container, duplicate
pixel groups, watermark texture) is derived from the URL hash, so any
worker on any node regenerates identical bytes.  The distribution is
tuned so every F1–F9 filter branch fires on a realistic fraction of a
crawl's emissions.
"""

from __future__ import annotations

import numpy as np

from ..hashing import fnv1a64
from . import formats as F
from .png import encode_png
from .svg import make_svg


def _ext_of(url: str) -> str:
    path = url.split("?", 1)[0].rsplit("/", 1)[-1]
    return path.rsplit(".", 1)[-1].lower() if "." in path else ""


def synth_image_bytes(url: str) -> tuple[bytes, str]:
    """→ (bytes, content_type). Deterministic in the URL."""
    rng = np.random.RandomState(fnv1a64("img:" + url) % (2**32))
    ext = _ext_of(url)

    # --- dimensions: mostly healthy, with deliberate filter-trippers ---
    roll = rng.rand()
    if roll < 0.12:  # too small (F1)
        w, h = rng.randint(40, 399), rng.randint(40, 399)
    elif roll < 0.18:  # extreme aspect (F6/F9 banners)
        if rng.rand() < 0.5:
            w, h = rng.randint(1200, 3000), rng.randint(40, 120)
        else:
            w, h = rng.randint(40, 120), rng.randint(1200, 3000)
    elif roll < 0.25:  # square
        w = h = int(rng.randint(400, 1200))
    else:
        w, h = rng.randint(400, 1600), rng.randint(400, 1200)
    w, h = int(w), int(h)

    mode = "L" if rng.rand() < 0.12 else "RGB"
    dpi = None
    if rng.rand() < 0.25:
        d = int(rng.choice([72, 96, 150, 300]))
        dpi = (d, d)

    # --- pixel seed: ~12% join a per-host duplicate group (same pixels
    # ⇒ same pHash ⇒ F7 dedup fires on all but the first emission) ---
    host_part = url.split("/")[2] if "://" in url else "x"
    in_dup_group = rng.rand() < 0.12
    if in_dup_group:
        group = int(rng.randint(0, 4))
        seed = fnv1a64(f"dupgroup:{host_part}:{group}")
        w, h, mode, dpi = 800, 600, "RGB", None  # identical bytes per group
    else:
        seed = fnv1a64("px:" + url)

    # F8 texture (never on dup-group members — identical bytes required)
    watermark = (rng.rand() < 0.10) and not in_dup_group

    if ext == "svg":
        return make_svg(w, h, f"s{seed % 1000}"), "image/svg+xml"
    if ext in ("jpg", "jpeg"):
        return F.encode_jpeg_stub(w, h, mode, seed, dpi), "image/jpeg"
    if ext == "webp":
        return F.encode_webp_stub(w, h, mode, seed), "image/webp"
    if ext == "gif":
        return F.encode_gif_stub(w, h, seed), "image/gif"
    if ext == "bmp":
        px = _pixels(seed, w, h, mode, watermark)
        return F.encode_bmp(px, dpi), "image/bmp"
    if ext in ("png", "ico", "tiff", ""):
        px = _pixels(seed, w, h, mode, watermark)
        ct = "image/png" if ext in ("png", "") else f"image/{ext}"
        return encode_png(px, dpi), ct
    # unknown extension → non-image payload (exercises the reference's
    # Content-Type skip, filtering_module.py:194-197)
    return b"<html>not an image</html>", "text/html"


def _pixels(seed: int, w: int, h: int, mode: str, watermark: bool) -> np.ndarray:
    px = F.gen_pixels(seed, w, h, mode)
    if watermark:
        # dense high-contrast micro-texture: many high-variance tiles →
        # the MSER-stand-in region count exceeds the sensitivity
        rng = np.random.RandomState(seed % (2**32))
        noise = (rng.randint(0, 2, size=(h, w)) * 255).astype(np.uint8)
        checker = ((np.add.outer(np.arange(h) // 4, np.arange(w) // 4)) % 2) == 0
        if px.ndim == 2:
            px = np.where(checker, noise, px)
        else:
            px = px.copy()
            px[checker] = noise[checker][:, None]
    return px
