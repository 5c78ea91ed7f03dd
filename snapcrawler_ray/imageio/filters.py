"""The per-image filter chain F1–F9 (rebuild of
filtering_module.py:267-466; normative order per SURVEY.md §2.3):

SVG-convert → open/parse → size → format → DPI → color-mode →
orientation → aspect-range → [pHash dedup: global, applied by the
pipeline] → watermark.  First failure rejects and records the reason.

Divergences adopted deliberately (SURVEY.md §7.5 'Reference
self-divergence'): orientation synonyms 'vertical'/'horizontal' map to
portrait/landscape (pipelines.py:190-207 behavior; filtering_module
silently passes everything for those values); the banner/logo aspect
filter (dead code in filtering_module, live in pipelines.py:240-252)
runs only when ``allow_logos_banners`` is False, after watermark.

Watermark detection is an MSER stand-in (no OpenCV here): the count of
16×16 tiles whose local std exceeds a contrast threshold plays the role
of the MSER region count vs ``sensitivity`` (filtering_module.py:442-457);
errors pass, as in the reference.
"""

from __future__ import annotations

import numpy as np

from ..config import ImageFilterConfig
from . import formats as F
from .phash import phash64
from .svg import svg_to_png


# real MSER if OpenCV is importable (reference filtering_module.py:
# 442-457 / pipelines.py:219-238); absent in this sandbox → tile stand-in
try:  # pragma: no cover - environment-dependent
    import cv2 as _cv2
except Exception:  # pragma: no cover
    _cv2 = None


def detect_watermark_regions(pixels: np.ndarray) -> int:
    """Watermark text-region count.  cv2.MSER when importable (the
    reference kernel); otherwise the high-contrast 16×16 tile stand-in."""
    if _cv2 is not None:  # pragma: no cover - not in sandbox
        try:
            g = (
                pixels.mean(axis=2) if pixels.ndim == 3 else pixels
            ).astype(np.uint8)
            regions, _ = _cv2.MSER_create().detectRegions(g)
            return len(regions)
        except Exception:
            return 0  # cv2 errors keep the image (reference behavior)
    # exact-integer tile variance: gray = channel-sum/scale, and
    # std(gray) > 60  ⇔  256·Σs² − (Σs)² > (60·scale·256)², all in
    # overflow-safe int64 — no float mean/std over the full image
    # narrow dtypes keep the pass memory-bandwidth-cheap: channel sums
    # fit uint16 (≤765), tile squared-sums fit uint32 (≤1.5e8)
    if pixels.ndim == 3:
        s = pixels.sum(axis=2, dtype=np.uint16)
        scale = 3
    else:
        s = pixels.astype(np.uint16)
        scale = 1
    h, w = s.shape
    th, tw = max(1, h // 16), max(1, w // 16)
    s = s[: th * 16, : tw * 16]
    if s.size == 0:
        return 0
    tiles = (
        s.reshape(th, 16, tw, 16)
        .transpose(0, 2, 1, 3)
        .reshape(th * tw, 256)
        .astype(np.uint32)
    )
    ssum = tiles.sum(axis=1, dtype=np.int64)
    ssq = np.einsum("ij,ij->i", tiles, tiles).astype(np.int64)
    thresh = (60 * scale * 256) ** 2
    return int((256 * ssq - ssum * ssum > thresh).sum())


def _ext_of(url: str) -> str:
    path = url.split("?", 1)[0].rsplit("/", 1)[-1]
    return path.rsplit(".", 1)[-1].lower() if "." in path else ""


def filter_image(
    url: str, data: bytes, cfg: ImageFilterConfig
) -> dict:
    """Run the local (non-global) filters on one image.

    Returns {reason, format, width, height, mode, aspect, phash,
    watermark_regions}; ``reason == ''`` means the image passed F1–F6
    and F8/F9 — pHash dedup (F7) is global and decided by the pipeline.
    ``phash`` is only computed when it may be needed (dedup enabled and
    local filters passed)."""
    out = {
        "reason": "",
        "format": "",
        "width": 0,
        "height": 0,
        "mode": "",
        "aspect": 0.0,
        "phash": 0,
        "watermark_regions": 0,
    }
    ext = _ext_of(url)

    # SVG conversion first (filtering_module.py:270-283); the converted
    # file continues as PNG (path renamed .svg → .png in the reference).
    if ext == "svg":
        try:
            data = svg_to_png(data)
            ext = "png"
        except Exception:
            out["reason"] = "svg_convert"
            return out

    try:
        info = F.parse_info(data, url)
    except Exception:
        out["reason"] = "error"
        return out

    w, h = info.width, info.height
    aspect = w / h if h > 0 else 1.0
    out.update(
        format=info.format, width=w, height=h, mode=info.mode,
        aspect=float(aspect),
    )

    # F1 size (filtering_module.py:362-368)
    if cfg.min_side_size > 0 and min(w, h) < cfg.min_side_size:
        out["reason"] = "size"
        return out
    # F2 format by file extension (filtering_module.py:370-376)
    if cfg.formats and ext not in [f.lower() for f in cfg.formats]:
        out["reason"] = "format"
        return out
    # F3 DPI — missing DPI passes (filtering_module.py:378-390)
    if cfg.min_dpi > 0 and info.dpi is not None and min(info.dpi) < cfg.min_dpi:
        out["reason"] = "dpi"
        return out
    # F4 color mode (filtering_module.py:392-402)
    is_gray = info.mode == "L"
    if cfg.color_mode == "color" and is_gray:
        out["reason"] = "color"
        return out
    if cfg.color_mode == "bw" and not is_gray:
        out["reason"] = "color"
        return out
    # F5 orientation.  scrapy chain maps synonyms (pipelines.py:190-207);
    # parallel chain does not (filtering_module.py:404-416 — 'vertical'
    # matches no branch, so it passes everything)
    if cfg.chain_mode == "parallel":
        orient = cfg.orientation
    else:
        orient = {"vertical": "portrait", "horizontal": "landscape"}.get(
            cfg.orientation, cfg.orientation
        )
    if orient == "landscape" and w < h:
        out["reason"] = "orientation"
        return out
    if orient == "portrait" and h < w:
        out["reason"] = "orientation"
        return out
    if orient == "square" and w != h:
        out["reason"] = "orientation"
        return out
    # F6 aspect range (filtering_module.py:418-430)
    if cfg.aspect_ratio_min > 0 and aspect < cfg.aspect_ratio_min:
        out["reason"] = "aspect"
        return out
    if cfg.aspect_ratio_max > 0 and aspect > cfg.aspect_ratio_max:
        out["reason"] = "aspect"
        return out

    # pixel-level work only for survivors
    pixels = None
    if cfg.deduplication or cfg.watermark_enabled or not cfg.allow_logos_banners:
        if cfg.deduplication or cfg.watermark_enabled:
            try:
                pixels = F.decode_pixels(data, info, url)
            except Exception:
                pixels = None

    # F7 phash value (membership decided globally by the pipeline)
    if cfg.deduplication and pixels is not None:
        out["phash"] = phash64(pixels)

    # F8 watermark — errors pass (filtering_module.py:442-457)
    if cfg.watermark_enabled and cfg.watermark_sensitivity > 0 and pixels is not None:
        regions = detect_watermark_regions(pixels)
        out["watermark_regions"] = regions
        if regions > cfg.watermark_sensitivity:
            out["reason"] = "watermark"
            return out

    # F9 banner/logo extreme aspect — live in the scrapy chain
    # (pipelines.py:240-252), DEAD CODE in the parallel chain
    # (filtering_module.py:459-466 defined but never called)
    if (
        cfg.chain_mode != "parallel"
        and not cfg.allow_logos_banners
        and (aspect > 10 or aspect < 0.1)
    ):
        out["reason"] = "banner"
        return out

    return out
