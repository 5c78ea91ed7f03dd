"""AI image optimization (rebuild of M24,
advanced_formats.py:376-512): optimal-format choice, quality
enhancement (unsharp + contrast + color), smart crop, size cap, and
per-format save parameters.

Kernels are numpy reimplementations of the PIL operations the reference
uses (no PIL in this container):

- UnsharpMask(radius=1, percent=120, threshold=3) → 3×3 gaussian blur +
  thresholded overshoot, same parameterization;
- ImageEnhance.Contrast(1.1) → interpolate against the L-mean gray
  constant, PIL's exact definition;
- ImageEnhance.Color(1.05) → interpolate against the grayscale image;
- smart crop → ``Image.getbbox()`` semantics (bounding box of non-zero
  pixels);
- size cap → reference uses LANCZOS; our resize is nearest-neighbor
  (documented fidelity gap — the decision logic, not the resampler, is
  the operator's contract).

Off by default, like the reference's ai_optimization.enabled flag
(config.yaml).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def choose_optimal_format(content_type: str, has_transparency: bool) -> str:
    """advanced_formats.py:376-402 decision tree.  AVIF encoding is
    unsupported in this container (as in the reference's fallback
    probe), so photo/opaque resolves to webp."""
    if content_type == "photo":
        return "webp"
    if content_type in ("logo", "icon"):
        return "png" if has_transparency else "webp"
    if content_type == "illustration":
        return "webp"
    if content_type == "text":
        return "png"
    return "webp"


def save_parameters(format_name: str, content_type: str) -> dict:
    """advanced_formats.py:487-512 adaptive save params."""
    f = format_name.lower()
    if f in ("jpg", "jpeg"):
        if content_type == "photo":
            q = 85
        elif content_type in ("logo", "text"):
            q = 95
        else:
            q = 80
        return {"quality": q, "optimize": True}
    if f == "png":
        return {"optimize": True}
    if f == "webp":
        return {"quality": 80 if content_type == "photo" else 85, "method": 6}
    return {}


def _gauss3(ch: np.ndarray) -> np.ndarray:
    """3×3 gaussian blur (radius-1), edge-replicated."""
    p = np.pad(ch.astype(np.float64), 1, mode="edge")
    k = np.array([1.0, 2.0, 1.0]) / 4.0
    h = p[:, :-2] * k[0] + p[:, 1:-1] * k[1] + p[:, 2:] * k[2]
    return h[:-2] * k[0] + h[1:-1] * k[1] + h[2:] * k[2]


def unsharp_mask(px: np.ndarray, percent: int = 120, threshold: int = 3) -> np.ndarray:
    """UnsharpMask(radius=1, percent, threshold): add percent% of the
    (blur) difference wherever it exceeds the threshold."""
    f = px.astype(np.float64)
    if f.ndim == 2:
        blur = _gauss3(f)
    else:
        blur = np.stack([_gauss3(f[..., c]) for c in range(f.shape[-1])], -1)
    diff = f - blur
    out = np.where(np.abs(diff) > threshold, f + diff * (percent / 100.0), f)
    return np.clip(out, 0, 255).astype(np.uint8)


def _to_gray(px: np.ndarray) -> np.ndarray:
    if px.ndim == 2:
        return px.astype(np.float64)
    return (
        0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    ).astype(np.float64)


def enhance_contrast(px: np.ndarray, factor: float = 1.1) -> np.ndarray:
    """PIL ImageEnhance.Contrast: blend with the constant mean-gray."""
    mean = _to_gray(px).mean()
    out = mean + factor * (px.astype(np.float64) - mean)
    return np.clip(out, 0, 255).astype(np.uint8)


def enhance_color(px: np.ndarray, factor: float = 1.05) -> np.ndarray:
    """PIL ImageEnhance.Color: blend with the grayscale image."""
    if px.ndim == 2:
        return px
    g = _to_gray(px)[..., None]
    out = g + factor * (px.astype(np.float64) - g)
    return np.clip(out, 0, 255).astype(np.uint8)


def enhance_quality(px: np.ndarray) -> np.ndarray:
    """advanced_formats.py:437-457: unsharp → contrast 1.1 → color 1.05."""
    return enhance_color(enhance_contrast(unsharp_mask(px)))


def smart_crop(px: np.ndarray) -> np.ndarray:
    """``Image.getbbox()`` + crop: drop all-zero border rows/columns
    (advanced_formats.py:459-469)."""
    nz = px if px.ndim == 2 else px.max(axis=-1)
    rows = np.nonzero(nz.any(axis=1))[0]
    cols = np.nonzero(nz.any(axis=0))[0]
    if len(rows) == 0 or len(cols) == 0:
        return px
    return px[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def optimize_size(px: np.ndarray, max_size: int = 2048) -> np.ndarray:
    h, w = px.shape[:2]
    if w <= max_size and h <= max_size:
        return px
    from ..multimodal import resize_image

    return resize_image(px, max_size)


def optimize_pixels(
    px: np.ndarray,
    quality_score: float,
    enable_quality_enhancement: bool = True,
    enable_smart_cropping: bool = True,
    max_size: int = 2048,
) -> np.ndarray:
    """advanced_formats.py:416-435 _apply_optimizations order:
    enhance (only below 0.7 quality) → smart crop → size cap."""
    out = px
    if enable_quality_enhancement and quality_score < 0.7:
        out = enhance_quality(out)
    if enable_smart_cropping:
        out = smart_crop(out)
    return optimize_size(out, max_size)


class OptimizeStage:
    """map_batches stage over accepted-image rows (url[, bytes]):
    decode → analyze (quality/content-type/transparency) → optimize →
    re-encode PNG (the container's only encoder) + emit the chosen
    target format and its save params as columns."""

    def __init__(self, enable_quality_enhancement: bool = True,
                 enable_smart_cropping: bool = True, max_size: int = 2048):
        self.enh = enable_quality_enhancement
        self.crop = enable_smart_cropping
        self.max_size = max_size

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json

        from .analyze import classify_content_type, quality_score
        from .formats import decode_pixels, parse_info
        from .png import encode_png
        from .synth import synth_image_bytes

        urls = batch.column("url").to_pylist()
        have_bytes = "bytes" in batch.column_names
        blobs = batch.column("bytes").to_pylist() if have_bytes else None
        ok, fmts, params, ws, hs, payloads = [], [], [], [], [], []
        for i, url in enumerate(urls):
            data = blobs[i] if blobs else synth_image_bytes(url)[0]
            try:
                info = parse_info(data, url)
                px = decode_pixels(data, info, url)
                q = quality_score(px)
                ct = classify_content_type(px, info.width, info.height)
                transparent = info.mode in ("RGBA", "LA")
                out_px = optimize_pixels(
                    px, q, self.enh, self.crop, self.max_size
                )
                fmt = choose_optimal_format(ct, transparent)
                ok.append(True)
                fmts.append(fmt)
                params.append(json.dumps(save_parameters(fmt, ct), sort_keys=True))
                hs.append(int(out_px.shape[0]))
                ws.append(int(out_px.shape[1]))
                payloads.append(
                    encode_png(out_px if out_px.ndim == 2 else out_px[..., :3])
                )
            except Exception:
                ok.append(False)
                fmts.append("")
                params.append("{}")
                ws.append(0)
                hs.append(0)
                payloads.append(None)
        return pa.table(
            {
                "url": batch.column("url"),
                "optimized": pa.array(ok, pa.bool_()),
                "target_format": pa.array(fmts, pa.string()),
                "save_params": pa.array(params, pa.string()),
                "out_width": pa.array(ws, pa.int32()),
                "out_height": pa.array(hs, pa.int32()),
                "bytes": pa.array(payloads, pa.binary()),
            }
        )
