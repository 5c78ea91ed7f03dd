"""Image content analysis (rebuild of M20–M23,
advanced_formats.py:215-374) in pure numpy — no OpenCV/sklearn here:

- Laplacian variance (sharpness): 4-neighbor Laplacian kernel, same
  formula ``min(var/1000, 1)`` as cv2.Laplacian.
- Canny edge density stand-in: gradient-magnitude threshold fraction
  (monotone proxy with the same role in the classifier thresholds).
- KMeans palette: seeded Lloyd iterations in numpy (sklearn fallback in
  the reference takes first-8; ours is a real clustering, deterministic
  with random_state=42 semantics).

Formulas/thresholds mirror the reference; emitted as an Arrow struct
column by ``AnalyzeStage`` (ImageMetadata equivalent,
advanced_formats.py:20-33).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_gray(px: np.ndarray) -> np.ndarray:
    if px.ndim == 3:
        # in-place accumulation, same left-to-right op order as
        # 0.299a + 0.587b + 0.114c — bit-identical, fewer temporaries
        g = 0.299 * px[..., 0]
        g += 0.587 * px[..., 1]
        g += 0.114 * px[..., 2]
        return g
    return px.astype(np.float64)


def _laplacian_var(gray: np.ndarray) -> float:
    if gray.shape[0] < 3 or gray.shape[1] < 3:
        return 0.0
    # in-place stencil, same accumulation order as the one-expression
    # form (((-4c+u)+d)+l)+r — bit-identical, 1 temporary instead of 4
    lap = -4.0 * gray[1:-1, 1:-1]
    lap += gray[:-2, 1:-1]
    lap += gray[2:, 1:-1]
    lap += gray[1:-1, :-2]
    lap += gray[1:-1, 2:]
    return float(lap.var())


def _resize_nn(px: np.ndarray, w: int, h: int) -> np.ndarray:
    H, W = px.shape[:2]
    ys = (np.arange(h) * H // h).clip(0, H - 1)
    xs = (np.arange(w) * W // w).clip(0, W - 1)
    return px[np.ix_(ys, xs)]


def _edge_density(gray: np.ndarray, thresh: float = 50.0) -> float:
    gx = np.abs(np.diff(gray, axis=1, prepend=gray[:, :1]))
    gy = np.abs(np.diff(gray, axis=0, prepend=gray[:1, :]))
    mag = np.hypot(gx, gy)
    return float((mag > thresh).sum() / gray.size)


def quality_terms(px: np.ndarray) -> tuple[float, float, float, int, int, int]:
    """(lap_var, gray_std, gray_mean, unique_colors, px_h, px_w) — the
    six primitives the M20 quality formula consumes.  Exposed separately
    so the score is a pure function of dumpable values: the
    ``images_analysis`` SQL oracle replays ``_quality_raw`` /
    ``quality_micro_from_terms`` over a Parquet dump of these, and only
    the pixel work above this line stays conformance-tested locally
    (the images_tags trust split)."""
    gray = _to_gray(px)
    lap_var = _laplacian_var(gray)
    gray_std = float(gray.std())
    gray_mean = float(gray.mean())
    # pack channels into one integer per pixel: bijective for uint8
    # channels, so the distinct count equals row-wise np.unique(axis=0)
    # — which lexsorts structured rows and is ~100x slower
    flat = px.reshape(-1, px.shape[-1]) if px.ndim == 3 else px.reshape(-1, 1)
    # ≤4 uint8 channels always fit uint32 — half the memory traffic of
    # the former uint64 fold, identical packed integers
    packed = np.zeros(flat.shape[0], dtype=np.uint32)
    for ch in range(flat.shape[1]):
        packed = (packed << np.uint32(8)) | flat[:, ch].astype(np.uint32)
    if flat.shape[1] <= 3:
        # ≤24-bit color space: exact distinct count via a presence
        # bitmap (calloc + scatter + popcount) — same value as
        # np.unique but without sorting the full pixel array (~2.5×
        # faster per image at typical sizes)
        flags = np.zeros(1 << (8 * flat.shape[1]), dtype=bool)
        flags[packed.astype(np.int64)] = True
        unique_colors = int(np.count_nonzero(flags))
    else:
        unique_colors = len(np.unique(packed))
    return lap_var, gray_std, gray_mean, unique_colors, px.shape[0], px.shape[1]


def _quality_raw(
    lap_var: float,
    gray_std: float,
    gray_mean: float,
    unique_colors: int,
    px_h: int,
    px_w: int,
) -> float:
    """min(weighted sum, 1.0) BEFORE the reference's round(·, 6) — the
    double both the engine and the DuckDB replay feed into their
    respective roundings (identical IEEE op sequence on both sides)."""
    sharpness = min(lap_var / 1000.0, 1.0)
    contrast = gray_std / 128.0
    brightness = gray_mean / 255.0
    brightness_score = 1.0 - abs(brightness - 0.5) * 2
    max_colors = min(px_h * px_w, 65536)
    color_diversity = unique_colors / max_colors
    q = sharpness * 0.3 + contrast * 0.25 + brightness_score * 0.2 + color_diversity * 0.25
    return min(q, 1.0)


def quality_from_terms(
    lap_var: float,
    gray_std: float,
    gray_mean: float,
    unique_colors: int,
    px_h: int,
    px_w: int,
) -> float:
    return round(
        _quality_raw(lap_var, gray_std, gray_mean, unique_colors, px_h, px_w), 6
    )


def quality_micro_from_terms(
    lap_var: float,
    gray_std: float,
    gray_mean: float,
    unique_colors: int,
    px_h: int,
    px_w: int,
) -> int:
    """Integer micro-unit quality for the hash-gated contract row:
    half-away rounding of q·1e6 — the same double DuckDB's
    ``round(q * 1000000.0)`` sees, so the BIGINTs match bit-for-bit
    (Python's round(·, 6) is correctly-rounded decimal and NOT
    reproducible by DuckDB's scaled-multiply round; the micro-unit
    column is, which is why the driver row carries it while the
    library API keeps the reference's round-6 float)."""
    y = _quality_raw(lap_var, gray_std, gray_mean, unique_colors, px_h, px_w) * 1e6
    import math

    f = math.floor(y)
    return int(f + (y - f >= 0.5))


def quality_score(px: np.ndarray) -> float:
    """advanced_formats.py:215-252: 0.3·sharpness + 0.25·contrast +
    0.2·brightness-centering + 0.25·color-diversity, capped 1.0."""
    return quality_from_terms(*quality_terms(px))


def _rgb_to_hex(rgb) -> str:
    return f"#{int(rgb[0]):02x}{int(rgb[1]):02x}{int(rgb[2]):02x}"


def _kmeans(colors: np.ndarray, n_clusters: int, seed: int = 42,
            iters: int = 10) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(colors))
    centers = colors[rng.choice(len(colors), n_clusters, replace=False)].astype(
        np.float64
    )
    for _ in range(iters):
        d = ((colors[:, None, :].astype(np.float64) - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_clusters):
            m = assign == c
            if m.any():
                centers[c] = colors[m].mean(0)
    return centers.astype(int)


def color_counts(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(packed_rgb_uint32 ascending, counts) of the 100×100 downsample
    — the integer histogram the M21 dominant-color selection consumes.
    Exposed separately so the selection is a pure function of dumpable
    integers (the ``images_analysis`` SQL oracle replays the
    count-desc/packed-asc top-5 over a Parquet dump of these)."""
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    small = _resize_nn(px[..., :3], 100, 100)
    pixels = small.reshape(-1, 3)
    # pack (r,g,b) → uint32: packed order == lexicographic row order,
    # so unique+counts match np.unique(axis=0) exactly without the
    # structured-row sort
    packed = (
        (pixels[:, 0].astype(np.uint32) << 16)
        | (pixels[:, 1].astype(np.uint32) << 8)
        | pixels[:, 2].astype(np.uint32)
    )
    return np.unique(packed, return_counts=True)


def analyze_colors(px: np.ndarray) -> dict:
    """advanced_formats.py:254-303: 100×100 downsample, top-5 dominant
    hex + clustered ≤8 palette.  Dominant order is count-desc with
    packed-RGB-asc tie-break — a DEFINED total order (the former
    np.argsort was unstable on count ties), so the selection is
    SQL-replayable and stable across numpy versions."""
    upacked, counts = color_counts(px)
    order = np.lexsort((upacked, -counts.astype(np.int64)))
    dominant_p = upacked[order]
    dominant = np.stack(
        [(dominant_p >> 16) & 0xFF, (dominant_p >> 8) & 0xFF, dominant_p & 0xFF],
        axis=1,
    ).astype(np.uint8)
    dominant_hex = [_rgb_to_hex(c) for c in dominant[:5]]
    palette = _kmeans(dominant[:20], 8)
    return {"dominant": dominant_hex, "palette": [_rgb_to_hex(c) for c in palette]}


def content_features(px: np.ndarray) -> tuple[int, int]:
    """(edge_cnt, unique50) on the 50×50 downsample — the two INTEGER
    features the M22 threshold tree consumes.  Exposed separately so
    the classifier below is a pure function of dumpable integers (the
    ``images_tags`` SQL oracle replays the tree over a Parquet dump of
    these; pixel work itself stays conformance-tested locally)."""
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    small = _resize_nn(px[..., :3], 50, 50)
    p50 = small.reshape(-1, 3)
    unique50 = len(
        np.unique(
            (p50[:, 0].astype(np.uint32) << 16)
            | (p50[:, 1].astype(np.uint32) << 8)
            | p50[:, 2].astype(np.uint32)
        )
    )
    gray = _to_gray(small)
    gx = np.abs(np.diff(gray, axis=1, prepend=gray[:, :1]))
    gy = np.abs(np.diff(gray, axis=0, prepend=gray[:1, :]))
    edge_cnt = int((np.hypot(gx, gy) > 50.0).sum())
    return edge_cnt, unique50


def classify_from_features(
    width: int, height: int, edge_cnt: int, unique50: int
) -> str:
    """advanced_formats.py:305-340 threshold tree, as a pure function
    of the integer features (÷2500.0 reproduces the reference's
    edge_density / color_diversity doubles bit-for-bit — the 50×50
    downsample has exactly 2500 pixels)."""
    aspect_ratio = width / height if height else 1.0
    edge_density = edge_cnt / 2500.0
    color_diversity = unique50 / 2500.0
    if edge_density > 0.3 and color_diversity < 0.1:
        return "text"
    if aspect_ratio > 2.0 or aspect_ratio < 0.5:
        return "banner"
    if min(width, height) < 100 and max(width, height) < 200:
        return "icon"
    if color_diversity < 0.2 and edge_density > 0.2:
        return "logo"
    if edge_density < 0.1 and color_diversity > 0.5:
        return "photo"
    return "illustration"


def classify_content_type(px: np.ndarray, width: int, height: int) -> str:
    """advanced_formats.py:305-340 threshold tree."""
    edge_cnt, unique50 = content_features(px)
    return classify_from_features(width, height, edge_cnt, unique50)


def ai_tags(width: int, height: int, mode: str, content_type: str) -> list[str]:
    """advanced_formats.py:342-374."""
    tags = [content_type]
    if width > 1920 or height > 1080:
        tags.append("high_resolution")
    elif width < 300 or height < 300:
        tags.append("low_resolution")
    else:
        tags.append("medium_resolution")
    if width > height * 1.3:
        tags.append("landscape")
    elif height > width * 1.3:
        tags.append("portrait")
    else:
        tags.append("square")
    if mode == "L":
        tags.append("grayscale")
    elif mode in ("RGBA", "LA"):
        tags.append("transparent")
    else:
        tags.append("color")
    return tags


METADATA_TYPE = pa.struct(
    [
        ("quality_score", pa.float64()),
        ("content_type", pa.string()),
        ("dominant_colors", pa.list_(pa.string())),
        ("color_palette", pa.list_(pa.string())),
        ("ai_tags", pa.list_(pa.string())),
    ]
)


FEATURES_TYPE = pa.struct(
    [
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("mode", pa.string()),
        ("edge_cnt", pa.int64()),
        ("unique50", pa.int64()),
    ]
)


# M20/M21 primitive dump (quality terms + 100×100 color histogram);
# quality_micro is the engine-side micro-unit score the oracle
# RE-DERIVES from the other fields — it rides along so the projection
# does not recompute it per row downstream
QFEATURES_TYPE = pa.struct(
    [
        ("lap_var", pa.float64()),
        ("gray_std", pa.float64()),
        ("gray_mean", pa.float64()),
        ("unique_colors", pa.int64()),
        ("px_h", pa.int64()),
        ("px_w", pa.int64()),
        ("quality_micro", pa.int64()),
        ("cpacked", pa.list_(pa.int64())),
        ("ccnt", pa.list_(pa.int64())),
    ]
)


class AnalyzeStage:
    """map_batches stage: accepted-image rows (url[, bytes]) → +metadata
    struct column (the ImageMetadata equivalent) + ``features`` struct
    (the integer inputs of the M22/M23 decision logic — dumped to
    Parquet by ``images_tags`` so DuckDB can replay the classifier).
    With ``qfeatures=True`` also emits the M20/M21 primitive dump — the
    quality-formula terms and the 100×100 color histogram — consumed by
    the ``images_analysis`` SQL oracle.  Bytes are decoded via
    imageio.formats.decode_pixels; rows that fail decode get a null in
    every added column."""

    def __init__(self, qfeatures: bool = False):
        self.qfeatures = qfeatures

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .formats import decode_pixels, parse_info
        from .synth import synth_image_bytes

        urls = batch.column("url").to_pylist()
        have_bytes = "bytes" in batch.column_names
        blobs = batch.column("bytes").to_pylist() if have_bytes else None
        metas = []
        feats = []
        qfeats = []
        for i, url in enumerate(urls):
            data = blobs[i] if blobs else synth_image_bytes(url)[0]
            try:
                info = parse_info(data, url)
                px = decode_pixels(data, info, url)
                edge_cnt, unique50 = content_features(px)
                ct = classify_from_features(
                    info.width, info.height, edge_cnt, unique50
                )
                colors = analyze_colors(px)
                terms = quality_terms(px)
                metas.append(
                    {
                        "quality_score": quality_from_terms(*terms),
                        "content_type": ct,
                        "dominant_colors": colors["dominant"],
                        "color_palette": colors["palette"],
                        "ai_tags": ai_tags(info.width, info.height, info.mode, ct),
                    }
                )
                feats.append(
                    {
                        "width": info.width,
                        "height": info.height,
                        "mode": info.mode,
                        "edge_cnt": edge_cnt,
                        "unique50": unique50,
                    }
                )
                if self.qfeatures:
                    cp, cc = color_counts(px)
                    qfeats.append(
                        {
                            "lap_var": terms[0],
                            "gray_std": terms[1],
                            "gray_mean": terms[2],
                            "unique_colors": terms[3],
                            "px_h": terms[4],
                            "px_w": terms[5],
                            "quality_micro": quality_micro_from_terms(*terms),
                            "cpacked": cp.astype(np.int64).tolist(),
                            "ccnt": cc.astype(np.int64).tolist(),
                        }
                    )
            except Exception:
                metas.append(None)
                feats.append(None)
                if self.qfeatures:
                    qfeats.append(None)
        out = batch.append_column(
            "metadata", pa.array(metas, METADATA_TYPE)
        ).append_column("features", pa.array(feats, FEATURES_TYPE))
        if self.qfeatures:
            out = out.append_column("qfeatures", pa.array(qfeats, QFEATURES_TYPE))
        return out
