"""Image codec + filter-chain conformance (SURVEY.md §5.2)."""

import numpy as np
import pytest

from snapcrawler_ray.config import ImageFilterConfig
from snapcrawler_ray.imageio import formats as F
from snapcrawler_ray.imageio.filters import detect_watermark_regions, filter_image
from snapcrawler_ray.imageio.phash import hamming64, phash64
from snapcrawler_ray.imageio.png import decode_png, encode_png, parse_png_info
from snapcrawler_ray.imageio.sniff import detect_format
from snapcrawler_ray.imageio.svg import make_svg, parse_svg_info, svg_to_png
from snapcrawler_ray.imageio.synth import synth_image_bytes


def test_png_roundtrip_gray_rgb_rgba():
    rng = np.random.RandomState(0)
    for shape in [(20, 30), (16, 24, 3), (8, 8, 4)]:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        data = encode_png(px, dpi=(144, 144))
        info = parse_png_info(data)
        assert (info.width, info.height) == (shape[1], shape[0])
        assert info.dpi == (144, 144)
        out = decode_png(data)
        np.testing.assert_array_equal(out, px)


def test_png_mode_strings():
    g = encode_png(np.zeros((5, 5), np.uint8))
    c = encode_png(np.zeros((5, 5, 3), np.uint8))
    assert parse_png_info(g).mode == "L"
    assert parse_png_info(c).mode == "RGB"


def test_jpeg_stub_parse():
    data = F.encode_jpeg_stub(640, 480, "RGB", seed=7, dpi=(300, 300))
    assert detect_format(data) == "jpeg"
    info = F.parse_jpeg_info(data)
    assert (info.width, info.height, info.mode) == (640, 480, "RGB")
    assert info.dpi == (300, 300)
    assert info.seed == 7
    gray = F.parse_jpeg_info(F.encode_jpeg_stub(10, 20, "L", seed=1))
    assert gray.mode == "L" and gray.dpi is None


def test_gif_webp_bmp_parse():
    g = F.encode_gif_stub(320, 200, seed=9)
    assert detect_format(g) == "gif"
    gi = F.parse_gif_info(g)
    assert (gi.width, gi.height, gi.seed) == (320, 200, 9)

    w = F.encode_webp_stub(1024, 768, "L", seed=3)
    assert detect_format(w) == "webp"
    wi = F.parse_webp_info(w)
    assert (wi.width, wi.height, wi.mode, wi.seed) == (1024, 768, "L", 3)

    px = F.gen_pixels(5, 33, 21, "RGB")
    b = F.encode_bmp(px, dpi=(96, 96))
    assert detect_format(b) == "bmp"
    bi = F.parse_bmp_info(b)
    assert (bi.width, bi.height) == (33, 21)
    assert bi.dpi == (96, 96)
    np.testing.assert_array_equal(F.decode_bmp(b), px)


def test_svg_parse_and_render():
    svg = make_svg(200, 100, "x")
    assert detect_format(svg) == "svg"
    info = parse_svg_info(svg)
    assert (info.width, info.height) == (200, 100)
    png = svg_to_png(svg)
    assert parse_png_info(png).width == 200
    assert svg_to_png(svg) == png  # deterministic


def test_phash_semantics():
    a = F.gen_pixels(1, 400, 300, "RGB")
    b = F.gen_pixels(1, 400, 300, "RGB")
    c = F.gen_pixels(2, 400, 300, "RGB")
    assert phash64(a) == phash64(b)
    assert phash64(a) != phash64(c)
    # small perturbation → small hamming distance
    a2 = a.copy()
    a2[:5, :5] = 0
    assert hamming64(phash64(a), phash64(a2)) <= 12


def _png_bytes(w, h, mode="RGB", dpi=None, seed=1):
    return encode_png(F.gen_pixels(seed, w, h, mode), dpi=dpi)


CFG = ImageFilterConfig(deduplication=True, watermark_enabled=True,
                        watermark_sensitivity=15)


@pytest.mark.parametrize(
    "url,data,expected",
    [
        ("https://x/a.png", _png_bytes(100, 500), "size"),          # F1
        ("https://x/a.tiff", _png_bytes(500, 500), "format"),       # F2
        ("https://x/a.png", _png_bytes(500, 600), ""),              # pass
        ("https://x/a.png", _png_bytes(500, 600, dpi=(72, 72)), ""),  # F3 off
        ("https://x/a.png", _png_bytes(500, 600, "L"), ""),         # F4 'all'
        ("https://x/a.png", _png_bytes(2000, 500), "aspect"),       # F6 >3.0
        ("https://x/a.png", _png_bytes(500, 2000), "aspect"),       # F6 <0.4
        ("https://x/bad.png", b"garbage", "error"),
    ],
)
def test_filter_chain_reasons(url, data, expected):
    assert filter_image(url, data, CFG)["reason"] == expected


def test_filter_dpi_color_orientation():
    cfg = ImageFilterConfig(min_dpi=150, color_mode="color",
                            orientation="landscape")
    # low dpi rejected, missing dpi passes (filtering_module.py:378-390)
    assert filter_image("https://x/a.png", _png_bytes(800, 600, dpi=(72, 72)), cfg)["reason"] == "dpi"
    assert filter_image("https://x/a.png", _png_bytes(800, 600), cfg)["reason"] == ""
    assert filter_image("https://x/a.png", _png_bytes(800, 600, "L"), cfg)["reason"] == "color"
    assert filter_image("https://x/a.png", _png_bytes(600, 800), cfg)["reason"] == "orientation"
    # synonym mapping adopted from pipelines.py:190-207
    cfg2 = ImageFilterConfig(orientation="vertical")
    assert filter_image("https://x/a.png", _png_bytes(800, 600), cfg2)["reason"] == "orientation"
    assert filter_image("https://x/a.png", _png_bytes(600, 800), cfg2)["reason"] == ""


def test_watermark_detection():
    clean = F.gen_pixels(3, 640, 480, "RGB")
    assert detect_watermark_regions(clean) <= 15
    rng = np.random.RandomState(0)
    noisy = (rng.randint(0, 2, size=(480, 640)) * 255).astype(np.uint8)
    assert detect_watermark_regions(noisy) > 15


def test_svg_converted_then_filtered():
    svg = make_svg(800, 600, "big")
    out = filter_image("https://x/a.svg", svg, CFG)
    assert out["reason"] == "" and out["format"] == "png"
    small = make_svg(100, 80, "small")
    assert filter_image("https://x/s.svg", small, CFG)["reason"] == "size"


def test_synth_determinism_and_coverage():
    urls = [f"https://img-cdn0.example/pic/0/{k}.{e}"
            for k in range(120)
            for e in ("jpg", "png", "webp", "gif")]
    verdicts = {}
    for u in urls:
        data, ct = synth_image_bytes(u)
        assert synth_image_bytes(u)[0] == data
        if ct.startswith("image/"):
            verdicts[u] = filter_image(u, data, CFG)["reason"]
    reasons = set(verdicts.values())
    assert "" in reasons and "size" in reasons and "aspect" in reasons


def test_codec_boundary_raises_for_foreign_jpeg():
    """The documented codec boundary: a real (non-seed-stub) JPEG parses
    header info fine but pixel decode raises NotImplementedError —
    real deployments plug libjpeg/libwebp at exactly this seam."""
    import struct

    import pytest

    from snapcrawler_ray.imageio.formats import decode_pixels, parse_info

    # minimal foreign JPEG: SOI + APP0/JFIF + SOF0 (40x30) + EOI
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 30, 40, 3)
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + b"\x00\x01\x00\x01\x00\x00"
        + sof
        + b"\xff\xd9"
    )
    info = parse_info(jpeg, "https://other.example/x.jpg")
    assert (info.format, info.width, info.height) == ("jpeg", 40, 30)
    assert info.seed is None
    with pytest.raises(NotImplementedError):
        decode_pixels(jpeg, info)


def test_media_stage_dead_letters_foreign_audio():
    """MediaFeatureStage turns the NotImplementedError boundary into a
    dead-letter row instead of poisoning the batch."""
    import pyarrow as pa

    from snapcrawler_ray.multimodal import MediaFeatureStage

    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "kind": pa.array(["audio"], pa.string()),
            "payload": pa.array([b"RIFF....WAVEfmt not-our-fake"], pa.binary()),
            "mime": pa.array(["audio/wav"], pa.string()),
        }
    )
    out = MediaFeatureStage()(batch)
    assert out.column("ok").to_pylist() == [False]
    assert "codec_unavailable" in out.column("error").to_pylist()[0]


def test_chain_mode_parallel_vs_scrapy():
    """SURVEY §7.5 reference self-divergence, both chains verdict-tested:
    scrapy (pipelines.py) maps orientation synonyms and runs F9 banner;
    parallel (filtering_module.py) leaves 'vertical' unmatched (passes
    everything) and F9 is dead code."""
    from snapcrawler_ray.imageio.png import encode_png

    # extreme-aspect banner image (40:1), passes size when min disabled
    wide = encode_png(np.zeros((20, 800, 3), np.uint8))
    base = dict(min_side_size=0, aspect_ratio_min=0.0, aspect_ratio_max=0.0,
                formats=("png",))
    scrapy = ImageFilterConfig(**base, chain_mode="scrapy")
    parallel = ImageFilterConfig(**base, chain_mode="parallel")
    assert filter_image("https://h/x.png", wide, scrapy)["reason"] == "banner"
    # F9 dead in the parallel chain: the banner is accepted
    assert filter_image("https://h/x.png", wide, parallel)["reason"] == ""

    # portrait image under orientation='vertical' (synonym)
    tall = encode_png(np.zeros((64, 32, 3), np.uint8))
    land = encode_png(np.zeros((32, 64, 3), np.uint8))
    s_v = ImageFilterConfig(**base, orientation="vertical",
                            chain_mode="scrapy")
    p_v = ImageFilterConfig(**base, orientation="vertical",
                            chain_mode="parallel")
    # scrapy maps vertical→portrait: landscape rejected, portrait kept
    assert filter_image("https://h/t.png", tall, s_v)["reason"] == ""
    assert filter_image("https://h/l.png", land, s_v)["reason"] == "orientation"
    # parallel: 'vertical' matches no branch — everything passes
    assert filter_image("https://h/t.png", tall, p_v)["reason"] == ""
    assert filter_image("https://h/l.png", land, p_v)["reason"] == ""
    # canonical 'portrait' behaves identically in both chains
    s_p = ImageFilterConfig(**base, orientation="portrait",
                            chain_mode="scrapy")
    p_p = ImageFilterConfig(**base, orientation="portrait",
                            chain_mode="parallel")
    assert filter_image("https://h/l.png", land, s_p)["reason"] == \
        filter_image("https://h/l.png", land, p_p)["reason"] == "orientation"
