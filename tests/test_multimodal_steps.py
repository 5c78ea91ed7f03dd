"""Multimodal binary-column stages, PipelineStep registry, JSON payload
extraction, sessionization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from snapcrawler_ray.functions.jsonx import extract_images_from_api_payload
from snapcrawler_ray.imageio.formats import gen_pixels
from snapcrawler_ray.imageio.png import encode_png
from snapcrawler_ray.multimodal import (
    MEDIA_SCHEMA,
    decode_audio,
    decode_video_frames,
    make_fake_audio,
    make_fake_video,
    media_feature_pipeline,
    resize_image,
)
from snapcrawler_ray.steps import get_step, registered_steps, run_chain


def _media_table():
    rows = []
    for i in range(4):
        rows.append((i, "image", encode_png(gen_pixels(i, 300, 200, "RGB")),
                     "image/png"))
    for i in range(4, 7):
        rows.append((i, "audio", make_fake_audio(i), "audio/fake"))
    for i in range(7, 9):
        rows.append((i, "video", make_fake_video(i), "video/fake"))
    rows.append((9, "audio", b"RIFFxxxxWAVE", "audio/wav"))  # real codec absent
    return pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "payload": pa.array([r[2] for r in rows], pa.binary()),
            "mime": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def test_fake_codecs_roundtrip():
    a = make_fake_audio(1)
    samples, rate = decode_audio(a)
    assert rate == 16000 and len(samples) == 16000
    v = make_fake_video(2, n_frames=6, w=16, h=12)
    frames = decode_video_frames(v)
    assert frames.shape == (6, 12, 16)
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFFxxxxWAVE")


def test_resize_kernel():
    px = gen_pixels(1, 100, 400, "RGB")
    out = resize_image(px, 200)
    assert max(out.shape[:2]) == 200
    assert resize_image(px, 1000).shape == px.shape  # never upscale


def test_media_pipeline(ray_session):
    t = _media_table()
    assert t.schema.equals(MEDIA_SCHEMA)
    out = media_feature_pipeline(t).to_pandas().sort_values("media_id")
    assert len(out) == 10
    ok = out[out["ok"]]
    assert set(ok["kind"]) == {"image", "audio", "video"}
    bad = out[~out["ok"]]
    assert len(bad) == 1 and "codec_unavailable" in bad.iloc[0]["error"]
    img = ok[ok["kind"] == "image"].iloc[0]
    assert img["feature_a"] == 300.0 and img["thumb"] is not None
    aud = ok[ok["kind"] == "audio"].iloc[0]
    assert abs(aud["feature_a"] - 1.0) < 1e-6  # 1 second


def test_steps_registry(ray_session):
    import ray

    assert {"image_filter", "analyze", "media_features"} <= set(registered_steps())
    with pytest.raises(KeyError):
        get_step("nope")
    # run a one-step chain over a tiny emissions table
    em = pa.table(
        {
            "emit_seq": pa.array([0, 1], pa.int64()),
            "url": pa.array(
                ["https://img-cdn0.example/pic/0/1.png",
                 "https://img-cdn0.example/pic/0/2.jpg"],
                pa.string(),
            ),
            "source_page": pa.array(["s", "s"], pa.string()),
            "depth": pa.array([0, 0], pa.int32()),
        }
    )
    out = run_chain(ray.data.from_arrow(em), ["image_filter"]).to_pandas()
    assert "reason" in out.columns and len(out) == 2


def test_api_payload_extraction():
    body = (
        b'{"items": [{"image": "https://c.example/a.jpg"},'
        b'{"meta": {"thumbnail": "https://c.example/t.png"}}],'
        b'"photo": "https://c.example/p.webp"}'
    )
    urls = extract_images_from_api_payload(body)
    assert urls == [
        "https://c.example/a.jpg",
        "https://c.example/p.webp",
        "https://c.example/t.png",
    ]
    # non-JSON falls back to regex harvest
    raw = b'<x src="https://c.example/z.gif?w=5"> junk'
    assert extract_images_from_api_payload(raw) == [
        "https://c.example/z.gif?w=5"
    ]


def test_events_sessionize_matches_duckdb(ray_session):
    import duckdb

    from snapcrawler_ray.functions.relational import events_sessionize

    sf = "/root/testdata/sf0.001"
    got = events_sessionize(sf, gap_minutes=30)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    want = con.sql(
        """
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
          FROM marked
        )
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM numbered GROUP BY user_id, sess
        ORDER BY user_id, session_start
        """
    ).df()
    got2 = (
        got.to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    want2 = want.reset_index(drop=True)
    assert len(got2) == len(want2)
    pd.testing.assert_frame_equal(
        got2[["user_id", "n_events"]].astype("int64"),
        want2[["user_id", "n_events"]].astype("int64"),
    )
    assert (got2["session_start"].to_numpy() == want2["session_start"].to_numpy()).all()


# ---------------------- M24 optimization step ----------------------


def test_optimize_kernels():
    import numpy as np

    from snapcrawler_ray.imageio.optimize import (
        choose_optimal_format, enhance_contrast, save_parameters,
        smart_crop, unsharp_mask,
    )

    # smart crop drops all-zero borders (Image.getbbox semantics)
    px = np.zeros((10, 12, 3), np.uint8)
    px[2:7, 3:9] = 200
    assert smart_crop(px).shape == (5, 6, 3)
    # flat image: unsharp threshold leaves it untouched
    flat = np.full((8, 8), 100, np.uint8)
    assert (unsharp_mask(flat) == flat).all()
    # contrast blends against the mean: mid-gray fixed point
    assert (enhance_contrast(flat, 1.1) == flat).all()
    # format decision tree (avif unsupported -> webp)
    assert choose_optimal_format("photo", False) == "webp"
    assert choose_optimal_format("logo", True) == "png"
    assert choose_optimal_format("text", False) == "png"
    assert choose_optimal_format("unknown", False) == "webp"
    assert save_parameters("jpeg", "photo") == {"quality": 85, "optimize": True}
    assert save_parameters("webp", "photo") == {"quality": 80, "method": 6}
    assert save_parameters("jpeg", "logo")["quality"] == 95


def test_optimize_step_runs(ray_session):
    """Registered 'optimize' step over synthetic accepted rows: every
    decodable image gets a target format + parseable save params."""
    import json

    import pyarrow as pa
    import ray

    from snapcrawler_ray.sources.corpus import image_file_url
    from snapcrawler_ray.steps import registered_steps, run_chain

    assert "optimize" in registered_steps()
    urls = [image_file_url(0, 1000 + k, "png") for k in range(12)]
    ds = ray.data.from_arrow(
        pa.table({"url": pa.array(urls, pa.string())})
    ).repartition(4)
    out = run_chain(ds, [("optimize", {"max_size": 64})]).to_pandas()
    assert len(out) == 12
    ok = out[out["optimized"]]
    assert len(ok) > 0
    assert set(ok["target_format"].unique()) <= {"png", "webp"}
    for p in ok["save_params"]:
        assert isinstance(json.loads(p), dict)
    assert (ok["out_width"] <= 64).all() and (ok["out_height"] <= 64).all()
    assert ok["bytes"].map(lambda b: b[:8] == b"\x89PNG\r\n\x1a\n").all()
