"""Multimodal (image/audio/video) binary-column stages.

At 100-TB scale, media payloads are opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages with
small batch sizes (payload × batch_size × concurrency must fit worker
heap — SURVEY.md 'Memory-aware').  The Ray-side plumbing here (schemas,
actor signatures, batch sizing, output layout) is real and tested;
the codec kernels themselves are gated:

- images: REAL decode for PNG/BMP via imageio (no PIL in this
  container), resize is a real numpy kernel;
- audio/video: no ffmpeg/soundfile exists here, so ``decode`` raises
  ``NotImplementedError`` unless the payload is our deterministic fake
  container (``FAKE1`` header + raw samples/frame dims) — the fake is
  clearly marked and exists so the distributed plumbing can be driven
  end-to-end in tests.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .imageio.formats import decode_pixels, parse_info
from .imageio.png import encode_png

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)

_FAKE_AUDIO_MAGIC = b"FAKE1AUD"
_FAKE_VIDEO_MAGIC = b"FAKE1VID"

# per-kind decode primitives (nullable per field) — the integer inputs
# the media_features SQL oracle re-composes feature_a / feature_b from
MEDIA_PRIMS_TYPE = pa.struct(
    [
        ("width", pa.int64()),       # image
        ("n_vals", pa.int64()),      # image: resized pixel-value count
        ("luma_sum", pa.int64()),    # image: exact pixel-value sum
        ("n_samples", pa.int64()),   # audio
        ("rate", pa.int64()),        # audio
        ("sum_sq", pa.int64()),      # audio: exact Σ s_int16²
        ("n_frames", pa.int64()),    # video
        ("stride", pa.int64()),      # video: frame-sample stride
    ]
)


def make_fake_audio(seed: int, n_samples: int = 16000, rate: int = 16000) -> bytes:
    """Deterministic fake audio container: magic + rate + int16 samples."""
    rng = np.random.RandomState(seed % (2**32))
    t = np.arange(n_samples) / rate
    f = 110 + (seed % 40) * 10
    wave = (np.sin(2 * np.pi * f * t) * 0.5 + rng.normal(0, 0.05, n_samples))
    samples = (np.clip(wave, -1, 1) * 32767).astype(np.int16)
    return _FAKE_AUDIO_MAGIC + struct.pack("<I", rate) + samples.tobytes()


def make_fake_video(seed: int, n_frames: int = 8, w: int = 32, h: int = 24) -> bytes:
    """Deterministic fake video: magic + dims + gray frames."""
    rng = np.random.RandomState(seed % (2**32))
    frames = rng.randint(0, 256, size=(n_frames, h, w), dtype=np.uint8)
    return _FAKE_VIDEO_MAGIC + struct.pack("<HHH", n_frames, w, h) + frames.tobytes()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (float32 samples, sample_rate).  Real deployments plug
    soundfile/ffmpeg here; only the marked fake container decodes in
    this sandbox."""
    if payload[:8] == _FAKE_AUDIO_MAGIC:
        (rate,) = struct.unpack_from("<I", payload, 8)
        samples = np.frombuffer(payload, dtype=np.int16, offset=12)
        return samples.astype(np.float32) / 32767.0, rate
    raise NotImplementedError(
        "no audio codec in this container (would be soundfile/ffmpeg)"
    )


def decode_video_frames(payload: bytes) -> np.ndarray:
    """→ (n_frames, H, W) uint8.  Same stub contract as decode_audio."""
    if payload[:8] == _FAKE_VIDEO_MAGIC:
        n, w, h = struct.unpack_from("<HHH", payload, 8)
        return np.frombuffer(payload, dtype=np.uint8, offset=14).reshape(n, h, w)
    raise NotImplementedError(
        "no video codec in this container (would be ffmpeg/pyav)"
    )


def resize_image(px: np.ndarray, max_side: int) -> np.ndarray:
    """Real nearest-neighbor resize kernel (M24's resize step)."""
    h, w = px.shape[:2]
    scale = max_side / max(h, w)
    if scale >= 1:
        return px
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    ys = (np.arange(nh) * h // nh).clip(0, h - 1)
    xs = (np.arange(nw) * w // nw).clip(0, w - 1)
    return px[np.ix_(ys, xs)]


class MediaFeatureStage:
    """Actor-pool stage: media rows → typed feature columns.

    images → (width, height, mean_luma); audio → (duration_s, rms);
    video → (n_frames, sampled frame count).  Undecodable payloads get
    ``ok=False`` + error kind instead of poisoning the batch (dead-letter
    column, not a crash — SURVEY.md §4 retries row)."""

    def __init__(self, frame_stride: int = 4, image_max_side: int = 256):
        self.frame_stride = frame_stride
        self.image_max_side = image_max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        ok, err, f1, f2, thumbs, prims = [], [], [], [], [], []
        for kind, payload in zip(kinds, payloads):
            try:
                if kind == "image":
                    info = parse_info(payload)
                    px = decode_pixels(payload, info)
                    small = resize_image(px, self.image_max_side)
                    # integer primitives: the pixel-value sum is exact in
                    # float64 (np.mean's pairwise sums of ≤2^53 integers
                    # are exact additions), so mean == luma_sum / n_vals
                    # as ONE double division — the SQL oracle replays it
                    luma_sum = int(small.sum(dtype=np.int64))
                    n_vals = int(small.size)
                    luma = luma_sum / n_vals
                    thumb = encode_png(
                        small if small.ndim == 2 else small[..., :3]
                    )
                    f1.append(float(info.width))
                    f2.append(luma)
                    thumbs.append(thumb)
                    prims.append({"width": info.width, "n_vals": n_vals,
                                  "luma_sum": luma_sum})
                elif kind == "audio":
                    samples, rate = decode_audio(payload)
                    n = len(samples)
                    # exact-integer RMS over the recovered int16 samples:
                    # sqrt(sum(s²) / (n · 32767²)).  Both division
                    # operands are exactly representable doubles
                    # (sum_sq < 2^53 for any clip under ~2.3 h), so the
                    # SQL oracle's sqrt sees the identical quotient —
                    # unlike the former float32 pairwise mean, which no
                    # SQL engine could replay
                    ints = np.rint(
                        samples.astype(np.float64) * 32767.0
                    ).astype(np.int64)
                    sum_sq = int((ints * ints).sum())
                    f1.append(n / rate)
                    f2.append(math.sqrt(sum_sq / (n * 1073676289)))
                    thumbs.append(None)
                    prims.append({"n_samples": n, "rate": rate,
                                  "sum_sq": sum_sq})
                elif kind == "video":
                    frames = decode_video_frames(payload)
                    sampled = frames[:: self.frame_stride]
                    f1.append(float(len(frames)))
                    f2.append(float(len(sampled)))
                    thumbs.append(encode_png(sampled[0]) if len(sampled) else None)
                    prims.append({"n_frames": len(frames),
                                  "stride": self.frame_stride})
                else:
                    raise ValueError(f"unknown kind {kind}")
                ok.append(True)
                err.append("")
            except NotImplementedError as e:
                ok.append(False)
                err.append(f"codec_unavailable: {e}")
                f1.append(0.0)
                f2.append(0.0)
                thumbs.append(None)
                prims.append(None)
            except Exception as e:
                ok.append(False)
                err.append(f"{type(e).__name__}: {e}")
                f1.append(0.0)
                f2.append(0.0)
                thumbs.append(None)
                prims.append(None)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "ok": pa.array(ok, pa.bool_()),
                "error": pa.array(err, pa.string()),
                "feature_a": pa.array(f1, pa.float64()),
                "feature_b": pa.array(f2, pa.float64()),
                "thumb": pa.array(thumbs, pa.binary()),
                "prims": pa.array(prims, MEDIA_PRIMS_TYPE),
            }
        )


def media_feature_pipeline(
    media: pa.Table, concurrency=(1, 4), batch_size: int = 16
):
    """media table → feature Dataset via the actor-pool stage.  Small
    batch_size on purpose: payload bytes ride through the batch."""
    import ray

    return ray.data.from_arrow(media).map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
