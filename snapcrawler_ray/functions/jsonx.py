"""AJAX/JSON-payload image harvesting (rebuild of M11,
middlewares.py:160-257 / network_capture.py:203-287).

The reference intercepts API responses and pulls image URLs either by
recursive JSON walk (keys image/thumbnail/photo/picture — same walk as
the spider's JSON-LD path) or by regex over the raw body when it is
not valid JSON.  Corpus-side this is a ``flat_map`` over rows carrying
API payloads."""

from __future__ import annotations

import json
import re

from ..html.extended import _from_json, is_image_url_ext

_URL_RE = re.compile(
    r'https?://[^\s"\'<>]+?\.(?:jpg|jpeg|png|gif|webp|svg)(?:\?[^\s"\'<>]*)?',
    re.IGNORECASE,
)


def extract_images_from_api_payload(body: bytes | str) -> list[str]:
    """→ sorted unique image URLs from a JSON (or JSON-ish) payload."""
    if isinstance(body, (bytes, bytearray, memoryview)):
        body = bytes(body).decode("utf-8", errors="replace")
    urls: list[str] = []
    try:
        data = json.loads(body)
        urls.extend(_from_json(data))
    except (json.JSONDecodeError, ValueError):
        urls.extend(_URL_RE.findall(body))
    return sorted({u for u in urls if is_image_url_ext(u.split("?", 1)[0])})


def api_payload_flat_map(batch):
    """pyarrow map_batches fn: rows (url, body:binary) → one row per
    harvested image url."""
    import pyarrow as pa

    src, out = [], []
    for u, b in zip(
        batch.column("url").to_pylist(), batch.column("body").to_pylist()
    ):
        for img in extract_images_from_api_payload(b):
            src.append(u)
            out.append(img)
    return pa.table(
        {
            "source_url": pa.array(src, pa.string()),
            "image_url": pa.array(out, pa.string()),
        }
    )
