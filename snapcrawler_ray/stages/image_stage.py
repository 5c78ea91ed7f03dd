"""Image download + filter as one fused Arrow-batch actor stage.

Input rows: (emit_seq, url, source_page, depth).  The stage synthesizes
the bytes (sandbox stand-in for HTTP GET — deterministic in the URL,
imageio/synth.py), runs the local filter chain F1–F6/F8/F9
(imageio/filters.py) and emits *metadata only*: the pipeline decides
the global pHash dedup (F7), and accepted bytes are regenerated in the
final write stage rather than shipping every candidate's payload
through the shuffle (with a real network downloader the bytes column
would flow through instead — same topology, bigger blocks, smaller
``batch_size``)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import ImageFilterConfig
from ..imageio.filters import filter_image
from ..imageio.synth import synth_image_bytes


class ImageFetchFilter:
    def __init__(self, cfg: ImageFilterConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.filter_batch(batch)

    def filter_batch(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        reasons, fmts, ws, hs, modes, aspects, phashes, regions = (
            [], [], [], [], [], [], [], [],
        )
        sizes = []
        for url in urls:
            data, content_type = synth_image_bytes(url)
            if not content_type.startswith("image/"):
                # Content-Type skip (filtering_module.py:194-197)
                r = {"reason": "content_type", "format": "", "width": 0,
                     "height": 0, "mode": "", "aspect": 0.0, "phash": 0,
                     "watermark_regions": 0}
            else:
                r = filter_image(url, data, self.cfg)
            sizes.append(len(data))
            reasons.append(r["reason"])
            fmts.append(r["format"])
            ws.append(r["width"])
            hs.append(r["height"])
            modes.append(r["mode"])
            aspects.append(r["aspect"])
            phashes.append(r["phash"])
            regions.append(r["watermark_regions"])
        return pa.table(
            {
                "emit_seq": batch.column("emit_seq"),
                "url": batch.column("url"),
                "source_page": batch.column("source_page"),
                "depth": batch.column("depth"),
                "reason": pa.array(reasons, pa.string()),
                "format": pa.array(fmts, pa.string()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "mode": pa.array(modes, pa.string()),
                "aspect": pa.array(aspects, pa.float64()),
                "phash": pa.array(np.asarray(phashes, dtype=np.uint64)),
                "watermark_regions": pa.array(regions, pa.int32()),
                # payload size feeds the max_folder_size_mb byte budget
                # (reference filtering_module.py:121-129)
                "size_bytes": pa.array(sizes, pa.int64()),
            }
        )


class MaterializeAccepted:
    """Regenerate and attach bytes for accepted rows (final stage before
    the Parquet sink — the 'downloads/processed/' equivalent)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        payloads = [synth_image_bytes(u)[0] for u in urls]
        return batch.append_column("bytes", pa.array(payloads, pa.binary()))
