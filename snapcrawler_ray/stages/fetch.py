"""Corpus-backed fetch: frontier ⋈ corpus hash join, pruned at the read.

In this sandbox "HTTP GET page" (reference crawling_module.py:191-262)
is a lookup of frontier URLs in the Common-Crawl-style corpus table.
The corpus is Parquet partitioned by ``bucket = url_hash64(url) %
corpus_buckets`` (sources/corpus.py), so a round's fetch:

1. hashes the frontier once, computes the set of touched buckets,
2. ``read_parquet`` of ONLY those bucket directories with
   ``columns=['url','html']`` (column pruning — text/lang/warc_ts never
   leave storage),
3. ``map_batches(fetch_extract)`` task pool filters each corpus block
   against the broadcast frontier lookup (``ray.put`` once; worker
   processes cache the deserialized dict per wave, not per batch) and
   runs extraction in the same task, so the html binary never crosses
   a stage boundary (SURVEY.md §7.5 'Wide binary rows').

At 10^10-URL scale the broadcast side is the per-round *frontier*
(bounded by politeness budget × hosts), not the corpus; if the frontier
itself outgrows a broadcast, both sides are already hash-partitioned on
``url_hash`` and the same join runs bucket-aligned (documented
partitioning assumption, SURVEY.md §2.5).

HTTP status simulation: found URLs return 200, with a deterministic
hash-derived sprinkle of 503/429 first-attempts that succeed on retry
(exercising the reference's retry budget {500,502,503,504,408,429}×3,
settings.py:84-85, without changing crawl results).  URLs absent from
the corpus are fetch misses (404-equivalent): the reference returns no
images/links for them but still counts the request.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from ..hashing import url_hash64


def touched_buckets(urls, n_buckets: int) -> list[int]:
    h = url_hash64(urls)
    return sorted(set((h % np.uint64(n_buckets)).astype(int).tolist()))


def bucket_paths(corpus_dir: str, buckets: list[int]) -> list[str]:
    paths = []
    for b in buckets:
        p = os.path.join(corpus_dir, f"bucket={b}")
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet")
            )
    return paths


def simulate_statuses(urls: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(first_attempt_code, attempts) per found url — deterministic.

    hash%97==0 → one 503 then 200; hash%101==0 → one 429 then 200;
    otherwise clean 200.  Retries always succeed within the reference's
    3-retry budget so extraction results are unaffected; politeness
    actors still see the intermediate codes."""
    h = url_hash64(urls)
    attempts = np.ones(len(urls), dtype=np.int32)
    first_code = np.full(len(urls), 200, dtype=np.int32)
    m503 = (h % np.uint64(97)) == 0
    m429 = (h % np.uint64(101)) == 0
    attempts[m503 | m429] = 2
    first_code[m503] = 503
    first_code[m429] = 429
    return first_code, attempts


_EMPTY_JOIN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("html", pa.binary()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("status", pa.int32()),
        ("first_code", pa.int32()),
        ("attempts", pa.int32()),
    ]
)


def make_wave_broadcast(wave: list[tuple[str, int, int]]) -> dict:
    """Array-shaped broadcast of the wave: hash-sorted uint64 keys +
    parallel url/depth/seq arrays.  numpy arrays come back from the
    object store zero-copy, so per-worker 'deserialize the frontier'
    cost is ~0 (a python dict of 10^5 urls was measurably worse at
    high parallelism)."""
    urls = np.asarray([w[0] for w in wave], dtype=object)
    h = url_hash64(urls)
    order = np.argsort(h, kind="stable")
    return {
        "hashes": h[order],
        "urls": pa.array(urls[order], pa.string()),
        "depth": np.asarray([w[1] for w in wave], np.int32)[order],
        "seq": np.asarray([w[2] for w in wave], np.int64)[order],
    }


def join_batch(bc: dict, batch: pa.Table) -> pa.Table:
    """Semi-join one corpus block against the wave broadcast.

    The corpus carries a precomputed ``url_hash`` column (zero-copy
    uint64); membership is a searchsorted against the sorted wave
    hashes, then an Arrow string-equality pass over the hash hits
    rejects 64-bit collisions (a wave-internal collision could still
    shadow a url behind another at ~1e-18 odds — accepted)."""
    hashes = bc["hashes"]
    hh = batch.column("url_hash").to_numpy(zero_copy_only=False)
    pos = np.searchsorted(hashes, hh)
    pos_c = np.clip(pos, 0, len(hashes) - 1)
    hit = (pos < len(hashes)) & (hashes[pos_c] == hh)
    if not hit.any():
        return _EMPTY_JOIN_SCHEMA.empty_table()
    import pyarrow.compute as pc

    hit_idx = np.nonzero(hit)[0]
    wave_pos = pos_c[hit_idx]
    sub_urls = batch.column("url").take(pa.array(hit_idx))
    bc_urls = bc["urls"].take(pa.array(wave_pos))
    ok = pc.equal(sub_urls, bc_urls).to_numpy(zero_copy_only=False)
    hit_idx = hit_idx[ok]
    wave_pos = wave_pos[ok]
    if len(hit_idx) == 0:
        return _EMPTY_JOIN_SCHEMA.empty_table()
    sub = batch.take(pa.array(hit_idx))
    kept = sub.column("url").to_pylist()
    first_code, attempts = simulate_statuses(kept)
    return pa.table(
        {
            "url": sub.column("url"),
            "html": sub.column("html"),
            "depth": pa.array(bc["depth"][wave_pos]),
            "seq": pa.array(bc["seq"][wave_pos]),
            "status": pa.array(np.full(len(kept), 200, dtype=np.int32)),
            "first_code": pa.array(first_code),
            "attempts": pa.array(attempts),
        }
    )


# Per-worker-process cache of broadcast wave arrays: fetched once per
# wave per worker (and zero-copy for the numpy members anyway).
_LOOKUP_CACHE: dict[str, dict] = {}


def _cached_lookup(ref) -> dict:
    key = ref.hex()
    if key not in _LOOKUP_CACHE:
        if len(_LOOKUP_CACHE) > 4:
            _LOOKUP_CACHE.clear()
        _LOOKUP_CACHE[key] = ray.get(ref)
    return _LOOKUP_CACHE[key]


def fetch_extract_wave(
    corpus_dir: str,
    n_buckets: int,
    wave: list[tuple[str, int, int]],
    allowed_domains: list[str],
    min_commons_thumb_px: int = 300,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Fetch+extract a wave of (url, depth, seq) — see module docstring.
    Misses are simply absent from the result."""
    from .extract_stage import ExtractPages

    if not wave:
        raise ValueError("empty wave")
    urls = [w[0] for w in wave]
    paths = bucket_paths(corpus_dir, touched_buckets(urls, n_buckets))
    if not paths:
        return ray.data.from_items([])
    ds = ray.data.read_parquet(paths, columns=["url", "url_hash", "html"])
    frontier_ref = ray.put(make_wave_broadcast(wave))
    extractor = ExtractPages(allowed_domains, min_commons_thumb_px)

    def fetch_extract(batch: pa.Table) -> pa.Table:
        joined = join_batch(_cached_lookup(frontier_ref), batch)
        return extractor(joined)

    return ds.map_batches(fetch_extract, batch_format="pyarrow",
                          batch_size=batch_size)