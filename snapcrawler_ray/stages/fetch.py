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


def user_agent_idx(hashes: np.ndarray, n_agents: int) -> np.ndarray:
    """T12 rotation (reference middlewares.py:10-29): per-request
    User-Agent index into the configured list.  The reference's
    ``random.choice`` is replaced by ``url_hash64(url) % n`` — one
    header per request, uniform over the list, deterministic so the
    exact-mode replay and the visit table agree with what the fetch
    actor actually attached."""
    return (hashes % np.uint64(n_agents)).astype(np.int64)


def user_agent_column(urls, user_agents: tuple) -> pa.Array:
    """Arrow string column of the rotated User-Agent per url — the same
    pure choice the fetch actor applies at request time, recomputed at
    visit-table build so no extra column rides through extraction meta
    or checkpoints."""
    arr = urls.to_numpy(zero_copy_only=False) if hasattr(
        urls, "to_numpy"
    ) else np.asarray(urls, dtype=object)
    idx = user_agent_idx(url_hash64(arr), len(user_agents))
    lut = np.asarray(user_agents, dtype=object)
    return pa.array(lut[idx], pa.string())


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

# the per-round joined block a fetch actor stashes between phases
EXTRACT_JOIN_SCHEMA = _EMPTY_JOIN_SCHEMA.append(
    pa.field("content_md5", pa.string())
)


def make_wave_broadcast(wave) -> dict:
    """Array-shaped broadcast of a pipelines.crawl.Wave: hash-sorted
    uint64 keys + parallel url/depth/seq arrays.  numpy arrays come back
    from the object store zero-copy, so per-worker 'deserialize the
    frontier' cost is ~0 (a python dict of 10^5 urls was measurably
    worse at high parallelism)."""
    h = np.asarray(wave.hashes)
    order = np.argsort(h, kind="stable")
    urls = wave.urls
    if not isinstance(urls, pa.Array):
        urls = pa.array(urls, pa.string())
    return {
        "hashes": h[order],
        "urls": urls.take(pa.array(order)),
        "depth": np.asarray(wave.depths, np.int32)[order],
        "seq": np.asarray(wave.seqs, np.int64)[order],
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


@ray.remote(num_cpus=1)
class FetchExtractShard:
    """One resident fetch worker owning a set of corpus buckets.

    This is the rebuild of the reference's stateful fetch session (T1,
    crawling_module.py:42-78): in a real crawl each actor holds HTTP
    sessions and performs network GETs; in this corpus-backed sandbox it
    instead holds its url-hash partition of the corpus resident
    (url_hash-sorted Arrow table, loaded once in ``__init__``) and
    serves batched fetch+extract RPCs.  The html binary never leaves
    the actor and the extraction metadata tables are returned as object
    refs the driver passes around WITHOUT deserializing — the driver's
    per-round traffic is O(frontier candidates), never O(corpus) or
    O(link mentions).

    Round protocol (two phases so MD5-dup pages are never extracted,
    matching the reference's skip, crawling_module.py:227-234):

    1. ``lookup(token, ...)``: join the wave slice against the resident
       partition, compute content MD5s, stash the joined block; return
       a small summary (seqs found, md5 hash64s, per-host status codes).
    2. driver runs first-seq-wins MD5 dedup via the seen pool;
    3. ``extract(token, dup_seqs, extract_dups)``: extract the live
       rows (dups too when ``extract_dups`` — exact-mode replay needs
       per-url extraction), pre-deduplicate next-wave candidates
       locally in (seq, position) discovery order, and return
       (summary, meta_table) — callers keep the table as a ref."""

    def __init__(self, paths: list[str], allowed_domains: list[str],
                 min_commons_thumb_px: int,
                 user_agents: tuple = ()):
        import pyarrow.parquet as pq

        from .extract_stage import ExtractPages

        # T12: per-request UA rotation — applied at request time (here),
        # tallied in the lookup summary; the visit table recomputes the
        # identical pure choice (user_agent_column)
        self.user_agents = tuple(user_agents)

        cols = ["url", "url_hash", "html"]
        if paths:
            t = pa.concat_tables(
                [pq.read_table(p, columns=cols) for p in paths]
            ).combine_chunks()
        else:
            t = pa.schema(
                [("url", pa.string()), ("url_hash", pa.uint64()),
                 ("html", pa.binary())]
            ).empty_table()
        h = t.column("url_hash").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        self.tbl = t.take(pa.array(order)) if len(order) else t
        self.hashes = self.tbl.column("url_hash").to_numpy(
            zero_copy_only=False
        )
        self.extractor = ExtractPages(allowed_domains, min_commons_thumb_px)
        self._pending: dict[str, tuple[pa.Table, list[str]]] = {}
        # per-round extraction meta accumulated locally (scale mode):
        # serialized off this actor only for checkpoints / final dump
        self._rounds: list[pa.Table] = []
        self._written = 0  # rounds already checkpointed

    def ready(self) -> int:
        return self.tbl.num_rows

    def lookup(self, token: str, urls, hashes: np.ndarray,
               depths: np.ndarray, seqs: np.ndarray) -> dict:
        """Phase 1: join + MD5.  ``urls`` is an Arrow string array
        (zero-copy on both hops).  Returns {n_found, seqs, md5h,
        host_counts (full slice — politeness schedules misses too),
        host_codes (found only), t_busy}; misses are simply absent."""
        import hashlib
        import time as _time

        _t0 = _time.time()

        from ..hashing import url_hash64 as _h64
        from ..urlnorm import hosts_of

        urls_np = np.asarray(urls.to_pylist(), dtype=object)
        all_hosts = hosts_of(urls_np)
        hosts_u, hosts_c = np.unique(all_hosts, return_counts=True)
        host_counts = {
            str(h): int(c) for h, c in zip(hosts_u, hosts_c) if h
        }
        # T12: every request in the slice (hit or miss) gets one rotated
        # User-Agent header; the per-index tally goes back in the
        # summary so the engine's metrics expose the rotation
        ua_counts = (
            np.bincount(
                user_agent_idx(hashes, len(self.user_agents)),
                minlength=len(self.user_agents),
            )
            if self.user_agents
            else np.empty(0, np.int64)
        )
        pos = np.searchsorted(self.hashes, hashes)
        pos_c = np.clip(pos, 0, max(len(self.hashes) - 1, 0))
        hit = (
            (pos < len(self.hashes)) & (self.hashes[pos_c] == hashes)
            if len(self.hashes)
            else np.zeros(len(hashes), dtype=bool)
        )
        hit_idx = np.nonzero(hit)[0]
        if len(hit_idx):
            import pyarrow.compute as pc

            sub = self.tbl.take(pa.array(pos_c[hit_idx]))
            ok = pc.equal(
                sub.column("url"), pa.array(urls_np[hit_idx], pa.string())
            ).to_numpy(zero_copy_only=False)
            hit_idx = hit_idx[ok]
        if len(hit_idx) == 0:
            self._pending[token] = (None, [])
            return {"n_found": 0, "seqs": np.empty(0, np.int64),
                    "md5h": np.empty(0, np.uint64),
                    "host_counts": host_counts, "host_codes": {},
                    "ua_counts": ua_counts,
                    "t_busy": _time.time() - _t0}
        sub = self.tbl.take(pa.array(pos_c[hit_idx]))
        kept = sub.column("url").to_pylist()
        first_code, attempts = simulate_statuses(kept)
        md5s = [
            hashlib.md5(h).hexdigest() if h is not None else ""
            for h in sub.column("html").to_pylist()
        ]
        joined = pa.table(
            {
                "url": sub.column("url"),
                "html": sub.column("html"),
                "depth": pa.array(depths[hit_idx]),
                "seq": pa.array(seqs[hit_idx]),
                "status": pa.array(
                    np.full(len(kept), 200, dtype=np.int32)
                ),
                "first_code": pa.array(first_code),
                "attempts": pa.array(attempts),
                "content_md5": pa.array(md5s, pa.string()),
            }
        )
        self._pending[token] = (joined, md5s)
        hosts = hosts_of(np.asarray(kept, dtype=object))
        host_codes: dict[str, np.ndarray] = {}
        for hname in pd_unique(hosts):
            host_codes[hname] = first_code[hosts == hname]
        return {
            "n_found": len(kept),
            "seqs": seqs[hit_idx],
            "md5h": _h64(np.asarray(md5s, dtype=object)),
            "host_counts": host_counts,
            "host_codes": host_codes,
            "ua_counts": ua_counts,
            "t_busy": _time.time() - _t0,
        }

    def _do_extract(self, token: str, dup_seqs: np.ndarray,
                    extract_dups: bool) -> tuple[dict, pa.Table]:
        joined, _md5s = self._pending.pop(token)
        return self._extract_table(joined, dup_seqs, extract_dups)

    def _extract_table(self, joined: pa.Table | None,
                       dup_seqs: np.ndarray,
                       extract_dups: bool) -> tuple[dict, pa.Table]:
        """Phase 2 kernel: extraction + local candidate pre-dedup over
        one joined table (a whole partition or a stolen chunk — the
        per-part first-appearance dedup is an optimization; the driver
        merge re-dedups by global key, so part boundaries cannot
        change results).

        Candidate keys are ``seq * 2**20 + position`` — sorting by key
        reproduces the global (seq, position) discovery order."""
        import time as _time

        _t0 = _time.time()
        if joined is None or joined.num_rows == 0:
            return (
                {"n_rows": 0, "n_live": 0, "n_images": 0,
                 "casc": _empty_cand(), "links": _empty_cand(),
                 "t_busy": 0.0, "t_extract": 0.0},
                EXTRACT_META_WITH_DUP_SCHEMA.empty_table(),
            )
        seqs = joined.column("seq").to_numpy(zero_copy_only=False)
        dup = np.isin(seqs, dup_seqs)
        ext_mask = np.ones(len(dup), dtype=bool) if extract_dups else ~dup
        ext_in = joined.filter(pa.array(ext_mask))
        _te0 = _time.time()
        meta_ext = self.extractor(ext_in)
        _t_extract = _time.time() - _te0
        parts = [meta_ext.append_column(
            "dup", pa.array(dup[ext_mask], pa.bool_())
        )]
        if not extract_dups and dup.any():
            stub_src = joined.filter(pa.array(dup)).drop_columns(["html"])
            n_stub = stub_src.num_rows
            empty_list = pa.array(
                [[]] * n_stub, pa.list_(pa.string())
            )
            stub = stub_src.append_column(
                "text", pa.array([""] * n_stub, pa.string())
            )
            for c in ("image_urls", "image_page_urls", "links"):
                stub = stub.append_column(c, empty_list)
            stub = stub.append_column(
                "dup", pa.array(np.ones(n_stub, dtype=bool))
            )
            parts.append(stub.select(parts[0].column_names))
        meta = pa.concat_tables(parts) if len(parts) > 1 else parts[0]
        live = meta.filter(
            pa.array(~meta.column("dup").to_numpy(zero_copy_only=False))
        )
        import pyarrow.compute as pc

        n_images = int(
            pc.sum(pc.list_value_length(live.column("image_urls"))).as_py()
            or 0
        )
        summary = {
            "n_rows": meta.num_rows,
            "n_live": live.num_rows,
            "n_images": n_images,
            "casc": _local_candidates(live, "image_page_urls", 0),
            "links": _local_candidates(live, "links", 1),
            "t_busy": _time.time() - _t0,
            "t_extract": _t_extract,
        }
        return summary, meta.select(
            [f.name for f in EXTRACT_META_WITH_DUP_SCHEMA]
        )

    def extract_with_meta(self, token: str, dup_seqs: np.ndarray,
                          extract_dups: bool) -> tuple[dict, pa.Table]:
        """Exact-mode phase 2: meta table returned to the caller (the
        replay needs per-url extraction on the driver)."""
        return self._do_extract(token, dup_seqs, extract_dups)

    def extract_local(self, token: str, dup_seqs: np.ndarray) -> dict:
        """Scale-mode phase 2 (whole-partition form, kept for small
        pools): the meta table stays resident on this actor (slimmed —
        candidate link lists are already folded into the summary, so
        only output-relevant columns are kept); one summary dict
        crosses the wire per round."""
        summary, meta = self._do_extract(token, dup_seqs, False)
        self._rounds.append(meta.select(SCALE_META_COLS))
        return summary

    def take_block(self, token: str) -> pa.Table:
        """Scale-mode phase 2a: pop this round's joined block into the
        object store (the RETURN lands in plasma; the driver keeps the
        ref without deserializing).  On one node plasma is shared
        memory, so any actor can then extract any chunk of any block
        zero-copy — the basis of the work-stealing extract phase."""
        joined, _md5s = self._pending.pop(token)
        if joined is None:
            return EXTRACT_JOIN_SCHEMA.empty_table()
        return joined

    def extract_chunk(self, block: pa.Table, lo: int, hi: int,
                      dup_seqs: np.ndarray) -> dict:
        """Scale-mode phase 2b: extract rows [lo, hi) of a (possibly
        another actor's) joined block.  Ray auto-dereferences the block
        ref argument zero-copy from plasma.  Meta stays resident on
        WHICHEVER actor ran the chunk — checkpoint part files and the
        final dump are unions over actors, so attribution is free."""
        if hi > block.num_rows:
            # chunk ranges are sized from the lookup summaries'
            # n_found; pa.Table.slice would silently CLAMP an
            # out-of-range window (dropping pages from the round), so
            # any drift between n_found and the stashed block must
            # fail loudly here
            raise RuntimeError(
                f"extract_chunk [{lo},{hi}) exceeds joined block of "
                f"{block.num_rows} rows — n_found/stash drift"
            )
        summary, meta = self._extract_table(
            block.slice(lo, hi - lo), dup_seqs, False
        )
        self._rounds.append(meta.select(SCALE_META_COLS))
        return summary

    def write_round_checkpoint(self, dir_path: str, part: int) -> int:
        """Write this partition's LAST round of extraction meta as its
        own parquet part file (per-partition checkpoint lineage)."""
        import pyarrow.parquet as pq

        pending = self._rounds[self._written:]
        t = (
            pa.concat_tables(pending)
            if pending
            else pa.schema(
                [
                    EXTRACT_META_WITH_DUP_SCHEMA.field(n)
                    for n in SCALE_META_COLS
                ]
            ).empty_table()
        )
        self._written = len(self._rounds)
        tmp = os.path.join(dir_path, f".part-{part:04d}.parquet.tmp")
        pq.write_table(t, tmp)
        os.replace(tmp, os.path.join(dir_path, f"part-{part:04d}.parquet"))
        return t.num_rows

    def dump_meta(self) -> pa.Table:
        """All rounds' meta for this partition (final output build)."""
        if not self._rounds:
            return pa.schema(
                [
                    EXTRACT_META_WITH_DUP_SCHEMA.field(n)
                    for n in SCALE_META_COLS
                ]
            ).empty_table()
        return pa.concat_tables(self._rounds)


def pd_unique(arr: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.unique(arr)


def _empty_cand() -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    return (
        pa.array([], pa.string()), np.empty(0, np.int32),
        np.empty(0, np.int64), np.empty(0, np.uint64),
    )


def _local_candidates(
    live: pa.Table, list_col: str, depth_offset: int
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """(urls: Arrow string array, depths, keys, url_hash64s) of this
    partition's candidates, first-appearance deduped locally, key =
    seq * 2**20 + position-in-page (global discovery order when merged
    and key-sorted).  Urls stay Arrow and hashes are precomputed here
    so the driver never touches candidate python strings."""
    import pyarrow.compute as pc

    lists = live.column(list_col)
    flat = pc.list_flatten(lists)
    if len(flat) == 0:
        return _empty_cand()
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    seqs = live.column("seq").to_numpy(zero_copy_only=False)[parents]
    depths = (
        live.column("depth").to_numpy(zero_copy_only=False)[parents]
        + depth_offset
    )
    # position within each page's list
    starts = np.nonzero(np.diff(parents, prepend=-1))[0]
    pos = np.arange(len(parents)) - starts[
        np.searchsorted(starts, np.arange(len(parents)), side="right") - 1
    ]
    keys = seqs * np.int64(1 << 20) + pos
    # rows are in (seq, position) order already within this partition:
    # dictionary_encode keeps first appearance
    enc = flat.combine_chunks().dictionary_encode()
    idx = enc.indices.to_numpy(zero_copy_only=False)
    _, first_pos = np.unique(idx, return_index=True)
    from ..hashing import url_hash64 as _h64

    uniq = enc.dictionary
    return (
        uniq,
        depths[first_pos].astype(np.int32),
        keys[first_pos],
        _h64(uniq.to_numpy(zero_copy_only=False)),
    )


EXTRACT_META_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("seq", pa.int64()),
        ("status", pa.int32()),
        ("first_code", pa.int32()),
        ("attempts", pa.int32()),
        ("content_md5", pa.string()),
        ("image_urls", pa.list_(pa.string())),
        ("image_page_urls", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
    ]
)

EXTRACT_META_WITH_DUP_SCHEMA = EXTRACT_META_SCHEMA.append(
    pa.field("dup", pa.bool_())
)

# Scale-mode resident meta keeps only output-relevant columns (the
# candidate lists are folded into round summaries; links never need to
# be materialized again)
SCALE_META_COLS = [
    "url", "depth", "seq", "status", "first_code", "attempts",
    "content_md5", "image_urls", "dup",
]


class FetchPool:
    """Driver-side handle: resident fetch+extract actor pool.

    Buckets are assigned ``bucket % pool_size``; a wave is routed by
    ``url_hash % n_buckets % pool_size`` — one lookup RPC + one extract
    RPC per actor per (sub)round.  Meta tables come back as object refs
    the driver never deserializes; the driver-side merge work is
    O(unique candidates), all numpy/Arrow."""

    def __init__(self, corpus_dir: str, n_buckets: int,
                 allowed_domains: list[str], min_commons_thumb_px: int,
                 pool_size: int | None = None,
                 user_agents: tuple = ()):
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if pool_size is None:
            # one actor per CPU: actors hold whole num_cpus=1 slots so
            # the measured parallelism level is honest (fractional
            # actors would timeshare more physical cores than the
            # ray.init budget and fake the scaling signal).  Reserving
            # slots for driver/raylet was tried and REFUTED (ABAB at
            # 32 CPUs: reserve=2 measured 16.1-17.6 s vs 14.7-15.7 s
            # at reserve=0, same total busy, same max/avg tail) — the
            # straggler tail is per-core co-tenant slowness, which the
            # work-stealing extract phase addresses instead.
            pool_size = max(1, min(n_buckets, cpus))
        self.n_buckets = n_buckets
        self.pool_size = pool_size
        self.actors = []
        for a in range(pool_size):
            buckets = [b for b in range(n_buckets) if b % pool_size == a]
            self.actors.append(
                FetchExtractShard.remote(
                    bucket_paths(corpus_dir, buckets), allowed_domains,
                    min_commons_thumb_px, user_agents=user_agents,
                )
            )
        self._token_ctr = 0

    def wait_ready(self) -> int:
        return int(sum(ray.get([a.ready.remote() for a in self.actors])))

    def lookup(self, wave) -> tuple[list[int], list[dict]]:
        """Phase 1 fan-out.  ``wave.urls`` is an Arrow string array and
        ``wave.hashes`` its precomputed url_hash64s — slicing and
        routing never materialize python strings on the driver.
        Returns (participating actor ids, summaries, in actor order)."""
        self._token_ctr += 1
        self._token = f"t{self._token_ctr}"
        urls, depths, seqs = wave.urls, wave.depths, wave.seqs
        h = wave.hashes
        actor_of = (
            (h % np.uint64(self.n_buckets)).astype(np.int64) % self.pool_size
        )
        refs, ids = [], []
        for a in range(self.pool_size):
            idx = np.nonzero(actor_of == a)[0]
            if len(idx):
                pidx = pa.array(idx)
                refs.append(
                    self.actors[a].lookup.remote(
                        self._token, urls.take(pidx), h[idx], depths[idx],
                        seqs[idx],
                    )
                )
                ids.append(a)
        return ids, ray.get(refs)

    def extract(self, ids: list[int], dup_seqs: np.ndarray,
                extract_dups: bool,
                counts: list[int] | None = None) -> tuple[list[dict], list]:
        """Phase 2 fan-out.

        Exact mode (``extract_dups``): meta tables are returned as
        object refs the driver can absorb for the replay; each actor
        extracts its own partition.  Scale mode: WORK-STEALING — each
        participating actor pops its joined block into plasma (one
        node's plasma is shared memory; on a cluster Ray ships blocks
        only when a remote actor actually steals), the blocks are cut
        into ~4-per-CPU chunks, and a ray.wait feeder hands the next
        chunk to whichever actor finishes first.  The round barrier
        then waits for one CHUNK, not the slowest whole partition —
        this absorbs both per-core co-tenant slowness (measured 25%
        busy-time spread at 32/32 CPUs) and per-partition skew (a hot
        host's bucket at 100-TB scale).  Meta stays resident on
        whichever actor extracted each chunk — checkpoints and the
        final dump are unions over actors, so attribution is free.
        ``counts`` (found rows per participating actor, from the
        lookup summaries) sizes the chunks."""
        if extract_dups:
            pairs = [
                self.actors[a].extract_with_meta.options(
                    num_returns=2
                ).remote(self._token, dup_seqs, True)
                for a in ids
            ]
            summaries = ray.get([p[0] for p in pairs])
            return summaries, [p[1] for p in pairs]
        if counts is None or os.environ.get("SNAPRAY_NO_STEAL") == "1":
            refs = [
                self.actors[a].extract_local.remote(self._token, dup_seqs)
                for a in ids
            ]
            return ray.get(refs), []
        # ---- work-stealing chunk feed -------------------------------
        total = int(sum(counts))
        if total == 0:
            # still pop every pending stash (token hygiene)
            for a in ids:
                self.actors[a].take_block.remote(self._token)
            return [], []
        chunk_rows = max(256, -(-total // (self.pool_size * 4)))
        blocks = {}
        for a, c in zip(ids, counts):
            ref = self.actors[a].take_block.remote(self._token)
            if c > 0:
                blocks[a] = ref  # c == 0: pop-for-hygiene only
        pending: dict[int, list[tuple[int, int]]] = {}
        for a, c in zip(ids, counts):
            if c > 0:
                pending[a] = [
                    (lo, min(lo + chunk_rows, c))
                    for lo in range(0, c, chunk_rows)
                ][::-1]  # pop() walks the block front-to-back

        def submit(actor: int) -> "ray.ObjectRef | None":
            # prefer the actor's own block (its take_block is queued on
            # the same actor, and self-chunks skip a plasma hop), then
            # steal from the source with the most remaining chunks
            src = actor if pending.get(actor) else None
            if src is None:
                src = max(pending, key=lambda s: len(pending[s]),
                          default=None)
                if src is None:
                    return None
            lo, hi = pending[src].pop()
            if not pending[src]:
                del pending[src]
            return self.actors[actor].extract_chunk.remote(
                blocks[src], lo, hi, dup_seqs
            )

        inflight: dict = {}
        for actor in range(self.pool_size):
            r = submit(actor)
            if r is None:
                break
            inflight[r] = actor
        summaries: list[dict] = []
        while inflight:
            done, _ = ray.wait(list(inflight), num_returns=1)
            for ref in done:
                actor = inflight.pop(ref)
                summaries.append(ray.get(ref))
                r = submit(actor)
                if r is not None:
                    inflight[r] = actor
        return summaries, []

    def write_round_checkpoint(self, dir_path: str) -> None:
        ray.get(
            [
                a.write_round_checkpoint.remote(dir_path, i)
                for i, a in enumerate(self.actors)
            ]
        )

    def dump_meta_refs(self) -> list:
        """Kick off per-actor meta dumps; returns refs (objects outlive
        the actors once the tasks complete)."""
        refs = [a.dump_meta.remote() for a in self.actors]
        ray.wait(refs, num_returns=len(refs), fetch_local=False)
        return refs

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


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

    if not len(wave):
        raise ValueError("empty wave")
    buckets = sorted(
        set((np.asarray(wave.hashes) % np.uint64(n_buckets))
            .astype(int).tolist())
    )
    paths = bucket_paths(corpus_dir, buckets)
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