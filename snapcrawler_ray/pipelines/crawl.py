"""The crawl engine: BFS rounds as streaming Ray Data pipelines.

Ray Data cannot express the crawl's feedback edge (frontier at depth d
produces frontier at depth d+1), so the driver loops over rounds; each
round is one streaming pipeline (SURVEY.md §1.3, §7.0):

    wave_d ── politeness schedule (per-host actor pool, virtual time)
           ── fetch: pruned bucket read ⋈ broadcast frontier (stages/fetch.py)
           ── map_batches(ExtractPages) → extraction metadata
           ── cascade closure: image-page URLs re-enter the SAME round
           ── links → seen-filter actor pool check_and_add → wave_{d+1}

Two modes (SURVEY.md §2.6):

- ``exact`` (verification): seen shards hold exact sets and, after the
  rounds complete, a reference-semantics replay (pipelines/replay.py)
  over the collected extraction metadata reproduces the reference's
  exact visit order, seen-set, MD5-dedup decisions and image-emission
  order.  The distributed rounds fetch a *superset* level by level
  (speculative fetches of pages the replay will later skip as
  MD5-dups are wasted work, never wrong).
- ``scale``: seen shards are Bloom filters, no driver-side replay; the
  visit order is the engine's deterministic round-synchronous order
  (rounds ascending, then enqueue seq) and MD5 dedup is first-seq-wins
  via the seen pool — same winners as the reference except where its
  serial cascade interleaving differs from round order (documented
  deviation; the exact mode exists precisely to verify parity).

Checkpoints: after each round the engine writes the extraction
metadata, the next wave, seen/politeness shard dumps and a manifest
(round, shard count, budgets, corpus fingerprint) under
``checkpoint_dir`` — a killed run resumes at the last complete round
with identical state (north rule; SURVEY.md §7.2 step 8).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..hashing import url_hash64
from ..state.limits import LimitsActor
from ..state.politeness import PolitenessPool
from ..state.seen import SeenFilterPool
from ..stages.fetch import fetch_extract_wave
from ..urlnorm import hosts_of
from .replay import CrawlTrace, replay_crawl

META_COLS = [
    "url", "depth", "seq", "status", "first_code", "attempts",
    "content_md5", "image_urls", "image_page_urls", "links",
]


@dataclass
class CrawlResult:
    visits: pa.Table
    emissions: pa.Table
    seen_urls: list[str]
    metrics: list[dict] = field(default_factory=list)
    trace: CrawlTrace | None = None
    out_dir: str | None = None


def _visits_table(trace: CrawlTrace) -> pa.Table:
    v = trace.visits
    return pa.table(
        {
            "seq": pa.array([x["seq"] for x in v], pa.int64()),
            "url": pa.array([x["url"] for x in v], pa.string()),
            "depth": pa.array([x["depth"] for x in v], pa.int32()),
            "cascade": pa.array([x["cascade"] for x in v], pa.bool_()),
            "status": pa.array([x["status"] for x in v], pa.string()),
            "n_images": pa.array([x["n_images"] for x in v], pa.int32()),
            "new_links": pa.array([x["new_links"] for x in v], pa.int32()),
        }
    )


def _emissions_table(trace: CrawlTrace) -> pa.Table:
    e = trace.image_emissions
    return pa.table(
        {
            "emit_seq": pa.array([x["emit_seq"] for x in e], pa.int64()),
            "url": pa.array([x["url"] for x in e], pa.string()),
            "source_page": pa.array([x["source_page"] for x in e], pa.string()),
            "depth": pa.array([x["depth"] for x in e], pa.int32()),
        }
    )


class CrawlEngine:
    def __init__(
        self,
        corpus_dir: str,
        seeds: list[str],
        config: CrawlConfig | None = None,
        n_buckets: int | None = None,
        mode: str = "exact",
        checkpoint_dir: str | None = None,
    ):
        self.corpus_dir = corpus_dir
        self.seeds = list(seeds)
        self.cfg = config or CrawlConfig(start_urls=tuple(seeds))
        self.n_buckets = n_buckets or self.cfg.scale.corpus_buckets
        self.mode = mode
        self.checkpoint_dir = checkpoint_dir
        self.allowed_domains = sorted(
            {h for h in hosts_of(self.seeds) if h}
        )
        seen_mode = "exact" if mode == "exact" else self.cfg.scale.seen_mode
        self.seen = SeenFilterPool(
            n_shards=self.cfg.scale.seen_shards,
            mode=seen_mode,
            bloom_capacity=self.cfg.scale.bloom_capacity,
            bloom_bits_per_key=self.cfg.scale.bloom_bits_per_key,
        )
        self.politeness = PolitenessPool(self.cfg.politeness, n_shards=4)
        self.limits = LimitsActor.remote(
            max_requests=self.cfg.limits.max_requests,
            max_images=self.cfg.limits.max_images,
        )
        self.metrics: list[dict] = []
        # Warm the Ray Data worker pool once (first pipeline in a fresh
        # session pays ~3 s of worker startup; that is cluster warmup,
        # not crawl throughput — keep it out of the round loop).
        import ray.data as _rd

        _rd.range(8, override_num_blocks=4).map_batches(
            lambda b: b, batch_format="pyarrow"
        ).count()
        # exact-mode replay source: url -> extraction row (None kept
        # implicit — replay's get() returns None for misses)
        self._meta: dict[str, dict] = {}
        # scale-mode fallback when no checkpoint_dir is configured
        self._round_tables: list[pa.Table] = []

    # ---------------- checkpointing ----------------

    def _ckpt_round_dir(self, r: int) -> str:
        return os.path.join(self.checkpoint_dir, f"round={r}")

    def _write_checkpoint(self, r: int, wave_next: list[tuple[str, int, int]],
                          meta_tbl: pa.Table, seq_counter: int) -> None:
        if not self.checkpoint_dir:
            return
        d = self._ckpt_round_dir(r)
        os.makedirs(d, exist_ok=True)
        pq.write_table(meta_tbl, os.path.join(d, "extract.parquet"))
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([w[0] for w in wave_next], pa.string()),
                    "depth": pa.array([w[1] for w in wave_next], pa.int32()),
                    "seq": pa.array([w[2] for w in wave_next], pa.int64()),
                }
            ),
            os.path.join(d, "wave_next.parquet"),
        )
        with open(os.path.join(d, "seen.pkl"), "wb") as f:
            pickle.dump(self.seen.dump_all(), f)
        with open(os.path.join(d, "politeness.pkl"), "wb") as f:
            pickle.dump(self.politeness.dump_all(), f)
        manifest = {
            "round": r,
            "seen_shards": self.seen.n_shards,
            "mode": self.mode,
            "seq_counter": seq_counter,
            "metrics": self.metrics,
            "corpus_dir": self.corpus_dir,
            "seeds_fingerprint": int(url_hash64(["|".join(self.seeds)])[0]),
        }
        tmp = os.path.join(d, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(d, "manifest.json"))  # atomic commit

    def _load_checkpoint(self) -> tuple[int, list[tuple[str, int, int]], int] | None:
        """Returns (next_round, wave, seq_counter) from the last complete
        round, restoring seen/politeness state and extraction metadata."""
        if not self.checkpoint_dir or not os.path.isdir(self.checkpoint_dir):
            return None
        rounds = []
        for name in os.listdir(self.checkpoint_dir):
            if name.startswith("round="):
                r = int(name.split("=")[1])
                if os.path.exists(os.path.join(self.checkpoint_dir, name, "manifest.json")):
                    rounds.append(r)
        if not rounds:
            return None
        last = max(rounds)
        d = self._ckpt_round_dir(last)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        if manifest["seen_shards"] != self.seen.n_shards:
            raise ValueError("seen shard count changed across resume")
        with open(os.path.join(d, "seen.pkl"), "rb") as f:
            self.seen.load_all(pickle.load(f))
        with open(os.path.join(d, "politeness.pkl"), "rb") as f:
            self.politeness.load_all(pickle.load(f))
        self.metrics = manifest["metrics"]
        # reload extraction metadata of all complete rounds (exact mode)
        for r in sorted(rounds):
            t = pq.read_table(os.path.join(self._ckpt_round_dir(r), "extract.parquet"))
            self._absorb_meta(t)
        wv = pq.read_table(os.path.join(d, "wave_next.parquet"))
        wave = list(
            zip(
                wv.column("url").to_pylist(),
                wv.column("depth").to_pylist(),
                wv.column("seq").to_pylist(),
            )
        )
        return last + 1, wave, manifest["seq_counter"]

    def _absorb_meta(self, t: pa.Table) -> None:
        for row in t.to_pylist():
            self._meta[row["url"]] = row

    # ---------------- round execution ----------------

    def _fetch_and_extract(self, wave: list[tuple[str, int, int]]) -> pa.Table:
        """One sub-wave: politeness → pruned fetch join → extraction."""
        urls = [w[0] for w in wave]
        hosts = hosts_of(urls)
        hs = pd.Series(hosts).value_counts()
        sched = self.politeness.schedule_hosts(
            hs.index.tolist(), [int(c) for c in hs.values]
        )
        makespan = 0.0
        for h, c in hs.items():
            first, delay = sched[h]
            makespan = max(makespan, first + int(c) * delay)

        tp0 = time.time()
        ds = fetch_extract_wave(
            self.corpus_dir,
            self.n_buckets,
            wave,
            allowed_domains=self.allowed_domains,
            min_commons_thumb_px=self.cfg.resolved_thumb_px,
            batch_size=self.cfg.scale.extract_batch_size,
        ).select_columns(META_COLS)
        tbl = _collect(ds)
        self._last_pipeline_s = time.time() - tp0

        # politeness feedback: statuses per host (misses report nothing —
        # the reference only adapts on received responses)
        if tbl.num_rows:
            fdf = tbl.select(["url", "first_code"]).to_pandas()
            fdf["host"] = hosts_of(fdf["url"].to_numpy(object))
            g = fdf.groupby("host")["first_code"].apply(lambda s: s.to_numpy())
            self.politeness.report_hosts(g.index.tolist(), g.tolist())
        self._last_makespan = float(makespan)
        return tbl

    def run(self, resume: bool = False) -> CrawlResult:
        max_depth = self.cfg.limits.max_depth
        max_requests = self.cfg.limits.max_requests

        ck = self._load_checkpoint() if resume else None
        if ck is not None:
            start_round, wave, seq_counter = ck
        else:
            start_round = 0
            seq_counter = 0
            wave = []
            for u in self.seeds:
                wave.append((u, 0, seq_counter))
                seq_counter += 1
            self.seen.add([w[0] for w in wave], ns="sched")

        fetched_total = sum(m.get("fetched", 0) for m in self.metrics)
        r = start_round
        while wave:
            depth = wave[0][1]
            if max_depth > 0 and depth >= max_depth:
                break
            t0 = time.time()
            round_meta: list[pa.Table] = []
            round_makespan = 0.0
            round_pipeline_s = 0.0
            misses = 0

            # cascade closure: image-page URLs re-enter the same round.
            # Exact mode iterates sub-waves inside the round (reference
            # same-depth front-insertion semantics need them fetched
            # before the replay).  Scale mode instead merges cascades
            # into the next round's single pipeline (same visit set and
            # depth labels, one Dataset execution per round — the
            # round-synchronous ordering deviation is already documented
            # for scale mode).
            cascade_carry: list[tuple[str, int, int]] = []
            subwave = wave
            sub_idx = 0
            while subwave:
                tbl = self._fetch_and_extract(subwave)
                round_makespan += self._last_makespan
                round_pipeline_s += self._last_pipeline_s
                misses += len(subwave) - tbl.num_rows
                if tbl.num_rows:
                    tbl = tbl.take(pc_sort_indices(tbl, "seq"))
                # First-seq-wins page-MD5 dedup (reference
                # crawling_module.py:227-234): losers contribute no
                # images/links/cascades.  Identical bytes ⇒ identical
                # extraction, so winner choice never changes the link set.
                md5_new = self.seen.check_and_add(
                    tbl.column("content_md5").to_pylist(), ns="md5"
                )
                tbl = tbl.append_column("dup", pa.array(~md5_new, pa.bool_()))
                round_meta.append(tbl)
                if self.mode == "exact":
                    self._absorb_meta(tbl)
                else:
                    self._round_tables.append(tbl)
                live = tbl.filter(pa.array(md5_new))

                # cascade candidates in discovery (seq, position) order,
                # each inheriting its OWN source page's depth (scale-mode
                # waves can mix depths once cascades are carried forward);
                # first appearance wins the depth label
                cand: list[str] = []
                cand_depth: dict[str, int] = {}
                for d, lst in zip(
                    live.column("depth").to_pylist(),
                    live.column("image_page_urls").to_pylist(),
                ):
                    for u in lst:
                        if u not in cand_depth:
                            cand_depth[u] = d
                            cand.append(u)
                nxt: list[tuple[str, int, int]] = []
                if cand:
                    new_mask = self.seen.check_and_add(cand, ns="sched")
                    for u, is_new in zip(cand, new_mask):
                        if is_new:
                            nxt.append((u, cand_depth[u], seq_counter))
                            seq_counter += 1
                if self.mode == "exact":
                    subwave = nxt
                else:
                    cascade_carry.extend(nxt)
                    subwave = []
                sub_idx += 1

            meta_tbl = (
                pa.concat_tables(round_meta)
                if round_meta
                else pa.Table.from_pylist([], schema=_meta_schema())
            )
            fetched_total += meta_tbl.num_rows

            # next wave: carried cascades (same depth, scale mode) first,
            # then links in (seq, position) order, first-seen wins;
            # MD5-dup pages contribute nothing
            wave_next: list[tuple[str, int, int]] = list(cascade_carry)
            if meta_tbl.num_rows:
                import pyarrow.compute as pc

                srt = meta_tbl.take(pc_sort_indices(meta_tbl, "seq"))
                srt = srt.filter(pc.invert(srt.column("dup")))
                # (seq, position)-order traversal; each link's depth is
                # its OWN source page's depth + 1 (waves can mix depths
                # in scale mode); first appearance wins the depth label
                lcand: list[str] = []
                lcand_depth: dict[str, int] = {}
                for d, lst in zip(
                    srt.column("depth").to_pylist(),
                    srt.column("links").to_pylist(),
                ):
                    for u in lst:
                        if u not in lcand_depth:
                            lcand_depth[u] = d + 1
                            lcand.append(u)
                if lcand:
                    # mark seen unconditionally (reference marks at
                    # enqueue even when the depth cutoff will skip the
                    # visit, crawling_module.py:149-152 + :99-100);
                    # enqueue for fetch only below the cutoff
                    new_mask = self.seen.check_and_add(lcand, ns="sched")
                    for u, is_new in zip(lcand, new_mask):
                        ld = lcand_depth[u]
                        if is_new and (max_depth == 0 or ld < max_depth):
                            wave_next.append((u, ld, seq_counter))
                            seq_counter += 1

            self.metrics.append(
                {
                    "round": r,
                    "depth": depth,
                    "wave": len(wave),
                    "fetched": meta_tbl.num_rows,
                    "misses": misses,
                    "cascade_subwaves": sub_idx - 1,
                    "next_wave": len(wave_next),
                    "politeness_makespan_s": round(round_makespan, 3),
                    "pipeline_s": round(round_pipeline_s, 3),
                    "wall_s": round(time.time() - t0, 3),
                }
            )
            self._write_checkpoint(r, wave_next, meta_tbl, seq_counter)
            wave = wave_next
            r += 1
            if max_requests > 0 and fetched_total >= max_requests:
                break

        return self._finalize()

    # ---------------- output derivation ----------------

    def _finalize(self) -> CrawlResult:
        if self.mode == "exact":
            trace = replay_crawl(
                self.seeds,
                self._meta.get,
                max_depth=self.cfg.limits.max_depth,
                max_requests=self.cfg.limits.max_requests,
            )
            return CrawlResult(
                visits=_visits_table(trace),
                emissions=_emissions_table(trace),
                seen_urls=trace.seen_urls(),
                metrics=self.metrics,
                trace=trace,
            )
        # scale mode: deterministic round-synchronous order — ascending
        # enqueue seq (rounds are disjoint seq ranges by construction)
        tables = []
        if self.checkpoint_dir and os.path.isdir(self.checkpoint_dir):
            for name in sorted(os.listdir(self.checkpoint_dir)):
                p = os.path.join(self.checkpoint_dir, name, "extract.parquet")
                if os.path.exists(p):
                    tables.append(pq.read_table(p))
        if not tables and self._round_tables:
            tables = self._round_tables
        meta = pa.concat_tables(tables) if tables else pa.Table.from_pylist(
            [], schema=_meta_schema())
        order = pc_sort_indices(meta, "seq")
        meta = meta.take(order)
        n = meta.num_rows
        dup = meta.column("dup").to_pylist() if n else []
        img_lists = meta.column("image_urls").to_pylist() if n else []
        visits = pa.table(
            {
                "seq": pa.array(np.arange(n, dtype=np.int64)),
                "url": meta.column("url"),
                "depth": meta.column("depth"),
                "cascade": pa.array([False] * n, pa.bool_()),
                "status": pa.array(
                    ["dup" if d else "ok" for d in dup], pa.string()
                ),
                "n_images": pa.array(
                    [0 if d else len(x) for d, x in zip(dup, img_lists)],
                    pa.int32(),
                ),
                "new_links": pa.array([0] * n, pa.int32()),
            }
        )
        import pyarrow.compute as pc

        live = meta.filter(pc.invert(meta.column("dup"))) if n else meta
        flat_urls = pc.list_flatten(live.column("image_urls"))
        parents = pc.list_parent_indices(live.column("image_urls"))
        emissions = pa.table(
            {
                "emit_seq": pa.array(
                    np.arange(len(flat_urls), dtype=np.int64)
                ),
                "url": flat_urls,
                "source_page": live.column("url").take(parents),
                "depth": live.column("depth").take(parents),
            }
        )
        return CrawlResult(
            visits=visits,
            emissions=emissions,
            seen_urls=meta.column("url").to_pylist(),
            metrics=self.metrics,
        )

    def shutdown(self) -> None:
        self.seen.shutdown()
        self.politeness.shutdown()
        import ray

        ray.kill(self.limits)


def _base_schema() -> pa.Schema:
    return pa.schema(
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


def _meta_schema() -> pa.Schema:
    return _base_schema().append(pa.field("dup", pa.bool_()))


def pc_sort_indices(tbl: pa.Table, col: str) -> pa.Array:
    import pyarrow.compute as pc

    return pc.sort_indices(tbl, sort_keys=[(col, "ascending")])


def _collect(ds) -> pa.Table:
    """Materialize a (small, metadata-only) Dataset to one Arrow table."""
    batches = list(ds.iter_batches(batch_size=None, batch_format="pyarrow"))
    batches = [
        b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        for b in batches
    ]
    batches = [b for b in batches if b.num_rows]
    if not batches:
        return pa.Table.from_pylist([], schema=_base_schema())
    return pa.concat_tables(batches).cast(_base_schema())
