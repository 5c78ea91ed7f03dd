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
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..hashing import url_hash64
from ..state.limits import LimitsActor
from ..state.politeness import PolitenessPool
from ..state.seen import SeenFilterPool
from ..urlnorm import hosts_of
from .replay import CrawlTrace, replay_crawl

META_COLS = [
    "url", "depth", "seq", "status", "first_code", "attempts",
    "content_md5", "image_urls", "image_page_urls", "links",
]

# The scheduler-oracle edge table: everything the BFS replay consumes
ORACLE_META_COLS = [
    "url", "content_md5", "image_urls", "image_page_urls", "links",
]


@dataclass
class Wave:
    """A frontier wave as parallel arrays: urls are an Arrow string
    array, hashes their precomputed url_hash64s, depths/seqs numpy.

    The driver touches every frontier URL once per round; keeping the
    wave columnar AND hash-addressed (Arrow buffers cross the wire
    zero-copy; dedup/routing/seen-membership all operate on uint64
    hashes) keeps the driver's per-round work out of the serial
    bottleneck — a python loop or per-string pickling over the wave
    would dominate the round beyond ~16 CPUs (Amdahl)."""

    urls: pa.Array
    depths: np.ndarray
    seqs: np.ndarray
    hashes: np.ndarray

    def __len__(self) -> int:
        return len(self.urls)

    @staticmethod
    def empty() -> "Wave":
        return Wave(
            pa.array([], pa.string()), np.empty(0, np.int32),
            np.empty(0, np.int64), np.empty(0, np.uint64),
        )

    @staticmethod
    def concat(waves: list["Wave"]) -> "Wave":
        waves = [w for w in waves if len(w)]
        if not waves:
            return Wave.empty()
        return Wave(
            pa.concat_arrays(
                [w.urls.combine_chunks() if isinstance(w.urls, pa.ChunkedArray)
                 else w.urls for w in waves]
            ),
            np.concatenate([w.depths for w in waves]),
            np.concatenate([w.seqs for w in waves]),
            np.concatenate([w.hashes for w in waves]),
        )


class CrawlResult:
    """Crawl outputs.  ``visits`` / ``emissions`` / ``seen_urls`` are
    built lazily in scale mode (the meta tables live in the object
    store as refs; materializing them is only paid when a caller needs
    the actual tables — counts are always cheap)."""

    def __init__(self, visits=None, emissions=None, seen_urls=None,
                 metrics=None, trace=None, out_dir=None,
                 lazy_builder=None, num_visits=None, num_emissions=None):
        self._visits = visits
        self._emissions = emissions
        self._seen_urls = seen_urls
        self.metrics = metrics or []
        self.trace = trace
        self.out_dir = out_dir
        self._builder = lazy_builder
        self.num_visits = (
            num_visits if num_visits is not None
            else (visits.num_rows if visits is not None else 0)
        )
        self.num_emissions = (
            num_emissions if num_emissions is not None
            else (emissions.num_rows if emissions is not None else 0)
        )

    def _ensure(self) -> None:
        if self._builder is not None:
            self._visits, self._emissions, self._seen_urls = self._builder()
            self._builder = None

    @property
    def visits(self) -> pa.Table:
        self._ensure()
        return self._visits

    @property
    def emissions(self) -> pa.Table:
        self._ensure()
        return self._emissions

    @property
    def seen_urls(self) -> list[str]:
        self._ensure()
        return self._seen_urls


def _visits_table(trace: CrawlTrace, user_agents: tuple = ()) -> pa.Table:
    v = trace.visits
    t = pa.table(
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
    if user_agents:
        # T12: same pure per-request choice the fetch actor applied
        from ..stages.fetch import user_agent_column

        t = t.append_column(
            "user_agent", user_agent_column(t.column("url"), user_agents)
        )
    return t


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


class _MetaStore:
    """Arrow-native extraction-metadata store for the exact-mode replay.

    The replay needs url → extraction row, but materializing every row
    as a Python dict (``to_pylist``) puts the whole corpus's link/image
    lists in driver heap.  Instead the absorbed Arrow tables are kept
    as-is (their buffers stay zero-copy views of the object store) and
    only a url → (table, row) index lives on the driver; each row is
    converted one at a time when the replay visits its url — O(visits)
    single-row conversions instead of O(corpus) resident dicts."""

    # Loud guard (VERDICT r4): exact mode is the VERIFICATION
    # configuration — the url index here is O(corpus) driver memory
    # (measured ~2.4 GB RSS at 4M pages).  Past this many absorbed
    # rows, warn once that scale mode is the at-size path; exact mode
    # keeps working (a parity check on a big corpus is legitimate),
    # but nobody should discover the driver-memory shape by OOM.
    WARN_ROWS = 2_000_000

    def __init__(self):
        self._tables: list[pa.Table] = []
        self._index: dict[str, tuple[int, int]] = {}
        self._warned = False

    def absorb(self, t: pa.Table) -> None:
        ti = len(self._tables)
        self._tables.append(t)
        for ri, u in enumerate(t.column("url").to_pylist()):
            self._index[u] = (ti, ri)  # later rounds overwrite, as before
        if not self._warned and len(self._index) > self.WARN_ROWS:
            self._warned = True
            import warnings

            warnings.warn(
                f"exact-mode crawl has absorbed {len(self._index):,} "
                "extraction-meta rows on the driver (O(corpus) memory, "
                "~0.6 GB per million pages). Exact mode exists for "
                "reference-parity verification; run mode='scale' for "
                "at-size crawls (no driver-side replay state).",
                ResourceWarning,
                stacklevel=2,
            )

    def get(self, url: str) -> dict | None:
        loc = self._index.get(url)
        if loc is None:
            return None
        ti, ri = loc
        return self._tables[ti].slice(ri, 1).to_pylist()[0]


class CrawlEngine:
    def __init__(
        self,
        corpus_dir: str,
        seeds: list[str],
        config: CrawlConfig | None = None,
        n_buckets: int | None = None,
        mode: str = "exact",
        checkpoint_dir: str | None = None,
        robots_payloads: dict[str, bytes] | None = None,
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
            window_generations=self.cfg.scale.seen_window_generations,
        )
        self.politeness = PolitenessPool(self.cfg.politeness, n_shards=4)
        self.limits = LimitsActor.remote(
            max_requests=self.cfg.limits.max_requests,
            max_images=self.cfg.limits.max_images,
        )
        self.metrics: list[dict] = []
        from ..stages.fetch import FetchPool

        self.pool = FetchPool(
            self.corpus_dir, self.n_buckets, self.allowed_domains,
            self.cfg.resolved_thumb_px,
            user_agents=self.cfg.user_agents,
        )
        # T12 rotation tally: per-UA-index request counts, summed over
        # the lookup summaries (every scheduled request, hit or miss)
        self.ua_counts = np.zeros(len(self.cfg.user_agents), np.int64)
        # Block until the pool's corpus partitions are resident —
        # actor spawn + partition load is cluster provisioning (the
        # HTTP-session / connection-pool analogue), not per-round
        # crawl work.
        self.pool.wait_ready()
        # exact-mode replay source: url -> extraction row (None kept
        # implicit — replay's get() returns None for misses)
        self._meta = _MetaStore()
        # robots.txt admission (reference respect_robots_txt /
        # ROBOTSTXT_OBEY, default off).  Rules live in the politeness
        # shards (scale path: each host's owner actor answers); the
        # driver keeps a rules dict ONLY for the exact-mode replay
        # predicate (verification mode is documented driver-heavy).
        if self.cfg.respect_robots_txt and not robots_payloads:
            # enforcing an absent rule set would silently crawl
            # unfiltered (worse on resume: pre-crash rounds filtered,
            # post-resume ones wouldn't) — demand the rules explicitly
            raise ValueError(
                "respect_robots_txt=True but no robots_payloads were "
                "passed to CrawlEngine (use --robots-dir from the CLI); "
                "pass the per-host robots.txt bodies or disable the flag"
            )
        self._robots_enabled = bool(
            self.cfg.respect_robots_txt and robots_payloads
        )
        self._robots_rules: dict[str, list] = {}
        self._robots_blocked = 0
        if self._robots_enabled:
            from ..state.robots import parse_robots

            self.politeness.set_robots_payloads(robots_payloads)
            self._robots_rules = {
                h: parse_robots(b) for h, b in robots_payloads.items()
            }

    def _priority_select(
        self, wave: "Wave", budget: int
    ) -> tuple["Wave", "Wave"]:
        """Priority-frontier emission (scale-mode opt-in): rank the wave
        by score = −depth − 0.1·host_backlog + 0.01·recency and emit the
        top ``budget`` URLs this round, deferring the rest to the next
        wave.  host_backlog is the host's politeness ``next_free``
        virtual timestamp (backed-up hosts sink), recency is the
        normalized discovery seq (fresh discoveries float).  Ties break
        on seq asc, so the policy is fully deterministic.  Returns
        (selected, deferred), each preserving in-wave relative order."""
        from ..state.robots import url_host_path

        host, _ = url_host_path(wave.urls.to_numpy(zero_copy_only=False))
        snap = self.politeness.snapshot()
        backlog = np.fromiter(
            (snap.get(h, (0.0, 0.0))[1] for h in host),
            dtype=np.float64,
            count=len(host),
        )
        rec = wave.seqs.astype(np.float64) / max(
            1.0, float(wave.seqs.max()) + 1.0
        )
        score = (
            -wave.depths.astype(np.float64) - 0.1 * backlog + 0.01 * rec
        )
        order = np.lexsort((wave.seqs, -score))  # score desc, seq asc
        sel = np.sort(order[:budget])
        rest = np.sort(order[budget:])

        def take(idx: np.ndarray) -> Wave:
            return Wave(
                wave.urls.take(pa.array(idx)),
                wave.depths[idx],
                wave.seqs[idx],
                wave.hashes[idx],
            )

        return take(sel), take(rest)

    def _apply_robots(self, wave: "Wave") -> "Wave":
        """Drop robots-disallowed URLs from a wave before fetch
        (Scrapy IgnoreRequest: no visit, no request, no politeness
        budget consumed).  One sharded-actor round trip per wave."""
        if not self._robots_enabled or not len(wave):
            return wave
        mask = self.politeness.robots_mask(
            wave.urls.to_numpy(zero_copy_only=False)
        )
        if mask.all():
            return wave
        self._robots_blocked += int((~mask).sum())
        sel = np.nonzero(mask)[0]
        return Wave(
            wave.urls.take(pa.array(sel)),
            wave.depths[sel],
            wave.seqs[sel],
            wave.hashes[sel],
        )

    # ---------------- checkpointing ----------------

    def _ckpt_round_dir(self, r: int) -> str:
        return os.path.join(self.checkpoint_dir, f"round={r}")

    def _write_checkpoint(self, r: int, wave_next: "Wave",
                          meta_refs: list, seq_counter: int) -> None:
        if not self.checkpoint_dir:
            return
        d = self._ckpt_round_dir(r)
        os.makedirs(d, exist_ok=True)
        # extraction metadata never routes through the driver: in scale
        # mode each fetch actor writes its own partition part file
        # (per-partition lineage); in exact mode a remote task
        # concatenates the round's refs
        import ray

        if self.mode == "exact":
            ray.get(
                _write_meta_parquet.remote(
                    os.path.join(d, "extract.parquet"), *meta_refs
                )
            )
        else:
            self.pool.write_round_checkpoint(d)
        pq.write_table(
            pa.table(
                {
                    "url": wave_next.urls,
                    "depth": pa.array(wave_next.depths, pa.int32()),
                    "seq": pa.array(wave_next.seqs, pa.int64()),
                    "url_hash": pa.array(wave_next.hashes, pa.uint64()),
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

    def _load_checkpoint(self) -> tuple[int, "Wave", int] | None:
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
        if self.mode == "exact":
            for r in sorted(rounds):
                for t in _read_ckpt_tables(self._ckpt_round_dir(r)):
                    self._absorb_meta(t)
        wv = pq.read_table(os.path.join(d, "wave_next.parquet"))
        wave = Wave(
            wv.column("url").combine_chunks(),
            wv.column("depth").to_numpy(zero_copy_only=False).astype(np.int32),
            wv.column("seq").to_numpy(zero_copy_only=False).astype(np.int64),
            wv.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64),
        )
        return last + 1, wave, manifest["seq_counter"]

    def _absorb_meta(self, t: pa.Table) -> None:
        self._meta.absorb(t)

    # ---------------- round execution ----------------

    def _fetch_and_extract(self, wave: "Wave") -> dict:
        """One sub-wave: politeness schedule → lookup fan-out → MD5
        first-seq-wins dedup → extract fan-out.  Returns a summary dict;
        the extraction meta tables stay in the object store as refs."""
        tp0 = time.time()
        ids, looks = self.pool.lookup(wave)
        # politeness schedule: host counts aggregated on the fetch
        # actors over their FULL slices (misses are scheduled requests
        # too).  Fetching is virtual-time simulated, so scheduling
        # after the lookup round-trip changes no state transitions.
        host_counts: dict[str, int] = {}
        for l in looks:
            for h2, c in l["host_counts"].items():
                host_counts[h2] = host_counts.get(h2, 0) + c
            ua = l.get("ua_counts")
            if ua is not None and len(ua):
                self.ua_counts += ua
        sched = self.politeness.schedule_hosts(
            list(host_counts.keys()), list(host_counts.values())
        )
        # heavy-hitter salting telemetry: sub-batch sizes are bounded by
        # cfg.politeness.heavy_hitter_threshold, the visit set and the
        # per-host virtual timeline are unchanged (state/politeness.py)
        salt = self.politeness.last_salt
        makespan = 0.0
        for h2, c in host_counts.items():
            first, delay = sched[h2]
            makespan = max(makespan, first + c * delay)
        if looks:
            seqs = np.concatenate([l["seqs"] for l in looks])
            md5h = np.concatenate([l["md5h"] for l in looks])
        else:
            seqs = np.empty(0, np.int64)
            md5h = np.empty(0, np.uint64)
        # First-seq-wins page-MD5 dedup (reference
        # crawling_module.py:227-234): losers are not extracted in scale
        # mode and contribute no images/links/cascades.
        order = np.argsort(seqs, kind="stable")
        new_mask = self.seen.check_and_add(md5h[order], ns="md5")
        dup_seqs = seqs[order][~new_mask]

        # politeness feedback: statuses per host, merged in actor order
        # (misses report nothing — the reference only adapts on
        # received responses)
        merged: dict[str, list[np.ndarray]] = {}
        for l in looks:
            for h2, codes in l["host_codes"].items():
                merged.setdefault(h2, []).append(codes)
        if merged:
            self.politeness.report_hosts(
                list(merged.keys()),
                [np.concatenate(v) for v in merged.values()],
            )

        sums, refs = self.pool.extract(
            ids, dup_seqs, extract_dups=(self.mode == "exact"),
            # scale mode: found-row counts size the work-stealing
            # chunks (stages/fetch.py:FetchPool.extract)
            counts=(
                None if self.mode == "exact"
                else [l["n_found"] for l in looks]
            ),
        )
        self._last_pipeline_s = time.time() - tp0
        self._last_makespan = float(makespan)
        self._last_salt = {
            "salted_hosts": len(salt),
            "max_host_batch": max(
                [max(v) for v in salt.values()]
                + [c for h2, c in host_counts.items() if h2 not in salt]
                + [0]
            ),
        }
        return {
            "refs": refs,
            "found": int(len(seqs)),
            "n_rows": int(sum(s2["n_rows"] for s2 in sums)),
            "n_live": int(sum(s2["n_live"] for s2 in sums)),
            "n_images": int(sum(s2["n_images"] for s2 in sums)),
            "casc": _merge_candidates([s2["casc"] for s2 in sums]),
            "links": [s2["links"] for s2 in sums],
        }

    def run(self, resume: bool = False) -> CrawlResult:
        max_depth = self.cfg.limits.max_depth
        max_requests = self.cfg.limits.max_requests

        ck = self._load_checkpoint() if resume else None
        if ck is not None:
            start_round, wave, seq_counter = ck
        else:
            start_round = 0
            seq_counter = len(self.seeds)
            wave = Wave(
                pa.array(self.seeds, pa.string()),
                np.zeros(len(self.seeds), np.int32),
                np.arange(len(self.seeds), dtype=np.int64),
                url_hash64(np.asarray(self.seeds, dtype=object)),
            )
            self.seen.add(wave.hashes, ns="sched")

        fetched_total = sum(m.get("fetched", 0) for m in self.metrics)
        priority_mode = (
            self.mode == "scale"
            and self.cfg.scale.frontier_policy == "priority"
            and self.cfg.scale.round_budget > 0
        )
        r = start_round
        while len(wave):
            # min over the wave: identical to depths[0] for uniform BFS
            # waves; correct for priority mode's mixed-depth waves
            depth = int(wave.depths.min())
            if max_depth > 0 and depth >= max_depth:
                break
            deferred = Wave.empty()
            if priority_mode and len(wave) > self.cfg.scale.round_budget:
                wave, deferred = self._priority_select(
                    wave, self.cfg.scale.round_budget
                )
            t0 = time.time()
            round_makespan = 0.0
            round_pipeline_s = 0.0
            round_images = 0
            misses = 0
            round_salted = 0
            round_max_batch = 0

            # cascade closure: image-page URLs re-enter the same round.
            # Exact mode iterates sub-waves inside the round (reference
            # same-depth front-insertion semantics need them fetched
            # before the replay).  Scale mode instead merges cascades
            # into the next round's single pipeline (same visit set and
            # depth labels, one Dataset execution per round — the
            # round-synchronous ordering deviation is already documented
            # for scale mode).
            cascade_carry: list[Wave] = []
            link_parts: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
            round_refs: list = []
            round_rows = 0
            subwave = wave
            sub_idx = 0
            round_robots_start = self._robots_blocked
            while len(subwave):
                subwave = self._apply_robots(subwave)
                if not len(subwave):
                    break
                fr = self._fetch_and_extract(subwave)
                round_makespan += self._last_makespan
                round_pipeline_s += self._last_pipeline_s
                round_salted += self._last_salt["salted_hosts"]
                round_max_batch = max(
                    round_max_batch, self._last_salt["max_host_batch"]
                )
                misses += len(subwave) - fr["found"]
                round_rows += fr["n_rows"]
                round_images += fr["n_images"]
                if self.mode == "exact":
                    round_refs.extend(fr["refs"])
                link_parts.extend(fr["links"])
                if self.mode == "exact":
                    import ray

                    for t in ray.get(fr["refs"]):
                        self._absorb_meta(t)

                # cascade candidates, already first-appearance-deduped
                # in global (seq, position) discovery order, each
                # inheriting its OWN source page's depth
                cand, cand_depth, _k, cand_h = fr["casc"]
                nxt = Wave.empty()
                if len(cand):
                    new_mask = self.seen.check_and_add(cand_h, ns="sched")
                    sel = np.nonzero(new_mask)[0]
                    nxt = Wave(
                        cand.take(pa.array(sel)),
                        cand_depth[sel].astype(np.int32),
                        seq_counter + np.arange(len(sel), dtype=np.int64),
                        cand_h[sel],
                    )
                    seq_counter += len(sel)
                if self.mode == "exact":
                    subwave = nxt
                else:
                    cascade_carry.append(nxt)
                    subwave = Wave.empty()
                sub_idx += 1

            fetched_total += round_rows

            # next wave: carried cascades (same depth, scale mode)
            # first, then links in global (seq, position) discovery
            # order, first-seen wins; MD5-dup pages contribute nothing
            parts: list[Wave] = (
                [deferred] if len(deferred) else []
            ) + list(cascade_carry)
            lcand, lcand_depth, _k, lcand_h = _merge_candidates(link_parts)
            if len(lcand):
                # mark seen unconditionally (reference marks at enqueue
                # even when the depth cutoff will skip the visit,
                # crawling_module.py:149-152 + :99-100); enqueue for
                # fetch only below the cutoff
                new_mask = self.seen.check_and_add(lcand_h, ns="sched")
                keep = new_mask
                if max_depth > 0:
                    keep = new_mask & (lcand_depth < max_depth)
                sel = np.nonzero(keep)[0]
                parts.append(
                    Wave(
                        lcand.take(pa.array(sel)),
                        lcand_depth[sel].astype(np.int32),
                        seq_counter + np.arange(len(sel), dtype=np.int64),
                        lcand_h[sel],
                    )
                )
                seq_counter += len(sel)
            wave_next = Wave.concat(parts)

            self.metrics.append(
                {
                    "round": r,
                    "depth": depth,
                    "wave": len(wave),
                    "fetched": round_rows,
                    "images": round_images,
                    "misses": misses,
                    "cascade_subwaves": sub_idx - 1,
                    "next_wave": len(wave_next),
                    "salted_hosts": round_salted,
                    "max_host_batch": round_max_batch,
                    "robots_blocked": self._robots_blocked - round_robots_start,
                    "politeness_makespan_s": round(round_makespan, 3),
                    "pipeline_s": round(round_pipeline_s, 3),
                    "wall_s": round(time.time() - t0, 3),
                }
            )
            # recrawl scheduling: step the sliding seen window every K
            # rounds (scale mode + windowed_cuckoo only) — URLs (and
            # their md5/pHash claims) expire after
            # seen_window_generations steps and become crawlable again;
            # termination stays bounded by max_depth / max_requests.
            # Rotation happens BEFORE the checkpoint dump so a resume
            # across the boundary restores the post-rotation window
            # (rotating after would silently drop the step on resume).
            every = self.cfg.scale.recrawl_every_rounds
            if (
                every > 0
                and self.mode == "scale"
                and self.cfg.scale.seen_mode == "windowed_cuckoo"
                and (r + 1) % every == 0
            ):
                self.seen.rotate()
            self._write_checkpoint(r, wave_next, round_refs, seq_counter)
            wave = wave_next
            r += 1
            if max_requests > 0 and fetched_total >= max_requests:
                break

        return self._finalize()

    # ---------------- output derivation ----------------

    def _finalize(self) -> CrawlResult:
        if self.mode == "exact":
            # crawl over — free the fetch pool's CPU slots so pipelines
            # composed after run() (image filtering) aren't starved
            self.pool.shutdown()
            self.pool = None
            blocked = None
            if self._robots_enabled:
                from urllib.parse import urlsplit

                from ..state.robots import robots_allowed

                rules = self._robots_rules

                def blocked(url: str) -> bool:
                    # called once per replayed URL — plain urlsplit, no
                    # pandas machinery on the driver hot path; host is
                    # lowercased/port-stripped and the match target is
                    # path + '?' + query, both like url_host_path
                    sp = urlsplit(url)
                    r = rules.get(sp.hostname or "", [])
                    if not r:
                        return False
                    target = sp.path or "/"
                    if sp.query:
                        target += "?" + sp.query
                    return not robots_allowed(
                        r, np.array([target], dtype=object)
                    )[0]

            trace = replay_crawl(
                self.seeds,
                self._meta.get,
                max_depth=self.cfg.limits.max_depth,
                max_requests=self.cfg.limits.max_requests,
                blocked=blocked,
            )
            return CrawlResult(
                visits=_visits_table(trace, self.cfg.user_agents),
                emissions=_emissions_table(trace),
                seen_urls=trace.seen_urls(),
                metrics=self.metrics,
                trace=trace,
            )
        # scale mode: deterministic round-synchronous order — ascending
        # enqueue seq (rounds are disjoint seq ranges by construction).
        # Output tables are built lazily: counts come from round
        # summaries; the meta tables stay in the object store (or the
        # checkpoint dir) until a caller asks for the actual rows.
        refs = (
            self.pool.dump_meta_refs() if not self.checkpoint_dir else []
        )
        # The crawl is over: release the fetch pool's CPU slots so
        # downstream pipelines (image filtering, queries) composed
        # after run() aren't starved.  The dumped meta objects are
        # owned by the driver and outlive the actors.
        self.pool.shutdown()
        self.pool = None
        ckpt_dir = self.checkpoint_dir
        num_visits = int(sum(m.get("fetched", 0) for m in self.metrics))
        num_emissions = int(sum(m.get("images", 0) for m in self.metrics))
        uas = self.cfg.user_agents

        def build():
            import pyarrow.compute as pc
            import ray

            tables = []
            if ckpt_dir and os.path.isdir(ckpt_dir):
                for name in sorted(os.listdir(ckpt_dir)):
                    tables.extend(
                        _read_ckpt_tables(os.path.join(ckpt_dir, name))
                    )
            if not tables and refs:
                tables = [t for t in ray.get(refs) if t.num_rows]
            meta = (
                pa.concat_tables(tables)
                if tables
                else _meta_schema().empty_table()
            )
            meta = meta.take(pc_sort_indices(meta, "seq"))
            n = meta.num_rows
            dup_col = meta.column("dup")
            visits = pa.table(
                {
                    "seq": pa.array(np.arange(n, dtype=np.int64)),
                    "url": meta.column("url"),
                    "depth": meta.column("depth"),
                    "cascade": pa.array(np.zeros(n, dtype=bool)),
                    "status": pc.if_else(
                        dup_col, pa.scalar("dup"), pa.scalar("ok")
                    ),
                    "n_images": pc.if_else(
                        dup_col,
                        pa.scalar(0, pa.int32()),
                        pc.cast(
                            pc.list_value_length(meta.column("image_urls")),
                            pa.int32(),
                        ),
                    ),
                    "new_links": pa.array(np.zeros(n, dtype=np.int32)),
                }
            )
            if uas:
                from ..stages.fetch import user_agent_column

                visits = visits.append_column(
                    "user_agent", user_agent_column(meta.column("url"), uas)
                )
            live = meta.filter(pc.invert(dup_col)) if n else meta
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
            return visits, emissions, meta.column("url").to_pylist()

        return CrawlResult(
            metrics=self.metrics,
            lazy_builder=build,
            num_visits=num_visits,
            num_emissions=num_emissions,
        )

    def extraction_meta(self) -> pa.Table:
        """Per-page extraction metadata (url-deduped) for the crawl
        SCHEDULER oracle: url → (content_md5, image_urls,
        image_page_urls, links).  Written to Parquet alongside visits,
        it is the edge table over which a DuckDB recursive-CTE replay
        (``__ray_entry__._crawl_sim_sql``) independently re-derives the
        visit table, seen set and depth labels from the seeds
        (reference semantics: crawling_module.py:96-153, mark-seen-at-
        enqueue :149-152).  Exact mode only (the store is the replay's
        own input; duplicate fetches across rounds carry identical
        extraction, so first-per-url wins arbitrarily)."""
        cols = ORACLE_META_COLS
        tables = [t.select(cols) for t in self._meta._tables]
        if not tables:
            return pa.schema(
                [f for f in _base_schema() if f.name in cols]
            ).empty_table()
        t = pa.concat_tables(tables)
        urls = t.column("url").to_numpy(zero_copy_only=False)
        _, first = np.unique(urls, return_index=True)
        if len(first) == t.num_rows:
            return t
        return t.take(pa.array(np.sort(first)))

    def politeness_log(self) -> tuple[pa.Table, pa.Table]:
        """(sched, status) tables of the T5/T6 virtual-time politeness
        timeline this run produced — see PolitenessPool.oracle_log.
        Written to Parquet alongside visits, a DuckDB recursive-CTE
        replay re-derives every first_ts/delay from (n_urls, status)
        alone (``crawl_politeness_schedule`` in the driver contract)."""
        return self.politeness.oracle_log()

    def shutdown(self) -> None:
        if self.pool is not None:
            self.pool.shutdown()
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




def _read_ckpt_tables(round_dir: str) -> list[pa.Table]:
    """Read a round checkpoint dir: either a single ``extract.parquet``
    (exact mode) or per-partition ``part-NNNN.parquet`` files."""
    out = []
    single = os.path.join(round_dir, "extract.parquet")
    if os.path.exists(single):
        out.append(pq.read_table(single))
        return out
    if os.path.isdir(round_dir):
        for f in sorted(os.listdir(round_dir)):
            if f.startswith("part-") and f.endswith(".parquet"):
                t = pq.read_table(os.path.join(round_dir, f))
                if t.num_rows:
                    out.append(t)
    return out


def _merge_candidates(
    parts: list[tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]]
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Merge per-partition candidate quadruples (urls, depths, keys,
    url_hash64s) into global first-appearance order: sort by discovery
    key (= seq * 2**20 + position), then first-wins dedup by url hash.
    Urls stay Arrow and dedup runs on uint64 hashes — the driver never
    materializes candidate python strings (a 64-bit collision merging
    two distinct urls is the same accepted risk as the fetch join's
    hash addressing)."""
    parts = [p for p in parts if len(p[0])]
    if not parts:
        return (
            pa.array([], pa.string()), np.empty(0, np.int32),
            np.empty(0, np.int64), np.empty(0, np.uint64),
        )
    urls = pa.concat_arrays(
        [p[0].combine_chunks() if isinstance(p[0], pa.ChunkedArray)
         else p[0] for p in parts]
    )
    depths = np.concatenate([p[1] for p in parts])
    keys = np.concatenate([p[2] for p in parts])
    hashes = np.concatenate([p[3] for p in parts])
    order = np.argsort(keys, kind="stable")
    depths, keys, hashes = depths[order], keys[order], hashes[order]
    first = ~pd.Series(hashes).duplicated().to_numpy()
    sel = order[first]
    return (
        urls.take(pa.array(sel)), depths[first], keys[first],
        hashes[first],
    )


import ray as _ray


@_ray.remote(num_cpus=0)
def _write_meta_parquet(path: str, *tables: pa.Table) -> int:
    """Checkpoint writer task: concatenates the round's meta tables and
    writes them without routing the data through the driver."""
    tables = [t for t in tables if t.num_rows]
    meta = (
        pa.concat_tables(tables) if tables else _meta_schema().empty_table()
    )
    pq.write_table(meta, path)
    return meta.num_rows
