"""Per-host politeness scheduling (rebuild of T5/T6).

The reference adapts a per-domain delay from response statuses
(middlewares_advanced.py:348-422): 200 → ``max(base, cur×0.9)``;
429 → ``min(max, cur×backoff)``; ≥500 → ``min(max, cur×1.5)``; other →
unchanged; plus the parallel loop's unconditional ``request_delay``
sleep (crawling_module.py:180-181).

Here host state lives in a sharded actor pool (host routed by a stable
hash), so any fetch task touching a host consults the single owner of
that host's state.  In this corpus-backed sandbox nothing actually
sleeps: ``schedule`` assigns *virtual* fetch timestamps spaced by the
current per-host delay (recorded into metrics as the politeness-bound
makespan), and ``report`` adapts delays from the statuses the fetch
stage observed.  Heavy-hitter hosts (more than
``heavy_hitter_threshold`` URLs in one round) are salted by
``salt_heavy_hosts`` into bounded sub-batches inside
``schedule_hosts``; the budget is still enforced by the single host
owner, which schedules the sub-batches consecutively on the host's one
virtual timeline (SURVEY.md §7.5).
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import ray

from ..config import PolitenessConfig


def host_shard(hosts, n_shards: int) -> np.ndarray:
    arr = np.asarray(hosts, dtype=object)
    return (pd.util.hash_array(arr, categorize=False) % np.uint64(n_shards)).astype(
        np.int64
    )


@ray.remote(num_cpus=0)
class PolitenessShard:
    def __init__(self, cfg: PolitenessConfig):
        self.cfg = cfg
        # host -> [current_delay, next_free_virtual_ts]
        self.state: dict[str, list[float]] = {}
        # host -> parsed robots rules (state/robots.py) — robots state
        # co-lives with politeness state so each host's single owner
        # shard answers both scheduling and admission
        self.robots: dict[str, list] = {}

    def _st(self, host: str) -> list[float]:
        if host not in self.state:
            self.state[host] = [self.cfg.request_delay, 0.0]
        return self.state[host]

    def schedule(self, hosts: list[str], counts: list[int]) -> dict:
        """Assign virtual fetch start times for ``counts[i]`` URLs on
        ``hosts[i]``; returns per-host first offset + delay so the
        caller can expand per-URL times vectorized."""
        first_ts, delays = [], []
        for h, c in zip(hosts, counts):
            st = self._st(h)
            delay, next_free = st
            first_ts.append(next_free)
            delays.append(delay)
            st[1] = next_free + c * delay
        return {"first_ts": first_ts, "delay": delays}

    def report(self, hosts: list[str], statuses: list[np.ndarray]) -> None:
        """Adapt per-host delay from observed HTTP statuses, in order."""
        cfg = self.cfg
        for h, st_arr in zip(hosts, statuses):
            st = self._st(h)
            delay = st[0]
            for code in np.asarray(st_arr).tolist():
                if code == 200:
                    delay = max(cfg.request_delay, delay * cfg.success_decay)
                elif code == 429:
                    delay = min(cfg.max_delay, delay * cfg.backoff_factor)
                elif code >= 500:
                    delay = min(cfg.max_delay, delay * 1.5)
            st[0] = delay

    def set_robots(self, hosts: list[str], rules: list[list]) -> None:
        for h, r in zip(hosts, rules):
            self.robots[h] = r

    def robots_check(
        self, hosts: list[str], paths: list[np.ndarray]
    ) -> list[np.ndarray]:
        """Per host: allow-mask for its URL paths."""
        from .robots import robots_allowed

        return [
            robots_allowed(self.robots.get(h, []), np.asarray(p, dtype=object))
            for h, p in zip(hosts, paths)
        ]

    def snapshot(self) -> dict:
        return {h: list(v) for h, v in self.state.items()}

    def dump(self) -> bytes:
        return pickle.dumps({"state": self.state, "robots": self.robots})

    def load(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        if isinstance(d, dict) and "state" in d and "robots" in d:
            self.state = d["state"]
            self.robots = d["robots"]
        else:  # pre-robots checkpoint format
            self.state = d


def salt_heavy_hosts(
    hosts: list[str], counts: list[int], threshold: int
) -> tuple[list[str], list[int], dict[str, list[int]]]:
    """Split any host presenting more than ``threshold`` URLs in one
    round into consecutive sub-batches of at most ``threshold``
    (SURVEY.md §4 skew row: a 30%-of-the-corpus host must not serialize
    a round behind one dispatch unit).  Returns the salted (hosts,
    counts) lists — the same host repeated per sub-batch — plus
    {host: [sub-batch sizes]} for the hosts that were split.  The salted
    entries all route to the host's single owner shard, which schedules
    them back-to-back on the host's one virtual timeline: the budget
    and the final next-free timestamp are identical to the unsalted
    call, only the dispatch granularity changes."""
    out_h: list[str] = []
    out_c: list[int] = []
    salted: dict[str, list[int]] = {}
    for h, c in zip(hosts, counts):
        if threshold > 0 and c > threshold:
            chunks = [threshold] * (c // threshold)
            if c % threshold:
                chunks.append(c % threshold)
            salted[h] = chunks
            out_h.extend([h] * len(chunks))
            out_c.extend(chunks)
        else:
            out_h.append(h)
            out_c.append(c)
    return out_h, out_c, salted


class PolitenessPool:
    def __init__(self, cfg: PolitenessConfig, n_shards: int = 4):
        self.cfg = cfg
        self.n_shards = n_shards
        self.shards = [PolitenessShard.remote(cfg) for _ in range(n_shards)]
        # {host: [sub-batch sizes]} from the most recent schedule_hosts
        # call (only hosts that exceeded the heavy-hitter threshold)
        self.last_salt: dict[str, list[int]] = {}
        # Oracle log (OPT-IN via cfg.oracle_log — it is O(total URLs)
        # driver memory, so ordinary crawls skip it): one row per
        # POST-SALT schedule entry and one per reported status, each
        # stamped with a pool-monotonic event sequence number ``seq``
        # that IS the per-host replay order (robust by construction —
        # no reliance on one-report-per-wave).  A DuckDB recursive-CTE
        # replay re-derives every first_ts/delay from (n_urls, status)
        # alone — the T5/T6 adaptive-delay timeline's hard SQL oracle.
        # A RESUMED engine logs only post-resume waves (the oracle
        # crawl always runs fresh).
        self._wave = 0
        self._ev_seq = 0
        self._log_sched: list[tuple[int, int, str, int, int, float, float]] = []
        self._log_status: list[tuple[int, int, str, int, int]] = []

    def schedule_hosts(self, hosts: list[str], counts: list[int]) -> dict[str, tuple[float, float]]:
        """-> {host: (first_virtual_ts, per_url_delay)}

        Heavy hitters are salted into ≤-threshold sub-batches first;
        sub-batches keep routing by the *base* host name, so the single
        owner shard schedules them consecutively and the per-host
        timeline/budget is exactly the unsalted one."""
        if not hosts:
            self.last_salt = {}
            return {}
        hosts, counts, self.last_salt = salt_heavy_hosts(
            hosts, counts, self.cfg.heavy_hitter_threshold
        )
        shard_of = host_shard(hosts, self.n_shards)
        refs, keys = [], []
        for s in range(self.n_shards):
            hs = [h for h, sh in zip(hosts, shard_of) if sh == s]
            cs = [c for c, sh in zip(counts, shard_of) if sh == s]
            if hs:
                refs.append(self.shards[s].schedule.remote(hs, cs))
                keys.append((hs, cs))
        self._wave += 1
        sub_idx: dict[str, int] = {}
        out: dict[str, tuple[float, float]] = {}
        for (hs, cs), res in zip(keys, ray.get(refs)):
            for h, c, f, d in zip(hs, cs, res["first_ts"], res["delay"]):
                if self.cfg.oracle_log:
                    i = sub_idx.get(h, 0)
                    sub_idx[h] = i + 1
                    self._ev_seq += 1
                    self._log_sched.append(
                        (self._ev_seq, self._wave, h, i, int(c), f, d)
                    )
                if h not in out:  # first sub-batch owns the host's start
                    out[h] = (f, d)
        return out

    def set_robots_payloads(self, payloads: dict[str, bytes]) -> None:
        """Parse per-host robots.txt bodies and push each host's rules
        to its owner shard."""
        from .robots import parse_robots

        hosts = list(payloads.keys())
        if not hosts:
            return
        rules = [parse_robots(payloads[h]) for h in hosts]
        shard_of = host_shard(hosts, self.n_shards)
        refs = []
        for s in range(self.n_shards):
            hs = [h for h, sh in zip(hosts, shard_of) if sh == s]
            rs = [r for r, sh in zip(rules, shard_of) if sh == s]
            if hs:
                refs.append(self.shards[s].set_robots.remote(hs, rs))
        ray.get(refs)

    def robots_mask(self, urls) -> np.ndarray:
        """Allow-mask for a URL array: group by host, one RPC per shard
        (each host's rules live on its single owner), scatter back."""
        from .robots import url_host_path

        urls = np.asarray(urls, dtype=object)
        n = len(urls)
        if n == 0:
            return np.zeros(0, dtype=bool)
        host, path = url_host_path(urls)
        out = np.ones(n, dtype=bool)
        uniq_hosts, inv = np.unique(host.astype(str), return_inverse=True)
        shard_of = host_shard(list(uniq_hosts), self.n_shards)
        refs, groups = [], []
        for s in range(self.n_shards):
            hs, idxs = [], []
            for hi in np.nonzero(shard_of == s)[0]:
                idx = np.nonzero(inv == hi)[0]
                hs.append(str(uniq_hosts[hi]))
                idxs.append(idx)
            if hs:
                refs.append(
                    self.shards[s].robots_check.remote(
                        hs, [path[i] for i in idxs]
                    )
                )
                groups.append(idxs)
        for idxs, masks in zip(groups, ray.get(refs)):
            for idx, m in zip(idxs, masks):
                out[idx] = m
        return out

    def report_hosts(self, hosts: list[str], statuses: list[np.ndarray]) -> None:
        if not hosts:
            return
        if self.cfg.oracle_log:
            for h, st_arr in zip(hosts, statuses):
                for pos, code in enumerate(np.asarray(st_arr).tolist()):
                    self._ev_seq += 1
                    self._log_status.append(
                        (self._ev_seq, self._wave, h, pos, int(code))
                    )
        shard_of = host_shard(hosts, self.n_shards)
        refs = []
        for s in range(self.n_shards):
            hs = [h for h, sh in zip(hosts, shard_of) if sh == s]
            ss = [st for st, sh in zip(statuses, shard_of) if sh == s]
            if hs:
                refs.append(self.shards[s].report.remote(hs, ss))
        ray.get(refs)

    def oracle_log(self) -> tuple["object", "object"]:
        """(sched, status) pyarrow tables of the recorded politeness
        timeline — the replay inputs + outputs for the SQL oracle
        (requires ``cfg.oracle_log``).  sched: (seq, wave, host, sub,
        n_urls, first_ts, delay); status: (seq, wave, host, pos,
        status).  ``seq`` is the pool-monotonic event order the replay
        sorts on."""
        import pyarrow as pa

        if not self.cfg.oracle_log:
            raise RuntimeError(
                "politeness oracle log is opt-in: set "
                "PolitenessConfig.oracle_log=True before the crawl"
            )
        seq, w, h, sub, c, f, d = (
            zip(*self._log_sched) if self._log_sched else ((),) * 7
        )
        sched = pa.table(
            {
                "seq": pa.array(seq, pa.int64()),
                "wave": pa.array(w, pa.int64()),
                "host": pa.array(h, pa.string()),
                "sub": pa.array(sub, pa.int64()),
                "n_urls": pa.array(c, pa.int64()),
                "first_ts": pa.array(f, pa.float64()),
                "delay": pa.array(d, pa.float64()),
            }
        )
        seq2, w2, h2, pos, code = (
            zip(*self._log_status) if self._log_status else ((),) * 5
        )
        status = pa.table(
            {
                "seq": pa.array(seq2, pa.int64()),
                "wave": pa.array(w2, pa.int64()),
                "host": pa.array(h2, pa.string()),
                "pos": pa.array(pos, pa.int64()),
                "status": pa.array(code, pa.int64()),
            }
        )
        return sched, status

    def snapshot(self) -> dict:
        out: dict = {}
        for d in ray.get([s.snapshot.remote() for s in self.shards]):
            out.update(d)
        return out

    def dump_all(self) -> list[bytes]:
        return ray.get([s.dump.remote() for s in self.shards])

    def load_all(self, blobs: list[bytes]) -> None:
        ray.get([s.load.remote(b) for s, b in zip(self.shards, blobs)])

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []
