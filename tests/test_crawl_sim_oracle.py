"""Differential test: the DuckDB recursive-CTE crawl-scheduler oracle
(__ray_entry__._crawl_sim_sql) vs the reference-semantics Python replay
(pipelines/replay.py) over adversarial random link graphs.

The driver's CORRECTNESS gate compares the distributed engine against
the SQL sim at sf0.01; this test pins the OTHER leg — that the SQL sim
itself is a faithful rebuild of the reference crawl loop (cascade
front-insertion, mark-seen-at-enqueue, MD5 first-wins, depth cutoff,
misses, in-list duplicates, robots drops) — so a green driver row
really means "distributed engine == reference semantics".
"""

from __future__ import annotations

import random

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from snapcrawler_ray.pipelines.replay import replay_crawl

from __ray_entry__ import (
    _SIM_EMISSIONS_SELECT,
    _SIM_SEEN_SELECT,
    _SIM_VISITS_SELECT,
    _crawl_sim_sql,
)


def _write_meta(pages: dict[str, dict], path: str) -> None:
    ks = list(pages)
    pq.write_table(
        pa.table(
            {
                "url": ks,
                "content_md5": [pages[k]["content_md5"] for k in ks],
                "image_urls": pa.array(
                    [pages[k]["image_urls"] for k in ks],
                    pa.list_(pa.string()),
                ),
                "image_page_urls": pa.array(
                    [pages[k]["image_page_urls"] for k in ks],
                    pa.list_(pa.string()),
                ),
                "links": pa.array(
                    [pages[k]["links"] for k in ks], pa.list_(pa.string())
                ),
            }
        ),
        path,
    )


def _visit_rows(trace) -> list[tuple]:
    return [
        (
            v["seq"], v["url"], v["depth"], v["cascade"], v["status"],
            v["n_images"], v["new_links"],
        )
        for v in trace.visits
    ]


def _emission_rows(trace) -> list[tuple]:
    return [
        (e["emit_seq"], e["url"], e["source_page"], e["depth"])
        for e in trace.image_emissions
    ]


def _random_graph(seed: int, n: int = 350) -> tuple[dict, list[str]]:
    """Random corpus with every hard case: md5-dup clusters, fetch
    misses, in-list duplicate links, urls that are cascade targets of
    one page and plain links of another, empty pages."""
    rng = random.Random(seed)
    urls = [f"https://h{i % 9}.test/p{i}" for i in range(n)]
    pages = {}
    for i, u in enumerate(urls):
        pages[u] = {
            "content_md5": f"m{i if rng.random() > 0.06 else i % 41}",
            "image_urls": sorted(
                {f"https://img/{rng.randrange(700)}.jpg"
                 for _ in range(rng.randrange(4))}
            ),
            "image_page_urls": [
                urls[rng.randrange(n)] for _ in range(rng.randrange(3))
            ],
            "links": [
                urls[rng.randrange(n)] for _ in range(rng.randrange(6))
            ],
        }
    missing = set(rng.sample(urls, n // 8))
    return {u: p for u, p in pages.items() if u not in missing}, urls[:6]


@pytest.mark.parametrize("seed", [3, 11])
def test_sim_sql_matches_replay(tmp_path, seed):
    corpus, seeds = _random_graph(seed)
    max_depth = 4
    tr = replay_crawl(seeds, corpus.get, max_depth=max_depth)
    meta_pq = str(tmp_path / "meta.parquet")
    _write_meta(corpus, meta_pq)
    sim = _crawl_sim_sql(meta_pq, seeds, max_depth=max_depth)
    con = duckdb.connect()

    got_v = con.sql(sim + _SIM_VISITS_SELECT + " ORDER BY seq").fetchall()
    assert got_v == _visit_rows(tr)
    assert len(got_v) > 50  # non-vacuous

    got_e = con.sql(
        sim + _SIM_EMISSIONS_SELECT + " ORDER BY emit_seq"
    ).fetchall()
    assert got_e == _emission_rows(tr)

    got_s = sorted(r[0] for r in con.sql(sim + _SIM_SEEN_SELECT).fetchall())
    assert got_s == sorted(tr.seen_urls())


def test_sim_sql_matches_replay_with_blocked(tmp_path):
    corpus, seeds = _random_graph(7)
    max_depth = 3

    def blocked(url: str) -> bool:
        return url.startswith("https://h3.test/")

    tr = replay_crawl(seeds, corpus.get, max_depth=max_depth,
                      blocked=blocked)
    meta_pq = str(tmp_path / "meta.parquet")
    _write_meta(corpus, meta_pq)
    sim = _crawl_sim_sql(
        meta_pq, seeds, max_depth=max_depth,
        blocked="starts_with(s.queue[1].url, 'https://h3.test/')",
    )
    con = duckdb.connect()
    got_v = con.sql(sim + _SIM_VISITS_SELECT + " ORDER BY seq").fetchall()
    assert got_v == _visit_rows(tr)
    assert len(got_v) > 30
    assert all(not r[1].startswith("https://h3.test/") for r in got_v)
