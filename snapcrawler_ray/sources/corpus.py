"""Deterministic synthetic Common-Crawl-style corpus.

The driver contract (BASELINE.json ``input_hint``) fixes the input
table: ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  No such table ships in /root/testdata, so we synthesise
it deterministically at small scale (seed=42, pure function of
(seed, n_pages)) — pages exercise every extractor path of the reference
(crawling_module.py:264-318): <img src/data-src/data-lazy-src>, parent
<a> to image files and to image *pages* (/photo/…), [data-file-url],
inline style url(...), <style> blocks, Wikimedia-shaped URLs for the
thumb-width rule, plus srcset/JSON-LD/JS-string material for the
extended (spider-superset) extractor, same-/cross-host nav links and
exact duplicate pages (identical bytes ⇒ same MD5).

Host sizes are Zipf-skewed with one host holding ~30% of pages so
heavy-hitter politeness splitting is exercised.  The corpus is written
as Parquet partitioned by ``bucket = url_hash64(url) % corpus_buckets``
so the per-round fetch join reads only the touched buckets
(SURVEY.md §7.4 'corpus fetch join').
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..hashing import fnv1a64, url_hash64
from ..html.extract import extract_page

N_HOSTS = 20
_LANGS = ["en", "ru", "de", "fr", "es"]
_WORDS = {
    "en": "the quick brown fox jumps over lazy dog photo gallery image nature".split(),
    "ru": "быстрая лиса прыгает через ленивую собаку фото галерея изображение природа ах".split(),
    "de": "der schnelle fuchs springt über den faulen hund foto galerie bild natur".split(),
    "fr": "le renard rapide saute par dessus le chien paresseux photo galerie image".split(),
    "es": "el zorro rápido salta sobre el perro perezoso foto galería imagen naturaleza".split(),
}
_BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds


def host_name(h: int) -> str:
    return f"site{h}.example"


def host_weights(n_hosts: int = N_HOSTS) -> np.ndarray:
    """Host 0 gets ~30% of pages; the rest share 70% harmonically."""
    w = np.array([1.0 / (k + 1) for k in range(1, n_hosts)])
    w = 0.7 * w / w.sum()
    return np.concatenate([[0.3], w])


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_pages: int = 2000
    n_hosts: int = N_HOSTS
    buckets: int = 32
    # BFS tree branching factor: children of page i are B·i+1…B·i+B.
    # Higher values make wider/shallower crawls (fewer rounds — the
    # bench corpus uses 8 so round-synchronous overhead amortizes).
    branching: int = 3

    def host_page_counts(self) -> np.ndarray:
        w = host_weights(self.n_hosts)
        counts = np.maximum(4, (w * self.n_pages).astype(int))
        return counts

    def host_photo_counts(self) -> np.ndarray:
        return np.maximum(1, self.host_page_counts() // 4)

    def all_urls(self) -> list[tuple[str, int, int, bool]]:
        """[(url, host_idx, local_idx, is_photo)] — full corpus key set."""
        out = []
        pages = self.host_page_counts()
        photos = self.host_photo_counts()
        for h in range(self.n_hosts):
            for i in range(pages[h]):
                out.append((page_url(h, i), h, i, False))
            for j in range(photos[h]):
                out.append((photo_url(h, j), h, j, True))
        return out


def page_url(h: int, i: int) -> str:
    host = host_name(h)
    return f"https://{host}/" if i == 0 else f"https://{host}/page/{i}"


def photo_url(h: int, j: int) -> str:
    return f"https://{host_name(h)}/photo/{j}"


def image_file_url(h: int, k: int, ext: str = "jpg") -> str:
    return f"https://img-cdn{h % 4}.example/pic/{h}/{k}.{ext}"


def seeds_for(spec: CorpusSpec, n_seeds: int | None = None) -> list[str]:
    """Seed list = host roots (mirrors config.yaml:44-76 start_urls role).
    All hosts are seeded by default so allowed_domains covers the corpus."""
    n = spec.n_hosts if n_seeds is None else n_seeds
    return [page_url(h, 0) for h in range(n)]


def _rng_for(seed: int, url: str) -> np.random.RandomState:
    return np.random.RandomState(fnv1a64(f"{seed}:{url}") % (2**32))


def _sentence(rng: np.random.RandomState, lang: str, n: int) -> str:
    words = _WORDS[lang]
    return " ".join(words[rng.randint(0, len(words))] for _ in range(n))


def _page_html(spec: CorpusSpec, h: int, i: int) -> bytes:
    """Regular page HTML. Pure function of (seed, host, local index)."""
    url = page_url(h, i)
    rng = _rng_for(spec.seed, url)
    lang = _LANGS[h % len(_LANGS)]
    pages = spec.host_page_counts()[h]
    photos = spec.host_photo_counts()[h]

    # Exact-duplicate pages: every 37th page clones a fixed per-host
    # payload (same bytes ⇒ same MD5 ⇒ reference skips it,
    # crawling_module.py:227-234).
    if i % 37 == 5 and i > 5:
        return _page_html(spec, h, 5)

    parts = [f"<html><head><title>{host_name(h)} page {i}</title>"]
    # <style> block with url(...) — extractor source (e)
    if rng.rand() < 0.5:
        parts.append(
            "<style>.banner { background-image: "
            f"url('{image_file_url(h, rng.randint(0, 50))}'); }}</style>"
        )
    parts.append("</head><body>")
    parts.append(f"<h1>{_sentence(rng, lang, 4)}</h1>")
    parts.append(f"<p>{_sentence(rng, lang, 12)}</p>")

    # (a) plain/lazy <img>
    n_imgs = rng.randint(1, 5)
    for k in range(n_imgs):
        img_id = rng.randint(0, 200)
        attr = ["src", "data-src", "data-lazy-src"][rng.randint(0, 3)]
        ext = ["jpg", "png", "webp", "gif"][rng.randint(0, 4)]
        img_u = image_file_url(h, img_id, ext)
        wrap = rng.rand()
        if wrap < 0.3 and photos > 0:
            # (b) parent <a> → image *page* (cascade at same depth)
            ph = f"/photo/{rng.randint(0, photos)}"
            parts.append(f'<a href="{ph}"><img {attr}="{img_u}"/></a>')
        elif wrap < 0.5:
            # (b) parent <a> → full-size image file
            parts.append(
                f'<a href="{image_file_url(h, img_id, "png")}">'
                f'<img {attr}="{img_u}"/></a>'
            )
        else:
            parts.append(f'<img {attr}="{img_u}"/>')

    # (c) data-file-url (Wikimedia-style attribute)
    if rng.rand() < 0.25:
        parts.append(
            f'<div data-file-url="{image_file_url(h, rng.randint(200, 260))}">'
            f"{_sentence(rng, lang, 3)}</div>"
        )
    # (d) inline style background
    if rng.rand() < 0.35:
        parts.append(
            f'<div style="background-image:url('
            f"{image_file_url(h, rng.randint(260, 300))})\">x</div>"
        )
    # Wikimedia thumb URLs exercise the width rule (crawling_module.py:385-411)
    if rng.rand() < 0.15:
        px = [120, 220, 360, 640][rng.randint(0, 4)]
        parts.append(
            f'<img src="https://wm-mirror.example/commons.wikimedia.org/thumb/a/ab'
            f'/X.jpg/{px}px-X.jpg"/>'
        )
    # srcset / picture / JSON-LD / JS strings (extended extractor material;
    # invisible to the M1 reference extractor)
    if rng.rand() < 0.3:
        s1, s2 = image_file_url(h, 300 + i % 40), image_file_url(h, 340 + i % 40)
        parts.append(
            f'<picture><source srcset="{s1} 1x, {s2} 2x"/>'
            f'<img srcset="{s2} 640w"/></picture>'
        )
    if rng.rand() < 0.25:
        parts.append(
            '<script type="application/ld+json">'
            f'{{"@type":"Article","image":"{image_file_url(h, 400 + i % 30)}"}}'
            "</script>"
        )
    if rng.rand() < 0.2:
        parts.append(
            f'<script>var hero = "{image_file_url(h, 430 + i % 30)}";</script>'
        )

    # Nav links: deterministic tree children (B·i+1..B·i+B) keep BFS
    # depth growth, plus random same-host and cross-host extras.
    B = spec.branching
    for c in range(B * i + 1, B * i + B + 1):
        if c < pages:
            parts.append(f'<a href="/page/{c}">next {c}</a>')
    for _ in range(rng.randint(0, 3)):
        parts.append(f'<a href="/page/{rng.randint(0, pages)}">rnd</a>')
    if rng.rand() < 0.3:
        oh = rng.randint(0, spec.n_hosts)
        parts.append(f'<a href="{page_url(oh, rng.randint(0, 4))}">xhost</a>')
    # Off-domain / non-http links (filtered by extract_links)
    if rng.rand() < 0.2:
        parts.append('<a href="https://offsite.invalid/x">off</a>')
        parts.append('<a href="mailto:a@b.c">mail</a>')
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def _photo_html(spec: CorpusSpec, h: int, j: int) -> bytes:
    url = photo_url(h, j)
    rng = _rng_for(spec.seed, url)
    lang = _LANGS[h % len(_LANGS)]
    big = image_file_url(h, 1000 + j, "jpg")
    parts = [
        f"<html><head><title>photo {j}</title></head><body>",
        f"<h1>{_sentence(rng, lang, 3)}</h1>",
        f'<img src="{big}"/>',
        f'<a href="{image_file_url(h, 1000 + j, "png")}">'
        f'<img src="{image_file_url(h, 2000 + j)}"/></a>',
        f'<a href="/">home</a>',
        "</body></html>",
    ]
    return "".join(parts).encode("utf-8")


def build_rows(spec: CorpusSpec, keys: list[tuple[str, int, int, bool]]) -> pa.Table:
    """Materialize corpus rows for the given url keys (pure function)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for url, h, i, is_photo in keys:
        html = _photo_html(spec, h, i) if is_photo else _page_html(spec, h, i)
        row = extract_page(html, url, allowed_domains=[])
        urls.append(url)
        tss.append(_BASE_TS_US + h * 86_400_000_000 + i * 1_000_000)
        htmls.append(html)
        texts.append(row["text"])
        langs.append(_LANGS[h % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            # precomputed partition/join key: the fetch join reads this
            # zero-copy instead of re-hashing url strings every round
            "url_hash": pa.array(url_hash64(urls)),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def corpus_path(root: str, spec: CorpusSpec) -> str:
    return os.path.join(
        root,
        f"corpus_s{spec.seed}_n{spec.n_pages}_h{spec.n_hosts}"
        f"_b{spec.buckets}_br{spec.branching}_v2",
    )


def generate_corpus(root: str, spec: CorpusSpec, use_ray: bool = True) -> str:
    """Write the corpus partitioned by url-hash bucket; returns its dir.

    Idempotent (keyed directory name + _SUCCESS marker). Generation
    itself is distributed with Ray Data when available: the key list is
    sharded and each task builds + writes its buckets' rows.
    """
    out = corpus_path(root, spec)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)

    keys = spec.all_urls()
    hashes = url_hash64([k[0] for k in keys])
    buckets = (hashes % spec.buckets).astype(np.int64)
    by_bucket: dict[int, list] = {}
    for k, b in zip(keys, buckets):
        by_bucket.setdefault(int(b), []).append(k)

    if use_ray and spec.n_pages >= 5000:
        import ray

        spec_ref = ray.put(spec)

        @ray.remote(num_cpus=1)
        def _write_bucket(b: int, bkeys: list) -> int:
            sp = ray.get(spec_ref)
            t = build_rows(sp, bkeys)
            os.makedirs(os.path.join(out, f"bucket={b}"), exist_ok=True)
            pq.write_table(t, os.path.join(out, f"bucket={b}", "part-0.parquet"))
            return t.num_rows

        ray.get([_write_bucket.remote(b, bk) for b, bk in by_bucket.items()])
    else:
        for b, bk in by_bucket.items():
            t = build_rows(spec, bk)
            os.makedirs(os.path.join(out, f"bucket={b}"), exist_ok=True)
            pq.write_table(t, os.path.join(out, f"bucket={b}", "part-0.parquet"))

    with open(marker, "w") as f:
        f.write("ok\n")
    return out
