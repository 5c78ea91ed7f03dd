"""Deduplication suite over the ``documents`` / ``embeddings`` tables.

The scale patterns a 100-TB training-data pipeline needs, each as a
Ray-Data pipeline with the shuffle happening on small derived keys
(hashes / band buckets), never on the raw text:

- exact: md5(text) → hash-partitioned groupby → keep min(doc_id)
- MinHash+LSH: word-shingle minhash signatures (vectorized numpy) →
  band buckets → groupby(bucket) candidate pairs → exact-Jaccard verify
- SimHash: 64-bit weighted token hash
- embedding near-dup: random-hyperplane LSH buckets → cosine verify

All pure functions of (table, seed) — deterministic across runs/nodes.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray

_WS = re.compile(r"\s+")
_MERSENNE = (1 << 61) - 1


def exact_dedup(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, content_md5 of the kept (min doc_id per hash) docs."""

    def add_md5(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "content_md5": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in df["text"].fillna("")
                ],
            }
        )

    from .agg import bucketed_combine
    from .io import read_table

    ds = read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        add_md5, batch_format="pandas"
    )
    # hash-bucketed reduce: one low-cardinality Ray shuffle + a pandas
    # groupby per bucket (Ray's own groupby.aggregate pays per-group
    # python — prohibitive at one group per distinct document)
    return bucketed_combine(
        ds,
        ["content_md5"],
        lambda df: df.groupby("content_md5", as_index=False).agg(
            doc_id=("doc_id", "min")
        )[["doc_id", "content_md5"]],
    )


def dedup_count_per_source(sf_dir: str) -> pd.DataFrame:
    """source, n_docs, n_unique (distinct text hashes) — the per-source
    dedup-rate view.

    Fully distributed: groupby (source, md5) collapses duplicates with
    the only O(corpus) shuffle keyed on small hash strings; the second
    groupby runs over one row per *distinct* (source, text) — nothing
    O(corpus) ever reaches the driver (the final table is O(sources))."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in df["text"].fillna("")
        ]
        return pd.DataFrame({"source": df["source"], "content_md5": h})

    from .agg import bucketed_combine
    from .io import read_table

    ds = read_table(sf_dir, "documents", ["source", "text"]).map_batches(
        partial, batch_format="pandas"
    )
    # one hash-bucketed reduce over (source, md5) collapses duplicates
    # and pre-sums per source within each bucket; the driver combine
    # runs over O(sources × buckets) rows only
    per_bucket = bucketed_combine(
        ds,
        ["source", "content_md5"],
        lambda df: df.groupby(["source", "content_md5"], as_index=False)
        .size()
        .groupby("source", as_index=False)
        .agg(n_docs=("size", "sum"), n_unique=("size", "count")),
    )
    out = (
        per_bucket.to_pandas()
        .groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"), n_unique=("n_unique", "sum"))
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_unique"] = out["n_unique"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


# ------------------------------------------------------------- MinHash

def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hash per word k-shingle, fully vectorized: hash the token
    array once (pandas SipHash), then combine each k-window with a
    polynomial roll — no per-shingle string building or digesting."""
    import pandas as pd

    toks = _WS.split(text.strip()) if text.strip() else []
    if len(toks) < k:
        base = [" ".join(toks)] if toks else [""]
        return pd.util.hash_array(np.asarray(base, dtype=object))
    th = pd.util.hash_array(np.asarray(toks, dtype=object))
    n = len(toks) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            out = out * np.uint64(0x100000001B3) + th[j : j + n]
    return out


def _ranges(counts: np.ndarray) -> np.ndarray:
    """Concatenated ``[0..c)`` ramps for each count: [0,1,0,0,1,2] for
    counts [2,1,3]."""
    total = int(counts.sum())
    return np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )


def _batch_shingle_hashes(
    texts: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Flat ``(hashes, offsets)`` of the word-k-shingle hashes of every
    text — per doc BIT-IDENTICAL to ``_shingle_hashes`` (asserted in
    tests), but with ONE ``pd.util.hash_array`` call over all tokens of
    the batch instead of one per doc: hash_array's per-call
    categorize/factorize setup dominated the per-doc path (77% of the
    MinHash kernel in profile).  ``offsets`` has len(texts)+1 entries;
    doc i's shingles are ``hashes[offsets[i]:offsets[i+1]]`` (≥1
    always — short docs contribute their joined text as one shingle,
    same rule as ``_shingle_hashes``)."""
    import itertools

    n_docs = len(texts)
    toks = [
        (_WS.split(t.strip()) if t.strip() else []) for t in texts
    ]
    lens = np.fromiter((len(x) for x in toks), np.int64, count=n_docs)
    small = lens < k
    counts = np.where(small, 1, lens - k + 1)
    offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    out = np.empty(offsets[-1], np.uint64)
    long_idx = np.flatnonzero(~small)
    if len(long_idx):
        flat = np.asarray(
            list(
                itertools.chain.from_iterable(toks[i] for i in long_idx)
            ),
            dtype=object,
        )
        th = pd.util.hash_array(flat)
        doc_off = np.zeros(len(long_idx) + 1, np.int64)
        np.cumsum(lens[long_idx], out=doc_off[1:])
        nw = lens[long_idx] - k + 1
        starts = np.repeat(doc_off[:-1], nw) + _ranges(nw)
        acc = np.zeros(len(starts), np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc = acc * np.uint64(0x100000001B3) + th[starts + j]
        out[np.repeat(offsets[long_idx], nw) + _ranges(nw)] = acc
    small_idx = np.flatnonzero(small)
    if len(small_idx):
        joined = np.asarray(
            [" ".join(toks[i]) if toks[i] else "" for i in small_idx],
            dtype=object,
        )
        out[offsets[small_idx]] = pd.util.hash_array(joined)
    return out, offsets


def _batch_distinct_hits(
    texts: np.ndarray, bench: np.ndarray, k: int
) -> np.ndarray:
    """Per doc: how many DISTINCT word-k-shingle hashes appear in the
    sorted ``bench`` array — the whole batch in one lexsort +
    searchsorted instead of a per-doc unique/probe loop.  Equivalent to
    ``(bench[searchsorted(bench, unique(sh))] == unique(sh)).sum()``
    per doc (np.unique sorts; first-occurrence masking over the
    (doc, shingle) lexsort yields the same distinct sets)."""
    n = len(texts)
    sh, off = _batch_shingle_hashes(texts, k)
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    order = np.lexsort((sh, doc_rep))
    ss, dd = sh[order], doc_rep[order]
    first = np.ones(len(ss), dtype=bool)
    first[1:] = (ss[1:] != ss[:-1]) | (dd[1:] != dd[:-1])
    us, ud = ss[first], dd[first]
    pos = np.searchsorted(bench, us)
    pos[pos >= len(bench)] = 0
    return np.bincount(ud[bench[pos] == us], minlength=n).astype(np.int64)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 2**63, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized minhash: h_i(x) = (a_i·x + b_i) mod 2^64 via native
    uint64 wraparound (a_i odd ⇒ the map is a bijection on Z_2^64; the
    multiply-shift family is a standard universal-enough choice and
    ~1000× faster than exact mod-p math in python ints).  One (n_shingles
    × n_perm) outer product, min along shingles."""
    sh = _shingle_hashes(text)  # uint64
    with np.errstate(over="ignore"):
        hv = sh[:, None] * a[None, :] + b[None, :]
    return hv.min(axis=0)


class MinHashStage:
    """Per-batch minhash map.  Permutation params are a few hundred
    bytes derived from (num_perm, seed) — cheap enough to build per
    task, so this runs as a plain ``map_batches`` function (no actor
    pool to spin up; a model-sized state would flip it back to a
    callable-class actor stage)."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        self.a, self.b = _perm_params(num_perm, seed)
        self.num_perm = num_perm

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        # batch-vectorized: one hash_array over all tokens, one
        # (shingles × perms) product per ~50k-shingle chunk, per-doc
        # min via minimum.reduceat — bit-identical to the per-doc
        # minhash_signature path (asserted in tests), ~4× faster
        texts = df["text"].fillna("").to_numpy()
        n = len(texts)
        sh, off = _batch_shingle_hashes(texts, k=3)
        sig = np.empty((n, self.num_perm), dtype=np.uint64)
        chunk = 50_000  # shingles per outer product (~25 MB at 64 perms)
        d0 = 0
        while d0 < n:
            d1 = d0 + 1
            while d1 < n and off[d1 + 1] - off[d0] <= chunk:
                d1 += 1
            seg = sh[off[d0] : off[d1]]
            with np.errstate(over="ignore"):
                hv = seg[:, None] * self.a[None, :] + self.b[None, :]
            cuts = (off[d0:d1] - off[d0]).astype(np.int64)
            sig[d0:d1] = np.minimum.reduceat(hv, cuts, axis=0)
            d0 = d1
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "signature": [s.tolist() for s in sig]}
        )


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def minhash_lsh_pairs(
    sf_dir: str,
    num_perm: int = 64,
    bands: int = 32,
    threshold: float = 0.6,
) -> pd.DataFrame:
    """Near-duplicate pairs (doc_a < doc_b, jaccard ≥ threshold).

    shingle → minhash (actor pool) → band-bucket explode → groupby
    bucket (the shuffle: tiny band-hash keys, not text) → candidate
    pairs → exact-Jaccard verify on the candidates only.

    Band structure 32×2 (not 16×4) makes recall at the default 0.6
    threshold structural, not corpus-dependent: a pair at jaccard j
    collides in some band with prob 1−(1−j²)^32 — ≥ 1−6.3e-7 at
    j=0.6 and ≥ 0.9997 at j=0.45, vs only ~89% at j=0.6 under 16×4.
    The extra false-positive candidates this admits are killed by the
    exact-Jaccard verify, so the output contract (= the all-pairs SQL
    oracle) holds on any corpus, not just near-identical dups."""
    rows_per_band = num_perm // bands
    from .io import read_table

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    sigs = docs.map_batches(
        MinHashStage(num_perm=num_perm), batch_format="pandas"
    )

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized band-bucket keys: fold each band chunk with
        # an FNV-style polynomial, salt by band index, finish with a
        # splitmix64 avalanche.  Identical chunks still collide
        # identically (the LSH property); distinct chunks collide at
        # ~2^-64 like the md5 prefix this replaces — no per-row python.
        n = len(df)
        S = np.vstack(
            [np.asarray(s, dtype=np.uint64) for s in df["signature"]]
        ).reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            h = np.zeros((n, bands), dtype=np.uint64)
            for j in range(rows_per_band):
                h = h * np.uint64(0x100000001B3) + S[:, :, j]
            h ^= np.arange(bands, dtype=np.uint64)[None, :] * np.uint64(
                0x9E3779B97F4A7C15
            )
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
        bk = h.reshape(-1)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
                "bucket": bk,
                "part": (bk % np.uint64(64)).astype(np.int64),
            }
        )

    buckets = sigs.map_batches(to_bands, batch_format="pandas")

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # most band buckets are singletons: prune them before the
        # C-speed self-merge (no per-bucket python)
        vc = df["bucket"].value_counts()
        keep = vc[vc >= 2].index
        d = df[df["bucket"].isin(keep)][["doc_id", "bucket"]]
        if d.empty:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        m = d.merge(d, on="bucket")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return m.rename(
            columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"}
        )[["doc_a", "doc_b"]].drop_duplicates()

    # candidate pairs per partition; the same pair can emerge from bands
    # landing in different partitions — the DISTINCT over the raw
    # candidate list (which includes LSH false positives and can blow
    # past the verified result set under band-key skew) runs as a
    # hash-bucketed distributed reduce; only the deduplicated pair list
    # (dedup-rate-sized, the standard driver artifact) reaches the
    # driver.
    # exact-Jaccard verify WITHOUT materializing the corpus on the
    # driver: broadcast the candidate doc-id set, stream-filter the
    # documents table down to candidate docs only (the one unavoidable
    # corpus pass — no shuffle), then hash-join pair sides against that
    # SMALL text set.
    from .agg import bucketed_combine

    cand_pd = bucketed_combine(
        buckets.groupby("part").map_groups(part_pairs, batch_format="pandas"),
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(),
    ).to_pandas()
    if cand_pd.empty:
        return _empty_pairs()
    ids = np.unique(
        np.concatenate([cand_pd["doc_a"].to_numpy(), cand_pd["doc_b"].to_numpy()])
    )
    ids_ref = ray.put(ids)

    def keep_candidates(df: pd.DataFrame) -> pd.DataFrame:
        want = ray.get(ids_ref)
        return df[df["doc_id"].isin(want)]

    docs = read_table(sf_dir, "documents", ["doc_id", "text"])
    cand_docs = docs.map_batches(
        keep_candidates, batch_format="pandas"
    ).materialize()

    # adaptive verify: a SMALL candidate set (the common case at a sane
    # dedup rate) verifies against the stream-filtered candidate texts
    # pulled once to the driver — bounded by the candidate-id set we
    # already broadcast, NOT the corpus.  Past the threshold the
    # distributed two-join path below takes over unchanged.
    if len(ids) <= 50_000:
        texts = cand_docs.to_pandas().set_index("doc_id")["text"]
        a = cand_pd["doc_a"].map(texts).fillna("")
        b = cand_pd["doc_b"].map(texts).fillna("")
        jac = np.round([jaccard(x, y) for x, y in zip(a, b)], 4)
        out = cand_pd.assign(jaccard=jac)
        out = out[out["jaccard"] >= threshold]
        return (
            out.drop_duplicates(subset=["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )

    from .io import join_partitions

    n_join = join_partitions(len(cand_pd), lo=4)
    cand_ds = ray.data.from_pandas(cand_pd).repartition(4)
    j1 = cand_ds.join(
        cand_docs, join_type="inner", num_partitions=n_join,
        on=("doc_a",), right_on=("doc_id",),
    ).map_batches(
        lambda df: df.rename(columns={"text": "text_a"})[
            ["doc_a", "doc_b", "text_a"]
        ],
        batch_format="pandas",
    ).materialize()
    j2 = j1.join(
        cand_docs, join_type="inner", num_partitions=n_join,
        on=("doc_b",), right_on=("doc_id",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        jac = np.round(
            [
                jaccard(a or "", b or "")
                for a, b in zip(df["text_a"], df["text"])
            ],
            4,
        )
        out = pd.DataFrame(
            {"doc_a": df["doc_a"], "doc_b": df["doc_b"], "jaccard": jac}
        )
        return out[out["jaccard"] >= threshold]

    out = j2.map_batches(verify, batch_format="pandas").to_pandas()
    return (
        out.drop_duplicates(subset=["doc_a", "doc_b"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def ngram_jaccard_pairs(
    sf_dir: str,
    k: int = 3,
    threshold: float = 0.6,
    max_df: int = 200,
) -> pd.DataFrame:
    """Exact n-gram (word k-shingle) Jaccard near-dup pairs via a
    distributed inverted index: explode (doc, shingle-hash) → hash-
    partition by shingle (the shuffle key is uint64, never text) → per-
    partition self-merge on shingle (C-speed pandas join, no per-group
    python) → co-occurrence counts → jaccard = co / (|A| + |B| − co)
    ≥ threshold.

    Shingles appearing in more than ``max_df`` docs are skipped when
    pairing (standard frequent-shingle pruning; such shingles can only
    *lower* a pair's jaccard below what its rarer shingles establish —
    near-dup pairs at sane thresholds are unaffected).  Singleton
    shingles (most of them) never reach the merge."""
    from .io import read_table

    n_parts = 64
    docs = read_table(sf_dir, "documents", ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out_doc, out_sh, out_n = [], [], []
        for doc_id, t in zip(df["doc_id"], df["text"].fillna("")):
            hs = np.unique(_shingle_hashes(t, k))
            out_doc.extend([doc_id] * len(hs))
            out_sh.extend(hs.tolist())
            # per-doc distinct-shingle count rides along on every row so
            # the jaccard denominator never needs a driver-side lookup
            out_n.extend([len(hs)] * len(hs))
        sh = np.asarray(out_sh, np.uint64)
        return pd.DataFrame(
            {
                "doc_id": out_doc,
                "shingle": sh,
                "n_sh": np.asarray(out_n, np.int64),
                "part": (sh % np.uint64(n_parts)).astype(np.int64),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pandas")

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["shingle"].value_counts()
        keep = vc[(vc >= 2) & (vc <= max_df)].index
        d = df[df["shingle"].isin(keep)][["doc_id", "shingle", "n_sh"]]
        if d.empty:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in ("doc_a", "doc_b", "co", "sa", "sb")
                }
            )
        m = d.merge(d, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        co = (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .agg(co=("shingle", "size"), sa=("n_sh_x", "first"),
                 sb=("n_sh_y", "first"))
            .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
        )
        return co

    from .agg import bucketed_combine

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # combine partial co-occurrence counts per pair (a pair's rows
        # come from disjoint shingle partitions), then jaccard + filter
        # — C-speed pandas over the whole bucket, not per-group python
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            co=("co", "sum"), sa=("sa", "max"), sb=("sb", "max")
        )
        c = g["co"].to_numpy(np.float64)
        jac = c / (
            g["sa"].to_numpy(np.float64) + g["sb"].to_numpy(np.float64) - c
        )
        out = pd.DataFrame(
            {
                "doc_a": g["doc_a"],
                "doc_b": g["doc_b"],
                "jaccard": np.round(jac, 4),
            }
        )
        return out[out["jaccard"] >= threshold]

    co = exploded.groupby("part").map_groups(
        part_pairs, batch_format="pandas"
    )
    # only the above-threshold pairs (the query's actual result) reach
    # the driver
    out = bucketed_combine(co, ["doc_a", "doc_b"], finish).to_pandas()
    if out.empty:
        return _empty_pairs()
    return (
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


# ------------------------------------------------------------- SimHash

def _md5_u64(tokens: np.ndarray) -> np.ndarray:
    """uint64 token hash = first 8 bytes of md5, big-endian — exactly
    DuckDB's ``CAST(concat('0x', substr(md5(t), 1, 16)) AS UBIGINT)``,
    which makes the SimHash SQL-oracle-able.  Hash once per *unique*
    token in the batch (``pd.factorize`` — hash-table dedup, no object
    sort — + inverse scatter; the md5 loop itself is µs-scale even at
    10^5-token vocabularies)."""
    inv, uniq = pd.factorize(tokens)
    vals = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return vals[inv]


def _simhash_batch(texts: pd.Series) -> np.ndarray:
    """Vectorized 64-bit SimHash for a whole batch: md5-derived token
    hashes (SQL-expressible — see :func:`_md5_u64`), bit-unpack to a
    (n_tokens, 64) uint8 matrix, per-doc bit-count via one int32
    ``cumsum`` + segment difference (the r3 ``astype(int32)`` +
    ``np.add.reduceat`` pair was 2.0 s per 270k tokens; cumsum keeps
    the bit matrix uint8 and one memory pass), then sign of
    2·count − len → packed uint64.  Empty docs hash to 0."""
    import itertools

    t = texts.fillna("").str.strip()
    toks = t.str.split(_WS)
    toks = toks.where(t != "", other=None).map(
        lambda x: x if isinstance(x, list) else []
    )
    lens = toks.map(len).to_numpy(np.int64)
    n = len(lens)
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lens > 0
    if not nonempty.any():
        return out
    flat = np.asarray(
        list(itertools.chain.from_iterable(toks)), dtype=object
    )
    th = _md5_u64(flat)  # uint64 per token
    bits = np.unpackbits(
        th.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1
    )  # (n_tokens, 64) uint8 — never widened
    csum = np.zeros((len(flat) + 1, 64), dtype=np.int32)
    np.cumsum(bits, axis=0, dtype=np.int32, out=csum[1:])
    ends = np.cumsum(lens)
    starts = ends - lens
    cnt = csum[ends[nonempty]] - csum[starts[nonempty]]
    # bit set iff Σ(±1) > 0 ⇔ 2·count − n_tokens > 0
    acc = 2 * cnt - lens[nonempty, None]
    packed = np.packbits((acc > 0).astype(np.uint8), axis=1)
    vals = packed.astype(np.uint64) @ (
        np.uint64(1) << (np.arange(7, -1, -1, dtype=np.uint64) * np.uint64(8))
    )
    out[nonempty] = vals
    return out


def simhash64(text: str) -> int:
    """Single-doc convenience wrapper over the batch kernel."""
    return int(_simhash_batch(pd.Series([text]))[0])


def simhashes(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, simhash — 64-bit SimHash emitted as the int64 two's-
    complement view, matching the DuckDB oracle's
    ``CAST(v - CASE WHEN v >= 2^63 THEN 2^64 ELSE 0 END AS BIGINT)``."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "simhash": _simhash_batch(df["text"]).view(np.int64),
            }
        )

    from .io import read_table

    return read_table(
        sf_dir, "documents", ["doc_id", "text"], rows_per_block=512
    ).map_batches(f, batch_format="pandas")


def simhash_pairs(
    sf_dir: str, max_hamming: int = 3, n_bands: int = 4
) -> "ray.data.Dataset":
    """doc_a, doc_b, hamming — SimHash near-duplicate pairs, completing
    the SimHash family from signature to usable dedup: candidate pairs
    come from ``n_bands`` 16-bit signature bands (two docs collide when
    any band is bit-identical), then the exact Hamming distance of the
    full 64-bit signatures keeps pairs ≤ ``max_hamming``.  Recall is
    EXACT by pigeonhole — ≤ ``n_bands − 1`` differing bits touch at
    most ``n_bands − 1`` bands, leaving at least one band equal — so
    this is a lossless index, not an approximation (asserted:
    ``max_hamming ≤ n_bands − 1``).

    Shape: map-only band explode (4 rows per doc), one (band, key)
    bucketed reduce emitting in-bucket pairs (identical-content
    clusters of size m cost m²/2 pairs inside one bucket — the same
    skew note as MinHash banding), and a final pair-keyed bucketed
    DISTINCT (a pair colliding in several bands must count once).  No
    driver-side pair state."""
    assert max_hamming <= n_bands - 1, "pigeonhole recall needs ham < bands"
    from .agg import bucketed_combine

    sig = simhashes(sf_dir)

    def band_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["simhash"].to_numpy(np.int64).view(np.uint64)
        ids = df["doc_id"].to_numpy(np.int64)
        outs = []
        for j in range(n_bands):
            key = ((u >> np.uint64(16 * j)) & np.uint64(0xFFFF)).astype(
                np.int64
            )
            outs.append(
                pd.DataFrame(
                    {
                        "band": np.int64(j),
                        "key": key,
                        "doc_id": ids,
                        "sig": u.view(np.int64),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    def _popcount64(x: np.ndarray) -> np.ndarray:
        return (
            np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )

    def pair_combine(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, g in df.groupby(["band", "key"], sort=False):
            if len(g) < 2:
                continue
            g = g.sort_values("doc_id", kind="mergesort")
            ids = g["doc_id"].to_numpy(np.int64)
            sigs = g["sig"].to_numpy(np.int64).view(np.uint64)
            ia, ib = np.triu_indices(len(g), 1)
            ham = _popcount64(np.bitwise_xor(sigs[ia], sigs[ib]))
            m = ham <= max_hamming
            out_a.append(ids[ia[m]])
            out_b.append(ids[ib[m]])
            out_h.append(ham[m])
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "hamming": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    cand = bucketed_combine(
        sig.map_batches(band_partial, batch_format="pandas"),
        ["band", "key"],
        pair_combine,
    )
    # distinct across bands: same pair from different bands folds once
    return bucketed_combine(
        cand,
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
    )


def simhash_keep(
    sf_dir: str, max_hamming: int = 3, distributed: bool = False
) -> pd.DataFrame:
    """doc_id, keep_id — keep/drop list over the :func:`simhash_pairs`
    graph: connected components, keep = component min doc_id (the
    SimHash twin of :func:`doc_neardup_keep`; transitive chains a~b,
    b~c collapse to one keeper).  Union-find runs on the PAIR LIST —
    the driver-sized result of the distributed banded index;
    ``distributed=True`` switches to the same min-label propagation
    the MinHash keep uses for pair lists that outgrow one node."""
    pairs = (
        simhash_pairs(sf_dir, max_hamming)
        .to_pandas()
        .rename(columns={"doc_a": "vec_a", "doc_b": "vec_b"})
    )
    if distributed:
        cc = connected_components_distributed(pairs)
        return cc.rename(columns={"node": "doc_id", "label": "keep_id"})
    return _unionfind_keep(pairs, "doc_id")


# -------------------------------------------------- corpus cleansing

def clean_corpus_keep(
    sf_dir: str, lang: str = "en", min_quality: float = 0.3
) -> "ray.data.Dataset":
    """The composite training-data prep pipeline: language filter →
    quality filter → exact dedup, returning the keep-list
    (doc_id = min per content hash, content_md5, n_dups).

    One streaming pass computes md5+quality per batch and filters;
    the only shuffle is the final groupby on the md5 key.  Fully
    SQL-expressible → oracled end-to-end (quality formula shared with
    ``text.quality_scores``)."""
    import re as _re

    ws = _re.compile(r"\s+")

    def score_filter(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"] == lang]
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "content_md5": pd.Series([], dtype=object),
                }
            )
        t = df["text"].fillna("").str.strip()
        # count+1 == len(split) on stripped text (see text._WS note)
        n_tokens = (t.str.count(ws) + 1).where(t != "", 0).astype("float64")
        from .text import round4_half_away

        q = round4_half_away(
            0.5 * np.minimum(1.0, df["n_chars"].astype("float64") / 1000.0)
            + 0.5 * np.minimum(1.0, n_tokens / 200.0)
        )
        keep = df[q >= min_quality]
        return pd.DataFrame(
            {
                "doc_id": keep["doc_id"],
                "content_md5": [
                    hashlib.md5(x.encode("utf-8")).hexdigest()
                    for x in keep["text"].fillna("")
                ],
            }
        )

    from .agg import bucketed_combine
    from .io import read_table

    ds = read_table(
        sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"]
    ).map_batches(score_filter, batch_format="pandas")
    # hash-bucketed md5 reduce (see exact_dedup): min-doc + dup count
    # per content hash without Ray's per-group aggregate cost
    return bucketed_combine(
        ds,
        ["content_md5"],
        lambda df: df.groupby("content_md5", as_index=False)
        .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
        .astype({"doc_id": "int64", "n_dups": "int64"})[
            ["doc_id", "content_md5", "n_dups"]
        ],
    )


def connected_components_distributed(
    pairs: pd.DataFrame, n_buckets: int = 32, max_iters: int = 64
) -> pd.DataFrame:
    """Distributed min-label propagation over an undirected edge list:
    each round every node takes the min of its own label and its
    neighbors' labels (one hash join edges⋈labels + one bucketed
    min-reduce per round), until the global label sum stops changing —
    labels are monotonically non-increasing, so an unchanged sum IS the
    fixpoint.  Converges in O(component diameter) rounds; the label
    table and edge list stay distributed throughout, so this is the
    path for pair lists too large for one node's union-find.
    Returns (node, label) with label = component min."""
    a = pairs.iloc[:, 0].to_numpy(np.int64)
    b = pairs.iloc[:, 1].to_numpy(np.int64)
    edges_pd = pd.DataFrame(
        {
            "src": np.concatenate([a, b]),
            "dst": np.concatenate([b, a]),
        }
    )
    nodes = np.unique(edges_pd["src"].to_numpy())
    if len(nodes) == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "label": pd.Series([], dtype="int64"),
            }
        )
    from .agg import bucketed_combine

    n_blocks = max(1, min(8, len(edges_pd) // 10_000 + 1))
    edges = ray.data.from_pandas(edges_pd).repartition(n_blocks).materialize()
    labels = ray.data.from_pandas(
        pd.DataFrame({"node": nodes, "label": nodes})
    ).repartition(n_blocks).materialize()
    prev_sum = int(nodes.astype(object).sum())
    converged = False
    for _ in range(max_iters):
        msgs = edges.join(
            labels, join_type="inner", num_partitions=n_blocks,
            on=("src",), right_on=("node",),
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "label": df["label"]}),
            batch_format="pandas",
        )
        labels = bucketed_combine(
            msgs.union(labels),
            ["node"],
            lambda df: df.groupby("node", as_index=False).agg(
                label=("label", "min")
            ),
            n_buckets=n_buckets,
        ).materialize()
        cur_sum = int(
            labels.map_batches(
                lambda df: pd.DataFrame({"s": [df["label"].astype(object).sum()]}),
                batch_format="pandas",
            ).to_pandas()["s"].sum()
        )
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        # min-label propagation needs O(component diameter) rounds; a
        # chain-like component with diameter > max_iters would otherwise
        # silently return labels that are NOT the component minimum
        raise RuntimeError(
            f"connected_components_distributed did not converge in "
            f"{max_iters} rounds (component diameter exceeds max_iters); "
            "raise max_iters"
        )
    out = labels.to_pandas().astype({"node": "int64", "label": "int64"})
    return out.sort_values("node").reset_index(drop=True)


def embedding_dedup_keep(
    sf_dir: str, threshold: float = 0.95, distributed: bool = False
) -> pd.DataFrame:
    """Near-dup keep/drop list: connected components over the
    ``embedding_near_dup_pairs`` graph, keep = min vec_id per
    component.  The union-find runs on the *pair list* (the result set
    of the distributed pipeline, not the corpus) — at 100 TB that list
    is the dedup rate × corpus, the standard driver-sized artifact;
    ``distributed=True`` switches to the groupby-iterate min-label
    propagation (:func:`connected_components_distributed`) for pair
    lists that outgrow one node."""
    pairs = embedding_near_dup_pairs(sf_dir, threshold=threshold)
    if distributed:
        cc = connected_components_distributed(pairs)
        return cc.rename(columns={"node": "vec_id", "label": "keep_id"})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted(
        {int(v) for col in ("vec_a", "vec_b") for v in pairs[col]}
    )
    return pd.DataFrame(
        {
            "vec_id": pd.Series(rows, dtype="int64"),
            "keep_id": pd.Series([find(v) for v in rows], dtype="int64"),
        }
    )


def doc_neardup_keep(
    sf_dir: str, threshold: float = 0.6, distributed: bool = False
) -> pd.DataFrame:
    """Text near-dup keep/drop list: connected components over the
    :func:`minhash_lsh_pairs` graph, keep = min doc_id per component —
    the document-side twin of :func:`embedding_dedup_keep` (transitive
    near-dup chains a~b, b~c collapse to one keeper even when (a, c)
    is below threshold).  The union-find runs on the PAIR LIST (dedup
    rate × corpus, the standard driver-sized artifact);
    ``distributed=True`` switches to min-label propagation for pair
    lists that outgrow one node."""
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold).rename(
        columns={"doc_a": "vec_a", "doc_b": "vec_b"}
    )
    if distributed:
        cc = connected_components_distributed(pairs)
        return cc.rename(columns={"node": "doc_id", "label": "keep_id"})
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted(
        {int(v) for col in ("vec_a", "vec_b") for v in pairs[col]}
    )
    return pd.DataFrame(
        {
            "doc_id": pd.Series(rows, dtype="int64"),
            "keep_id": pd.Series([find(v) for v in rows], dtype="int64"),
        }
    )


# ----------------------------------------------- embedding near-dup

def embedding_near_dup_pairs(
    sf_dir: str, threshold: float = 0.95, n_planes: int = 12, seed: int = 42
) -> pd.DataFrame:
    """(vec_a < vec_b, cosine ≥ threshold) via hyperplane-LSH buckets +
    exact verify inside each bucket.  The bucket groupby is the only
    shuffle; pair verification is a small numpy matmul per bucket."""
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)

    first = ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes)).astype(np.float64)

    # planes is (dim × n_planes) floats — small enough to ship in the
    # task closure, so no actor pool / ray.put round-trip needed
    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        bits = (m @ planes) > 0
        keys = np.packbits(bits, axis=1)[:, :2]
        bucket = (keys[:, 0].astype(np.int64) << 8) | keys[:, 1]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"],
                "bucket": bucket,
                "embedding": df["embedding"],
            }
        )

    bucketed = ds.map_batches(bucketize, batch_format="pandas")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []})
        ids = df["vec_id"].to_numpy()
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        norm = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.clip(norm, 1e-12, None)
        sims = m @ m.T
        ia, ib = np.triu_indices(len(df), k=1)
        mask = sims[ia, ib] >= threshold
        a, b = ids[ia[mask]], ids[ib[mask]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cosine": np.round(sims[ia, ib][mask], 4)}
        )

    def verify_buckets(df: pd.DataFrame) -> pd.DataFrame:
        # many LSH buckets (most singletons) per hash partition — loop
        # them here instead of one Ray group per bucket (2^n_planes
        # groups would pay Ray's per-group aggregate cost; see agg.py)
        outs = [
            verify(g)
            for _, g in df.groupby("bucket", sort=False)
            if len(g) >= 2
        ]
        if not outs:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series([], dtype="int64"),
                    "vec_b": pd.Series([], dtype="int64"),
                    "cosine": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from .agg import bucketed_combine

    out = bucketed_combine(bucketed, ["bucket"], verify_buckets).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return (
        out.drop_duplicates(subset=["vec_a", "vec_b"])
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


# Above this row count embedding_near_dup_pairs_exact switches from the
# full-matrix broadcast sweep to the IVF-cell block-pair kernel (no
# O(n·dim) ray.put; per-task memory is two bounded spill blocks)
_BLOCKED_SWEEP_MIN_ROWS = 100_000

# Each spilled block holds at most ~this many rows regardless of cell
# skew (each cell is salted into ceil(cell_count / this) sub-blocks by
# vec_id), so a single write_block group or sweep task never
# materializes more than O(_SPILL_BLOCK_ROWS · dim) — even when one
# near-dup cluster swallows a whole cell.
_SPILL_BLOCK_ROWS = 262_144

# Sims-matrix tile shape inside a sweep task: peak float64 scratch is
# _SWEEP_TILE_A × _SWEEP_TILE_B × 8 B ≈ 512 MB, independent of block
# or cell size.
_SWEEP_TILE_A = 2_048
_SWEEP_TILE_B = 32_768


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche (public-domain finalizer constants):
    decorrelates structured vec_ids (strided/even-only allocations)
    from the salt modulo so sub-block splits stay uniform."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _empty_vec_pairs() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "vec_a": pd.Series([], dtype="int64"),
            "vec_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )


@ray.remote
def _sweep_block_files(
    path_a: str, path_b: str, t: float, same: bool
) -> pd.DataFrame:
    """Qualifying cosine pairs between two spilled block files (already
    normalized), tiled so peak float64 scratch is _SWEEP_TILE_A ×
    _SWEEP_TILE_B regardless of block size.  Same-block: both (i, j)
    and (j, i) appear across tiles, so canonical order comes free from
    ``a < b``.  Cross-block: ids are disjoint and each unordered pair
    appears exactly once in the cross product, emitted as (min, max)."""
    import pyarrow.parquet as pq

    from .text import round4_half_away

    def load(p):
        tbl = pq.read_table(p)
        return (
            tbl.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64),
            np.stack(tbl.column("embedding").to_numpy(zero_copy_only=False)),
        )

    ids_a, ma = load(path_a)
    ids_b, mb = (ids_a, ma) if path_b == path_a else load(path_b)
    outs: list[pd.DataFrame] = []
    for ra in range(0, len(ids_a), _SWEEP_TILE_A):
        ta = ma[ra : ra + _SWEEP_TILE_A]
        for rb in range(0, len(ids_b), _SWEEP_TILE_B):
            if same and rb + _SWEEP_TILE_B <= ra:
                # block files are written id-ascending, so a tile
                # strictly below the diagonal has ids_b[j] < ids_a[i]
                # everywhere — every pair fails a < b; skip the matmul
                continue
            sims = ta @ mb[rb : rb + _SWEEP_TILE_B].T
            ai, bj = np.nonzero(sims >= t)
            if not len(ai):
                continue
            a, b, s = ids_a[ra + ai], ids_b[rb + bj], sims[ai, bj]
            if same:
                keep = a < b
                a, b, s = a[keep], b[keep], s[keep]
            else:
                a, b = np.minimum(a, b), np.maximum(a, b)
            outs.append(
                pd.DataFrame(
                    {"vec_a": a, "vec_b": b, "cosine": round4_half_away(s)}
                )
            )
    if not outs:
        return _empty_vec_pairs()
    return pd.concat(outs, ignore_index=True)


def _blocked_exact_pairs_ds(
    ds: "ray.data.Dataset", threshold: float,
    n_cells: int | None = None, spill_dir: str | None = None,
    block_rows: int = _SPILL_BLOCK_ROWS,
) -> pd.DataFrame:
    """The 100-TB shape of the exact all-pairs sweep, driver-light end
    to end: NOTHING O(n·dim) ever sits on the driver or in one task.

    1. **Centroids** (one pass): C deterministic target ids evenly
       spaced over [min, max] vec_id; each batch nominates its nearest
       row per target (ties → smaller id), the driver folds the ≤
       C-per-batch candidates to C centroid rows and normalizes them —
       driver state C×dim.  C grows with both √n (prune granularity)
       and n / block_rows (so a BALANCED cell fits one spill block).
    2. **Assign once + count + salt + spill**: the n×C×dim argmax
       matmul runs exactly once and the labeled normalized dataset is
       materialized in the object store (spillable — never the
       driver); a cheap column pass folds per-cell populations on the
       driver (O(C) state); each cell is then salted into
       ceil(count / block_rows) sub-blocks by an avalanche-mixed
       ``vec_id`` modulo (stride-proof), so a spilled block holds at
       most ~block_rows rows EVEN WHEN ONE NEAR-DUP CLUSTER SWALLOWS A
       WHOLE CELL — the exact workload this kernel targets.
       ``groupby(blk).map_groups`` co-locates each block, writes it
       id-sorted to its own Parquet file, and returns one (cell, blk,
       path, n, radius) stats row.  Per-task memory is one block,
       O(block_rows · dim), independent of n and of skew.
    3. **Pruned block-pair sweep**: block pairs are EXACTLY pruned by
       the triangle inequality on normalized vectors — members of
       blocks with centroids c_i, c_j and radii r_i, r_j satisfy
       ||x−y|| ≥ ||c_i−c_j|| − r_i − r_j, and cosine ≥ t ⇔ ||x−y|| ≤
       √(2−2t) — so a far-apart pair provably contains no qualifying
       pair and is skipped (recall 1.0 by construction, unlike
       probe-limited IVF search).  Same-cell block pairs have centroid
       distance 0 and are never pruned.  One Ray task per surviving
       pair reads the two block files and does a TILED cross product
       (_SWEEP_TILE_A × _SWEEP_TILE_B float64 scratch, ~512 MB peak,
       independent of block size).

    The spill directory (default a fresh tempdir under /tmp) is
    removed on success; at cluster scale point ``spill_dir`` at shared
    storage so sweep tasks on other nodes can read the blocks."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = ds.count()
    if n == 0:
        _blocked_exact_pairs_ds.last_stats = {
            "cells": 0, "blocks": 0, "pairs_swept": 0, "pairs_total": 0,
        }
        return _empty_vec_pairs()
    # √n for prune granularity; n/block_rows so balanced cells fit one
    # spill block (skewed cells are salted in pass 2 regardless).
    C = n_cells or max(
        2,
        min(4096, int(np.sqrt(n / 2048.0)) + 2),
        -(-n // block_rows),
    )

    def _norm(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        ids = df["vec_id"].to_numpy(np.int64)
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        return ids, m

    # ---- pass 1: centroid candidates --------------------------------
    rng = ds.map_batches(
        lambda df: pd.DataFrame(
            {"lo": [df["vec_id"].min()], "hi": [df["vec_id"].max()]}
        ),
        batch_format="pandas",
    ).to_pandas()
    lo, hi = int(rng["lo"].min()), int(rng["hi"].max())
    targets = np.unique(np.linspace(lo, hi, C).round().astype(np.int64))

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        ids, m = _norm(df)
        rows = []
        for ti, t in enumerate(targets):
            d = np.abs(ids - t)
            # deterministic tie-break: min (distance, id)
            j = np.lexsort((ids, d))[0]
            rows.append((ti, int(d[j]), int(ids[j]), m[j]))
        return pd.DataFrame(
            rows, columns=["target", "dist", "vec_id", "embedding"]
        )

    cpd = ds.map_batches(cand, batch_format="pandas").to_pandas()
    cpd = cpd.sort_values(["target", "dist", "vec_id"], kind="mergesort")
    cpd = cpd.drop_duplicates("target", keep="first")
    cpd = cpd.drop_duplicates("vec_id", keep="first")
    cents = np.stack(cpd["embedding"].to_numpy())
    cents_ref = ray.put(cents)

    C_eff = len(cents)

    # ---- pass 2: assign ONCE, then count / salt / spill ----------------
    # The n×C×dim argmax matmul is the kernel's dominant map cost, so it
    # runs exactly once: the labeled (vec_id, cell, normalized
    # embedding) dataset is materialized into the OBJECT STORE
    # (spillable, same footprint class as the input — never the
    # driver); counts and the blk label are cheap column passes over it.
    def assign(df: pd.DataFrame, _ref=cents_ref) -> pd.DataFrame:
        ids, m = _norm(df)
        cell = np.argmax(m @ ray.get(_ref).T, axis=1).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": ids, "cell": cell, "embedding": list(m)}
        )

    assigned = ds.map_batches(assign, batch_format="pandas").materialize()

    def count_cells(df: pd.DataFrame) -> pd.DataFrame:
        cnt = np.bincount(df["cell"].to_numpy(), minlength=C_eff)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame(
            {"cell": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)}
        )

    cc = (
        assigned.select_columns(["cell"])
        .map_batches(count_cells, batch_format="pandas")
        .to_pandas()
    )
    cell_n = cc.groupby("cell")["n"].sum()
    salts = np.ones(C_eff, dtype=np.int64)
    salts[cell_n.index.to_numpy()] = np.maximum(
        1, -(-cell_n.to_numpy() // block_rows)
    )
    s_max = int(salts.max())

    spill = spill_dir or tempfile.mkdtemp(prefix="snapray_blockpairs_")
    os.makedirs(spill, exist_ok=True)

    def add_blk(df: pd.DataFrame, _salts=salts) -> pd.DataFrame:
        cell = df["cell"].to_numpy(np.int64)
        # avalanche the id before the modulo: structured ids (even-only,
        # strided allocations) sharing a factor with the salt count
        # would otherwise collapse onto few residues and void the
        # per-block size bound
        mixed = _mix64(df["vec_id"].to_numpy(np.uint64))
        salt = (mixed % _salts[cell].astype(np.uint64)).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(np.int64),
                "blk": cell * s_max + salt,
                "embedding": df["embedding"],
            }
        )

    def write_block(g: pd.DataFrame, _ref=cents_ref) -> pd.DataFrame:
        blk = int(g["blk"].iloc[0])
        c = blk // s_max
        # sort by id: pairs need a < b, so with ascending ids the sweep
        # can skip whole same-block tiles strictly below the diagonal
        g = g.sort_values("vec_id", kind="mergesort")
        ids = g["vec_id"].to_numpy(np.int64)
        m = np.stack(g["embedding"].to_numpy())
        path = os.path.join(spill, f"blk_{blk}.parquet")
        pq.write_table(
            pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(m))}),
            path,
        )
        r = float(np.max(np.linalg.norm(m - ray.get(_ref)[c], axis=1)))
        return pd.DataFrame(
            {"cell": [c], "blk": [blk], "path": [path],
             "n": [len(ids)], "radius": [r]}
        )

    stats = (
        assigned.map_batches(add_blk, batch_format="pandas")
        .groupby("blk")
        .map_groups(write_block, batch_format="pandas")
        .to_pandas()
    )

    # ---- pass 3: pruned block-pair sweep ------------------------------
    d_lim = float(np.sqrt(max(0.0, 2.0 - 2.0 * threshold)))
    blocks = stats.sort_values("blk").reset_index(drop=True)
    ci = blocks["cell"].to_numpy(np.int64)
    rad = blocks["radius"].to_numpy(np.float64)
    bpaths = blocks["path"].tolist()
    # centroid pairwise distances once, in gram-matrix form: O(C²)
    # memory, never the O(C²·dim) broadcast intermediate
    gram = cents @ cents.T
    sq = np.diag(gram)
    cdist = np.sqrt(np.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0))
    B = len(blocks)
    # enumerate pairs one row at a time (O(B) transient, not the O(B²)
    # triu_indices arrays — B is unbounded at scale)
    tasks = []
    for i in range(B):
        j = np.arange(i, B)
        ok = cdist[ci[i], ci[j]] - rad[i] - rad[j] <= d_lim
        tasks.extend(
            _sweep_block_files.remote(
                bpaths[i], bpaths[jj], threshold, i == jj
            )
            for jj in j[ok].tolist()
        )
    # observability (and test hook): how much the prune saved
    _blocked_exact_pairs_ds.last_stats = {
        "cells": C_eff,
        "blocks": B,
        "pairs_swept": len(tasks),
        "pairs_total": B * (B + 1) // 2,
    }
    parts = [p for p in ray.get(tasks) if len(p)]
    if spill_dir is None:
        shutil.rmtree(spill, ignore_errors=True)
    if not parts:
        return _empty_vec_pairs()
    return pd.concat(parts, ignore_index=True)


def _blocked_exact_pairs(
    ids_all: np.ndarray, m_all: np.ndarray, threshold: float,
    n_cells: int | None = None, block_rows: int = _SPILL_BLOCK_ROWS,
) -> pd.DataFrame:
    """Array-input convenience wrapper over the distributed kernel
    (tests drive the prune and salting logic through this)."""
    ds = ray.data.from_pandas(
        pd.DataFrame({"vec_id": ids_all, "embedding": list(m_all)})
    ).repartition(8)
    out = _blocked_exact_pairs_ds(
        ds, threshold, n_cells=n_cells, block_rows=block_rows
    )
    _blocked_exact_pairs.last_stats = _blocked_exact_pairs_ds.last_stats
    return out


def embedding_near_dup_pairs_exact(
    sf_dir: str, threshold: float = 0.4,
    blocked_min_rows: int = _BLOCKED_SWEEP_MIN_ROWS,
) -> pd.DataFrame:
    """(vec_a < vec_b, cosine) — EXACT all-pairs cosine ≥ threshold.

    The guaranteed-recall complement of
    :func:`embedding_near_dup_pairs`: single-probe hyperplane LSH only
    verifies same-bucket pairs, and at moderate thresholds the bucket
    collision probability collapses ((1−θ/π)^12 ≈ 0.004 at cos 0.4), so
    the bucketed path is a high-threshold near-dup tool only.

    Two kernels, same result: below ``blocked_min_rows`` the normalized
    matrix is broadcast once (``ray.put``, O(n·dim) — the same artifact
    class as the kNN query matrix) and every streamed batch emits its
    rows' qualifying pairs against it, ``vec_a < vec_b`` taken from the
    batch side.  At or above it, :func:`_blocked_exact_pairs_ds` runs
    the IVF-cell block-pair sweep with exact triangle-inequality
    pruning straight off the Dataset — nothing O(n·dim) on the driver
    or in any single task; per-task memory is two bounded spill blocks
    plus a fixed-size sims tile, independent of n and of cell skew."""
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16)
    if ds.count() >= blocked_min_rows:
        out = _blocked_exact_pairs_ds(ds, threshold)
        if out.empty:
            return out
        return (
            out.astype({"vec_a": "int64", "vec_b": "int64"})
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
    all_pd = ds.to_pandas()
    ids_all = all_pd["vec_id"].to_numpy(np.int64)
    m_all = np.stack(all_pd["embedding"].to_numpy()).astype(np.float64)
    m_all = m_all / np.clip(
        np.linalg.norm(m_all, axis=1, keepdims=True), 1e-12, None
    )
    ref = ray.put((ids_all, m_all))

    class Sweep:
        def __init__(self, ref, t):
            self.ids, self.m = ray.get(ref)
            self.t = t

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids = df["vec_id"].to_numpy(np.int64)
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
            sims = m @ self.m.T
            bi, oj = np.nonzero(sims >= self.t)
            a, b, s = ids[bi], self.ids[oj], sims[bi, oj]
            keep = a < b
            from .text import round4_half_away

            return pd.DataFrame(
                {
                    "vec_a": a[keep],
                    "vec_b": b[keep],
                    "cosine": round4_half_away(s[keep]),
                }
            )

    out = ds.map_batches(
        Sweep,
        batch_format="pandas",
        batch_size=1024,
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref, "t": threshold},
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return (
        out.astype({"vec_a": "int64", "vec_b": "int64"})
        .sort_values(["vec_a", "vec_b"])
        .reset_index(drop=True)
    )


def _unionfind_keep(pairs: pd.DataFrame, id_col: str) -> pd.DataFrame:
    """Union-find keep-list over an edge list (columns vec_a/vec_b):
    (id_col, keep_id = component min).  Runs on the pair list — the
    result set of a distributed pipeline, not the corpus."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["vec_a"], pairs["vec_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = sorted(
        {int(v) for col in ("vec_a", "vec_b") for v in pairs[col]}
    )
    return pd.DataFrame(
        {
            id_col: pd.Series(rows, dtype="int64"),
            "keep_id": pd.Series([find(v) for v in rows], dtype="int64"),
        }
    )


def embedding_dedup_keep_exact(
    sf_dir: str, threshold: float = 0.4
) -> pd.DataFrame:
    """Keep/drop list over the EXACT near-dup graph
    (:func:`embedding_near_dup_pairs_exact`): connected components,
    keep = min vec_id — the moderate-threshold twin of
    :func:`embedding_dedup_keep`."""
    return _unionfind_keep(
        embedding_near_dup_pairs_exact(sf_dir, threshold=threshold), "vec_id"
    )


def decontaminate(
    sf_dir: str, k: int = 8, bench_mod: int = 97
) -> "ray.data.Dataset":
    """doc_id, n_hits, contaminated — benchmark decontamination.

    Flags every training document that shares a word ``k``-shingle
    with a held-out benchmark set (the standard eval-leak scrub, cf.
    GPT-3 appendix C / Gopher §A.3 13-gram overlap).  The benchmark
    set here is ``doc_id % bench_mod == 0`` — a deterministic stand-in
    for an external eval corpus, tiny by construction the way real
    test sets are.  Shape: the benchmark shingle-hash set is built
    from a pruned read of just the benchmark rows, sorted once on the
    driver (O(|benchmark|), not O(corpus)), broadcast with ``ray.put``,
    and probed with ``np.searchsorted`` inside every batch — a
    broadcast semi-join, zero shuffle; the training side streams.
    Docs with < k tokens contribute their whole text as one shingle
    (same rule as ``_shingle_hashes``).  Output covers every
    non-benchmark doc; ``n_hits`` = distinct shared shingles."""
    from .io import read_table

    bench_parts = (
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda df: pd.DataFrame(
                {
                    "h": np.unique(
                        np.concatenate(
                            [
                                _shingle_hashes(t, k)
                                for t in df.loc[
                                    df["doc_id"] % bench_mod == 0, "text"
                                ].fillna("")
                            ]
                            or [np.empty(0, np.uint64)]
                        )
                    )
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    bench = np.unique(bench_parts["h"].to_numpy(np.uint64))
    ref = ray.put(bench)

    class ProbeStage:
        def __init__(self, ref):
            self.bench = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["doc_id"] % bench_mod != 0]
            hits = np.zeros(len(df), dtype=np.int64)
            if len(self.bench) and len(df):
                hits = _batch_distinct_hits(
                    df["text"].fillna("").to_numpy(), self.bench, k
                )
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(),
                    "n_hits": hits,
                    "contaminated": hits > 0,
                }
            )

    return read_table(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        ProbeStage,
        batch_format="pandas",
        concurrency=(1, 8),
        fn_constructor_kwargs={"ref": ref},
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication within k-means clusters
# ---------------------------------------------------------------------------


def _semdedup_assign(
    sf_dir: str, k: int, n_iter: int, scale: int
) -> "ray.data.Dataset":
    """vec_id, cluster_id, d2, embedding — exact fixed-point assignment
    against the centroids AFTER ``n_iter - 1`` Lloyd updates (what the
    shared kmeans_fixed SQL replay calls ``cent{n_iter-1}``, the
    centroids its final ``a{n_iter}`` assignment uses).  d2 is the
    int64 quantized distance to the assigned centroid; ties break to
    the smaller cluster index, matching both kmeans_fixed and the
    oracle's ``ORDER BY d2 ASC, cluster_id ASC``."""
    from .io import read_table
    from .similarity import _round_half_away_int, kmeans_fixed_centroids

    cent = kmeans_fixed_centroids(sf_dir, k, n_updates=n_iter - 1,
                                  scale=scale)
    ref = ray.put(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)  # (k, dim) int64
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = _round_half_away_int(m * scale)
        d2 = (
            (q * q).sum(1, keepdims=True)
            - 2 * (q @ c.T)
            + (c * c).sum(1)[None, :]
        )
        a = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(),
                "cluster_id": a.astype(np.int64),
                "d2": d2[np.arange(len(a)), a],
                "embedding": df["embedding"].to_numpy(),
            }
        )

    return read_table(
        sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16
    ).map_batches(assign, batch_format="pandas")


def _tau_hit_mask(
    dots: np.ndarray, aa_a: np.ndarray, aa_b: np.ndarray,
    tau_num: int, tau_den: int,
) -> np.ndarray:
    """Boolean mask of the EXACT integer cosine-τ test
    ``tau_den²·dots² ≥ tau_num²·aa_a·aa_b AND dots > 0`` in
    arbitrary-precision Python ints (object dtype) — the ONE place the
    test exists, shared by the in-group sweep and the fan-out block
    kernel so the two paths cannot drift (they must stay bit-identical
    for the SemDeDup oracles)."""
    hit = np.zeros(len(dots), dtype=bool)
    pos = dots > 0  # cos ≤ 0 can never reach a positive tau
    if not pos.any():
        return hit
    lhs = (tau_den * tau_den) * (dots[pos].astype(object) ** 2)
    rhs = (tau_num * tau_num) * (
        aa_a[pos].astype(object) * aa_b[pos].astype(object)
    )
    hit[pos] = np.asarray(lhs >= rhs, dtype=bool)
    return hit


@ray.remote
def _semdedup_block_pair(
    q_i: np.ndarray, q_j: np.ndarray, off_i: int, off_j: int,
    same: bool, tau_num: int, tau_den: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Cross-gram τ-sweep of one block pair of a FAT cluster: returns
    (ia, ib) as indices into the cluster's ids-sorted order (globally
    offset).  ``same`` sweeps the in-block upper triangle."""
    aa_i = np.einsum("ij,ij->i", q_i, q_i)
    aa_j = aa_i if same else np.einsum("ij,ij->i", q_j, q_j)
    dots = q_i @ q_j.T
    if same:
        li, lj = np.triu_indices(len(q_i), 1)
    else:
        li = np.repeat(np.arange(len(q_i)), len(q_j))
        lj = np.tile(np.arange(len(q_j)), len(q_i))
    hit = _tau_hit_mask(dots[li, lj], aa_i[li], aa_j[lj], tau_num, tau_den)
    return off_i + li[hit], off_j + lj[hit]


# Above this many rows, a cluster's O(n²) sweep stops running inside
# ONE map_groups task and fans out as fixed-size block-pair sub-tasks —
# the VERDICT r4 skew guard: at fixed k, cluster size grows linearly
# with the corpus, and one fat cluster would otherwise serialize on a
# single worker (the sibling blocked near-dup kernel solved the same
# problem with spill blocks; here the τ test must stay exact-integer,
# so the fan-out reuses _tau_hit_mask and skips the float pruning).
_SEMDEDUP_CLUSTER_CAP = 4096


def _semdedup_cluster_pairs(
    g: pd.DataFrame, scale: int, tau_num: int, tau_den: int,
    cap: int | None = _SEMDEDUP_CLUSTER_CAP,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ids sorted asc, ia, ib) — within-cluster index pairs (ia < ib)
    whose EXACT cosine ≥ tau_num/tau_den: integer test
    ``tau_den²·(a·b)² ≥ tau_num²·(a·a)(b·b) AND a·b > 0`` on the
    quantized vectors.  Dots fit int64 (64 dims × scale² ≤ 6.4e13);
    the squared comparison runs in arbitrary-precision Python ints
    (object dtype) exactly like the oracle's HUGEINT arithmetic.

    Clusters larger than ``cap`` rows fan out as block-pair sub-tasks
    (``_semdedup_block_pair``) instead of sweeping the full O(n²) gram
    in this one task; the result is bit-identical by construction
    (same τ mask, exhaustive block pairs over the same sorted order)."""
    from .similarity import _round_half_away_int

    ids = g["vec_id"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    m = np.stack(g["embedding"].to_numpy())[order].astype(np.float64)
    q = _round_half_away_int(m * scale)
    n = len(ids)
    if cap is not None and n > cap:
        blocks = [(s, min(s + cap, n)) for s in range(0, n, cap)]
        refs = [
            _semdedup_block_pair.remote(
                q[si:ei], q[sj:ej], si, sj, (si == sj), tau_num, tau_den
            )
            for bi, (si, ei) in enumerate(blocks)
            for (sj, ej) in blocks[bi:]
        ]
        parts = ray.get(refs)
        ia = np.concatenate([p[0] for p in parts]) if parts else np.array([], np.int64)
        ib = np.concatenate([p[1] for p in parts]) if parts else np.array([], np.int64)
        return ids, ia.astype(np.int64), ib.astype(np.int64)
    gram = q @ q.T  # int64 exact
    aa = np.diag(gram).copy()
    ia, ib = np.triu_indices(n, 1)
    hit = _tau_hit_mask(gram[ia, ib], aa[ia], aa[ib], tau_num, tau_den)
    return ids, ia[hit], ib[hit]


def semdedup_pairs(
    sf_dir: str,
    k: int = 8,
    n_iter: int = 3,
    tau_num: int = 2,
    tau_den: int = 5,
    scale: int = 10**6,
    cluster_cap: int | None = _SEMDEDUP_CLUSTER_CAP,
) -> pd.DataFrame:
    """cluster_id, vec_a, vec_b — SemDeDup candidate structure (Abbas
    et al. 2023, "SemDeDup: Data-efficient learning at web-scale
    through semantic deduplication"): embeddings are k-means-clustered,
    then ONLY within-cluster pairs are swept for cosine ≥ τ — the
    clustering bounds the quadratic sweep to cluster-sized blocks, the
    same role the IVF cells play in the blocked near-dup kernel.

    Exactness: assignment reuses kmeans_fixed's int64 fixed-point
    pipeline (micro-unit quantization, exact argmin, floor-division
    updates), and the cosine test is the integer cross-multiplication
    ``tau_den²(a·b)² ≥ tau_num²(a·a)(b·b), a·b > 0`` — no float
    anywhere a tie could flip, so a DuckDB HUGEINT replay reproduces
    the pair set bit-for-bit (τ = 2/5 is non-vacuous on the synthetic
    embeddings, whose max off-diagonal cosine is ≈0.51 at sf0.01).

    Scale: the paper runs k ≈ 50k clusters over LAION so each cluster
    is a few thousand rows; here the cluster sweep is a
    ``groupby(cluster_id).map_groups`` — one all-to-all keyed by the
    small int cluster id, each group swept locally, nothing quadratic
    in the corpus.  Clusters that outgrow ``cluster_cap`` rows (key
    skew, or a corpus that grew under fixed k) fan out as block-pair
    sub-tasks instead of serializing one O(n²) sweep on one worker —
    bit-identical results (same shared τ mask, exhaustive block
    pairs).  k is the knob that holds cluster size constant as
    the corpus grows."""
    asg = _semdedup_assign(sf_dir, k, n_iter, scale)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        ids, ia, ib = _semdedup_cluster_pairs(
            g, scale, tau_num, tau_den, cap=cluster_cap
        )
        cid = np.int64(g["cluster_id"].iloc[0]) if len(g) else np.int64(0)
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(ia), cid, dtype=np.int64),
                "vec_a": ids[ia],
                "vec_b": ids[ib],
            }
        )

    return (
        asg.groupby("cluster_id")
        .map_groups(sweep, batch_format="pandas")
        .to_pandas()
    )


def semdedup_keep(
    sf_dir: str,
    k: int = 8,
    n_iter: int = 3,
    tau_num: int = 2,
    tau_den: int = 5,
    scale: int = 10**6,
    cluster_cap: int | None = _SEMDEDUP_CLUSTER_CAP,
) -> pd.DataFrame:
    """vec_id, cluster_id, keep_id — SemDeDup's keep rule over the
    within-cluster dup graph: connected components of the τ-cosine
    pairs, and from each component keep the member FARTHEST from the
    cluster centroid (the paper keeps the lowest
    centroid-similarity example — the most extreme point — because
    points near the centroid are the redundant ones; here "farthest"
    is the exact int64 quantized distance d2, ties → min vec_id).
    Rows cover every member of a multi-vector component, keepers
    included, mirroring :func:`doc_neardup_keep`'s output shape.

    Components are CLUSTER-LOCAL by construction (pairs never cross
    clusters), so the union-find runs inside the same
    ``map_groups`` — no driver state, no global label propagation."""
    asg = _semdedup_assign(sf_dir, k, n_iter, scale)

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        ids, ia, ib = _semdedup_cluster_pairs(
            g, scale, tau_num, tau_den, cap=cluster_cap
        )
        if not len(ia):
            return pd.DataFrame(
                {
                    "vec_id": np.array([], dtype=np.int64),
                    "cluster_id": np.array([], dtype=np.int64),
                    "keep_id": np.array([], dtype=np.int64),
                }
            )
        order = np.argsort(g["vec_id"].to_numpy())
        d2 = g["d2"].to_numpy()[order]  # aligned with sorted ids
        cid = np.int64(g["cluster_id"].iloc[0])
        # union-find over the cluster-sized index space
        parent = np.arange(len(ids))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ia, ib):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        roots = np.array([find(i) for i in range(len(ids))])
        touched = np.zeros(len(ids), dtype=bool)
        touched[ia] = True
        touched[ib] = True
        rows = []
        for r in np.unique(roots[touched]):
            members = np.flatnonzero(roots == r)
            # keep = max d2 (farthest from centroid), tie → min vec_id
            best = members[np.lexsort((ids[members], -d2[members]))[0]]
            for i in members:
                rows.append((ids[i], cid, ids[best]))
        return pd.DataFrame(
            rows, columns=["vec_id", "cluster_id", "keep_id"]
        ).astype(np.int64)

    return (
        asg.groupby("cluster_id")
        .map_groups(sweep, batch_format="pandas")
        .to_pandas()
    )


def winnow_pairs(
    sf_dir: str,
    min_shared: int = 2,
    max_df: int = 200,
) -> pd.DataFrame:
    """doc_a, doc_b, n_shared — the MOSS MATCH step over winnowed
    fingerprints (Schleimer et al. 2003 §4): document pairs sharing at
    least ``min_shared`` distinct selected fingerprint VALUES.  Because
    winnowing guarantees any common substring of length ≥ w+k−1 shares
    a selected fingerprint, n_shared lower-bounds the number of such
    local matches — the plagiarism/near-dup candidate signal that
    whole-doc hashing misses and full shingling pays quadratically for.

    Distributed shape = the n-gram-Jaccard inverted index: explode to
    per-doc DISTINCT fingerprint values, hash-partition by the uint64
    value (never text), per-partition self-merge at C speed, partial
    pair counts folded by a bucketed reduce.  Fingerprints selected by
    more than ``max_df`` docs are pruned before pairing (boilerplate
    fingerprints; pruned identically in the SQL oracle, so the
    contract is exact)."""
    from .agg import bucketed_combine
    from .io import read_table  # noqa: F401  (re-export parity)
    from .text import winnow_fingerprints

    n_parts = 64
    sel = winnow_fingerprints(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["doc_id", "fp"]].drop_duplicates()
        fp = d["fp"].to_numpy(np.int64).view(np.uint64)
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(np.int64),
                "fp": d["fp"].to_numpy(np.int64),
                "part": (fp % np.uint64(n_parts)).astype(np.int64),
            }
        )

    def part_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # the per-batch drop_duplicates in explode is only a partial
        # pre-reduction (a rebatch can split a doc's rows); the
        # partition sees every row of an fp, so THIS dedup is the
        # authoritative one — df counts below are per distinct doc
        df = df.drop_duplicates(subset=["doc_id", "fp"])
        vc = df["fp"].value_counts()
        keep = vc[(vc >= 2) & (vc <= max_df)].index
        d = df[df["fp"].isin(keep)][["doc_id", "fp"]]
        if d.empty:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in ("doc_a", "doc_b", "n")
                }
            )
        m = d.merge(d, on="fp")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .agg(n=("fp", "size"))
            .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            n_shared=("n", "sum")
        )
        return g[g["n_shared"] >= min_shared].astype("int64")

    co = (
        sel.map_batches(explode, batch_format="pandas")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    )
    return bucketed_combine(co, ["doc_a", "doc_b"], finish).to_pandas()
