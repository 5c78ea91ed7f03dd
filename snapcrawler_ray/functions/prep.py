"""The flagship end-to-end training-corpus prep pipeline.

``training_corpus`` composes the suite's operators the way a real
pretraining-data run would — language filter → quality floor →
benchmark decontamination → exact dedup → near-dup drop → context-
window packing — as ONE Ray pipeline with the scale-correct shape:

  · one streaming corpus pass computes every per-doc predicate
    (lang, quality, contamination probe against the broadcast
    benchmark shingle-hash set) and the md5/token metadata;
  · one md5-bucketed reduce picks the exact-dedup winner per content
    hash (min doc_id among survivors);
  · the near-dup drop set (component non-minima from the MinHash-LSH
    pair graph — dedup-rate-sized, the standard driver artifact)
    broadcasts and filters;
  · one source-bucketed reduce assigns token-budget window ids.

Two shuffles, two broadcasts, no O(corpus) driver state.  Fully
SQL-expressible → the whole chain is oracled end-to-end in
__ray_entry__ (one WITH RECURSIVE chain reusing the per-operator
oracle fragments).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray

from .agg import bucketed_combine
from .dedup import _shingle_hashes, doc_neardup_keep
from .io import read_table
from .text import _WS


def training_corpus(
    sf_dir: str,
    lang: str = "en",
    min_quality: float = 0.3,
    budget: int = 512,
    bench_mod: int = 97,
    k_shingle: int = 8,
) -> pd.DataFrame:
    """source, doc_id, n_tokens, window_id for every surviving doc."""
    # --- broadcast artifact 1: benchmark shingle-hash set (pruned read
    # of just the benchmark rows; O(|benchmark|) driver work)
    def bench_shingles(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % bench_mod == 0]
        hs = [
            _shingle_hashes(t or "", k_shingle)
            for t in d["text"].fillna("")
        ] or [np.empty(0, np.uint64)]
        return pd.DataFrame({"h": np.unique(np.concatenate(hs))})

    bench = np.unique(
        read_table(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(bench_shingles, batch_format="pandas")
        .to_pandas()["h"]
        .to_numpy(np.uint64)
    )
    bench_ref = ray.put(bench)

    # --- broadcast artifact 2: near-dup drop set (component non-minima)
    ndk = doc_neardup_keep(sf_dir)
    drop_nd = np.sort(
        ndk.loc[ndk["doc_id"] != ndk["keep_id"], "doc_id"].to_numpy(np.int64)
    )
    drop_ref = ray.put(drop_nd)

    # --- pass 1: all per-doc predicates + metadata in one scan
    class Flags:
        def __init__(self, bench_ref, drop_ref):
            self.bench = ray.get(bench_ref)
            self.drop = ray.get(drop_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["doc_id"] % bench_mod != 0) & (df["lang"] == lang)]
            if df.empty:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "source": pd.Series([], dtype=object),
                        "m": pd.Series([], dtype=object),
                        "n_tokens": pd.Series([], dtype="int64"),
                    }
                )
            t = df["text"].fillna("").str.strip()
            n_tok = (t.str.count(_WS) + 1).where(t != "", 0)
            from .text import round4_half_away

            q = round4_half_away(
                0.5 * np.minimum(1.0, df["n_chars"].astype("float64") / 1000.0)
                + 0.5 * np.minimum(1.0, n_tok.astype("float64") / 200.0)
            )
            keep = np.asarray(q >= min_quality)
            # decontamination probe: batched distinct-shingle membership
            # over just the still-kept docs (one lexsort + searchsorted
            # for the batch — dedup._batch_distinct_hits)
            if len(self.bench):
                from .dedup import _batch_distinct_hits

                probe = np.flatnonzero(keep)
                if len(probe):
                    texts = df["text"].fillna("").to_numpy()
                    hits = _batch_distinct_hits(
                        texts[probe], self.bench, k_shingle
                    )
                    keep[probe[hits > 0]] = False
            # near-dup drop set
            ids = df["doc_id"].to_numpy(np.int64)
            if len(self.drop):
                pos = np.searchsorted(self.drop, ids)
                pos[pos >= len(self.drop)] = 0
                keep &= ~(self.drop[pos] == ids)
            d = df[keep]
            tt = d["text"].fillna("")
            return pd.DataFrame(
                {
                    "doc_id": d["doc_id"].to_numpy(np.int64),
                    "source": d["source"].to_numpy(),
                    "m": [
                        hashlib.md5(x.encode("utf-8")).hexdigest() for x in tt
                    ],
                    "n_tokens": n_tok[keep].to_numpy(np.int64),
                }
            )

    ds = read_table(
        sf_dir, "documents", ["doc_id", "source", "text", "lang", "n_chars"]
    ).map_batches(
        Flags,
        batch_format="pandas",
        concurrency=(1, 8),
        fn_constructor_kwargs={"bench_ref": bench_ref, "drop_ref": drop_ref},
    )

    # --- md5-bucketed exact-dedup winner (min doc_id per content hash)
    def md5_winner(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["m", "doc_id"], kind="mergesort")
        return d.groupby("m", as_index=False).head(1)

    winners = bucketed_combine(ds, ["m"], md5_winner)

    # --- source-bucketed window packing (exclusive running tokens // B)
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["source", "doc_id"], kind="mergesort")
        n = d["n_tokens"].to_numpy(np.int64)
        cum = np.cumsum(n)
        src = d["source"].to_numpy()
        first = np.concatenate([[True], src[1:] != src[:-1]])
        base = np.maximum.accumulate(np.where(first, cum - n, 0))
        cb = cum - n - base
        return d.assign(window_id=(cb // budget).astype("int64"))[
            ["source", "doc_id", "n_tokens", "window_id"]
        ]

    out = bucketed_combine(winners, ["source"], pack).to_pandas()
    return (
        out.sort_values(["source", "doc_id"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "n_tokens": "int64", "window_id": "int64"})
    )


def web_training_corpus(
    visits, corpus_dir: str, lang: str = "en", quality_floor: float = 0.05
) -> "ray.data.Dataset":
    """url, seq, n_tokens, quality — training-corpus prep over the
    CRAWL'S OWN OUTPUT: the bridge between the two halves of the engine
    (frontier crawl × webtext prep).  Successfully-fetched pages
    (status 'ok') join back to the corpus text, pass the language and
    quality gates, and exact-dedup by content md5 with FIRST-CRAWLED
    wins (min visit seq — the crawl arrival order, exactly the
    reference's page-level first-wins semantics lifted to corpus prep).

    Scale shape: the visit table and the corpus meet in one
    ``Dataset.join`` hash join on url (both sides O(corpus), neither
    broadcast); per-batch kernels compute tokens/quality; one
    md5-bucketed reduce picks winners.  Output stays a streaming
    Dataset.

    ``visits`` is the engine's visits Arrow table; ``corpus_dir`` the
    bucketed corpus parquet dir.
    """
    import pyarrow.compute as pc

    from .text import round4_half_away

    ok = visits.filter(
        pc.equal(visits.column("status"), "ok")
    ).select(["seq", "url"])
    n_blocks = max(1, min(16, ok.num_rows // 2000 + 1))
    v_ds = ray.data.from_arrow(ok).repartition(n_blocks)
    c_ds = ray.data.read_parquet(corpus_dir, columns=["url", "text", "lang"])
    from .io import dir_rows, join_partitions

    joined = v_ds.join(
        c_ds,
        join_type="inner",
        num_partitions=join_partitions(ok.num_rows, dir_rows(corpus_dir)),
        on=("url",),
        right_on=("url",),
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["lang"] == lang]
        if not len(df):
            return pd.DataFrame(
                {
                    "url": pd.Series([], dtype=object),
                    "seq": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "quality": pd.Series([], dtype="float64"),
                    "m": pd.Series([], dtype=object),
                }
            )
        t = df["text"].fillna("").str.strip()
        n_tokens = (t.str.count(_WS) + 1).where(t != "", 0).astype("int64")
        n_chars = df["text"].fillna("").str.len().astype("float64")
        q = round4_half_away(
            0.5 * np.minimum(1.0, n_chars / 1000.0)
            + 0.5 * np.minimum(1.0, n_tokens.astype("float64") / 200.0)
        )
        out = pd.DataFrame(
            {
                "url": df["url"],
                "seq": df["seq"].astype("int64"),
                "n_tokens": n_tokens,
                "quality": q,
                "m": [
                    hashlib.md5(x.encode("utf-8")).hexdigest()
                    for x in df["text"].fillna("")
                ],
            }
        )
        return out[out["quality"] >= quality_floor]

    scored = joined.map_batches(score, batch_format="pandas")

    def first_crawled(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("seq", kind="mergesort")
        return df.drop_duplicates("m", keep="first")

    return bucketed_combine(scored, ["m"], first_crawled).map_batches(
        lambda df: df[["url", "seq", "n_tokens", "quality"]],
        batch_format="pandas",
    )
