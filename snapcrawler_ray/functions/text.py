"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline operators (language-ID, quality
scoring, token counting, fingerprinting) expressed as vectorized
``map_batches`` stages over ``ray.data.read_parquet`` with column
pruning.  Where an operator is ANSI-SQL-expressible its semantics are
defined to match a DuckDB oracle exactly (see __ray_entry__.oracle_sql):
token = maximal run of non-whitespace in the trimmed text; punct chars
= ``.,!?;:``; quality = 0.5·min(1, n_chars/1000) + 0.5·min(1,
n_tokens/200), rounded to 4 decimals.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,!?;:]")

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language-ID (public common-word lists).
_LANG_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "value", "table", "fast"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en"},
    "ru": {"и", "в", "не", "на", "что", "это"},
    "zh": set(),
}


def _docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    from .io import read_table

    return read_table(sf_dir, "documents", columns)


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, n_tokens, n_punct — whitespace tokens + punct chars."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.strip()
        n_tokens = t.str.split(_WS).map(len).where(t != "", 0)
        n_punct = df["text"].fillna("").str.count(_PUNCT)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": n_tokens.astype("int64"),
                "n_punct": n_punct.astype("int64"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def quality_scores(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, quality — deterministic length/token quality score."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.strip()
        n_tokens = t.str.split(_WS).map(len).where(t != "", 0).astype("float64")
        n_chars = df["n_chars"].astype("float64")
        q = 0.5 * np.minimum(1.0, n_chars / 1000.0) + 0.5 * np.minimum(
            1.0, n_tokens / 200.0
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "quality": q.round(4)})

    return _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        f, batch_format="pandas"
    )


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, lang_pred — stopword-profile heuristic language ID.

    Scores each language by stopword-hit fraction; ties and no-hits
    fall back to 'en'.  Deterministic pure function of the text (not
    SQL-expressible → rows-only driver check)."""

    profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def f(df: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in df["text"].fillna(""):
            words = set(_WS.split(text.strip().lower())) if text.strip() else set()
            best, best_score = "en", 0.0
            for lang in sorted(profiles):
                prof = profiles[lang]
                if not prof:
                    continue
                score = len(words & prof) / len(prof)
                if score > best_score:
                    best, best_score = lang, score
            preds.append(best)
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": preds})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    """doc_id, fingerprint — 64-bit rolling polynomial hash over tokens
    (document fingerprint; rows-only check)."""
    B = np.uint64(1099511628211)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.zeros(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"].fillna("")):
            h = np.uint64(14695981039346656037)
            with np.errstate(over="ignore"):
                for tok in _WS.split(text.strip()):
                    th = np.uint64(abs(hash(tok)) if False else _fnv(tok))
                    h = h * B + th
            fps[i] = h
        return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": fps})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(f, batch_format="pandas")


def _fnv(s: str) -> np.uint64:
    h = 14695981039346656037
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return np.uint64(h)


def lang_filter(sf_dir: str, lang: str = "en") -> "ray.data.Dataset":
    """doc_id, lang, source, n_chars for one language (predicate
    pushdown-friendly projection + filter)."""
    import pyarrow.compute as pc
    import pyarrow as pa

    from .io import read_table

    ds = read_table(
        sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]
    )
    return ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("lang"), lang)),
        batch_format="pyarrow",
    )


def source_stats(sf_dir: str) -> pd.DataFrame:
    """Per-source doc count / char stats via partial aggregation inside
    map_batches + a tiny final groupby (pre-aggregate pattern —
    SURVEY.md 'Minimize shuffles')."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_docs=("doc_id", "count"), total_chars=("n_chars", "sum")
        )
        return g

    ds = _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    out = (
        ds.to_pandas()
        .groupby("source", as_index=False)
        .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["total_chars"] = out["total_chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)
