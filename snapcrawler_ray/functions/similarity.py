"""Similarity search over the ``embeddings`` table.

- ``knn_bruteforce``: exact cosine top-k — query matrix broadcast once
  with ``ray.put``, per-batch float64 matmul inside ``map_batches``,
  per-batch local top-k, tiny driver-side merge.  The baseline.
- ``knn_lsh``: hyperplane-bucketed approximate variant (the scale
  path): only buckets within ``probe_bits`` Hamming distance of the
  query's bucket are scanned.
- ``knn_ivf``: inverted-file variant — seeded k-means centroids
  trained on a deterministic sample, vectors assigned to their nearest
  cell inside ``map_batches``, queries probe only the ``nprobe``
  closest cells.  At cluster scale the assignment also serves as the
  partition key (cells co-located → probes touch few blocks).

Ties break by ascending vec_id so results are deterministic and match
the DuckDB oracle's ``ORDER BY sim DESC, vec_id`` exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    mask = pc.less(t.column("vec_id"), n_queries)
    t = t.filter(mask)
    qids = t.column("vec_id").to_numpy()
    qm = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    qm = qm / np.clip(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12, None)
    order = np.argsort(qids)
    return qids[order], qm[order]


class TopKStage:
    """Per-batch cosine vs the broadcast query matrix → local top-k.
    With ``quantize=True`` both sides round to ±127 int8 after unit
    normalization and similarity is the exact int32 integer dot."""

    def __init__(self, q_ref, k: int, quantize: bool = False):
        self.qids, self.qm = ray.get(q_ref)
        self.k = k
        self.quantize = quantize

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
        if self.quantize:
            m = np.clip(np.rint(m * 127.0), -127, 127).astype(np.int32)
        sims = self.qm @ m.T  # (n_q, batch)
        ids = df["vec_id"].to_numpy()
        out = []
        k = min(self.k, sims.shape[1])
        for qi, qid in enumerate(self.qids):
            row = sims[qi]
            # partial top-k with (sim desc, vec_id asc) tie-break —
            # lexsort on vec_id, not batch position, so the local top-k
            # is invariant to batch row order even on tied similarities
            # (integer dots tie often on the quantized path)
            idx = np.lexsort((ids, -row))[:k]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": qid,
                        "vec_id": ids[idx],
                        "sim": row[idx],
                    }
                )
            )
        return pd.concat(out, ignore_index=True)


def _merge_topk(partial: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver merge of per-batch top-k partials — tiny
    (n_queries × k × n_batches rows): (sim desc, vec_id asc) per query,
    1-based rank."""
    partial = partial.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    top = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"}
    )


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """query_id, rank (1-based), vec_id — exact cosine top-k."""
    q_ref = ray.put(_load_queries(sf_dir, n_queries))
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)
    partial = ds.map_batches(
        TopKStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"q_ref": q_ref, "k": k},
    ).to_pandas()
    return _merge_topk(partial, k)


def knn_int8(sf_dir: str, k: int = 10, n_queries: int = 5) -> pd.DataFrame:
    """query_id, rank, vec_id — top-k by INT8-QUANTIZED dot product:
    both sides unit-normalize then round to ±127 (symmetric per-value
    quantization — no data-dependent scale pass, since unit vectors are
    already in [−1,1]), and similarity is the exact int32 integer dot.
    The 4×-smaller vector bytes and integer matmul are the standard
    memory-bandwidth play for billion-vector scans; the recall cost vs
    the float path is machine-checked by ``emb_knn_int8_recall`` (same
    contract shape as the LSH/IVF recall rows).  Deterministic: ties
    break (dot desc, vec_id asc)."""
    qids, qm = _load_queries(sf_dir, n_queries)
    q8 = np.clip(np.rint(qm * 127.0), -127, 127).astype(np.int32)
    q_ref = ray.put((qids, q8))
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)
    partial = ds.map_batches(
        TopKStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"q_ref": q_ref, "k": k, "quantize": True},
    ).to_pandas()
    return _merge_topk(partial, k)


def knn_lsh(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_planes: int = 8,
    probe_hamming: int = 4,
    seed: int = 42,
) -> pd.DataFrame:
    """Approximate top-k: scan only rows whose hyperplane bucket is
    within ``probe_hamming`` bits of the query bucket."""
    qids, qm = _load_queries(sf_dir, n_queries)
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(dim, n_planes))
    qbits = (qm @ planes) > 0
    shifts = np.arange(n_planes)
    qbuckets = (qbits.astype(np.int64) << shifts).sum(axis=1)
    ctx = ray.put((qids, qm, planes, qbuckets))

    class ProbeStage:
        def __init__(self, ref, k, probe):
            self.qids, self.qm, self.planes, self.qbuckets = ray.get(ref)
            self.k = k
            self.probe = probe

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mn = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
            bits = (mn @ self.planes) > 0
            buckets = (bits.astype(np.int64) << np.arange(bits.shape[1])).sum(axis=1)
            ids = df["vec_id"].to_numpy()
            out = []
            for qi, qid in enumerate(self.qids):
                ham = np.bit_count(  # numpy>=2; fallback below
                    np.bitwise_xor(buckets, self.qbuckets[qi])
                ) if hasattr(np, "bit_count") else np.array([
                    bin(x).count("1")
                    for x in np.bitwise_xor(buckets, self.qbuckets[qi])
                ])
                cand = ham <= self.probe
                if not cand.any():
                    continue
                sims = mn[cand] @ self.qm[qi]
                cids = ids[cand]
                idx = np.argsort(-sims, kind="stable")[: self.k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": cids[idx], "sim": sims[idx]}
                    )
                )
            if not out:
                return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
            return pd.concat(out, ignore_index=True)

    partial = ds.map_batches(
        ProbeStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ctx, "k": k, "probe": probe_hamming},
    ).to_pandas()
    partial = partial.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    top = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"}
    )


def _train_centroids(sample: np.ndarray, n_cells: int, seed: int,
                     iters: int = 8) -> np.ndarray:
    """Seeded Lloyd k-means on unit vectors (spherical k-means: centers
    re-normalized each step so dot = cosine)."""
    rng = np.random.RandomState(seed)
    n_cells = min(n_cells, len(sample))
    centers = sample[rng.choice(len(sample), n_cells, replace=False)].copy()
    for _ in range(iters):
        assign = (sample @ centers.T).argmax(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                centers[c] = v / max(np.linalg.norm(v), 1e-12)
    return centers


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    sample_stride: int = 7,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF approximate top-k: train ``n_cells`` spherical-k-means
    centroids on a strided sample (model-sized, broadcast via
    ``ray.put``), then scan only rows whose cell is among each query's
    ``nprobe`` closest cells."""
    qids, qm = _load_queries(sf_dir, n_queries)
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)

    # deterministic training sample: every sample_stride-th vec_id.
    # The sample is model-sized (a few thousand rows) — training data,
    # not the corpus, so a driver-side fit is the right topology.
    import pyarrow as pa

    sample_df = ds.map_batches(
        lambda b: b.filter(
            pa.array(
                b.column("vec_id").to_numpy(zero_copy_only=False)
                % sample_stride
                == 0
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    sm = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    sm = sm / np.clip(np.linalg.norm(sm, axis=1, keepdims=True), 1e-12, None)
    centers = _train_centroids(sm, n_cells, seed)

    probed = np.argsort(-(qm @ centers.T), axis=1)[:, :nprobe]
    ctx = ray.put((qids, qm, centers, probed))

    class IvfScanStage:
        def __init__(self, ref, k):
            self.qids, self.qm, self.centers, self.probed = ray.get(ref)
            self.k = k

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mn = m / np.clip(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None
            )
            cells = (mn @ self.centers.T).argmax(axis=1)
            ids = df["vec_id"].to_numpy()
            out = []
            for qi, qid in enumerate(self.qids):
                cand = np.isin(cells, self.probed[qi])
                if not cand.any():
                    continue
                sims = mn[cand] @ self.qm[qi]
                cids = ids[cand]
                idx = np.argsort(-sims, kind="stable")[: self.k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": cids[idx], "sim": sims[idx]}
                    )
                )
            if not out:
                return pd.DataFrame({"query_id": [], "vec_id": [], "sim": []})
            return pd.concat(out, ignore_index=True)

    partial = ds.map_batches(
        IvfScanStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ctx, "k": k},
    ).to_pandas()
    partial = partial.sort_values(
        ["query_id", "sim", "vec_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    top = partial.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "vec_id"]].astype(
        {"query_id": "int64", "rank": "int64", "vec_id": "int64"}
    )


def _train_pq_codebooks(
    sample: np.ndarray, n_sub: int, n_codes: int, seed: int,
    iters: int = 8,
) -> np.ndarray:
    """(n_sub, n_codes, sub_dim) product-quantization codebooks: plain
    seeded Lloyd k-means per subspace on the training sample (Jégou,
    Douze & Schmid 2011, "Product Quantization for Nearest Neighbor
    Search").  Empty cells keep their previous centroid (deterministic,
    like _train_centroids)."""
    n, dim = sample.shape
    sub_dim = dim // n_sub
    rng = np.random.RandomState(seed)
    books = np.empty((n_sub, min(n_codes, n), sub_dim), dtype=np.float64)
    for s in range(n_sub):
        x = sample[:, s * sub_dim:(s + 1) * sub_dim]
        c = x[rng.choice(n, books.shape[1], replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(c)):
                m = assign == j
                if m.any():
                    c[j] = x[m].mean(axis=0)
        books[s] = c
    return books


def knn_pq(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_sub: int = 8,
    n_codes: int = 32,
    sample_stride: int = 7,
    seed: int = 43,
    refine_r: int = 200,
) -> pd.DataFrame:
    """query_id, rank, vec_id — product-quantization top-k (Jégou et
    al. 2011): unit vectors split into ``n_sub`` subspaces, each
    encoded to its nearest codebook entry (here 64 float dims → 8
    uint8 codes = 32× smaller than float32), queries score by
    ASYMMETRIC DISTANCE: one (n_sub × n_codes) lookup table of
    query-subvector · codeword dots per query, sim ≈ Σ_s LUT[s,
    code_s], then the standard exact RE-RANK of the per-batch ADC
    shortlist (top ``refine_r`` candidates — IVFADC+R, the paper's
    §V refinement).  This is the billion-vector memory-bandwidth play
    one step beyond int8: the scan touches only code bytes + a LUT
    that lives in cache, and float rows are read for just R candidates
    per query per batch.  At cluster scale the encode is a separate
    write-once pass (codes stored as a fixed-width binary column);
    at query scale here the encode runs fused in the same batch scan.
    Codebooks are model-sized (n_sub × n_codes × sub_dim floats) and
    broadcast once via ``ray.put``.  Recall vs the exact path is
    machine-checked by ``emb_knn_pq_recall`` (same contract shape as
    LSH/IVF/int8).  Deterministic for a FIXED block/batch layout:
    seeded sample + k-means, and ties break (sim desc, vec_id asc) via
    lexsort — but the per-batch ADC shortlist (top refine_r per batch)
    makes shortlist membership, and hence the top-k, depend on how Ray
    partitions the scan; only the recall contract, not the exact row
    set, is invariant across layouts (a partition-invariant variant
    would need a global ADC top-R fold before the exact re-rank)."""
    qids, qm = _load_queries(sf_dir, n_queries)
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)

    # deterministic model-sized training sample (same topology as IVF)
    import pyarrow as pa

    sample_df = ds.map_batches(
        lambda b: b.filter(
            pa.array(
                b.column("vec_id").to_numpy(zero_copy_only=False)
                % sample_stride
                == 0
            )
        ),
        batch_format="pyarrow",
    ).to_pandas()
    sm = np.stack(sample_df["embedding"].to_numpy()).astype(np.float64)
    sm = sm / np.clip(np.linalg.norm(sm, axis=1, keepdims=True), 1e-12, None)
    books = _train_pq_codebooks(sm, n_sub, n_codes, seed)
    sub_dim = qm.shape[1] // n_sub
    # per-query ADC lookup tables: LUT[q, s, j] = q_sub(s) · codeword_j
    lut = np.einsum(
        "qsd,sjd->qsj",
        qm.reshape(len(qm), n_sub, sub_dim),
        books,
    )
    ctx = ray.put((qids, qm, books, lut))

    class PqScanStage:
        def __init__(self, ref, k, refine):
            self.qids, self.qm, self.books, self.lut = ray.get(ref)
            self.k = k
            self.refine = refine

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            mn = m / np.clip(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None
            )
            n_sub, _, sub_dim = self.books.shape
            xs = mn.reshape(len(mn), n_sub, sub_dim)
            # encode: nearest codeword per subspace by L2 (‖x−c‖² =
            # ‖x‖² − 2x·c + ‖c‖²; argmin over c drops the x term)
            norms = (self.books ** 2).sum(axis=2)  # (n_sub, n_codes)
            dots = np.einsum("nsd,sjd->nsj", xs, self.books)
            codes = (norms[None, :, :] - 2.0 * dots).argmin(axis=2)
            # ADC shortlist + exact re-rank of the top `refine` rows
            ids = df["vec_id"].to_numpy()
            out = []
            srange = np.arange(n_sub)
            for qi, qid in enumerate(self.qids):
                adc = self.lut[qi][srange[None, :], codes].sum(axis=1)
                short = np.lexsort((ids, -adc))[: self.refine]
                sims = mn[short] @ self.qm[qi]
                sids = ids[short]
                idx = np.lexsort((sids, -sims))[: self.k]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, "vec_id": sids[idx],
                         "sim": sims[idx]}
                    )
                )
            return pd.concat(out, ignore_index=True)

    partial = ds.map_batches(
        PqScanStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ctx, "k": k, "refine": refine_r},
    ).to_pandas()
    return _merge_topk(partial, k)


def knn_recall_check(
    sf_dir: str,
    variant: str = "lsh",
    k: int = 10,
    n_queries: int = 5,
    bound: float = 0.5,
) -> pd.DataFrame:
    """query_id, recall_ok — the machine-checked recall floor for the
    approximate kNN paths, in a SQL-oracle-able shape: the engine runs
    BOTH the exact broadcast-matmul top-k and the approximate variant,
    computes per-query recall = |approx ∩ exact| / k, and emits whether
    it meets ``bound``; the DuckDB oracle states the contract
    (``recall_ok = true`` per query), so a recall collapse becomes a
    driver-red value mismatch instead of an untested claim.  Both paths
    are deterministic (fixed seeds), so the bound is stable, not flaky."""
    exact = knn_bruteforce(sf_dir, k=k, n_queries=n_queries)
    fn = {"lsh": knn_lsh, "ivf": knn_ivf, "int8": knn_int8,
          "pq": knn_pq}[variant]
    approx = fn(sf_dir, k=k, n_queries=n_queries)
    rows = []
    for qid, e in exact.groupby("query_id", sort=True):
        es = set(e["vec_id"])
        a = set(approx.loc[approx["query_id"] == qid, "vec_id"])
        rows.append((int(qid), len(es & a) / max(1, len(es)) >= bound))
    return pd.DataFrame(rows, columns=["query_id", "recall_ok"]).astype(
        {"query_id": "int64", "recall_ok": "bool"}
    )


def cluster_counts(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """cluster_id, n_vecs — nearest-centroid assignment counts.

    K-means-style cluster assignment over the embedding column with a
    deterministic seed set: the centroids are the embeddings of the
    ``k`` smallest vec_ids (so the DuckDB oracle can name the exact
    same centroids in SQL).  Centroids are loaded once on the driver
    (k rows — tiny by construction), broadcast via ``ray.put``, and
    every batch does one float64 matmul + argmax; per-batch partial
    counts are combined in a k-row driver merge.  No shuffle: the only
    cross-batch traffic is k integers per batch.  Ties break toward
    the smaller cluster_id (np.argmax first-hit == the oracle's
    ``ORDER BY sim DESC, cluster_id``).  At 100-TB scale the
    assignment column doubles as a partition key for cluster-local
    downstream stages (same layout idea as knn_ivf's cells)."""
    cids, cm = _load_queries(sf_dir, k)  # same loader: vec_id < k
    ref = ray.put((cids, cm))
    from .io import read_table

    ds = read_table(sf_dir, "embeddings", ["vec_id", "embedding"],
                    blocks=16)

    class AssignStage:
        def __init__(self, ref):
            self.cids, self.cm = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.clip(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None
            )
            sims = m @ self.cm.T  # (batch, k)
            assign = self.cids[np.argmax(sims, axis=1)]
            u, c = np.unique(assign, return_counts=True)
            return pd.DataFrame({"cluster_id": u, "n_vecs": c})

    partial = ds.map_batches(
        AssignStage,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ref},
    ).to_pandas()
    out = (
        partial.groupby("cluster_id", as_index=False)["n_vecs"]
        .sum()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    return out.astype({"cluster_id": "int64", "n_vecs": "int64"})


def cluster_quality(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """cluster_id, n_docs, sum_quality — embedding clusters joined to
    document quality (vec_id == doc_id), the input for cluster-balanced
    corpus sampling.

    Cross-table shape: nearest-centroid assignment streams over
    ``embeddings`` (broadcast centroids, per-batch argmax — same kernel
    as :func:`cluster_counts`), the quality score streams over
    ``documents``, and the two O(corpus) sides meet in one
    ``Dataset.join`` hash join keyed on the id (neither side is
    broadcastable at 100 TB).  Quality is carried as integer
    ten-thousandths so the per-cluster sum is order-independent and
    exact vs the DuckDB oracle; the final table is O(k) rows."""
    cids, cm = _load_queries(sf_dir, k)
    ref = ray.put((cids, cm))
    from .io import read_table

    class Assign:
        def __init__(self, ref):
            self.cids, self.cm = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.clip(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None
            )
            assign = self.cids[np.argmax(m @ self.cm.T, axis=1)]
            return pd.DataFrame(
                {"vec_id": df["vec_id"].to_numpy(), "cluster_id": assign}
            )

    assign = read_table(
        sf_dir, "embeddings", ["vec_id", "embedding"], blocks=16
    ).map_batches(
        Assign,
        batch_format="pandas",
        batch_size=2048,
        concurrency=(1, 4),
        fn_constructor_kwargs={"ref": ref},
    )

    import re as _re

    ws = _re.compile(r"\s+")

    def qual(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("").str.strip()
        # count+1 == len(split) on stripped text (see text._WS note)
        n_tokens = (t.str.count(ws) + 1).where(t != "", 0).astype("float64")
        q = 0.5 * np.minimum(1.0, df["n_chars"].astype("float64") / 1000.0) \
            + 0.5 * np.minimum(1.0, n_tokens / 200.0)
        # integer ten-thousandths (half-away round, like the SQL round())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "q_u": np.floor(q * 10000.0 + 0.5).astype("int64"),
            }
        )

    docs = read_table(
        sf_dir, "documents", ["doc_id", "text", "n_chars"]
    ).map_batches(qual, batch_format="pandas")

    from .io import join_partitions, table_rows

    joined = assign.join(
        docs,
        join_type="inner",
        num_partitions=join_partitions(table_rows(sf_dir, "documents")),
        on=("vec_id",),
        right_on=("doc_id",),
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cluster_id", as_index=False).agg(
            n_docs=("vec_id", "size"), q_u=("q_u", "sum")
        )

    out = (
        joined.map_batches(agg, batch_format="pandas")
        .to_pandas()
        .groupby("cluster_id", as_index=False)
        .sum()
    )
    out["sum_quality"] = out["q_u"] / 10000.0
    out = out.sort_values("cluster_id").reset_index(drop=True)
    return out[["cluster_id", "n_docs", "sum_quality"]].astype(
        {"cluster_id": "int64", "n_docs": "int64"}
    )


def kmeans(
    sf_dir: str, k: int = 8, n_iter: int = 5
) -> pd.DataFrame:
    """cluster_id, n_vecs, inertia — distributed Lloyd's k-means over
    the embedding column (the iterative-algorithm shape: per-iteration
    broadcast + partial-sum reduce, driver state is only k × dim).

    Each iteration: broadcast current centroids (``ray.put``), one
    streaming pass computes per-batch PARTIAL per-cluster vector sums /
    counts / squared-error (k×dim floats per batch — never the
    assignments), driver folds them and updates centroids.  Seeds are
    the embeddings of the k smallest vec_ids (deterministic, same
    convention as :func:`cluster_counts`); ties break toward the
    smaller cluster index.  Empty clusters keep their previous
    centroid.  Returns the final assignment counts and total inertia
    (sum of squared distances), which tests assert decreases
    monotonically over iterations."""
    from .io import read_table

    _, cm = _load_queries(sf_dir, k)
    cent = cm.copy()  # (k, dim), L2-normalized seeds

    ds = read_table(
        sf_dir, "embeddings", ["embedding"], blocks=16
    ).materialize()  # one read, reused every iteration

    inertia_hist: list[float] = []
    counts = np.zeros(k, dtype=np.int64)
    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c = ray.get(_ref)
            m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            m = m / np.clip(
                np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None
            )
            d2 = (
                (m * m).sum(1, keepdims=True)
                - 2.0 * (m @ c.T)
                + (c * c).sum(1)[None, :]
            )
            a = np.argmin(d2, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            err = float(d2[np.arange(len(a)), a].sum())
            out = pd.DataFrame(
                {
                    "cluster": np.arange(c.shape[0], dtype=np.int64),
                    "cnt": cnt,
                    "err": err / c.shape[0],  # spread so sum() is exact total
                }
            )
            out["sums"] = list(sums)
            return out

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        counts = (
            parts.groupby("cluster")["cnt"].sum().to_numpy(np.int64)
        )
        inertia_hist.append(float(parts["err"].sum()))
        sums = np.zeros_like(cent)
        for cid, g in parts.groupby("cluster"):
            sums[cid] = np.stack(g["sums"].to_numpy()).sum(0)
        nz = counts > 0
        cent[nz] = sums[nz] / counts[nz, None]

    out = pd.DataFrame(
        {
            "cluster_id": np.arange(k, dtype=np.int64),
            "n_vecs": counts,
            "inertia": inertia_hist[-1],
        }
    )
    out.attrs["inertia_history"] = inertia_hist
    return out


def _round_half_away_int(y: np.ndarray) -> np.ndarray:
    """Nearest int64, ties away from zero — exactly C++ ``std::round``
    (= DuckDB ``round(DOUBLE)``) on every double, including the
    ``floor(y + 0.5)`` trap near .5 boundaries (adding 0.5 can round up
    through the boundary in double arithmetic; comparing the exact
    fractional residual cannot)."""
    ay = np.abs(y)
    f = np.floor(ay)
    out = f + (ay - f >= 0.5)
    return (np.sign(y) * out).astype(np.int64)


def _kmeans_fixed_seeds(sf_dir: str, k: int, scale: int) -> np.ndarray:
    """(k, dim) int64 seed centroids: quantized embeddings of the k
    smallest vec_ids — shared by :func:`kmeans_fixed` and
    :func:`kmeans_fixed_centroids` (and the DuckDB ``cent0`` CTE)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    t = t.filter(pc.less(t.column("vec_id"), k))
    order = np.argsort(t.column("vec_id").to_numpy())
    seeds = np.stack(t.column("embedding").to_pylist()).astype(np.float64)[
        order
    ]
    return _round_half_away_int(seeds * scale)


def _kmeans_fixed_pass(
    ds, cent: np.ndarray, scale: int, with_inertia: bool
) -> tuple[np.ndarray, np.ndarray, int | None]:
    """ONE exact fixed-point Lloyd iteration (quantize, int64 argmin
    with ties → smaller index, partial sums, floor-division update) —
    the single place the update exists, so :func:`kmeans_fixed` and
    :func:`kmeans_fixed_centroids` cannot drift (they must stay
    bit-identical to each other and to the unrolled DuckDB CTE for the
    kmeans/SemDeDup oracles to hold).  Returns (cent updated in place,
    counts, exact inertia int or None).  Distributed shape: centroid
    broadcast via ``ray.put``, one streaming partials pass, O(k·dim)
    driver fold — assignments never leave the workers."""
    k = len(cent)
    ref = ray.put(cent)

    def partial(df: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        c = ray.get(_ref)  # (k, dim) int64
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q = _round_half_away_int(m * scale)  # (n, dim) int64
        # int64 distances: q·q − 2 q·c + c·c, all exact
        d2 = (
            (q * q).sum(1, keepdims=True)
            - 2 * (q @ c.T)
            + (c * c).sum(1)[None, :]
        )
        a = np.argmin(d2, axis=1)  # ties → smaller index
        sums = np.zeros_like(c)
        np.add.at(sums, a, q)
        cnt = np.bincount(a, minlength=k).astype(np.int64)
        out = pd.DataFrame(
            {"cluster": np.arange(k, dtype=np.int64), "cnt": cnt}
        )
        if with_inertia:
            # exact arbitrary-precision err: per-row d2 is bounded by
            # dim*(2*scale)^2 ≈ 2.56e14, so an int64 batch sum wraps
            # silently past ~36k rows; split into 32-bit halves (each
            # half's int64 sum has >1e9-row headroom) and recombine as
            # a Python int — matches the oracle's HUGEINT sum exactly
            best = d2[np.arange(len(a)), a]
            err = (int((best >> 32).sum()) << 32) + int(
                (best & 0xFFFFFFFF).sum()
            )
            # object dtype carries the exact Python int (the driver
            # fold below sums these without wrapping)
            out["err"] = [err if i == 0 else 0 for i in range(k)]
        out["sums"] = list(sums)
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    counts = parts.groupby("cluster")["cnt"].sum().to_numpy(np.int64)
    inertia = (
        int(sum(int(x) for x in parts["err"])) if with_inertia else None
    )
    sums = np.zeros_like(cent)
    for cid, g in parts.groupby("cluster"):
        sums[cid] = np.stack(g["sums"].to_numpy()).sum(0)
    nz = counts > 0
    cent[nz] = sums[nz] // counts[nz, None]  # floor div, exact
    return cent, counts, inertia


def kmeans_fixed_centroids(
    sf_dir: str, k: int = 8, n_updates: int = 2, scale: int = 10**6
) -> np.ndarray:
    """(k, dim) int64 centroids after ``n_updates`` exact fixed-point
    Lloyd updates — bit-identical to :func:`kmeans_fixed`'s ``cent``
    after the same number of iterations (the update IS the same code,
    :func:`_kmeans_fixed_pass`) and to the DuckDB oracle's ``cent{n}``
    CTE.  Split out so SemDeDup (functions/dedup.py) can assign against
    the same centroids the shared SQL replay derives."""
    from .io import read_table

    cent = _kmeans_fixed_seeds(sf_dir, k, scale)
    if n_updates <= 0:
        return cent
    ds = read_table(sf_dir, "embeddings", ["embedding"], blocks=16)
    if n_updates > 1:
        ds = ds.materialize()
    for _ in range(n_updates):
        cent, _, _ = _kmeans_fixed_pass(ds, cent, scale, with_inertia=False)
    return cent


def kmeans_fixed(
    sf_dir: str, k: int = 8, n_iter: int = 3, scale: int = 10**6
) -> pd.DataFrame:
    """cluster_id, n_vecs, inertia_q — Lloyd's k-means in EXACT int64
    fixed-point: embeddings quantized to micro-units (×10⁶, half-away
    rounding shared with DuckDB ``round``), so every iteration's
    assignment argmin, centroid floor-division update and inertia sum
    are integer arithmetic an unrolled DuckDB CTE reproduces
    bit-for-bit — the PageRank playbook (webops.host_pagerank) applied
    to the one remaining rows-only iterative algorithm.  The float
    :func:`kmeans` stays the production path (this is its oracle
    twin, like ``emb_near_dup_exact`` for the LSH pipeline).

    Distributed shape is identical to :func:`kmeans`: per-iteration
    centroid broadcast (``ray.put``), ONE streaming pass emitting int64
    partials (k×dim sums, counts, inertia — never assignments), O(k·dim)
    driver fold.  Seeds: quantized embeddings of the k smallest
    vec_ids.  Ties: smaller cluster index.  Empty clusters keep their
    centroid.  Update: floor division (exact in int64).  Inertia is in
    micro-units² (BIGINT) — order-free exact sums, no float drift.

    Overflow headroom: |q| ≤ scale (unit-ball inputs), per-dim diff² ≤
    4·10¹², ×64 dims ≤ 2.6·10¹⁴ per distance.  The inertia ACCUMULATION
    is exact at any corpus size (32-bit-split batch sums recombined as
    Python ints, object-dtype driver fold — int64 would wrap past ~36k
    rows/batch); only the final int64 EMIT bounds the corpus (~3.6·10⁴
    distances per 2⁶³), past which both the engine (numpy conversion)
    and the oracle (BIGINT cast) fail loudly rather than diverge."""
    from .io import read_table

    cent = _kmeans_fixed_seeds(sf_dir, k, scale)
    ds = read_table(sf_dir, "embeddings", ["embedding"], blocks=16).materialize()

    counts = np.zeros(k, dtype=np.int64)
    inertia = 0
    for _ in range(n_iter):
        cent, counts, inertia = _kmeans_fixed_pass(
            ds, cent, scale, with_inertia=True
        )

    return pd.DataFrame(
        {
            "cluster_id": np.arange(k, dtype=np.int64),
            "n_vecs": counts,
            "inertia_q": np.int64(inertia),
        }
    )
