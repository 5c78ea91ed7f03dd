"""Driver-contract rehearsal: run every ``queries()`` entry and compare
SQL-expressible ones against their DuckDB ``oracle_sql()`` the same way
the driver does (row count + schema-insensitive sorted-value compare).
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_all_query_names_have_callables(contract):
    qs, oracles = contract
    assert len(qs) >= 20
    assert set(oracles) <= set(qs)


@pytest.mark.parametrize(
    "name",
    [
        "docs_lang_filter", "docs_token_counts", "docs_quality",
        "docs_exact_dedup", "docs_dedup_per_source", "docs_source_stats",
        "docs_repetition", "docs_pii_scrub", "docs_chunks",
        "docs_clean_corpus", "docs_lang_id", "docs_minhash_pairs",
        "docs_ngram_jaccard", "emb_near_dup", "docs_fingerprints_norm",
        "emb_dedup_keep", "docs_sample", "docs_token_topk",
        "docs_token_topk_mg",
        "emb_knn", "q1_pricing", "q3_top_orders", "nation_revenue",
        "q6_forecast", "q14_promo",
        "q5_region_supplier", "events_hourly", "events_topk_users",
        "events_sessionize", "events_rolling", "events_asof",
        "events_hopping", "events_cumsum", "events_pivot_hourly",
        "cust_no_big_order", "orders_rollup", "events_funnel",
        "events_retention", "part_type_stats",
        "events_value_quantiles", "events_value_quantiles_hist",
        "events_daily_anomalies",
        "docs_top_quality", "docs_decontaminate", "emb_cluster_counts",
        "emb_cluster_quality", "docs_stratified_sample",
        "docs_adaptive_quality", "docs_vocab_overlap", "docs_tfidf_terms",
        "docs_neardup_keep", "docs_pack_windows", "docs_weighted_sample",
        "docs_training_corpus",
        "docs_simhash", "docs_boilerplate_ngrams",
        "docs_unigram_surprisal", "docs_fingerprints",
        "emb_near_dup_exact", "emb_dedup_keep_exact",
        "emb_knn_lsh_recall", "emb_knn_ivf_recall", "emb_knn_int8_recall",
        "emb_knn_pq_recall",
        "events_approx_users_check", "events_approx_hourly_check",
        "events_hll_registers", "events_range_join",
        "emb_kmeans_fixed", "events_cms_registers", "events_cms_topk",
        "docs_bpe_tokens", "events_watermark_late", "docs_repeated_ngrams",
        "docs_bottomk_sample", "docs_dup_spans", "docs_bigram_surprisal",
        "docs_dup_spans_cut", "docs_gopher_rules", "docs_simhash_pairs",
        "docs_simhash_keep", "docs_source_kl", "docs_chunks_overlap",
        "docs_bpe_merges", "docs_bpe_train",
        "docs_dsir_weights", "docs_dsir_sample", "docs_bm25_topk",
        "emb_semdedup_pairs", "emb_semdedup_keep",
        "docs_ppl_buckets", "docs_mix_sample", "docs_bpe_encode",
        "docs_winnow", "docs_winnow_pairs",
    ],
)
def test_sql_oracle_match(contract, con, name):
    qs, oracles = contract
    ray_df = _canon(_to_pandas(qs[name](SF_DIR)))
    sql_df = _canon(con.sql(oracles[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: row counts differ"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_web_training_corpus_oracle(contract, con):
    """The crawl×webtext bridge: Ray pipeline vs DuckDB over the
    engine-written visits parquet + corpus parquet (paths rewritten
    from the driver's sf0.01 to this test's sf0.001 bases)."""
    qs, oracles = contract
    ray_df = _canon(_to_pandas(qs["web_training_corpus"](SF_DIR)))
    sql = (
        oracles["web_training_corpus"]
        .replace("sf0.01", "sf0.001")
        .replace("_n2000_", "_n300_")
    )
    sql_df = _canon(con.sql(sql).df())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df) and len(ray_df) > 0
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_dim_join_partitioned_path_matches_broadcast(ray_session):
    """The _dim_join topology switch: forcing the partitioned
    ``Dataset.join`` path (max_broadcast_rows=0) must reproduce the
    broadcast-path result exactly for every query joining an sf-scaled
    dimension (customer/supplier grow with scale — SURVEY §2.5)."""
    from snapcrawler_ray.functions import relational

    for fn in (
        relational.q3_top_orders,
        relational.nation_revenue,
        relational.q5_region_supplier_revenue,
    ):
        bc = fn(SF_DIR)
        pj = fn(SF_DIR, max_broadcast_rows=0)
        pd.testing.assert_frame_equal(bc, pj, check_dtype=False)


def test_blocked_exact_neardup_matches_broadcast(ray_session):
    """The IVF-cell block-pair kernel (the 100-TB path, forced here
    with blocked_min_rows=1) reproduces the broadcast full-matrix sweep
    exactly — the triangle-inequality cell pruning is provably
    lossless, so pair set AND cosines must be identical."""
    from snapcrawler_ray.functions import dedup

    bc = dedup.embedding_near_dup_pairs_exact(SF_DIR, threshold=0.4)
    bl = dedup.embedding_near_dup_pairs_exact(
        SF_DIR, threshold=0.4, blocked_min_rows=1
    )
    assert len(bc) > 0  # non-vacuous at this threshold
    pd.testing.assert_frame_equal(bc, bl)
    # keep-list twin agrees too
    keep_bc = dedup.embedding_dedup_keep_exact(SF_DIR)
    keep_bl = dedup._unionfind_keep(bl, "vec_id")
    pd.testing.assert_frame_equal(keep_bc, keep_bl)


def test_blocked_exact_neardup_prunes_far_cells(ray_session):
    """Synthetic two-island geometry: many cells, high threshold — the
    triangle-inequality prune must skip most cross-cell sweeps while
    the result still equals the brute-force answer."""
    from snapcrawler_ray.functions import dedup

    rng = np.random.RandomState(11)
    # two tight orthogonal islands + per-vector jitter
    base = np.zeros((2, 32))
    base[0, 0] = 1.0
    base[1, 16] = 1.0
    n_half = 300
    m = np.concatenate(
        [
            base[0] + 0.01 * rng.randn(n_half, 32),
            base[1] + 0.01 * rng.randn(n_half, 32),
        ]
    )
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.arange(len(m), dtype=np.int64)
    t = 0.9
    got = dedup._blocked_exact_pairs(ids, m, t, n_cells=12)
    stats = dedup._blocked_exact_pairs.last_stats
    assert stats["pairs_swept"] < stats["pairs_total"], stats
    # brute force reference
    sims = m @ m.T
    ai, bj = np.nonzero(np.triu(sims >= t, k=1))
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs == set(zip(ids[ai], ids[bj]))
    assert len(got_pairs) > 0


def test_blocked_exact_neardup_salts_skewed_cells(ray_session):
    """Worst-case skew for the blocked kernel: one tight near-dup
    cluster swallows almost every cell, so without salting a single
    spill block (and a single sweep task) would hold nearly the whole
    matrix.  With block_rows forced low the kernel must (a) split the
    hot cell into multiple sub-blocks (blocks > cells) and (b) still
    reproduce the brute-force pair set exactly — the correctness proof
    that salting never loses a cross-sub-block pair."""
    from snapcrawler_ray.functions import dedup

    rng = np.random.RandomState(7)
    hot = np.zeros(32)
    hot[0] = 1.0
    m = np.concatenate(
        [
            hot + 0.005 * rng.randn(400, 32),  # one dominating cluster
            rng.randn(40, 32),  # background scatter
        ]
    )
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    ids = np.arange(len(m), dtype=np.int64)
    t = 0.95
    got = dedup._blocked_exact_pairs(ids, m, t, n_cells=6, block_rows=64)
    stats = dedup._blocked_exact_pairs.last_stats
    assert stats["blocks"] > stats["cells"], stats
    sims = m @ m.T
    ai, bj = np.nonzero(np.triu(sims >= t, k=1))
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs == set(zip(ids[ai], ids[bj]))
    assert len(got_pairs) > 1000  # the hot cluster really is all-pairs


def test_crawl_mode_and_verdict_sql_oracles(contract, con):
    """The r4 oracles: scale/priority visit projections vs the
    recursive-CTE replay, and the image verdict table vs the DuckDB
    re-derivation of the F7 dup decision over the engine-written
    pre-dedup parquet.  Driver path sf0.01 rewritten to sf0.001."""
    qs, oracles = contract
    for name in ["crawl_scale_visits", "crawl_priority_visits",
                 "crawl_image_verdicts", "crawl_host_pagerank",
                 "crawl_sitemap_frontier", "docs_api_harvest",
                 "crawl_nav_scores", "images_tags",
                 "docs_extended_images", "images_analysis",
                 "media_features"]:
        ray_df = _canon(_to_pandas(qs[name](SF_DIR)))  # writes the base
        sql = oracles[name].replace("sf0.01", "sf0.001")
        sql_df = _canon(con.sql(sql).df())
        assert list(ray_df.columns) == list(sql_df.columns), name
        pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_crawl_aggregate_sql_oracles(contract, con):
    """The crawl aggregates are SQL-oracled over the visits parquet the
    engine writes; the driver runs at sf0.01 — here we rewrite the
    oracle path to this test's sf0.001 base."""
    qs, oracles = contract
    for name in ["crawl_depth_histogram", "crawl_status_counts",
                 "crawl_host_visits"]:
        ray_df = _canon(_to_pandas(qs[name](SF_DIR)))  # writes the base
        sql = oracles[name].replace("sf0.01", "sf0.001")
        sql_df = _canon(con.sql(sql).df())
        assert list(ray_df.columns) == list(sql_df.columns), name
        pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


@pytest.mark.parametrize(
    "name",
    ["emb_knn_lsh",
     "emb_knn_ivf", "events_approx_users", "events_approx_hourly_users",
     "emb_kmeans", "crawl_robots_visits"],
)
def test_rows_only_queries_run(contract, name):
    qs, _ = contract
    df = _to_pandas(qs[name](SF_DIR))
    assert df is not None and len(df.columns) >= 2
    # deterministic across invocations (block order is not — sort first)
    df2 = _to_pandas(qs[name](SF_DIR))
    key = list(df.columns)
    a = df.sort_values(key, kind="mergesort").reset_index(drop=True)
    b = df2.sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_emb_knn_lsh_recall_vs_bruteforce(contract):
    qs, _ = contract
    exact = _to_pandas(qs["emb_knn"](SF_DIR))
    approx = _to_pandas(qs["emb_knn_lsh"](SF_DIR))
    recall_num = recall_den = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall_num += len(e & a)
        recall_den += len(e)
    # isotropic random embeddings are LSH's worst case (no cluster
    # structure); defaults are tuned to ~0.8 recall at ~2/3 scan fraction
    assert recall_num / recall_den >= 0.6, "LSH recall collapsed"


def test_ngram_jaccard_matches_bruteforce(contract):
    """Distributed inverted-index jaccard == brute-force all-pairs
    jaccard on the small table (exactness check for the pruning)."""
    from snapcrawler_ray.functions.dedup import _shingle_hashes

    qs, _ = contract
    got = _to_pandas(qs["docs_ngram_jaccard"](SF_DIR))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"])
    sh = {
        r.doc_id: set(_shingle_hashes(r.text or "", 3).tolist())
        for r in docs.itertuples()
    }
    ids = sorted(sh)
    want = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            jac = inter / len(sh[a] | sh[b])
            if jac >= 0.6:
                want.append((a, b, round(jac, 4)))
    want_df = pd.DataFrame(want, columns=["doc_a", "doc_b", "jaccard"])
    assert len(got) == len(want_df)
    if len(got):
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want_df, check_dtype=False,
            check_exact=False, rtol=0, atol=1e-4,
        )


def test_emb_knn_ivf_recall_vs_bruteforce(contract):
    qs, _ = contract
    exact = _to_pandas(qs["emb_knn"](SF_DIR))
    approx = _to_pandas(qs["emb_knn_ivf"](SF_DIR))
    recall_num = recall_den = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recall_num += len(e & a)
        recall_den += len(e)
    # isotropic embeddings (no cluster structure) are IVF's worst case;
    # nprobe=4 of 16 cells ≈ 1/4 scan fraction
    assert recall_num / recall_den >= 0.5, "IVF recall collapsed"


def test_emb_dedup_keep_components(ray_session, tmp_path):
    """Union-find over the near-dup graph: a planted chain a~b, b~c
    collapses to one keeper even when (a,c) is below threshold."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snapcrawler_ray.functions.dedup import embedding_dedup_keep

    rng = np.random.RandomState(11)
    base = rng.normal(size=(100, 64))
    a = base[3]
    b = a + 0.02 * rng.normal(size=64)
    c = b + 0.02 * rng.normal(size=64)
    planted = np.vstack([base, b, c, base[7]])  # 100=b,101=c,102=dup(7)
    t = pa.table({
        "vec_id": pa.array(np.arange(len(planted)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in planted],
                              pa.list_(pa.float64())),
    })
    d = tmp_path / "sf_keep"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    keep = embedding_dedup_keep(str(d), threshold=0.97)
    got = dict(zip(keep["vec_id"], keep["keep_id"]))
    assert got[100] == 3 and got[101] == 3 and got[3] == 3
    assert got[102] == 7 and got[7] == 7


def test_write_partitioned_resume_skips_finished(ray_session, tmp_path):
    """Resumable sink: a re-run rewrites only the missing partitions;
    finished partition files are untouched (mtime-stable) and the
    reread equals the original table."""
    import os
    import shutil
    import time

    import ray

    from snapcrawler_ray.functions.sink import (
        read_partitioned,
        write_partitioned,
    )

    src = pd.DataFrame(
        {"doc_id": np.arange(500, dtype=np.int64),
         "payload": [f"row-{i}" for i in range(500)]}
    )
    out = str(tmp_path / "sink")
    r1 = write_partitioned(
        ray.data.from_pandas(src).repartition(4), out, "doc_id", n_parts=8
    )
    assert sorted(r1["written"]) == list(range(8)) and r1["skipped"] == []
    victim = os.path.join(out, "_part=3")
    survivor = os.path.join(out, "_part=5")
    survivor_mtimes = {
        f: os.path.getmtime(os.path.join(survivor, f))
        for f in os.listdir(survivor)
    }
    shutil.rmtree(victim)
    time.sleep(0.05)
    r2 = write_partitioned(
        ray.data.from_pandas(src).repartition(4), out, "doc_id", n_parts=8
    )
    assert r2["written"] == [3]
    assert r2["skipped"] == [0, 1, 2, 4, 5, 6, 7]
    assert survivor_mtimes == {
        f: os.path.getmtime(os.path.join(survivor, f))
        for f in os.listdir(survivor)
    }
    back = (
        read_partitioned(out).to_pandas().sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[["doc_id", "payload"]], src)


def test_write_partitioned_config_change_invalidates(ray_session, tmp_path):
    """ADVICE-r3: a re-run into the same out dir with a DIFFERENT
    run_tag (config hash) must rewrite every partition — stale rows
    from the previous config never survive into the new output."""
    import ray

    from snapcrawler_ray.functions.sink import (
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    old = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64),
         "payload": ["old"] * 100}
    )
    r1 = write_partitioned(
        ray.data.from_pandas(old).repartition(2), out, "doc_id",
        n_parts=4, run_tag="cfg-A",
    )
    assert sorted(r1["written"]) == list(range(4))
    # same tag: everything skipped
    r_same = write_partitioned(
        ray.data.from_pandas(old).repartition(2), out, "doc_id",
        n_parts=4, run_tag="cfg-A",
    )
    assert r_same["written"] == [] and r_same["skipped"] == list(range(4))
    # changed tag (e.g. different max_bytes): full rewrite, no stale mix
    new = pd.DataFrame(
        {"doc_id": np.arange(60, dtype=np.int64), "payload": ["new"] * 60}
    )
    r2 = write_partitioned(
        ray.data.from_pandas(new).repartition(2), out, "doc_id",
        n_parts=4, run_tag="cfg-B",
    )
    assert sorted(r2["written"]) == list(range(4)) and r2["skipped"] == []
    back = read_partitioned(out).to_pandas()
    assert len(back) == 60 and (back["payload"] == "new").all()


def test_connected_components_distributed_matches_unionfind(ray_session):
    """Min-label propagation == union-find on a graph with a long chain
    (worst case for propagation rounds), a star, and singleton pairs."""
    import numpy as np

    from snapcrawler_ray.functions.dedup import (
        connected_components_distributed,
    )

    chain = [(i, i + 1) for i in range(10, 18)]          # diameter 8
    star = [(100, x) for x in (101, 102, 103, 104)]
    loose = [(200, 300), (400, 401)]
    pairs = pd.DataFrame(chain + star + loose, columns=["vec_a", "vec_b"])
    got = connected_components_distributed(pairs)
    labels = dict(zip(got["node"], got["label"]))
    assert all(labels[i] == 10 for i in range(10, 19))
    assert all(labels[x] == 100 for x in (100, 101, 102, 103, 104))
    assert labels[300] == 200 and labels[401] == 400
    # empty graph
    empty = connected_components_distributed(
        pd.DataFrame({"vec_a": [], "vec_b": []})
    )
    assert len(empty) == 0


def test_emb_near_dup_finds_planted_pairs(ray_session, tmp_path):
    """The driver's embeddings are isotropic-random (max pairwise
    cosine ~0.5), so near-dup output is legitimately empty there; this
    plants true near-duplicates and checks they — and only they — are
    found."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from snapcrawler_ray.functions.dedup import embedding_near_dup_pairs

    rng = np.random.RandomState(7)
    base = rng.normal(size=(200, 64))
    # plant: 201 = 0 + tiny noise, 202 = 17 exactly, 203 = 42 + noise
    planted = np.vstack([
        base,
        base[0] + 0.01 * rng.normal(size=64),
        base[17],
        base[42] + 0.02 * rng.normal(size=64),
    ])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(planted)), pa.int64()),
        "embedding": pa.array([r.tolist() for r in planted],
                              pa.list_(pa.float64())),
    })
    d = tmp_path / "sf_fake"
    d.mkdir()
    pq.write_table(t, str(d / "embeddings.parquet"))
    pairs = embedding_near_dup_pairs(str(d), threshold=0.95)
    got = {(int(a), int(b)) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
    assert got == {(0, 200), (17, 201), (42, 202)}


def test_semdedup_cluster_cap_parity(ray_session):
    """The fat-cluster skew guard (block-pair fan-out above
    cluster_cap) must be bit-identical to the in-task sweep — same
    pairs, same keep decisions (VERDICT r4 #2).  cap=16 forces every
    sf0.001 cluster through the fan-out path."""
    from snapcrawler_ray.functions import dedup

    a = dedup.semdedup_pairs(SF_DIR, cluster_cap=None)
    b = dedup.semdedup_pairs(SF_DIR, cluster_cap=16)
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
    ka = dedup.semdedup_keep(SF_DIR, cluster_cap=None)
    kb = dedup.semdedup_keep(SF_DIR, cluster_cap=16)
    pd.testing.assert_frame_equal(_canon(ka), _canon(kb))


def test_images_analysis_query(contract):
    """M20–M23 analyzer contract row: every decoded accepted row gets a
    micro-unit quality in [0, 1e6], a valid content type, 5 dominant
    colors and 3 tag slots (the value truth itself is SQL-oracled in
    test_crawl_mode_and_verdict_sql_oracles and by the driver)."""
    qs, _ = contract
    df = _to_pandas(qs["images_analysis"](SF_DIR))
    assert len(df) > 10
    assert {"quality_micro", "content_type", "dominant_colors",
            "ai_tags"} <= set(df.columns)
    valid = {"text", "banner", "icon", "logo", "photo", "illustration"}
    assert set(df["content_type"].unique()) <= valid
    assert df["quality_micro"].between(0, 1_000_000).all()
    assert df["dominant_colors"].str.count("#").max() == 5
    assert df["ai_tags"].str.count(",").min() >= 2  # type+resolution+orient


def test_media_features_dead_letter_rows(contract):
    """Corrupted payloads surface as ok=False dead-letter rows, fake
    audio/video decode through the documented codec boundary."""
    qs, _ = contract
    df = _to_pandas(qs["media_features"](SF_DIR))
    assert (~df["ok"]).sum() > 0
    bad = df[~df["ok"]]
    assert bad["error"].str.len().min() > 0
    good = df[df["ok"]]
    assert set(good["kind"].unique()) == {"image", "audio", "video"}
    aud = good[good["kind"] == "audio"]
    assert (aud["feature_a"] > 0).all()  # duration_s


def test_sitemap_frontier_priority_filter(contract):
    qs, _ = contract
    df = _to_pandas(qs["crawl_sitemap_frontier"](SF_DIR))
    pages = df[df["kind"] == "page"]
    assert len(pages) > 0 and (pages["priority"] > 0.3).all()
    assert (df["kind"] == "sitemap").sum() > 0  # index + robots rows


def test_crawl_queries_run(contract):
    qs, _ = contract
    visits = _to_pandas(qs["crawl_visits"](SF_DIR))
    assert len(visits) > 20
    em = _to_pandas(qs["crawl_emissions"](SF_DIR))
    assert len(em) > 20
    seen = _to_pandas(qs["crawl_seen_set"](SF_DIR))
    assert len(seen) >= len(visits)


def test_entry_runs(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert "reason" in df.columns


def test_pii_scrub_kernel_planted(con):
    """The testdata corpus contains no PII, so the oracle match above
    only proves the identity path.  Plant real emails / IPs / phone
    numbers and compare the kernel against DuckDB's regexp_replace
    chain applied to the same literals."""
    from snapcrawler_ray.functions.text import _PII_PATTERNS, pii_scrub_kernel

    samples = [
        "contact bob.smith+spam@example.co.uk for details",
        "server at 10.0.255.3 timed out, retry 192.168.1.1",
        "call 415-555-2671 or 415.555.2671 today",
        "mixed: a@b.io on 8.8.8.8 dial 800-555-0100 now",
        "no pii here at all",
        "",
        "v1.2.3 is not an ip, 1.2.3.4 is",
    ]
    got = pii_scrub_kernel(pd.Series(samples)).tolist()
    expr = "s"
    for pat, repl in _PII_PATTERNS:
        pat_sql = pat.replace("'", "''").replace("\\", "\\")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    want = [
        con.sql(f"SELECT {expr} AS r FROM (SELECT ? AS s)",
                params=[s]).fetchone()[0]
        for s in samples
    ]
    assert got == want
    assert got[0] == "contact <EMAIL> for details"
    assert got[1] == "server at <IP> timed out, retry <IP>"
    assert "<PHONE>" in got[2]


def test_doc_chunks_reassemble(contract):
    """Chunk fingerprints must tile the normalized document exactly:
    chunk sizes sum to the doc's token count and every chunk md5
    matches a direct recomputation from the text."""
    import hashlib

    qs, _ = contract
    chunks = _to_pandas(qs["docs_chunks"](SF_DIR))
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet",
                           columns=["doc_id", "text"]).head(50)
    by_doc = chunks.groupby("doc_id")
    for r in docs.itertuples():
        toks = (r.text or "").strip().split()
        if not toks:
            assert r.doc_id not in by_doc.groups
            continue
        g = by_doc.get_group(r.doc_id).sort_values("chunk_id")
        assert g["n_tokens"].sum() == len(toks)
        assert list(g["chunk_id"]) == list(range(len(g)))
        for cid, md5 in zip(g["chunk_id"], g["chunk_md5"]):
            want = hashlib.md5(
                " ".join(toks[cid * 64:(cid + 1) * 64]).encode()
            ).hexdigest()
            assert md5 == want


def test_hll_approx_distinct_within_bound(contract, con):
    """HLL estimate per event_type is within the p=12 error envelope of
    the exact distinct count, and bit-deterministic across runs."""
    qs, _ = contract
    est = _to_pandas(qs["events_approx_users"](SF_DIR))
    exact = con.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n "
        "FROM events GROUP BY event_type"
    ).df()
    j = est.merge(exact, on="event_type")
    assert len(j) == len(exact)
    rel = (j["approx_distinct"] - j["n"]).abs() / j["n"].clip(lower=1)
    # 1.04/sqrt(4096) ~ 1.6% RSE; allow 4 sigma plus small-count slack
    assert (rel < 0.07).all(), j.to_string()
    est2 = _to_pandas(qs["events_approx_users"](SF_DIR))
    pd.testing.assert_frame_equal(est, est2)


def test_kmeans_monotone_and_matches_bruteforce(ray_session):
    """Distributed Lloyd's iterations: inertia non-increasing, and the
    final state equals a single-process numpy Lloyd run from the same
    seeds (the distributed partial-sum fold is exact)."""
    from snapcrawler_ray.functions.similarity import kmeans

    got = kmeans(SF_DIR, k=8, n_iter=5)
    hist = got.attrs["inertia_history"]
    assert all(hist[i + 1] <= hist[i] + 1e-9 for i in range(len(hist) - 1))

    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    m = np.stack(emb.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    m = m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)
    cent = m[:8].copy()
    for _ in range(5):
        d2 = ((m * m).sum(1, keepdims=True) - 2.0 * (m @ cent.T)
              + (cent * cent).sum(1)[None, :])
        a = np.argmin(d2, axis=1)
        last_inertia = d2[np.arange(len(a)), a].sum()
        for c in range(8):
            if (a == c).any():
                cent[c] = m[a == c].mean(0)
    counts = np.bincount(a, minlength=8)
    assert list(got["n_vecs"]) == list(counts)
    assert abs(got["inertia"].iloc[0] - last_inertia) < 1e-6


def test_hll_hourly_within_bound(contract, con):
    qs, _ = contract
    est = _to_pandas(qs["events_approx_hourly_users"](SF_DIR))
    exact = con.sql(
        "SELECT date_trunc('hour', ts) AS hour, "
        "count(DISTINCT user_id) AS n FROM events GROUP BY 1"
    ).df()
    j = est.merge(exact, on="hour")
    assert len(j) == len(exact)
    rel = (j["approx_distinct"] - j["n"]).abs() / j["n"].clip(lower=1)
    assert (rel < 0.07).all()


def test_host_pagerank_matches_power_iteration(ray_session):
    """Distributed exact-integer PageRank: (a) bit-identical to a
    single-process integer replay from the same edge list, (b) within
    the documented floor-loss envelope of the true float power
    iteration, (c) ranks sum to 1 up to that envelope."""
    import __ray_entry__ as e
    from snapcrawler_ray.functions.webops import (
        PAGERANK_SCALE, host_edges, host_pagerank,
    )

    _, path = e._corpus_for(SF_DIR)
    got = host_pagerank(path, n_iter=20)

    edges = host_edges(path)
    hosts = np.unique(np.concatenate(
        [edges["src_host"].to_numpy(), edges["dst_host"].to_numpy()]))
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    S = PAGERANK_SCALE
    src = edges["src_host"].map(idx).to_numpy()
    dst = edges["dst_host"].map(idx).to_numpy()
    w = edges["weight"].to_numpy(np.int64)
    outw = np.zeros(n, np.int64)
    np.add.at(outw, src, w)
    # (a) exact integer replay — must match bit for bit
    ri = np.full(n, S // n, np.int64)
    for _ in range(20):
        contrib = (ri[src] * w) // outw[src]
        inflow = np.zeros(n, np.int64)
        np.add.at(inflow, dst, contrib)
        dang = int(ri[outw == 0].sum())
        ri = (3 * S) // (20 * n) + (17 * (inflow + dang // n)) // 20
    want = pd.DataFrame({"host": hosts, "rank_scaled": ri})
    want = want.sort_values("host").reset_index(drop=True)
    assert got["rank_scaled"].tolist() == want["rank_scaled"].tolist()
    assert (got["rank"] == got["rank_scaled"] / S).all()

    # floor-loss envelope: n_iter·(|E| + n + 2)/SCALE
    eps = 20 * (len(edges) + n + 2) / S
    assert abs(got["rank"].sum() - 1.0) < eps
    # (b) true float power iteration within the same envelope
    rf = np.full(n, 1.0 / n)
    for _ in range(20):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rf[src] * w / outw[src])
        dangling = rf[outw == 0].sum()
        rf = 0.15 / n + 0.85 * (contrib + dangling / n)
    assert np.abs(
        got["rank"].to_numpy()
        - pd.DataFrame({"host": hosts, "r": rf})
        .sort_values("host")["r"].to_numpy()
    ).max() < eps


def test_host_pagerank_overflow_guard(ray_session, tmp_path, monkeypatch):
    """An edge weight above 2^63/SCALE must fail loudly (silent int64
    wrap in the fixed-point contribution product), not corrupt ranks."""
    import pandas as pd
    import pytest

    from snapcrawler_ray.functions import webops

    big = pd.DataFrame(
        {"src_host": ["a"], "dst_host": ["b"],
         "weight": [(2**63 - 1) // webops.PAGERANK_SCALE + 1]}
    )
    monkeypatch.setattr(webops, "host_edges", lambda _: big)
    with pytest.raises(OverflowError):
        webops.host_pagerank("unused", n_iter=1)


def test_bpe_pattern_re2_parity(con):
    """text.BPE_PAT must count identically under Python re (engine) and
    DuckDB RE2 (oracle) — adversarial strings around the documented
    semantics boundary (no lookahead: a whitespace run absorbs its last
    space) plus the alternation-priority and greediness edges."""
    import re

    from snapcrawler_ray.functions.text import BPE_PAT

    cases = [
        "", " ", "  ", "  abc", "don't", "it's a 'test'--ok",
        "a1b2", "hello,  world!!", "tab\tnl\nmix", "'s's's",
        "x 'll 'd y", "...", "a  b   c", " 9 lives", "CamelCase99",
        "trailing space ", " leading", "--- ''' 123abc!?",
        # \x0b / \xa0 are whitespace to Python's \s but NOT to RE2's —
        # the explicit [ \t\n\r\f\v] class must count them identically
        " \x0b \x0b", "a\x0bb", "\xa0x", "\f\v\r\n", "a\xa0 b",
    ]
    for s in cases:
        pc = len(re.findall(BPE_PAT, s))
        dc = con.sql(
            "SELECT len(regexp_extract_all(?, ?))", params=[s, BPE_PAT]
        ).fetchone()[0]
        assert pc == dc, repr(s)


def test_watermark_late_bucket_invariance(ray_session):
    """events_watermark_late must be invariant to the arrival-range
    bucket size (the distribution knob): tiny buckets force the
    cross-bucket exclusive-cummax seeding on nearly every range, and
    the result must equal both the default and a single-bucket run
    plus a numpy single-pass reference."""
    from snapcrawler_ray.functions.relational import events_watermark_late

    outs = {}
    for b in (16, 512, 10**9):
        df = (
            events_watermark_late(SF_DIR, bucket_rows=b)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        outs[b] = df.astype("int64")
    pd.testing.assert_frame_equal(outs[16], outs[512])
    pd.testing.assert_frame_equal(outs[512], outs[10**9])

    # numpy single-pass reference
    import pyarrow.parquet as pq

    t = (
        pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_id", "ts"])
        .to_pandas()
    )
    eid = t["event_id"].to_numpy(np.int64)
    ts = t["ts"].astype("int64").to_numpy()
    order = np.argsort(eid ^ 3, kind="mergesort")
    ts_a, eid_a = ts[order], eid[order]
    wm = np.maximum.accumulate(ts_a)
    late = ts_a + 60_000_000 < wm
    ref = pd.DataFrame(
        {"event_id": eid_a[late], "ts_us": ts_a[late], "watermark_us": wm[late]}
    ).sort_values("event_id").reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(outs[512], ref)


def test_bloom_runtime_filter_kernels():
    """No false negatives ever (a dropped joining row would corrupt the
    join); false-positive rate sane at the 8-bits/key budget; int64 and
    string keys both supported through the hash front-end; the
    from_bits round-trip (build partial → merge → probe) preserves
    membership."""
    from snapcrawler_ray.functions.relational import _bloom_hash
    from snapcrawler_ray.state.bloom import BloomFilter

    keys = np.arange(20000, dtype=np.int64) * 13 + 5
    bf = BloomFilter(capacity=len(keys), bits_per_key=8, n_hashes=4)
    bf.add(_bloom_hash(keys))
    assert bf.contains(_bloom_hash(keys)).all()
    probe = np.arange(10**7, 10**7 + 200000, dtype=np.int64)
    fpp = bf.contains(_bloom_hash(probe)).mean()
    assert fpp < 0.05, fpp
    # merge two partials by OR, probe through from_bits (the exact
    # shape _dim_join's runtime filter uses)
    sk = pd.Series([f"key-{i}" for i in range(5000)])
    p1 = BloomFilter.from_bits(
        np.zeros(bf.n_bits // 8, np.uint8), bf.n_bits, bf.k
    )
    p2 = BloomFilter.from_bits(
        np.zeros(bf.n_bits // 8, np.uint8), bf.n_bits, bf.k
    )
    p1.add(_bloom_hash(sk[:2500]))
    p2.add(_bloom_hash(sk[2500:]))
    merged = BloomFilter.from_bits(p1.bits | p2.bits, bf.n_bits, bf.k)
    assert merged.contains(_bloom_hash(sk)).all()
    assert merged.contains(
        _bloom_hash(pd.Series(["nope-1", "nope-2"]))
    ).sum() <= 1


def test_dup_spans_island_merge_crafted(ray_session, tmp_path):
    """ExactSubstr span semantics on a crafted corpus: consecutive
    duplicated 3-gram starts merge into ONE maximal span, a position
    gap splits spans, and an intra-doc-only repeat (df=1 distinct doc)
    is NOT a duplicated gram."""
    import pyarrow.parquet as pq

    from snapcrawler_ray.functions import text

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e x y z",        # island [1..3] -> span (1, 5)
                    "q a b c d e r",          # island [2..4] -> span (2, 5)
                    "m n o p a b c m n o p",  # 'm n o' repeats only intra-doc
                    "zz yy xx",               # shares nothing
                    "a b c g g g c d e",      # two gapped spans (1,3) (7,3)
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (
        text.dup_spans(str(tmp_path), k=3)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 5, 5],
            "span_start": [1, 2, 5, 1, 7],
            "span_tokens": [5, 5, 3, 3, 3],
        }
    )
    pd.testing.assert_frame_equal(
        out.astype("int64"), expect.astype("int64")
    )


def test_dup_spans_join_path_matches_broadcast(ray_session):
    """Forcing the over-limit dictionary topology (max_broadcast_grams=0
    -> partitioned gram join + doc-bucketed island reduce) must
    reproduce the broadcast-path spans exactly."""
    from snapcrawler_ray.functions import text

    bc = (
        text.dup_spans(SF_DIR)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    jn = (
        text.dup_spans(SF_DIR, max_broadcast_grams=0)
        .to_pandas()
        .sort_values(["doc_id", "span_start"])
        .reset_index(drop=True)
    )
    assert len(bc) > 0  # non-vacuous at this SF
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


def test_politeness_schedule_oracle(contract, con):
    """T5/T6 adaptive politeness under the hard gate at sf0.001: the
    DuckDB recursive-CTE replay re-derives every (first_ts, delay)
    double bit-for-bit from the dumped (n_urls, status) event stream."""
    qs, oracles = contract
    ray_df = _canon(_to_pandas(qs["crawl_politeness_schedule"](SF_DIR)))
    sql = oracles["crawl_politeness_schedule"].replace("sf0.01", "sf0.001")
    sql_df = _canon(con.sql(sql).df())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df) and len(ray_df) > 0
    # the recurrence must actually adapt on this corpus (429/5xx occur)
    assert ray_df["delay"].nunique() > 1
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_dup_spans_cut_crafted(ray_session, tmp_path):
    """Cut semantics on the crafted corpus: covered tokens drop, the
    rest rejoin with single spaces, a fully-covered doc yields ''."""
    import pyarrow.parquet as pq

    from snapcrawler_ray.functions import text

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a b c d e x y z",  # span tokens 1-5 cut -> "x y z"
                    "q a b c d e r",    # span tokens 2-6 cut -> "q r"
                    "a b c d e",        # fully covered -> ""
                ]
            ),
        }
    )
    pq.write_table(docs, tmp_path / "documents.parquet")
    out = (
        text.dup_spans_cut(str(tmp_path), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3], dtype="int64"),
            "clean_text": ["x y z", "q r", ""],
            "n_removed": pd.Series([5, 5, 5], dtype="int64"),
        }
    )
    pd.testing.assert_frame_equal(out, expect, check_dtype=False)


def test_politeness_replay_covers_salted_subbatches(ray_session, tmp_path):
    """Force heavy-hitter salting (threshold=3) so hosts schedule in
    MULTIPLE consecutive sub-batches per wave, then check the DuckDB
    recursive-CTE replay still re-derives every (first_ts, delay)
    bit-for-bit — the per-sub-batch op order (next_free += c_i*delay,
    one add per sub-batch) is exactly what the seq-ordered event
    stream encodes."""
    import duckdb
    import pyarrow.parquet as pq

    from snapcrawler_ray.config import (
        CrawlConfig,
        CrawlLimits,
        PolitenessConfig,
    )
    from snapcrawler_ray.pipelines.crawl import CrawlEngine
    from snapcrawler_ray.sources.corpus import (
        CorpusSpec,
        generate_corpus,
        seeds_for,
    )

    spec = CorpusSpec(seed=42, n_pages=300, n_hosts=4, buckets=8)
    path = generate_corpus(str(tmp_path / "corpus"), spec, use_ray=False)
    cfg = CrawlConfig(
        start_urls=tuple(seeds_for(spec)),
        limits=CrawlLimits(max_depth=3),
        politeness=PolitenessConfig(
            oracle_log=True, heavy_hitter_threshold=3
        ),
    )
    eng = CrawlEngine(path, seeds_for(spec), cfg, n_buckets=spec.buckets,
                      mode="exact")
    try:
        eng.run()
        sched, status = eng.politeness_log()
    finally:
        eng.shutdown()
    assert sched.num_rows > 0
    sub = sched.column("sub").to_numpy()
    assert (sub > 0).any(), "salting did not produce multi-sub-batch hosts"
    pq.write_table(sched, tmp_path / "polite_sched.parquet")
    pq.write_table(status, tmp_path / "polite_status.parquet")
    import __ray_entry__ as e

    sql = e.oracle_sql()["crawl_politeness_schedule"].replace(
        e._oracle_tbl_dir("sf0.01"), str(tmp_path)
    )
    got = _canon(sched.to_pandas()[
        ["host", "wave", "sub", "n_urls", "first_ts", "delay"]
    ])
    dcon = duckdb.connect()
    want = _canon(dcon.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=0, atol=1e-9)


def test_bigram_surprisal_join_path_matches_broadcast(ray_session):
    """Forcing the over-limit model topology (max_broadcast_grams=0 ->
    context fold + two partitioned joins + doc-bucketed reduce) must
    reproduce the broadcast-path scores exactly."""
    from snapcrawler_ray.functions import text

    bc = (
        text.bigram_surprisal(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    jn = (
        text.bigram_surprisal(SF_DIR, max_broadcast_grams=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


def test_unigram_surprisal_join_path_matches_broadcast(ray_session):
    """Forcing the over-limit vocabulary topology must reproduce the
    broadcast-path scores exactly (same shape as the bigram test)."""
    from snapcrawler_ray.functions import text

    bc = (
        text.unigram_surprisal(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    jn = (
        text.unigram_surprisal(SF_DIR, max_broadcast_tokens=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(bc) > 0
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


def test_dup_spans_cut_join_path_matches_broadcast(ray_session):
    """Forcing the over-limit dictionary topology for the CUT pass
    (span-list fold + left-outer doc join + map cut) must reproduce
    the broadcast-path output exactly."""
    from snapcrawler_ray.functions import text

    bc = (
        text.dup_spans_cut(SF_DIR)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    jn = (
        text.dup_spans_cut(SF_DIR, max_broadcast_grams=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(bc) > 0 and (bc["n_removed"] > 0).any()
    pd.testing.assert_frame_equal(bc, jn, check_dtype=False)


def test_simhash_keep_distributed_matches_unionfind(ray_session):
    """The min-label-propagation escape hatch must equal the driver
    union-find on the SimHash pair graph."""
    from snapcrawler_ray.functions import dedup

    a = dedup.simhash_keep(SF_DIR)
    b = dedup.simhash_keep(SF_DIR, distributed=True)
    assert len(a) > 0
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
        check_dtype=False,
    )
