"""Property-based tests (hypothesis) over the pure kernels — the
invariants that must hold for ANY input, complementing the
oracle/golden tests that pin specific values.  No Ray session needed.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from snapcrawler_ray.functions.sketch import _lzc64, hll_estimate, hll_partial
from snapcrawler_ray.hashing import url_hash64
from snapcrawler_ray.urlnorm import canonicalize, host_of

URLS = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                           whitelist_characters=":/.?#&=-_~%"),
    min_size=0, max_size=60,
).map(lambda s: "https://" + s)


@given(st.lists(URLS, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(urls):
    once = canonicalize(np.asarray(urls, dtype=object))
    twice = canonicalize(once)
    assert list(once) == list(twice)


@given(st.lists(URLS, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_url_hash_is_function_of_canonical_form(urls):
    """Equal canonical URLs must hash equal (the seen-set contract)."""
    arr = np.asarray(urls, dtype=object)
    canon = canonicalize(arr)
    h = url_hash64(canon)
    seen = {}
    for c, hv in zip(canon, h):
        assert seen.setdefault(c, hv) == hv


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_host_of_prefix_consistency(path):
    url = "https://example.test/" + path
    assert host_of(url) == "example.test"


@given(st.integers(min_value=1, max_value=2**64 - 1))
@settings(max_examples=300, deadline=None)
def test_lzc64_matches_bit_length(x):
    assert _lzc64(np.array([x], dtype=np.uint64))[0] == 64 - x.bit_length()


@given(st.lists(st.integers(min_value=0, max_value=2**61), min_size=1,
                max_size=500))
@settings(max_examples=50, deadline=None)
def test_hll_duplicate_and_order_insensitive(vals):
    """The sketch (and therefore the estimate) is a pure function of
    the SET of values — duplicates and order must not change it."""
    a = np.asarray(vals, dtype=np.int64)
    keys = np.repeat("k", len(a))
    base = hll_partial(keys, a, 10)
    dup = np.concatenate([a, a[::-1]])
    dup_part = (
        hll_partial(np.repeat("k", len(dup)), dup, 10)
        .groupby(["key", "reg"], as_index=False)
        .agg(rank=("rank", "max"))
    )
    ea = hll_estimate(base, 10)["approx_distinct"].iloc[0]
    eb = hll_estimate(dup_part, 10)["approx_distinct"].iloc[0]
    assert ea == eb


@given(st.lists(st.integers(min_value=0, max_value=600), min_size=1,
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_pack_windows_kernel_invariants(tokens):
    """Sequential packing: window ids are non-decreasing in doc order,
    start at 0, and each window's exclusive-start offset lies in
    [window_id*B, (window_id+1)*B)."""
    budget = 512
    n = np.asarray(tokens, dtype=np.int64)
    cb = np.concatenate([[0], np.cumsum(n)[:-1]])
    w = cb // budget
    assert w[0] == 0
    assert (np.diff(w) >= 0).all()
    assert ((cb - w * budget) < budget).all() and ((cb - w * budget) >= 0).all()


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 10**6),
                  st.integers(0, 10**4)),
        min_size=1, max_size=300,
    )
)
@settings(max_examples=50, deadline=None)
def test_rolling_kernel_matches_pandas(rows):
    """The vectorized boundary-clamped sliding cumsum == pandas
    groupby.rolling for arbitrary (user, ts, cents) rows."""
    from snapcrawler_ray.functions.relational import events_rolling_window  # noqa: F401  (import proves kernel module loads)

    df = pd.DataFrame(rows, columns=["user_id", "ts", "c"]).reset_index()
    d = df.sort_values(["user_id", "ts", "index"], kind="mergesort")
    uid = d["user_id"].to_numpy()
    c = d["c"].to_numpy(np.int64)
    n = len(c)
    window = 5
    cs = np.concatenate([[0], np.cumsum(c)])
    new_user = np.concatenate([[True], uid[1:] != uid[:-1]])
    grp_start = np.maximum.accumulate(np.where(new_user, np.arange(n), 0))
    lo = np.maximum(grp_start, np.arange(1, n + 1) - window)
    w_sum = cs[1:] - cs[lo]
    want = (
        d.groupby("user_id")["c"]
        .rolling(window, min_periods=1)
        .sum()
        .to_numpy()
    )
    assert (w_sum == want.astype(np.int64)).all()


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=0,
                 max_size=30),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=60, deadline=None)
def test_exact_seen_semantics_match_python_set(batches):
    """The vectorized exact-mode shard state (sorted base + pending
    delta + unique-first-wins) must be indistinguishable from a plain
    python-set loop over any batch sequence, including in-batch dups
    and cross-batch repeats.  Exercises the state machine directly
    (no Ray actor)."""
    from snapcrawler_ray.state.seen import SeenShard

    shard = SeenShard.__ray_actor_class__("exact")
    # force tiny merge threshold so base/pending interplay is exercised
    ref: set[int] = set()
    for batch in batches:
        keys = np.array(batch, dtype=np.uint64)
        got = shard.check_and_add("t", keys)
        want = []
        for k in batch:
            want.append(k not in ref)
            ref.add(k)
        assert got.tolist() == want
        assert shard.contains("t", keys).all()
        assert shard.count("t") == len(ref)


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=40), min_size=0,
                 max_size=30),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_approx_seen_in_batch_first_wins(batches):
    """The NON-exact shards must honour the same in-batch first-wins
    contract as exact mode: the filters' batch check_and_add is
    contains-then-add, so the shard dedupes keys before the filter —
    without that, an in-batch duplicate pair both report new (the r5
    +10-emission drift between exact and bloom at 1M pages).  At these
    capacities bloom/cuckoo are fp-free, so the masks must EQUAL the
    python-set loop, not just approximate it."""
    from snapcrawler_ray.state.seen import SeenShard

    for mode in ("bloom", "cuckoo"):
        shard = SeenShard.__ray_actor_class__(
            mode, bloom_capacity=100_000, bloom_bits_per_key=16
        )
        ref: set[int] = set()
        for batch in batches:
            keys = np.array(batch, dtype=np.uint64)
            got = shard.check_and_add("t", keys)
            want = []
            for k in batch:
                want.append(k not in ref)
                ref.add(k)
            assert got.tolist() == want, mode


@given(
    st.lists(st.integers(min_value=1, max_value=500), min_size=1,
             max_size=60),
    st.integers(min_value=1, max_value=30_000),
)
@settings(max_examples=60, deadline=None)
def test_byte_budget_keep_matches_reference_folds(sizes, budget):
    """_byte_budget_keep reproduces BOTH reference byte-cap folds for
    arbitrary size sequences and budgets (sparse emit_seqs included):
    'parallel' saves until current >= cap checked AFTER each save
    (filtering_module.py:126-128 — the crossing image is saved);
    'scrapy' drops iff spent + size > cap and CONTINUES
    (pipelines.py:300 — later smaller images still fit)."""
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True)
    from snapcrawler_ray.pipelines.images import _byte_budget_keep

    seqs = np.cumsum(np.array(sizes) % 7 + 1)  # strictly increasing, gappy
    df = pd.DataFrame({"emit_seq": seqs.astype(np.int64),
                       "size_bytes": np.array(sizes, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(3)

    def kept(mode):
        prefix_end, tail = _byte_budget_keep(ds, budget, mode, n_buckets=4)
        pfx = -1 if prefix_end is None else prefix_end
        m = (df["emit_seq"] <= pfx) | df["emit_seq"].isin(tail)
        return df["emit_seq"][m].tolist()

    # reference fold, parallel chain
    want_par, cur = [], 0
    for s, z in zip(seqs.tolist(), sizes):
        if cur >= budget:
            break
        want_par.append(int(s))
        cur += z
    assert kept("parallel") == want_par

    # reference fold, scrapy chain
    want_scr, spent = [], 0
    for s, z in zip(seqs.tolist(), sizes):
        if spent + z <= budget:
            want_scr.append(int(s))
            spent += z
    assert kept("scrapy") == want_scr


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["add", "check", "delete"]),
            st.lists(st.integers(min_value=0, max_value=60), min_size=0,
                     max_size=20),
        ),
        min_size=1, max_size=10,
    )
)
@settings(max_examples=50, deadline=None)
def test_cuckoo_vs_reference_multiset(ops):
    """delete_safe cuckoo filter vs a python SATURATING MULTISET over
    arbitrary op sequences (standard cuckoo semantics: EVERY presented
    occurrence — in-batch duplicates included — inserts a copy, so
    stored counts are independent of how callers batch, which is what
    keeps per-occurrence delete() sound under fingerprint collisions;
    copies of one key saturate at the physical 2×4-slot bound of its
    two buckets): never a false negative below saturation;
    check_and_add first-wins reports newness vs pre-batch membership;
    delete removes one stored copy per present key."""
    from collections import Counter

    from snapcrawler_ray.state.cuckoo import CuckooFilter

    SAT = 8  # 2 buckets × 4 slots per fingerprint
    cf = CuckooFilter(10_000, delete_safe=True)
    ref: Counter = Counter()  # stored (post-saturation) copy counts
    for op, vals in ops:
        keys = np.array(vals, dtype=np.uint64)
        if op == "add":
            cf.add(keys)
            for k in vals:  # one copy per occurrence, saturating
                ref[k] = min(ref[k] + 1, SAT)
        elif op == "check":
            got = cf.check_and_add(keys)
            want, seen_in_batch = [], set()
            for k in vals:
                want.append(ref[k] == 0 and k not in seen_in_batch)
                seen_in_batch.add(k)
            for k in vals:  # one copy per occurrence, saturating
                ref[k] = min(ref[k] + 1, SAT)
            assert got.tolist() == want
        else:
            got = cf.delete(keys)
            want = []
            for k in vals:
                present = ref[k] > 0
                want.append(present)
                if present:
                    ref[k] -= 1
            assert got.tolist() == want
        # invariant: every live reference member is contained
        live = sorted(k for k, c in ref.items() if c > 0)
        if live:
            arr = np.array(live, dtype=np.uint64)
            assert cf.contains(arr).all()
        assert cf.approx_count == sum(ref.values())


def test_cuckoo_delete_safe_batching_invariant():
    """add([k, k]) must store exactly as many copies as add([k]);
    add([k]) — the stored multiset cannot depend on how a caller
    batches its occurrences, or a per-occurrence delete() stream
    false-negatives a still-live occurrence."""
    from snapcrawler_ray.state.cuckoo import CuckooFilter

    k = np.array([42, 42], dtype=np.uint64)
    one_batch = CuckooFilter(1000, delete_safe=True)
    one_batch.add(k)
    two_batches = CuckooFilter(1000, delete_safe=True)
    two_batches.add(k[:1])
    two_batches.add(k[:1])
    for cf in (one_batch, two_batches):
        assert cf.approx_count == 2
        assert cf.delete(k[:1])[0]
        assert cf.contains(k[:1])[0]  # second copy still live
        assert cf.delete(k[:1])[0]
        assert not cf.contains(k[:1])[0]
    # check_and_add: same rule, return value still first-wins newness
    cf = CuckooFilter(1000, delete_safe=True)
    got = cf.check_and_add(k)
    assert got.tolist() == [True, False]
    assert cf.approx_count == 2


def test_cuckoo_delete_safe_saturates_at_physical_bound():
    """A fingerprint's only possible homes are its two 4-slot buckets,
    so the 9th copy of one key CANNOT be stored: inserts saturate at 8
    (no bogus 'filter full' on a near-empty table), approx_count tracks
    stored copies, and delete() drains exactly the stored 8."""
    from snapcrawler_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(10_000, delete_safe=True)
    k = np.full(20, 7, dtype=np.uint64)
    cf.add(k)  # 20 occurrences, 8 storable
    assert cf.approx_count == 8
    one = k[:1]
    for _ in range(8):
        assert cf.contains(one)[0]
        assert cf.delete(one)[0]
    assert not cf.contains(one)[0]
    assert not cf.delete(one)[0]
    assert cf.approx_count == 0


def test_cuckoo_seen_mode_refuses_delete():
    from snapcrawler_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(1000)
    cf.add(np.array([1, 2], dtype=np.uint64))
    with pytest.raises(RuntimeError, match="delete_safe"):
        cf.delete(np.array([1], dtype=np.uint64))


def test_cuckoo_delete_safe_survives_fingerprint_collision():
    """The ADVICE-r3 scenario: keys A != B with the same fingerprint
    and same primary bucket.  In delete_safe mode both physically
    insert, so deleting A leaves B contained; in seen mode B's insert
    would have been skipped and delete is refused outright."""
    from snapcrawler_ray.state.cuckoo import CuckooFilter

    cf = CuckooFilter(64, delete_safe=True)
    rng = np.random.RandomState(9)
    keys = rng.randint(1, 2**62, 300_000).astype(np.uint64)
    fp, i1, _ = cf._parts(keys)
    pair_key = fp.astype(np.uint64) << np.uint64(32) | i1.astype(np.uint64)
    order = np.argsort(pair_key, kind="stable")
    dup = np.nonzero(
        (np.diff(pair_key[order]) == 0)
        & (np.diff(keys[order]) != 0)
    )[0]
    assert len(dup), "no fp+bucket collision found; widen the search"
    a, b = keys[order[dup[0]]], keys[order[dup[0] + 1]]
    cf.add(np.array([a], dtype=np.uint64))
    cf.add(np.array([b], dtype=np.uint64))  # contained, still inserts
    assert cf.delete(np.array([a], dtype=np.uint64))[0]
    assert cf.contains(np.array([b], dtype=np.uint64))[0]  # no false neg


@given(
    st.lists(
        st.text(
            alphabet=" abcdef\t\né", min_size=0, max_size=120
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=150, deadline=None)
def test_batched_shingles_and_minhash_bit_identical(texts):
    """The batched MinHash kernel (one hash_array over the batch,
    minimum.reduceat per doc) must be bit-identical to the per-doc
    reference path for arbitrary texts, including empty/whitespace-only
    docs and docs shorter than the shingle width."""
    import pandas as pd

    from snapcrawler_ray.functions.dedup import (
        MinHashStage,
        _batch_distinct_hits,
        _batch_shingle_hashes,
        _perm_params,
        _shingle_hashes,
        minhash_signature,
    )

    arr = np.asarray(texts, dtype=object)
    sh, off = _batch_shingle_hashes(arr, k=3)
    for i, t in enumerate(texts):
        assert np.array_equal(sh[off[i] : off[i + 1]], _shingle_hashes(t, 3))

    a, b = _perm_params(64)
    st_ = MinHashStage(num_perm=64)
    out = st_(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    for i, t in enumerate(texts):
        assert out["signature"].iloc[i] == minhash_signature(t, a, b).tolist()

    # distinct-hit probe == per-doc unique/searchsorted reference
    k = 4
    bench = np.unique(
        np.concatenate([_shingle_hashes(t, k) for t in texts[: len(texts) // 2 + 1]])
    )
    got = _batch_distinct_hits(arr, bench, k)
    for i, t in enumerate(texts):
        u = np.unique(_shingle_hashes(t, k))
        pos = np.searchsorted(bench, u)
        pos[pos >= len(bench)] = 0
        assert got[i] == int((bench[pos] == u).sum()), i


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(1, 40)),
        min_size=0, max_size=60, unique=True,
    ),
    st.integers(2, 6),
)
@settings(max_examples=300, deadline=None)
def test_merge_islands_matches_brute(pairs, k):
    """_merge_islands (the ExactSubstr gaps-and-islands kernel) must
    equal the brute per-doc interval merge for ANY (doc, pos) set."""
    from snapcrawler_ray.functions.text import _merge_islands

    pairs = sorted(pairs)
    d = np.array([a for a, _ in pairs], dtype=np.int64)
    p = np.array([b for _, b in pairs], dtype=np.int64)
    got = _merge_islands(d, p, k)
    # brute: per doc, merge consecutive positions
    expect = []
    by_doc = {}
    for a, b in pairs:
        by_doc.setdefault(a, []).append(b)
    for doc in sorted(by_doc):
        run = []
        for pos in sorted(by_doc[doc]):
            if run and pos == run[-1] + 1:
                run.append(pos)
            else:
                if run:
                    expect.append((doc, run[0], run[-1] - run[0] + k))
                run = [pos]
        if run:
            expect.append((doc, run[0], run[-1] - run[0] + k))
    want = pd.DataFrame(
        expect, columns=["doc_id", "span_start", "span_tokens"]
    ).astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


TOKEN_TEXTS = st.lists(
    st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=3),
        min_size=0, max_size=12,
    ).map(" ".join),
    min_size=0, max_size=8,
)


@given(TOKEN_TEXTS, st.integers(1, 5))
@settings(max_examples=300, deadline=None)
def test_gram_arrays_matches_brute(texts, k):
    """_gram_arrays (shared by boilerplate/dup-spans/bigram ops) must
    enumerate exactly the brute per-row k-gram list with 1-based
    positions, in (row, pos) order."""
    from snapcrawler_ray.functions.text import _gram_arrays

    s = pd.Series(texts, dtype=object)
    doc_idx, pos, grams = _gram_arrays(s, k)
    expect = []
    for i, t in enumerate(texts):
        toks = t.strip().split() if t.strip() else [""]
        for j in range(max(0, len(toks) - k + 1)):
            expect.append((i, j + 1, " ".join(toks[j : j + k])))
    got = list(zip(doc_idx.tolist(), pos.tolist(), grams.tolist()))
    assert got == expect


@given(
    st.lists(st.sampled_from(["a", "b", "c", "ab", "aa"]), max_size=12),
    st.sampled_from(["a", "b", "c", "ab", "aa"]),
    st.sampled_from(["a", "b", "c", "ab", "aa"]),
)
@settings(max_examples=300, deadline=None)
def test_bpe_apply_invariants(syms, a, b):
    """_bpe_apply: concatenation is preserved, every merge shortens by
    one, and merged occurrences are disjoint left-to-right (the
    canonical example 'c c c c c' -> 'cc cc c' is pinned below)."""
    from snapcrawler_ray.functions.text import _bpe_apply

    out = _bpe_apply(syms, a, b)
    assert "".join(out) == "".join(syms)
    n_merged = len(syms) - len(out)
    assert n_merged >= 0
    assert out.count(a + b) >= n_merged * (a + b != a)  # merged present


def test_bpe_apply_disjoint_run():
    from snapcrawler_ray.functions.text import _bpe_apply

    assert _bpe_apply(list("ccccc"), "c", "c") == ["cc", "cc", "c"]
    assert _bpe_apply(list("cccc"), "c", "c") == ["cc", "cc"]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1.0, 1.0, allow_nan=False, width=32),
            min_size=8, max_size=8,
        ),
        min_size=2, max_size=12,
    )
)
def test_semdedup_integer_cosine_matches_float_off_boundary(vecs):
    """The exact integer cross-multiplied cosine test (25·ab² ≥ 4·aa·bb,
    ab>0 ⟺ cos ≥ 0.4 on the quantized vectors) agrees with a float
    cosine on the SAME quantized vectors whenever the pair is clearly
    off the threshold (the integer test exists precisely to decide the
    boundary deterministically; off it, both must agree)."""
    from snapcrawler_ray.functions.dedup import _semdedup_cluster_pairs

    m = np.array(vecs, dtype=np.float64)
    ids = np.arange(len(m), dtype=np.int64)
    g = pd.DataFrame({"vec_id": ids, "embedding": list(m)})
    got_ids, ia, ib = _semdedup_cluster_pairs(
        g, scale=10**6, tau_num=2, tau_den=5
    )
    hits = {(int(got_ids[a]), int(got_ids[b])) for a, b in zip(ia, ib)}

    q = np.floor(np.abs(m) * 1e6 + 0.5) * np.sign(m)
    norms = np.sqrt((q * q).sum(1))
    for i in range(len(m)):
        for j in range(i + 1, len(m)):
            den = norms[i] * norms[j]
            if den == 0:
                assert (i, j) not in hits
                continue
            cos = float(q[i] @ q[j]) / den
            if cos > 0.4 + 1e-9:
                assert (i, j) in hits
            elif cos < 0.4 - 1e-9:
                assert (i, j) not in hits


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=60),
)
def test_ppl_bucket_thresholds_are_exact_integer_ranks(values):
    """head/middle/tail cut rule: t_k = smallest value whose cumulative
    count reaches ceil(k·n/3) — verified against the brute definition
    on arbitrary multisets (the engine computes it via searchsorted on
    the histogram cumsum)."""
    vals = np.sort(np.array(values, dtype=np.int64))
    uniq, counts = np.unique(vals, return_counts=True)
    cum = np.cumsum(counts)
    n = len(vals)
    for k, target in ((1, (n + 2) // 3), (2, (2 * n + 2) // 3)):
        t_engine = int(uniq[np.searchsorted(cum, target)])
        t_brute = int(min(v for v in uniq
                          if (vals <= v).sum() >= target))
        assert t_engine == t_brute
