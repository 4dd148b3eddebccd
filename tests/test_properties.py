"""Property-based tests (hypothesis) for the deterministic recipes whose
correctness is a pure function of their inputs: sequence packing, the
quantile/CMS sketch arithmetic, and the sampling hash addressing.

Spark-executing properties cap max_examples (each example is a Spark job);
pure-python recipe properties run at the default budget.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_one_to_many_join_spark.streaming.sketch import (
    _CMS_D,
    _CMS_W,
    _Q_BINS,
    _Q_WIDTH,
    cms_estimate,
    cms_update,
    quantile_bin,
    quantile_estimate,
)


def _pack_reference(token_counts: list[int], budget: int):
    """Straight-line python model of concat-and-chunk packing."""
    out, start = [], 0
    for i, n in enumerate(token_counts):
        out.append((i, n, start, start // budget + 1))
        start += n
    return out


@settings(max_examples=10, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=100),
    bucket_size=st.integers(min_value=1, max_value=64),
)
def test_pack_sequences_matches_reference(spark, counts, budget, bucket_size):
    """The distributed prefix-sum formulation equals the sequential
    reference for ANY (token counts, budget, bucket fan-out) — the bucket
    size is physical only."""
    from kafka_streams_one_to_many_join_spark.functions.packing import (
        pack_sequences,
    )

    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_tokens, r.start_offset, r.seq_id)
        for r in pack_sequences(
            df, budget=budget, bucket_size=bucket_size
        ).collect()
    )
    assert got == _pack_reference(counts, budget)


@given(
    counts=st.lists(
        st.integers(min_value=0, max_value=1000),
        min_size=_Q_BINS,
        max_size=_Q_BINS,
    ),
    q=st.floats(min_value=0.001, max_value=0.999),
)
def test_quantile_estimate_properties(counts, q):
    """For any histogram: the estimate lies inside the hit bin's bounds,
    and the read-off is monotone in q."""
    n = sum(counts)
    est = quantile_estimate(counts, q)
    if n == 0:
        assert est is None
        return
    # inside the overall histogram range
    assert 0.0 <= est <= _Q_BINS * _Q_WIDTH
    # inside the bin that holds the target rank
    target = math.ceil(q * n)
    cum = 0
    for b, c in enumerate(counts):
        if c and cum < target <= cum + c:
            assert b * _Q_WIDTH < est <= (b + 1) * _Q_WIDTH or (
                est == b * _Q_WIDTH and target == cum
            )
            break
        cum += c
    # monotone in q
    for q2 in (min(0.999, q + 0.1),):
        e2 = quantile_estimate(counts, q2)
        assert e2 >= est


@given(
    tokens=st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=4),
        min_size=0,
        max_size=300,
    ),
    probe=st.text(alphabet="abcde", min_size=1, max_size=4),
)
def test_cms_upper_bound_and_merge_order_independence(tokens, probe):
    """CMS invariants for any token stream: est(t) >= true count(t), and
    the counter state is independent of update order / batch split."""
    c1 = [0] * (_CMS_D * _CMS_W)
    for t in tokens:
        cms_update(c1, t)
    true_count = sum(1 for t in tokens if t == probe)
    assert cms_estimate(c1, probe) >= true_count
    c2 = [0] * (_CMS_D * _CMS_W)
    for t in reversed(tokens):
        cms_update(c2, t)
    assert c1 == c2


@given(vals=st.lists(st.floats(min_value=0, max_value=5000), max_size=200))
def test_quantile_bin_total_preservation(vals):
    """Binning never loses or fabricates mass, for any value stream."""
    counts = [0] * _Q_BINS
    for v in vals:
        b = quantile_bin(v)
        assert 0 <= b < _Q_BINS
        counts[b] += 1
    assert sum(counts) == len(vals)


@given(
    keys=st.lists(st.text(alphabet="abcxyz0189", min_size=1, max_size=8), max_size=200),
    probes=st.lists(st.text(alphabet="abcxyz0189", min_size=1, max_size=8), max_size=50),
)
def test_bloom_membership_properties(keys, probes):
    """Bloom invariants for any key set: every inserted key tests
    positive (zero false negatives), word state is insert-order- and
    duplication-independent, and every word stays inside its 32-bit
    budget (the engine-portability guarantee)."""
    from kafka_streams_one_to_many_join_spark.streaming.sketch import (
        bloom_word_mask,
    )

    m, k = 512, 3

    def build(ks):
        words = [0] * (m // 32)
        for key in ks:
            for i in range(k):
                w, mask = bloom_word_mask(i, key, m)
                words[w] |= mask
        return words

    words = build(keys)
    assert words == build(list(reversed(keys)) + keys)  # order/dup-free
    assert all(0 <= w < 2**32 for w in words)

    def member(key):
        return all(
            words[wm[0]] & wm[1] == wm[1]
            for wm in (bloom_word_mask(i, key, m) for i in range(k))
        )

    assert all(member(key) for key in keys)
    if not keys:
        assert not any(member(p) for p in probes)


@given(
    ks=st.lists(st.integers(min_value=1, max_value=3), min_size=0, max_size=12),
    cuts=st.lists(st.booleans(), min_size=12, max_size=12),
)
def test_segment_delta_transition_algebra(ks, cuts):
    """The O(1)-state threshold-crossing algebra for ONE segment: for ANY
    sequence of per-doc occurrence counts split ANY way into batches, the
    summed (d_segments, d_dup) emissions must equal the batch reference
    (every occurrence of a globally-≥2 segment is duplicated), and the
    state never stores more than the single pre-threshold holder."""
    from kafka_streams_one_to_many_join_spark.streaming.dedup import (
        segment_delta_transition,
    )

    arrivals = [(doc, k) for doc, k in enumerate(ks)]  # distinct docs
    # split into batches at the random cut points
    batches, cur = [], {}
    for (doc, k), cut in zip(arrivals, cuts):
        cur[doc] = k
        if cut:
            batches.append(cur)
            cur = {}
    if cur:
        batches.append(cur)

    state = (0, None, 0)
    totals: dict[int, list[int]] = {}
    for batch in batches:
        out, state = segment_delta_transition(*state, batch)
        for d, ds, dd in out:
            t = totals.setdefault(d, [0, 0])
            t[0] += ds
            t[1] += dd
        occ, holder_id, holder_k = state
        assert (holder_id is None) == (occ >= 2 or occ == 0)
        if holder_id is not None:
            assert occ == 1 and holder_k == 1

    total_occ = sum(k for _, k in arrivals)
    expected = {
        d: [k, k if total_occ >= 2 else 0] for d, k in arrivals
    }
    assert totals == expected


def _bpe_reference(texts: list[str]) -> dict[tuple[str, str], tuple[int, int]]:
    """Sequential BPE pair counting: corpus → word counts → weighted
    adjacent-pair totals + distinct-word support."""
    import re
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        wc.update(re.findall("[a-z0-9]+", t.lower()))
    pair_count: Counter = Counter()
    pair_words: dict = {}
    for w, c in wc.items():
        for i in range(len(w) - 1):
            p = (w[i], w[i + 1])
            pair_count[p] += c
            pair_words.setdefault(p, set()).add(w)
    return {p: (n, len(pair_words[p])) for p, n in pair_count.items()}


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab1 .", min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_bpe_pair_counts_matches_reference(spark, texts):
    """The vocabulary-bounded distributed formulation equals sequential
    BPE pair counting for ANY corpus (overlapping pairs, repeated words,
    empty/token-free documents)."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        bpe_pair_counts,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.left_sym, r.right_sym): (r.pair_count, r.n_words)
        for r in bpe_pair_counts(df).collect()
    }
    assert got == _bpe_reference(texts)


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="xy7 !", min_size=0, max_size=30),
        min_size=1,
        max_size=20,
    )
)
def test_hashed_quality_score_matches_reference(spark, texts):
    """The per-token md5 weight sum is exact: the distributed integer
    aggregation equals a sequential hashlib reference bit-for-bit, and
    every document (including token-free ones) keeps exactly one row."""
    import hashlib
    import re

    from kafka_streams_one_to_many_join_spark.functions.text import (
        hashed_quality_score,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.w_sum)
        for r in hashed_quality_score(df).collect()
    }
    for i, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        ref = sum(
            int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) for tok in toks
        )
        assert got[i] == (len(toks), ref), (i, t)
    assert len(got) == len(texts)


@given(
    arrivals=st.lists(st.integers(min_value=0, max_value=30), max_size=120),
    cuts=st.lists(st.booleans(), max_size=120),
    k=st.integers(min_value=1, max_value=12),
)
def test_streaming_topk_fold_split_invariance(arrivals, cuts, k):
    """The streaming ANN's top-k fold: for ANY candidate arrival order
    split ANY way into micro-batches (with the state truncated to k
    between batches, exactly as the operator persists it), the final
    ranking must equal the one-shot top-k over all candidates —
    truncation never loses a future top-k member because a vector's
    similarity is an immutable function of the vector (modeled here as a
    deterministic sim per vec_id, which is what makes duplicate
    arrivals — replays — harmless)."""
    import math

    import pandas as pd

    from kafka_streams_one_to_many_join_spark.streaming.similarity import (
        _fold_topk,
    )

    sim_of = lambda v: round(math.sin(v * 1.7), 6)  # noqa: E731
    rounded = [(v, sim_of(v)) for v in arrivals]
    expected = sorted(
        {v: s for v, s in rounded}.items(), key=lambda vs: (-vs[1], vs[0])
    )[:k]

    batches, cur = [], []
    for item, cut in zip(rounded, list(cuts) + [False] * len(rounded)):
        cur.append(item)
        if cut:
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)

    top: dict = {}
    ranked = []
    for batch in batches:
        pdf = pd.DataFrame(batch, columns=["vec_id", "sim"])
        _, ranked = _fold_topk(top, [pdf], k)
        top = dict(ranked)  # persist exactly what the operator stores
    assert ranked == expected


def _cc_reference(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find ground truth: cluster_id = min node of the component.
    Union always re-roots the larger root under the smaller, so by
    induction every root IS its component's minimum."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((n, find(n)) for n in parent)


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=24,
    )
)
def test_near_dup_clusters_matches_union_find(spark, edges):
    """The iterative min-label propagation (the CC backbone of
    dedup_clusters / dedup_canonical / simhash_near_dup_clusters)
    equals union-find ground truth on ARBITRARY graphs — path chains
    (worst-case diameter for the round count), self-loops, duplicate
    and reversed edges, disconnected singletons included."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        near_dup_clusters,
    )

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = sorted(
        (r.doc_id, r.cluster_id) for r in near_dup_clusters(df).collect()
    )
    assert got == _cc_reference(edges)


def _winnow_reference(text: str, k: int = 8, window: int = 4) -> set[int]:
    """Straight-line python model of winnowing_fingerprints for one doc:
    same normalization, same md5-prefix gram hash, min per window,
    deduplicated."""
    import hashlib
    import re

    n = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", text.lower())).strip()
    if len(n) < k:
        return set()
    hashes = [
        int(hashlib.md5(n[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(n) - k + 1)
    ]
    if len(hashes) < window:
        return {min(hashes)}
    return {
        min(hashes[j : j + window]) for j in range(len(hashes) - window + 1)
    }


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c.x0", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    )
)
def test_winnowing_matches_reference(spark, texts):
    """The SQL-expression winnowing equals the sequential MOSS reference
    for ANY input — normalization edge cases (punctuation runs, multi-
    space, all-punct, short-of-k docs) included.  Equality implies both
    halves of the scheme's guarantee: every selected fingerprint is a
    window minimum (soundness) and every window contributes its minimum
    (coverage — the shared-substring detection property)."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        winnowing_fingerprints,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got: dict[int, set] = {}
    for r in winnowing_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add(r.fingerprint)
    want = {
        i: _winnow_reference(t)
        for i, t in enumerate(texts)
        if _winnow_reference(t)
    }
    assert got == want


def _simhash_reference(text: str) -> int:
    """Sequential model of simhash_buckets: distinct [a-z0-9]+ tokens of
    the lowered text, 60-bit md5-prefix token hashes, strict per-bit
    majority (ties -> 0)."""
    import hashlib
    import re

    toks = list(dict.fromkeys(re.findall("[a-z0-9]+", text.lower())))
    if not toks:
        return 0
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    sig = 0
    for b in range(60):
        if sum((h >> b) & 1 for h in hs) * 2 > len(hs):
            sig |= 1 << b
    return sig


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="Ab 1.x,Z0", min_size=0, max_size=50),
        min_size=1,
        max_size=6,
    )
)
def test_simhash_matches_reference_in_both_vote_modes(spark, texts):
    """Both vote implementations (codegen'd SQL aggregate and the
    Arrow-vectorized pandas twin) must equal the sequential reference
    bit-for-bit on ANY input — mixed case, punctuation, digits,
    token-free and empty docs included.  This is the signature every
    simhash dedup path (pairs, clusters, doc_profile) keys on."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        simhash_buckets,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = {i: _simhash_reference(t) for i, t in enumerate(texts)}
    for mode in ("expr", "pandas"):
        got = {
            r.doc_id: r.simhash
            for r in simhash_buckets(df, vote_mode=mode).collect()
        }
        assert got == want, mode


def _minhash_reference(
    texts: list[str],
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 11,
):
    """Sequential model of minhash_lsh_pairs: distinct word-3-gram
    shingles, 31-bit md5-prefix content hashes, affine-reseed minhash
    signature, banded candidates, exact-Jaccard verify."""
    import hashlib
    import re

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        MINHASH_P,
        minhash_coeffs,
    )

    a, b = minhash_coeffs(num_hashes, seed)
    rows = num_hashes // bands
    docs = {}
    for i, t in enumerate(texts):
        toks = re.findall("[a-z0-9]+", t.lower())
        if len(toks) < shingle_n:
            continue
        sh = {
            " ".join(toks[j : j + shingle_n])
            for j in range(len(toks) - shingle_n + 1)
        }
        hs = {
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MINHASH_P
            for s in sh
        }
        sig = [
            min((h * a[j] + b[j]) % MINHASH_P for h in hs)
            for j in range(num_hashes)
        ]
        docs[i] = (hs, sig)
    out = {}
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            ia, ib = ids[x], ids[y]
            ha, sa = docs[ia]
            hb, sb = docs[ib]
            if not any(
                sa[bd * rows : (bd + 1) * rows] == sb[bd * rows : (bd + 1) * rows]
                for bd in range(bands)
            ):
                continue
            jac = len(ha & hb) / len(ha | hb)
            if jac >= threshold:
                out[(ia, ib)] = jac
    return out


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40),
        min_size=2,
        max_size=8,
    )
)
def test_minhash_lsh_pairs_matches_reference(spark, texts):
    """The flagship fuzzy-dedup operator equals the sequential model on
    ANY corpus: exactly the pairs that share >=1 full band AND pass the
    exact-Jaccard threshold — no silent recall loss beyond the banding
    the contract declares, no false positives, shingle-free docs
    excluded.  (The small 'ab c' alphabet generates heavy shingle
    collisions — the hard case for the banding arithmetic.)"""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_pairs(df).collect()
    }
    want = _minhash_reference(texts)
    assert set(got) == set(want)
    for k, j in want.items():
        assert abs(got[k] - j) < 5e-7, k
