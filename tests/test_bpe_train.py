"""bpe_train (r13, VERDICT r12 item 2): the full BPE training loop on
top of bpe_merge_step's collapsed word-count design.

Three claims, each load-bearing:

1. the learned merge table hash-matches a sequential reference
   implementation (classic Sennrich greedy BPE over the same word
   counts, same argmax tiebreak) on the driver fixture corpus;
2. the corpus is scanned exactly ONCE across ALL merge iterations —
   every post-initial stage reads the materialized word-count frame,
   never the documents table (asserted via the plan-audit hook);
3. the greedy left-to-right merge fold agrees with the sequential model
   on repeated-symbol runs ("aaa" → [aa, a]) and cascades, and the
   unicode token mode trains on non-Latin words.
"""

from __future__ import annotations

import re

import pytest

from kafka_streams_one_to_many_join_spark import model as model_mod
from kafka_streams_one_to_many_join_spark.functions.text import bpe_train


def _seq_bpe(word_counts: dict[str, int], num_merges: int):
    """Sequential reference: classic BPE with greedy left-to-right merge
    application and (count desc, (left, right) lexicographic asc) argmax
    — UTF-8 binary string order equals code-point order, so Python tuple
    comparison mirrors Spark's orderBy exactly."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (left, right), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, cnt))
        merged = left + right
        for w, syms in vocab.items():
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == left and s == right:
                    acc[-1] = merged
                else:
                    acc.append(s)
            vocab[w] = acc
    return merges


def _spark_merges(df) -> list[tuple[int, str, str, int]]:
    return [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in df.orderBy("merge_rank").collect()
    ]


def test_bpe_train_matches_sequential_reference(spark, sf_dir):
    """The VERDICT's done-bar: the final merge table hash-matches the
    sequential reference on the fixture corpus."""
    import __spark_entry__ as entry_mod

    docs = entry_mod.load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", (t or "").lower()):
            counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 24)
    got = _spark_merges(bpe_train(docs, num_merges=24))
    assert got == expected
    assert len(got) == 24  # fixture vocab is rich enough to not dry up


def test_bpe_train_corpus_scanned_once(spark, sf_dir, monkeypatch):
    """The scale claim as a plan assertion: arm the materialize plan-audit
    sink and train — exactly the FIRST materialized stage may scan the
    corpus; every later stage's plan must be scan-free (it reads the
    checkpointed word-count frame)."""
    import __spark_entry__ as entry_mod

    sink: list = []
    monkeypatch.setattr(model_mod, "_PLAN_AUDIT_SINK", sink)
    docs = entry_mod.load_table(spark, sf_dir, "documents")
    bpe_train(docs, num_merges=9, materialize_every=4)
    assert len(sink) >= 3  # initial vocab + iterations 4 and 8
    plans = [df._jdf.queryExecution().optimizedPlan().toString() for df in sink]

    def scans(p: str) -> bool:
        return "parquet" in p.lower() or "FileScan" in p

    assert scans(plans[0])
    for p in plans[1:]:
        assert not scans(p), "a merge iteration re-read the corpus"


def test_bpe_train_greedy_run_semantics(spark):
    """Repeated-symbol runs are where naive merge application diverges
    from the classic greedy non-overlapping scan: 'aaaa' under merge
    (a,a) must become [aa, aa], 'aaa' must become [aa, a].  Sweep a
    run-heavy corpus against the sequential model."""
    corpus = ["aaaa aaa aa baab abab", "aaab bbba abba aab", "aaaa abab aaab"]
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], "doc_id int, text string")
    counts: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 8)
    got = _spark_merges(bpe_train(docs, num_merges=8, materialize_every=3))
    assert got == expected


def test_bpe_train_unicode_mode(spark):
    """Unicode token mode trains on non-Latin words; the sequential
    tokenizer for this fixture is whitespace split (texts contain only
    letters and single spaces, where [\\p{L}\\p{N}]+ degenerates to
    exactly that)."""
    corpus = ["снег снегопад снежный", "погода снег ветер", "погода ветер ветер"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id int, text string"
    )
    counts: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 6)
    got = _spark_merges(bpe_train(docs, num_merges=6, token_mode="unicode"))
    assert got == expected


def test_bpe_train_stops_when_pairs_dry_up(spark):
    """A single-character vocabulary has no adjacent pairs after every
    word collapses — the loop must stop early, not KeyError or loop."""
    docs = spark.createDataFrame([(1, "ab ab a b")], "doc_id int, text string")
    got = _spark_merges(bpe_train(docs, num_merges=10))
    # 'ab' is the only multi-symbol word: one merge then dry
    assert got == [(1, "a", "b", 2)]


def _seq_bpe_vocab(word_counts: dict[str, int], num_merges: int):
    """Sequential reference again, returning the END-of-training vocab
    state (word → symbol list) alongside the merges."""
    vocab = {w: list(w) for w in word_counts}
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, c in word_counts.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (left, right), _cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        for w, syms in vocab.items():
            acc: list[str] = []
            for s in syms:
                if acc and acc[-1] == left and s == right:
                    acc[-1] = merged
                else:
                    acc.append(s)
            vocab[w] = acc
    return vocab


def test_bpe_encode_reproduces_training_state(spark, sf_dir):
    """Encoding the training corpus with the learned merges must yield,
    per document, the concatenation of each word's END-of-training
    symbol sequence — and symbol concatenation must reconstruct the
    original token stream (losslessness)."""
    import __spark_entry__ as entry_mod
    from kafka_streams_one_to_many_join_spark.functions.text import bpe_encode

    docs = entry_mod.load_table(spark, sf_dir, "documents")
    merges_df = bpe_train(docs, num_merges=16)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    counts: dict[str, int] = {}
    tok = {}
    for did, t in texts.items():
        tok[did] = re.findall(r"[a-z0-9]+", (t or "").lower())
        for w in tok[did]:
            counts[w] = counts.get(w, 0) + 1
    vocab = _seq_bpe_vocab(counts, 16)
    got = {
        r.doc_id: (list(r.symbols), r.n_symbols)
        for r in bpe_encode(docs, merges_df).collect()
    }
    assert set(got) == set(texts)  # every doc keeps its row
    for did, words in tok.items():
        expected = [s for w in words for s in vocab[w]]
        assert got[did][0] == expected, did
        assert got[did][1] == len(expected)
        assert "".join(got[did][0]) == "".join(words)  # lossless


def test_bpe_encode_empty_and_unseen(spark):
    """Docs with no tokens keep a row with symbols = []; words never
    seen in training encode with whatever merges apply (including
    none)."""
    from kafka_streams_one_to_many_join_spark.functions.text import bpe_encode

    train = spark.createDataFrame([(1, "ab ab abc")], "doc_id int, text string")
    merges = bpe_train(train, num_merges=2)  # learns (a,b) then (ab,c)
    test = spark.createDataFrame(
        [(1, "ab abc xyz"), (2, ""), (3, "...")], "doc_id int, text string"
    )
    got = {r.doc_id: list(r.symbols) for r in bpe_encode(test, merges).collect()}
    assert got[1] == ["ab", "abc", "x", "y", "z"]
    assert got[2] == [] and got[3] == []


def test_bpe_random_corpus_sweep_matches_sequential(spark):
    """A seeded 300-word random corpus over a 2-letter alphabet — the
    collision-heavy regime where greedy-scan bugs live (every word is a
    run pattern).  Training through the REAL operator (no re-derived
    fold expression that could drift) must match the sequential
    reference merge-for-merge, which transitively verifies the Spark
    fold's application to every vocabulary word at every rank; encoding
    must then reproduce the training-end state per word."""
    import random

    from kafka_streams_one_to_many_join_spark.functions.text import bpe_encode

    rng = random.Random(13)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 10)))
        for _ in range(300)
    ]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 6)
    merges_df = bpe_train(docs, num_merges=6, materialize_every=2)
    assert _spark_merges(merges_df) == expected
    vocab = _seq_bpe_vocab(counts, 6)
    got = {r.doc_id: list(r.symbols) for r in bpe_encode(docs, merges_df).collect()}
    for i, w in enumerate(words):
        assert got[i] == vocab[w], (w, got[i])


@pytest.mark.parametrize("k", [2, 4, 8])
def test_bpe_train_speculative_matches_sequential(spark, sf_dir, k):
    """r15 (VERDICT r14 item 6): speculate=K batches up to K
    symbol-disjoint merges per Spark job with driver-side argmax
    validation, so the merge table must be SEQUENTIAL-EXACT — asserted
    against speculate=1 on the driver fixture corpus."""
    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents")
    seq = _spark_merges(bpe_train(docs, num_merges=16))
    spec = _spark_merges(bpe_train(docs, num_merges=16, speculate=k))
    assert spec == seq
    assert len(seq) == 16


def test_bpe_train_speculative_collision_heavy(spark):
    """The seeded 2-letter random corpus (every word a run pattern) is
    where speculative validation MUST truncate rounds — merges interact
    constantly (each merge mints a symbol whose new pairs outrank the
    speculated next-best).  The accepted-prefix fallback must still
    reproduce the sequential reference merge-for-merge."""
    import random

    rng = random.Random(13)
    words = [
        "".join(rng.choice("ab") for _ in range(rng.randint(1, 10)))
        for _ in range(300)
    ]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id int, text string"
    )
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 6)
    got = _spark_merges(bpe_train(docs, num_merges=6, speculate=4))
    assert got == expected


def test_bpe_train_pair_state_cap_raises(spark):
    """r15 (VERDICT r14 item 5): the driver-resident pair dict refuses
    to grow past max_pair_state with a clear error instead of OOM-ing
    the driver mid-train."""
    docs = spark.createDataFrame(
        [(1, "abcdefgh abcdefgh stuvwxyz")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="max_pair_state"):
        bpe_train(docs, num_merges=2, max_pair_state=3)
    # an adequate cap trains normally
    assert bpe_train(docs, num_merges=2, max_pair_state=10_000).count() == 2


def test_aimd_floor_holds_under_sustained_misses():
    """ADVICE r15: a k_round==1 round trivially 'fully accepts' its only
    candidate, so it must NOT count as a speculation hit — under
    sustained misses the chain holds the k=1 floor for 8 rounds, then
    probes k=2 once, instead of alternating 1,2,1,2.  Pure simulation
    of the AIMD state machine (no Spark)."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        _aimd_next_k,
        _aimd_update,
    )

    speculate = 8
    cur_k, floor = min(2, speculate), 0
    ks = []
    for _ in range(30):
        cur_k, floor = _aimd_next_k(cur_k, floor, speculate)
        k_round = cur_k
        ks.append(k_round)
        accepted = 1  # sustained speculation misses: only the argmax lands
        cur_k, floor = _aimd_update(cur_k, floor, accepted, k_round, speculate)
    # round 1 speculates k=2 (initial), truncates to the floor (that
    # truncation counts as floor round 1), holds k=1 through 8 counted
    # floor rounds, probes k=2 on the next, and repeats — never the old
    # 1,2,1,2 alternation.
    assert ks[0] == 2
    assert ks[1:8] == [1] * 7, ks
    assert ks[8] == 2, ks
    assert ks[9:16] == [1] * 7, ks
    assert ks[16] == 2, ks
    assert 2 not in ks[17:24], ks


def test_aimd_doubles_only_on_real_speculation():
    """Full acceptance doubles the chain only when the round speculated
    (k_round > 1); growth is still exponential up to the cap."""
    from kafka_streams_one_to_many_join_spark.functions.text import _aimd_update

    # k_round=1 full acceptance: stays at the floor, counts floor rounds
    assert _aimd_update(1, 3, 1, 1, 8) == (1, 4)
    # real speculation, fully accepted: 2 -> 4 -> 8 (capped at speculate)
    assert _aimd_update(2, 0, 2, 2, 8) == (4, 0)
    assert _aimd_update(4, 0, 4, 4, 8) == (8, 0)
    assert _aimd_update(8, 0, 8, 8, 8) == (8, 0)
    # truncation drops to the accepted prefix; floor counting starts at 1
    assert _aimd_update(8, 0, 3, 8, 8) == (3, 0)
    assert _aimd_update(3, 0, 1, 3, 8) == (1, 1)
    # zero accepted (possible when the argmax itself shifted) floors too
    assert _aimd_update(2, 0, 0, 2, 8) == (1, 1)


def _merge_rows(df):
    return [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in df.orderBy("merge_rank").collect()
    ]


def test_bpe_train_resume_matches_uninterrupted(spark, sf_dir, tmp_path):
    """r16 (VERDICT r15 item 3): a killed train resumed from its newest
    checkpoint produces a merge table bit-identical to the
    uninterrupted one — on the real fixture, across a mid-cadence kill
    (emulated by stopping at a rank past the last checkpoint)."""
    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = _merge_rows(bpe_train(docs, num_merges=24))
    ck = str(tmp_path / "bpe_ck")
    # "day 1": the train dies at merge 17 (checkpoints at 8 and 16)
    part1 = bpe_train(docs, num_merges=17, checkpoint_dir=ck, checkpoint_every=8)
    assert part1.count() == 17
    # "day 2": resume — continues from ckpt_16, never re-scans the corpus
    resumed = bpe_train(docs, num_merges=24, checkpoint_dir=ck, checkpoint_every=8)
    assert _merge_rows(resumed) == expected


def test_bpe_train_resume_collision_heavy_and_speculative(spark, tmp_path):
    """The seeded collision-heavy corpus (dense argmax ties) resumed
    mid-train under SPECULATION still hash-matches the sequential
    uninterrupted table — resume and speculation compose."""
    import random

    rng = random.Random(17)
    words = []
    for _ in range(300):
        n = rng.randint(2, 6)
        words.append("".join(rng.choice("abc") for _ in range(n)))
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string"
    )
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    expected = _seq_bpe(counts, 12)
    ck = str(tmp_path / "bpe_ck2")
    bpe_train(docs, num_merges=7, checkpoint_dir=ck, checkpoint_every=3, speculate=4)
    resumed = bpe_train(
        docs, num_merges=12, checkpoint_dir=ck, checkpoint_every=3, speculate=4
    )
    assert _merge_rows(resumed) == expected


def test_bpe_train_resume_skips_invalid_checkpoint(spark, sf_dir, tmp_path):
    """A checkpoint killed mid-write (no manifest — the manifest is
    renamed into place LAST) is skipped; resume falls back to the
    previous valid cadence point and still converges to the
    uninterrupted table.  token_mode mismatches refuse to resume."""
    import os

    import pytest

    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    expected = _merge_rows(bpe_train(docs, num_merges=12))
    ck = str(tmp_path / "bpe_ck3")
    bpe_train(docs, num_merges=8, checkpoint_dir=ck, checkpoint_every=4)
    # simulate the kill: ckpt_8 lost its manifest mid-write
    os.remove(os.path.join(ck, "ckpt_00000008", "_manifest.json"))
    resumed = bpe_train(docs, num_merges=12, checkpoint_dir=ck, checkpoint_every=4)
    assert _merge_rows(resumed) == expected
    with pytest.raises(ValueError, match="token_mode"):
        bpe_train(docs, num_merges=12, checkpoint_dir=ck, token_mode="unicode")
    # a finished train re-requested at a smaller num_merges returns the
    # stored prefix without any Spark work on the corpus
    prefix = bpe_train(docs, num_merges=3, checkpoint_dir=ck, checkpoint_every=4)
    assert _merge_rows(prefix) == expected[:3]


def test_bpe_train_spill_crosses_cap_hash_identical(spark):
    """r16 (VERDICT r15 item 7): a train whose pair state crosses
    max_pair_state with on_state_overflow='spill' COMPLETES via the
    Spark-side pair aggregate with a merge table hash-identical to the
    unbounded train — both when the cap trips mid-train and when the
    seed itself breaches it."""
    docs = spark.createDataFrame(
        [(1, "abcdefgh abcdefgh abcd abcd efgh stuvwxyz stuv wxyz ab cd")],
        "doc_id int, text string",
    )
    expected = _merge_rows(bpe_train(docs, num_merges=8))
    # seed has ~20 distinct pairs; cap 25 trips once merges mint symbols
    mid = bpe_train(
        docs, num_merges=8, max_pair_state=25, on_state_overflow="spill"
    )
    assert _merge_rows(mid) == expected
    # cap below the seed: spills before the first merge
    pre = bpe_train(
        docs, num_merges=8, max_pair_state=3, on_state_overflow="spill"
    )
    assert _merge_rows(pre) == expected
    # raise mode unchanged
    with pytest.raises(ValueError, match="max_pair_state"):
        bpe_train(docs, num_merges=8, max_pair_state=3)
    with pytest.raises(ValueError, match="on_state_overflow"):
        bpe_train(docs, num_merges=2, on_state_overflow="bogus")


def test_bpe_train_spill_composes_with_speculation_and_resume(spark, tmp_path):
    """Speculation falls back to the sequential Spark-state loop at the
    spill boundary; a checkpoint taken AFTER the spill records
    state_kind='spark' and resumes into the Spark-state loop — the
    composed table still equals the unbounded sequential train."""
    docs = spark.createDataFrame(
        [(1, "abcdefgh abcdefgh abcd abcd efgh stuvwxyz stuv wxyz ab cd")],
        "doc_id int, text string",
    )
    expected = _merge_rows(bpe_train(docs, num_merges=10))
    got = bpe_train(
        docs, num_merges=10, max_pair_state=25, on_state_overflow="spill",
        speculate=4,
    )
    assert _merge_rows(got) == expected
    ck = str(tmp_path / "bpe_ck4")
    bpe_train(
        docs, num_merges=6, max_pair_state=3, on_state_overflow="spill",
        checkpoint_dir=ck, checkpoint_every=2,
    )
    import json
    import os

    mans = sorted(
        json.load(open(os.path.join(ck, d, "_manifest.json")))["state_kind"]
        for d in os.listdir(ck)
        if os.path.exists(os.path.join(ck, d, "_manifest.json"))
    )
    assert set(mans) == {"spark"}
    resumed = bpe_train(
        docs, num_merges=10, max_pair_state=3, on_state_overflow="spill",
        checkpoint_dir=ck, checkpoint_every=2,
    )
    assert _merge_rows(resumed) == expected
