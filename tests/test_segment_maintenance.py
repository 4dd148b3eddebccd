"""Mutable-corpus maintenance of the segment-dedup state (r15, VERDICT
r14 item 1 — the segment twin of r14's band-index maintenance).

The grow-only segment state bakes "counts never decrease" into the
probe, so a frozen document whose duplicate partner is deleted keeps
paying a boilerplate penalty for text that no longer exists.
``segment_index_apply`` retracts deleted/re-ingested docs' (doc_id,
seg_h) rows and decrements the persisted (seg_h, occ) counts.

Claims proven here:

1. scoring the maintained state equals the full recompute on the
   corrected corpus — BOTH directions: dup_frac increase (an upsert
   creates a duplicate) and DECREASE (a delete removes the only
   partner — the case the grow-only design structurally excludes);
2. a doc_id in both upserts and delete_ids ends DELETED (the band
   operator's precedence, ADVICE r14 medium applied from birth);
3. the maintained counts are row-equal to a recount of the maintained
   pairs (occ→0 rows dropped, brand-new segments inserted);
4. maintenance is scan-only on the state (no SortMergeJoin, no
   full-outer join on any executed plan) and composes with the
   bucketed layout + the incremental probe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from kafka_streams_one_to_many_join_spark.functions.dedup import (
    _segment_fractions,
    segment_dedup_incremental,
    segment_index_apply,
    segment_pairs,
)
from kafka_streams_one_to_many_join_spark.model import load_table


def _scores(pairs, counts) -> dict:
    return {
        r.doc_id: tuple(r)
        for r in _segment_fractions(pairs, counts).collect()
    }


def _counts_of(pairs):
    return pairs.groupBy("seg_h").agg(F.count(F.lit(1)).alias("occ"))


def test_segment_index_apply_differential(spark, sf_dir):
    """Night-2 re-ingests corrected docs and deletes others: scoring the
    MAINTAINED (pairs, counts) state must equal the full recompute on
    the corrected corpus, row-for-row — and differ from scoring the
    stale grow-only state (the counterexample that justifies the
    operator)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    pairs = segment_pairs(frozen)
    counts = _counts_of(pairs)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    pairs2, counts2 = segment_index_apply(
        pairs, counts, upserts=corrected, delete_ids=deletes
    )
    corrected_frozen = (
        frozen.filter(F.col("doc_id") % 10 != 9)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 6,
                F.concat(F.col("text"), F.lit(" corrected edition")),
            ).otherwise(F.col("text")),
        )
    )
    got = _scores(pairs2, counts2)
    expected = {
        r.doc_id: tuple(r)
        for r in entry_mod._segment_dedup(corrected_frozen).collect()
    }
    assert got == expected
    # the maintained pairs are row-equal to a fresh segmentation
    fresh = segment_pairs(corrected_frozen)
    rows = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.seg_h) for r in df.collect()
    )
    assert rows(pairs2) == rows(fresh)
    # and the stale state scores differently (retraction changed answers)
    stale = _scores(pairs, counts)
    changed = {d for d in got if d in stale and got[d] != stale[d]}
    assert changed, "fixture must exercise retraction/correction"


def test_segment_index_apply_dup_frac_decreases_on_delete(spark):
    """The structurally-new case: doc A's only duplicate partner B is
    deleted — A's dup_frac must DECREASE (1.0 → 0.0).  The grow-only
    state can never produce this row; asserted on both states."""
    text = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally unrelated words appear here now then")],
        "doc_id int, text string",
    )
    pairs = segment_pairs(docs)
    counts = _counts_of(pairs)
    before = _scores(pairs, counts)
    assert before[1][3] == 1.0 and before[1][4] is False  # dup_frac, keep
    pairs2, counts2 = segment_index_apply(
        pairs, counts, delete_ids=spark.createDataFrame([(2,)], "doc_id int")
    )
    after = _scores(pairs2, counts2)
    assert set(after) == {1, 3}
    assert after[1][3] == 0.0 and after[1][4] is True
    # differential vs full recompute on the corrected corpus
    expected = _scores(
        segment_pairs(docs.filter("doc_id != 2")),
        _counts_of(segment_pairs(docs.filter("doc_id != 2"))),
    )
    assert after == expected


def test_segment_index_apply_delete_wins_over_upsert(spark):
    """A doc corrected AND deleted in the same nightly feed ends deleted
    — its fresh rows must not be re-inserted, and the counts must not
    carry its fresh segments."""
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id int, text string",
    )
    pairs = segment_pairs(docs)
    counts = _counts_of(pairs)
    upserts = spark.createDataFrame(
        [(2, "corrected text that is then retracted same day here now")],
        "doc_id int, text string",
    )
    deletes = spark.createDataFrame([(2,)], "doc_id int")
    pairs2, counts2 = segment_index_apply(
        pairs, counts, upserts=upserts, delete_ids=deletes
    )
    assert {r.doc_id for r in pairs2.select("doc_id").distinct().collect()} == {1}
    expected_counts = {
        (r.seg_h, r.occ)
        for r in _counts_of(segment_pairs(docs.filter("doc_id = 1"))).collect()
    }
    assert {(r.seg_h, r.occ) for r in counts2.collect()} == expected_counts


def test_segment_index_apply_counts_equal_recount(spark, sf_dir):
    """The maintained counts must be ROW-EQUAL to a recount of the
    maintained pairs: occ→0 rows dropped, decremented rows exact,
    brand-new segments (from upsert text the corpus never saw) present
    with their fresh counts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    pairs = segment_pairs(frozen)
    counts = _counts_of(pairs)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" brand new segment words never seen before anywhere else ok"),
        ),
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    pairs2, counts2 = segment_index_apply(
        pairs, counts, upserts=corrected, delete_ids=deletes
    )
    got = {(r.seg_h, r.occ) for r in counts2.collect()}
    expected = {(r.seg_h, r.occ) for r in _counts_of(pairs2).collect()}
    assert got == expected
    assert 0 not in {o for _, o in got}


def test_segment_index_apply_plan_scan_only(spark, sf_dir):
    """Scale fence: maintenance must not shuffle or full-outer-join any
    state-sized input — every join on both output plans is broadcast
    (the retraction anti-join, the count-delta left join, the
    new-segment semi/anti restriction)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    pairs = segment_pairs(frozen)
    counts = _counts_of(pairs)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    pairs2, counts2 = segment_index_apply(
        pairs, counts, upserts=corrected, delete_ids=deletes
    )
    for f in (pairs2, counts2):
        plan = f._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan, plan
        assert "FullOuter" not in plan, plan
        assert "BroadcastHashJoin" in plan


def test_segment_index_apply_composes_with_probe(spark, sf_dir):
    """The nightly composition the operator exists for: maintain, then
    probe the night's shard — the probe's rows must equal the full
    recompute on the corrected FULL corpus for exactly its doc set
    (shard docs + affected frozen docs)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    pairs = segment_pairs(frozen)
    counts = _counts_of(pairs)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    pairs2, counts2 = segment_index_apply(
        pairs, counts, upserts=corrected, delete_ids=deletes
    )
    inc = {
        r.doc_id: tuple(r)
        for r in segment_dedup_incremental(
            shard, pairs2, seg_counts=counts2
        ).collect()
    }
    corrected_corpus = docs.filter(F.col("doc_id") % 10 != 9).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 6,
            F.concat(F.col("text"), F.lit(" corrected edition")),
        ).otherwise(F.col("text")),
    )
    full = {
        r.doc_id: tuple(r)
        for r in entry_mod._segment_dedup(corrected_corpus).collect()
    }
    for did, row in inc.items():
        assert row == full[did], did
    shard_ids = {d for d in full if d % 10 == 3}
    assert shard_ids <= set(inc)


def test_streamed_additions_then_maintenance_then_probe(spark, sf_dir, tmp_path):
    """VERDICT r14 item 7: the stream-vs-maintenance DIVISION composed
    end-to-end and pinned — intra-day additions stream into the
    persisted band index one micro-batch at a time (foreachBatch
    appending via minhash_band_index_apply upserts), THEN the nightly
    maintenance applies corrections + deletes, THEN the next shard
    probes the maintained index.  The composed pair set must equal the
    full recompute on the final corpus (frozen ∪ streamed arrivals,
    corrections applied, deletions gone) restricted to shard-touching
    pairs — previously implied by the per-operator tests, asserted
    nowhere."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index,
        minhash_band_index_apply,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 < 5)        # night-0 corpus
    arrivals = docs.filter(
        (F.col("doc_id") % 10 >= 5) & (F.col("doc_id") % 10 <= 7)
    )                                                      # intra-day stream
    shard = docs.filter(F.col("doc_id") % 10 == 8)         # next-day probe
    # persisted night-0 index
    idx_dir = str(tmp_path / "idx_v0")
    minhash_band_index(frozen).write.mode("overwrite").parquet(idx_dir)
    # the index's parquet round trip keeps the stamp; batch the arrivals
    # as one file per (doc_id % 3) slice → 3 micro-batches
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    for i in range(3):
        arrivals.filter(F.col("doc_id") % 3 == i).write.mode(
            "append"
        ).parquet(in_dir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    versions = {"cur": idx_dir, "n": 0}

    def ingest(bdf, bid):
        if bdf.isEmpty():
            return
        cur = spark.read.parquet(versions["cur"])
        nxt = str(tmp_path / f"idx_v{versions['n'] + 1}")
        minhash_band_index_apply(cur, upserts=bdf).write.mode(
            "overwrite"
        ).parquet(nxt)
        versions["cur"], versions["n"] = nxt, versions["n"] + 1

    q = stream.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", ckpt
    ).start()
    q.processAllAvailable()
    q.stop()
    assert versions["n"] >= 2, "arrivals must span multiple micro-batches"
    streamed_idx = spark.read.parquet(versions["cur"])
    # nightly maintenance: corrections (%10 == 6, an arrival slice) and
    # deletions (%10 == 4, a frozen slice)
    corrected = docs.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = docs.filter(F.col("doc_id") % 10 == 4).select("doc_id")
    maintained = minhash_band_index_apply(
        streamed_idx, upserts=corrected, delete_ids=deletes
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs_incremental(
            shard, maintained, threshold=0.5
        ).collect()
    }
    final_corpus = (
        docs.filter((F.col("doc_id") % 10 <= 8) & (F.col("doc_id") % 10 != 4))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 6,
                F.concat(F.col("text"), F.lit(" corrected edition")),
            ).otherwise(F.col("text")),
        )
    )
    expected = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(final_corpus, threshold=0.5)
        .filter("doc_a % 10 = 8 OR doc_b % 10 = 8")
        .collect()
    }
    assert got == expected
    assert got, "fixture must have shard-touching pairs"


def test_streamed_segment_additions_then_maintenance_then_probe(
    spark, sf_dir, tmp_path
):
    """The segment-state face of the stream-vs-maintenance division
    (the band-index twin above): intra-day arrivals stream into the
    persisted (doc_segs, seg_counts) state one micro-batch at a time
    (foreachBatch upserts via segment_index_apply), THEN the nightly
    maintenance applies corrections + deletes, THEN the next shard
    probes — the probe's rows must equal the full recompute on the
    final corpus for exactly its doc set."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        segment_dedup_incremental,
        segment_index_apply,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 < 5)
    arrivals = docs.filter(
        (F.col("doc_id") % 10 >= 5) & (F.col("doc_id") % 10 <= 7)
    )
    shard = docs.filter(F.col("doc_id") % 10 == 8)
    base = str(tmp_path / "seg_v0")
    p0 = segment_pairs(frozen)
    p0.write.mode("overwrite").parquet(f"{base}_pairs")
    _counts_of(spark.read.parquet(f"{base}_pairs")).write.mode(
        "overwrite"
    ).parquet(f"{base}_occ")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    for i in range(3):
        arrivals.filter(F.col("doc_id") % 3 == i).write.mode(
            "append"
        ).parquet(in_dir)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    state = {"cur": base, "n": 0}

    def ingest(bdf, bid):
        if bdf.isEmpty():
            return
        cur_pairs = spark.read.parquet(f"{state['cur']}_pairs")
        cur_counts = spark.read.parquet(f"{state['cur']}_occ")
        p2, c2 = segment_index_apply(cur_pairs, cur_counts, upserts=bdf)
        nxt = str(tmp_path / f"seg_v{state['n'] + 1}")
        p2.write.mode("overwrite").parquet(f"{nxt}_pairs")
        c2.write.mode("overwrite").parquet(f"{nxt}_occ")
        state["cur"], state["n"] = nxt, state["n"] + 1

    q = stream.writeStream.foreachBatch(ingest).option(
        "checkpointLocation", ckpt
    ).start()
    q.processAllAvailable()
    q.stop()
    assert state["n"] >= 2, "arrivals must span multiple micro-batches"
    pairs_s = spark.read.parquet(f"{state['cur']}_pairs")
    counts_s = spark.read.parquet(f"{state['cur']}_occ")
    corrected = docs.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = docs.filter(F.col("doc_id") % 10 == 4).select("doc_id")
    pairs_m, counts_m = segment_index_apply(
        pairs_s, counts_s, upserts=corrected, delete_ids=deletes
    )
    inc = {
        r.doc_id: tuple(r)
        for r in segment_dedup_incremental(
            shard, pairs_m, seg_counts=counts_m
        ).collect()
    }
    final_corpus = (
        docs.filter((F.col("doc_id") % 10 <= 8) & (F.col("doc_id") % 10 != 4))
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 6,
                F.concat(F.col("text"), F.lit(" corrected edition")),
            ).otherwise(F.col("text")),
        )
    )
    full = {
        r.doc_id: tuple(r)
        for r in entry_mod._segment_dedup(final_corpus).collect()
    }
    for did, row in inc.items():
        assert row == full[did], did
    shard_ids = {d for d in full if d % 10 == 8}
    assert shard_ids <= set(inc)


def test_segment_index_apply_delete_ids_contract(spark):
    """delete_ids must be one column or carry doc_id (the band
    operator's contract, ADVICE r14 low applied from birth)."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "one two three four five six seven eight nine ten")],
        "doc_id int, text string",
    )
    pairs = segment_pairs(docs)
    with pytest.raises(ValueError, match="delete_ids"):
        segment_index_apply(
            pairs,
            delete_ids=spark.createDataFrame(
                [(9, 1)], "other_id int, something int"
            ),
        )
    out, none_counts = segment_index_apply(
        pairs,
        delete_ids=spark.createDataFrame(
            [("x", 1)], "text string, doc_id int"
        ),
    )
    assert none_counts is None
    assert out.count() == 0
