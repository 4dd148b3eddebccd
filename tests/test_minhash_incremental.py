"""Incremental corpus-growth MinHash dedup (r13, VERDICT r12 item 6).

The nightly-ingest shape: the frozen corpus's LSH band index
(``minhash_band_index``) is persisted once; each new shard is deduped
with ``minhash_lsh_pairs_incremental`` — new-vs-frozen candidates via an
equi-join against the index, new-vs-new via the full pipeline's
in-bucket expansion, both exact-Jaccard-verified from the carried
shingle-hash sets.

Claims proven here:

1. the incremental pair set EQUALS the full-recompute pair set
   restricted to pairs touching the shard (the roster query
   ``minhash_lsh_incremental`` additionally oracle-pins this against
   the restricted full-pair SQL in test_oracle_parity);
2. persisting the index bucketed on ``bsig_h`` makes the probe read it
   SHUFFLE-FREE — one fewer exchange than the identical probe against a
   plain index, values identical (the pay-the-shuffle-once layout from
   sources/bucketed.py applied to the dedup index).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from kafka_streams_one_to_many_join_spark import plans
from kafka_streams_one_to_many_join_spark.functions.dedup import (
    minhash_band_index,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    with_bsig_hash,
)
from kafka_streams_one_to_many_join_spark.model import load_table


def _pairs(df) -> set[tuple]:
    return {(r.doc_a, r.doc_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_restricted_full(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    full = minhash_lsh_pairs(docs, threshold=0.5)
    restricted = _pairs(full.filter("doc_a % 10 = 7 OR doc_b % 10 = 7"))
    frozen = docs.filter(F.col("doc_id") % 10 != 7)
    shard = docs.filter(F.col("doc_id") % 10 == 7)
    index = minhash_band_index(frozen)
    inc = _pairs(minhash_lsh_pairs_incremental(shard, index, threshold=0.5))
    assert inc == restricted
    assert inc  # the fixture corpus has near-dups touching the shard


def test_incremental_shard_without_index_overlap(spark, sf_dir):
    """A shard of entirely novel docs yields only new-new pairs; a shard
    with no internal dups and no frozen near-dup yields none.  Sanity on
    an engineered corpus where the expectation is closed-form."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "one two three four five six seven eight"),
        (11, "alpha beta gamma delta epsilon zeta eta kappa"),
        (12, "totally different content with no overlap here at all"),
        (13, "one two three four five six seven nine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    frozen = docs.filter("doc_id < 10")
    shard = docs.filter("doc_id >= 10")
    inc = minhash_lsh_pairs_incremental(
        shard, minhash_band_index(frozen), threshold=0.4
    )
    got = {(r.doc_a, r.doc_b) for r in inc.collect()}
    # doc 11 near-dups BOTH frozen 1 and 2; doc 13 near-dups frozen 3;
    # doc 12 pairs with nothing; no shard-internal pairs
    assert got == {(1, 11), (2, 11), (3, 13)}
    # full-recompute restriction agrees
    full = minhash_lsh_pairs(docs, threshold=0.4)
    rest = {
        (r.doc_a, r.doc_b)
        for r in full.filter("doc_a >= 10 OR doc_b >= 10").collect()
    }
    assert got == rest


def test_bucketed_index_probe_is_shuffle_free(spark, sf_dir, tmp_path):
    """Persist the frozen index bucketed on bsig_h: the probe join must
    read it without an exchange — exactly one shuffle fewer than the
    identical probe against the same index stored plain — and produce
    identical pairs."""
    from kafka_streams_one_to_many_join_spark.sources.bucketed import (
        BUCKETED_READ_CONFS,
        SUBSET_KEY_JOIN_CONFS,
        bucket_spec,
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents")
    frozen = docs.filter(F.col("doc_id") % 10 != 7)
    shard = docs.filter(F.col("doc_id") % 10 == 7)
    index = with_bsig_hash(minhash_band_index(frozen))
    confs = {**BUCKETED_READ_CONFS, **SUBSET_KEY_JOIN_CONFS}
    saved = {k: spark.conf.get(k, None) for k in confs}
    saved["spark.sql.autoBroadcastJoinThreshold"] = spark.conf.get(
        "spark.sql.autoBroadcastJoinThreshold"
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # broadcast would hide the exchange difference the test pins
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(
            index, "mh_idx_bk", 8, "bsig_h", path=str(tmp_path / "idx")
        )
        assert bucket_spec(spark, "mh_idx_bk") == (8, ["bsig_h"])
        index.write.mode("overwrite").option(
            "path", str(tmp_path / "idx_plain")
        ).saveAsTable("mh_idx_plain")
        probe_bk = minhash_lsh_pairs_incremental(
            shard, spark.table("mh_idx_bk"), threshold=0.5
        )
        probe_plain = minhash_lsh_pairs_incremental(
            shard, spark.table("mh_idx_plain"), threshold=0.5
        )
        n_bk = plans.count_shuffles(probe_bk)
        n_plain = plans.count_shuffles(probe_plain)
        assert n_bk == n_plain - 1, plans.formatted_plan(probe_bk)
        assert _pairs(probe_bk) == _pairs(probe_plain)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for t in ("mh_idx_bk", "mh_idx_plain"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_events_hourly_consolidation_carries_both_grains(spark, sf_dir):
    """The r13 consolidation funding the roster slot: events_hourly must
    still pin every original column of BOTH constituent queries — the
    hourly windowed rows (NULL-ts excluded) and the per-type stats rows
    over ALL events (the former event_type_stats semantics)."""
    df = entry_mod.queries()["events_hourly"](spark, sf_dir)
    rows = df.collect()
    hourly = [r for r in rows if r.grain == "hourly"]
    per_type = [r for r in rows if r.grain == "type"]
    assert hourly and per_type
    ev = load_table(spark, sf_dir, "events")
    assert sum(r.n_events for r in per_type) == ev.count()
    assert sum(r.n_events for r in hourly) == ev.filter("ts IS NOT NULL").count()
    for r in per_type:
        assert r.hour is None and r.stddev_value is not None
    for r in hourly:
        assert r.hour is not None and r.median_value is None


def test_index_evolution_across_two_nights(spark, sf_dir):
    """The full nightly cycle: probe shard A against the frozen index,
    APPEND A's band rows to the index (a unionByName — the index is its
    own maintenance operation), then probe shard B against frozen ∪ A.
    Night-2 pairs must equal the full recompute over (frozen ∪ A ∪ B)
    restricted to pairs touching B — including B-vs-A pairs that exist
    in neither night-1 output nor the original index."""
    docs = load_table(spark, sf_dir, "documents")
    frozen = docs.filter(F.col("doc_id") % 10 < 7)
    shard_a = docs.filter(F.col("doc_id") % 10 == 7)
    shard_b = docs.filter(F.col("doc_id") % 10 > 7)
    index = minhash_band_index(frozen)

    night1 = _pairs(minhash_lsh_pairs_incremental(shard_a, index, threshold=0.5))
    full = minhash_lsh_pairs(docs.filter("doc_id % 10 <= 7"), threshold=0.5)
    assert night1 == _pairs(full.filter("doc_a % 10 = 7 OR doc_b % 10 = 7"))

    evolved = index.unionByName(minhash_band_index(shard_a))
    night2 = _pairs(minhash_lsh_pairs_incremental(shard_b, evolved, threshold=0.5))
    full_all = minhash_lsh_pairs(docs, threshold=0.5)
    expected = _pairs(full_all.filter("doc_a % 10 > 7 OR doc_b % 10 > 7"))
    assert night2 == expected
    # and at least one night-2 pair touches shard A (the evolution is real)
    assert any(a % 10 == 7 or b % 10 == 7 for a, b, _ in night2)


def test_segment_dedup_incremental_with_retroactive_updates(spark, sf_dir):
    """The batch face of retroactive segment dedup: scoring a new shard
    against the frozen corpus's persisted segment index must (a) score
    every shard doc exactly as the full recompute does, and (b) emit
    updated rows for exactly the frozen docs whose duplicated fraction
    the shard changed (a frozen segment crossing occ 1 → ≥2) — no more,
    no fewer — each equal to its full-recompute row."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        segment_dedup_incremental,
        segment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    frozen_docs = docs.filter(F.col("doc_id") % 10 < 8)
    shard = docs.filter(F.col("doc_id") % 10 >= 8)
    full = {r.doc_id: tuple(r) for r in entry_mod._segment_dedup(docs).collect()}
    frozen_only = {
        r.doc_id: tuple(r)
        for r in entry_mod._segment_dedup(frozen_docs).collect()
    }
    inc = {
        r.doc_id: tuple(r)
        for r in segment_dedup_incremental(shard, segment_pairs(frozen_docs)).collect()
    }
    for did, row in inc.items():
        assert row == full[did], did
    shard_scored = {d for d in full if d % 10 >= 8}
    assert shard_scored <= set(inc)
    affected = set(inc) - shard_scored
    changed = {d for d in frozen_only if full[d] != frozen_only[d]}
    assert affected == changed
    assert changed, "fixture must exercise the retroactive path"


def test_incremental_max_bucket_size_equals_capped_full(spark):
    """ADVICE r13 medium: the incremental path's hot-bucket guard must
    match the full pipeline's drop-whole-bucket semantics — bucket sizes
    counted over the COMBINED index ∪ shard membership — so a capped
    incremental run equals the capped full recompute restricted to the
    shard.  Engineered corpus: 4 identical frozen docs + 1 identical
    shard doc form a size-5 bucket in every band (dropped at cap 4,
    along with every pair they'd produce), while a clean frozen/shard
    near-dup pair lives in size-2 buckets and must survive."""
    hot = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, hot) for i in range(1, 5)] + [
        (5, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, hot),
        (12, "alpha beta gamma delta epsilon zeta eta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    frozen = docs.filter("doc_id < 10")
    shard = docs.filter("doc_id >= 10")
    index = minhash_band_index(frozen)
    uncapped = _pairs(minhash_lsh_pairs_incremental(shard, index, threshold=0.4))
    capped = _pairs(
        minhash_lsh_pairs_incremental(
            shard, index, threshold=0.4, max_bucket_size=4
        )
    )
    full_capped = _pairs(
        minhash_lsh_pairs(docs, threshold=0.4, max_bucket_size=4).filter(
            "doc_a >= 10 OR doc_b >= 10"
        )
    )
    assert capped == full_capped
    # the cap is real: the hot doc's cross pairs vanish, the clean pair stays
    assert {(a, b) for a, b, _ in capped} == {(5, 12)}
    assert {(a, b) for a, b, _ in uncapped} == {
        (1, 11), (2, 11), (3, 11), (4, 11), (5, 12),
    }


def test_incremental_max_bucket_size_on_sf_corpus(spark, sf_dir):
    """Same differential on the fixture corpus densified with an
    identical-text copy (doc_id + 100000) — fixture buckets max out at 2
    members, so the copy manufactures the hot buckets the cap exists
    for; the cap is then chosen from the observed combined distribution
    so it provably bites."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(100000))
    )
    frozen = docs.filter(F.col("doc_id") % 10 != 7)
    shard = docs.filter(F.col("doc_id") % 10 == 7)
    index = minhash_band_index(frozen)
    # choose the cap: the largest bucket the shard probes, minus one
    shard_rows = minhash_band_index(shard).select("band", "bsig")
    sizes = (
        index.select("band", "bsig")
        .unionByName(shard_rows)
        .groupBy("band", "bsig")
        .count()
        .join(shard_rows.distinct(), ["band", "bsig"], "left_semi")
    )
    biggest = sizes.agg(F.max("count")).collect()[0][0]
    assert biggest and biggest > 2, "fixture must have a multi-member bucket"
    cap = biggest - 1
    inc = _pairs(
        minhash_lsh_pairs_incremental(
            shard, index, threshold=0.5, max_bucket_size=cap
        )
    )
    full = _pairs(
        minhash_lsh_pairs(docs, threshold=0.5, max_bucket_size=cap).filter(
            "doc_a % 10 = 7 OR doc_b % 10 = 7"
        )
    )
    assert inc == full


def test_index_params_stamped_and_validated(spark):
    """ADVICE r13 low: the index carries its construction parameters as
    bsig column metadata; probing or maintaining it with mismatched
    parameters raises instead of silently returning wrong pairs."""
    import pytest

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    index = minhash_band_index(docs, num_hashes=16, bands=8)
    meta = dict(index.schema["bsig"].metadata)
    assert meta["num_hashes"] == 16 and meta["bands"] == 8
    assert meta["hash_mode"] == "md5" and meta["shingle_unit"] == "word"
    shard = spark.createDataFrame(
        [(2, "alpha beta gamma delta zeta")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="different parameters"):
        minhash_lsh_pairs_incremental(shard, index, num_hashes=8, bands=4)
    with pytest.raises(ValueError, match="different parameters"):
        minhash_lsh_pairs_incremental(shard, index, seed=99)
    with pytest.raises(ValueError, match="minhash_band_index_apply"):
        minhash_band_index_apply(index, upserts=shard, shingle_unit="codepoint")
    # matching parameters probe fine
    assert minhash_lsh_pairs_incremental(shard, index, threshold=0.4).count() == 1


def test_index_params_survive_persistence(spark, tmp_path):
    """The stamp must round-trip through saveAsTable/parquet — that is
    the whole point (a months-old index still knows how it was built)."""
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    index = with_bsig_hash(minhash_band_index(docs, num_hashes=8, bands=4))
    index.write.mode("overwrite").option(
        "path", str(tmp_path / "idx_meta")
    ).saveAsTable("mh_idx_meta")
    try:
        import pytest

        reloaded = spark.table("mh_idx_meta")
        meta = dict(reloaded.schema["bsig"].metadata)
        assert meta["num_hashes"] == 8 and meta["bands"] == 4
        shard = spark.createDataFrame(
            [(2, "alpha beta gamma delta zeta")], "doc_id int, text string"
        )
        # unspecified parameters AUTO-RESOLVE from the stamp (r14): the
        # probe needs no parameter bookkeeping against a stamped index
        got = minhash_lsh_pairs_incremental(shard, reloaded, threshold=0.4)
        assert got.count() == 1
        # an explicitly-passed value that contradicts the stamp raises
        with pytest.raises(ValueError, match="different parameters"):
            minhash_lsh_pairs_incremental(shard, reloaded, num_hashes=16)
        # matching explicit values still probe fine
        got = minhash_lsh_pairs_incremental(
            shard, reloaded, num_hashes=8, bands=4, threshold=0.4
        )
        assert got.count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_idx_meta")


def test_prestamp_index_width_assert_fires(spark):
    """Indexes persisted before the stamp existed (no metadata) fall back
    to the structural size(bsig) check: a mismatched band width fails
    loudly at execution instead of returning empty join output."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id int, text string"
    )
    index = minhash_band_index(docs, num_hashes=16, bands=8)
    # strip the metadata via a computed projection (identity transform)
    stripped = index.select(
        "doc_id", "hset", "band",
        F.expr("transform(bsig, x -> x)").alias("bsig"),
    )
    assert not dict(stripped.schema["bsig"].metadata or {})
    shard = spark.createDataFrame(
        [(2, "alpha beta gamma delta zeta")], "doc_id int, text string"
    )
    # num_hashes=8 / bands=2 → width 4 ≠ the index's width 2 (16/8).
    # (A same-width mismatch like 8/4 is invisible to the structural
    # check — that is exactly why the metadata stamp is the primary
    # defense and this assert only the pre-stamp fallback.)
    with pytest.raises(Exception, match="bsig width"):
        minhash_lsh_pairs_incremental(
            shard, stripped, num_hashes=8, bands=2, threshold=0.4
        ).collect()
    # matching width passes the assert and probes correctly
    assert (
        minhash_lsh_pairs_incremental(shard, stripped, threshold=0.4).count()
        == 1
    )


def _apply_kwargs(**kw):
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    return minhash_band_index_apply(**kw)


def test_band_index_apply_differential(spark, sf_dir):
    """VERDICT r13 item 1's done-criterion: night-2 re-ingests corrected
    docs and deletes others; probing the MAINTAINED index must equal the
    full recompute on the corrected corpus, pair-for-pair — stale band
    rows of corrected/deleted docs must stop manufacturing pairs against
    text that no longer exists."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    index = minhash_band_index(frozen)
    # night-2 changes: %10==6 docs re-ingested with corrected text,
    # %10==9 docs retracted from the corpus entirely
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    maintained = _apply_kwargs(index=index, upserts=corrected, delete_ids=deletes)
    got = _pairs(minhash_lsh_pairs_incremental(shard, maintained, threshold=0.5))
    # ground truth: full recompute on the corrected corpus
    corrected_corpus = (
        docs.filter(F.col("doc_id") % 10 != 9)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 6,
                F.concat(F.col("text"), F.lit(" corrected edition")),
            ).otherwise(F.col("text")),
        )
    )
    full = minhash_lsh_pairs(corrected_corpus, threshold=0.5)
    expected = _pairs(full.filter("doc_a % 10 = 3 OR doc_b % 10 = 3"))
    assert got == expected
    assert got, "fixture must have shard-touching pairs after maintenance"
    # the maintenance changed the answer: the APPEND-ONLY (stale) index
    # manufactures at least one pair the corrected corpus does not have
    stale = _pairs(minhash_lsh_pairs_incremental(shard, index, threshold=0.5))
    assert stale != got, "fixture must exercise retraction/correction"
    # and the maintained index itself is row-equal to a fresh rebuild
    rebuilt = minhash_band_index(
        corrected_corpus.filter(F.col("doc_id") % 10 != 3)
    )
    key = lambda df: {  # noqa: E731
        (r.doc_id, r.band, tuple(r.bsig), tuple(sorted(r.hset)))
        for r in df.collect()
    }
    assert key(maintained) == key(rebuilt)


def test_band_index_apply_delete_only_and_upsert_only(spark):
    """Closed-form maintenance semantics: delete-only retracts every band
    row of the deleted doc; upsert-only replaces (not duplicates) the
    re-ingested doc's rows."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
        ],
        "doc_id int, text string",
    )
    index = minhash_band_index(docs)
    only_del = minhash_band_index_apply(
        index, delete_ids=docs.filter("doc_id = 2").select("doc_id")
    )
    assert {r.doc_id for r in only_del.select("doc_id").distinct().collect()} == {1}
    up = docs.filter("doc_id = 1").withColumn(
        "text", F.lit("totally new words now here")
    )
    only_up = minhash_band_index_apply(index, upserts=up)
    fresh = minhash_band_index(
        spark.createDataFrame(
            [
                (1, "totally new words now here"),
                (2, "one two three four five six"),
            ],
            "doc_id int, text string",
        )
    )
    norm = lambda df: {  # noqa: E731
        (r.doc_id, r.band, tuple(r.bsig), tuple(sorted(r.hset)))
        for r in df.collect()
    }
    assert norm(only_up) == norm(fresh)


def test_band_index_apply_keeps_bucketed_probe_shuffle_free(spark, sf_dir, tmp_path):
    """Maintenance must not break the pay-the-shuffle-once layout: the
    maintained index (broadcast anti-join + union of freshly-signed
    upsert rows) probed after a bucketed rewrite still reads
    exchange-free, and the maintenance plan itself adds no exchange on
    the index side (broadcast retraction)."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )
    from kafka_streams_one_to_many_join_spark.sources.bucketed import (
        BUCKETED_READ_CONFS,
        SUBSET_KEY_JOIN_CONFS,
        write_bucketed,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    confs = {**BUCKETED_READ_CONFS, **SUBSET_KEY_JOIN_CONFS}
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        write_bucketed(
            with_bsig_hash(minhash_band_index(frozen)),
            "mh_idx_n1", 8, "bsig_h", path=str(tmp_path / "n1"),
        )
        night1 = spark.table("mh_idx_n1")
        maintained = minhash_band_index_apply(
            night1, upserts=corrected, delete_ids=deletes
        )
        # the retraction reads the bucketed index without an exchange:
        # maintenance adds broadcast joins only (anti + the upsert union)
        plan = maintained._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
        write_bucketed(maintained, "mh_idx_n2", 8, "bsig_h", path=str(tmp_path / "n2"))
        probe = minhash_lsh_pairs_incremental(
            shard, spark.table("mh_idx_n2"), threshold=0.5
        )
        plain_probe = minhash_lsh_pairs_incremental(
            shard, maintained.drop("bsig_h"), threshold=0.5
        )
        assert plans.count_shuffles(probe) < plans.count_shuffles(plain_probe)
        assert _pairs(probe) == _pairs(plain_probe)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for t in ("mh_idx_n1", "mh_idx_n2"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_segment_probe_plan_is_scan_only_on_index(spark, sf_dir):
    """r14 rework (SCALE.md: the 0.5x floor's cause): the incremental
    segment probe must not shuffle, checkpoint, or full-outer-join any
    index-sized input — every join is broadcast and the index/counts
    tables appear only as scans.  Pinned on the executed plan of every
    stage (the materialize audit hook captures pre-checkpoint plans)."""
    from kafka_streams_one_to_many_join_spark import model
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        segment_dedup_incremental,
        segment_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    frozen_docs = docs.filter(F.col("doc_id") % 10 < 8)
    shard = docs.filter(F.col("doc_id") % 10 >= 8)
    idx = segment_pairs(frozen_docs)
    counts = idx.groupBy("seg_h").agg(F.count(F.lit(1)).alias("occ"))
    sink: list = []
    old = model._PLAN_AUDIT_SINK
    model._PLAN_AUDIT_SINK = sink
    try:
        out = segment_dedup_incremental(shard, idx, seg_counts=counts)
        frames = sink + [out]
        for f in frames:
            plan = f._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" not in plan, plan
            assert "FullOuter" not in plan, plan
        assert out.count() > 0
    finally:
        model._PLAN_AUDIT_SINK = old


def test_maintained_index_composes_with_bucket_cap(spark, sf_dir):
    """Composition: probing a MAINTAINED index with the hot-bucket cap
    equals the capped full recompute on the corrected corpus restricted
    to the shard — the two r14 features don't interact destructively."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # densified corpus (identical-text copies) so the cap provably bites
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + F.lit(100000))
    )
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    maintained = minhash_band_index_apply(
        minhash_band_index(frozen), upserts=corrected, delete_ids=deletes
    )
    corrected_corpus = docs.filter(F.col("doc_id") % 10 != 9).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 6,
            F.concat(F.col("text"), F.lit(" corrected edition")),
        ).otherwise(F.col("text")),
    )
    capped = _pairs(
        minhash_lsh_pairs_incremental(
            shard, maintained, threshold=0.5, max_bucket_size=3
        )
    )
    full_capped = _pairs(
        minhash_lsh_pairs(
            corrected_corpus, threshold=0.5, max_bucket_size=3
        ).filter("doc_a % 10 = 3 OR doc_b % 10 = 3")
    )
    assert capped == full_capped
    assert capped, "fixture must keep some pairs under the cap"
    uncapped = _pairs(
        minhash_lsh_pairs_incremental(shard, maintained, threshold=0.5)
    )
    assert capped != uncapped, "the cap must bite on the densified corpus"


def test_band_index_apply_delete_wins_over_same_day_upsert(spark):
    """ADVICE r14 medium: a doc_id in BOTH upserts and delete_ids must end
    DELETED (corrected then deleted the same day) — the former
    union-then-reinsert dataflow silently resurrected it.  Differential:
    maintained == rebuild on the corpus with the doc gone."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
            (3, "red orange yellow green blue indigo"),
        ],
        "doc_id int, text string",
    )
    index = minhash_band_index(docs)
    # doc 2 is corrected AND deleted in the same nightly feed
    upserts = spark.createDataFrame(
        [(2, "corrected text that is then retracted")], "doc_id int, text string"
    )
    deletes = spark.createDataFrame([(2,)], "doc_id int")
    maintained = minhash_band_index_apply(
        index, upserts=upserts, delete_ids=deletes
    )
    assert {
        r.doc_id for r in maintained.select("doc_id").distinct().collect()
    } == {1, 3}
    rebuilt = minhash_band_index(docs.filter("doc_id != 2"))
    norm = lambda df: {  # noqa: E731
        (r.doc_id, r.band, tuple(r.bsig), tuple(sorted(r.hset)))
        for r in df.collect()
    }
    assert norm(maintained) == norm(rebuilt)


def test_band_index_apply_prestamp_refuses_to_default(spark):
    """ADVICE r14 low: maintaining a PRE-STAMP index (no construction
    metadata) with any parameter defaulted raises — a same-ratio config
    (32/16 vs 16/8, both width 2) passes the structural width check, so
    defaulted inserts would silently corrupt the index.  Passing the
    full original parameter set still works (the structural check stays
    armed)."""
    import pytest

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        _INDEX_DEFAULTS,
        minhash_band_index_apply,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    index = minhash_band_index(docs, num_hashes=16, bands=8)
    stripped = index.select(
        "doc_id", "hset", "band",
        F.expr("transform(bsig, x -> x)").alias("bsig"),
    )
    assert not dict(stripped.schema["bsig"].metadata or {})
    up = spark.createDataFrame(
        [(2, "one two three four five six")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="no construction-parameter stamp"):
        minhash_band_index_apply(stripped, upserts=up)
    with pytest.raises(ValueError, match="no construction-parameter stamp"):
        # even one missing parameter refuses
        minhash_band_index_apply(
            stripped, upserts=up,
            **{k: v for k, v in _INDEX_DEFAULTS.items() if k != "seed"},
        )
    full = minhash_band_index_apply(stripped, upserts=up, **_INDEX_DEFAULTS)
    assert {
        r.doc_id for r in full.select("doc_id").distinct().collect()
    } == {1, 2}
    # the stamped path is unaffected: no parameters needed
    assert minhash_band_index_apply(index, upserts=up).count() > 0


def test_band_index_apply_delete_ids_column_contract(spark):
    """ADVICE r14 low: delete_ids must be a one-column frame or carry
    id_col — a multi-column frame without it raises instead of silently
    retracting on its first column; with id_col present that column is
    used regardless of position."""
    import pytest

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index_apply,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six"),
        ],
        "doc_id int, text string",
    )
    index = minhash_band_index(docs)
    with pytest.raises(ValueError, match="delete_ids"):
        minhash_band_index_apply(
            index,
            delete_ids=spark.createDataFrame(
                [(9, 2)], "other_id int, something int"
            ),
        )
    # a full doc frame carrying doc_id retracts on doc_id, wherever it is
    maintained = minhash_band_index_apply(
        index,
        delete_ids=spark.createDataFrame(
            [("irrelevant", 2)], "text string, doc_id int"
        ),
    )
    assert {
        r.doc_id for r in maintained.select("doc_id").distinct().collect()
    } == {1}


def test_normalized_layout_probe_matches_carried(spark, sf_dir):
    """r16 (the sf100 finding): the lean index
    (minhash_band_index(carry_hset=False)) + minhash_doc_hsets
    companion yields the IDENTICAL shard-touching pair set as the
    carried layout — including under max_bucket_size capping — and the
    probe attaches hsets candidate-proportionally (no hsets-table
    shuffle: the companion side of the attach is a broadcast)."""
    import pytest

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index,
        minhash_doc_hsets,
        minhash_lsh_pairs_incremental,
    )
    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    carried = minhash_band_index(frozen)
    lean = minhash_band_index(frozen, carry_hset=False)
    assert "hset" not in lean.columns
    companion = minhash_doc_hsets(frozen)
    pairs = lambda df: {  # noqa: E731
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    }
    expected = pairs(minhash_lsh_pairs_incremental(shard, carried, threshold=0.3))
    got = pairs(
        minhash_lsh_pairs_incremental(
            shard, lean, threshold=0.3, hsets=companion
        )
    )
    assert got == expected and got
    # capped runs agree too (the cap path never touches hsets)
    exp_cap = pairs(
        minhash_lsh_pairs_incremental(
            shard, carried, threshold=0.3, max_bucket_size=4
        )
    )
    got_cap = pairs(
        minhash_lsh_pairs_incremental(
            shard, lean, threshold=0.3, hsets=companion, max_bucket_size=4
        )
    )
    assert got_cap == exp_cap
    # a lean index without its companion refuses to probe
    with pytest.raises(ValueError, match="normalized layout"):
        minhash_lsh_pairs_incremental(shard, lean, threshold=0.3)
    with pytest.raises(ValueError, match="hsets must carry"):
        minhash_lsh_pairs_incremental(
            shard, lean, threshold=0.3,
            hsets=companion.select(F.col("doc_id").alias("other"), "hset"),
        )


def test_normalized_layout_apply_differential(spark, sf_dir):
    """Maintaining the lean index + companion under upserts/deletes
    equals a rebuild of both on the corrected corpus, and a probe over
    the maintained pair equals the carried-layout maintained probe.
    The lean apply REFUSES to run without the companion."""
    import pytest

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index,
        minhash_band_index_apply,
        minhash_doc_hsets,
        minhash_lsh_pairs_incremental,
    )
    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frozen = docs.filter(F.col("doc_id") % 10 != 3)
    shard = docs.filter(F.col("doc_id") % 10 == 3)
    corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
        "text", F.concat(F.col("text"), F.lit(" corrected edition"))
    )
    deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
    lean = minhash_band_index(frozen, carry_hset=False)
    companion = minhash_doc_hsets(frozen)
    with pytest.raises(ValueError, match="normalized layout"):
        minhash_band_index_apply(lean, upserts=corrected, delete_ids=deletes)
    m_idx, m_h = minhash_band_index_apply(
        lean, upserts=corrected, delete_ids=deletes, hsets=companion
    )
    corrected_frozen = frozen.filter(F.col("doc_id") % 10 != 9).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 6,
            F.concat(F.col("text"), F.lit(" corrected edition")),
        ).otherwise(F.col("text")),
    )
    rows = lambda df, cols: sorted(  # noqa: E731
        tuple(r[c] if not isinstance(r[c], list) else tuple(sorted(r[c])) for c in cols)
        for r in df.collect()
    )
    assert rows(m_idx, ["doc_id", "band", "bsig"]) == rows(
        minhash_band_index(corrected_frozen, carry_hset=False),
        ["doc_id", "band", "bsig"],
    )
    assert rows(m_h, ["doc_id", "hset"]) == rows(
        minhash_doc_hsets(corrected_frozen), ["doc_id", "hset"]
    )
    # probe over the maintained pair == carried-layout maintained probe
    carried = minhash_band_index(frozen)
    m_carried = minhash_band_index_apply(
        carried, upserts=corrected, delete_ids=deletes
    )
    pairs = lambda df: {  # noqa: E731
        (r.doc_a, r.doc_b, r.jaccard) for r in df.collect()
    }
    got = pairs(
        minhash_lsh_pairs_incremental(shard, m_idx, threshold=0.3, hsets=m_h)
    )
    assert got == pairs(
        minhash_lsh_pairs_incremental(shard, m_carried, threshold=0.3)
    )
    assert got


def test_one_pass_normalized_builder(spark, sf_dir, monkeypatch):
    """minhash_band_index_normalized yields the identical (lean index,
    companion) pair as the two-pass build, from ONE corpus scan: both
    outputs' plans read the checkpointed per-doc frame, never the
    documents table."""
    from kafka_streams_one_to_many_join_spark import model as model_mod
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_band_index,
        minhash_band_index_normalized,
        minhash_doc_hsets,
    )
    from kafka_streams_one_to_many_join_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sink: list = []
    monkeypatch.setattr(model_mod, "_PLAN_AUDIT_SINK", sink)
    index, companion = minhash_band_index_normalized(docs)
    rows = lambda df, cols: sorted(  # noqa: E731
        tuple(
            r[c] if not isinstance(r[c], list) else tuple(sorted(r[c]))
            for c in cols
        )
        for r in df.collect()
    )
    assert rows(index, ["doc_id", "band", "bsig"]) == rows(
        minhash_band_index(docs, carry_hset=False), ["doc_id", "band", "bsig"]
    )
    assert rows(companion, ["doc_id", "hset"]) == rows(
        minhash_doc_hsets(docs), ["doc_id", "hset"]
    )
    # the stamp rides the one-pass index too
    meta = dict(index.schema["bsig"].metadata or {})
    assert meta.get("num_hashes") == 16
    # one corpus scan: the materialized per-doc frame scans the corpus;
    # both derived outputs' plans are scan-free
    assert len(sink) == 1
    for df in (index, companion):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "parquet" not in plan.lower() and "FileScan" not in plan, plan
