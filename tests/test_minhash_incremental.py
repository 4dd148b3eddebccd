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
