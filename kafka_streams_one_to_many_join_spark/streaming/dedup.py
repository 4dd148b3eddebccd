"""Streaming exact deduplication — the stream twin of functions.dedup.

Two variants with different state-lifetime contracts:

- **streaming_dedup**: dropDuplicates on the key columns; with a watermark
  the per-key state expires once the event-time watermark passes, bounding
  state to the watermark horizon (without one, state grows forever — only
  safe for bounded key domains, like the reference's 20 cars).
- **streaming_dedup_within_watermark**: dropDuplicatesWithinWatermark —
  dedups keys whose events arrive within the watermark delay of each
  other, the contract that matches "the same record delivered twice by an
  at-least-once source" (the reference's delivery guarantee,
  DemoApp.scala:25) without keeping a key forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key wins, duplicates dropped exactly.

    With ``ts_col`` the watermark bounds state; duplicate keys arriving
    after the watermark passed their first occurrence are NOT dropped —
    the deliberate trade for bounded state at 100 TB/day stream volume.
    """
    if ts_col is not None:
        events = events.withWatermark(ts_col, watermark)
    return events.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Dedup duplicates that arrive within the watermark delay window —
    at-least-once delivery repair with guaranteed state expiry."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


# ---------------------------------------------------------------------------
# streaming MinHash-LSH — the stream twin of functions.dedup.minhash_lsh_pairs
# ---------------------------------------------------------------------------


def streaming_minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 11,
) -> DataFrame:
    """Cross-batch fuzzy near-dup candidate maintenance: the streaming
    twin of ``functions.dedup.minhash_lsh_pairs`` (recipe reused
    bit-for-bit — same shingles, same 31-bit md5 prefix hash, same
    affine-reseed minhash coefficients, same banding, same exact-Jaccard
    verification).

    Per-document signatures are PURE PROJECTIONS here (array_min over
    transform of the doc's distinct shingle hashes) — a signature is a
    function of one document's text, so no pre-aggregation is needed and
    the one stateful operator Spark allows per query is free for the
    bucket state.  Keyed state: (band, band-signature) bucket → the doc
    ids + verification hash-sets seen so far.  Each micro-batch pairs
    every NEW doc in a bucket against the bucket's remembered and
    same-batch docs (a < b), verifies exact Jaccard from the carried
    hash-sets, and emits qualifying pairs — a pair can never re-emit
    from the same bucket, because only new×(old+new) pairs form.

    A pair that collides in several bands emits once per band (the batch
    operator ends with .distinct(); a second stateful op is not allowed
    in the same streaming query) — pair the output with an idempotent
    upsert sink keyed on (doc_a, doc_b), the same pattern
    write_stream_exactly_once uses.  The 3-batch replay equivalence test
    asserts the emitted pair SET equals the batch operator's.

    Scale: state per bucket is the docs that ever hashed into it —
    bounded by the LSH guarantee that buckets stay small (the same
    property that bounds the batch operator's per-bucket quadratic
    work); unbounded corpora add a timeout exactly like the join-state
    TTL (streaming/join.py).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        MINHASH_P,
        _with_shingles,
        minhash_coeffs,
    )

    rows = num_hashes // bands
    a, b = minhash_coeffs(num_hashes, seed)
    hashes = (
        "array_distinct(transform(_sh, s -> "
        f"cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) % {MINHASH_P}))"
    )
    sig_items = ", ".join(
        f"array_min(transform(_hs, h -> (h * {a[j]} + {b[j]}) % {MINHASH_P}))"
        for j in range(num_hashes)
    )
    banded = (
        _with_shingles(docs, text_col, id_col, shingle_n)
        .filter(F.expr("size(_sh) > 0"))  # batch drops shingle-less docs too
        .select("doc_id", F.expr(hashes).alias("_hs"))
        .select("doc_id", "_hs", F.expr(f"array({sig_items})").alias("_sig"))
        .select(
            "doc_id",
            "_hs",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bands - 1}), b -> "
                    f"named_struct('band', b, 'bsig', slice(_sig, b * {rows} + 1, {rows})))"
                )
            ).alias("_b"),
        )
        .select(
            F.concat(
                F.col("_b.band").cast("string"),
                F.lit(":"),
                F.array_join(F.col("_b.bsig"), "-"),
            ).alias("bucket"),
            "doc_id",
            "_hs",
        )
    )

    output_schema = StructType(
        [
            StructField("doc_a", LongType(), False),
            StructField("doc_b", LongType(), False),
            StructField("jaccard", DoubleType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("doc_ids", ArrayType(LongType()), True),
            StructField("hsets", ArrayType(ArrayType(LongType())), True),
        ]
    )

    def fn(key, pdfs, state):
        known_ids, known_sets = (
            ([int(x) for x in state.get[0]], [set(int(h) for h in s) for s in state.get[1]])
            if state.exists
            else ([], [])
        )
        known = dict(zip(known_ids, known_sets))
        out = []
        for pdf in pdfs:
            for doc_id, hs in zip(pdf["doc_id"], pdf["_hs"]):
                doc_id = int(doc_id)
                if doc_id in known:  # idempotent under replay
                    continue
                hset = set(int(h) for h in hs)
                for other_id, other_set in known.items():
                    inter = len(hset & other_set)
                    union = len(hset) + len(other_set) - inter
                    jac = inter / union if union else 0.0
                    if jac >= threshold:
                        lo, hi = sorted((doc_id, other_id))
                        out.append((lo, hi, round(jac, 6)))
                known[doc_id] = hset
        state.update((list(known), [sorted(s) for s in known.values()]))
        if out:
            yield pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    return banded.groupBy("bucket").applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
