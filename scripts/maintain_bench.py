#!/usr/bin/env python
"""Maintain-vs-rebuild cost of the MinHash band index under a mutable
corpus (r14, VERDICT r13 item 1) at the sf1/sf10 scale twins.

Night-2 change set: docs with doc_id % 10 = 6 re-ingested with corrected
text, docs with doc_id % 10 = 9 deleted.  Measured walls:

- rebuild:  minhash_band_index(corrected corpus) — re-tokenize and
            re-sign EVERY document, written bucketed (what you pay
            without maintenance);
- maintain: minhash_band_index_apply(night-1 bucketed index, upserts,
            deletes) — broadcast anti-join retraction + signing only
            the corrected docs, written bucketed.

Row-set equality of maintained vs rebuilt index is checksum-asserted,
and a probe over each must yield identical pairs.

Usage: python scripts/maintain_bench.py [--dirs /tmp/scale_sf1,/tmp/scale_sf10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_streams_one_to_many_join_spark.functions.dedup import (  # noqa: E402
    minhash_band_index,
    minhash_band_index_apply,
    minhash_lsh_pairs_incremental,
    with_bsig_hash,
)
from kafka_streams_one_to_many_join_spark.session import get_session  # noqa: E402
from kafka_streams_one_to_many_join_spark.sources.bucketed import (  # noqa: E402
    BUCKETED_READ_CONFS,
    SUBSET_KEY_JOIN_CONFS,
    write_bucketed,
)


def _index_checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") * (F.col("band") + 1)).alias("s"),
        F.sum(F.pmod(F.xxhash64("band", "bsig"), F.lit(1000000007))).alias("h"),
        F.sum(F.size("hset")).alias("hs"),
    ).collect()[0]
    return (row.n, int(row.s or 0), int(row.h or 0), int(row.hs or 0))


def _pair_checksum(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_a") + F.col("doc_b")).alias("s"),
        F.round(F.sum("jaccard"), 3).alias("j"),
    ).collect()[0]
    return (row.n, int(row.s or 0), float(row.j or 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", default="/tmp/scale_sf1,/tmp/scale_sf10")
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()
    spark = get_session("maintbench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in {**BUCKETED_READ_CONFS, **SUBSET_KEY_JOIN_CONFS}.items():
        spark.conf.set(k, v)
    for d in args.dirs.split(","):
        tag = os.path.basename(d.rstrip("/"))
        docs = spark.read.parquet(f"{d}/documents.parquet").select("doc_id", "text")
        n = docs.count()
        frozen = docs.filter(F.col("doc_id") % 10 != 3)
        shard = docs.filter(F.col("doc_id") % 10 == 3)
        corrected = frozen.filter(F.col("doc_id") % 10 == 6).withColumn(
            "text", F.concat(F.col("text"), F.lit(" corrected edition"))
        )
        deletes = frozen.filter(F.col("doc_id") % 10 == 9).select("doc_id")
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

        # night-1 index (not timed here — the r13 index-build row covers it)
        n1_tbl = f"mb_idx_n1_{tag}"
        write_bucketed(
            with_bsig_hash(minhash_band_index(frozen)),
            n1_tbl, 32, "bsig_h", path=f"/tmp/{n1_tbl}",
        )

        t0 = time.perf_counter()
        rb_tbl = f"mb_idx_rebuild_{tag}"
        write_bucketed(
            with_bsig_hash(minhash_band_index(corrected_frozen)),
            rb_tbl, 32, "bsig_h", path=f"/tmp/{rb_tbl}",
        )
        t_rebuild = time.perf_counter() - t0

        t0 = time.perf_counter()
        mt_tbl = f"mb_idx_maint_{tag}"
        write_bucketed(
            minhash_band_index_apply(
                spark.table(n1_tbl), upserts=corrected, delete_ids=deletes
            ),
            mt_tbl, 32, "bsig_h", path=f"/tmp/{mt_tbl}",
        )
        t_maintain = time.perf_counter() - t0

        cs_rb = _index_checksum(spark.table(rb_tbl))
        cs_mt = _index_checksum(spark.table(mt_tbl))
        assert cs_rb == cs_mt, (tag, cs_rb, cs_mt)
        p_rb = _pair_checksum(
            minhash_lsh_pairs_incremental(
                shard, spark.table(rb_tbl), threshold=args.threshold
            )
        )
        p_mt = _pair_checksum(
            minhash_lsh_pairs_incremental(
                shard, spark.table(mt_tbl), threshold=args.threshold
            )
        )
        assert p_rb == p_mt, (tag, p_rb, p_mt)
        print(
            f"{tag}: docs={n} index_rows={cs_mt[0]} "
            f"rebuild={t_rebuild:.2f}s maintain={t_maintain:.2f}s "
            f"maintain_vs_rebuild={t_maintain / t_rebuild:.3f} "
            f"probe_pairs={p_mt[0]}"
        )
        for t in (n1_tbl, rb_tbl, mt_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
