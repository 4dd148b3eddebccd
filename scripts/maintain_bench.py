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
    minhash_band_index_normalized,
    minhash_doc_hsets,
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
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("doc_id") * (F.col("band") + 1)).alias("s"),
        F.sum(F.pmod(F.xxhash64("band", "bsig"), F.lit(1000000007))).alias("h"),
    ]
    # the lean (normalized) layout carries no hset on band rows
    if "hset" in df.columns:
        aggs.append(F.sum(F.size("hset")).alias("hs"))
    row = df.agg(*aggs).collect()[0]
    out = [row.n, int(row.s or 0), int(row.h or 0)]
    if "hset" in df.columns:
        out.append(int(row.hs or 0))
    return tuple(out)


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
    ap.add_argument(
        "--layout",
        choices=["carried", "normalized"],
        default="carried",
        help="normalized (r16): lean band rows + doc-keyed hset companion "
        "— removes the bands-x hset duplication that made the index's own "
        "rewrite dominate maintenance at sf100 (SCALE.md r16)",
    )
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

        norm = args.layout == "normalized"
        carry = not norm

        def build_index(src):
            return with_bsig_hash(minhash_band_index(src, carry_hset=carry))

        # night-1 index (not timed here — the r13 index-build row covers it)
        n1_tbl = f"mb_idx_n1_{tag}"
        write_bucketed(build_index(frozen), n1_tbl, 32, "bsig_h",
                       path=f"/tmp/{n1_tbl}")
        n1_h = f"/tmp/mb_hsets_n1_{tag}"
        if norm:
            minhash_doc_hsets(frozen).write.mode("overwrite").parquet(n1_h)

        rb_tbl, mt_tbl = f"mb_idx_rebuild_{tag}", f"mb_idx_maint_{tag}"
        rb_h, mt_h = f"/tmp/mb_hsets_rb_{tag}", f"/tmp/mb_hsets_mt_{tag}"

        t0 = time.perf_counter()
        if norm:
            # the one-pass dual-write builder (r16): one tokenize+sign
            # pass feeds both outputs via a materialized per-doc frame
            rb_idx, rb_hs = minhash_band_index_normalized(corrected_frozen)
            write_bucketed(with_bsig_hash(rb_idx), rb_tbl, 32, "bsig_h",
                           path=f"/tmp/{rb_tbl}")
            rb_hs.write.mode("overwrite").parquet(rb_h)
        else:
            write_bucketed(build_index(corrected_frozen), rb_tbl, 32,
                           "bsig_h", path=f"/tmp/{rb_tbl}")
        t_rebuild = time.perf_counter() - t0

        t0 = time.perf_counter()
        if norm:
            m_idx, m_hs = minhash_band_index_apply(
                spark.table(n1_tbl), upserts=corrected, delete_ids=deletes,
                hsets=spark.read.parquet(n1_h),
            )
            write_bucketed(m_idx, mt_tbl, 32, "bsig_h", path=f"/tmp/{mt_tbl}")
            m_hs.write.mode("overwrite").parquet(mt_h)
        else:
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
        probe_kw = (
            {"hsets": spark.read.parquet(mt_h)} if norm else {}
        )
        probe_kw_rb = (
            {"hsets": spark.read.parquet(rb_h)} if norm else {}
        )
        p_rb = _pair_checksum(
            minhash_lsh_pairs_incremental(
                shard, spark.table(rb_tbl), threshold=args.threshold,
                **probe_kw_rb,
            )
        )
        p_mt = _pair_checksum(
            minhash_lsh_pairs_incremental(
                shard, spark.table(mt_tbl), threshold=args.threshold,
                **probe_kw,
            )
        )
        assert p_rb == p_mt, (tag, p_rb, p_mt)
        print(
            f"{tag} [{args.layout}]: docs={n} index_rows={cs_mt[0]} "
            f"rebuild={t_rebuild:.2f}s maintain={t_maintain:.2f}s "
            f"maintain_vs_rebuild={t_maintain / t_rebuild:.3f} "
            f"probe_pairs={p_mt[0]}"
        )
        for t in (n1_tbl, rb_tbl, mt_tbl):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    spark.stop()


if __name__ == "__main__":
    main()
