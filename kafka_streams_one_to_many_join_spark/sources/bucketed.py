"""Bucketed tables: pre-shuffled storage for repeated co-located joins.

The reference repartitions its streams into keyed topics once and then
every downstream stateful operator reads them co-partitioned for free
(`DemoApp.scala:98,107` — the topics ARE the persistent partitioning).
The batch analog in Spark is a **bucketed table**: `bucketBy(N, key)`
at write time hash-partitions rows into N stable buckets inside each
write task, records the layout in the catalog, and every later
equi-join or aggregation on that key reads the layout instead of
shuffling — the classic amortization for a 100 TB fact table that is
joined on the same key by many queries.

What bucketing buys (each plan-asserted in tests/test_plans.py and
measured in SCALE.md "Bucketed joins"):

- **join with NO shuffle**: two tables bucketed by the same key into
  the same bucket count sort-merge-join with zero Exchange on either
  side — at 100 TB that is the difference between re-shuffling the
  fact table per query and never shuffling it again;
- **aggregation with NO shuffle**: `groupBy(key)` on a bucketed table
  needs no Exchange (each bucket already holds complete key groups);
- **bucket pruning**: an equality filter on the bucket key scans 1 of
  N buckets (`SelectedBucketsCount` in the scan node) — partition
  pruning's hash-key sibling;
- **sort elision**: with `sortBy(key)` and ONE file per bucket the
  sort-merge join also drops its per-side Sort — a pure zip-merge.
  Spark only trusts the sort order when each bucket is a single file,
  so ``write_bucketed`` repartitions by the bucket key before writing
  (one write task per bucket) unless told otherwise.

Two read-side confs gate the last two wins, found by probing the plans
(both dynamic session confs, bundled as ``BUCKETED_READ_CONFS``):

- ``spark.sql.sources.bucketing.autoBucketedScan.enabled=false`` —
  by default the planner DISABLES the bucketed scan when no join/agg
  needs its distribution ("Bucketed: false (disabled by query
  planner)"), and in that mode a plain ``WHERE key = literal`` loses
  bucket pruning too (measured here: no ``SelectedBucketsCount`` with
  the default, ``1 out of 8`` with the conf off).  The trade: scans of
  bucketed tables then always get bucket-count parallelism, so pick
  bucket counts like shuffle-partition counts.
- ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — since
  Spark 3.0 the scan IGNORES the sortBy order by default (computing
  files-per-bucket at planning was judged not worth it); with the conf
  on and single-file buckets the SMJ's two Sorts vanish (asserted in
  tests/test_plans.py).

Caveats encoded here rather than discovered at scale:

- Both join sides must agree on the bucket COUNT (or one must be a
  multiple of the other with ``spark.sql.bucketing.coalesceBucketsInJoin
  .enabled``); ``bucketed_join_check`` verifies before a query relies
  on it.
- Bucketed metadata lives in the session catalog.  The in-memory
  catalog (this repo's default) scopes it to one SparkSession; a real
  deployment points ``spark.sql.warehouse.dir`` + a metastore at
  durable storage.  The parquet files themselves are plain parquet —
  only the bucket spec is catalog state.
- Buckets are NOT AQE-visible: a skewed bucket key keeps its skew at
  read time (AQE skew-split works on shuffle exchanges, which this
  layout exists to avoid).  Measured on the zipfian twin (SCALE.md
  "Bucketing × skew"): the dominant tax is the WRITE straggler — one
  task sorts/writes the whole hot bucket, 3.7× the uniform write —
  while the read-side straggler at a 12%-hot key stayed mild (the
  bucketed join still beat the shuffle join).  Bucket by
  high-cardinality keys (orderkey, doc_id); let genuinely skewed FK
  joins shuffle under AQE, where the hot partitions can be split at
  runtime — the measured guidance of operators/skew.py applies BEFORE
  choosing the bucket key.
- One file per bucket means one write task per bucket: pick N so a
  bucket's rows fit one task comfortably (the same sizing rule as
  shuffle partitions).  For a 100 TB table that is thousands of
  buckets, not this module's test-sized 8.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Session confs that unlock the read-side bucketing wins (see module
# docstring).  Dynamic — settable on a live session via spark.conf.set —
# and deliberately NOT defaults in session.py: no roster query reads a
# bucketed table, and the parallelism trade belongs to the deployment
# that owns the bucket counts.
BUCKETED_READ_CONFS = {
    "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
}

# A join whose keys are a SUPERSET of a bucketed side's bucket columns
# (e.g. the minhash incremental probe: keys (bsig_h, band, bsig), index
# bucketed on the scalar bsig_h because arrays cannot be bucket columns)
# still reshuffles the bucketed side by default — since Spark 3.3 the
# co-partition check demands partitioning on ALL join keys.  This
# relaxation accepts subset partitioning; it is correctness-neutral
# (equal key tuples imply equal subset values, so the subset clustering
# already co-locates every matching pair) and turns such probes into
# one-sided shuffles (plan-asserted in tests/test_minhash_incremental).
SUBSET_KEY_JOIN_CONFS = {
    "spark.sql.requireAllClusterKeysForCoPartition": "false",
}


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    key_cols: list[str] | str,
    sort_cols: list[str] | str | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    single_file_buckets: bool = True,
) -> None:
    """Persist ``df`` as a parquet bucketed table named ``table``.

    ``key_cols`` become the bucket spec; ``sort_cols`` (default: the key
    columns) order rows inside each bucket so sort-merge joins can skip
    their Sort.  ``single_file_buckets`` repartitions by the key first —
    one file per bucket, the layout Spark requires before it trusts the
    sortBy order (multi-file buckets are unioned unsorted at read).
    ``path`` makes the table external (files land there instead of the
    warehouse dir); the catalog entry is identical either way.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    sorts = (
        keys
        if sort_cols is None
        else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    if single_file_buckets:
        df = df.repartition(buckets, *keys)
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(buckets, keys[0], *keys[1:])
        .sortBy(sorts[0], *sorts[1:])
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_columns) of a catalog table, or None if the
    table exists without a bucket spec.  Reads DESCRIBE EXTENDED — the
    catalog's own record, not an assumption about how it was written."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    if "Num Buckets" not in info:
        return None
    n = int(info["Num Buckets"])
    cols = [c.strip(" `") for c in info["Bucket Columns"].strip("[]").split(",")]
    return n, cols


def bucketed_join_check(
    spark: SparkSession,
    left: str,
    right: str,
    left_on: list[str] | str,
    right_on: list[str] | str | None = None,
) -> bool:
    """True iff a join of catalog tables ``left`` ⋈ ``right`` on
    ``left_on`` = ``right_on`` (default: same names both sides) can
    reuse both bucket layouts (no Exchange on either side): both
    bucketed, each side's bucket columns exactly its join columns, and
    equal bucket counts (or coalescible when ``spark.sql.bucketing
    .coalesceBucketsInJoin.enabled`` is set and counts divide evenly).
    Differently-named keys (o_custkey = c_custkey) co-locate fine —
    bucket ids hash VALUES, not names."""
    l_cols = [left_on] if isinstance(left_on, str) else list(left_on)
    r_cols = (
        l_cols
        if right_on is None
        else ([right_on] if isinstance(right_on, str) else list(right_on))
    )
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    if ls is None or rs is None:
        return False
    (ln, lcols), (rn, rcols) = ls, rs
    if sorted(lcols) != sorted(l_cols) or sorted(rcols) != sorted(r_cols):
        return False
    if ln == rn:
        return True
    coalesce_on = (
        spark.conf.get(
            "spark.sql.bucketing.coalesceBucketsInJoin.enabled", "false"
        ).lower()
        == "true"
    )
    big, small = max(ln, rn), min(ln, rn)
    # Spark coalesces only up to maxBucketRatio (default 4): 64 vs 8
    # buckets divides evenly but exceeds the ratio, so Spark refuses to
    # coalesce and shuffles anyway — the check must refuse it too.
    max_ratio = int(
        spark.conf.get(
            "spark.sql.bucketing.coalesceBucketsInJoin.maxBucketRatio", "4"
        )
    )
    return coalesce_on and big % small == 0 and big // small <= max_ratio
