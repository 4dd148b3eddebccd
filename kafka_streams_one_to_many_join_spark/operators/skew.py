"""Skew mitigation: salted aggregation and salted FK join.

AQE's skew-join splitting (enabled in session.py) handles most hot-key
cases at runtime; these operators are the *explicit* formulation for the
cases AQE cannot fix:

- **salted_count**: two-phase aggregation when a single group's row count
  dwarfs the rest AND the aggregate state itself is the problem (e.g.
  collect-type aggs where one reducer would hold the whole hot group).
  Phase 1 aggregates (key, salt) groups — the hot key spreads over
  ``buckets`` reducers; phase 2 merges the per-salt partials.  For
  algebraic aggs (count/sum/min/max) Spark's map-side partial aggregation
  already achieves the same effect; salting is the generalization that
  also works for holistic state.
- **salted_one_to_many_join**: hot FK values on the many side overwhelm
  one reducer of a shuffle join.  Salt the many side with a deterministic
  per-row bucket, replicate the (small) one side once per bucket, join on
  (fk, salt).  Replication factor = ``buckets`` — bounded, chosen, and
  independent of the skew severity.  (When the one side fits in memory,
  plain broadcast — one_to_many_join — is still the first choice; salting
  is for the middle regime: one side too big to broadcast, many side
  skewed.)

Salt is ``pmod(xxhash64(<row identity>), buckets)`` — deterministic, no
rand(): replays and retries produce identical partitioning (a failed task
re-executed with rand() salt would double-count rows).

MEASURED guidance (SCALE.md "Skewed-key stress", round 10; zipf-1.1
twins, hottest key ~13% of 15 M fact rows, two dim:fact ratios): AQE
skew-split beat the unsalted victim 1.5–1.8× and every salted variant
at BOTH ratios — prefer it for plain FK joins.  Salting's dim-side
replication is a real tax (at 1:10 dim:fact, buckets=16 LOST outright),
and even where replication is nearly free (1:100) salting recovers only
~half of AQE's win, because it still re-shuffles every fact row while
AQE splits just the hot partitions.  Pick the smallest ``buckets`` that
caps the straggler (hot-key share × buckets ≲ balanced share), and
reach for salting only where AQE cannot see the skew — holistic agg
state, no-AQE engines, same-key stateful ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(identity_cols: list[str], buckets: int) -> Column:
    return F.pmod(F.xxhash64(*identity_cols), F.lit(buckets)).cast("int")


def salted_count(
    df: DataFrame,
    keys: list[str],
    identity_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """count(*) per keys, two-phase through (keys, salt) partials.

    Returns (keys..., n BIGINT) — identical to groupBy(keys).count().
    """
    partial = (
        df.withColumn("_salt", _salt(identity_cols, buckets))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    return partial.groupBy(*keys).agg(F.sum("_pn").cast("bigint").alias("n"))


def salted_one_to_many_join(
    many: DataFrame,
    one: DataFrame,
    fk: str,
    identity_cols: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """FK equi-join resilient to hot FK values on the many side.

    Output is column-identical to ``many.join(one, fk, how)`` (salt column
    dropped); only the physical row distribution differs.
    """
    salted_many = many.withColumn("_salt", _salt(identity_cols, buckets))
    replicated_one = one.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {buckets - 1})"))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = salted_many.join(replicated_one, on=[fk, "_salt"], how=how)
    return out.drop("_salt")
