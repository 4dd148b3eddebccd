"""As-of join — "for each left row, the latest right row at or before it".

Spark has no native as-of join (guide: bucketize or merge_asof); the
scalable formulation used here is the union + last_value trick:

  union both sides (right rows carry the value, left rows NULL) →
  one shuffle on the equi-key → per-partition sort by (ord, side) →
  last_value(value IGNORE NULLS) over the preceding frame.

One shuffle + one sort, no range join, no per-group pandas — O(n log n)
per key and AQE-skew-splittable, which is what survives at 100 TB (a
range-condition join degrades to per-key quadratic; merge_asof per group
drops to Python).  Strict (<) vs inclusive (≤) is encoded purely in the
tiebreak side ordering.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    ord_col: str,
    value_cols: Sequence[str],
    strict: bool = True,
) -> DataFrame:
    """Each left row gains the value_cols of the latest right row with
    right.ord < left.ord (strict) or ≤ (inclusive), matching on ``on``.

    ``ord_col`` must exist on both sides and be unique per side for
    deterministic results.  Left rows with no prior right row get NULLs
    (left-join character).
    """
    on = [on] if isinstance(on, str) else list(on)
    # side ordering encodes strictness: at equal ord, a left row must not
    # see the right row in strict mode → left sorts first.
    left_side, right_side = (0, 1) if strict else (1, 0)
    lcols = [c for c in left.columns]
    packed = F.struct(*[F.col(c) for c in value_cols]).alias("_rv")
    l_tagged = left.select(
        *on,
        F.col(ord_col).alias("_ord"),
        F.lit(left_side).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        F.lit(None).cast(
            right.select(packed).schema["_rv"].dataType
        ).alias("_rv"),
    )
    r_tagged = right.select(
        *on,
        F.col(ord_col).alias("_ord"),
        F.lit(right_side).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in lcols]).alias("_lrow")).schema["_lrow"].dataType
        ).alias("_lrow"),
        packed,
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ord"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged).withColumn(
        "_asof", F.last(F.col("_rv"), ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_lrow").isNotNull()).select(
        "_lrow.*", *[F.col(f"_asof.{c}").alias(c) for c in value_cols]
    )
    return out
