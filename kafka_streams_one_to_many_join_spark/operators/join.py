"""One-to-many foreign-key join — the reference's core capability.

The reference maintains the join continuously with a symmetric pair of
stateful transformers sharing two stores (DemoApp.scala:93-102,187-298); the
batch snapshot semantics are: latest state of the many side inner-joined to
latest state of the one side on the FK (SURVEY.md §3.2).  Inner, not left —
an unmatched many-side row emits nothing (DemoApp.scala:219-222).

Scale design: the one side of a one-to-many join is, by construction, the
low-cardinality side (zones vs cars; customers vs orders).  When the caller
asserts it fits in memory we broadcast it — the probe side then never
shuffles at all, which is the decisive win at 100 TB (shuffling the many
side is the single most expensive thing this engine could do).  When the one
side is NOT broadcastable, we fall through to Catalyst's sort-merge/shuffle-
hash with AQE skew splitting; both sides hash-partition on the FK — the
in-engine version of the reference's co-partitioning `through` topic
(DemoApp.scala:78-79,90), without the broker round trip.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def one_to_many_join(
    many: DataFrame,
    one: DataFrame,
    fk: str | Sequence[str],
    how: str = "inner",
    broadcast_one_side: bool = True,
) -> DataFrame:
    """Join the many side to the one side on the foreign key.

    ``how='inner'`` matches the reference (unmatched cars are suppressed,
    DemoApp.scala:219-222); pass 'left' for the keep-unmatched variant the
    reference's class name (`CarEventLeftJoinZone`) advertised but did not
    implement.
    """
    on = [fk] if isinstance(fk, str) else list(fk)
    one_side = F.broadcast(one) if broadcast_one_side else one
    return many.join(one_side, on=on, how=how)


def fanout_counts(many: DataFrame, fk: str | Sequence[str]) -> DataFrame:
    """Rows the 1-side would fan out to, per FK value.

    The reference's zone-side transformer re-emits one joined row per car
    currently in the zone (range scan + forward loop, DemoApp.scala:281-290);
    this is the per-zone match count that bounds that fan-out — a partial-agg
    count, shuffle volume O(distinct fk).
    """
    on = [fk] if isinstance(fk, str) else list(fk)
    return many.groupBy(*on).agg(F.count(F.lit(1)).alias("fanout"))
