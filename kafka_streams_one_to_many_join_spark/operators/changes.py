"""Change detection and arrive/leave expansion (reference O1 + O3).

O1 (DemoApp.scala:86,116-119): fold each car's event stream into its latest
CarMove — previous zone vs new zone.  Batch form: ``lag(zone) OVER
(PARTITION BY car ORDER BY seq)``.  This is inherently a per-key sequential
computation, so a window is the right tool here (unlike latest_by_key);
the partition-by key bounds the sort to one car's history.

O3 (DemoApp.scala:125-130): explode one CarMove into up to two CarMoveEvents
— arriving at the new zone always, leaving the previous zone if there was
one.  Faithful quirk (SURVEY.md §2, FIXTURES.md edge case 4): the reference
emits arrive-then-leave even when the zone is UNCHANGED (carMoveHandler only
filters the -1 sentinel, not zone equality), so a same-zone re-arrival both
rows too — callers replaying reference traces depend on it.

Implemented with ``inline_outer(array(structs))`` — a Catalyst generator,
whole-stage-codegen'd, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def car_moves(
    events: DataFrame,
    key: str = "car_id",
    zone: str = "to_zone_id",
    order_by: str | list[str] = "seq",
    payload: str = "fuel_level",
) -> DataFrame:
    """Per event: (key, from_zone nullable, to_zone, payload).

    ``from_zone`` NULL on a car's first event — the reference's noPrevMov
    sentinel (DemoApp.scala:146) mapped to SQL NULL.
    """
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(key).orderBy(*order_by)
    return events.select(
        F.col(key).alias("car_id"),
        F.lag(F.col(zone)).over(w).alias("from_zone_id"),
        F.col(zone).alias("to_zone_id"),
        F.col(payload).alias("fuel_level"),
        *[F.col(c) for c in order_by],
    )


def arrive_leave_events(moves: DataFrame) -> DataFrame:
    """CarMove → 1-2 CarMoveEvents: arrive at to_zone (+ leave from_zone).

    Emission order within a move is arrive-then-leave
    (``arrivingEvent +: leavingEvent``, DemoApp.scala:129) — materialized
    here as ``emit_rank`` 0/1 so event-trace consumers (the streaming join's
    put-then-delete behaviour) can preserve it.
    """
    order_cols = [c for c in moves.columns if c not in
                  ("car_id", "from_zone_id", "to_zone_id", "fuel_level")]
    arrive = F.struct(
        F.col("to_zone_id").alias("zone_id"),
        F.lit(True).alias("is_arriving"),
        F.lit(0).alias("emit_rank"),
    )
    leave = F.when(
        F.col("from_zone_id").isNotNull(),
        F.struct(
            F.col("from_zone_id").alias("zone_id"),
            F.lit(False).alias("is_arriving"),
            F.lit(1).alias("emit_rank"),
        ),
    )
    return (
        moves.select(
            "car_id",
            "fuel_level",
            *order_cols,
            F.inline_outer(F.array_compact(F.array(arrive, leave))),
        )
        .select("car_id", "zone_id", "is_arriving", "emit_rank", "fuel_level", *order_cols)
    )
