"""Batch replay of the reference's *event-level* join output trace.

The snapshot join (latest ⋈ latest) answers "what does the joined table
look like now"; this operator answers the stronger question the reference
actually computes: **which joined rows were emitted, one per triggering
event** (DemoApp.scala:57-60) — re-emission on either side's update, inner
suppression of unknown zones, delete propagation, and the same-zone
re-arrival quirk (FIXTURES.md edge cases 1-6) all included.  It is the
batch oracle the streaming operator (streaming/join.py) is tested against.

Semantics replayed (seq = global arrival order):

- car event e: emits (car, zone, fuel, pollution-as-of-e) iff some zone
  event for that zone precedes e (DemoApp.scala:210-222) — an as-of join.
- zone event z: emits one row per car *in the zone's store* at z.seq
  (DemoApp.scala:279-290).  A car is in the store from a *sticky* arrival
  (first event, or zone ≠ previous zone) until its next event — any next
  event removes it: a move deletes the old entry (DemoApp.scala:224-230),
  and a same-zone re-arrival put-then-deletes the same key (the quirk,
  DemoApp.scala:116-119,129).  Residency is therefore an interval
  [arrival.seq, next_event.seq), and zone-side emissions are an interval
  join.

Scale: the as-of side is one shuffle + sort (operators/asof.py).  The
interval join is equi on zone_id with a range residual — fine while
per-zone event counts are modest; at pathological per-key volumes,
bucketize seq ranges first (documented trade; the streaming operator is
the truly incremental path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.operators.asof import asof_join
from kafka_streams_one_to_many_join_spark.operators.interval import (
    bucketed_interval_join,
)


def one_to_many_join_trace(car_ev: DataFrame, zone_ev: DataFrame) -> DataFrame:
    """Emission trace of the continuously-maintained one-to-many join.

    car_ev:  (seq BIGINT, car_id, zone_id, fuel_level)
    zone_ev: (seq BIGINT, zone_id, pollution_level)
    Returns the multiset of emitted (car_id, zone_id, fuel_level,
    pollution_level) rows.
    """
    # --- car-triggered emissions: pollution as of the car event ---
    car_emit = (
        asof_join(
            car_ev,
            zone_ev,
            on="zone_id",
            ord_col="seq",
            value_cols=["pollution_level"],
            strict=True,
        )
        .filter(F.col("pollution_level").isNotNull())
        .select("car_id", "zone_id", "fuel_level", "pollution_level")
    )

    # --- zone-triggered fan-out: cars resident in the zone at z.seq ---
    # Residency is an interval [arrival.seq, next_event.seq); the naive
    # equi-join on zone_id with a range residual is quadratic per key
    # (measured 390M evaluations for 11.8M matches at sf0.1).  The
    # bucketed interval join makes pairs evaluated ≈ matches (see
    # operators/interval.py; 18.1s → 2.8s at sf0.1).
    #
    # The bucket width is ADAPTIVE, not fixed.  Two width-dependent costs
    # bracket the unavoidable match output: interval REPLICATION
    # (|intervals| x len/W rows) shrinks with W, while EXCESS PAIR
    # EVALUATIONS (each point probes every interval overlapping its
    # bucket, ≈ |points| x |intervals| x W / span beyond the true
    # matches) grow with W — residency intervals are DENSE here (every
    # car always has exactly one open interval), so both terms are real.
    # Minimizing their sum gives the sqrt law
    #     W* = sqrt(len x span / |points|),    len = span x |cars| / |car events|
    # which is ~77 at sf0.1 and ~775 at sf10 — the fixed 1024 was near
    # the sweet spot at bench scale by luck and drifts off it as
    # sqrt(len) a decade up (SCALE.md round 9; the dominant sf10 cost is
    # the ~100x semantic output growth — fanout ∝ car population — and
    # the adaptive width keeps the overhead terms a few % of it instead
    # of a multiple).  The width is a 1-row in-plan broadcast (cheap
    # narrow-column aggregates, no driver action), floored at 64; any
    # positive width yields identical results (pinned by the
    # interval-join test).
    # One narrow-column agg per side; the zone-side pass ALSO carries
    # max(seq) as the interval join's open-interval bound (_omax), so
    # the join skips its own points agg — one scalar frame, two scans.
    width = (
        car_ev.agg(
            F.expr("cast(max(seq) as double)").alias("_span"),
            F.expr("cast(approx_count_distinct(car_id) as double)").alias("_cars"),
            F.expr("cast(count(1) as double)").alias("_cev"),
        )
        .crossJoin(
            F.broadcast(
                zone_ev.agg(
                    F.expr("cast(count(1) as double)").alias("_npts"),
                    F.expr("max(seq)").alias("_omax"),
                )
            )
        )
        .select(
            F.expr(
                "greatest(64, cast(sqrt(_span * _span * _cars "
                "/ nullif(_cev * _npts, 0.0)) as bigint))"
            ).alias("_bw"),
            "_omax",
        )
    )
    w = Window.partitionBy("car_id").orderBy("seq")
    moves = car_ev.select(
        "car_id",
        "fuel_level",
        F.col("zone_id").alias("_m_zone"),
        F.col("seq").alias("_start_seq"),
        F.lag("zone_id").over(w).alias("_prev_zone"),
        F.lead(F.col("seq")).over(w).alias("_end_seq"),
    )
    sticky = moves.filter(
        F.col("_prev_zone").isNull() | (F.col("_prev_zone") != F.col("_m_zone"))
    ).withColumnRenamed("_m_zone", "zone_id").drop("_prev_zone")
    zone_emit = bucketed_interval_join(
        points=zone_ev,
        intervals=sticky,
        on="zone_id",
        point_ord="seq",
        start="_start_seq",
        end="_end_seq",
        bucket=width,
    ).select(
        F.col("i.car_id").alias("car_id"),
        F.col("p.zone_id").alias("zone_id"),
        F.col("i.fuel_level").alias("fuel_level"),
        F.col("p.pollution_level").alias("pollution_level"),
    )
    return car_emit.unionByName(zone_emit)
