"""Bucketed interval join: points ⋈ intervals containing them.

The naive formulation — equi-join on the partition key with a range
residual — evaluates |points per key| × |intervals per key| pairs,
quadratic per key.  Bucketing the ordinal domain makes the pair count
proportional to matches: every interval is replicated onto the fixed-width
buckets it overlaps, every point probes exactly ONE bucket, and the join
becomes equi on (key, bucket) with the range check as a residual.  No
duplicate results by construction (a point has one bucket).

This is the engine behind the trace operator's zone-side fan-out
(operators/trace.py, measured 18.1s → 2.8s at sf0.1) and the general
scale answer for point-in-interval workloads (IP→range lookups, slowly
changing dimensions, validity windows).

Width choice: two width-dependent overheads bracket the unavoidable
match output — interval replication (|intervals| x len/W) falls with W,
excess pair evaluations (every point probes every interval overlapping
its bucket: ≈ |points| x |intervals| x W / span beyond the true
matches) rise with W.  For SPARSE intervals (len ≈ spacing) any W near
the typical length works; for DENSE intervals (many concurrent per key,
e.g. the trace's residency intervals) the optimum is the sqrt law
W* = sqrt(len x span / |points|), and a constant tuned at one scale
drifts off it as the data grows (sqrt(len) — measured in SCALE.md round
9).  For data-dependent widths pass ``bucket`` as a 1-row DataFrame
with a ``_bw`` BIGINT column (computed IN-PLAN from the caller's
knowledge of the density — no driver action, it broadcasts like
``end_open_max``); results are identical for any positive width.

Join strategy: at scale both sides grow with the data, so the bucket
equi-join plans as a sort-merge join — a MEASURED choice, not a
default: forcing a shuffled-hash build was ~30% slower on the sf1
trace workload (high-fan-out probes traverse long per-(key,bucket)
chains, while the merge path streams matches from the co-sorted runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ord: str,
    start: str,
    end: str,
    bucket: int | DataFrame = 1024,
    end_exclusive: bool = True,
    end_open_max: Column | None = None,
) -> DataFrame:
    """Rows of ``points`` joined to every interval of the same key
    containing their ordinal: start < point_ord (< or <=) end.

    ``end`` may be NULL (open interval); open intervals extend to
    ``end_open_max`` (default: the max point ordinal, computed via a
    1-row broadcast).  Output: all columns of both inputs (except
    internal bucket columns); the point must lie strictly after
    ``start`` and before ``end`` (exclusive by default, mirroring
    interval semantics [start, end)).

    ``bucket``: fixed width (int), or a 1-row DataFrame carrying the
    width as a ``_bw`` BIGINT column — the data-adaptive mode (see the
    module docstring); it is broadcast onto both sides, so the width is
    a pure in-plan scalar and results are identical for ANY positive
    width (the width only moves work, never semantics).  A dynamic
    bucket frame may ALSO carry an ``_omax`` BIGINT column (the open-
    interval bound); callers that already aggregate the points side for
    the width should ride ``max(point_ord)`` along in the same pass —
    it saves one scan of ``points`` and one 1-row attach here.
    """
    dynamic = not isinstance(bucket, int)
    if dynamic and "_omax" in bucket.columns:
        if end_open_max is not None:
            raise ValueError(
                "end_open_max conflicts with a bucket frame that already "
                "carries an _omax column — supply the bound through one "
                "channel only"
            )
        bound = None  # bound rides on the bucket frame (one shared attach)
    elif end_open_max is None:
        bound = points.agg(F.max(point_ord).alias("_omax"))
    else:
        bound = points.sparkSession.range(1).select(end_open_max.alias("_omax"))
    bexpr = "_bw" if dynamic else str(bucket)
    upper = f"coalesce({end} - 1, _omax)" if end_exclusive else f"coalesce({end}, _omax)"
    iv = intervals
    if bound is not None:
        iv = iv.crossJoin(F.broadcast(bound))
    if dynamic:
        iv = iv.crossJoin(F.broadcast(bucket))
    iv = (
        # intervals starting at/after the last point can never match, and
        # would make the bucket sequence descend
        iv.filter(F.col(start) <= F.col("_omax"))
        .withColumn(
            "_bkt",
            F.explode(
                F.expr(
                    f"sequence(cast({start} div {bexpr} as bigint), "
                    f"cast(least({upper}, _omax) div {bexpr} as bigint))"
                )
            ),
        )
        .drop("_omax", *(["_bw"] if dynamic else []))
    )
    pts = points
    if dynamic:
        pts = pts.crossJoin(F.broadcast(bucket))
    pts = pts.withColumn(
        "_bkt", F.expr(f"cast({point_ord} div {bexpr} as bigint)")
    ).drop(*(["_bw", "_omax"] if dynamic else []))
    end_pred = (
        F.col(end).isNull()
        | (F.col(point_ord) < F.col(end) if end_exclusive else F.col(point_ord) <= F.col(end))
    )
    return (
        pts.alias("p")
        .join(
            iv.alias("i"),
            on=(
                (F.col(f"p.{on}") == F.col(f"i.{on}"))
                & (F.col("p._bkt") == F.col("i._bkt"))
                & (F.col(point_ord) > F.col(start))
                & end_pred
            ),
        )
        .drop("_bkt")
    )
