"""Gap-based sessionization — batch twin of streaming session windows.

The reference has no session concept (no timestamps at all,
DemoApp.scala:62-63); this is part of the general temporal surface a
training-data pipeline needs (session windows are a Spark built-in on the
streaming side via ``F.session_window`` — this operator is the batch
formulation that an oracle can replay).

Physical shape: one shuffle by key, one sort per partition; both window
functions (the gap flag and the running session counter) share the same
(key, order) window frame, so Catalyst plans a single Window node.  At
100 TB: sessions never materialize per-event state beyond the sort — the
cumulative-sum trick is embarrassingly parallel per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: int | Column,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same key exceeds ``gap``.

    ``gap`` is an int (same units as a numeric ``ts_col``) or a Column —
    pass an interval literal (``F.expr("INTERVAL 30 MINUTES")``) when
    ``ts_col`` is a TIMESTAMP, since timestamp subtraction yields a
    day-time interval.

    Output: input columns + ``session_id`` (1-based per key, in ts order).
    """
    gap_lit = gap if isinstance(gap, Column) else F.lit(gap)
    w = Window.partitionBy(key).orderBy(ts_col)
    is_new = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > gap_lit, 1
    ).otherwise(0)
    # first event of a key has lag NULL → comparison NULL → otherwise(0);
    # the running sum then starts at 0, so add 1 for 1-based ids
    running = Window.partitionBy(key).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", (F.sum(is_new).over(running) + 1).cast("bigint"))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap: int | Column,
) -> DataFrame:
    """Per-session aggregate view: (key, session_id, session_start,
    session_end, n_events).  ``gap`` as in :func:`sessionize` — an int for
    numeric ``ts_col``, or an interval-literal Column for TIMESTAMPs."""
    return (
        sessionize(df, key, ts_col, gap)
        .groupBy(key, "session_id")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
