"""Core relational / stream-table operators (SURVEY.md §2).

The reference's operator inventory, re-expressed Spark-first:

  O1 change detection       → changes.car_moves (lag window / stateful op)
  O2 changelog→stream       → implicit (update output of the stateful op)
  O3 arrive/leave expansion → changes.arrive_leave_events (inline_outer)
  O4 re-key                 → choosing the join/group column (no-op operator)
  O5 repartition topic      → Spark shuffle exchange (automatic)
  O6+O7 symmetric join      → join.one_to_many_join (batch snapshot) /
                              streaming.symmetric_join (table semantics)
  O8 null filter            → Column.isNotNull (artifact, disappears)
  O9 merge                  → DataFrame.unionByName (bag union)
  T1/T2 state-as-table      → latest.latest_by_key (batch changelog view)
"""

from kafka_streams_one_to_many_join_spark.operators.asof import asof_join
from kafka_streams_one_to_many_join_spark.operators.changes import (
    arrive_leave_events,
    car_moves,
)
from kafka_streams_one_to_many_join_spark.operators.trace import (
    one_to_many_join_trace,
)
from kafka_streams_one_to_many_join_spark.operators.join import (
    fanout_counts,
    one_to_many_join,
)
from kafka_streams_one_to_many_join_spark.operators.latest import latest_by_key
from kafka_streams_one_to_many_join_spark.operators.sessionize import (
    session_stats,
    sessionize,
)
from kafka_streams_one_to_many_join_spark.operators.skew import (
    salted_count,
    salted_one_to_many_join,
)
from kafka_streams_one_to_many_join_spark.operators.interval import (
    bucketed_interval_join,
)
from kafka_streams_one_to_many_join_spark.operators.upsert import apply_upserts

__all__ = [
    "apply_upserts",
    "arrive_leave_events",
    "asof_join",
    "bucketed_interval_join",
    "car_moves",
    "fanout_counts",
    "latest_by_key",
    "one_to_many_join",
    "one_to_many_join_trace",
    "salted_count",
    "salted_one_to_many_join",
    "session_stats",
    "sessionize",
]
