"""Streaming: the continuously-maintained one-to-many join with table
semantics (upsert both sides, delete propagation on the many side,
re-emission on either side's update) — the capability the reference was
built to demonstrate (DemoApp.scala:50-60) and that Spark's declarative
stream-stream joins cannot express (append-only, no retraction/delete).
"""

from kafka_streams_one_to_many_join_spark.streaming.join import (
    car_move_detection,
    symmetric_one_to_many_join,
    tag_car_moves,
    tag_zone_events,
)

__all__ = [
    "car_move_detection",
    "symmetric_one_to_many_join",
    "tag_car_moves",
    "tag_zone_events",
]
