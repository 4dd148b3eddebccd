"""Batch + streaming sources and sinks.

The reference reads/writes Kafka topics with a hand-rolled JSON serde
(DemoApp.scala:85,98; JsonSerdes.scala).  Here every source is a Spark
DataSource: parquet (the default analytical path — columnar, predicate
pushdown, partition pruning), JSON lines, Kafka (gated: no broker in the
test container), and the rate source standing in for the reference's
FakeData generator (FakeData.scala:38-48).
"""

from kafka_streams_one_to_many_join_spark.sources.bucketed import (
    BUCKETED_READ_CONFS,
    bucket_spec,
    bucketed_join_check,
    write_bucketed,
)
from kafka_streams_one_to_many_join_spark.sources.readers import (
    read_batch,
    read_stream,
    synthetic_car_zone_events,
)
from kafka_streams_one_to_many_join_spark.sources.writers import (
    write_batch,
    write_stream,
    write_stream_exactly_once,
)

__all__ = [
    "BUCKETED_READ_CONFS",
    "bucket_spec",
    "bucketed_join_check",
    "write_bucketed",
    "read_batch",
    "read_stream",
    "synthetic_car_zone_events",
    "write_batch",
    "write_stream",
    "write_stream_exactly_once",
]
