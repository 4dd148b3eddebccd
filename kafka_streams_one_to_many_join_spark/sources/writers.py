"""Writers: parquet/json/csv batch sinks; console/memory/kafka/parquet
streaming sinks.

The reference's only sink is stdout (DemoApp.scala:107) plus the producers
in FakeData; here the same record stream can land in any Spark sink, with
to_json(struct(*)) reproducing the reference's JSON wire format for Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def write_batch(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    if fmt == "kafka":
        df.select(F.to_json(F.struct(*df.columns)).alias("value")).write.format(
            "kafka"
        ).options(**options).save()
        return
    writer.save(path)


def write_stream(
    df: DataFrame,
    fmt: str,
    path: str | None = None,
    query_name: str | None = None,
    output_mode: str = "append",
    checkpoint: str | None = None,
    trigger_processing_time: str | None = None,
    **options: str,
) -> StreamingQuery:
    out = df
    if fmt == "kafka":
        out = df.select(F.to_json(F.struct(*df.columns)).alias("value"))
    writer = out.writeStream.format(fmt).outputMode(output_mode)
    if query_name:
        writer = writer.queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_processing_time:
        writer = writer.trigger(processingTime=trigger_processing_time)
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer.start(path) if path is not None else writer.start()
