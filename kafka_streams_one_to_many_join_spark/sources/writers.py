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
    trigger_available_now: bool = False,
    **options: str,
) -> StreamingQuery:
    if trigger_processing_time and trigger_available_now:
        raise ValueError(
            "trigger_processing_time and trigger_available_now are mutually "
            "exclusive — a query has exactly one trigger"
        )
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
    if trigger_available_now:
        # drain everything pending, then stop — the run-to-completion mode
        # incremental pipelines (and restart-based tests) use
        writer = writer.trigger(availableNow=True)
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer.start(path) if path is not None else writer.start()


def write_stream_exactly_once(
    df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str | None = None,
) -> StreamingQuery:
    """Idempotent foreachBatch parquet sink: exactly-once across restarts.

    Spark's file sinks are exactly-once on their own, but foreachBatch —
    the escape hatch every real pipeline ends up in for multi-sink or
    JDBC-style writes — is only at-least-once: after a crash between the
    batch commit and the checkpoint write, the SAME (batch_id, data) is
    re-delivered.  The standard fix, implemented here: make the write
    idempotent by keying the output on batch_id (one
    ``batch_id=<n>`` partition directory per micro-batch, written with
    dynamic partition overwrite) so a replayed batch overwrites its own
    previous attempt instead of duplicating it.

    Scale: per-batch work is a plain parquet write, partitioned however
    ``df`` already is; the batch_id directory layout also gives readers
    incremental-consumption boundaries for free.
    """

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    writer = (
        df.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.start()
