"""Sources/sinks: format round-trips, the permissive JSON corrupt-record
channel (the JsonSerdes.scala:40 crash-on-parse fix), and the synthetic
generator's column contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.model import (
    CAR_ARRIVAL_EVENT,
    decode_json,
    encode_json,
)
from kafka_streams_one_to_many_join_spark.sources import read_batch, write_batch
from kafka_streams_one_to_many_join_spark.sources.readers import (
    synthetic_car_zone_events,
)

ROWS = [(0, 1, 100, 10.5), (1, 2, 101, 20.25)]
SCHEMA = "seq long, car_id int, to_zone_id int, fuel_level double"


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_batch(df, "parquet", f"{tmp_path}/p")
    back = read_batch(spark, "parquet", f"{tmp_path}/p")
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_json_roundtrip_with_schema(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_batch(df, "json", f"{tmp_path}/j")
    back = read_batch(spark, "json", f"{tmp_path}/j", schema=df.schema)
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_csv_roundtrip_with_header(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_batch(df, "csv", f"{tmp_path}/c", header="true")
    back = read_batch(spark, "csv", f"{tmp_path}/c", schema=df.schema, header="true")
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_decode_json_permissive_corrupt_channel(spark):
    """Malformed payloads land in _corrupt_record with NULL fields instead
    of killing the pipeline (the reference crashes: JsonSerdes.scala:40)."""
    raw = spark.createDataFrame(
        [
            ('{"seq": 0, "car_id": 1, "to_zone_id": 100, "fuel_level": 1.5}',),
            ("{not json at all",),
        ],
        "value string",
    )
    out = decode_json(raw, CAR_ARRIVAL_EVENT).collect()
    good = [r for r in out if r._corrupt_record is None]
    bad = [r for r in out if r._corrupt_record is not None]
    assert len(good) == 1 and good[0].car_id == 1 and good[0].fuel_level == 1.5
    assert len(bad) == 1 and bad[0].car_id is None
    assert bad[0]._corrupt_record == "{not json at all"


def test_encode_decode_json_identity(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    wire = df.select(encode_json(df).alias("value"))
    back = decode_json(wire, CAR_ARRIVAL_EVENT).drop("value", "_corrupt_record")
    assert sorted(tuple(r) for r in back.collect()) == sorted(ROWS)


def test_synthetic_generator_contract(spark):
    """Rate-source generator: streaming DFs with the reference's schema and
    value ranges (FakeData.scala:27-33) — checked on the logical schema
    (no broker/clock needed)."""
    cars, zones = synthetic_car_zone_events(spark)
    assert cars.isStreaming and zones.isStreaming
    assert set(cars.columns) == {"seq", "car_id", "to_zone_id", "fuel_level"}
    assert set(zones.columns) == {"seq", "zone_id", "pollution_level"}


def test_exactly_once_sink_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id, same rows — the crash-
    between-commit-and-checkpoint case foreachBatch exposes) must
    overwrite its own partition, not append a duplicate; distinct batches
    land in distinct batch_id partitions."""
    from kafka_streams_one_to_many_join_spark.sources.writers import (
        write_stream_exactly_once,
    )

    src = f"{tmp_path}/src"
    out = f"{tmp_path}/out"
    schema = "k int, v string"
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = write_stream_exactly_once(
        spark.readStream.schema(schema).parquet(src),
        path=out,
        checkpoint=f"{tmp_path}/cp",
        query_name="eo_sink",
    )
    q.processAllAvailable()
    # second micro-batch
    spark.createDataFrame([(3, "c")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q.processAllAvailable()
    q.stop()
    got = {(r.k, r.v, r.batch_id) for r in spark.read.parquet(out).collect()}
    assert got == {(1, "a", 0), (2, "b", 0), (3, "c", 1)}
    # simulate the at-least-once replay: re-run batch 0's write directly
    from pyspark.sql import functions as F

    (
        spark.createDataFrame([(1, "a"), (2, "b")], schema)
        .withColumn("batch_id", F.lit(0))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )
    again = {(r.k, r.v, r.batch_id) for r in spark.read.parquet(out).collect()}
    assert again == got  # no duplicates, batch 1 untouched


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    write_batch(df, "orc", str(tmp_path / "o"))
    back = read_batch(spark, "orc", str(tmp_path / "o"))
    assert sorted(back.collect()) == sorted(df.collect())
    assert back.schema == df.schema


def test_text_reader(spark, tmp_path):
    (tmp_path / "a.txt").write_text("hello\nworld\n")
    back = read_batch(spark, "text", str(tmp_path / "a.txt"))
    assert [r.value for r in back.orderBy("value").collect()] == ["hello", "world"]


def test_binary_file_feeds_multimodal_pipeline(spark, tmp_path):
    """binaryFile is the raw-asset ingestion path: files on disk become
    (path, content BINARY) rows that plug straight into the multimodal
    feature extractors' (asset_id, payload) contract."""
    from kafka_streams_one_to_many_join_spark.functions.multimodal import (
        asset_metadata,
    )

    payloads = {"x.bin": b"\x00\x01\x02imagebytes", "y.bin": b"\xff" * 64}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    raw = read_batch(
        spark, "binaryFile", str(tmp_path), pathGlobFilter="*.bin"
    )
    assert set(raw.columns) == {"path", "modificationTime", "length", "content"}
    assets = raw.select(
        F.element_at(F.split("path", "/"), -1).alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.col("content").alias("payload"),
    )
    meta = {r.asset_id: r for r in asset_metadata(assets).collect()}
    assert meta["y.bin"].n_bytes == 64
    import hashlib

    assert meta["x.bin"].digest == hashlib.md5(payloads["x.bin"]).hexdigest()


def test_read_stream_binaryfile_rejects_caller_schema(spark, tmp_path):
    """binaryFile's schema is fixed by the format; a caller-supplied one
    used to be silently ignored — now it's a loud contract violation."""
    import pytest
    from pyspark.sql.types import StructType

    from kafka_streams_one_to_many_join_spark.sources.readers import read_stream

    with pytest.raises(ValueError, match="fixed schema"):
        read_stream(spark, "binaryFile", str(tmp_path), schema=StructType([]))


def test_write_stream_rejects_contradictory_triggers(spark, tmp_path):
    """A streaming query has exactly one trigger: asking for both a
    processing-time cadence and availableNow must fail loudly instead of
    silently letting the later .trigger() call win."""
    import pytest

    from kafka_streams_one_to_many_join_spark.sources.readers import read_stream
    from kafka_streams_one_to_many_join_spark.sources.writers import write_stream

    stream = read_stream(spark, "rate", rowsPerSecond="1")
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_stream(
            stream, "memory", query_name="contradictory_triggers",
            trigger_processing_time="1 second", trigger_available_now=True,
        )
