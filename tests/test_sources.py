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
