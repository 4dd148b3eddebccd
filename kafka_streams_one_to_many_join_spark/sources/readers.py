"""Readers: parquet / json / csv / kafka / rate, batch and streaming.

Kafka options mirror the reference's consumer setup (topic subscribe,
earliest offsets — README.md:28-49 of the reference) but decode with
from_json in PERMISSIVE mode instead of crash-on-parse
(JsonSerdes.scala:40).  No broker exists in the test container, so the
kafka format is exercised only through its option-plumbing unit test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kafka_streams_one_to_many_join_spark.model import decode_json

_BATCH_FORMATS = {"parquet", "json", "csv", "orc", "text"}

# Read-only formats: binaryFile loads raw files as (path, modificationTime,
# length, content BINARY) rows — the ingestion path for the multimodal
# pipeline (functions/multimodal.py): raw image/audio files → binary
# column → Arrow-batched feature extraction.  Supported in batch and
# streaming; there is no binaryFile writer (persist assets as parquet).
_READ_ONLY_FORMATS = {"binaryFile"}


def read_batch(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    if fmt in _BATCH_FORMATS or fmt in _READ_ONLY_FORMATS:
        reader = spark.read.format(fmt)
        if schema is not None and fmt not in _READ_ONLY_FORMATS:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, v)
        return reader.load(path)
    if fmt == "kafka":
        reader = spark.read.format("kafka")
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.load()
        return decode_json(df, schema) if schema is not None else df
    raise ValueError(f"unsupported batch format: {fmt}")


def read_stream(
    spark: SparkSession,
    fmt: str,
    path: str | None = None,
    schema: StructType | None = None,
    **options: str,
) -> DataFrame:
    """Streaming reader.  File formats need an explicit schema (no streaming
    inference); 'rate' emits (timestamp, value BIGINT) rows — the generator
    substrate for synthetic_car_zone_events.

    binaryFile's schema is FIXED by the format, but streaming still
    demands one explicitly (the batch reader infers it) — supplied here
    so the raw-asset ingestion path streams with the same call shape as
    batch.
    """
    reader = spark.readStream.format(fmt)
    if fmt == "binaryFile":
        if schema is not None:
            raise ValueError(
                "binaryFile has a fixed schema (path, modificationTime, "
                "length, content); a caller-supplied schema would be "
                "silently ignored — omit it"
            )
        reader = reader.schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    elif schema is not None and fmt in _BATCH_FORMATS:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, str(v))
    df = reader.load(path) if path is not None else reader.load()
    if fmt == "kafka" and schema is not None:
        return decode_json(df, schema)
    return df


def synthetic_car_zone_events(
    spark: SparkSession,
    rows_per_second: int = 2,
    n_cars: int = 20,
    n_zones: int = 13,
    zone_base: int = 1000,
) -> tuple[DataFrame, DataFrame]:
    """The reference's FakeData generator as a rate-source pipeline.

    FakeData.scala:27-33: car_id uniform 1..20, zone_id uniform 1000..1012,
    fuel U(0,50), pollution U(0,200), one car + one zone event per tick.
    Deterministic stand-in for uniform draws: multiplicative hashing of the
    rate counter — stable across runs, unlike rand().
    """
    rate = read_stream(spark, "rate", rowsPerSecond=rows_per_second)
    v = F.col("value")
    h1 = F.abs(F.xxhash64(v, F.lit(1)))
    h2 = F.abs(F.xxhash64(v, F.lit(2)))
    cars = rate.filter(v % 2 == 0).select(
        v.alias("seq"),
        (h1 % n_cars + 1).cast("int").alias("car_id"),
        (h2 % n_zones + zone_base).cast("int").alias("to_zone_id"),
        ((h1 % 5000).cast("double") / 100.0).alias("fuel_level"),
    )
    zones = rate.filter(v % 2 == 1).select(
        v.alias("seq"),
        (h1 % n_zones + zone_base).cast("int").alias("zone_id"),
        ((h2 % 20000).cast("double") / 100.0).alias("pollution_level"),
    )
    return cars, zones
