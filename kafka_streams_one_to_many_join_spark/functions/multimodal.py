"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The container has no image/audio codecs, so the *decode* steps are stubs
(deterministic fakes or NotImplementedError), but every piece of Spark
plumbing around them is real and tested: the asset schema, the binary
column handling, partition-sized Arrow batching through mapInPandas, and
the metadata projections that stay JVM-side.

Scale notes: binary payloads ride the same columnar parquet path as
everything else; metadata-only queries never deserialize the payload
(column pruning — verified in tests via the scan's ReadSchema).  Decode
fan-out is mapInPandas so one task handles one Arrow batch of assets at a
time — memory is bounded by batch size, not partition size, via
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image/audio/video
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),
    ]
)


def asset_metadata(assets: DataFrame) -> DataFrame:
    """Payload-level metadata without decoding: byte length + md5 digest.

    Pure JVM expressions over the binary column — the cheap integrity /
    dedup pass that runs before any expensive decode.
    """
    return assets.select(
        "asset_id",
        "media_type",
        F.length(F.col("payload")).cast("bigint").alias("n_bytes"),
        F.md5(F.col("payload")).alias("digest"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int]:
    """Stand-in for a real image decoder (no codec libs in this container).

    Deterministic fake: derives a (width, height) from the payload bytes so
    tests are reproducible.  A real deployment swaps this single function
    for PIL/opencv; the Spark plumbing around it is unchanged.
    """
    if payload is None:
        raise NotImplementedError("real image decoding needs a codec library")
    h = sum(payload[:16]) if payload else 0
    return (64 + h % 256, 64 + (h // 7) % 256)


def extract_image_features(assets: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode-and-measure pipeline: mapInPandas over Arrow batches.

    Output: (asset_id, width, height, n_bytes).  The decode is the stub
    above; the batching, schema, and partitioning are the real article.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            dims = [decode_image_stub(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    return ensure_parallelism(
        assets.filter(F.col("media_type") == "image")
    ).mapInPandas(
        decode_batches, schema="asset_id bigint, width int, height int, n_bytes bigint"
    )


def sample_frames_stub(assets: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explodes a (fake) frame index list per
    asset.  Real frame extraction would replace the index expression with a
    decoder call inside mapInPandas; downstream operators only see
    (asset_id, frame_no, frame_payload) rows either way.
    """
    return (
        assets.filter(F.col("media_type") == "video")
        .select(
            "asset_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(length(payload) / (1024 * {every_nth}) as int)), i -> i * {every_nth})"
                )
            ).alias("frame_no"),
            F.lit(None).cast("binary").alias("frame_payload"),
        )
    )


def decode_audio_stub(payload: bytes) -> tuple[int, int]:
    """Stand-in for a real audio decoder (no codec libs in this container).

    Deterministic fake (sample_rate, n_samples) derived from the payload
    so tests reproduce; swap for soundfile/librosa in deployment — the
    mapInPandas plumbing is identical.
    """
    if payload is None:
        raise NotImplementedError("real audio decoding needs a codec library")
    h = sum(payload[:16]) if payload else 0
    rates = (8000, 16000, 22050, 44100, 48000)
    return (rates[h % len(rates)], 1000 + (h * 37) % 100000)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Audio decode-and-measure: mapInPandas over Arrow batches.

    Output: (asset_id, sample_rate, n_samples, duration_s).  Same scale
    contract as extract_image_features: memory bounded by Arrow batch
    size, payload column pruned for any downstream query not using it.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode_audio_stub(p) for p in pdf["payload"]]
            rates = [f[0] for f in feats]
            samples = [f[1] for f in feats]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "sample_rate": rates,
                    "n_samples": samples,
                    "duration_s": [s / r for s, r in zip(samples, rates)],
                }
            )

    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    return ensure_parallelism(
        assets.filter(F.col("media_type") == "audio")
    ).mapInPandas(
        decode_batches,
        schema="asset_id bigint, sample_rate int, n_samples bigint, duration_s double",
    )
