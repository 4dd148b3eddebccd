"""Streaming token-window chunking — the stream twin of
functions.packing.token_chunks.

Chunking is STATELESS per document (every output row is a pure function
of one input row), so the twin is the batch transformation applied to
the streaming DataFrame directly: no keyed state, no watermark, append
output mode, and exactly-once through any checkpointed file/Kafka
source + idempotent sink (chunk_id = md5(id:chunk_no) is the natural
upsert key).  This module exists so the "every batch operator has a
streaming story" invariant is explicit and testable rather than
implied — the replay-equivalence test (tests/test_streaming.py)
asserts a 3-batch replay emits exactly the batch operator's chunk set.

Scale: identical to the batch operator — one scan, zero shuffles, no
UDF; per micro-batch the row amplification is bounded by the chosen
budget/stride overlap factor.  ``ensure_parallelism`` inside
``token_chunks`` is a no-op for streaming DataFrames (model.py), so the
stream plan is the same projection without the batch-only repartition
guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from kafka_streams_one_to_many_join_spark.functions.packing import token_chunks


def streaming_token_chunks(
    docs: DataFrame,
    budget: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunks over a document stream; append
    semantics, one row per (doc, chunk)."""
    if not docs.isStreaming:
        raise ValueError(
            "streaming_token_chunks expects a streaming DataFrame; "
            "use functions.packing.token_chunks for batch inputs"
        )
    return token_chunks(
        docs, budget=budget, stride=stride, id_col=id_col, text_col=text_col
    )
