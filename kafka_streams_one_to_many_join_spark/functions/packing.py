"""Sequence packing — concat-and-chunk token-budget packing for training
data: documents are concatenated in deterministic ``id`` order and the
resulting token stream is split into budget-``B`` training sequences; each
document belongs to the sequence where its first token lands (the packing
GPT-style pretraining pipelines use between tokenization and batching).

The reference engine has no token/budget notion (it joins car/zone event
streams, DemoApp.scala:44-55) — this is part of the LLM-training-pipeline
surface built on the same documents table.  Semantics are pinned exactly so
a SQL oracle can replay them:

    start(d)  = SUM(n_tokens) over all docs with id < d.id   (exact integer)
    seq_id(d) = start(d) DIV budget + 1                      (1-based)

Sequences are therefore contiguous doc-id ranges; a document longer than
the budget keeps its own start chunk and pushes later docs into higher
seq_ids (no splitting — the doc-level table is what a downstream tokenizer
shards, and splitting is its job).

Physical shape — the global ordered prefix sum is the textbook
single-partition trap, so this is a distributed prefix sum:

1. docs are range-bucketed by ``id DIV bucket_size``;
2. ONE full-width shuffle on hash(bucket) feeds the within-bucket
   cumulative-sum window;
3. per-bucket totals = max of that cumsum — same partitioning, so Catalyst
   reuses the exchange (no second full shuffle, no second scan);
4. bucket base offsets are an exclusive prefix sum over the |buckets|-row
   aggregate (one tiny single-partition exchange — |buckets| ~ N/4096);
5. base offsets broadcast-join back onto the bucketed rows.

At 100 TB: shuffle volume is one pass of (id, n_tokens) pairs — the text
column is never shuffled — and no stage sees more than one bucket's rows
sorted at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_expr


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """Doc-level packing assignment: (id, n_tokens, start_offset, seq_id).

    ``budget`` is the per-sequence token capacity; ``bucket_size`` the
    prefix-sum fan-out (docs per bucket — tune so |buckets| stays tiny
    relative to the data while each bucket fits an executor's sort buffer).
    """
    if budget <= 0 or bucket_size <= 0:
        raise ValueError("budget and bucket_size must be positive")
    n_tok = F.size(tokens_expr(text_col)).cast("bigint")
    base = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.col(id_col) - (F.col(id_col) % F.lit(bucket_size))).alias("_bucket"),
    )
    # The compact (id, n_tokens, bucket) projection feeds BOTH the window
    # branch and the bucket-totals branch; without materialization Spark
    # plans the scan + tokenize twice (verified: no ReuseExchange even under
    # AQE, since the broadcast side runs as its own job first).  A lazy
    # localCheckpoint stores ~16 bytes/doc executor-local on first use —
    # tokenization happens exactly once at any scale, same recipe as the
    # dup-graph iteration in dedup.py.
    base = base.localCheckpoint(eager=False)
    w_in = Window.partitionBy("_bucket").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    within = base.withColumn("_cum", F.sum("n_tokens").over(w_in))
    # per-bucket totals: partial-agg before the exchange, so this branch
    # shuffles |buckets| partial rows, not docs
    totals = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btotal"))
    w_b = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_base", F.coalesce(F.sum("_btotal").over(w_b), F.lit(0)).cast("bigint")
    ).select("_bucket", "_base")
    return (
        within.join(F.broadcast(offsets), "_bucket")
        .withColumn(
            "start_offset",
            (F.col("_base") + F.col("_cum") - F.col("n_tokens")).cast("bigint"),
        )
        .withColumn(
            "seq_id",
            (F.expr(f"start_offset DIV {int(budget)}") + F.lit(1)).cast("bigint"),
        )
        .select(F.col(id_col), "n_tokens", "start_offset", "seq_id")
    )


def pack_stats(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
) -> DataFrame:
    """Per-sequence packing summary: (seq_id, n_docs, seq_tokens,
    first_doc, last_doc).  Because packing preserves id order, each
    sequence is a contiguous id range — (first_doc, last_doc, n_docs)
    fully determines membership for dense ids, which is what makes this
    compact view a complete correctness witness for the doc-level
    assignment."""
    packed = pack_sequences(docs, budget, id_col, text_col, bucket_size)
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )
