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

from ..model import materialize
from .text import tokens_expr


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 4096,
    token_mode: str = "ascii",
) -> DataFrame:
    """Doc-level packing assignment: (id, n_tokens, start_offset, seq_id).

    ``budget`` is the per-sequence token capacity; ``bucket_size`` the
    prefix-sum fan-out (docs per bucket — tune so |buckets| stays tiny
    relative to the data while each bucket fits an executor's sort buffer).
    """
    if budget <= 0 or bucket_size <= 0:
        raise ValueError("budget and bucket_size must be positive")
    # coalesce: a NULL text tokenizes to NULL (ANSI size(NULL)) and would
    # poison this doc's start_offset (_cum - n_tokens -> NULL -> a NULL
    # seq_id group), where the oracle's 1-PRECEDING window form gives it
    # a real offset — both engines treat a NULL text as a 0-token doc
    n_tok = F.coalesce(F.size(tokens_expr(text_col, token_mode)), F.lit(0)).cast("bigint")
    base = docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        (F.col(id_col) - (F.col(id_col) % F.lit(bucket_size))).alias("_bucket"),
    )
    # The compact (id, n_tokens, bucket) projection feeds BOTH the window
    # branch and the bucket-totals branch; without materialization Spark
    # plans the scan + tokenize twice (verified: no ReuseExchange even under
    # AQE, since the broadcast side runs as its own job first).  A lazy
    # materialize (localCheckpoint by default; reliable checkpoint when
    # spark.graft.checkpointDir is set) stores ~16 bytes/doc on first
    # use — tokenization happens exactly once at any scale, same recipe
    # as the dup-graph iteration in dedup.py.
    base = materialize(base, eager=False)
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


def token_chunks(
    docs: DataFrame,
    budget: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_mode: str = "ascii",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/context-window
    counterpart of ``pack_sequences`` (train side packs docs INTO windows;
    the RAG/inference side splits docs into budget-``B`` windows every
    ``stride`` tokens).

    Chunk k (0-based) of a document covers tokens [k*stride, k*stride+budget).
    Chunk count is the standard splitter rule: 1 if n <= budget, else
    ceil((n - budget) / stride) + 1 — the last chunk may be short, and no
    chunk starts after the previous one has already reached the end.
    Empty documents produce one empty chunk, so every doc appears.

    Output: (id, chunk_no, n_chunk_tokens, chunk_md5, chunk_id) — one row
    per chunk, chunk_md5 over the space-joined window (the content
    witness), chunk_id = md5(id:chunk_no) (the deterministic key a vector
    store would index).

    Scale: pure ``sequence``/``slice``/``posexplode`` over the token
    array — one scan, zero shuffles, no UDF; output rows ≈ input tokens /
    stride.  The transform materializes each window, so worst-case
    amplification is budget/stride (the overlap factor a user chose).
    """
    if budget <= 0 or stride <= 0:
        raise ValueError("budget and stride must be positive")
    B, S = int(budget), int(stride)
    n_chunks = (
        f"case when size(_toks) <= {B} then 1 "
        f"else (size(_toks) - {B} + {S} - 1) div {S} + 1 end"
    )
    windows = (
        f"transform(sequence(1, {n_chunks}), "
        f"k -> slice(_toks, (k - 1) * {S} + 1, {B}))"
    )
    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    return (
        ensure_parallelism(docs)
        .select(F.col(id_col), tokens_expr(text_col, token_mode).alias("_toks"))
        .select(F.col(id_col), F.posexplode(F.expr(windows)).alias("chunk_no", "_w"))
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("bigint").alias("chunk_no"),
            F.size("_w").cast("bigint").alias("n_chunk_tokens"),
            F.md5(F.array_join("_w", " ")).alias("chunk_md5"),
            F.md5(
                F.concat(F.col(id_col).cast("string"), F.lit(":"), F.col("chunk_no").cast("string"))
            ).alias("chunk_id"),
        )
    )


def packing_efficiency(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_mode: str = "ascii",
) -> DataFrame:
    """Padded-batch accounting that makes the packing-strategy choice
    quantitative: (strategy, n_seqs, pad_frac) for three strategies over
    the same corpus and budget ``B``.

    - ``concat_chunk``: the ``pack_sequences`` model — the token stream
      splits exactly at B boundaries, so n_seqs = ceil(total/B) and only
      the final sequence pads.  Near-zero waste; its cost is split
      documents, not padding.
    - ``pad_each_doc``: the no-packing baseline — every doc is padded to
      its own ceil(n/B) sequences (empty docs still occupy one).  The
      upper bound a naive pipeline pays.
    - ``sorted_prefix``: first-fit-decreasing approximated with the SAME
      prefix-sum skeleton as pack_sequences, over length-sorted ids
      (ORDER BY n_tokens DESC, id): docs are assigned to the sequence
      where their first token lands, per-sequence pad = max(0, B - sum).
      True FFD needs sequential bin state (not a prefix sum); this
      surrogate keeps the one-shuffle scale shape and upper-bounds FFD's
      waste.

    All arithmetic is exact-integer until one final double divide
    (rounded to 6), so the SQL oracle reproduces it bit-for-bit.

    Scale: the global length-sorted prefix sum uses the length VALUE as
    the range bucket — the per-length windows shuffle on n_tokens (skew
    note: corpora spiked on one exact length would need a secondary
    bucket key), and the across-length exclusive prefix runs on the
    |distinct lengths|-row aggregate (vocabulary-bounded, broadcast
    back).  Nothing sorts globally on one partition.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    B = int(budget)
    # deliberately NOT input-spread (vocab_growth precedent): the compact
    # (id, n) projection is cheap enough that round-robining the raw text
    # first costs more than single-core tokenization saves (measured
    # 0.94 s vs 2.10 s at sf0.1)
    base = docs.select(
        F.col(id_col).alias("id"),
        F.size(tokens_expr(text_col, token_mode)).cast("bigint").alias("n"),
    ).transform(lambda d: materialize(d, eager=False))  # tokenize once for all three branches

    def frac(pad_expr: "F.Column", cap_expr: "F.Column") -> "F.Column":
        return F.round(pad_expr.cast("double") / cap_expr.cast("double"), 6)

    totals = base.agg(
        F.sum("n").alias("total"),
        F.sum(F.expr(f"greatest(cast(1 as bigint), (n + {B} - 1) div {B})")).alias(
            "ped_seqs"
        ),
    )
    cc_seqs = F.greatest(F.lit(1).cast("bigint"), F.expr(f"(total + {B} - 1) div {B}"))
    concat_chunk = totals.select(
        F.lit("concat_chunk").alias("strategy"),
        cc_seqs.alias("n_seqs"),
        frac(cc_seqs * B - F.col("total"), cc_seqs * B).alias("pad_frac"),
    )
    pad_each_doc = totals.select(
        F.lit("pad_each_doc").alias("strategy"),
        F.col("ped_seqs").alias("n_seqs"),
        frac(F.col("ped_seqs") * B - F.col("total"), F.col("ped_seqs") * B).alias(
            "pad_frac"
        ),
    )
    # sorted_prefix: banded prefix sum with the exact length as the band
    by_len = base.groupBy("n").agg(F.sum("n").alias("_len_total"))
    w_gt = Window.orderBy(F.col("n").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    gt = by_len.withColumn(
        "_gt", F.coalesce(F.sum("_len_total").over(w_gt), F.lit(0)).cast("bigint")
    ).select("n", "_gt")
    w_in = Window.partitionBy("n").orderBy("id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    assigned = (
        base.withColumn(
            "_within", F.coalesce(F.sum("n").over(w_in), F.lit(0)).cast("bigint")
        )
        .join(F.broadcast(gt), "n")
        .select("n", F.expr(f"(_gt + _within) div {B}").alias("_seq"))
    )
    per_seq = assigned.groupBy("_seq").agg(F.sum("n").alias("_seq_tokens"))
    sp = per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum(
            F.greatest(F.lit(0).cast("bigint"), F.lit(B) - F.col("_seq_tokens"))
        ).alias("_pad"),
    ).select(
        F.lit("sorted_prefix").alias("strategy"),
        F.col("n_seqs"),
        frac(F.col("_pad"), F.col("n_seqs") * B).alias("pad_frac"),
    )
    return concat_chunk.unionByName(pad_each_doc).unionByName(sp)


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
