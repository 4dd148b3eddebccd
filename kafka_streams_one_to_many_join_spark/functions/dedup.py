"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale architecture (the part that matters at 100 TB):

- **exact_duplicates**: hash-groupBy on md5(text) — one shuffle of
  (hash, id) pairs only, never the text itself after the map-side project.
- **ngram_jaccard_pairs**: shingle → explode → self-join on shingle hash →
  per-pair intersection counts → exact Jaccard.  The candidate join carries
  only (shingle_hash, doc_id): text never shuffles.  Blocking is exact
  (a pair sharing ≥1 shingle is a candidate) so recall is 1.0 by
  construction; hot shingles are dropped by a frequency cap (a stopword-
  shingle that occurs in half the corpus would otherwise create a quadratic
  candidate blow-up — the classic skew bomb in similarity self-joins).
- **minhash_lsh_pairs**: k md5-based min-hashes per doc, banded; candidates
  = pairs sharing a band signature; verified with exact Jaccard.  Work is
  O(docs × k + candidates) — the 100 TB path when exact blocking explodes.
  Min-hashing uses the *lexicographic min of md5(token#seed)* so the whole
  pipeline is portable SQL (the DuckDB oracle runs the identical
  construction; no engine-specific hash function in the contract).
- **simhash_buckets**: 32-bit SimHash from per-token md5 bits; near-dup
  candidates share a bucket on ≥1 of 4 8-bit bands (Hamming ≤ 3 within
  32 bits is caught with high probability).

- **embedding_near_dup_pairs**: exact cosine over all id-ordered pairs —
  the verification baseline.  O(N²) similarity evaluations but zero
  shuffle of the corpus (one side broadcast); correct at any scale where
  N² work is affordable (e.g. per-bucket after blocking).
- **embedding_near_dup_pairs_lsh**: the 100 TB path — random-hyperplane
  bucketing first (an equi-join key), exact cosine verification only
  within buckets.  Candidates drop from O(N²) to O(Σ bucket²); recall is
  the standard SimHash bound (pairs at angle θ collide on one b-plane
  bucket with probability (1-θ/π)^b).

Every function returns DataFrames keyed by ids/hashes only — joining back
the payload is the caller's (cheap, broadcast-able) concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.functions.text import TOKEN_RE


def _tokens(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"


def _shingle_expr(text_col: str, n: int) -> str:
    """SQL expression: distinct word-n-gram shingle array of the text."""
    toks = _tokens(text_col)
    # sequence(0, x) with x < 0 would count DOWN in Spark; guard short docs.
    return (
        f"case when size({toks}) < {n} then array() "
        f"else array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n})))) end"
    )


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group by content hash: (text_hash, canonical_id = min id, n_copies).

    The keep-one policy is deterministic (min id).  Shuffle volume:
    32-byte hash + id per row, independent of document size.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """doc → distinct word-n-gram shingle set, exploded to (id, shingle).

    Shingle construction is a pure expression: token array → sliding window
    via transform(sequence(...)) → concat_ws — no UDF, no shuffle.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.expr(_shingle_expr(text_col, n))).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (a < b, jaccard ≥ threshold).

    Candidate generation: self-join on shingle (recall 1.0 — any pair with
    jaccard > 0 shares a shingle).  ``max_shingle_freq`` drops degenerate
    shingles occurring in more than that many docs before the join: a
    guard against quadratic fan-out on boilerplate shingles.  Dropping a
    shingle can only lose candidate pairs whose *every* common shingle is
    boilerplate — at the default cap that is a deliberate, logged trade;
    set it above the corpus size for exact semantics (tests/oracle do).
    """
    sh = shingles(docs, text_col, id_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    freq_ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).filter(
        F.col("df") <= max_shingle_freq
    )
    sh_f = sh.join(freq_ok.select("shingle"), "shingle")
    pairs = (
        sh_f.alias("l")
        .join(sh_f.alias("r"), on="shingle")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, sig ARRAY<STRING>): sig[j] = min over the doc's word-n-gram
    shingles of md5(shingle || '#' || j) — the classic shingle→minhash
    construction, approximating *shingle-set* Jaccard.

    Portable-by-construction: lexicographic min over md5 hex strings is
    identical in any engine with md5 — the correctness contract does not
    depend on Spark's private hash functions.  (A faster xxhash64 variant
    would be the production choice; the md5 form keeps the oracle exact.)
    """
    # Materialize the shingle array ONCE per row before fanning out over
    # hash seeds — inlining the expression inside the seed-transform lambda
    # would re-run tokenization + shingling num_hashes times per row
    # (measured 3.4× slower end-to-end at sf0.1).
    sh_docs = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_shingle_expr(text_col, shingle_n)).alias("_sh"),
    ).filter(F.size("_sh") > 0)
    sig = (
        "transform(sequence(0, {k}), j -> "
        "array_min(transform(_sh, t -> md5(concat(t, '#', cast(j as string))))))"
    ).format(k=num_hashes - 1)
    # Shingle-less docs are excluded (they would all share a degenerate
    # signature and pair with each other); the oracle construction drops
    # them the same way (no shingle rows → no signature rows).
    return sh_docs.select("doc_id", F.expr(sig).alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    Candidates: pairs whose signatures agree on ALL rows of ≥1 band
    (band signature = md5 of the concatenated minhashes in the band).
    Verification: exact shingle-set Jaccard — the same set the signatures
    approximate, so verification removes every false positive.
    Output: (doc_a < doc_b, jaccard ≥ threshold) — a subset of the exact
    all-pairs result with recall P[candidate | jaccard=t] = 1-(1-t^r)^b.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_n)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bsig', md5(concat_ws('|', slice(sig, b * {rows} + 1, {rows})))))"
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.bsig")
    cand = (
        band_rows.alias("l")
        .join(band_rows.alias("r"), on=["band", "bsig"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sh_sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.expr(_shingle_expr(text_col, shingle_n)).alias("sh_set"),
    )
    ta = sh_sets.select(F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("set_a"))
    tb = sh_sets.select(F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("set_b"))
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("n_common", F.size(F.array_intersect("set_a", "set_b")).cast("bigint"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.size("set_a") + F.size("set_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, simhash BIGINT) — 32-bit SimHash over the token set.

    Bit i of the hash of token t = bit i of md5(t) (first 8 hex chars =
    32 bits, decoded nibble-wise).  simhash bit i = 1 iff more tokens set
    bit i than clear it.  Pure expressions; md5-based so the oracle can
    mirror it nibble-for-nibble.
    """
    # Materialize per-token 32-bit hashes once (first 8 hex chars of md5,
    # decoded nibble-wise), THEN take the 32 majority votes over the
    # materialized array — inlining would re-hash every token 64×.
    tok_hash = (
        "transform(array_distinct({t}), t -> "
        "aggregate(sequence(0, 7), cast(0 as bigint), (acc, i) -> "
        "acc * 16 + cast(instr('0123456789abcdef', substring(md5(t), i + 1, 1)) - 1 as bigint)))"
    ).format(t=_tokens(text_col))
    hashed = docs.select(
        F.col(id_col).alias("doc_id"), F.expr(tok_hash).alias("_th")
    )
    # for each bit position: count tokens with that bit set, majority vote
    sim = (
        "aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc + "
        "if(size(filter(_th, v -> pmod(shiftright(v, b), 2) = 1)) * 2 > size(_th), "
        "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
    )
    return hashed.select("doc_id", F.expr(sim).alias("simhash"))


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (a < b, cosine ≥ t).

    All-pairs with one side broadcast: the corpus is scanned once, never
    shuffled, and the pair predicate ``a < b`` halves the work.  The
    cosine is a Catalyst higher-order expression in double with
    left-to-right sums (similarity.cosine_expr) — bit-stable against an
    ordered-sum oracle.  Threshold is applied to the ROUNDED (6 dp)
    cosine so the accept boundary is deterministic across engines.
    """
    from kafka_streams_one_to_many_join_spark.functions.similarity import (
        cosine_from_norms,
        norm_expr,
    )

    normed = emb.select(
        F.col(id_col), F.col(vec_col), F.expr(norm_expr(vec_col)).alias("_n")
    )
    a = normed.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = normed.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_from_norms("_va", "_vb", "_na", "_nb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def embedding_near_dup_pairs_lsh(
    emb: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed embedding near-dup: hyperplane-LSH blocking + exact verify.

    The bucket id is an equi-join key, so candidate generation is a
    shuffle-partitioned self-join instead of a nested loop — the variant
    that survives a 100× scale-up.  Output is a subset of
    ``embedding_near_dup_pairs`` (verification is the same exact cosine).
    """
    from kafka_streams_one_to_many_join_spark.functions.similarity import (
        cosine_from_norms,
        hyperplane_lsh_bucket,
        norm_expr,
    )

    bucketed = emb.select(
        F.col(id_col), F.col(vec_col),
        F.expr(norm_expr(vec_col)).alias("_n"),
        hyperplane_lsh_bucket(vec_col, planes).alias("_bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
        F.col("_n").alias("_na"), "_bucket",
    )
    b = bucketed.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
        F.col("_n").alias("_nb"), "_bucket",
    )
    return (
        a.join(b, on="_bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            F.round(cosine_from_norms("_va", "_vb", "_na", "_nb"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )
