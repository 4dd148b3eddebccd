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
- **minhash_lsh_pairs**: k universal-hash minhashes per doc (one md5 per
  shingle, affine reseeds (a_j·h+b_j) mod 2^31-1), banded; candidates =
  pairs sharing a band signature; verified with exact Jaccard over the
  shingle-hash sets.  Work is O(docs × |shingles| + candidates) — the
  100 TB path when exact blocking explodes.  md5 + integer arithmetic keep
  the whole pipeline portable SQL (the DuckDB oracle runs the identical
  construction; no engine-specific hash function in the contract).
- **simhash_buckets**: 32-bit SimHash from per-token md5 bits; near-dup
  candidates share a bucket on ≥1 of 4 8-bit bands (Hamming ≤ 3 within
  32 bits is caught with high probability).

- **embedding_near_dup_pairs**: exact cosine over all id-ordered pairs —
  the verification baseline.  O(N²) similarity evaluations with one side
  broadcast and no BY-KEY shuffle of the corpus (only the round-robin
  input spread when the scan is under-partitioned); correct at any scale
  where N² work is affordable (e.g. per-bucket after blocking).
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

from kafka_streams_one_to_many_join_spark.functions.text import token_re_sql


def _tokens(text_col: str, token_mode: str = "ascii") -> str:
    return (
        f"regexp_extract_all(lower({text_col}), '{token_re_sql(token_mode)}', 0)"
    )


def _shingle_expr(text_col: str, n: int) -> str:
    """SQL expression: distinct word-n-gram shingle array of the text."""
    toks = _tokens(text_col)
    # sequence(0, x) with x < 0 would count DOWN in Spark; guard short docs.
    return (
        f"case when size({toks}) < {n} then array() "
        f"else array_distinct(transform(sequence(0, size({toks}) - {n}), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n})))) end"
    )


def _shingle_from_tokens(n: int, t: str = "_t") -> str:
    """Shingle array over an already-materialized token array column."""
    return (
        f"case when size({t}) < {n} then array() "
        f"else array_distinct(transform(sequence(0, size({t}) - {n}), "
        f"i -> concat_ws(' ', slice({t}, i + 1, {n})))) end"
    )


def _codepoint_shingles(n: int, s: str = "_n") -> str:
    """Shingle array of codepoint n-grams over a normalized-text column —
    the space-free-script (CJK) companion to word shingles: unicode-mode
    tokenization makes a whole CJK sentence-run ONE token, so word
    n-grams degenerate; sliding codepoint n-grams over the
    space-joined token string restore sub-sentence granularity.
    ``substring``/``length`` are codepoint-indexed in both Spark and
    DuckDB, so the oracle mirrors this expression verbatim.

    Saturation warning (measured, SCALE.md round 13): on corpora with
    LOW codepoint diversity the trigram space saturates and LSH buckets
    go hot — the synthetic sf1 twin (a ~30-word vocabulary) produced a
    30,089-member bucket and 1.38e9 uncapped candidate pairs.  Real
    multilingual text has orders more codepoint diversity, but ALWAYS
    pair codepoint shingles with ``max_bucket_size`` at scale (cap 64
    completes the same corpus in 5 s)."""
    return (
        f"case when length({s}) < {n} then array() "
        f"else array_distinct(transform(sequence(1, length({s}) - {n} + 1), "
        f"i -> substring({s}, i, {n}))) end"
    )


def _with_shingles(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> DataFrame:
    """(doc_id, _sh): tokens materialized in their OWN projection before
    shingling — the inline form mentions the token regex three times (size
    guard + sequence bound + slice) and CollapseProject keeps it that way;
    splitting the projection pins the regex to once per row (measured ~30%
    faster shingling at sf0.1).  Input spread across cores first: a
    single-row-group parquet scan would otherwise run the whole
    tokenize+shingle on one core.

    ``shingle_unit``: "word" (default — n-grams over the token array) or
    "codepoint" (n-grams over the space-joined tokens; the right unit
    for space-free scripts where unicode-mode "words" are whole runs)."""
    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    base = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens(text_col, token_mode)).alias("_t"),
    )
    if shingle_unit == "word":
        return base.select("doc_id", F.expr(_shingle_from_tokens(n)).alias("_sh"))
    if shingle_unit == "codepoint":
        return base.select(
            "doc_id", F.array_join("_t", " ").alias("_n")
        ).select("doc_id", F.expr(_codepoint_shingles(n)).alias("_sh"))
    raise ValueError(
        f"unknown shingle_unit {shingle_unit!r}; expected 'word' or 'codepoint'"
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
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> DataFrame:
    """doc → distinct n-gram shingle set, exploded to (id, shingle).

    Shingle construction is a pure expression: token array → sliding window
    via transform(sequence(...)) → concat_ws — no UDF, no shuffle.
    """
    return _with_shingles(docs, text_col, id_col, n, token_mode, shingle_unit).select(
        "doc_id", F.explode("_sh").alias("shingle")
    )


# Sentinel cap meaning "no shingle-frequency filtering" — exact Jaccard
# semantics.  Any cap ≥ this skips the document-frequency window (and its
# per-partition sort) entirely; no real corpus-frequency cap is this large.
UNBOUNDED_SHINGLE_FREQ = 10**9


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    threshold: float = 0.5,
    max_shingle_freq: int = 1000,
    hash_mode: str = "md5",
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs (a < b, jaccard ≥ threshold).

    Candidate generation: self-join on shingle (recall 1.0 — any pair with
    jaccard > 0 shares a shingle).  ``max_shingle_freq`` drops degenerate
    shingles occurring in more than that many docs before the join: a
    guard against quadratic fan-out on boilerplate shingles.  Dropping a
    shingle can only lose candidate pairs whose *every* common shingle is
    boilerplate — at the default cap that is a deliberate, logged trade;
    pass ``UNBOUNDED_SHINGLE_FREQ`` (any value ≥ it works) for exact
    semantics (tests/oracle do), which also skips the document-frequency
    window entirely.

    Regime limit (measured, SCALE.md round-10 third decade): recall-1.0
    exact Jaccard is inherently quadratic on a SATURATED shingle space —
    when most doc pairs share at least one shingle (repetitive
    vocabulary; Σ C(df,2) reached 3.4e9 at 500k docs on the scale twin),
    the candidate term is ~n² TRUE candidates and the frequency cap
    would have to drop essentially every shingle to help.  That corpus
    class belongs to ``minhash_lsh_pairs`` (probabilistic, threshold-
    targeted, bucket-capped); this operator is the exact baseline for
    sparse-shingle corpora, where hot shingles are boilerplate and the
    cap is a real guard.
    ``hash_mode="xxhash64"`` (functions.hashing) swaps the per-occurrence
    md5 for the engine-native hash — the same deployment knob as
    MinHash/CMS/Bloom; md5 stays the oracle-parity default.
    """
    from pyspark.sql import Window

    from kafka_streams_one_to_many_join_spark.functions.hashing import (
        prefix_hash32,
    )

    # single pass over the text: tokenize/shingle ONCE, carry each doc's
    # set size through the explode so no sizes join (and no re-scan) is
    # ever needed downstream.  Shingle strings are replaced by their
    # 32-bit md5 prefix immediately after the explode (codegen'd, one md5
    # per shingle occurrence): every downstream shuffle and comparison
    # moves 8-byte ints instead of ~25-byte strings.  Set sizes stay
    # STRING-distinct counts and intersections are counted by hash
    # equality with multiplicity — the oracle mirrors exactly, so a
    # 2^-32 prefix collision perturbs both engines identically.
    sh = _with_shingles(docs, text_col, id_col, n, token_mode, shingle_unit).select(
        "doc_id",
        F.size("_sh").alias("set_size"),
        F.explode("_sh").alias("shingle"),
    ).select(
        "doc_id",
        "set_size",
        F.expr(prefix_hash32("shingle", hash_mode)).alias("h"),
    )
    # document frequency via a window over the ONE shuffle by hash —
    # the groupBy(h) below reuses the same hash partitioning, so
    # candidate generation adds no exchange.  When the cap is unbounded
    # (exact semantics — callers pass UNBOUNDED_SHINGLE_FREQ = 10^9) the
    # filter can never drop a row, but Catalyst cannot prove that, so
    # skip the window entirely: it would impose a per-partition sort
    # over every shingle occurrence to feed a no-op predicate.
    if max_shingle_freq < UNBOUNDED_SHINGLE_FREQ:
        df_w = Window.partitionBy("h")
        sh = (
            sh.withColumn("df", F.count(F.lit(1)).over(df_w))
            .filter(F.col("df") <= max_shingle_freq)
            .drop("df")
        )
    buckets = (
        sh.groupBy("h")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "set_size"))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # in-bucket ordered pair expansion replaces the shingle self-join:
    # no second tokenization pass, no join build, and the max_shingle_freq
    # cap bounds the quadratic term per bucket
    pair_expr = (
        "flatten(transform(members, (x, i) -> "
        "transform(slice(members, i + 2, size(members) - i - 1), y -> "
        "struct(x.doc_id as doc_a, x.set_size as size_a, "
        "y.doc_id as doc_b, y.set_size as size_b))))"
    )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        # under a hash collision a doc can appear twice in one bucket;
        # self-pairs must not count (the oracle's l.doc_id < r.doc_id)
        .filter(F.col("p.doc_a") < F.col("p.doc_b"))
        .groupBy("p.doc_a", "p.doc_b", "p.size_a", "p.size_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime), the affine-hash modulus


def minhash_coeffs(num_hashes: int, seed: int = 11) -> tuple[list[int], list[int]]:
    """Deterministic affine-reseed coefficients (a_j, b_j), numpy PCG64.

    Shared literal-for-literal with the SQL oracle, like seeded_planes.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    a = [int(x) for x in rng.integers(1, MINHASH_P, num_hashes)]
    b = [int(x) for x in rng.integers(0, MINHASH_P, num_hashes)]
    return a, b


# 31-bit content hash of one shingle: first 8 hex chars of md5, mod P.
# ONE md5 per shingle — the per-seed minhashes are affine reseeds of this
# value, not fresh digests (16× fewer md5 calls than md5(shingle#seed),
# measured 5× faster signature computation at sf0.01).
_SHINGLE_H = (
    f"cast(conv(substring(md5(shingle), 1, 8), 16, 10) as bigint) % {MINHASH_P}"
)


def _shingle_h(hash_mode: str = "md5") -> str:
    """The shingle content hash under the chosen addressing mode (see
    functions.hashing): md5 (default, oracle-portable) or xxhash64
    (engine-native opt-in — same [0, P) domain, no digest/hex work)."""
    from kafka_streams_one_to_many_join_spark.functions.hashing import (
        prefix_hash32,
    )

    return f"{prefix_hash32('shingle', hash_mode)} % {MINHASH_P}"


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_n: int = 3,
    seed: int = 11,
    hash_mode: str = "md5",
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>): sig[j] = min over the doc's word-n-gram
    shingles of (a_j·h + b_j) mod P, h = 31-bit md5 prefix of the shingle —
    the standard universal-hash MinHash, approximating shingle-set Jaccard.

    Portable-by-construction: md5 + integer arithmetic are identical in any
    engine, so the oracle can run the same construction literal-for-literal.
    Physically: explode → codegen'd hash aggregate with map-side partial
    min — no per-row lambda interpretation, one shuffle of (doc_id, h).
    ``hash_mode="xxhash64"`` opts into the engine-native shingle hash
    (functions.hashing) — faster, not oracle-portable.
    """
    a, b = minhash_coeffs(num_hashes, seed)
    sh = _with_shingles(docs, text_col, id_col, shingle_n).select(
        "doc_id", F.explode("_sh").alias("shingle")
    ).select("doc_id", F.expr(_shingle_h(hash_mode)).alias("h"))
    mins = [
        F.min(F.expr(f"(h * {a[j]} + {b[j]}) % {MINHASH_P}")).alias(f"_s{j}")
        for j in range(num_hashes)
    ]
    per_doc = sh.groupBy("doc_id").agg(*mins)
    return per_doc.select(
        "doc_id", F.array(*[f"_s{j}" for j in range(num_hashes)]).alias("sig")
    )


def minhash_doc_hsets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    hash_mode: str = "md5",
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> DataFrame:
    """The doc-keyed shingle-hash-set table ``(doc_id, hset)`` — the
    verification payload stored ONCE per document, for the NORMALIZED
    band-index layout (r16): ``minhash_band_index(carry_hset=False)``
    band rows stay lean (no hset), and probes attach hsets
    candidate-proportionally from this table.  Why it exists: carrying
    the hset on every band row duplicates it ``bands``× — at the sf100
    twin (5M docs, 32M band rows) that duplication made the index's own
    scan-and-rewrite the dominant term of maintenance (maintain/rebuild
    DEGRADED to 0.741 from 0.394 at sf10, SCALE.md r16); the normalized
    layout removes the ``bands``× payload from every maintenance scan
    and write."""
    sh = _with_shingles(
        docs, text_col, id_col, shingle_n, token_mode, shingle_unit
    ).select(
        "doc_id", F.explode("_sh").alias("shingle")
    ).select("doc_id", F.expr(_shingle_h(hash_mode)).alias("h"))
    return sh.groupBy("doc_id").agg(F.collect_set("h").alias("hset"))


def minhash_band_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 11,
    hash_mode: str = "md5",
    token_mode: str = "ascii",
    shingle_unit: str = "word",
    carry_hset: bool = True,
    carry_sig: bool = False,
) -> DataFrame:
    """The per-document LSH band index: ``(doc_id, band, bsig, hset)`` —
    one row per (doc, band) with the band's minhash signature slice and
    the doc's full 31-bit shingle-hash set (the verification payload).

    ``carry_sig=True`` (r18, internal to ``minhash_lsh_pairs``): each
    band row additionally carries the doc's FULL minhash signature
    (``sig``, num_hashes ints — small next to the hset), which lets the
    in-bucket pair expansion decide whether an earlier band already
    found the same pair (first-agreeing-band emission — removes the
    output-sized ``.distinct()``).  Not part of the persistable index
    layout.

    ``carry_hset=False`` (r16 — the sf100 finding): emit LEAN band rows
    ``(doc_id, band, bsig)`` and store the verification payload once
    per doc in a companion ``minhash_doc_hsets`` table instead.  The
    carried layout duplicates each hset ``bands``×, which makes the
    index ~``bands``× the tokenized corpus — at sf100 the maintenance
    rewrite of that payload dominated and the maintain/rebuild ratio
    degraded to 0.741; the normalized layout restores the economics
    (measured in SCALE.md r16).  Probes accept the companion table via
    their ``hsets=`` parameter.

    This is the state the full pipeline builds in-flight, exposed as a
    PERSISTABLE index for the nightly-ingest pattern (VERDICT r12
    item 6): write it once for the frozen corpus — e.g. via
    ``sources.bucketed.write_bucketed`` on ``bsig_h`` (add
    ``with_bsig_hash``) so nightly probes read it shuffle-free — then
    dedup each new shard with ``minhash_lsh_pairs_incremental`` instead
    of re-running the full corpus pipeline.  Index size: bands× rows per
    doc, each carrying the hset (~4·|shingles| bytes) — the same payload
    the full pipeline shuffles per band.

    The construction parameters are STAMPED into the index as column
    metadata on ``bsig`` (r14, ADVICE r13 low): StructField metadata
    round-trips through parquet / ``saveAsTable``, so a months-old
    persisted index still knows how it was built, and
    ``minhash_lsh_pairs_incremental`` / ``minhash_band_index_apply``
    refuse to probe or maintain it with mismatched parameters instead of
    silently returning wrong (typically empty) pair sets.  Indexes
    persisted before the stamp existed fall back to a per-row
    ``assert_true(size(bsig) = num_hashes/bands)`` structural check.
    """
    rows = num_hashes // bands
    a, b = minhash_coeffs(num_hashes, seed)
    sh = _with_shingles(
        docs, text_col, id_col, shingle_n, token_mode, shingle_unit
    ).select(
        "doc_id", F.explode("_sh").alias("shingle")
    ).select("doc_id", F.expr(_shingle_h(hash_mode)).alias("h"))
    mins = [
        F.min(F.expr(f"(h * {a[j]} + {b[j]}) % {MINHASH_P}")).alias(f"_s{j}")
        for j in range(num_hashes)
    ]
    aggs = list(mins)
    payload = []
    if carry_hset:
        aggs.append(F.collect_set("h").alias("hset"))
        payload = ["hset"]
    per_doc = sh.groupBy("doc_id").agg(*aggs).select(
        "doc_id",
        F.array(*[f"_s{j}" for j in range(num_hashes)]).alias("sig"),
        *payload,
    )
    if carry_sig:
        payload = payload + ["sig"]
    return per_doc.select(
        "doc_id",
        *payload,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bsig', slice(sig, b * {rows} + 1, {rows})))"
            )
        ).alias("bs"),
    ).select(
        "doc_id",
        *payload,
        F.col("bs.band").alias("band"),
        F.col("bs.bsig").alias(
            "bsig",
            metadata=_index_params(
                num_hashes, bands, shingle_n, seed, hash_mode, token_mode,
                shingle_unit,
            ),
        ),
    )


def minhash_band_index_normalized(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 11,
    hash_mode: str = "md5",
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> tuple[DataFrame, DataFrame]:
    """ONE-PASS build of the normalized layout: returns
    ``(lean band index, doc-keyed hsets companion)`` — both projected
    from a single materialized per-doc (signature, hset) frame, so the
    corpus is tokenized and signed ONCE.  The separate
    ``minhash_band_index(carry_hset=False)`` + ``minhash_doc_hsets``
    pair tokenizes twice (measured: the two-pass normalized rebuild ran
    ~17% over the carried one at sf100; this builder closes that gap —
    SCALE.md r16).  Writing the two outputs still costs two actions,
    but both read the checkpointed per-doc frame, never the corpus
    (plan-asserted in tests/test_minhash_incremental.py)."""
    from kafka_streams_one_to_many_join_spark.model import materialize

    rows = num_hashes // bands
    a, b = minhash_coeffs(num_hashes, seed)
    sh = _with_shingles(
        docs, text_col, id_col, shingle_n, token_mode, shingle_unit
    ).select(
        "doc_id", F.explode("_sh").alias("shingle")
    ).select("doc_id", F.expr(_shingle_h(hash_mode)).alias("h"))
    mins = [
        F.min(F.expr(f"(h * {a[j]} + {b[j]}) % {MINHASH_P}")).alias(f"_s{j}")
        for j in range(num_hashes)
    ]
    per_doc = materialize(
        sh.groupBy("doc_id")
        .agg(*mins, F.collect_set("h").alias("hset"))
        .select(
            "doc_id",
            F.array(*[f"_s{j}" for j in range(num_hashes)]).alias("sig"),
            "hset",
        ),
        eager=False,
    )
    index = per_doc.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), b -> "
                f"named_struct('band', b, 'bsig', slice(sig, b * {rows} + 1, {rows})))"
            )
        ).alias("bs"),
    ).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.bsig").alias(
            "bsig",
            metadata=_index_params(
                num_hashes, bands, shingle_n, seed, hash_mode, token_mode,
                shingle_unit,
            ),
        ),
    )
    return index, per_doc.select("doc_id", "hset")


def _index_params(
    num_hashes: int,
    bands: int,
    shingle_n: int,
    seed: int,
    hash_mode: str,
    token_mode: str,
    shingle_unit: str,
) -> dict:
    """The construction-parameter dict stamped into a band index's
    ``bsig`` column metadata (and checked back by
    ``_check_index_params``)."""
    return {
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_n": shingle_n,
        "seed": seed,
        "hash_mode": hash_mode,
        "token_mode": token_mode,
        "shingle_unit": shingle_unit,
    }


def _check_index_params(index: DataFrame, expected: dict, op: str) -> bool:
    """Validate a band index's stamped construction parameters against the
    caller's (ADVICE r13 low): raise ``ValueError`` on any mismatch —
    probing a months-old index with the wrong parameters silently
    returns wrong (typically empty) pair sets otherwise.  Returns True
    when the stamp was present and validated; False for pre-stamp
    indexes (callers then fall back to the structural
    ``assert_true(size(bsig))`` check, the only property recoverable
    from the data alone)."""
    meta = dict(index.schema["bsig"].metadata or {})
    stamped = {k: meta[k] for k in expected if k in meta}
    if not stamped:
        return False
    mismatched = {
        k: (v, expected[k]) for k, v in stamped.items() if v != expected[k]
    }
    if mismatched:
        detail = ", ".join(
            f"{k}: index={iv!r} caller={cv!r}"
            for k, (iv, cv) in sorted(mismatched.items())
        )
        raise ValueError(
            f"{op}: band index was built with different parameters than the "
            f"caller supplied ({detail}); results would be silently wrong — "
            "rebuild the index or pass the parameters it was built with"
        )
    return True


# library defaults for the MinHash construction — single definition site
# for the stamp/resolve machinery below
_INDEX_DEFAULTS = {
    "num_hashes": 16,
    "bands": 8,
    "shingle_n": 3,
    "seed": 11,
    "hash_mode": "md5",
    "token_mode": "ascii",
    "shingle_unit": "word",
}


def _resolve_index_params(index: DataFrame, given: dict, op: str):
    """Resolve the construction parameters an index consumer should use
    (r14): explicitly-given values (non-None) win and are VALIDATED
    against the stamp; unspecified ones come from the stamp when
    present (so ``minhash_lsh_pairs_incremental(shard, index)`` just
    works against any stamped index, whatever it was built with), else
    from the library defaults.  Returns (params, validated) where
    ``validated`` is False only for pre-stamp indexes — callers then
    arm the structural size(bsig) assert."""
    meta = dict(index.schema["bsig"].metadata or {})
    stamped = {k: meta[k] for k in _INDEX_DEFAULTS if k in meta}
    explicit = {k: v for k, v in given.items() if v is not None}
    params = {**_INDEX_DEFAULTS, **stamped, **explicit}
    if stamped:
        _check_index_params(index, params, op)
        return params, True
    return params, False


def _assert_bsig_width(index: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Structural fallback check for PRE-STAMP indexes (no parameter
    metadata): embed ``assert_true(size(bsig) = num_hashes/bands)`` as a
    pass-through filter, so probing with a mismatched band width fails
    loudly AT EXECUTION instead of returning empty join output.  Costs
    one size() comparison per row, adds no exchange, and runs no eager
    job (the check rides the probe's own scan)."""
    rows = num_hashes // bands
    return index.filter(
        F.assert_true(
            F.size("bsig") == rows,
            F.lit(
                f"band index bsig width != num_hashes/bands = {rows}: the "
                "index was built with different (num_hashes, bands) than "
                "the caller supplied"
            ),
        ).isNull()
    )


def minhash_band_index_apply(
    index: DataFrame,
    upserts: DataFrame | None = None,
    delete_ids: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    shingle_n: int | None = None,
    seed: int | None = None,
    hash_mode: str | None = None,
    token_mode: str | None = None,
    shingle_unit: str | None = None,
    hsets: DataFrame | None = None,
):
    """Maintain a persisted MinHash band index under a MUTABLE corpus
    (VERDICT r13 item 1): retract every band row of re-ingested
    (``upserts``, a corrected-document DataFrame) and deleted
    (``delete_ids``, a one-column id DataFrame) documents, then insert
    the upserted documents' freshly-signed rows.  Append-only evolution
    (r13's two-night test) leaves a corrected or deleted document's
    STALE band rows in the index forever, silently manufacturing pairs
    against text that no longer exists — the batch-index analog of the
    reference's own N-side delete propagation (DemoApp.scala:224-230,
    which removes a car's old store entry when its zone changes rather
    than letting both zones claim it).

    Output: the maintained index, row-for-row equal to
    ``minhash_band_index(corrected corpus)`` (differentially asserted in
    tests/test_minhash_incremental.py — probes over the maintained index
    equal the full recompute on the corrected corpus, pair-for-pair).

    Scale shape: the night's change set is orders smaller than the
    index, so retraction is a BROADCAST anti-join on doc_id — the index
    streams through exchange-free (plan-asserted), no re-tokenization of
    any frozen document, and only the upserted docs are signed.  Cost is
    one index scan + |changes|-sized work vs the full rebuild's
    re-tokenize-and-sign of the whole corpus — measured in SCALE.md r14
    (0.394x rebuild at sf10).  CAVEAT, measured r16: for the CARRIED
    layout the ratio does NOT keep widening — at sf100 it degraded to
    0.741 because the hset rides every band row (bands-x duplication)
    and the index's own scan-and-rewrite becomes the dominant term of
    maintenance; at that scale use the NORMALIZED layout
    (``carry_hset=False`` + the ``minhash_doc_hsets`` companion via
    ``hsets=``), which removes the duplicated payload from every
    maintenance scan and write (SCALE.md r16).
    Persist the result via ``sources.bucketed.write_bucketed`` on
    ``bsig_h`` (add ``with_bsig_hash`` if absent) to keep nightly probes
    shuffle-free.  Construction parameters default to the index's own
    STAMP (``minhash_band_index_apply(index, upserts=...)`` just works
    whatever the index was built with); explicitly-passed values are
    validated against the stamp and a mismatch raises instead of
    silently inserting rows signed under a different scheme.  A PRE-STAMP
    index (no parameter metadata — persisted before r14's stamping)
    REFUSES to default (ADVICE r14 low): every construction parameter
    must be passed explicitly, because inserting rows signed under
    library defaults into an index built with a same-width but different
    config (e.g. 32 hashes/16 bands probed as 16/8 — both width 2 — or
    a different seed/shingle_n) passes the structural width check and
    silently corrupts the index.  One-time migration: rebuild once with
    ``minhash_band_index`` (output is stamped; stamps survive parquet
    round-trips in column metadata), or keep passing the full original
    parameter set.

    DELETE PRECEDENCE (ADVICE r14 medium): a doc_id appearing in BOTH
    ``upserts`` and ``delete_ids`` ends DELETED — deletes are applied
    LAST (the upsert's fresh rows are anti-joined against the delete
    set too).  The nightly change feed where a doc is corrected and
    then deleted the same day must not resurrect it; asserted by the
    overlap differential test in tests/test_minhash_incremental.py.

    NORMALIZED layout (r16): for a lean index
    (``minhash_band_index(carry_hset=False)``) the ``minhash_doc_hsets``
    companion MUST be passed as ``hsets`` — it is maintained with the
    same retraction + delete-wins rules and the call returns
    ``(maintained_index, maintained_hsets)`` (the segment operator's
    tuple shape).  Maintaining the lean index without its companion
    would leave fresh docs' verification payloads missing, silently
    dropping their pairs from every later probe — refused.  A carried
    index (hset on every band row) keeps the r14 single-return
    contract."""
    given = dict(
        num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
        seed=seed, hash_mode=hash_mode, token_mode=token_mode,
        shingle_unit=shingle_unit,
    )
    params, validated = _resolve_index_params(
        index, given, "minhash_band_index_apply"
    )
    if not validated:
        missing = sorted(k for k, v in given.items() if v is None)
        if missing:
            raise ValueError(
                "minhash_band_index_apply: the index carries no "
                "construction-parameter stamp and "
                f"{missing} were not passed explicitly; maintaining a "
                "pre-stamp index under defaulted parameters can silently "
                "insert rows signed under a different scheme (a same-ratio "
                "config passes the width check).  Pass every construction "
                "parameter the index was built with, or rebuild it once "
                "with minhash_band_index to stamp it"
            )
        index = _assert_bsig_width(index, params["num_hashes"], params["bands"])
    del_ids = None
    if delete_ids is not None:
        if id_col in delete_ids.columns:
            del_col = id_col
        elif len(delete_ids.columns) == 1:
            del_col = delete_ids.columns[0]
        else:
            raise ValueError(
                "minhash_band_index_apply: delete_ids must be a one-column "
                f"id DataFrame or carry {id_col!r}; got columns "
                f"{delete_ids.columns} — retracting on an arbitrary first "
                "column would silently delete the wrong documents"
            )
        # no .distinct() — anti-join semantics don't need it, and the
        # retract union below dedups once for its own broadcast
        del_ids = delete_ids.select(F.col(del_col).alias("doc_id"))
    retract = del_ids
    if upserts is not None:
        up_ids = upserts.select(F.col(id_col).alias("doc_id"))
        retract = up_ids if retract is None else retract.unionByName(up_ids)
    normalized = "hset" not in index.columns
    if normalized and hsets is None:
        raise ValueError(
            "minhash_band_index_apply: the index carries no hset column "
            "(normalized layout); pass its minhash_doc_hsets companion as "
            "hsets= so it is maintained in lockstep — maintaining the lean "
            "index alone leaves fresh docs' verification payloads missing "
            "and every later probe silently drops their pairs"
        )
    out = index
    if retract is not None:
        out = out.join(F.broadcast(retract.distinct()), "doc_id", "left_anti")
    if upserts is not None:
        new_rows = minhash_band_index(
            upserts,
            text_col=text_col,
            id_col=id_col,
            carry_hset=not normalized,
            **params,
        )
        if del_ids is not None:
            # deletes win over same-day upserts: without this anti-join
            # the union below would re-insert the corrected-then-deleted
            # doc's fresh rows, losing the delete
            new_rows = new_rows.join(F.broadcast(del_ids), "doc_id", "left_anti")
        if "bsig_h" in index.columns:
            new_rows = with_bsig_hash(new_rows)
        out = out.unionByName(new_rows.select(*out.columns))
    if hsets is None:
        return out
    # companion maintenance: same retraction + delete-wins rules
    out_h = hsets
    if retract is not None:
        out_h = out_h.join(F.broadcast(retract.distinct()), "doc_id", "left_anti")
    if upserts is not None:
        fresh_h = minhash_doc_hsets(
            upserts,
            text_col=text_col,
            id_col=id_col,
            shingle_n=params["shingle_n"],
            hash_mode=params["hash_mode"],
            token_mode=params["token_mode"],
            shingle_unit=params["shingle_unit"],
        )
        if del_ids is not None:
            fresh_h = fresh_h.join(F.broadcast(del_ids), "doc_id", "left_anti")
        out_h = out_h.unionByName(fresh_h.select(*out_h.columns))
    return out, out_h


def with_bsig_hash(index: DataFrame) -> DataFrame:
    """Add ``bsig_h = xxhash64(band, bsig)`` — the scalar bucketing key
    for persisting a band index (Spark cannot bucket by an array
    column).  A table bucketed on ``bsig_h`` hash-partitions every
    (band, bsig) bucket's rows together, so an incremental probe joining
    on (bsig_h, band, bsig) reads the frozen index WITHOUT shuffling it
    (HashPartitioning on a subset of the join keys satisfies the join's
    clustered distribution)."""
    return index.withColumn("bsig_h", F.xxhash64("band", "bsig"))


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    threshold: float = 0.5,
    shingle_n: int | None = None,
    seed: int | None = None,
    hash_mode: str | None = None,
    token_mode: str | None = None,
    shingle_unit: str | None = None,
    max_bucket_size: int | None = None,
    hsets: DataFrame | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH dedup: near-dup pairs TOUCHING a new shard,
    against a frozen corpus represented by its persisted band index
    (``minhash_band_index`` output; ``bsig_h`` column optional) — the
    nightly-ingest shape where re-running the full pair pipeline over
    100 TB to dedup a 100 GB shard is the wrong cost model.

    NORMALIZED layout (r16): a lean index
    (``minhash_band_index(carry_hset=False)``) carries no hset column;
    pass its ``minhash_doc_hsets`` companion as ``hsets`` and the
    verification payload is attached CANDIDATE-proportionally — the
    hsets table is scanned once, restricted by a broadcast of the
    candidate IDS (bounded, 8 bytes each), and only the restricted
    candidate-proportional payload rows enter the attach join's
    shuffle (the payload side is deliberately NOT broadcast-hinted: at
    the sf100 twin a 500k-doc shard's candidate hsets are multi-GB and
    the hint OOMs the executors).  Same pair output, differential
    test-pinned against the carried layout.

    Output == ``minhash_lsh_pairs(frozen ∪ new)`` RESTRICTED to pairs
    with ≥1 endpoint in the new shard (differentially asserted in
    tests; oracle-paired as ``minhash_lsh_incremental``).  Exactness
    holds because both candidate generation (same-band signature
    agreement — a doc's signature depends only on its own text) and
    verification (exact Jaccard over the carried shingle-hash sets) are
    corpus-independent per doc.

    Dataflow: build the new shard's band rows in-flight (|shard|-sized),
    then (a) new-vs-frozen candidates via an equi-join on (band, bsig)
    — plus bsig_h when the index carries it, which makes a bucketed
    index read shuffle-free — and (b) new-vs-new candidates via the
    same in-bucket expansion as the full pipeline, restricted to the
    shard.  The frozen corpus is never re-tokenized and, when bucketed,
    never re-shuffled; only index rows whose buckets the shard actually
    probes contribute join output.

    ``max_bucket_size`` is the hot-bucket guard (ADVICE r13 medium — the
    incremental twin of ``minhash_lsh_pairs``'s): a hot (band, bsig)
    bucket in the frozen index fans the probe join out quadratically
    with each row carrying its ~4·|shingles|-byte hset, and the
    within-shard expansion is the same collect_list state the full
    pipeline caps BEFORE aggregating.  Bucket sizes are counted over the
    COMBINED index ∪ shard membership restricted to the buckets the
    shard probes (unprobed buckets yield no shard-touching pairs), so a
    capped incremental run equals the capped full recompute restricted
    to the shard — the same drop-whole-bucket semantics, differentially
    asserted in tests/test_minhash_incremental.py.  The pre-count
    shuffles ONLY the probed buckets' key columns (never hsets), and
    both the probe-key set and the surviving-bucket list are
    shard-proportional, so they broadcast — the frozen index still
    streams through exchange-free.  MANDATORY for
    ``shingle_unit="codepoint"`` at scale (SCALE.md r13: a saturated
    corpus grew one bucket to 30k members / 1.38e9 candidate pairs).

    Construction parameters default to the index's own STAMP — probing
    a stamped index needs no parameter bookkeeping at the call site;
    explicitly-passed values are validated against the stamp and a
    mismatch raises (r14, closing the ADVICE r13 operational trap from
    both directions).
    """
    from kafka_streams_one_to_many_join_spark.model import materialize

    params, validated = _resolve_index_params(
        index,
        dict(
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            seed=seed, hash_mode=hash_mode, token_mode=token_mode,
            shingle_unit=shingle_unit,
        ),
        "minhash_lsh_pairs_incremental",
    )
    if not validated:
        index = _assert_bsig_width(index, params["num_hashes"], params["bands"])
    # uncapped mode dedups pairs structurally (first-agreeing-band
    # within the shard, id-distinct candidates against the index) — the
    # within-shard decision needs the full signature on the bucket rows
    new_rows = minhash_band_index(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        carry_sig=max_bucket_size is None,
        **params,
    )
    # the band rows feed BOTH the index join and the within-shard bucket
    # expansion — a DataFrame diamond re-executes its common subtree per
    # branch (the lesson minhash_lsh_pairs' docstring records), which
    # here means tokenizing + signing the shard twice.  Pin it once.
    new_rows = materialize(new_rows)
    if max_bucket_size is not None:
        # combined bucket sizes, probed buckets only: index membership is
        # pruned to the shard's buckets with a broadcast semi-join (keys
        # only — hsets never enter the count), then both row sets drop
        # oversized buckets via a broadcast semi-join on the survivors.
        probe_keys = new_rows.select("band", "bsig")
        idx_keys = index.select("band", "bsig").join(
            F.broadcast(probe_keys.distinct()), ["band", "bsig"], "left_semi"
        )
        sizes = (
            idx_keys.unionByName(probe_keys)
            .groupBy("band", "bsig")
            .agg(F.count(F.lit(1)).alias("_bn"))
        )
        # (_bn > 1) mirrors the full pipeline's filter; size-1 buckets
        # cannot pair, so dropping them here is output-neutral
        ok = materialize(
            sizes.filter(
                (F.col("_bn") > 1) & (F.col("_bn") <= max_bucket_size)
            ).select("band", "bsig"),
            eager=False,
        )
        new_rows = new_rows.join(F.broadcast(ok), ["band", "bsig"], "left_semi")
        index = index.join(F.broadcast(ok), ["band", "bsig"], "left_semi")
    if "bsig_h" in index.columns:
        new_rows = with_bsig_hash(new_rows)
        join_keys = ["bsig_h", "band", "bsig"]
    else:
        join_keys = ["band", "bsig"]
    new = new_rows.select(
        *join_keys,
        F.col("doc_id").alias("_new_id"),
        F.col("hset").alias("_new_hset"),
    )
    pair_cols = [
        F.least("_old_id", "_new_id").alias("doc_a"),
        F.greatest("_old_id", "_new_id").alias("doc_b"),
        F.size(F.array_intersect("_new_hset", "_old_hset"))
        .cast("bigint")
        .alias("n_common"),
        (F.size("_new_hset") + F.size("_old_hset")).alias("n_total"),
    ]
    if "hset" in index.columns:
        old = index.select(
            *join_keys,
            F.col("doc_id").alias("_old_id"),
            F.col("hset").alias("_old_hset"),
        )
        cross = (
            new.join(old, on=join_keys)
            # the caller contract is disjoint id spaces; the guard keeps a
            # violated contract from manufacturing (x, x) "pairs" silently
            .filter(F.col("_old_id") != F.col("_new_id"))
            .select(*pair_cols)
        )
    else:
        # normalized layout: pair on the lean keys, then attach the
        # frozen side's hsets candidate-proportionally — the companion
        # table is scanned (broadcast-restricted), never shuffled
        if hsets is None:
            raise ValueError(
                "minhash_lsh_pairs_incremental: the index carries no hset "
                "column (normalized layout, minhash_band_index("
                "carry_hset=False)); pass its minhash_doc_hsets companion "
                "as hsets= — without the verification payload the probe "
                "cannot compute exact Jaccard"
            )
        if id_col not in hsets.columns or "hset" not in hsets.columns:
            raise ValueError(
                "minhash_lsh_pairs_incremental: hsets must carry "
                f"({id_col!r}, 'hset'); got {hsets.columns}"
            )
        # candidate pairs as IDS ONLY — one row per (new, old) candidate
        # with no payload.  Two earlier shapes OOM'd the sf100 twin
        # (500k-doc shard): carrying _new_hset on every candidate row
        # through the materialize pinned multi-GB of duplicated
        # payloads, and broadcast-hinting the restricted old-side
        # payload put the same GBs behind one hint.  Ids are 16
        # bytes/candidate; both payload attaches below are regular
        # candidate/shard-proportional shuffle joins, and the
        # companion/index tables themselves are still only scanned.
        old_keys = index.select(
            *join_keys, F.col("doc_id").alias("_old_id")
        )
        cand_rows = (
            new.select(*join_keys, "_new_id")
            .join(old_keys, on=join_keys)
            .filter(F.col("_old_id") != F.col("_new_id"))
            .select("_new_id", "_old_id")
        )
        if max_bucket_size is None:
            # id-distinct BEFORE the payload attaches (r18): a pair
            # agreeing on several bands used to be attached and
            # intersected once per band, with the output-sized final
            # .distinct() folding the copies.  Ids are 16 bytes/row, so
            # deduping here is the cheapest possible place; capped mode
            # keeps per-band candidates (the final distinct handles it).
            cand_rows = cand_rows.distinct()
        cand = materialize(cand_rows, eager=False)
        old_h = hsets.select(
            F.col(id_col).alias("_old_id"), F.col("hset").alias("_old_hset")
        ).join(F.broadcast(cand.select("_old_id").distinct()), "_old_id")
        new_h = new_rows.groupBy(F.col("doc_id").alias("_new_id")).agg(
            F.first("hset").alias("_new_hset")
        )
        cross = (
            cand.join(new_h, "_new_id")
            .join(old_h, "_old_id")
            .select(*pair_cols)
        )
    member_cols = ["doc_id", "hset"] + (
        ["sig"] if max_bucket_size is None else []
    )
    within_buckets = (
        new_rows.groupBy("band", "bsig")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*member_cols))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    if max_bucket_size is None:
        # first-agreeing-band emission for the within-shard pairs (r18,
        # the minhash_lsh_pairs pattern): each pair surfaces from the
        # first band whose slices agree, so no duplicates exist to fold
        rows_per_band = params["num_hashes"] // params["bands"]
        first_band = (
            "band = 0 or not exists(sequence(0, band - 1), bb -> "
            f"slice(x.sig, bb * {rows_per_band} + 1, {rows_per_band}) = "
            f"slice(y.sig, bb * {rows_per_band} + 1, {rows_per_band}))"
        )
        pair_expr = (
            "flatten(transform(members, (x, i) -> "
            "transform(filter(slice(members, i + 2, size(members) - i - 1), "
            f"y -> {first_band}), y -> "
            "struct(x.doc_id as doc_a, y.doc_id as doc_b, "
            "cast(size(array_intersect(x.hset, y.hset)) as bigint) as n_common, "
            "size(x.hset) + size(y.hset) as n_total))))"
        )
    else:
        pair_expr = (
            "flatten(transform(members, (x, i) -> "
            "transform(slice(members, i + 2, size(members) - i - 1), y -> "
            "struct(x.doc_id as doc_a, y.doc_id as doc_b, "
            "cast(size(array_intersect(x.hset, y.hset)) as bigint) as n_common, "
            "size(x.hset) + size(y.hset) as n_total))))"
        )
    within = within_buckets.select(F.explode(F.expr(pair_expr)).alias("p")).select(
        F.col("p.doc_a").alias("doc_a"),
        F.col("p.doc_b").alias("doc_b"),
        F.col("p.n_common").alias("n_common"),
        F.col("p.n_total").alias("n_total"),
    )
    verified = (
        cross.unionByName(within)
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_total") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    if max_bucket_size is None and "hset" not in index.columns:
        # uncapped + normalized: cross pairs are id-distinct by
        # construction and within pairs first-band-unique; the id
        # spaces are disjoint (caller contract), so nothing remains to
        # dedupe — the output-sized distinct disappears
        return verified
    return verified.distinct()


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 3,
    seed: int = 11,
    hash_mode: str = "md5",
    max_bucket_size: int | None = None,
    token_mode: str = "ascii",
    shingle_unit: str = "word",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    ``token_mode="unicode"`` + ``shingle_unit="codepoint"`` is the
    multilingual configuration (VERDICT r12 item 1): Unicode token class
    so non-Latin text stops vanishing, codepoint shingles so space-free
    scripts get sub-sentence granularity.  ASCII/word stays the default
    (oracle-parity roster semantics).

    Candidates: pairs agreeing on ALL minhashes of ≥1 band.  Verification:
    exact Jaccard over the docs' 31-bit shingle-hash sets — the same sets
    the signatures approximate, so verification removes every false
    positive (up to md5-prefix collisions, identical in the oracle).
    Output: (doc_a < doc_b, jaccard ≥ threshold), recall 1-(1-t^r)^b.

    ``max_bucket_size`` is the hot-bucket guard — the MinHash twin of
    ``ngram_jaccard_pairs``'s ``max_shingle_freq``: drop any (band,
    band-signature) bucket with more members before the in-bucket pair
    expansion.  Degenerate signature collisions (short docs over a
    repetitive vocabulary all hashing to the same band signature) make
    bucket sizes grow LINEARLY with the corpus, so the quadratic
    in-bucket term turns the whole pipeline quadratic: measured at the
    sf10→sf100 decade (SCALE.md round 10), candidate pairs grew 97×
    on 10× docs (2.0M → 197.9M, max bucket 268 → 2,604) while TRUE
    verified pairs grew 9.8× (10,484 → 103,091).  A true near-dup pair
    above the Jaccard threshold agrees on many bands, so it is
    overwhelmingly re-found in a small bucket when a hot one is
    dropped — the measured recall cost of the cap is in SCALE.md.
    Default ``None`` = unbounded (exact roster/oracle semantics).

    Physical shape — a straight-line dataflow with NO self-join and NO
    branch that re-reads the corpus (a DataFrame diamond re-executes its
    common subtree once per branch; the first version of this operator paid
    that 3×): tokenize+md5 once → one aggregate producing signatures AND
    the verification hash-set → explode bands (the hash-set rides along,
    bands× duplication — bounded, ~4·|shingles| bytes per band) → bucket
    by (band, band-signature) via groupBy + in-bucket pair expansion →
    verify inline from the carried sets → distinct.  Three shuffles total;
    per-bucket work is quadratic only in bucket size, the LSH guarantee.
    """
    band_rows = minhash_band_index(
        docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        seed=seed,
        hash_mode=hash_mode,
        token_mode=token_mode,
        shingle_unit=shingle_unit,
        # uncapped mode emits each pair from its FIRST agreeing band
        # (r18) — the decision needs the full signature in the bucket
        carry_sig=max_bucket_size is None,
    )
    # hot-bucket guard BEFORE the members aggregate, not after (r13):
    # filtering the BUILT bucket row caps only the pair explode —
    # collect_list still ASSEMBLES every hot bucket, each member
    # carrying its ~4·|shingles|-byte hset, so hot buckets consume
    # aggregation-buffer memory proportional to their (corpus-linear)
    # size — the class that OOMs first at real scale.  The pre-count is
    # a map-side-combined count aggregate whose join back drops hot
    # rows before ANY buffer assembles them: bounded agg state by
    # construction, and measured faster on the codepoint-saturation
    # twin (sf10: 104.4 s cap-after → 91.0 s cap-before; values
    # identical).  The residual sf1→sf10 superlinearity there (3.4 →
    # 91 s) is IN-CAP candidate density — a saturated corpus fills many
    # buckets to just under the cap — so on such corpora the real
    # controls remain the threshold and the shingle unit (SCALE.md
    # round 13).  Semantics identical to the post-filter (drop whole
    # oversized buckets).
    if max_bucket_size is not None:
        from kafka_streams_one_to_many_join_spark.model import materialize

        # two consumers (sizes + the join) would re-run tokenize+sign
        # per branch — pin the band rows once (the diamond rule)
        band_rows = materialize(band_rows, eager=False)
        sizes = band_rows.groupBy("band", "bsig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        band_rows = band_rows.join(
            sizes.filter(
                (F.col("_bn") > 1) & (F.col("_bn") <= max_bucket_size)
            ).select("band", "bsig"),
            ["band", "bsig"],
        )
    member_cols = ["doc_id", "hset"] + (
        ["sig"] if max_bucket_size is None else []
    )
    buckets = (
        band_rows.groupBy("band", "bsig")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(*member_cols))
            ).alias("members")
        )
        .filter(F.size("members") > 1)
    )
    # n_common/n_total are computed INSIDE the pair lambda, so the O(|hset|)
    # array_intersect runs exactly once per candidate pair.  Projecting the
    # sets out and intersecting downstream looks equivalent but is not:
    # Catalyst collapses the projection and re-inlines the intersect into
    # the pushed-down jaccard filter — 3 evaluations per surviving pair
    # (the ann_topk_ivf regression class; the hygiene fence now counts
    # array_intersect too).
    if max_bucket_size is None:
        # First-agreeing-band emission (r18, the simhash_near_dup_pairs
        # r18 pattern): a candidate pair agreeing on several bands used
        # to be expanded, verified, and shuffled once PER band, with an
        # output-sized .distinct() folding the copies.  Each member row
        # carries the full signature, so the pair lambda skips any pair
        # an earlier band already emitted (their slices agree there) —
        # every qualifying pair surfaces exactly once, the duplicate
        # intersects are never computed, and the distinct disappears.
        # Capped mode cannot do this: its first-agreeing band's bucket
        # may have been dropped as hot, so it keeps per-band emission +
        # distinct.
        rows_per_band = num_hashes // bands
        first_band = (
            "band = 0 or not exists(sequence(0, band - 1), bb -> "
            f"slice(x.sig, bb * {rows_per_band} + 1, {rows_per_band}) = "
            f"slice(y.sig, bb * {rows_per_band} + 1, {rows_per_band}))"
        )
        pair_expr = (
            "flatten(transform(members, (x, i) -> "
            "transform(filter(slice(members, i + 2, size(members) - i - 1), "
            f"y -> {first_band}), y -> "
            "struct(x.doc_id as doc_a, y.doc_id as doc_b, "
            "cast(size(array_intersect(x.hset, y.hset)) as bigint) as n_common, "
            "size(x.hset) + size(y.hset) as n_total))))"
        )
    else:
        pair_expr = (
            "flatten(transform(members, (x, i) -> "
            "transform(slice(members, i + 2, size(members) - i - 1), y -> "
            "struct(x.doc_id as doc_a, y.doc_id as doc_b, "
            "cast(size(array_intersect(x.hset, y.hset)) as bigint) as n_common, "
            "size(x.hset) + size(y.hset) as n_total))))"
        )
    verified = (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("p.n_common").alias("n_common"),
            F.col("p.n_total").alias("n_total"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_total") - F.col("n_common")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    if max_bucket_size is None:
        # first-agreeing-band emission already yields each pair once
        return verified
    # the same pair can surface from several bands with the identical
    # verified jaccard — dedupe at the very end, on the small result
    return verified.distinct()


SIMHASH_BITS = 60  # 4 bands × 15 bits; fits BIGINT in every engine


def simhash_token_hash_expr(toks_expr: str) -> str:
    """SQL expr: distinct tokens of ``toks_expr`` (an array expression) →
    array of 60-bit md5-prefix token hashes.  Shared by simhash_buckets
    and the consolidated doc-profile query so the hash recipe has exactly
    one definition."""
    return (
        "transform(array_distinct({t}), t -> "
        "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    ).format(t=toks_expr)


def simhash_majority_expr(th_col: str) -> str:
    """SQL expr: per-bit majority vote over a MATERIALIZED hash-array
    column → the 60-bit simhash.  ``th_col`` must be a plain column
    reference (not the transform expression itself): the vote reads the
    array 120×, so inlining the hash computation would re-hash every
    token 120×.

    The per-bit count is a plain aggregate sum, not size(filter(...)):
    identical result, but filter ALLOCATES a new array per bit (60
    allocations per row) — measured 0.30 → 0.22 s for the vote stage at
    sf0.1.  (A single-pass zip_with counts-vector variant was measured
    7× SLOWER — one 60-element array allocation per token.)"""
    return (
        f"aggregate(sequence(0, {SIMHASH_BITS - 1}), cast(0 as bigint), (acc, b) -> acc + "
        f"if(aggregate({th_col}, cast(0 as bigint), (a, v) -> a + pmod(shiftright(v, b), 2)) * 2 "
        f"> size({th_col}), "
        "shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"
    )


def simhash_majority_vote_pandas():
    """Arrow-vectorized twin of ``simhash_majority_expr``: the per-bit
    majority vote as a pandas UDF over the materialized token-hash
    array.  Bit-identical to the expression form on every input class
    the expression handles (empty array → 0, NULL array → 0 — the
    expression's if(NULL) falls through to the 0 arm per bit).

    Why it exists: the expression vote is an interpreted CodegenFallback
    ``aggregate×aggregate`` that re-reads the token-hash array 60× per
    row — the heaviest per-row constant in the repo (r09 VERDICT;
    SCALE.md round 10 A/B).  Here the inner 60× loop becomes ONE numpy
    broadcast per row ((n_tokens × 60) bit matrix, summed down the
    token axis), paying one Arrow crossing for the column instead.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)

    # no pd.Series annotations: the module's `from __future__ import
    # annotations` turns them into strings the type-hint inferrer cannot
    # resolve against the function-local pandas import
    @pandas_udf("bigint", "scalar")
    def _vote(th):
        out = np.zeros(len(th), dtype=np.int64)
        for i, v in enumerate(th):
            if v is None or len(v) == 0:
                continue
            a = np.asarray(v, dtype=np.int64)
            counts = ((a[:, None] >> shifts) & 1).sum(axis=0)
            out[i] = int(((counts * 2 > len(a)).astype(np.int64) << shifts).sum())
        return pd.Series(out)

    return _vote


def simhash_buckets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vote_mode: str = "expr",
    token_mode: str = "ascii",
) -> DataFrame:
    """(doc_id, simhash BIGINT) — 60-bit SimHash over the token set.

    Bit i of the hash of token t = bit i of md5(t) (first 15 hex chars =
    60 bits).  simhash bit i = 1 iff more tokens set bit i than clear it.
    60 (not 64) bits so band values and powers of two stay inside signed
    64-bit range in BOTH engines' SQL.  Pure expressions; md5-based so
    the oracle mirrors it nibble-for-nibble.

    ``vote_mode="pandas"`` swaps the expression vote for the
    Arrow-vectorized twin (``simhash_majority_vote_pandas``) —
    bit-identical output, measured A/B in SCALE.md round 10; "expr"
    stays the default (zero Python dependency in the oracle-parity
    path).
    """
    # Materialize per-token hashes once via codegen'd conv (no per-nibble
    # lambda), THEN take the majority votes over the materialized array —
    # see simhash_majority_expr on why inlining would re-hash 120×.
    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    hashed = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.expr(simhash_token_hash_expr(_tokens(text_col, token_mode))).alias("_th"),
    )
    if vote_mode == "pandas":
        return hashed.select(
            "doc_id", simhash_majority_vote_pandas()("_th").alias("simhash")
        )
    return hashed.select(
        "doc_id", F.expr(simhash_majority_expr("_th")).alias("simhash")
    )


def _band_offsets(max_hamming: int) -> list[tuple[int, int]]:
    """(bit offset, width) of each pigeonhole band over the 60-bit hash."""
    bands = max_hamming + 1
    if not 1 <= bands <= SIMHASH_BITS // 8:
        raise ValueError(
            f"max_hamming={max_hamming} needs {bands} bands; {SIMHASH_BITS}-bit "
            f"simhash supports 0 <= max_hamming <= {SIMHASH_BITS // 8 - 1} "
            "(narrower bands than 8 bits degenerate into quadratic buckets)"
        )
    width, extra = divmod(SIMHASH_BITS, bands)
    offsets, off = [], 0
    for b in range(bands):
        w = width + (1 if b < extra else 0)
        offsets.append((off, w))
        off += w
    return offsets


def _band_structs_expr(max_hamming: int) -> str:
    """SQL array of (band, bval) structs over a ``simhash`` column.

    Pigeonhole banding: ``max_hamming + 1`` bands over the 60-bit hash,
    so two hashes within Hamming distance h agree on at least one band
    (exact blocking, recall 1.0).  Deriving the band count from the
    threshold is also the scale knob — see simhash_near_dup_pairs."""
    return ", ".join(
        f"named_struct('band', {b}, "
        f"'bval', pmod(shiftright(simhash, {o}), {1 << w}))"
        for b, (o, w) in enumerate(_band_offsets(max_hamming))
    )


def _first_agreeing_band_expr(xor_expr: str, max_hamming: int) -> str:
    """SQL text: the LOWEST band index on which two simhashes agree,
    given their XOR.  Defined (non-NULL) whenever the pair is within the
    pigeonhole threshold — Hamming ≤ max_hamming guarantees at least one
    band's chunk of the XOR is zero."""
    arms = " ".join(
        f"when pmod(shiftright({xor_expr}, {o}), {1 << w}) = 0 then {b}"
        for b, (o, w) in enumerate(_band_offsets(max_hamming))
    )
    return f"(case {arms} end)"


def _simhash_band_rows(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int,
    token_mode: str = "ascii",
) -> DataFrame:
    """(doc_id, simhash, band, bval) — one row per (signed doc, band),
    shared by the pair and cluster faces of simhash near-dup."""
    from kafka_streams_one_to_many_join_spark.functions.text import token_re

    band_structs = _band_structs_expr(max_hamming)
    # Predicate and tokenizer must agree: tokens come from
    # regexp_extract_all(lower(text), token_re(mode)), so the token-free
    # test is the mode's token class on the LOWERCASED text — a character
    # that only lowercases into the class (e.g. U+212A KELVIN SIGN → 'k'
    # in ascii mode) yields tokens and must be signed, matching the
    # oracle (which tokenizes and therefore signs it).
    sigs = simhash_buckets(
        docs.filter(F.lower(F.col(text_col)).rlike(token_re(token_mode))),
        text_col,
        id_col,
        token_mode=token_mode,
    )
    return sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"array({band_structs})")).alias("bs"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bs.band").alias("band"),
        F.col("bs.bval").alias("bval"),
    )


def simhash_near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_iter: int = 25,
    token_mode: str = "ascii",
) -> DataFrame:
    """Connected components of the Hamming-≤h relation WITHOUT ever
    materializing the pair relation — the principled dense-corpus
    control for simhash_near_dup_pairs.

    On dense corpora (repetitive vocabulary — the measured sf100 twin
    holds 1.97M true pairs among 50k docs) the pair relation is
    Ω(output) quadratic and ``max_bucket_size`` can only SAMPLE it
    (recall 0.016 at cap 256, SCALE.md round 10).  Cluster semantics
    sidestep the bound: the deliverable becomes one (doc_id,
    cluster_id) row per clustered doc — O(docs) output — while staying
    EXACT for the threshold: the output equals
    ``near_dup_clusters(simhash_near_dup_pairs(docs, max_hamming=h))``
    (differentially asserted in tests/test_functions.py).

    Algorithm: SIGNATURE COLLAPSE, then min-label propagation inside
    the band buckets.  Hamming distance between docs is a function of
    their signatures alone, and equal signatures are mutually
    Hamming-0, so the doc graph is a clique-blowup of the quotient
    graph on DISTINCT signatures — clustering the quotient and fanning
    labels back out is exact and collapses the dense-dedup case (identical-
    document floods) before any quadratic work: the 50k-doc dense twin
    holds 1.97M doc pairs but only |distinct sigs| propagation nodes.
    Every true quotient edge (hamming ≤ h) lands in some shared band
    bucket (pigeonhole, exact), so one round of "each signature takes
    the min label among its Hamming-verified bucket co-members" is one
    round of label propagation over the true relation; iterating to
    the sum-of-labels fixpoint yields its connected components.  Per
    round the hot-bucket work is O(|bucket|²) *bit-op compares* (xor +
    bit_count inside a codegen'd SQL lambda — no structs, no explode)
    over DISTINCT signatures, and only O(|bucket|) rows materialize;
    the pair path's quadratic explode/distinct/shuffle never happens.

    Scale shape: after round 1 the label table shrinks to signatures
    in the dup graph (a signature is in iff it covers ≥ 2 docs — an
    internal Hamming-0 pair — or has a verified neighbor signature),
    so every later round joins/shuffles only the dup graph.  Rounds =
    O(quotient-component diameter).  Convergence is the same
    sum-of-labels fixpoint as near_dup_clusters: one driver scalar per
    round, never a row-level collect; ``model.materialize`` truncates
    lineage each round (reliable-checkpoint knob applies).

    Output: (doc_id, cluster_id = min doc_id reachable via Hamming-≤h
    steps); docs with no near-dup absent.

    When to use which path — MEASURED crossover
    (scripts/simhash_crossover.py on the dense twins, SCALE.md "The
    crossover, measured at 500k"): use ``simhash_near_dup_pairs`` (+
    ``near_dup_clusters`` if you need clusters) while the pair
    relation still fits — at this density that ends between 50k docs
    (pairs-only 14.3 s vs 80.1 s here) and 500k docs, where the pair
    path DNF'd twice (Java heap OOM at 16g mid pair-materialization;
    still inside that first stage at a 2,400 s bound with 96g) while
    this operator completed in 1,278 s with 318,633 memberships.  The
    crossover is memory-first: the pair path must materialize the
    Ω(pairs) relation (~×100 per decade on dense corpora) before CC
    can start, while this operator's state never exceeds O(distinct
    signatures) labels.  Both paths produce identical memberships at
    every scale both complete (differentially asserted).
    """
    from kafka_streams_one_to_many_join_spark.functions.text import token_re
    from kafka_streams_one_to_many_join_spark.model import (
        materialize,
        materialize_with_sum,
    )

    # One eager pipeline pins EVERYTHING the loop needs (r18): sigs is a
    # LAZY checkpoint whose blocks pin as a side effect of band_rows'
    # eager job (one setup job instead of two), and the corpus-wide
    # signature aggregate (rep, n_docs per simhash) rides band_rows —
    # every signature carries band 0, so ``groups`` and the jump table
    # ``rep_sig`` are NARROW projections of the pinned band_rows blocks
    # (guide §2.4: no re-aggregation, no extra checkpoint, no eager
    # AQE stage execution — r17 pinned rep_sig separately, which still
    # re-ran the groupBy stages once at construction).
    sigs = materialize(
        simhash_buckets(
            docs.filter(F.lower(F.col(text_col)).rlike(token_re(token_mode))),
            text_col,
            id_col,
            token_mode=token_mode,
        ).select(F.col("doc_id"), F.col("simhash")),
        eager=False,
    )
    groups_agg = sigs.groupBy("simhash").agg(
        F.min(F.col("doc_id").cast("long")).alias("rep"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    band_structs = _band_structs_expr(max_hamming)
    band_rows = materialize(
        groups_agg.select(
            "simhash",
            "rep",
            "n_docs",
            F.explode(F.expr(f"array({band_structs})")).alias("bs"),
        ).select(
            "simhash",
            "rep",
            "n_docs",
            F.col("bs.band").alias("band"),
            F.col("bs.bval").alias("bval"),
        )
    )
    groups = band_rows.filter(F.col("band") == 0).select(
        "simhash", "rep", "n_docs"
    )
    # Round 1 doubles as the graph-membership filter: a signature's min
    # verified-neighbor label (OTHER signatures only) is non-NULL iff it
    # has an external near-dup edge; n_docs > 1 is the internal
    # Hamming-0 edge.  array_min over an empty filter result is NULL.
    verified_min = (
        "transform(members, x -> named_struct("
        "'simhash', x.simhash, "
        "'lbl', array_min(transform("
        f"  filter(members, y -> bit_count(x.simhash ^ y.simhash) <= {max_hamming}"
        "         and y.simhash != x.simhash), "
        "  y -> y.lbl))))"
    )
    nbr_min = (
        band_rows.withColumn("lbl", F.col("rep"))
        .groupBy("band", "bval")
        .agg(F.collect_list(F.struct("simhash", "lbl")).alias("members"))
        .filter(F.size("members") > 1)
        .select(F.explode(F.expr(verified_min)).alias("m"))
        .select(F.col("m.simhash").alias("simhash"), F.col("m.lbl").alias("nbr_lbl"))
        .filter(F.col("nbr_lbl").isNotNull())
        .groupBy("simhash")
        .agg(F.min("nbr_lbl").alias("nbr_lbl"))
    )
    labels, prev_sum = materialize_with_sum(
        groups.join(nbr_min, "simhash", "left")
        .filter((F.col("n_docs") > 1) | F.col("nbr_lbl").isNotNull())
        .select(
            "simhash",
            F.least(F.col("rep"), F.coalesce("nbr_lbl", "rep")).alias("lbl"),
        ),
        "lbl",
    )
    # Later rounds propagate over the SAME buckets, labels restricted to
    # the dup graph (the inner join drops out-of-graph signatures from
    # the buckets — they contribute nothing to any min and only widen
    # the quadratic compare).  Self is included in the min here: a
    # component's minimum member must keep its own label.  The union
    # with the previous labels retains signatures whose only dup edge
    # is internal (n_docs > 1, no external neighbor) — post-restriction
    # they may sit exclusively in singleton buckets.
    propagate = (
        "transform(members, x -> named_struct("
        "'simhash', x.simhash, "
        "'lbl', array_min(transform("
        f"  filter(members, y -> bit_count(x.simhash ^ y.simhash) <= {max_hamming}), "
        "  y -> y.lbl))))"
    )
    # Pointer jumping (path halving): labels are doc ids, and every
    # label in the graph is the rep of some signature — so after each
    # bucket-propagation hop, replace lbl with THAT signature's current
    # label.  One hop per round through buckets + one jump per round
    # turns O(component diameter) rounds into O(log diameter) — the
    # difference between 25 rounds and ~6 on chain-shaped near-dup
    # components (incremental-edit chains, the dense-twin shape).
    #
    # rep_sig is LOOP-INVARIANT (r17) and, since r18, a narrow
    # projection of the pinned band_rows blocks (via ``groups``) — no
    # checkpoint of its own, no per-round re-aggregation, and no eager
    # stage execution at construction (the r17 lazy checkpoint still
    # ran the groupBy's shuffle stages once under AQE's toRdd).
    rep_sig = groups.select(
        F.col("rep").alias("lbl"), F.col("simhash").alias("_ls")
    )
    for _ in range(max_iter):
        propagated = (
            band_rows.join(labels, "simhash")
            .groupBy("band", "bval")
            .agg(F.collect_list(F.struct("simhash", "lbl")).alias("members"))
            .filter(F.size("members") > 1)
            .select(F.explode(F.expr(propagate)).alias("m"))
            .select(F.col("m.simhash").alias("simhash"), F.col("m.lbl").alias("lbl"))
        )
        hopped = (
            labels.unionByName(propagated)
            .groupBy("simhash")
            .agg(F.min("lbl").alias("lbl"))
        )
        jumped = (
            hopped.join(rep_sig, "lbl", "left")
            .join(
                labels.select(F.col("simhash").alias("_ls"), F.col("lbl").alias("_lbl2")),
                "_ls",
                "left",
            )
            .select(
                "simhash",
                F.least(F.col("lbl"), F.coalesce("_lbl2", "lbl")).alias("lbl"),
            )
        )
        # The convergence scalar rides the checkpoint job as an observed
        # metric (r17): the eager localCheckpoint is already an action
        # over every label row, so a separate agg().collect() job per
        # round paid one extra job submission + scan for a sum the
        # checkpoint pass can emit for free.
        labels, s = materialize_with_sum(jumped, "lbl")
        if s == prev_sum:
            break
        prev_sum = s
    return sigs.join(labels, "simhash").select(
        "doc_id", F.col("lbl").alias("cluster_id")
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
    token_mode: str = "ascii",
) -> DataFrame:
    """SimHash near-dup pairs: banded blocking + exact Hamming verify.

    The 60-bit simhash splits into ``max_hamming + 1`` bands (pigeonhole:
    two hashes within Hamming distance h differ in ≤ h bands, so they
    AGREE on at least one of h+1 — the band-bucket blocking is EXACT,
    recall 1.0, for any ``max_hamming`` the 60 bits can cover).  Deriving
    the band count from the threshold is also the scale knob: the default
    h=3 gives 4 bands × 15 bits = 32768 buckets per band; a stricter h=2
    gives 3 bands × 20 bits = 1M buckets — tighter thresholds get smaller
    buckets exactly when corpus growth would otherwise inflate them.  On
    clustery corpora wide buckets mean a quadratic pair explosion
    (measured 17s vs 2s at sf0.1 for 8-bit bands), so never band wider
    than the threshold requires.  Same single-pass bucket dataflow as
    minhash_lsh_pairs: groupBy (band, band-value) + in-bucket pair
    expansion, no self-join, 3 shuffles.

    Token-free documents (empty or no alphanumerics) are excluded before
    signing: a corpus's empty docs would otherwise all share the
    zero-signature and spuriously pair with each other.  The exclusion
    is a cheap ``rlike`` scan predicate — NOT a ``size(tokens) > 0``
    filter, which Catalyst would push below the parallelism spread and
    re-evaluate the whole tokenize+hash transform per row at the scan.

    ``max_bucket_size`` (default ``None`` = unbounded exact semantics,
    the roster/oracle path) drops any (band, band-value) bucket above
    the cap before the in-bucket enumeration — a WORK BOUND, and
    unlike the minhash_lsh_pairs twin it is NOT recall-cheap in
    general.  Two different regimes (measured, SCALE.md round-10 third
    decade):

    - On the repetitive-vocabulary scale twin the Hamming-≤3 relation
      is DENSE — 1.97M true pairs among 50k docs — so the quadratic
      candidate term (8.5e9 at 500k docs, 845e9 at 5M; hottest 15-bit
      band value ~10% of the corpus at every tier) is mostly TRUE
      OUTPUT, and an Ω(output) computation cannot be made sub-quadratic
      by any blocking.  The cap there is a SAMPLE of the relation:
      recall 0.016 at cap 256 / 0.15 at cap 1024, and the kept-pair
      count DECAYS with corpus growth (39,124 at sf10 → 37,845 at
      sf100) as more buckets blow the cap.  The principled dense-corpus
      controls are a stricter ``max_hamming`` (fewer bands → wider band
      bits → exponentially smaller buckets AND fewer true pairs — the
      threshold IS the output-size dial) or cluster/canonical semantics
      downstream that never materialize the full pair relation.
    - On a sparse relation (diverse vocabulary, near-dup pairs rare —
      the real-web regime) hot buckets are bit-skew artifacts holding
      almost no true pairs, and the cap behaves like the MinHash one.
      Note the fixed band space still saturates eventually: even with
      perfectly uniform bits, 15-bit bands give n/32768-sized buckets,
      so at n ≫ 10^6 prefer a stricter ``max_hamming`` over relying on
      the cap.

    Output: (doc_a < doc_b, hamming BIGINT ≤ max_hamming).
    """
    band_rows = _simhash_band_rows(docs, text_col, id_col, max_hamming, token_mode)
    buckets = (
        band_rows.groupBy("band", "bval")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "simhash"))).alias("members"))
        .filter(F.size("members") > 1)
    )
    # hot-bucket guard BEFORE the quadratic enumeration (see docstring;
    # size predicate on the built bucket row — no extra shuffle)
    if max_bucket_size is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket_size)
    # In-lambda Hamming verification BEFORE any pair materializes:
    # element_at indexing instead of slice() (slice COPIES the tail
    # sub-array per member — O(n²) struct copies in a clustery bucket),
    # and only qualifying pairs ever become structs / exploded rows.
    # On the self-similar sf0.1 fixture one bucket alone holds 1.25M
    # candidate pairs of which ~90% fail the Hamming check — measured
    # 2.21 s → 1.94 s for the operator.
    #
    # FIRST-AGREEING-BAND emission (r18, guide §2.4 "remove shuffles
    # outright"): a qualifying pair agrees on up to max_hamming+1 bands
    # and used to be emitted once per agreeing band, then collapsed by a
    # full `.distinct()` shuffle over the pair relation (~271k rows at
    # sf0.1; output-sized at scale).  Both members' simhashes are in the
    # bucket row, so each bucket can decide locally whether IT is the
    # pair's lowest agreeing band — every pair is emitted exactly once
    # and the distinct disappears.  A few extra shiftright/pmod bit ops
    # per qualifying pair buy the removal of one full shuffle + hash
    # aggregate.  (Assumes unique doc_ids — the operator's existing
    # contract: with duplicate ids the old distinct ALSO collapsed
    # legitimately repeated pairs.)
    #
    # EXACT (uncapped) mode only: under ``max_bucket_size`` a pair whose
    # first agreeing band's bucket was dropped as hot must still be
    # emitted by a later surviving band — the capped mode keeps the
    # per-band emission + distinct so its recall semantics are unchanged.
    xor = "x.simhash ^ element_at(members, j + 1).simhash"
    first_band_pred = (
        f" and band = {_first_agreeing_band_expr(xor, max_hamming)}"
        if max_bucket_size is None
        else ""
    )
    pair_expr = (
        "flatten(transform(members, (x, i) -> "
        "transform("
        "  filter(if(i + 1 >= size(members), cast(array() as array<int>), "
        "            sequence(i + 1, size(members) - 1)), "
        f"         j -> bit_count({xor}) <= {max_hamming}{first_band_pred}), "
        "  j -> struct(x.doc_id as doc_a, element_at(members, j + 1).doc_id as doc_b, "
        f"cast(bit_count({xor}) as bigint) as hamming))))"
    )
    pairs = buckets.select(F.explode(F.expr(pair_expr)).alias("p")).select(
        F.col("p.doc_a").alias("doc_a"),
        F.col("p.doc_b").alias("doc_b"),
        F.col("p.hamming").alias("hamming"),
    )
    return pairs if max_bucket_size is None else pairs.distinct()


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

    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    # probe side spread across cores (cosines are evaluated here); the
    # broadcast side stays un-repartitioned — shuffling before a
    # broadcast would be pure waste
    a = ensure_parallelism(emb).select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_va"),
        F.expr(norm_expr(vec_col)).alias("_na"),
    )
    b = emb.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_vb"),
        F.expr(norm_expr(vec_col)).alias("_nb"),
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

    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    bucketed = ensure_parallelism(emb).select(
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


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph.

    Turns any pair list (ngram_jaccard_pairs / minhash_lsh_pairs /
    simhash_near_dup_pairs / embedding twins) into cluster assignments:
    one output row per node that appears in ANY pair, with
    ``cluster_id`` = the smallest node id reachable from it.  Singleton
    docs (no pairs) are intentionally absent — callers anti-join.

    Algorithm: iterative min-label propagation (the standard Spark
    formulation of connected components, cf. GraphX/GraphFrames): every
    node starts labeled with itself; each round, labels flow across edges
    and each node keeps the minimum seen.  Converges in O(component
    diameter) rounds — near-dup clusters are dense and shallow (diameter
    a handful), so the round count is small and data-independent of
    corpus size.

    Scale: the label table is O(|nodes in the dup graph|) — orders of
    magnitude smaller than the corpus (only docs with at least one
    near-dup edge).  Each round is one shuffle join on node id plus a
    groupBy(min); the one driver-side scalar per round is the convergence
    test (label sums decrease monotonically, so sum-unchanged ⇔ fixpoint
    — no row-level collect).  ``model.materialize`` truncates the growing
    lineage each round: executor-local blocks by default, or reliable
    checkpointing when ``spark.graft.checkpointDir`` /
    ``SPARK_GRAFT_CHECKPOINT_DIR`` is set (the cluster-scale escape hatch
    — executor loss then no longer fails the job).
    """
    from kafka_streams_one_to_many_join_spark.model import (
        materialize,
        materialize_with_sum,
    )

    e = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .transform(materialize)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .transform(materialize)
    )
    prev_sum = None
    for _ in range(max_iter):
        prop = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), F.col("lbl"))
        # convergence sum observed during the checkpoint job itself —
        # one job per round instead of two (see materialize_with_sum)
        labels, s = materialize_with_sum(
            labels.union(prop).groupBy("node").agg(F.min("lbl").alias("lbl")),
            "lbl",
        )
        if s == prev_sum:
            break
        prev_sum = s
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def contamination_pairs(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_common: int = 1,
) -> DataFrame:
    """Benchmark contamination: training docs sharing ≥ ``min_common``
    word-n-gram shingles with any benchmark/eval document.

    The decontamination primitive of every pre-training pipeline: before
    training, anti-join the corpus against the eval suites' n-grams.
    Output (train_id, bench_id, n_common) — one row per contaminated
    (train, bench) pair with the shared-shingle count, for audit; the
    anti-join form is ``train.join(result.select('train_id'), 'left_anti')``.

    Scale: both sides reduce to distinct (id, shingle) — text never
    shuffles.  The equi-join keys on the shingle string; the benchmark
    side is the small one by construction (eval suites are fixed-size
    while the corpus grows), so Spark broadcasts it and the corpus side
    streams map-side with NO shuffle of the training corpus.  Work is
    O(|train shingles| + matches).
    """
    st = shingles(train, text_col, id_col, n).withColumnRenamed(
        "doc_id", "train_id"
    )
    sb = shingles(bench, text_col, id_col, n).withColumnRenamed(
        "doc_id", "bench_id"
    )
    return (
        st.join(F.broadcast(sb), "shingle")
        .groupBy("train_id", "bench_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def segment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 10,
    token_mode: str = "ascii",
) -> DataFrame:
    """(doc_id, seg_h) — the persistable per-document segment index for
    line-level dedup (one row per non-overlapping ``width``-token
    segment; the full pipeline's own intermediate state, exposed like
    ``minhash_band_index``).  Persist it (and optionally the derived
    (seg_h, occ) counts) for the frozen corpus; dedup each new shard
    with ``segment_dedup_incremental``."""
    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    return ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"),
        F.expr(_tokens(text_col, token_mode)).alias("_toks"),
    ).select(
        "doc_id", F.explode(F.expr(segment_hash_expr("_toks", width))).alias("seg_h")
    )


def _segment_fractions(pairs: DataFrame, occ: DataFrame) -> DataFrame:
    """Per-doc duplicated-segment accounting from (doc_id, seg_h) pairs
    and (seg_h, occ) global counts — the tail of the full pipeline,
    shared by the incremental face."""
    per_doc = (
        pairs.join(occ, "seg_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum((F.col("occ") >= 2).cast("bigint")).alias("n_dup_segments"),
        )
    )
    frac = F.col("n_dup_segments").cast("double") / F.col("n_segments").cast("double")
    return per_doc.select(
        "doc_id",
        "n_segments",
        "n_dup_segments",
        F.round(frac, 6).alias("dup_frac"),
        (frac <= 0.5).alias("keep"),
    )


def segment_dedup_incremental(
    new_docs: DataFrame,
    doc_segs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 10,
    token_mode: str = "ascii",
    seg_counts: DataFrame | None = None,
) -> DataFrame:
    """Incremental segment-level dedup with RETROACTIVE updates — the
    batch face of the problem ``streaming.dedup``'s retroactive twin
    solves per micro-batch: when a new shard repeats a segment the
    frozen corpus saw only ONCE, the frozen owner's duplicated fraction
    changes too, so "just score the shard" is wrong.

    Inputs: the shard and the frozen corpus's persisted segment index
    (``segment_pairs`` output — the frozen text itself is never re-read
    or re-tokenized).  Output: the full pipeline's per-doc rows
    (doc_id, n_segments, n_dup_segments, dup_frac, keep) for

    - every shard document (scored against frozen ∪ shard occurrence
      counts), and
    - every AFFECTED frozen document — one owning at least one segment
      whose occurrence count crossed 1 → ≥2 because of this shard (the
      only transition that can change a frozen row WITHIN a nightly
      window: a shard only ADDS occurrences, and a segment already at
      occ ≥ 2 stays duplicated.  Counts DECREASE only through
      ``segment_index_apply`` — deletes/corrections retract rows and
      decrement counts BETWEEN windows, after which this premise holds
      again; the maintain-then-probe composition is differentially
      asserted in tests/test_segment_maintenance.py).

    Rows for unaffected frozen docs are bit-identical to their
    frozen-only scores, so the union of (this output restricted to its
    doc set) + (prior scores for everyone else) equals the full
    recompute — differentially asserted in tests.

    Scale shape (reworked r14 after the crossover measurement —
    SCALE.md r14 found the old probe FLOORED at ~0.5× full because it
    built and MATERIALIZED an index-sized (seg_h, occ) union via a
    full-outer join): every index-sized input is now SCAN-ONLY.  The
    frozen occurrence lookups are restricted to the segments the probe
    actually needs — the shard's segments and the affected docs'
    segments, both probe-proportional — via broadcast inner joins
    against the index/counts scan, so NO index-sized shuffle, no
    index-sized checkpoint, and no full-outer join exist on any path;
    the only corpus-proportional work left is column-pruned scans of
    (doc_id, seg_h) / (seg_h, occ).  Work: shard tokenization +
    probe-proportional aggregates + 2-4 index scans;
    corpus-size-independent beyond those scans.  Caveat: the
    restriction broadcasts (the shard's distinct segments, the affected
    doc ids) are probe-proportional — the right cost model for nightly
    shards; a shard approaching corpus size should run the full
    pipeline instead (measured crossover: SCALE.md r14).
    """
    from kafka_streams_one_to_many_join_spark.model import materialize

    new_pairs = materialize(
        segment_pairs(new_docs, text_col, id_col, width, token_mode)
    )
    delta = materialize(
        new_pairs.groupBy("seg_h").agg(F.count(F.lit(1)).alias("_d")),
        eager=False,
    )

    def frozen_occ_for(keys: DataFrame) -> DataFrame:
        """(seg_h, _f) frozen occurrence counts for EXACTLY the given
        (small) key set: restrict the big side with a broadcast inner
        join first — the index/counts table is scanned, never shuffled
        (a direct keys-left-outer-big join would shuffle the big side;
        broadcast left-outer only supports building the right) — then
        re-attach misses as NULL _f via a small×small left join."""
        if seg_counts is not None:
            found = seg_counts.select(
                "seg_h", F.col("occ").alias("_f")
            ).join(F.broadcast(keys.select("seg_h")), "seg_h")
        else:
            # no persisted counts: aggregate the index's matching rows
            # only (scan + broadcast semi-restriction + small agg)
            found = (
                doc_segs.join(F.broadcast(keys.select("seg_h")), "seg_h")
                .groupBy("seg_h")
                .agg(F.count(F.lit(1)).alias("_f"))
            )
        return keys.join(F.broadcast(found), "seg_h", "left")

    # occurrence counts restricted to the shard's segments (shard rows
    # only ever look their own segments up)
    occ_sh = materialize(
        frozen_occ_for(delta).select(
            "seg_h",
            F.coalesce("_f", F.lit(0)).alias("_f"),
            "_d",
            (F.coalesce("_f", F.lit(0)) + F.col("_d")).alias("occ"),
        ),
        eager=False,
    )
    # the occ frames below are probe-proportional, so their fraction
    # joins broadcast DETERMINISTICALLY (without the hint the initial
    # plan sort-merge-joins checkpointed frames whose sizes AQE only
    # learns at runtime; the full pipeline's _segment_fractions call
    # stays unhinted — ITS occ side is corpus-sized)
    shard_rows = _segment_fractions(
        new_pairs, F.broadcast(occ_sh.select("seg_h", "occ"))
    )
    # the retroactive trigger: frozen-once segments the shard repeats
    crossing = occ_sh.filter((F.col("_f") == 1) & (F.col("_d") >= 1)).select("seg_h")
    affected = (
        doc_segs.join(F.broadcast(crossing), "seg_h").select("doc_id").distinct()
    )
    aff_segs = materialize(
        doc_segs.join(F.broadcast(affected), "doc_id"), eager=False
    )
    # occurrence counts restricted to the affected docs' segments: their
    # frozen counts plus whatever the shard added
    occ_aff = (
        frozen_occ_for(aff_segs.select("seg_h").distinct())
        .join(F.broadcast(delta), "seg_h", "left")
        .select(
            "seg_h",
            (
                F.coalesce("_f", F.lit(0)) + F.coalesce("_d", F.lit(0))
            ).alias("occ"),
        )
    )
    affected_rows = _segment_fractions(aff_segs, F.broadcast(occ_aff))
    return shard_rows.unionByName(affected_rows)


def segment_index_apply(
    doc_segs: DataFrame,
    seg_counts: DataFrame | None = None,
    upserts: DataFrame | None = None,
    delete_ids: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 10,
    token_mode: str = "ascii",
) -> tuple[DataFrame, DataFrame | None]:
    """Maintain the persisted segment-dedup state under a MUTABLE corpus
    (VERDICT r14 item 1 — the segment twin of
    ``minhash_band_index_apply``): retract every (doc_id, seg_h) row of
    re-ingested (``upserts``) and deleted (``delete_ids``) documents,
    insert the upserted documents' freshly-segmented rows, and — when
    the persisted (seg_h, occ) counts are passed — DECREMENT/increment
    them to match.  Returns ``(maintained_pairs, maintained_counts)``
    (``maintained_counts`` is None when ``seg_counts`` was None).

    Why it exists: the grow-only state bakes "counts never decrease"
    into the probe, so a frozen document whose duplicate partner is
    deleted can never see its ``dup_frac`` DECREASE — it keeps paying a
    boilerplate penalty for text that no longer exists (the same stale-
    state failure mode the band-index maintenance fixed in r14, and the
    batch analog of the reference's N-side delete propagation,
    DemoApp.scala:224-230).  After maintenance the probe's
    never-decrease premise holds again WITHIN each nightly window;
    decreases happen only through this operator.  Differentially
    asserted in tests/test_segment_maintenance.py: scoring the
    maintained state equals the full recompute on the corrected corpus
    in both directions — dup_frac increase (upsert creates a dup) and
    DECREASE (delete removes the only partner).

    DELETE PRECEDENCE matches the band operator (ADVICE r14 medium): a
    doc_id in BOTH upserts and delete_ids ends DELETED — the upsert's
    fresh rows are anti-joined against the delete set too, so a
    corrected-then-deleted doc cannot be resurrected.  ``delete_ids``
    must be a one-column frame or carry ``id_col``.

    Scale shape: the change set is orders smaller than the state, so
    every state-sized input is SCAN-ONLY — retraction is a broadcast
    anti-join on doc_id (the pairs stream through exchange-free), the
    count decrement reads the retracted docs' rows via a broadcast
    inner join against the same pairs scan, and the count update is a
    broadcast left join of the |changes|-sized delta against the counts
    scan (plan-asserted: no state-sized exchange on any path; 2 counts
    scans + 2 pairs scans + |changes|-sized work total).  Persist both
    outputs via ``sources.bucketed.write_bucketed`` — pairs on
    ``doc_id``, counts on ``seg_h`` — to keep rewrites and nightly
    probes shuffle-free (measured in SCALE.md r15)."""
    del_ids = None
    if delete_ids is not None:
        if id_col in delete_ids.columns:
            del_col = id_col
        elif len(delete_ids.columns) == 1:
            del_col = delete_ids.columns[0]
        else:
            raise ValueError(
                "segment_index_apply: delete_ids must be a one-column id "
                f"DataFrame or carry {id_col!r}; got columns "
                f"{delete_ids.columns} — retracting on an arbitrary first "
                "column would silently delete the wrong documents"
            )
        del_ids = delete_ids.select(F.col(del_col).alias("doc_id")).distinct()
    retract = del_ids
    if upserts is not None:
        up_ids = upserts.select(F.col(id_col).alias("doc_id")).distinct()
        retract = up_ids if retract is None else retract.unionByName(up_ids).distinct()
    fresh = None
    if upserts is not None:
        fresh = segment_pairs(upserts, text_col, id_col, width, token_mode)
        if del_ids is not None:
            # deletes win over same-day upserts (the band precedent)
            fresh = fresh.join(F.broadcast(del_ids), "doc_id", "left_anti")
    out_pairs = doc_segs
    if retract is not None:
        out_pairs = out_pairs.join(F.broadcast(retract), "doc_id", "left_anti")
    if fresh is not None:
        out_pairs = out_pairs.unionByName(fresh.select(*out_pairs.columns))
    if seg_counts is None:
        return out_pairs, None
    # count maintenance: per-seg_h delta = fresh insertions minus the
    # retracted docs' occurrences.  The retracted rows come off the SAME
    # pairs scan via a broadcast inner join (|changes|-proportional
    # output); the delta is |changes|-sized, so it broadcasts — the
    # counts table is scanned, never shuffled.
    from kafka_streams_one_to_many_join_spark.model import materialize

    parts = []
    if retract is not None:
        parts.append(
            doc_segs.join(F.broadcast(retract), "doc_id").select(
                "seg_h", F.lit(-1).cast("bigint").alias("_d")
            )
        )
    if fresh is not None:
        parts.append(fresh.select("seg_h", F.lit(1).cast("bigint").alias("_d")))
    if not parts:
        return out_pairs, seg_counts
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    delta = materialize(
        delta.groupBy("seg_h").agg(F.sum("_d").alias("_d")), eager=False
    )
    # existing keys update in-scan; keys NEW to the counts (only fresh
    # segments can be new — retracted ones were counted when inserted)
    # are found by semi-restricting the counts scan to the delta's keys
    # (small output) and anti-joining the delta against that — the
    # frozen_occ_for trick: the big side is never on the left of an
    # outer join, so it is never shuffled.
    updated = (
        seg_counts.join(F.broadcast(delta), "seg_h", "left")
        .select(
            "seg_h",
            (F.col("occ") + F.coalesce(F.col("_d"), F.lit(0))).alias("occ"),
        )
        .filter(F.col("occ") > 0)
    )
    present = seg_counts.select("seg_h").join(
        F.broadcast(delta.select("seg_h")), "seg_h", "left_semi"
    )
    brand_new = (
        delta.filter(F.col("_d") > 0)
        .join(F.broadcast(present), "seg_h", "left_anti")
        .select("seg_h", F.col("_d").alias("occ"))
    )
    return out_pairs, updated.unionByName(brand_new)


def segment_hash_expr(toks_col: str, width: int = 10) -> str:
    """SQL expression: array of 32-bit md5 hashes of the non-overlapping
    ``width``-token segments of a token array — the line-dedup segmenter
    (sub-document "lines" for single-line corpora) shared bit-for-bit by
    the batch query (``q_segment_dedup``), the streaming twin
    (``streaming.dedup.streaming_segment_dup_deltas``), and the DuckDB
    oracle (nibble-identical md5-prefix arithmetic)."""
    return (
        f"case when size({toks_col}) = 0 then cast(array() as array<bigint>) "
        f"else transform("
        f"  sequence(0, cast(floor((size({toks_col}) + {width - 1}) / {width}) as int) - 1),"
        f"  i -> cast(conv(substring(md5(concat_ws(' ', "
        f"       slice({toks_col}, i * {width} + 1, {width}))), 1, 8), 16, 10) as bigint)) end"
    )
