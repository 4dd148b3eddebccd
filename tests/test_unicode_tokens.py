"""Unicode token contract (r13, VERDICT r12 item 1).

The ASCII token class ``[a-z0-9]+`` — the oracle-parity default pinned
across every roster query — tokenizes every non-Latin document to the
empty array, silently routing a multilingual corpus into the degenerate
"token-free doc" branch of every quality filter and dedup operator.
``token_mode="unicode"`` switches the single definition site
(``functions.text.TOKEN_MODES``) to ``[\\p{L}\\p{M}\\p{N}]+``, which Spark's
Java regex engine and DuckDB's RE2 interpret identically, so the
DuckDB-oracle parity methodology extends to the multilingual path.

This file is that proof, on a committed CJK + Cyrillic fixture corpus:

- ``text_stats`` / ``gopher_quality`` / ``minhash_lsh_pairs`` are
  oracle-paired green in BOTH modes (the unicode oracles embed
  ``token_re("unicode")`` verbatim — same definition site, no drift);
- space-free scripts additionally get codepoint-shingle MinHash
  (``shingle_unit="codepoint"``), oracle-paired against a DuckDB
  mirror of the sliding-substring construction;
- a degenerate fence pins the ASCII-mode behavior the default contract
  promises: non-Latin docs ARE token-free there (n_tokens = 0,
  gopher keep = false, no MinHash pairs among them).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from conftest import stamp_batch_mtimes
from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.functions.dedup import minhash_lsh_pairs
from kafka_streams_one_to_many_join_spark.functions.text import (
    gopher_quality,
    text_stats,
    token_re,
    tokens_expr,
)

# ---------------------------------------------------------------------------
# fixture corpus: Cyrillic near-dup pair, CJK near-dup pair, singletons,
# mixed-script, pure-ASCII control, and the degenerate classes (empty,
# punctuation-only).  doc_id < 100 are non-Latin-only documents.
# ---------------------------------------------------------------------------
RU_A = "зимой в москве идёт снег и дует холодный северный ветер"
RU_B = "зимой в москве идёт снег и дует холодный северный шторм"
ZH_A = "今天北京天气晴朗气温适宜出行游玩大家都很开心"
ZH_B = "今天北京天气晴朗气温适宜出行游玩大家都很高兴"
CORPUS = [
    (1, RU_A, "ru"),
    (2, RU_B, "ru"),
    (3, ZH_A, "zh"),
    (4, ZH_B, "zh"),
    (5, "日本語のテキストです。形態素解析はしません。", "ja"),
    (6, "это совсем другой русский документ про тёплое лето", "ru"),
    (7, "上海明天有大雨请大家记得带伞出门注意安全", "zh"),
    (8, "Смешанный text with английскими words 和中文 2024", "mixed"),
    (9, "الطقس في القاهرة حار جدا في الصيف", "ar"),
    (101, "the quick brown fox jumps over the lazy dog again and again", "en"),
    (102, "", "empty"),
    (103, "!!! ... ——— 》》《《", "punct"),
]
NON_LATIN_IDS = {1, 2, 3, 4, 5, 6, 7, 9}


@pytest.fixture(scope="module")
def udocs(spark, tmp_path_factory):
    pdf = pd.DataFrame(CORPUS, columns=["doc_id", "text", "source"])
    path = str(tmp_path_factory.mktemp("unicode_corpus") / "udocs.parquet")
    pdf.to_parquet(path, index=False)
    sdf = spark.read.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW udocs AS SELECT * FROM '{path}'")
    return sdf, con


def _tok_sql(mode: str) -> str:
    """DuckDB tokenizer from the engine's own definition site — raw regex
    (DuckDB string literals don't process backslashes)."""
    return f"regexp_extract_all(lower(text), '{token_re(mode)}', 0)"


def _compare(spark_df, con, sql: str, name: str) -> None:
    a = spark_df.toPandas()
    b = con.execute(sql).fetchdf()
    assert sorted(a.columns) == sorted(b.columns), name
    assert len(a) == len(b), f"{name}: {len(a)} vs {len(b)}"
    a = a[sorted(a.columns)].sort_values(sorted(a.columns), ignore_index=True)
    b = b[sorted(b.columns)].sort_values(sorted(b.columns), ignore_index=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


# ---------------------------------------------------------------------------
# text_stats — both modes
# ---------------------------------------------------------------------------
def _text_stats_sql(mode: str) -> str:
    tok = _tok_sql(mode)
    nontok = "[^a-z0-9]" if mode == "ascii" else r"[^\p{L}\p{M}\p{N}]"
    return f"""
        WITH base AS (
            SELECT doc_id,
                   len({tok})::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars_total,
                   length(regexp_replace(lower(text), '{nontok}', '', 'g'))::BIGINT AS alpha,
                   len(list_filter({tok},
                       t -> list_contains(['the','a','and','of','to'], t)))::BIGINT AS n_stop
            FROM udocs
        )
        SELECT doc_id, n_tokens, n_chars_total,
               CASE WHEN n_tokens > 0
                    THEN round(alpha::DOUBLE / n_tokens, 6) ELSE 0.0 END AS avg_token_len,
               CASE WHEN n_chars_total > 0
                    THEN round((n_chars_total - alpha)::DOUBLE / n_chars_total, 6)
                    ELSE 0.0 END AS punct_ratio,
               CASE WHEN n_tokens > 0
                    THEN round(n_stop::DOUBLE / n_tokens, 6) ELSE 0.0 END AS stopword_ratio
        FROM base
    """


@pytest.mark.parametrize("mode", ["ascii", "unicode"])
def test_text_stats_parity_both_modes(udocs, mode):
    sdf, con = udocs
    _compare(text_stats(sdf, token_mode=mode), con, _text_stats_sql(mode), f"text_stats/{mode}")


# ---------------------------------------------------------------------------
# gopher_quality — both modes
# ---------------------------------------------------------------------------
_G = dict(
    min_words=3,
    max_words=100_000,
    min_mean_word_len=1.0,
    max_mean_word_len=12.0,
    max_top_word_ratio=0.5,
    min_distinct_ratio=0.2,
    min_stopwords=0,
)


def _gopher_sql(mode: str) -> str:
    tok = _tok_sql(mode)
    return f"""
        WITH words AS (
            SELECT doc_id, unnest({tok}) AS w FROM udocs
        ),
        per_word AS (
            SELECT doc_id, w, count(*) AS c FROM words GROUP BY doc_id, w
        ),
        agg AS (
            SELECT doc_id,
                   sum(c)::BIGINT AS n_words,
                   sum(c * length(w))::BIGINT AS chars,
                   count(*)::BIGINT AS n_distinct,
                   max(c)::BIGINT AS top,
                   sum(CASE WHEN w IN ('the','a','and','of','to')
                            THEN c ELSE 0 END)::BIGINT AS n_stopwords,
                   sum(c::DOUBLE * ln(c::DOUBLE)) AS clnc
            FROM per_word GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
               CASE WHEN coalesce(a.n_words, 0) > 0
                    THEN round(a.chars::DOUBLE / a.n_words, 6)
                    ELSE 0.0 END AS mean_word_len,
               CASE WHEN coalesce(a.n_words, 0) > 0
                    THEN round(a.n_distinct::DOUBLE / a.n_words, 6)
                    ELSE 0.0 END AS distinct_ratio,
               CASE WHEN coalesce(a.n_words, 0) > 0
                    THEN round(a.top::DOUBLE / a.n_words, 6)
                    ELSE 0.0 END AS top_word_ratio,
               CAST(coalesce(a.n_stopwords, 0) AS BIGINT) AS n_stopwords,
               CASE WHEN coalesce(a.n_words, 0) > 0 THEN
                   round(ln(a.n_words::DOUBLE) - a.clnc / a.n_words::DOUBLE, 6)
               END AS entropy,
               CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_unique_tokens,
               coalesce(a.n_words BETWEEN {_G['min_words']} AND {_G['max_words']}
                AND a.chars::DOUBLE / a.n_words
                    BETWEEN {_G['min_mean_word_len']} AND {_G['max_mean_word_len']}
                AND a.top::DOUBLE / a.n_words <= {_G['max_top_word_ratio']}
                AND a.n_distinct::DOUBLE / a.n_words >= {_G['min_distinct_ratio']}
                AND a.n_stopwords >= {_G['min_stopwords']}, false) AS keep
        FROM udocs d LEFT JOIN agg a USING (doc_id)
    """


@pytest.mark.parametrize("mode", ["ascii", "unicode"])
def test_gopher_quality_parity_both_modes(udocs, mode):
    sdf, con = udocs
    _compare(
        gopher_quality(sdf, token_mode=mode, **_G),
        con,
        _gopher_sql(mode),
        f"gopher/{mode}",
    )


def test_gopher_unicode_mode_rescues_non_latin_docs(udocs):
    """The point of the mode: the Cyrillic docs score on their real words
    in unicode mode and keep=true, while ascii mode rejects them all."""
    sdf, _ = udocs
    uni = {r.doc_id: r for r in gopher_quality(sdf, token_mode="unicode", **_G).collect()}
    asc = {r.doc_id: r for r in gopher_quality(sdf, token_mode="ascii", **_G).collect()}
    assert uni[1].n_words == 10 and uni[1].keep
    assert uni[6].keep
    for did in NON_LATIN_IDS:
        assert asc[did].n_words <= 2 and not asc[did].keep  # doc 8-free set


# ---------------------------------------------------------------------------
# minhash — unicode word shingles (Cyrillic) and codepoint shingles (CJK)
# ---------------------------------------------------------------------------
def test_minhash_parity_unicode_word_shingles(udocs):
    import __spark_entry__ as entry_mod

    sdf, con = udocs
    pairs = minhash_lsh_pairs(sdf, threshold=0.5, token_mode="unicode")
    sql = entry_mod._minhash_lsh_sql(
        _tok_sql("unicode"), threshold=0.5, table="udocs"
    )
    _compare(pairs, con, sql, "minhash/unicode/word")
    # and the pair the mode exists for: the Cyrillic near-dups
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert (1, 2) in got


def test_minhash_parity_unicode_codepoint_shingles(udocs):
    import __spark_entry__ as entry_mod

    sdf, con = udocs
    pairs = minhash_lsh_pairs(
        sdf, threshold=0.4, token_mode="unicode", shingle_unit="codepoint"
    )
    sql = entry_mod._minhash_lsh_sql(
        _tok_sql("unicode"),
        threshold=0.4,
        shingle_unit="codepoint",
        table="udocs",
    )
    _compare(pairs, con, sql, "minhash/unicode/codepoint")
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # CJK near-dups are invisible to word shingles (each doc is ONE giant
    # "word" run — no trigram exists) but found by codepoint shingles
    assert (3, 4) in got


def test_cjk_pair_needs_codepoint_shingles(udocs):
    sdf, _ = udocs
    word_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(sdf, threshold=0.4, token_mode="unicode").collect()
    }
    assert (3, 4) not in word_pairs


# ---------------------------------------------------------------------------
# the degenerate fence: ascii mode treats non-Latin docs as token-free
# ---------------------------------------------------------------------------
def test_ascii_mode_degenerate_fence(udocs):
    sdf, _ = udocs
    stats = {r.doc_id: r for r in text_stats(sdf, token_mode="ascii").collect()}
    for did in NON_LATIN_IDS:
        assert stats[did].n_tokens == 0, did
        assert stats[did].avg_token_len == 0.0 and stats[did].stopword_ratio == 0.0
    # the ASCII control doc still tokenizes normally
    assert stats[101].n_tokens == 12
    # and no MinHash pair forms among the non-Latin docs in ascii mode —
    # including the genuine near-dup pairs (1,2) and (3,4)
    asc_pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(sdf, threshold=0.1, token_mode="ascii").collect()
    }
    assert not {p for p in asc_pairs if p[0] in NON_LATIN_IDS or p[1] in NON_LATIN_IDS}


def test_unknown_token_mode_raises(udocs):
    sdf, _ = udocs
    with pytest.raises(ValueError, match="token_mode"):
        sdf.select(tokens_expr("text", "latin-1"))
    with pytest.raises(ValueError, match="shingle_unit"):
        minhash_lsh_pairs(sdf, shingle_unit="byte").collect()


# ---------------------------------------------------------------------------
# doc_fingerprint / winnowing — the mode matters MOST for fingerprinting:
# in ascii mode every non-Latin doc normalizes to '' and the whole
# non-Latin corpus shares ONE fingerprint (an exact-dedup catastrophe)
# ---------------------------------------------------------------------------
def test_ascii_fingerprint_collapses_non_latin_corpus(udocs):
    from kafka_streams_one_to_many_join_spark.functions.text import doc_fingerprint

    sdf, con = udocs
    non_latin = sdf.filter(F.col("doc_id").isin(*NON_LATIN_IDS))
    asc = doc_fingerprint(non_latin, token_mode="ascii")
    assert asc.select("fingerprint").distinct().count() == 1  # the hazard
    uni = doc_fingerprint(non_latin, token_mode="unicode")
    assert uni.select("fingerprint").distinct().count() == len(NON_LATIN_IDS)
    # oracle parity in unicode mode (md5 of UTF-8 bytes agrees across engines)
    _compare(
        doc_fingerprint(sdf, token_mode="unicode"),
        con,
        r"""
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text),
                   '[^\p{L}\p{M}\p{N} ]', ' ', 'g'), ' +', ' ', 'g'))) AS fingerprint
        FROM udocs
        """,
        "doc_fingerprint/unicode",
    )


def test_winnowing_unicode_mode_fingerprints_cjk(udocs):
    """Unicode-mode winnowing produces fingerprints for CJK docs (ascii
    mode yields none — the normalized text is empty), and the CJK
    near-dup pair shares fingerprints (the local-similarity guarantee
    over codepoint k-grams)."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        winnowing_fingerprints,
    )

    sdf, _ = udocs
    non_latin = sdf.filter(F.col("doc_id").isin(*NON_LATIN_IDS))
    asc = winnowing_fingerprints(non_latin, k=4, window=3, token_mode="ascii")
    assert asc.count() == 0
    uni = winnowing_fingerprints(non_latin, k=4, window=3, token_mode="unicode")
    per_doc = {r.doc_id: r.n for r in uni.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert all(per_doc.get(d, 0) > 0 for d in NON_LATIN_IDS)
    fps = {d: {r.fingerprint for r in uni.filter(F.col("doc_id") == d).collect()} for d in (3, 4, 7)}
    assert fps[3] & fps[4]          # the near-dup pair overlaps
    assert not (fps[3] & fps[7])    # unrelated CJK docs don't


def test_streaming_minhash_unicode_codepoint_matches_batch(spark, tmp_path):
    """The multilingual configuration streams: a 2-batch replay of the
    unicode corpus through the streaming MinHash twin with unicode
    tokens + codepoint shingles emits exactly the batch pair set — with
    the CJK near-dup endpoints split ACROSS the batch boundary, so the
    pair can only come from bucket state."""
    import os
    import time

    from kafka_streams_one_to_many_join_spark.sources.readers import read_stream
    from kafka_streams_one_to_many_join_spark.sources.writers import write_stream
    from kafka_streams_one_to_many_join_spark.streaming.dedup import (
        streaming_minhash_lsh_pairs,
    )

    rows = [(i, t) for i, t, _ in CORPUS]
    schema = "doc_id long, text string"
    docs = spark.createDataFrame(rows, schema)
    expected = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in minhash_lsh_pairs(
            docs, threshold=0.4, token_mode="unicode", shingle_unit="codepoint"
        ).collect()
    }
    assert any(p[:2] == (3, 4) for p in expected)
    # doc 3 in batch 1, doc 4 in batch 2 — the pair must cross state
    batches = [[r for r in rows if r[0] != 4], [r for r in rows if r[0] == 4]]
    os.makedirs(f"{tmp_path}/udocs", exist_ok=True)
    for part in batches:
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(f"{tmp_path}/udocs")
        stamp_batch_mtimes(f"{tmp_path}/udocs")
    stream = read_stream(
        spark, "parquet", f"{tmp_path}/udocs",
        schema=spark.createDataFrame([], schema).schema,
        maxFilesPerTrigger="1",
    )
    pairs = streaming_minhash_lsh_pairs(
        stream, threshold=0.4, token_mode="unicode", shingle_unit="codepoint"
    )
    q = write_stream(
        pairs, "memory", query_name="umhlsh", output_mode="append",
        checkpoint=f"{tmp_path}/cp_umhlsh",
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in spark.sql("select * from umhlsh").collect()
    }
    assert got == expected


def test_ngram_jaccard_unicode_codepoint(udocs):
    """The exact-Jaccard baseline takes the same multilingual
    configuration: codepoint trigram shingles find the CJK near-dup
    pair with jaccard matching a hand-computed set ratio; ascii mode
    sees no pairs among non-Latin docs."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        UNBOUNDED_SHINGLE_FREQ,
        ngram_jaccard_pairs,
    )

    sdf, _ = udocs
    uni = ngram_jaccard_pairs(
        sdf, n=3, threshold=0.4, max_shingle_freq=UNBOUNDED_SHINGLE_FREQ,
        token_mode="unicode", shingle_unit="codepoint",
    )
    got = {(r.doc_a, r.doc_b): r.jaccard for r in uni.collect()}
    assert (3, 4) in got
    # hand-computed: ZH_A/ZH_B are 22 codepoints sharing a 20-cp prefix;
    # trigram sets (20 each, distinct) share 18 → J = 18/22
    assert got[(3, 4)] == round(18 / 22, 6)
    asc = ngram_jaccard_pairs(
        sdf, n=3, threshold=0.1, max_shingle_freq=UNBOUNDED_SHINGLE_FREQ,
    )
    asc_pairs = {(r.doc_a, r.doc_b) for r in asc.collect()}
    assert not {
        p for p in asc_pairs if p[0] in NON_LATIN_IDS or p[1] in NON_LATIN_IDS
    }


def test_simhash_unicode_mode(udocs):
    """SimHash in unicode mode signs non-Latin docs (ascii mode signs
    none of them — the rlike prefilter and tokenizer agree per mode) and
    finds the Cyrillic near-dup pair; the cluster face agrees with the
    pair face on the same corpus."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        near_dup_clusters,
        simhash_near_dup_pairs,
        simhash_near_dup_clusters,
    )

    sdf, spark_df_src = udocs
    non_latin = sdf.filter(F.col("doc_id").isin(*NON_LATIN_IDS))
    asc = simhash_near_dup_pairs(non_latin, max_hamming=6)
    assert asc.count() == 0  # ascii mode signs no non-Latin doc
    # a 30-word pair differing in ONE word: 1/31 tokens flips few vote
    # bits, landing inside the 60-bit scheme's max_hamming range (the
    # 10-word fixture pair measures Hamming 10 — simhash needs longer
    # docs than minhash for the same similarity, which is itself the
    # documented threshold-vs-length tradeoff)
    base = [f"слово{i}" for i in range(30)]
    ru_long_a = " ".join(base)
    ru_long_b = " ".join(base[:-1] + ["иное"])
    spark = sdf.sparkSession
    longs = spark.createDataFrame(
        [(1, ru_long_a), (2, ru_long_b)], "doc_id int, text string"
    )
    both = non_latin.select("doc_id", "text").filter("doc_id > 2").unionByName(longs)
    uni = simhash_near_dup_pairs(both, max_hamming=6, token_mode="unicode")
    pairs = {(r.doc_a, r.doc_b) for r in uni.collect()}
    assert (1, 2) in pairs
    non_latin = both
    via_pairs = {
        (r.doc_id, r.cluster_id) for r in near_dup_clusters(uni).collect()
    }
    via_clusters = {
        (r.doc_id, r.cluster_id)
        for r in simhash_near_dup_clusters(
            non_latin, max_hamming=6, token_mode="unicode"
        ).collect()
    }
    assert via_pairs == via_clusters


def test_packing_and_scoring_unicode_mode(udocs):
    """Token-budget packing, chunking, and the hashed quality scorer all
    see real token counts for non-Latin docs in unicode mode (ascii mode
    routes them into the 0-token branch)."""
    from kafka_streams_one_to_many_join_spark.functions.packing import token_chunks
    from kafka_streams_one_to_many_join_spark.functions.text import (
        hashed_quality_score,
        language_id,
    )

    sdf, _ = udocs
    uni_chunks = token_chunks(sdf, budget=4, stride=2, token_mode="unicode")
    per_doc = {
        r.doc_id: r.n for r in uni_chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc.get(1, 0) > 1  # 10 Russian words, budget 4, stride 2
    # ascii mode: every doc still appears (the empty-chunk policy from
    # the degenerate sweep), but non-Latin docs get ONE zero-token chunk
    asc_chunks = token_chunks(sdf, budget=4, stride=2)
    asc_by_doc = {
        r.doc_id: (r.chunk_no, r.n_chunk_tokens)
        for r in asc_chunks.collect()
        if r.doc_id in NON_LATIN_IDS
    }
    assert asc_by_doc == {d: (0, 0) for d in NON_LATIN_IDS}

    uni_scores = {r.doc_id: r for r in hashed_quality_score(sdf, token_mode="unicode").collect()}
    assert uni_scores[1].n_tokens == 10 and uni_scores[3].n_tokens == 1
    asc_scores = {r.doc_id: r for r in hashed_quality_score(sdf).collect()}
    assert asc_scores[1].n_tokens == 0 and asc_scores[1].score == 0.5

    langs = {r.doc_id: r.lang_pred for r in language_id(sdf, token_mode="unicode").collect()}
    # the capability the mode unlocks: Russian docs are identifiable by
    # Cyrillic stopwords ("и" occurs in docs 1/2); space-free scripts go
    # through the r14 dominant-script fallback (word-list matching is
    # structurally wrong for whole-run "tokens" — han alone → zh);
    # ascii mode sees no Cyrillic tokens at all
    assert langs[101] == "en" and langs[1] == "ru" and langs[3] == "zh"
    asc_langs = {r.doc_id: r.lang_pred for r in language_id(sdf).collect()}
    assert asc_langs[1] == "und"


def test_multilingual_curation_pipeline_composes(udocs):
    """The whole curation chain runs in unicode mode end-to-end on the
    multilingual corpus — quality filter → near-dup dedup (codepoint
    shingles) → canonical selection → sequence packing — with the
    closed-form expectations a 3-stage pipeline admits.  In ascii mode
    the same chain silently drops every non-Latin doc at stage 1; both
    behaviors are pinned."""
    from kafka_streams_one_to_many_join_spark.functions.dedup import (
        minhash_lsh_pairs,
        near_dup_clusters,
    )
    from kafka_streams_one_to_many_join_spark.functions.packing import (
        pack_sequences,
    )

    sdf, _ = udocs
    mode = dict(token_mode="unicode")
    kept = gopher_quality(sdf, min_words=1, max_words=10**5,
                          min_mean_word_len=0.0, max_mean_word_len=50.0,
                          max_top_word_ratio=1.0, min_distinct_ratio=0.0,
                          min_stopwords=0, **mode).filter("keep")
    survivors = sdf.join(kept.select("doc_id"), "doc_id")
    assert {r.doc_id for r in survivors.collect()} == set(range(1, 10)) | {101}

    pairs = minhash_lsh_pairs(
        survivors, threshold=0.4, shingle_unit="codepoint", **mode
    )
    clusters = near_dup_clusters(pairs)
    drop = {r.doc_id for r in clusters.collect() if r.doc_id != r.cluster_id}
    assert drop  # the RU and ZH near-dup pairs each lose one member
    deduped = survivors.filter(~F.col("doc_id").isin(*drop))

    packed = pack_sequences(deduped, budget=16, **mode)
    got = {r.doc_id for r in packed.collect()}
    assert got == {r.doc_id for r in deduped.collect()}
    # ascii-mode stage 1 drops every non-Latin doc
    asc_kept = gopher_quality(sdf, min_words=1, max_words=10**5,
                              min_mean_word_len=0.0, max_mean_word_len=50.0,
                              max_top_word_ratio=1.0, min_distinct_ratio=0.0,
                              min_stopwords=0).filter("keep")
    assert not {r.doc_id for r in asc_kept.collect()} & NON_LATIN_IDS


def test_script_profile_parity_and_routing(udocs):
    """script_profile: per-script char counts oracle-paired (literal
    codepoint ranges are engine-identical pattern bytes, unlike
    \\p{script=...} classes, which Java and RE2 spell differently), and
    the dominant script routes the fixture corpus correctly."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        SCRIPT_RANGES,
        script_profile,
    )

    sdf, con = udocs
    count_cols = ",\n".join(
        f"(length(text) - length(regexp_replace(text, '[{rng}]', '', 'g')))::BIGINT AS n_{name}"
        for name, rng in SCRIPT_RANGES.items()
    )
    names = list(SCRIPT_RANGES)
    greatest = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dominant = "CASE "
    for n in names:
        dominant += f"WHEN n_{n} = {greatest} AND {greatest} > 0 THEN '{n}' "
    dominant += "ELSE 'und' END"
    sql = f"""
        WITH c AS (SELECT doc_id, {count_cols} FROM udocs)
        SELECT doc_id, {', '.join('n_' + n for n in names)},
               {dominant} AS script
        FROM c
    """
    _compare(script_profile(sdf), con, sql, "script_profile")
    got = {r.doc_id: r.script for r in script_profile(sdf).collect()}
    assert got[1] == "cyrillic" and got[6] == "cyrillic"
    assert got[3] == "han" and got[7] == "han"
    assert got[5] == "kana"  # kana outnumbers the kanji in the ja doc
    assert got[9] == "arabic"
    assert got[101] == "latin"
    assert got[102] == "und" and got[103] == "und"


# ---------------------------------------------------------------------------
# r14 (VERDICT r13 item 4): widened script routing — Hangul, Devanagari,
# Thai, supplementary-plane Han — and the language_id script fallback.
# Separate fixture so the closed-form expectations above stay intact.
# ---------------------------------------------------------------------------
EXT_CORPUS = [
    (21, "서울의 겨울은 춥고 눈이 많이 내립니다 사람들은 따뜻한 옷을 입습니다", "ko"),
    (22, "दिल्ली में गर्मी बहुत तेज होती है लोग ठंडी जगह जाते हैं", "hi"),
    (23, "อากาศในกรุงเทพร้อนมากในฤดูร้อนผู้คนชอบกินอาหารเผ็ด", "th"),
    # CJK Extension B — every char above U+20000 (astral plane)
    (24, "𠜎𠜱𠝹𠱓𠱸𠲖𠳏𠳕𠴕𠵼𠵿𠸎𠸏𠹷𠺝𠺢𠻗", "zh-ext"),
    (25, "日本語のテキストです。形態素解析はしません。", "ja"),
    (26, ZH_A, "zh"),
    (27, "the quick brown fox jumps over the lazy dog", "en"),
    (28, RU_A, "ru"),
    # mixed, Cyrillic-dominant, NO ru stopwords, a few hanzi — must NOT
    # enter the han fallback (dominant-script gate)
    (29, "Смешанный документ про лето 和中文", "mixed"),
]


@pytest.fixture(scope="module")
def xdocs(spark, tmp_path_factory):
    pdf = pd.DataFrame(EXT_CORPUS, columns=["doc_id", "text", "source"])
    path = str(tmp_path_factory.mktemp("ext_scripts") / "xdocs.parquet")
    pdf.to_parquet(path, index=False)
    sdf = spark.read.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW xdocs AS SELECT * FROM '{path}'")
    return sdf, con


def test_extended_script_profile_parity_and_routing(xdocs):
    """The widened SCRIPT_RANGES: per-script counts oracle-paired on the
    extended fixture (supplementary-plane Han literals included — Java
    regex and RE2 both treat class literals as code points, and both
    engines' length() counts code points), dominant-script routing
    correct, and shingle_unit_for_script maps each routed script to its
    dedup shingle unit."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        SCRIPT_RANGES,
        script_profile,
        shingle_unit_for_script,
    )

    sdf, con = xdocs
    count_cols = ",\n".join(
        f"(length(text) - length(regexp_replace(text, '[{rng}]', '', 'g')))::BIGINT AS n_{name}"
        for name, rng in SCRIPT_RANGES.items()
    )
    names = list(SCRIPT_RANGES)
    greatest = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dominant = "CASE "
    for n in names:
        dominant += f"WHEN n_{n} = {greatest} AND {greatest} > 0 THEN '{n}' "
    dominant += "ELSE 'und' END"
    sql = f"""
        WITH c AS (SELECT doc_id, {count_cols} FROM xdocs)
        SELECT doc_id, {', '.join('n_' + n for n in names)},
               {dominant} AS script
        FROM c
    """
    _compare(script_profile(sdf), con, sql, "ext_script_profile")
    prof = {r.doc_id: r for r in script_profile(sdf).collect()}
    expected = {
        21: "hangul", 22: "devanagari", 23: "thai", 24: "han",
        25: "kana", 26: "han", 27: "latin", 28: "cyrillic", 29: "cyrillic",
    }
    assert {d: r.script for d, r in prof.items()} == expected
    # the astral-plane chars are COUNTED (17 Ext-B chars, one each)
    assert prof[24].n_han == 17
    # routing: spaced scripts shingle by word, space-free Han by codepoint
    assert shingle_unit_for_script("hangul") == "word"
    assert shingle_unit_for_script("devanagari") == "word"
    assert shingle_unit_for_script("thai") == "word"
    assert shingle_unit_for_script("han") == "codepoint"
    assert shingle_unit_for_script("kana") == "codepoint"
    assert shingle_unit_for_script("und") == "word"


def _language_id_sql(mode: str) -> str:
    """DuckDB mirror of language_id: stopword argmax (first-max-wins in
    STOPWORDS order) with the dominant-script fallback — built from the
    SAME definition sites (STOPWORDS, SCRIPT_RANGES) as the engine."""
    from kafka_streams_one_to_many_join_spark.functions.text import (
        SCRIPT_RANGES,
        STOPWORDS,
    )

    tok = _tok_sql(mode)
    langs = list(STOPWORDS)
    score_cols = ",\n".join(
        "len(list_filter({tok}, t -> list_contains([{ws}], t)))::BIGINT AS score_{lang}".format(
            tok=tok,
            ws=", ".join(f"'{w}'" for w in STOPWORDS[lang]),
            lang=lang,
        )
        for lang in langs
    )
    count_cols = ",\n".join(
        f"(length(text) - length(regexp_replace(text, '[{rng}]', '', 'g')))::BIGINT AS n_{name}"
        for name, rng in SCRIPT_RANGES.items()
    )
    names = list(SCRIPT_RANGES)
    max_s = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    max_n = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    dominant = "CASE "
    for n in names:
        dominant += f"WHEN n_{n} = {max_n} AND {max_n} > 0 THEN '{n}' "
    dominant += "ELSE 'und' END"
    stopword_pick = "CASE "
    for lang in langs:
        stopword_pick += f"WHEN score_{lang} = {max_s} THEN '{lang}' "
    stopword_pick += "END"
    return f"""
        WITH s AS (SELECT doc_id, {score_cols}, {count_cols} FROM xdocs),
        d AS (SELECT *, {dominant} AS dom FROM s)
        SELECT doc_id,
               CASE WHEN {max_s} > 0 THEN {stopword_pick}
                    WHEN dom = 'hangul' THEN 'ko'
                    WHEN dom IN ('han', 'kana') THEN
                         CASE WHEN n_kana > 0 THEN 'ja' ELSE 'zh' END
                    ELSE 'und' END AS lang_pred
        FROM d
    """


@pytest.mark.parametrize("mode", ["ascii", "unicode"])
def test_language_id_script_fallback_parity(xdocs, mode):
    """language_id's script fallback, oracle-paired in BOTH token modes:
    hangul → ko, kana-bearing → ja, han alone → zh (including
    supplementary-plane Han), dominant-gated so a Cyrillic doc quoting
    hanzi stays out of the fallback.  The script counts are
    token-mode-independent, so ko/ja/zh are now identified even in
    ascii mode (where stopword scores are structurally zero)."""
    from kafka_streams_one_to_many_join_spark.functions.text import language_id

    sdf, con = xdocs
    got = {
        r.doc_id: r.lang_pred
        for r in language_id(sdf, token_mode=mode).collect()
    }
    oracle = dict(con.execute(_language_id_sql(mode)).fetchall())
    assert got == oracle, mode
    assert got[21] == "ko" and got[25] == "ja"
    assert got[26] == "zh" and got[24] == "zh"  # incl. astral-plane Han
    # Devanagari goes through the STOPWORD path (spaced script - the hi
    # list is reachable in unicode mode only); Thai honestly stays 'und'
    # (no stopword list, and script->language there would be a guess)
    assert got[22] == ("hi" if mode == "unicode" else "und")
    assert got[23] == "und"
    # dominant-script gate: Cyrillic doc quoting hanzi is NOT 'zh'
    assert got[29] == "und"
    # stopword path unaffected: en always; ru only where Cyrillic tokenizes
    assert got[27] == "en"
    assert got[28] == ("ru" if mode == "unicode" else "und")
