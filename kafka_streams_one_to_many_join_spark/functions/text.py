"""Text analysis over document tables — tokenize, quality stats, language
ID, fingerprinting.

Everything here is a pure Catalyst expression (regexp/higher-order/hash
built-ins): per-row, embarrassingly parallel, whole-stage-codegen'd, no
shuffle, no Python.  The exact token definition is pinned (and mirrored in
the DuckDB oracle SQL) so results are bit-reproducible across engines:
by default a token is a maximal run of ``[a-z0-9]`` in the lower-cased
text.

Token modes (r13, VERDICT r12 item 1).  The ASCII contract silently
tokenizes every non-Latin document to the empty array — a real
multilingual pre-training corpus (the 100 TB use case) would route all
CJK/Cyrillic/Arabic text into the degenerate "token-free doc" branch of
every quality filter and dedup operator.  ``token_mode="unicode"``
switches the token class to Unicode letters+marks+digits (``[\\p{L}\\p{M}\\p{N}]+``
— supported identically by Spark's Java regex engine and DuckDB's RE2,
so oracle parity holds in both modes).  ASCII stays the default
everywhere: the driver fixtures are Latin-only and the pinned roster
hashes must not move.  For space-free scripts (CJK), word shingles are
degenerate even in unicode mode (a whole sentence-run is one "word") —
the shingle layer in ``dedup.py`` additionally takes
``shingle_unit="codepoint"`` for those corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# Raw regex per mode, exactly as the regex engine must see it.  DuckDB SQL
# string literals do not process backslashes, so oracle SQL embeds these
# verbatim; Spark SQL string literals DO, so expression strings go through
# token_re_sql() below.
TOKEN_MODES = {
    "ascii": TOKEN_RE,
    # \p{M} keeps combining marks inside the word (r14): Devanagari
    # matras, Thai vowel signs, and Arabic diacritics are category M,
    # not L — without it every Indic word fragments at its first vowel
    # sign ("में" → "म"), silently breaking stopword matching and word
    # shingles for those scripts.  Java regex and RE2 both implement
    # the one-letter general categories, verified identical on a
    # Devanagari+Thai fixture (tests/test_unicode_tokens.py).
    "unicode": r"[\p{L}\p{M}\p{N}]+",
}

# Inner character-set string per mode; the complement classes below are
# RENDERED from these so variants (keep-space normalization) compose from
# the set itself rather than by slicing a finished pattern — string
# surgery on the rendered class silently corrupts any future mode whose
# pattern doesn't end in ']' (ADVICE r13 low).
TOKEN_CLASS_INNER = {
    "ascii": "a-z0-9",
    "unicode": r"\p{L}\p{M}\p{N}",
}

# Complement class per mode (normalization / punctuation stripping).
NONTOKEN_MODES = {m: f"[^{inner}]" for m, inner in TOKEN_CLASS_INNER.items()}


def token_re(mode: str = "ascii") -> str:
    """The token regex for ``mode``, raw form (what the regex engine and
    DuckDB SQL literals see)."""
    try:
        return TOKEN_MODES[mode]
    except KeyError:
        raise ValueError(
            f"unknown token_mode {mode!r}; expected one of {sorted(TOKEN_MODES)}"
        ) from None


def nontoken_re(mode: str = "ascii", keep_space: bool = False) -> str:
    """The complement class for ``mode`` (normalization / punctuation
    stripping), validated like ``token_re``.  ``keep_space=True`` adds
    the space character to the kept set (fingerprint normalization:
    strip punctuation but preserve word boundaries) — built from the
    mode's inner character-set string, never by slicing the rendered
    pattern (ADVICE r13 low)."""
    token_re(mode)  # uniform ValueError on unknown modes
    if keep_space:
        return f"[^{TOKEN_CLASS_INNER[mode]} ]"
    return NONTOKEN_MODES[mode]


def token_re_sql(mode: str = "ascii") -> str:
    """The token regex escaped for embedding in a Spark SQL string
    literal (Spark's parser consumes one level of backslash escaping;
    the ASCII pattern has no backslashes, so ascii-mode expression
    strings are byte-identical to the pre-r13 ones)."""
    return token_re(mode).replace("\\", "\\\\")

# Tiny per-language stopword lists for the n-gram/stopword language
# heuristic.  Deterministic and mirrored in oracle SQL; not a real langid
# model — the point is the Spark plumbing (array ops, no UDF).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "fr": ["le", "la", "et", "de", "un"],
    "es": ["el", "la", "y", "de", "un"],
    "de": ["der", "die", "und", "von", "ein"],
    # reachable only in unicode token mode (ascii tokenization maps
    # Cyrillic text to the empty array, so these score 0 there — adding
    # the list is output-neutral for every ascii-mode caller)
    "ru": ["и", "в", "не", "на", "что"],
    # Devanagari writes with spaces, so the stopword heuristic applies
    # (unlike the space-free scripts routed through the r14 dominant-
    # script fallback); like ru, unicode-mode-only by construction
    "hi": ["है", "में", "की", "से", "और"],
}


def tokens_expr(text_col: str, token_mode: str = "ascii") -> Column:
    """text column (by name) → array of lower-case tokens in ``token_mode``
    (maximal runs of the mode's token class in the lower-cased text)."""
    return F.expr(
        f"regexp_extract_all(lower({text_col}), '{token_re_sql(token_mode)}', 0)"
    )


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ascii",
) -> DataFrame:
    """Per-document quality stats: token count, char count, average token
    length, punctuation ratio, stopword ratio, all-caps-ness.

    These are the standard pre-training quality filters (length bounds,
    symbol ratios, stopword presence) expressed as one projection.
    ``token_mode="unicode"`` makes the token and token-char classes
    Unicode-aware; the stopword list stays English (a non-English doc
    legitimately scores stopword_ratio 0).
    """
    toks = tokens_expr(text_col, token_mode)
    n_tok = F.size(toks).cast("bigint")
    n_char = F.length(F.col(text_col)).cast("bigint")
    alpha_chars = F.length(
        F.regexp_replace(F.lower(F.col(text_col)), nontoken_re(token_mode), "")
    ).cast("bigint")
    n_stop = F.size(F.expr(
        f"filter(regexp_extract_all(lower({text_col}), '{token_re_sql(token_mode)}', 0), "
        "t -> array_contains(array('the','a','and','of','to'), t))"
    )).cast("bigint")
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars_total"),
        F.round(
            F.when(n_tok > 0, alpha_chars.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("avg_token_len"),
        F.round(
            F.when(n_char > 0, (n_char - alpha_chars).cast("double") / n_char.cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n_tok > 0, n_stop.cast("double") / n_tok.cast("double")).otherwise(F.lit(0.0)), 6
        ).alias("stopword_ratio"),
    )


def language_id(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ascii",
) -> DataFrame:
    """Heuristic language ID: argmax over per-language stopword hit counts
    with a SCRIPT fallback for the space-free scripts (r14, VERDICT r13
    item 4).  Deterministic stopword tiebreak: STOPWORDS declaration
    order (first max wins) — en, fr, es, de, ru.  The ru list is only
    reachable in unicode token mode (r13): ascii tokenization maps
    Cyrillic text to the empty array, which is exactly why language ID
    for non-Latin corpora needed the unicode contract.

    Space-free scripts (zh/ja/ko) cannot go through the stopword
    heuristic — their unicode-mode "tokens" are whole sentence runs, so
    word-list matching is structurally wrong there.  When NO stopword
    list scores, the dominant script (the same first-max-wins routing
    ``script_profile`` computes, token-mode-independent by construction)
    decides: hangul → ko, kana-bearing han/kana → ja, han alone → zh.
    Other dominant scripts stay 'und' — honestly: Devanagari spans
    hi/mr/ne/sa and a dominant-script guess would be a coin flip, and
    Latin/Cyrillic text without stopword hits is genuinely ambiguous.
    Mixed documents whose dominant script is NOT han/kana/hangul never
    enter the fallback (a Cyrillic document quoting three hanzi must not
    come back 'zh').
    """
    toks = tokens_expr(text_col, token_mode)
    langs = list(STOPWORDS)
    scores = []
    for lang in langs:
        words = ",".join(f"'{w}'" for w in STOPWORDS[lang])
        scores.append(
            F.size(F.expr(
                f"filter(regexp_extract_all(lower({text_col}), '{token_re_sql(token_mode)}', 0), "
                f"t -> array_contains(array({words}), t))"
            )).alias(f"score_{lang}")
        )
    script_names = list(SCRIPT_RANGES)
    script_counts = [
        (
            F.length(F.col(text_col))
            - F.length(F.regexp_replace(F.col(text_col), f"[{rng}]", ""))
        ).cast("bigint").alias(f"n_{name}")
        for name, rng in SCRIPT_RANGES.items()
    ]
    scored = docs.select(F.col(id_col), toks.alias("_toks"), *scores, *script_counts)
    # script fallback: dominant script via the same first-max-wins chain
    # as script_profile, mapped to a language only where script ≈ language
    max_n = F.greatest(*[F.col(f"n_{n}") for n in script_names])
    dominant = F.lit("und")
    for name in reversed(script_names):
        dominant = F.when(
            (F.col(f"n_{name}") == max_n) & (max_n > 0), F.lit(name)
        ).otherwise(dominant)
    fallback = (
        F.when(dominant == "hangul", F.lit("ko"))
        .when(
            dominant.isin("han", "kana"),
            F.when(F.col("n_kana") > 0, F.lit("ja")).otherwise(F.lit("zh")),
        )
        .otherwise(F.lit("und"))
    )
    # first-max-wins in declaration order: build the when-chain from the
    # LAST language backward so earlier languages override ties —
    # equivalent to the former hand-written 4-way chain on its domain
    max_s = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    best = fallback
    for lang in reversed(langs):
        best = F.when(
            (F.col(f"score_{lang}") == max_s) & (max_s > 0), F.lit(lang)
        ).otherwise(best)
    return scored.select(F.col(id_col), best.alias("lang_pred"))


# Literal BMP codepoint ranges, NOT \\p{script=...} classes: Java spells
# scripts \\p{IsHan} while RE2 spells them \\p{Han}, so script classes
# cannot be shared verbatim across engines — literal ranges can (the
# pattern bytes are identical UTF-8 in both).  Good enough for routing;
# a real script classifier would use full Unicode script data.
SCRIPT_RANGES = {
    "latin": "A-Za-z",
    "cyrillic": "Ѐ-ӿ",
    # han spans four literal ranges (r14, VERDICT r13 item 4): the BMP
    # URO, Extension A, and the supplementary-plane extensions (B..I,
    # then G..H) — supplementary literals work identically in Java
    # regex and RE2 (both treat class literals as code points; Spark's
    # length() and DuckDB's length() both count code points, so the
    # count-by-removal arithmetic stays engine-identical)
    "han": "一-鿿㐀-䶿\U00020000-\U0002ee5d\U00030000-\U000323af",
    "kana": "぀-ヿ",
    "arabic": "؀-ۿ",
    "hangul": "가-힣",
    "devanagari": "ऀ-ॿ",
    "thai": "฀-๿",
}

# Shingle-unit routing per dominant script (the stage a multilingual
# dedup pipeline runs after script_profile): space-separated scripts
# shingle by word; space-free Han/Kana text has no word boundaries for
# the tokenizer to find, so it shingles by codepoint (the r13 token
# contract).  Hangul and Devanagari write with spaces → word; Thai is
# routed per VERDICT r13 item 4's prescription (note: Thai orthography
# omits inter-word spaces, so a caller optimizing Thai recall may
# prefer overriding to codepoint — the dict is the override point).
SCRIPT_SHINGLE_UNIT = {
    "latin": "word",
    "cyrillic": "word",
    "arabic": "word",
    "hangul": "word",
    "devanagari": "word",
    "thai": "word",
    "han": "codepoint",
    "kana": "codepoint",
}


def shingle_unit_for_script(script: str) -> str:
    """Dominant script (a ``script_profile`` ``script`` value) → the
    shingle unit its near-dup dedup should use; unknown/'und' → word."""
    return SCRIPT_SHINGLE_UNIT.get(script, "word")


def script_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Unicode-script character counts plus a dominant
    script — the routing stage a multilingual curation pipeline runs
    BEFORE language ID and shingle-unit selection (space-free scripts →
    codepoint shingles; Cyrillic/Latin → word shingles; see the r13
    token contract).

    Output: (doc_id, n_latin, n_cyrillic, n_han, n_kana, n_arabic,
    script) with ``script`` the first-max-wins dominant ('und' when no
    script characters at all).  Pure projections — one
    count-by-removal regexp per script, no shuffle, engine-identical
    literal codepoint ranges mirrored by the DuckDB oracle in
    tests/test_unicode_tokens.py.
    """
    cols = []
    for name, rng in SCRIPT_RANGES.items():
        cols.append(
            (
                F.length(F.col(text_col))
                - F.length(F.regexp_replace(F.col(text_col), f"[{rng}]", ""))
            ).cast("bigint").alias(f"n_{name}")
        )
    scored = docs.select(F.col(id_col), *cols)
    names = list(SCRIPT_RANGES)
    max_s = F.greatest(*[F.col(f"n_{n}") for n in names])
    dominant = F.lit("und")
    for name in reversed(names):
        dominant = F.when(
            (F.col(f"n_{name}") == max_s) & (max_s > 0), F.lit(name)
        ).otherwise(dominant)
    return scored.select(id_col, *[f"n_{n}" for n in names], dominant.alias("script"))


def winnowing_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    window: int = 4,
    token_mode: str = "ascii",
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS scheme): position-sliding
    character k-gram hashes, min per window of ``window`` consecutive
    hashes, deduplicated.  Two documents sharing any substring of length
    ≥ window+k-1 (after normalization) share at least one fingerprint —
    the local similarity guarantee exact/minhash dedup lacks.

    Output: (doc_id, fingerprint BIGINT), several rows per document.
    Hashes are md5-prefix based (portable; an incremental Rabin-Karp
    rolling hash is an engine optimization with the same output — the
    expression engine recomputes per position, still one projection,
    no shuffle except the final distinct).
    """
    nontok = nontoken_re(token_mode, keep_space=True)
    nontok_sql = nontok.replace("\\", "\\\\")
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}), "
        f"'{nontok_sql}', ' '), ' +', ' '))"
    )
    gram_h = (
        f"cast(conv(substring(md5(substring(_n, i, {k})), 1, 8), 16, 10) as bigint)"
    )
    hashes = (
        f"case when length(_n) < {k} then array() "
        f"else transform(sequence(1, length(_n) - {k} + 1), i -> {gram_h}) end"
    )
    mins = (
        f"case when size(_h) = 0 then array() "
        f"when size(_h) < {window} then array(array_min(_h)) "
        f"else array_distinct(transform(sequence(1, size(_h) - {window} + 1), "
        f"j -> array_min(slice(_h, j, {window})))) end"
    )
    from kafka_streams_one_to_many_join_spark.model import ensure_parallelism

    return (
        ensure_parallelism(docs)
        .select(F.col(id_col), F.expr(norm).alias("_n"))
        .select(id_col, F.expr(hashes).alias("_h"))
        .select(id_col, F.explode(F.expr(mins)).alias("fingerprint"))
        .distinct()
    )


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ascii",
) -> DataFrame:
    """Normalization fingerprint: md5 of the whitespace-collapsed,
    lower-cased, punctuation-stripped text.  Two documents with the same
    fingerprint are content-equal modulo formatting — the exact-dedup key
    used by every large-scale corpus pipeline.

    The token mode matters MORE here than anywhere else: in ascii mode
    every non-Latin document normalizes to the EMPTY string, so the
    whole non-Latin corpus shares one fingerprint and a fingerprint
    dedup would collapse it to a single document (fenced in
    tests/test_unicode_tokens.py).  Multilingual corpora must pass
    ``token_mode="unicode"``.
    """
    normalized = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.col(text_col)),
            nontoken_re(token_mode, keep_space=True),
            " ",
        ),
        " +",
        " ",
    )
    return docs.select(
        F.col(id_col),
        F.md5(F.trim(normalized)).alias("fingerprint"),
    )


def bpe_pair_counts(
    docs: DataFrame, text_col: str = "text", token_mode: str = "ascii"
) -> DataFrame:
    """One BPE merge iteration over a corpus — the inner loop of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016),
    structured the only way it survives 100 TB: the corpus collapses to a
    word-frequency table FIRST, and all symbol-pair work happens on the
    vocabulary, never the corpus.

    Stages (scale posture per stage):
      1. tokenize + count words — the single corpus-sized pass; the
         groupBy is map-side-combined down to |vocab| rows before its
         one shuffle (vocabulary-bounded, like ``vocab_growth``).
      2. explode adjacent character pairs of each DISTINCT word,
         weighted by the word's corpus frequency — |vocab|·avg_len rows,
         corpus-size-independent.
      3. aggregate per (left_sym, right_sym) — alphabet²-bounded
         (≤ ~1.3k rows for [a-z0-9]).
      4. rank merges (row_number over the tiny pair table — the single-
         partition window is over alphabet²-bounded input by
         construction, not an at-scale trap).

    Iterating BPE re-runs stages 2-4 against the persisted vocabulary
    with the chosen merge applied; the corpus is scanned exactly once
    across ALL iterations.  Counting is standard BPE: overlapping pairs
    each count ("aaa" contributes (a,a) twice per occurrence);
    ``n_words`` is the number of distinct vocabulary words containing
    the pair at least once.
    """
    toks = tokens_expr(text_col, token_mode)
    vocab = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            "w",
            "c",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(
            F.expr("substr(w, i, 1)").alias("left_sym"),
            F.expr("substr(w, i + 1, 1)").alias("right_sym"),
            "w",
            "c",
        )
    )
    agg = pairs.groupBy("left_sym", "right_sym").agg(
        F.sum("c").alias("pair_count"),
        F.countDistinct("w").alias("n_words"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("pair_count").desc(), "left_sym", "right_sym")
    return agg.withColumn(
        "merge_rank", F.row_number().over(w).cast("bigint")
    )


def _bpe_contains_sql(ql: str, qr: str, s: str) -> str:
    """SQL: does symbol array ``s`` contain the (ql, qr) pair ADJACENTLY
    (already-quoted symbols).  Shared by the driver-state and
    spark-state training loops so the two paths cannot drift."""
    return (
        f"case when size({s}) < 2 then false else "
        f"exists(sequence(1, size({s}) - 1), i -> "
        f"element_at({s}, i) = '{ql}' and element_at({s}, i + 1) = '{qr}') "
        "end"
    )


def _bpe_fold_sql(ql: str, qr: str, s: str) -> str:
    """SQL: greedy left-to-right merge fold of (ql, qr) over ``s``."""
    return (
        f"aggregate({s}, cast(array() as array<string>), (acc, x) -> "
        f"case when size(acc) > 0 and element_at(acc, -1) = '{ql}' "
        f"and x = '{qr}' "
        f"then concat(slice(acc, 1, size(acc) - 1), array('{ql}{qr}')) "
        "else concat(acc, array(x)) end)"
    )


_BPE_MERGES_SCHEMA = (
    "merge_rank bigint, left_sym string, right_sym string, pair_count bigint"
)
_BPE_PAIRS_SCHEMA = "left_sym string, right_sym string, pair_count bigint"


def _bpe_ckpt_save(
    spark,
    path: str,
    rank: int,
    merges: list,
    pair_state,
    vocab: DataFrame,
    token_mode: str,
) -> None:
    """Persist one training checkpoint under ``path/ckpt_<rank>``:
    the merge table so far, the maintained pair-count state (driver
    dict or spark-state DataFrame — the manifest records which), and
    the folded vocabulary.  The manifest is written LAST via an atomic
    rename, so a train killed mid-checkpoint leaves an invalid
    directory that resume skips in favor of the previous one.
    Checkpoint cost is O(pair state + vocab) — amortized by
    ``checkpoint_every``."""
    import json
    import os

    d = os.path.join(path, f"ckpt_{rank:08d}")
    vocab.write.mode("overwrite").parquet(os.path.join(d, "vocab"))
    spark.createDataFrame(
        [(r, l, rt, c) for r, l, rt, c in merges], _BPE_MERGES_SCHEMA
    ).write.mode("overwrite").parquet(os.path.join(d, "merges"))
    if isinstance(pair_state, dict):
        kind = "driver"
        spark.createDataFrame(
            [(l, r, int(c)) for (l, r), c in pair_state.items()],
            _BPE_PAIRS_SCHEMA,
        ).write.mode("overwrite").parquet(os.path.join(d, "pairs"))
    else:
        kind = "spark"
        pair_state.write.mode("overwrite").parquet(os.path.join(d, "pairs"))
    tmp = os.path.join(d, "_manifest.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"rank": rank, "token_mode": token_mode, "state_kind": kind}, f
        )
    os.replace(tmp, os.path.join(d, "_manifest.json"))


def _bpe_ckpt_latest(path: str) -> tuple[int, str, dict] | None:
    """Newest VALID checkpoint under ``path`` (manifest present and
    parsable), or None.  Invalid directories — killed mid-write before
    their atomic manifest rename — are skipped, falling back to the
    previous cadence point."""
    import json
    import os

    if not os.path.isdir(path):
        return None
    best = None
    for name in os.listdir(path):
        if not name.startswith("ckpt_"):
            continue
        man = os.path.join(path, name, "_manifest.json")
        try:
            with open(man) as f:
                m = json.load(f)
            rank = int(m["rank"])
        except (OSError, ValueError, KeyError):
            continue
        if best is None or rank > best[0]:
            best = (rank, os.path.join(path, name), m)
    return best


def _bpe_train_spark_state(
    spark,
    vocab: DataFrame,
    merges: list,
    pairs_df: DataFrame,
    start_rank: int,
    num_merges: int,
    materialize_every: int,
    stats: list | None = None,
    ckpt=None,
    checkpoint_every: int = 50,
):
    """SPARK-STATE continuation of a BPE train (r16, VERDICT r15 item 7
    — the ``on_state_overflow='spill'`` path): the pair-count state
    lives in a maintained DataFrame instead of the driver dict, so a
    web-scale vocabulary whose distinct pair set outgrows
    ``max_pair_state`` COMPLETES instead of erroring.  Cost: the
    argmax is a per-merge orderBy-limit-1 job (Spark's UTF-8 binary
    string order equals the driver dict's code-point tiebreak, so the
    merge table is hash-identical — test-pinned across the spill
    boundary) and the delta folds into the state via a
    vocabulary-bounded aggregate, re-materialized per merge — slower
    than the driver dict, but unbounded.  ``ckpt`` (optional) is the
    resume hook: called every ``checkpoint_every`` merges with
    (rank, merges, pairs_df, vocab)."""
    import time as _time

    from kafka_streams_one_to_many_join_spark.model import materialize

    rank = start_rank - 1
    for rank in range(start_rank, num_merges + 1):
        _t0 = _time.perf_counter()
        best = (
            pairs_df.orderBy(
                F.col("pair_count").desc(), "left_sym", "right_sym"
            )
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = (
            best[0].left_sym,
            best[0].right_sym,
            int(best[0].pair_count),
        )
        merges.append((rank, left, right, cnt))
        ql, qr = left.replace("'", "''"), right.replace("'", "''")
        contains_syms = _bpe_contains_sql(ql, qr, "syms")
        pair_structs = (
            "transform(sequence(1, size({s}) - 1), i -> named_struct("
            "'left_sym', element_at({s}, i), "
            "'right_sym', element_at({s}, i + 1), 'w', {sign}c))"
        )
        old_arr = pair_structs.format(s="syms", sign="-")
        new_arr = (
            "case when size(_new_syms) < 2 then "
            "cast(array() as array<struct<left_sym:string,right_sym:string,w:bigint>>) "
            f"else {pair_structs.format(s='_new_syms', sign='')} end"
        )
        delta = (
            vocab.filter(F.expr(contains_syms))
            .select(
                "c",
                F.expr(_bpe_fold_sql(ql, qr, "syms")).alias("_new_syms"),
                "syms",
            )
            .select(F.explode(F.expr(f"concat({old_arr}, {new_arr})")).alias("p"))
            .groupBy(
                F.col("p.left_sym").alias("left_sym"),
                F.col("p.right_sym").alias("right_sym"),
            )
            .agg(F.sum("p.w").alias("pair_count"))
        )
        pairs_df = materialize(
            pairs_df.unionByName(delta)
            .groupBy("left_sym", "right_sym")
            .agg(F.sum("pair_count").alias("pair_count"))
            .filter(F.col("pair_count") > 0)
        )
        if stats is not None:
            touched = vocab.filter(F.expr(contains_syms)).count()
        vocab = vocab.select(
            "c",
            F.expr(
                "element_at(transform(array(syms), s -> "
                f"case when {_bpe_contains_sql(ql, qr, 's')} "
                f"then {_bpe_fold_sql(ql, qr, 's')} else s end), 1)"
            ).alias("syms"),
        )
        if rank % materialize_every == 0:
            vocab = materialize(vocab)
        if ckpt is not None and rank % checkpoint_every == 0:
            ckpt(rank, merges, pairs_df, vocab)
        if stats is not None:
            stats.append(
                (
                    rank,
                    round(_time.perf_counter() - _t0, 4),
                    touched,
                    pairs_df.count(),
                )
            )
    return spark.createDataFrame(merges, _BPE_MERGES_SCHEMA)


def _aimd_next_k(cur_k: int, rounds_at_floor: int, speculate: int) -> tuple[int, int]:
    """Top-of-round AIMD chain size: from the k=1 floor, probe k=2 only
    after 8 consecutive floor rounds (the upward probe the docstring
    promises).  Pure so the floor-holding behavior is unit-testable
    without a Spark train (tests/test_bpe_train.py)."""
    if cur_k == 1 and rounds_at_floor >= 8:
        return min(2, speculate), 0
    return cur_k, rounds_at_floor


def _aimd_update(
    cur_k: int, rounds_at_floor: int, accepted: int, k_round: int, speculate: int
) -> tuple[int, int]:
    """Post-round AIMD update (ADVICE r15 low): full acceptance DOUBLES
    the chain only when the round actually speculated (``k_round > 1``).
    A k=1 round always "fully accepts" — its only candidate is the
    exact argmax by construction — so counting it as a speculation hit
    would bounce the chain 1→2→1→2 under sustained misses instead of
    holding the documented lean floor, and ``rounds_at_floor`` would
    never reach the 8-round upward-probe gate.  Truncation drops the
    chain to the accepted prefix; consecutive floor rounds are counted
    for ``_aimd_next_k``'s probe."""
    if accepted == k_round and k_round > 1:
        return min(speculate, max(2, k_round * 2)), 0
    cur_k = max(1, accepted)
    return cur_k, (rounds_at_floor + 1 if cur_k == 1 else 0)


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    token_mode: str = "ascii",
    materialize_every: int = 4,
    stats: list | None = None,
    max_pair_state: int = 50_000_000,
    speculate: int = 1,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 50,
    resume: bool = True,
    on_state_overflow: str = "raise",
):
    """Full BPE tokenizer training (Sennrich et al. 2016) on top of the
    ``bpe_pair_counts`` design: learn ``num_merges`` merges and return the
    merge table as a DataFrame ``(merge_rank BIGINT, left_sym STRING,
    right_sym STRING, pair_count BIGINT)``.  Final vocabulary size is
    |initial alphabet| + number of merges learned (the loop stops early
    when no adjacent pair remains).

    Scale posture — the corpus is scanned EXACTLY ONCE across ALL
    iterations (the ``bpe_pair_counts`` claim, now load-bearing), and
    the pair-count table is MAINTAINED INCREMENTALLY (r14, VERDICT r13
    item 2 — Sennrich's fast-BPE observation: applying merge (l, r)
    only changes the pair multiset of words whose symbol array
    contained the pair):

      1. one corpus pass collapses the input to the word-frequency table
         ``(w, c, syms)`` with ``syms`` the character split; the table is
         ``materialize``d, so every later stage reads the checkpointed
         |vocab|-sized frame, never the corpus (asserted by
         ``test_bpe_train_corpus_scanned_once`` via the plan-audit hook);
      2. the FULL pair aggregate runs ONCE to seed the maintained
         pair-count state — which then lives ON THE DRIVER as a dict
         (the pair table is vocabulary-bounded: ≤ Σ|word|-1 over the
         distinct vocabulary, the same bound that already justified the
         per-merge argmax collect; a driver dict makes the argmax a
         FREE in-memory max instead of a per-merge Spark job, and
         Python's code-point string comparison equals Spark's UTF-8
         binary ordering — UTF-8 is order-preserving — so the
         (count desc, lexicographic) tiebreak is bit-identical);
      3. per iteration: argmax in memory, then collect the DELTA from
         ONLY the touched words — each contributes its old adjacent
         pairs negatively and its re-folded pairs positively; untouched
         words (the growing majority as merges specialize) are never
         re-exploded or re-folded, so the per-iteration data cost is
         O(|touched| · avg_word_len), not O(|vocab| · avg_word_len),
         and drops as the touched-word fraction shrinks (measured
         ladder: SCALE.md r14);
      4. the vocabulary re-``materialize``s every ``materialize_every``
         iterations so the conditional-fold lineage the delta job
         re-executes stays bounded.

    Remaining cost floor (documented per ADVICE r13): one delta
    ``collect`` round-trip per merge (down from r13's argmax over a
    full re-aggregate) — per-iteration job scheduling (~0.05-0.15 s on
    local[32]) dominates once the touched fraction is small, so a
    32k-merge production train is bounded by merge count, never by
    corpus size (100 TB of text changes stage 1 only).

    ``stats``: bench instrumentation — pass a list to receive one
    ``(rank, seconds, touched_words, n_pair_state)`` tuple per merge
    (adds one count job per iteration; leave ``None`` in production).

    ``speculate`` (VERDICT r14 item 6 — attack the one-job-per-merge
    floor): with ``speculate=K > 1``, each round picks the argmax pair
    PLUS up to K−1 next-best candidates whose symbols are pairwise
    DISJOINT, computes all K sequential per-step deltas in ONE Spark job
    (a chained fold that keeps every intermediate state — disjointness
    makes each candidate's count invariant under the earlier folds, and
    folding never creates adjacency between pre-existing symbols, so
    one adjacency filter on the original syms captures the whole
    chain's touched set), then VALIDATES each speculated step on the
    driver: step k is accepted only if, after applying deltas 1..k−1,
    the exact argmax (count desc, lexicographic) still equals candidate
    k.  A rejected step truncates the round — the remaining deltas are
    discarded and the vocabulary folds only the accepted prefix — so
    the merge table is SEQUENTIAL-EXACT by construction (hash-matched
    against speculate=1 on every fixture, including the seeded
    collision-heavy corpus), and the only thing speculation changes is
    the job count: jobs/merge = 1/(mean accepted prefix).  The chain
    size is ADAPTIVE (AIMD: double on full acceptance of a round that
    actually speculated — k_round > 1; a k=1 round trivially "accepts"
    its only candidate and must not count as a hit (ADVICE r15) — drop
    to the accepted prefix on truncation, hold the k=1 floor under
    sustained misses and probe upward every 8th floor round) —
    measured (SCALE.md r15): at the data-bound HEAD of a train
    freshly-minted pairs outrank the speculated next-best almost every
    round, so a FIXED K=8 read 1.77x slower than sequential while the
    adaptive chain stays ~sequential there and only batches where
    acceptance is real (the scheduling-bound tail the feature exists
    for).  Default 1 = the unspeculated path, plan-identical to r14.

    ``max_pair_state`` bounds the driver-resident dict (VERDICT r14
    item 5): the state holds DISTINCT (left, right) symbol pairs — it
    seeds at ≤ |alphabet|² entries and grows as merges mint new symbols,
    asymptotically bounded by Σ(|word|−1) over the distinct vocabulary.
    Measured (scripts/bpe_state_rss.py, r15): ~238 bytes/pair
    all-in (dict slot + key tuple + the two symbol strings + int), flat
    from 1M to 10M synthetic pairs (232 at 10M); a REAL 477k-word zipf
    train seeds at 288 entries (hex alphabet²) and peaks at only 12,266
    after 100 merges — state grows with MINTED symbols, so real trains
    sit orders below the asymptotic.  The default 50M-pair cap is
    ~13 GB of driver heap — generous for the 128 GiB driver here, and a
    10M-distinct-word worst case (Σ|word|−1 ≈ 80M pairs ≈ 21 GB) is the
    scale where a raise beats an OOM mid-train.  On breach the train
    raises with the measured arithmetic instead of dying; lower the cap
    for small drivers or shard the corpus — or pass
    ``on_state_overflow='spill'`` (r16, VERDICT r15 item 7): on breach
    the state transfers to a maintained Spark-side pair DataFrame and
    the train CONTINUES sequentially (``_bpe_train_spark_state`` —
    slower per merge, unbounded) with a hash-identical merge table
    (test-pinned across the spill boundary).

    RESUMABLE (r16, VERDICT r15 item 3): with ``checkpoint_dir`` set,
    the train persists (merge table, pair state, folded vocabulary)
    every ``checkpoint_every`` accepted merges — the manifest is
    renamed into place LAST, so a kill mid-checkpoint invalidates that
    cadence point and resume falls back to the previous one.  A rerun
    with the same ``checkpoint_dir`` (and ``resume=True``, the
    default) restarts from the newest valid checkpoint WITHOUT
    re-scanning the corpus and produces a merge table bit-identical to
    the uninterrupted train (the state fully determines the remainder:
    counts are exact integers, the argmax tiebreak is total) —
    asserted by the kill-at-merge-K tests on the fixture AND the
    seeded collision-heavy corpus.  Resuming with a larger
    ``num_merges`` extends a finished train; ``token_mode`` is
    validated against the manifest.
    """
    import os
    import time as _time

    from kafka_streams_one_to_many_join_spark.model import materialize

    if on_state_overflow not in ("raise", "spill"):
        raise ValueError(
            f"bpe_train: on_state_overflow must be 'raise' or 'spill', "
            f"got {on_state_overflow!r}"
        )
    spark = docs.sparkSession

    ckpt_fn = None
    if checkpoint_dir is not None:

        def ckpt_fn(rank_, merges_, pair_state_, vocab_):
            _bpe_ckpt_save(
                spark, checkpoint_dir, rank_, merges_, pair_state_, vocab_,
                token_mode,
            )

    start_rank = 1
    merges: list[tuple[int, str, str, int]] = []
    resumed = None
    if checkpoint_dir is not None and resume:
        resumed = _bpe_ckpt_latest(checkpoint_dir)
    if resumed is not None:
        r0, d0, man = resumed
        if man.get("token_mode") != token_mode:
            raise ValueError(
                f"bpe_train: checkpoint at {d0} was trained with "
                f"token_mode={man.get('token_mode')!r}, caller passed "
                f"{token_mode!r}; resuming across token modes would "
                "silently mix tokenizations — pass resume=False or a "
                "fresh checkpoint_dir"
            )
        merges = [
            (int(r.merge_rank), r.left_sym, r.right_sym, int(r.pair_count))
            for r in spark.read.parquet(os.path.join(d0, "merges"))
            .orderBy("merge_rank")
            .collect()
        ]
        if r0 >= num_merges:
            return spark.createDataFrame(
                merges[:num_merges], _BPE_MERGES_SCHEMA
            )
        start_rank = r0 + 1
        vocab = materialize(spark.read.parquet(os.path.join(d0, "vocab")))
        if man.get("state_kind") == "spark":
            return _bpe_train_spark_state(
                spark, vocab, merges,
                spark.read.parquet(os.path.join(d0, "pairs")),
                start_rank, num_merges, materialize_every, stats,
                ckpt=ckpt_fn, checkpoint_every=checkpoint_every,
            )
        pair_counts: dict[tuple[str, str], int] = {
            (r.left_sym, r.right_sym): int(r.pair_count)
            for r in spark.read.parquet(os.path.join(d0, "pairs")).collect()
        }
    else:
        toks = tokens_expr(text_col, token_mode)
        vocab = (
            docs.select(F.explode(toks).alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(
                "c",
                F.expr(
                    "transform(sequence(1, length(w)), i -> substr(w, i, 1))"
                ).alias("syms"),
            )
        )
        vocab = materialize(vocab)
        # seed the maintained pair-count state: the one full aggregate,
        # collected to a driver dict (vocabulary-bounded by construction)
        seed = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "c",
                F.explode(F.expr("sequence(1, size(syms) - 1)")).alias("i"),
                "syms",
            )
            .select(
                F.expr("element_at(syms, i)").alias("left_sym"),
                F.expr("element_at(syms, i + 1)").alias("right_sym"),
                "c",
            )
            .groupBy("left_sym", "right_sym")
            .agg(F.sum("c").alias("pair_count"))
        )
        pair_counts = {
            (r.left_sym, r.right_sym): r.pair_count for r in seed.collect()
        }

    def _overflowed() -> bool:
        """True (spill mode) when the dict outgrew the cap; raise mode
        keeps the r15 arithmetic-bearing error."""
        if len(pair_counts) <= max_pair_state:
            return False
        if on_state_overflow == "spill":
            return True
        raise ValueError(
            f"bpe_train: pair-count state grew to {len(pair_counts):,} "
            f"entries, past max_pair_state={max_pair_state:,} (~"
            f"{max_pair_state * 238 / 1e9:.1f} GB at the measured ~238 "
            "bytes/pair — scripts/bpe_state_rss.py).  Raise the cap if "
            "the driver has the heap, train on a corpus shard, or pass "
            "on_state_overflow='spill' to continue with Spark-side state"
        )

    def _check_pair_state() -> None:
        # raise-mode breach check at the historical call sites; spill
        # transitions happen at iteration boundaries (vocab folded)
        if on_state_overflow == "raise":
            _overflowed()

    def _spill(vocab_, next_rank):
        pairs_df = spark.createDataFrame(
            [(l, r, int(c)) for (l, r), c in pair_counts.items()],
            _BPE_PAIRS_SCHEMA,
        )
        pair_counts.clear()
        return _bpe_train_spark_state(
            spark, vocab_, merges, pairs_df, next_rank, num_merges,
            materialize_every, stats,
            ckpt=ckpt_fn, checkpoint_every=checkpoint_every,
        )

    _check_pair_state()
    if on_state_overflow == "spill" and len(pair_counts) > max_pair_state:
        # the seed itself breaches the cap: spill before the first merge
        return _spill(vocab, start_rank)

    def _argmax():
        return min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]

    if speculate > 1:
        import heapq
        from collections import defaultdict

        q = lambda s: s.replace("'", "''")  # noqa: E731
        struct_t = (
            "array<struct<step:int,left_sym:string,right_sym:string,w:bigint>>"
        )
        rank = start_rank - 1
        # AIMD chain sizing (measured, SCALE.md r15): at the data-bound
        # HEAD of a train, freshly-minted pairs outrank the speculated
        # next-best almost every round (mean accepted ~1.2 of 8 on the
        # 477k-word ladder), so a fixed K pays K-chain fold work for ~1
        # merge — measured 1.77x SLOWER than sequential.  Acceptance is
        # a property of the count landscape, so adapt: double the chain
        # on full acceptance of a genuinely speculative round, drop to
        # the observed accepted prefix on truncation, hold the k=1
        # floor under sustained misses, probe upward every 8th floor
        # round (_aimd_update / _aimd_next_k — pure, unit-tested).
        cur_k = min(2, speculate)
        rounds_at_floor = 0
        while rank < num_merges and pair_counts:
            _t0 = _time.perf_counter()
            cur_k, rounds_at_floor = _aimd_next_k(cur_k, rounds_at_floor, speculate)
            k_round = min(cur_k, speculate, num_merges - rank)
            # chain: argmax + next-best candidates with pairwise-DISJOINT
            # symbols, in exact (count desc, lexicographic) order — a
            # widened window is scanned because disjointness skips some
            window = heapq.nsmallest(
                max(16, 8 * k_round),
                pair_counts.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]),
            )
            chain: list[tuple[str, str]] = []
            used: set[str] = set()
            for (cl, cr), _cnt in window:
                if cl in used or cr in used:
                    continue
                chain.append((cl, cr))
                used.update((cl, cr))
                if len(chain) == k_round:
                    break
            kk = len(chain)
            # lean single-merge expressions when the adaptive chain sits
            # at the floor — the chained-states machinery costs a
            # measurably larger per-job constant (regime-B measurement,
            # SCALE.md r15), and at kk=1 it buys nothing
            l1, r1 = chain[0]
            ql1, qr1 = q(l1), q(r1)
            contains1 = (
                "case when size({s}) < 2 then false else "
                "exists(sequence(1, size({s}) - 1), i -> "
                f"element_at({{s}}, i) = '{ql1}' and "
                f"element_at({{s}}, i + 1) = '{qr1}') end"
            )
            fold1 = (
                "aggregate({s}, cast(array() as array<string>), (acc, x) -> "
                f"case when size(acc) > 0 and element_at(acc, -1) = '{ql1}' "
                f"and x = '{qr1}' "
                f"then concat(slice(acc, 1, size(acc) - 1), array('{ql1}{qr1}')) "
                "else concat(acc, array(x)) end)"
            )
            merge_arr = "array(" + ", ".join(
                f"named_struct('l', '{q(l)}', 'r', '{q(r)}')" for l, r in chain
            ) + ")"
            # all K+1 sequential states in ONE aggregate — every repeated
            # reference below is to a LAMBDA VARIABLE (acc/st/m), which
            # Catalyst never inline-expands (the 3^k lesson applies to
            # projection aliases, not lambda bindings)
            fold_m = (
                "aggregate(element_at(acc, -1), cast(array() as array<string>), "
                "(a2, x) -> case when size(a2) > 0 and element_at(a2, -1) = m.l "
                "and x = m.r then concat(slice(a2, 1, size(a2) - 1), "
                "array(concat(m.l, m.r))) else concat(a2, array(x)) end)"
            )
            states = (
                f"aggregate({merge_arr}, array({{s}}), (acc, m) -> "
                "concat(acc, array(case when size(element_at(acc, -1)) >= 2 and "
                "exists(sequence(1, size(element_at(acc, -1)) - 1), i -> "
                "element_at(element_at(acc, -1), i) = m.l and "
                "element_at(element_at(acc, -1), i + 1) = m.r) "
                f"then {fold_m} else element_at(acc, -1) end)))"
            )
            # touched(chain) on the ORIGINAL syms is exact: disjoint folds
            # neither create nor destroy another candidate's adjacencies
            contains_any = " or ".join(
                "(case when size(syms) < 2 then false else "
                "exists(sequence(1, size(syms) - 1), i -> "
                f"element_at(syms, i) = '{q(l)}' and "
                f"element_at(syms, i + 1) = '{q(r)}') end)"
                for l, r in chain
            )
            pair_structs = (
                "transform(sequence(1, size({a}) - 1), i -> named_struct("
                "'step', k, 'left_sym', element_at({a}, i), "
                "'right_sym', element_at({a}, i + 1), 'w', cast({sign}c as bigint)))"
            )
            old_a = pair_structs.format(a="element_at(st, k)", sign="-")
            new_a = (
                f"case when size(element_at(st, k + 1)) < 2 then cast(array() as {struct_t}) "
                f"else {pair_structs.format(a='element_at(st, k + 1)', sign='')} end"
            )
            delta_expr = (
                f"flatten(transform(array({states.format(s='syms')}), st -> "
                f"flatten(transform(sequence(1, {kk}), k -> "
                "case when element_at(st, k) = element_at(st, k + 1) then "
                f"cast(array() as {struct_t}) "
                f"else concat({old_a}, {new_a}) end))))"
            )
            if kk == 1:
                ps1 = (
                    "transform(sequence(1, size({a}) - 1), i -> named_struct("
                    "'left_sym', element_at({a}, i), "
                    "'right_sym', element_at({a}, i + 1), 'w', {sign}c))"
                )
                new1 = (
                    "case when size(_new_syms) < 2 then cast(array() as "
                    "array<struct<left_sym:string,right_sym:string,w:bigint>>) "
                    f"else {ps1.format(a='_new_syms', sign='')} end"
                )
                delta = (
                    vocab.filter(F.expr(contains1.format(s="syms")))
                    .select("c", F.expr(fold1.format(s="syms")).alias("_new_syms"), "syms")
                    .select(
                        F.explode(
                            F.expr(f"concat({ps1.format(a='syms', sign='-')}, {new1})")
                        ).alias("p")
                    )
                    .groupBy(
                        F.lit(1).alias("step"),
                        F.col("p.left_sym").alias("left_sym"),
                        F.col("p.right_sym").alias("right_sym"),
                    )
                    .agg(F.sum("p.w").alias("pair_count"))
                )
            else:
                delta = (
                    vocab.filter(F.expr(contains_any))
                    .select(F.explode(F.expr(delta_expr)).alias("p"))
                    .groupBy(
                        F.col("p.step").alias("step"),
                        F.col("p.left_sym").alias("left_sym"),
                        F.col("p.right_sym").alias("right_sym"),
                    )
                    .agg(F.sum("p.w").alias("pair_count"))
                )
            if stats is not None:
                touched = vocab.filter(F.expr(contains_any)).count()
            by_step: dict[int, list] = defaultdict(list)
            # the ONE Spark job of the round
            for r in delta.collect():
                by_step[r.step].append((r.left_sym, r.right_sym, r.pair_count))
            accepted = 0
            for k in range(1, kk + 1):
                cand = chain[k - 1]
                if not pair_counts or _argmax() != cand:
                    break  # speculation miss: truncate the round here
                merges.append(
                    (rank + k, cand[0], cand[1], int(pair_counts[cand]))
                )
                for lsym, rsym, w in by_step[k]:
                    key = (lsym, rsym)
                    new_count = pair_counts.get(key, 0) + w
                    if new_count > 0:
                        pair_counts[key] = new_count
                    else:
                        pair_counts.pop(key, None)
                accepted = k
            _check_pair_state()
            cur_k, rounds_at_floor = _aimd_update(
                cur_k, rounds_at_floor, accepted, k_round, speculate
            )
            if accepted == 1:
                # lean single-fold update (the transform() lambda-variable
                # routing from the sequential path — one reference/level)
                vocab = vocab.select(
                    "c",
                    F.expr(
                        "element_at(transform(array(syms), s -> "
                        f"case when {contains1.format(s='s')} "
                        f"then {fold1.format(s='s')} else s end), 1)"
                    ).alias("syms"),
                )
            else:
                acc_arr = "array(" + ", ".join(
                    f"named_struct('l', '{q(l)}', 'r', '{q(r)}')"
                    for l, r in chain[:accepted]
                ) + ")"
                acc_states = states.replace(merge_arr, acc_arr, 1)
                vocab = vocab.select(
                    "c",
                    F.expr(
                        f"element_at({acc_states.format(s='syms')}, -1)"
                    ).alias("syms"),
                )
            new_rank = rank + accepted
            if new_rank // materialize_every > rank // materialize_every:
                vocab = materialize(vocab)
            if (
                ckpt_fn is not None
                and new_rank // checkpoint_every > rank // checkpoint_every
            ):
                ckpt_fn(new_rank, merges, pair_counts, vocab)
            if stats is not None:
                dt = round((_time.perf_counter() - _t0) / max(accepted, 1), 4)
                for k in range(1, accepted + 1):
                    stats.append((rank + k, dt, touched, len(pair_counts)))
            rank = new_rank
            if on_state_overflow == "spill" and len(pair_counts) > max_pair_state:
                # spill at a round boundary (vocab folded, state exact):
                # the remaining merges continue with Spark-side state,
                # sequentially (speculation needs the in-memory argmax)
                return _spill(vocab, rank + 1)
        return spark.createDataFrame(
            merges,
            "merge_rank bigint, left_sym string, right_sym string, pair_count bigint",
        )

    for rank in range(start_rank, num_merges + 1):
        _t0 = _time.perf_counter()
        if not pair_counts:
            break
        # argmax: count desc, then lexicographic (left, right) — Python
        # min on (-count, left, right); code-point order == Spark's
        # UTF-8 binary order, so the tiebreak matches orderBy exactly
        best_key = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        left, right = best_key
        cnt = pair_counts[best_key]
        merges.append((rank, left, right, int(cnt)))
        ql, qr = left.replace("'", "''"), right.replace("'", "''")
        # a word is touched iff it contains the merged pair ADJACENTLY;
        # touched words have size >= 2 by construction, so the exists()
        # lambda never probes element_at(_, 0).  Both templates take the
        # symbol-array EXPRESSION as a parameter so the conditional
        # vocab update below can route it through a lambda variable.
        def contains(s: str) -> str:
            return (
                f"case when size({s}) < 2 then false else "
                f"exists(sequence(1, size({s}) - 1), i -> "
                f"element_at({s}, i) = '{ql}' and element_at({s}, i + 1) = '{qr}') "
                "end"
            )

        # greedy left-to-right merge fold: acc[-1]==left and x==right →
        # replace acc's tail with the merged symbol, else append.  Equal
        # to the classic non-overlapping regex replace on "aaa"-style
        # runs (the sequential property test sweeps those).
        def fold(s: str) -> str:
            return (
                f"aggregate({s}, cast(array() as array<string>), (acc, x) -> "
                f"case when size(acc) > 0 and element_at(acc, -1) = '{ql}' "
                f"and x = '{qr}' "
                f"then concat(slice(acc, 1, size(acc) - 1), array('{ql}{qr}')) "
                "else concat(acc, array(x)) end)"
            )
        # delta from the touched words only: old adjacent pairs count
        # negatively, the re-folded word's pairs positively.  The old
        # side never needs a size guard (touched ⇒ size >= 2); the new
        # side does (a word that IS the pair folds to one symbol).
        pair_structs = (
            "transform(sequence(1, size({s}) - 1), i -> named_struct("
            "'left_sym', element_at({s}, i), "
            "'right_sym', element_at({s}, i + 1), 'w', {sign}c))"
        )
        old_arr = pair_structs.format(s="syms", sign="-")
        new_arr = (
            "case when size(_new_syms) < 2 then "
            "cast(array() as array<struct<left_sym:string,right_sym:string,w:bigint>>) "
            f"else {pair_structs.format(s='_new_syms', sign='')} end"
        )
        delta = (
            vocab.filter(F.expr(contains("syms")))
            .select("c", F.expr(fold("syms")).alias("_new_syms"), "syms")
            .select(F.explode(F.expr(f"concat({old_arr}, {new_arr})")).alias("p"))
            .groupBy(
                F.col("p.left_sym").alias("left_sym"),
                F.col("p.right_sym").alias("right_sym"),
            )
            .agg(F.sum("p.w").alias("pair_count"))
        )
        # the one Spark job of the iteration: the touched-words delta,
        # folded into the driver-side state (pairs at 0 drop out so the
        # in-memory argmax never picks an extinct pair)
        for r in delta.collect():
            key = (r.left_sym, r.right_sym)
            new_count = pair_counts.get(key, 0) + r.pair_count
            if new_count > 0:
                pair_counts[key] = new_count
            else:
                pair_counts.pop(key, None)
        _check_pair_state()
        # instrumentation: count the touched set with the SAME
        # contains('syms') predicate the delta filter used, on the
        # PRE-update vocab (ADVICE r14 low — the former post-update
        # array_contains(merged) probe over-counted whenever the merged
        # string collided with a symbol reachable by a different merge
        # path, e.g. ('a','bc') and ('ab','c') both yielding 'abc', or
        # when a word already contained it — skewing the SCALE.md
        # ladder's touched_words column)
        if stats is not None:
            touched = vocab.filter(F.expr(contains("syms"))).count()
        # fold ONLY the touched rows; untouched syms pass through
        # untouched.  The update is routed through a transform() lambda
        # variable so each level references the previous level's syms
        # EXACTLY ONCE: a naive `case when contains(syms) then fold(syms)
        # else syms end` references it three times, and Catalyst's
        # projection collapse inlines the whole prior-level expression
        # into every reference — 3^k tree growth between checkpoints
        # (measured: 1.5 s → 11 s → 54 s per merge before this fix).
        vocab = vocab.select(
            "c",
            F.expr(
                "element_at(transform(array(syms), s -> "
                f"case when {contains('s')} then {fold('s')} else s end), 1)"
            ).alias("syms"),
        )
        if rank % materialize_every == 0:
            vocab = materialize(vocab)
        if ckpt_fn is not None and rank % checkpoint_every == 0:
            ckpt_fn(rank, merges, pair_counts, vocab)
        if stats is not None:
            stats.append(
                (
                    rank,
                    round(_time.perf_counter() - _t0, 4),
                    touched,
                    len(pair_counts),
                )
            )
        if on_state_overflow == "spill" and len(pair_counts) > max_pair_state:
            # transition at an iteration boundary (vocab folded, state
            # exact): the remainder continues with Spark-side state
            return _spill(vocab, rank + 1)
    return spark.createDataFrame(
        merges,
        "merge_rank bigint, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_encode(
    docs: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_mode: str = "ascii",
):
    """Apply a learned BPE merge table (``bpe_train`` output) to a corpus
    — the inference side of tokenizer training.  Output:
    ``(doc_id, symbols ARRAY<STRING>, n_symbols BIGINT)``, one row per
    document, symbols in reading order.

    Scale shape — the Python work is VOCABULARY-bounded, never
    corpus-bounded:

      1. tokenize + posexplode (order witness travels as a column);
      2. encode each DISTINCT word once in an Arrow-batched
         ``mapInPandas`` (the merge table rides the closure — it is
         ``num_merges`` rows by construction);
      3. join the encoded vocabulary back to token occurrences (the
         planner broadcasts the vocab side when it fits — the common
         case) and reassemble per-doc symbol arrays with one
         sort-in-aggregation-buffer groupBy (the sessionization
         pattern: array_sort after collect_list, no extra exchange).

    Merges are applied in RANK ORDER with the same greedy
    left-to-right pass as training's fold, so ``bpe_encode`` over the
    training corpus reproduces the training-end vocabulary state
    exactly (test-pinned against the sequential reference).  The
    min-rank-first encode loop (the GPT-2 formulation) is an equivalent
    optimization for long merge lists; rank-order is kept because it is
    definitionally identical to training.  Empty documents keep their
    row with ``symbols = []``.
    """
    import pandas as pd

    spark = docs.sparkSession
    if isinstance(merges, DataFrame):
        merge_list = [
            (r.left_sym, r.right_sym)
            for r in merges.orderBy("merge_rank").collect()
        ]
    else:
        merge_list = [tuple(m) for m in merges]

    per_tok = docs.select(
        F.col(id_col),
        F.posexplode_outer(tokens_expr(text_col, token_mode)).alias("pos", "_w"),
    )
    words = per_tok.filter(F.col("_w").isNotNull()).select(
        F.col("_w").alias("w")
    ).distinct()

    def _encode_batches(batches):
        for pdf in batches:
            out = []
            for w in pdf["w"]:
                syms = list(w)
                for left, right in merge_list:
                    if len(syms) < 2:
                        break
                    merged, acc = left + right, []
                    for s in syms:
                        if acc and acc[-1] == left and s == right:
                            acc[-1] = merged
                        else:
                            acc.append(s)
                    syms = acc
                out.append(syms)
            yield pd.DataFrame({"w": pdf["w"], "_syms": out})

    encoded = words.mapInPandas(
        _encode_batches, schema="w string, _syms array<string>"
    )
    joined = per_tok.join(
        encoded, per_tok["_w"] == encoded["w"], "left"
    ).select(id_col, "pos", "_syms")
    assembled = joined.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("pos"), F.col("_syms")))
        ).alias("_ordered")
    )
    symbols = F.expr("flatten(transform(_ordered, x -> x._syms))")
    return assembled.select(
        F.col(id_col),
        F.coalesce(symbols, F.expr("array()")).alias("symbols"),
    ).withColumn("n_symbols", F.size("symbols").cast("bigint"))


def hashed_quality_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    slope: float = 8.0,
    token_mode: str = "ascii",
) -> DataFrame:
    """Hashed linear quality classifier — the fasttext-style scoring
    stage of a pre-training curation pipeline (CCNet / LLaMA-recipe
    shape): score = sigmoid(slope · (mean token weight)), where each
    token's weight is a pure hash function of the token itself, so the
    "model" needs no weight table, no broadcast, and no Python.

    The per-token weight is the md5-prefix-32 uniform (the same
    oracle-proven recipe as ``weighted_sample``'s A-ES uniforms) mapped
    to [-1, 1).  Weights are INTEGER-summed per document (exact,
    order-independent — float-sum drift can't break cross-engine hash
    agreement) with ONE double division at the end, the repo-wide
    "sum exact, divide once" discipline.

    Dataflow: explode_outer → ONE per-doc integer aggregation (the
    gopher_quality pattern — empty documents keep their row with no
    join-back).  The groupBy is map-side combined to one row per
    document before its shuffle, so the exchange is |docs|-sized, not
    |tokens|-sized.  The higher-order ``aggregate()`` lambda formulation
    (zero shuffles) was measured and rejected: interpreted HOF lambdas
    run the md5+conv per token outside codegen (6.1 s vs 4.8 s warm on
    the same single-partition sf0.1 input — see gopher_quality's
    parallel measurement) and lose to the combined exchange.  Empty
    documents pin score = 0.5 (the sigmoid midpoint — no evidence
    either way).
    """
    toks = tokens_expr(text_col, token_mode)
    per_tok = docs.select(
        F.col(id_col),
        F.explode_outer(toks).alias("_t"),
    ).select(
        id_col,
        F.expr(
            "case when _t is null then cast(null as bigint) "
            "else cast(conv(substring(md5(_t), 1, 8), 16, 10) as bigint) end"
        ).alias("_w"),
    )
    base = per_tok.groupBy(id_col).agg(
        F.coalesce(F.sum("_w"), F.lit(0)).cast("bigint").alias("w_sum"),
        F.count("_w").cast("bigint").alias("n_tokens"),
    )
    mean_u = (
        F.col("w_sum").cast("double")
        / F.col("n_tokens").cast("double")
        / F.lit(4294967296.0)
    )
    raw = mean_u * F.lit(2.0) - F.lit(1.0)
    score = F.when(
        F.col("n_tokens") > 0,
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(F.lit(-slope) * raw)), 6
        ),
    ).otherwise(F.lit(0.5))
    return base.select(
        id_col,
        "n_tokens",
        "w_sum",
        score.alias("score"),
        F.least(F.floor(score * 10).cast("bigint"), F.lit(9).cast("bigint")).alias(
            "decile"
        ),
    )


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_top_word_ratio: float = 0.2,
    min_distinct_ratio: float = 0.3,
    min_stopwords: int = 2,
    token_mode: str = "ascii",
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 shape):
    repetition and length signals plus a combined ``keep`` verdict.
    ``token_mode="unicode"`` scores non-Latin corpora on their real
    tokens instead of routing every document into the token-free branch
    (n_words=0, keep=false); the stopword signal stays English.

    Signals per document: word count, mean word length, distinct-word
    ratio, most-frequent-word ratio (the two repetition filters), and
    English stopword count.  ``keep`` is the AND of the thresholds —
    callers tune per corpus or use the signal columns directly.

    Dataflow: explode tokens → count per (doc, word) → aggregate per doc.
    Two linear shuffles; deliberately NOT an array higher-order-function
    one-liner — interpreted HOF lambdas cost ~10x codegen and the
    per-(doc,word) aggregate is the scalable formulation of "top word
    ratio" (partial aggregation before each exchange, no per-row
    quadratic scan).  Empty docs yield n_words=0 and keep=false.

    Also emits per-document unigram Shannon entropy (nats; the classic
    low-entropy = repetitive/templated signal) and the distinct-token
    count — the former standalone ``token_entropy`` query, folded in
    here (r07) because H = ln(n) - Σ c·ln(c) / n is derivable from the
    SAME per-(doc, word) counts this aggregation already shuffles: two
    extra fixed-width sums, zero extra exchanges.  Entropy is NULL for
    empty documents.
    """
    toks = tokens_expr(text_col, token_mode)
    per_word = (
        docs.select(F.col(id_col), F.explode_outer(toks).alias("_w"))
        .groupBy(id_col, "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    stop_list = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    agg = per_word.groupBy(id_col).agg(
        F.coalesce(
            F.sum(F.when(F.col("_w").isNotNull(), F.col("_c"))), F.lit(0)
        ).cast("bigint").alias("n_words"),
        F.sum(
            F.when(F.col("_w").isNotNull(), F.col("_c") * F.length("_w"))
        ).cast("bigint").alias("_chars"),
        F.count(F.col("_w")).cast("bigint").alias("_distinct"),
        F.coalesce(F.max(F.when(F.col("_w").isNotNull(), F.col("_c"))), F.lit(0))
        .cast("bigint").alias("_top"),
        F.coalesce(
            F.sum(F.expr(f"case when _w in ({stop_list}) then _c else 0 end")),
            F.lit(0),
        ).cast("bigint").alias("n_stopwords"),
        F.sum(
            F.when(
                F.col("_w").isNotNull(),
                F.col("_c").cast("double") * F.log(F.col("_c").cast("double")),
            )
        ).alias("_clnc"),
    )
    nw = F.col("n_words")
    mean_len = F.when(nw > 0, F.col("_chars").cast("double") / nw).otherwise(F.lit(0.0))
    distinct_ratio = F.when(nw > 0, F.col("_distinct").cast("double") / nw).otherwise(F.lit(0.0))
    top_ratio = F.when(nw > 0, F.col("_top").cast("double") / nw).otherwise(F.lit(0.0))
    keep = (
        nw.between(min_words, max_words)
        & mean_len.between(min_mean_word_len, max_mean_word_len)
        & (top_ratio <= max_top_word_ratio)
        & (distinct_ratio >= min_distinct_ratio)
        & (F.col("n_stopwords") >= min_stopwords)
    )
    entropy = F.when(
        nw > 0,
        F.round(
            F.log(nw.cast("double")) - F.col("_clnc") / nw.cast("double"), 6
        ),
    )
    return agg.select(
        F.col(id_col),
        nw,
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_ratio, 6).alias("top_word_ratio"),
        F.col("n_stopwords"),
        entropy.alias("entropy"),
        F.col("_distinct").alias("n_unique_tokens"),
        keep.alias("keep"),
    )
