"""Distributed Bloom filter: build as a sketch-sized aggregate, probe as a
broadcast join.

The classic at-scale use is join pruning: build a filter over the join keys
of the *small* side, broadcast it, and drop fact rows whose key cannot be
present before they ever reach the shuffle — the same idea Spark's AQE
runtime filters apply, here as an explicit, engine-portable operator (the
reference has nothing like it; this belongs to the LLM-pipeline surface,
sibling of the CMS/HLL/quantile sketch family in ``streaming/sketch.py``).

Layout: ``m`` bits packed into ``m/32`` words of **32 usable bits each**.
Words are BIGINT-valued but always < 2^32, so every mask fits comfortably
in a signed 64-bit integer — no unsigned types, no shift into the sign
bit, and the identical arithmetic runs on any engine (the DuckDB oracle
reproduces it operator-for-operator).

Hashing: ``k`` positions per element via the repo's portable md5-prefix
addressing (same recipe as ``functions.sampling`` / ``shard_assignment``):
``h_i(x) = conv(md5(i || ':' || x)[0:8], 16, 10) % m``.

Scale posture: the build shuffles at most ``m/32`` rows per map partition
(map-side ``bit_or`` partials — sketch-sized, independent of input rows).
The probe never shuffles the probed table: it explodes k (word, mask)
pairs, broadcast-joins the m/32-row filter, and reduces with a bool_and
group-back — or, when the probed side must stay un-exploded, the caller
can collect the words into a scalar map (m/32 rows) and probe with a
pure projection.  False-positive rate ~ (1 - e^(-k*n/m))^k; zero false
negatives by construction (pinned by the oracle-paired query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_positions"]

_WORD_BITS = 32  # usable bits per word; BIGINT-safe on every engine


def _h_sql(i: int, key: str, m: int, hash_mode: str = "md5") -> str:
    """Hash i of the key mod m (SQL text): 32-bit md5 prefix by default
    (portable), or engine-native xxhash64 (functions.hashing opt-in)."""
    from kafka_streams_one_to_many_join_spark.functions.hashing import (
        prefix_hash32,
    )

    seeded_key = f"concat('{i}:', cast({key} as string))"
    return f"{prefix_hash32(seeded_key, hash_mode)} % {m}"


def bloom_positions(
    key: str, m: int, k: int, hash_mode: str = "md5"
) -> Column:
    """Array of k structs (word, mask) for the key — the spec form of the
    addressing recipe (what the DuckDB oracle mirrors).  Inlines each
    seed hash twice (word + mask both derive from it), so build/probe
    below do NOT use it on the hot path: they materialize the ``_bh{i}``
    hash columns first (``_h_cols``) and derive (word, mask) from those —
    codegen subexpression elimination does not reach a Generate input,
    and the two-reference form measurably evaluates 2k digests per
    element instead of k (1.7x on a 5M-row build)."""
    pos = ", ".join(
        f"named_struct("
        f"'word', cast(floor(({_h_sql(i, key, m, hash_mode)}) / {_WORD_BITS}) as bigint), "
        f"'mask', shiftleft(cast(1 as bigint), "
        f"cast(({_h_sql(i, key, m, hash_mode)}) % {_WORD_BITS} as int)))"
        for i in range(k)
    )
    return F.expr(f"array({pos})")


def _h_cols(key: str, m: int, k: int, hash_mode: str) -> list[Column]:
    """The k seed-hash columns, each digest evaluated exactly once.
    Referenced twice downstream (word + mask), so CollapseProject keeps
    the materializing projection separate (non-cheap, multi-referenced)."""
    return [
        F.expr(_h_sql(i, key, m, hash_mode)).alias(f"_bh{i}")
        for i in range(k)
    ]


def _positions_from_h(k: int) -> Column:
    """(word, mask) structs derived from materialized ``_bh{i}`` columns —
    pure cheap integer arithmetic, no digests."""
    pos = ", ".join(
        f"named_struct("
        f"'word', cast(floor(_bh{i} / {_WORD_BITS}) as bigint), "
        f"'mask', shiftleft(cast(1 as bigint), "
        f"cast(_bh{i} % {_WORD_BITS} as int)))"
        for i in range(k)
    )
    return F.expr(f"array({pos})")


def bloom_build(
    df: DataFrame, key: str, m: int = 1024, k: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """Aggregate ``df[key]`` into an m-bit Bloom filter.

    Returns a DataFrame (word BIGINT, bits BIGINT) with at most m/32 rows —
    only words with at least one set bit appear.  ``bit_or`` is idempotent,
    so duplicate keys need no pre-distinct (no extra shuffle).
    Build and probe must use the same ``hash_mode`` (md5 default;
    "xxhash64" is the engine-native fast path, see functions.hashing).
    """
    return (
        df.select(*_h_cols(key, m, k, hash_mode))
        .select(F.explode(_positions_from_h(k)).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or(F.col("p.mask")).alias("bits"))
    )


def bloom_probe(
    df: DataFrame, key: str, bloom: DataFrame, m: int = 1024, k: int = 4,
    hash_mode: str = "md5",
) -> DataFrame:
    """Annotate ``df`` with ``maybe_present``: True iff all k bits are set.

    The filter collapses to a ONE-ROW word→bits map (≤ m/32 entries —
    this is exactly how an engine ships a runtime filter to scan tasks),
    broadcast-crossJoined onto the probed side; the membership test is a
    pure whole-stage-codegen projection — the probed table never shuffles,
    never explodes.
    """
    compact = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_bloom")
    )
    return (
        df.crossJoin(F.broadcast(compact))
        .select("*", *_h_cols(key, m, k, hash_mode))
        .withColumn("_pos", _positions_from_h(k))
        .withColumn(
            "maybe_present",
            F.expr(
                "forall(_pos, p -> (coalesce(element_at(_bloom, p.word), "
                "cast(0 as bigint)) & p.mask) = p.mask)"
            ),
        )
        .drop("_pos", "_bloom", *[f"_bh{i}" for i in range(k)])
    )
