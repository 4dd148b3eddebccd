"""Streaming distinct-count sketch — the stream twin of the batch
HyperLogLog query (``__spark_entry__.q_hll_distinct``).

State per key is the m=256 HLL register array (``ArrayType(Integer)``,
native state-store round-trip — no string serialization); each
micro-batch folds the new rows' (bucket, rho) values into the registers
with ``max`` and emits the refreshed estimate.  Because the register
update is commutative and idempotent, the state after ANY micro-batch
partitioning of the input equals the batch sketch over the same rows —
``tests/test_streaming.py`` asserts the final streaming estimates match
the batch query's to rounding tolerance across a 3-batch split.

The hash/register/estimator arithmetic is the exact deterministic recipe
of the batch query (48-bit md5 prefix, 8-bit bucket, rho = leading zeros
+ 1, exact-integer register sum, linear-counting small-range
correction), so batch, stream and any other engine implementing the
recipe agree bit-for-bit on the registers.

Scale: state is 256 ints per key regardless of stream volume — the
sketch property that makes per-key cardinality tracking viable on a
100 TB/day stream.  The only shuffle is the groupBy(key) partitioning
of incoming events; with a bounded key domain, state is bounded too, so
no watermark/timeout is needed (add ``timeoutConf`` for unbounded key
domains).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_M = 256
_ALPHA = 0.7213 / (1 + 1.079 / _M)

_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("hll_estimate", DoubleType(), False),
    ]
)

_STATE = StructType(
    [
        StructField("registers", ArrayType(IntegerType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def hll_register(value: object) -> tuple[int, int]:
    """(bucket, rho) for one value — the portable md5 recipe shared with
    the batch SQL implementation."""
    h = int(hashlib.md5(str(value).encode()).hexdigest()[:12], 16)
    bucket, v = h % _M, h // _M
    rho = 41 - v.bit_length() if v > 0 else 41
    return bucket, rho


def hll_estimate(regs: list[int]) -> float:
    """Harmonic-mean estimate with linear-counting small-range correction
    — exact-integer register sum, so the float result is deterministic."""
    sum_int = sum(1 << (50 - r) for r in regs if r > 0)
    m_empty = sum(1 for r in regs if r == 0)
    raw = _ALPHA * _M * _M / (sum_int / float(1 << 50) + m_empty)
    if raw <= 2.5 * _M and m_empty > 0:
        return _M * math.log(_M / m_empty)
    return raw


def _hll_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    regs, n = (
        (list(state.get[0]), int(state.get[1]))
        if state.exists
        else ([0] * _M, 0)
    )
    for pdf in pdfs:
        for v in pdf["value"]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            bucket, rho = hll_register(v)
            if rho > regs[bucket]:
                regs[bucket] = rho
            n += 1
    state.update((regs, n))
    yield pd.DataFrame(
        [{"key": key[0], "n_seen": n, "hll_estimate": hll_estimate(regs)}]
    )


def streaming_hll_distinct(
    events: DataFrame, key_col: str, value_col: str, output_mode: str = "update"
) -> DataFrame:
    """Per-key running distinct-count estimate over a stream.

    Emits one (key, n_seen, hll_estimate) row per key per micro-batch
    that touched the key (update semantics — pair with an update-mode
    sink or an idempotent upsert writer; ``output_mode="append"`` emits
    the same snapshots append-only for file sinks / checkpoint recovery,
    latest per key = max n_seen)."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _hll_fn,
        outputStructType=_OUTPUT,
        stateStructType=_STATE,
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# fixed-bin quantile sketch — the stream twin of the batch query
# ``__spark_entry__.q_quantile_sketch`` (which complements the EXACT
# ``source_percentiles`` the way ``hll_distinct`` complements
# count(distinct)).
#
# The sketch is a histogram of _Q_BINS fixed-width bins over [0, _Q_BINS *
# _Q_WIDTH); values past the top clamp into the last bin.  Merging is
# elementwise integer addition — commutative and associative, so the state
# after ANY micro-batch partitioning equals the one-shot histogram, and the
# quantile read-off (first bin whose cumulative count reaches ceil(q*n),
# linear interpolation inside it) is a pure function of the histogram.
# Every step is exact integer arithmetic until one final double divide, so
# batch Spark, streaming Python, and the DuckDB oracle agree bit-for-bit.
#
# Scale: state is _Q_BINS ints per key regardless of stream volume; the
# batch twin's shuffle is O(keys x bins), the sketch property.
# ---------------------------------------------------------------------------

_Q_BINS = 64
_Q_WIDTH = 16

_Q_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("p25_sketch", DoubleType(), True),
        StructField("p50_sketch", DoubleType(), True),
        StructField("p90_sketch", DoubleType(), True),
    ]
)

_Q_STATE = StructType(
    [
        StructField("counts", ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def quantile_bin(value: float) -> int:
    """Bin index for one value — the portable recipe shared with the batch
    Spark expression (``v DIV width`` clamped) and the oracle SQL."""
    return min(int(value) // _Q_WIDTH, _Q_BINS - 1)


def quantile_estimate(counts: list[int], q: float) -> float | None:
    """Histogram quantile read-off: first bin whose cumulative count
    reaches ceil(q*n), linearly interpolated within the bin.  ceil(q*n)
    is the same IEEE double product both engines compute — determinism
    relies on doing it identically, not on q*n being exact."""
    n = sum(counts)
    if n == 0:
        return None
    target = math.ceil(q * n)
    cum = 0
    for b, c in enumerate(counts):
        if c and cum < target <= cum + c:
            return b * float(_Q_WIDTH) + _Q_WIDTH * (target - cum) / float(c)
        cum += c
    return float(_Q_BINS * _Q_WIDTH)


def _quantile_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    counts, n = (
        (list(state.get[0]), int(state.get[1]))
        if state.exists
        else ([0] * _Q_BINS, 0)
    )
    for pdf in pdfs:
        for v in pdf["value"]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                continue
            counts[quantile_bin(v)] += 1
            n += 1
    state.update((counts, n))
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "n_seen": n,
                "p25_sketch": quantile_estimate(counts, 0.25),
                "p50_sketch": quantile_estimate(counts, 0.5),
                "p90_sketch": quantile_estimate(counts, 0.9),
            }
        ]
    )


def streaming_quantile_sketch(
    events: DataFrame, key_col: str, value_col: str, output_mode: str = "update"
) -> DataFrame:
    """Per-key running quantile estimates over a stream (update semantics,
    one refreshed row per touched key per micro-batch;
    ``output_mode="append"`` for file sinks / checkpoint recovery)."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _quantile_fn,
        outputStructType=_Q_OUTPUT,
        stateStructType=_Q_STATE,
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# count-min sketch — the stream twin of the batch query
# ``__spark_entry__.q_cms_token_counts``.
#
# _CMS_D md5-addressed counter rows of _CMS_W buckets; update = +1 in one
# bucket per row, merge = elementwise integer addition (commutative and
# associative, like the quantile histogram), estimate(tok) = min over rows
# of the tok's counter — an upper bound on the true count that two engines
# compute identically because the hash recipe is pinned (md5 of "j:token",
# first 8 hex digits, mod _CMS_W: the same addressing deterministic_sample
# and the HLL sketch use).
#
# Scale: state is _CMS_D x _CMS_W longs per key regardless of stream
# volume; the batch twin's shuffle is the sketch size, not the token count.
# ---------------------------------------------------------------------------

_CMS_D = 4
_CMS_W = 256


def cms_bucket(j: int, token: str) -> int:
    """Counter index for hash row ``j`` — the portable recipe shared with
    the batch Spark expression and the DuckDB oracle."""
    h = int(hashlib.md5(f"{j}:{token}".encode()).hexdigest()[:8], 16)
    return h % _CMS_W


def cms_update(counters: list[int], token: str) -> None:
    for j in range(_CMS_D):
        counters[j * _CMS_W + cms_bucket(j, token)] += 1


def cms_estimate(counters: list[int], token: str) -> int:
    """Point-query upper bound: min over the d addressed counters."""
    return min(
        counters[j * _CMS_W + cms_bucket(j, token)] for j in range(_CMS_D)
    )


_CMS_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("probe", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("cms_est", LongType(), False),
    ]
)

_CMS_STATE = StructType(
    [
        StructField("counters", ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def streaming_cms_counts(
    events: DataFrame,
    key_col: str,
    token_col: str,
    probes: list[str],
    output_mode: str = "update",
) -> DataFrame:
    """Per-key running count-min estimates for a fixed probe-token list
    (update semantics: one row per probe per touched key per batch)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        counters, n = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([0] * (_CMS_D * _CMS_W), 0)
        )
        for pdf in pdfs:
            for tok in pdf["token"]:
                if tok is None:
                    continue
                cms_update(counters, str(tok))
                n += 1
        state.update((counters, n))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "probe": probe,
                    "n_seen": n,
                    "cms_est": cms_estimate(counters, probe),
                }
                for probe in probes
            ]
        )

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(token_col).cast("string").alias("token"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=_CMS_OUTPUT,
        stateStructType=_CMS_STATE,
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Bloom filter twin (batch recipe: functions/bloom.py — m bits as 32-bit
# words, k md5-prefix hashes).  bit_or is commutative and idempotent, so
# the state after ANY micro-batch partitioning of the input equals the
# batch filter over the same rows — the equivalence test replays 3
# batches and compares word-for-word.
# ---------------------------------------------------------------------------

_BLOOM_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_seen", LongType(), False),
        StructField("bits_set", LongType(), False),
        StructField("words", ArrayType(LongType()), False),
    ]
)

_BLOOM_STATE = StructType(
    [
        StructField("words", ArrayType(LongType()), True),
        StructField("n_seen", LongType(), True),
    ]
)


def bloom_word_mask(i: int, value: str, m: int) -> tuple[int, int]:
    """(word index, mask) of hash i — nibble-identical to the Spark SQL
    ``conv(substring(md5(concat(i, ':', x)), 1, 8), 16, 10) % m`` layout
    in functions/bloom.py."""
    h = int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16) % m
    return h // 32, 1 << (h % 32)


def streaming_bloom_filter(
    events: DataFrame,
    key_col: str,
    value_col: str,
    m: int = 1024,
    k: int = 4,
    output_mode: str = "update",
) -> DataFrame:
    """Per-key running Bloom filter (one refreshed row per touched key
    per batch).  State is m/32 longs per key regardless of stream volume
    — the streaming side of a continuously-maintained join-pruning
    filter.  ``output_mode="append"`` emits the same per-batch snapshots
    append-only (each is new information — the latest per key is the one
    with the max n_seen), which is what a file sink requires; that is
    also the mode the kill-and-resume test drives, since the memory sink
    cannot recover from a checkpoint."""

    n_words = m // 32

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        words, n = (
            (list(state.get[0]), int(state.get[1]))
            if state.exists
            else ([0] * n_words, 0)
        )
        for pdf in pdfs:
            for v in pdf["value"]:
                if v is None:
                    continue
                for i in range(k):
                    w, mask = bloom_word_mask(i, str(v), m)
                    words[w] |= mask
                n += 1
        state.update((words, n))
        yield pd.DataFrame(
            [
                {
                    "key": key[0],
                    "n_seen": n,
                    "bits_set": sum(bin(w).count("1") for w in words),
                    "words": words,
                }
            ]
        )

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=_BLOOM_OUTPUT,
        stateStructType=_BLOOM_STATE,
        outputMode=output_mode,
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# Spark-4 typed-state variant of the HLL sketch
# ---------------------------------------------------------------------------


def streaming_hll_distinct_tws(
    events: DataFrame, key_col: str, value_col: str, ttl_ms: int | None = None
) -> DataFrame:
    """``streaming_hll_distinct`` on ``transformWithStateInPandas`` — the
    typed-state API the symmetric join's ``_tws`` variant uses, extended
    to the sketch family: per-key ``ValueState`` holding the m=256
    register array + exact seen-count, identical hash/register/estimator
    recipe (the registers of the TWS twin, the applyInPandasWithState
    twin, and the batch SQL query are bit-identical by construction).

    Typed-state wins carried over from join_tws.py: native
    ``ttlDurationMs`` on the state (opt-in sliding-window cardinality —
    a key idle past the TTL restarts its sketch cold, with no timer
    plumbing in user code), and schema-checked state round-trips.
    Requires Spark >= 4.0 with protobuf resolvable (compat.
    ensure_protobuf); callers on portable hosts use
    ``streaming_hll_distinct``.  Caveat shared with join_tws's TTL: the
    processing-time mode that TTL requires needs real trigger
    progression — drive it with wall-clock micro-batches (the
    join_tws TTL test's harness), not ``processAllAvailable`` drains,
    which can block on the timer machinery.
    """
    from kafka_streams_one_to_many_join_spark.streaming.join_tws import (
        HAS_TWS,
        StatefulProcessor,
    )

    if not HAS_TWS:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0 with protobuf "
            "installed; use streaming.streaming_hll_distinct instead"
        )

    ttl = ttl_ms

    class HllProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "hll", "registers array<integer>, n_seen bigint",
                ttlDurationMs=ttl,
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                regs_raw, n = self._state.get()
                regs = list(regs_raw)
            else:
                regs, n = [0] * _M, 0
            for pdf in rows:
                for v in pdf["value"]:
                    if v is None or (isinstance(v, float) and pd.isna(v)):
                        continue
                    bucket, rho = hll_register(v)
                    if rho > regs[bucket]:
                        regs[bucket] = rho
                    n += 1
            self._state.update((regs, n))
            yield pd.DataFrame(
                [{
                    "key": key[0],
                    "n_seen": n,
                    "hll_estimate": hll_estimate(regs),
                }]
            )

        def close(self) -> None:
            pass

    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return keyed.groupBy("key").transformWithStateInPandas(
        statefulProcessor=HllProcessor(),
        outputStructType=_OUTPUT,
        outputMode="update",
        timeMode="processingTime" if ttl_ms is not None else "none",
    )
