"""Deterministic sampling and split assignment — hash-addressed, not rand().

`df.sample()` draws from a per-task RNG: results change with partitioning,
retries, and engine — useless for reproducible corpus curation.  These
operators key every decision on a content hash of a stable id column, so
the same row lands in the same split in every engine, every run, at every
scale (the property training pipelines need for stable train/val membership
under incremental corpus growth: adding documents never moves existing ones
across splits).

md5-based like the rest of the engine's portable hashing: the SQL oracle
reproduces decisions bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 32-bit md5 prefix of the stringified id, reduced mod 10000 → a stable
# per-row draw in [0, 10000) with 0.01% granularity
_BUCKETS = 10_000


def _hash_bucket(id_col: str) -> Column:
    return F.expr(
        f"cast(conv(substring(md5(cast({id_col} as string)), 1, 8), 16, 10) as bigint)"
        f" % {_BUCKETS}"
    )


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float
) -> DataFrame:
    """Keep ≈``fraction`` of rows, selected by id hash — stable across
    runs, partitionings, and engines."""
    return df.filter(_hash_bucket(id_col) < int(fraction * _BUCKETS))


def train_val_split(
    df: DataFrame, id_col: str, val_fraction: float = 0.1
) -> DataFrame:
    """Assign each row a stable 'train'/'val' label by id hash."""
    cut = _BUCKETS - int(val_fraction * _BUCKETS)
    return df.withColumn(
        "split",
        F.when(_hash_bucket(id_col) < cut, F.lit("train")).otherwise(F.lit("val")),
    )


def stratified_sample(
    df: DataFrame, strata_cols: list[str], id_col: str, per_stratum: int
) -> DataFrame:
    """Deterministic fixed-quota sample: up to ``per_stratum`` rows per
    stratum, chosen by id-hash order (ties broken by id for totality).

    The quota version of deterministic_sample for balanced curation
    (equal docs per language/source/label regardless of raw skew).
    Hash-ordering keeps membership stable under corpus growth *within the
    quota*: a new row displaces at most one existing member (the largest
    hash), never reshuffles the stratum.

    Scale: one shuffle on the strata columns for the rank window; skewed
    strata cost O(stratum) like any top-k-per-group — for quotas small
    enough to matter, AQE's skew split handles the hot stratum.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        _hash_bucket(id_col).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_stratum)
        .drop("_rk")
    )
