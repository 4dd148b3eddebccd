"""The local mirror of the driver's t2 correctness gate: every queries()
entry with an oracle_sql() entry must match DuckDB on row count, column
names, and (order-insensitive) values.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = str(pdf[c].dtype)
        if dt.startswith(("uint", "int", "Int", "UInt")):
            pdf[c] = pdf[c].astype("float64")  # unify int widths; NaN-safe
        elif dt.startswith("float", 0) or dt.startswith("Float"):
            pdf[c] = pdf[c].astype("float64")
        elif dt.startswith("datetime"):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        elif dt == "bool" or dt.startswith("boolean"):
            pdf[c] = pdf[c].astype("bool")
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def test_all_queries_have_oracles():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be absent, but today every query has one
    assert not missing, f"queries without oracle SQL: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(name, spark, duck, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = duck.execute(ORACLES[name]).fetchdf()
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        raise AssertionError(f"{name}: value mismatch\n{e}") from None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"car_id", "zone_id", "fuel_level", "pollution_level"}


def _finite(x: float) -> bool:
    return x is not None and not math.isnan(x) and not math.isinf(x)
