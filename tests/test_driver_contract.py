"""Driver-contract regression tests: everything in __spark_entry__ must work
against a SparkSession the repo did NOT build.

Round-1 lesson: ``get_session`` set spark.sql.legacy.parquet.nanosAsLong, but
the driver builds a vanilla SparkSession — events.parquet (INT64
TIMESTAMP(NANOS)) then failed with PARQUET_TYPE_ILLEGAL and took down 19
queries.  These tests unset that conf before every call, so they pass only if
``load_table`` itself makes any session able to read every table.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from kafka_streams_one_to_many_join_spark.model import TESTDATA_TABLES, load_table

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _make_vanilla(spark):
    """Simulate the driver's fresh session: strip the repo-set legacy conf."""
    try:
        spark.conf.unset(_NANOS_CONF)
    except Exception:
        pass
    return spark


def test_entry_runs_on_vanilla_session(spark):
    df = entrymod.entry(_make_vanilla(spark))
    rows = df.limit(5).collect()
    assert df.columns == ["car_id", "zone_id", "fuel_level", "pollution_level"]
    assert len(rows) >= 0


def test_every_table_loads_on_vanilla_session(spark, sf_dir):
    vanilla = _make_vanilla(spark)
    for t in TESTDATA_TABLES:
        _make_vanilla(vanilla)
        df = load_table(vanilla, sf_dir, t)
        assert df.count() > 0, t


def test_events_query_on_vanilla_session(spark, sf_dir):
    """An events-table query — the exact class that failed in round 1."""
    q = entrymod.queries()["latest_by_key"]
    df = q(_make_vanilla(spark), sf_dir)
    assert df.count() > 0


def test_queries_and_oracles_align():
    """Every oracle key must name a declared query; callables are callable."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", list(entrymod.queries()))
def test_each_query_builds_plan_on_vanilla_session(spark, sf_dir, name):
    """Plan construction (analysis) must succeed in a vanilla session for
    EVERY declared query — catches loader/conf coupling without paying
    execution cost for all 63."""
    fn = entrymod.queries()[name]
    df = fn(_make_vanilla(spark), sf_dir)
    df.schema  # forces analysis


def test_bench_roster_matches_declared_queries():
    """bench.py must run EXACTLY the declared queries: a stale curated
    name would KeyError the whole benchmark run (the r07 consolidation
    removed 10 names the curated list still carried), and a missing one
    would silently under-report the suite."""
    import bench

    qs = set(entrymod.queries())
    assert set(bench.BENCH_QUERIES) == qs
    assert len(bench.BENCH_QUERIES) == len(qs)  # no duplicates


def test_roster_pinned_at_one_hundred():
    """The rotation contract (see queries()' header comment): the roster
    stays at EXACTLY 100 so the driver's 50-row correctness cap covers
    everything in a 2-round window.  Additions must be paid for by
    consolidation — this test is the tripwire."""
    assert len(entrymod.queries()) == 100
    assert len(entrymod.oracle_sql()) == 100
