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


def test_bench_calib_low_is_burst_and_mode_robust():
    """The healthy baseline must ignore both the lucky-fast-mode MIN and
    burst-inflated tails (the host's probe is bimodal: SCALE.md
    'Pointer-jump variants' round; bench.py _calib_low docstring)."""
    import bench

    assert bench._calib_low([]) is None
    assert bench._calib_low([0.12]) == 0.12  # n<4: min
    # bimodal history: quartile lands in/near the fast mode but one
    # outlier no longer pins the baseline
    hist = [0.075, 0.076, 0.081, 0.115, 0.116, 0.117, 0.117, 0.12]
    assert bench._calib_low(hist) == 0.081
    # a single freak-fast probe doesn't own the baseline
    assert bench._calib_low([0.04, 0.115, 0.116, 0.117]) == 0.115


def test_bench_bounded_line_keeps_the_audit_rows():
    """The driver records only ~2000 stdout bytes; whatever is trimmed,
    the slow-side deltas and their adjudication — the rows a reviewer
    audits — must survive, and the line must parse as ONE JSON doc."""
    import json

    import bench

    names = sorted(entrymod.queries())
    out = {
        "metric": "total_suite_seconds",
        "value": 99.9,
        "unit": "sec",
        "queries": {n: 1.234 for n in names},
        "sf": 0.1,
        "deltas_vs_prior": {
            n: (2.5 if i < 4 else 0.4) for i, n in enumerate(names)
        },
        "delta_adjudication": {
            n: "confirmed-clean-window" for n in names[:4]
        },
        "retry_status": {
            n: {"reasons": ["delta"], "outcome": "clean-window"}
            for n in names[:12]
        },
        "canary": {n: {"recorded": 2.0, "canary": 1.9, "ratio": 0.95} for n in names[:5]},
    }
    line = bench._bounded_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    slow = {n for n, d in out["deltas_vs_prior"].items() if d > 1.5}
    assert set(parsed["deltas_vs_prior"]) == slow
    assert parsed["delta_adjudication"] == out["delta_adjudication"]
    assert parsed["deltas_fast_omitted"] == len(names) - len(slow)
    assert parsed["queries_omitted"] + len(parsed["queries"]) == len(names)


def test_bench_prior_map_upgrades_to_full_fidelity():
    """With BENCH_FULL_r11.json archived next to BENCH_r11.json, the
    prior map seen by the delta trigger must cover the WHOLE roster,
    not the recorded stdout prefix — and agree with the artifact on the
    rows both carry."""
    import json
    import os

    import bench

    prior = bench._prior_round_timings()
    assert prior is not None
    fname, q, sf = prior
    here = os.path.dirname(os.path.abspath(bench.__file__))
    with open(os.path.join(here, fname)) as f:
        parsed = json.load(f)["parsed"]
    assert sf == parsed["sf"]
    # every recorded row survives verbatim; the archive fills the rest
    for n, t in parsed["queries"].items():
        assert q[n] == t
    assert len(q) >= len(parsed["queries"])
    if os.path.exists(os.path.join(here, f"BENCH_FULL_{fname.split('.')[0].split('_')[-1]}.json")):
        assert len(q) == len(entrymod.queries())


def test_bench_bounded_line_survives_a_uniformly_slow_day():
    """Worst case for the stdout tail: every roster query reads >2x slow
    and unadjudicated (a whole-run burst).  The line must still fit the
    driver's ~2000-byte tail AND parse — keeping the WORST slow deltas
    with their verdicts and counting the shed ones — instead of
    overflowing into the parsed:{} failure the bound exists to prevent."""
    import json

    import bench

    names = sorted(entrymod.queries())
    out = {
        "metric": "total_suite_seconds",
        "value": 300.0,
        "unit": "sec",
        "queries": {n: 3.0 for n in names},
        "sf": 0.1,
        "deltas_vs_prior": {n: 2.5 for n in names},
        "delta_adjudication": {
            n: "unadjudicated:window-never-healthy" for n in names
        },
        "retry_status": {
            n: {"reasons": ["delta"], "outcome": "window-never-healthy"}
            for n in names
        },
        "burst_retried": {n: [5.0, 3.0] for n in names},
        "unstable_spread": {n: 2.2 for n in names},
        "canary": {
            n: {"recorded": 3.0, "status": "window-bursty"}
            for n in names[:5]
        },
    }
    line = bench._bounded_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line[-2000:])  # the driver-tail contract itself
    assert parsed["deltas_vs_prior"]  # the audit rows survive trimming
    assert parsed["delta_adjudication"]
    assert (
        len(parsed["deltas_vs_prior"]) + parsed["deltas_slow_omitted"]
        == len(names)
    )


def test_bench_regime_stamp_three_way():
    """VERDICT r12 item 4: a run whose probes are internally consistent
    but uniformly above the calibration quartile must stamp
    'clean-relative' with an explanatory note — not a bare 'clean' that
    reads oddly against an elevated regime_ratio, and not 'slow' (the
    within-run machinery is fully trustworthy)."""
    import bench

    # healthy on both axes
    assert bench._regime_stamp(1.05, 1.0, 1.1) == ("clean", None)
    # the BENCH_r12 case: ratio 1.351, internally consistent
    regime, note = bench._regime_stamp(1.351, 1.0, 1.08)
    assert regime == "clean-relative"
    assert "1.351" in note and "calibration" in note
    # elevated past the 1.5 gate but still internally consistent:
    # clean-relative per the VERDICT's literal prescription
    regime, note = bench._regime_stamp(1.8, 1.0, 1.1)
    assert regime == "clean-relative"
    # elevated AND internally inconsistent (bursts hit the run): slow
    assert bench._regime_stamp(1.8, 1.0, 1.6) == ("slow", None)
    # day-level multicore regime: slow regardless of spin axis
    assert bench._regime_stamp(1.0, 1.6, 1.0) == ("slow", None)
    # mildly elevated but bursty run under the 1.5 gate: clean (the
    # pre-r13 behavior — per-query retries handle the bursts)
    assert bench._regime_stamp(1.3, 1.0, 1.5) == ("clean", None)


def test_bench_bounded_line_drops_empty_slow_deltas():
    """When every delta is fast-side, the trimmed line must drop the
    deltas_vs_prior key entirely (an empty {} reads as 'no deltas
    computed') while deltas_fast_omitted carries the signal."""
    import json

    import bench

    names = sorted(entrymod.queries())
    out = {
        "metric": "total_suite_seconds",
        "value": 50.0,
        "unit": "sec",
        "queries": {n: 0.5 for n in names},
        "sf": 0.1,
        "deltas_vs_prior": {n: 0.4 for n in names},
    }
    line = bench._bounded_line(out)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert "deltas_vs_prior" not in parsed
    assert parsed["deltas_fast_omitted"] == len(names)


def test_bench_calibration_only_appends_from_clean_runs(tmp_path, monkeypatch):
    """r12 ADVICE: an extended slow-CPU-mode streak must not ratchet the
    calibration quartile upward — only clean-stamped runs contribute."""
    import json

    import bench

    path = tmp_path / "calib.json"
    path.write_text(json.dumps({"healthy_spin_2m": [0.08], "healthy_parallel": [1.0]}))
    monkeypatch.setattr(bench, "_CALIB_PATH", str(path))
    bench._save_calibration(0.2, 2.0, regime="slow")
    bench._save_calibration(0.15, 1.8, regime="clean-relative")
    assert json.loads(path.read_text())["healthy_spin_2m"] == [0.08]
    bench._save_calibration(0.081, 1.05, regime="clean")
    saved = json.loads(path.read_text())
    assert saved["healthy_spin_2m"] == [0.08, 0.081]
    assert saved["healthy_parallel"] == [1.0, 1.05]


def test_bench_canary_watchlist_is_on_the_roster():
    """The r13 watchlist entries must name real roster queries, or the
    canary loop would silently skip them."""
    import bench

    assert set(bench.CANARY_WATCHLIST) <= set(entrymod.queries())


def test_bench_delta_notes_stamp_declared_consolidations():
    """VERDICT r13 item 6: a >1.5x deltas_vs_prior row that is the
    declared cost of a roster consolidation carries a one-line
    delta_notes stamp; undeclared rows and sub-threshold declared rows
    stay bare, and the note survives _bounded_line trimming."""
    import json

    import bench

    declared = next(iter(bench.DECLARED_DELTAS))
    deltas = {declared: 1.7, "pareto_customers": 1.6, "minhash_lsh": 0.4}
    assert "pareto_customers" not in bench.DECLARED_DELTAS
    notes = bench._delta_notes(deltas)
    assert set(notes) == {declared}
    assert "consolidation" in notes[declared]
    # below the reporting bar: no note even though declared
    assert bench._delta_notes({declared: 1.4}) == {}
    out = {
        "metric": "total_suite_seconds",
        "value": 50.0,
        "unit": "sec",
        "queries": {n: 0.5 for n in sorted(entrymod.queries())},
        "sf": 0.1,
        "deltas_vs_prior": deltas,
        "delta_notes": notes,
    }
    line = bench._bounded_line(out)
    parsed = json.loads(line[-2000:])
    assert parsed["delta_notes"] == notes


def test_canary_escalation_trigger():
    """r16 (VERDICT r15 item 5): >= 2 canaries at <= 0.7x — each above
    the 0.5x single-row bar — trigger the full re-measure; one alone
    does not; already-handled rows (superseded / window-bursty /
    discarded) never re-qualify."""
    import bench

    # the exact BENCH_r15 shape: 0.56x and 0.67x on the two slowest rows
    c = {
        "dedup_canonical": {"recorded": 3.88, "canary": 2.16, "ratio": 0.56},
        "segment_dedup_maintained": {"recorded": 6.81, "canary": 4.53, "ratio": 0.67},
        "ann_recall": {"recorded": 4.35, "canary": 4.28, "ratio": 0.98},
    }
    assert bench._canaries_to_escalate(c) == [
        "dedup_canonical",
        "segment_dedup_maintained",
    ]
    # a single low canary is expected spread, not a collective signal
    assert bench._canaries_to_escalate(
        {"a": {"ratio": 0.6}, "b": {"ratio": 1.0}}
    ) == []
    # rows already superseded by the 0.5x trigger, window-bursty rows
    # (no ratio), and discarded re-measures don't count or re-qualify
    assert bench._canaries_to_escalate(
        {
            "a": {"ratio": 0.45, "superseded_to": 1.0},
            "b": {"ratio": 0.65},
            "c": {"recorded": 2.0, "status": "window-bursty"},
            "d": {"ratio": 0.6, "status": "supersede-window-bursty"},
        }
    ) == []
    # boundary: exactly 0.7 qualifies, 0.71 does not
    assert bench._canaries_to_escalate(
        {"a": {"ratio": 0.7}, "b": {"ratio": 0.7}, "c": {"ratio": 0.71}}
    ) == ["a", "b"]
