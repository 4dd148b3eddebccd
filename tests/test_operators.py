"""Unit tests for core operators on hand-built fixtures (FIXTURES.md)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streams_one_to_many_join_spark.operators import (
    arrive_leave_events,
    asof_join,
    car_moves,
    latest_by_key,
    one_to_many_join,
)
from kafka_streams_one_to_many_join_spark.operators.latest import latest_by_key_window


def test_latest_by_key_matches_window_variant(spark):
    df = spark.createDataFrame(
        [(1, 1, "a", 1.0), (2, 1, "b", 2.0), (3, 2, "c", 3.0), (4, 2, "d", 4.0),
         (5, 1, "e", 5.0)],
        "seq long, k int, v string, x double",
    )
    a = latest_by_key(df, keys="k", order_by="seq").orderBy("k").collect()
    b = (
        latest_by_key_window(df, keys="k", order_by="seq")
        .select("k", "v", "x")
        .orderBy("k")
        .collect()
    )
    assert [(r.k, r.v, r.x) for r in a] == [(r.k, r.v, r.x) for r in b]
    assert a[0].v == "e" and a[1].v == "d"


def test_latest_by_key_composite_order(spark):
    # same primary ord, tiebreak decides
    df = spark.createDataFrame(
        [(1, 1, 1, "lo"), (1, 2, 1, "hi")], "ts long, sub long, k int, v string"
    )
    out = latest_by_key(df, keys="k", order_by=["ts", "sub"]).collect()
    assert out[0].v == "hi"


def test_car_moves_first_event_null_prev(spark):
    df = spark.createDataFrame(
        [(0, 1, 100, 1.0), (1, 1, 101, 2.0), (2, 2, 100, 3.0)],
        "seq long, car_id int, to_zone_id int, fuel_level double",
    )
    moves = car_moves(df).orderBy("seq").collect()
    assert moves[0].from_zone_id is None
    assert moves[1].from_zone_id == 100 and moves[1].to_zone_id == 101
    assert moves[2].from_zone_id is None


def test_arrive_leave_same_zone_quirk(spark):
    """Same-zone re-arrival must emit arrive THEN leave for the same zone
    (reference DemoApp.scala:116-119,129 — FIXTURES.md edge case 4)."""
    df = spark.createDataFrame(
        [(0, 1, 100, 1.0), (1, 1, 100, 2.0)],
        "seq long, car_id int, to_zone_id int, fuel_level double",
    )
    out = arrive_leave_events(car_moves(df)).orderBy("seq", "emit_rank").collect()
    # event 0: arrive only; event 1: arrive + leave, both zone 100
    assert [(r.seq, r.zone_id, r.is_arriving) for r in out] == [
        (0, 100, True),
        (1, 100, True),
        (1, 100, False),
    ]


def test_one_to_many_join_inner_suppression(spark):
    cars = spark.createDataFrame([(1, 100, 1.0), (2, 999, 2.0)], "car_id int, zone_id int, fuel double")
    zones = spark.createDataFrame([(100, 50.0)], "zone_id int, pollution double")
    out = one_to_many_join(cars, zones, fk="zone_id").collect()
    assert len(out) == 1 and out[0].car_id == 1  # unknown zone suppressed


def test_one_to_many_join_left_variant(spark):
    cars = spark.createDataFrame([(1, 100, 1.0), (2, 999, 2.0)], "car_id int, zone_id int, fuel double")
    zones = spark.createDataFrame([(100, 50.0)], "zone_id int, pollution double")
    out = one_to_many_join(cars, zones, fk="zone_id", how="left").orderBy("car_id").collect()
    assert len(out) == 2 and out[1].pollution is None


def test_asof_join_strict_vs_inclusive(spark):
    left = spark.createDataFrame([(10, 1, "L")], "ord long, k int, tag string")
    right = spark.createDataFrame(
        [(5, 1, 5.0), (10, 1, 10.0), (11, 1, 11.0)], "ord long, k int, v double"
    )
    strict = asof_join(left, right, on="k", ord_col="ord", value_cols=["v"], strict=True).collect()
    incl = asof_join(left, right, on="k", ord_col="ord", value_cols=["v"], strict=False).collect()
    assert strict[0].v == 5.0  # r.ord < 10
    assert incl[0].v == 10.0  # r.ord <= 10


def test_asof_join_no_prior_row_is_null(spark):
    left = spark.createDataFrame([(1, 1, "L")], "ord long, k int, tag string")
    right = spark.createDataFrame([(5, 1, 5.0)], "ord long, k int, v double")
    out = asof_join(left, right, on="k", ord_col="ord", value_cols=["v"]).collect()
    assert out[0].v is None


def test_sessionize_gap_boundaries(spark):
    from kafka_streams_one_to_many_join_spark.operators import session_stats, sessionize

    # key 1: gaps 10, 31, 5 (gap=30 → sessions [a,b][c,d]); key 2: single event
    rows = [(1, 0), (1, 10), (1, 41), (1, 46), (2, 100)]
    df = spark.createDataFrame(rows, "user_id int, ts long")
    out = {(r.user_id, r.ts): r.session_id for r in sessionize(df, "user_id", "ts", gap=30).collect()}
    assert out[(1, 0)] == 1 and out[(1, 10)] == 1
    assert out[(1, 41)] == 2 and out[(1, 46)] == 2
    assert out[(2, 100)] == 1
    stats = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in session_stats(df, "user_id", "ts", gap=30).collect()
    }
    assert stats[(1, 1)] == (0, 10, 2)
    assert stats[(1, 2)] == (41, 46, 2)
    assert stats[(2, 1)] == (100, 100, 1)


def test_sessionize_exact_gap_is_same_session(spark):
    from kafka_streams_one_to_many_join_spark.operators import sessionize

    # gap must EXCEED the threshold to split (> not >=)
    df = spark.createDataFrame([(1, 0), (1, 30)], "user_id int, ts long")
    out = {r.ts: r.session_id for r in sessionize(df, "user_id", "ts", gap=30).collect()}
    assert out[0] == 1 and out[30] == 1


def test_salted_count_matches_plain(spark):
    from kafka_streams_one_to_many_join_spark.operators import salted_count

    rows = [(i % 3, i) for i in range(200)] + [(0, 1000 + i) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, rid long")
    got = {r.k: r.n for r in salted_count(df, ["k"], ["rid"], buckets=8).collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want


def test_salted_join_matches_plain(spark):
    from kafka_streams_one_to_many_join_spark.operators import (
        salted_one_to_many_join,
    )

    many = spark.createDataFrame(
        [(i, i % 4, float(i)) for i in range(100)], "rid long, fk int, v double"
    )
    one = spark.createDataFrame(
        [(k, k * 10.0) for k in range(3)], "fk int, dim double"  # fk=3 unmatched
    )
    got = sorted(
        tuple(r)
        for r in salted_one_to_many_join(
            many, one, fk="fk", identity_cols=["rid"], buckets=4
        ).select("rid", "fk", "v", "dim").collect()
    )
    want = sorted(
        tuple(r)
        for r in many.join(one, on="fk").select("rid", "fk", "v", "dim").collect()
    )
    assert got == want and len(got) == 75


def test_operators_on_empty_inputs(spark):
    """Empty inputs flow through every core operator without error."""
    from kafka_streams_one_to_many_join_spark.operators import (
        fanout_counts,
        one_to_many_join,
        session_stats,
    )

    cars = spark.createDataFrame([], "car_id int, zone_id int, fuel double")
    zones = spark.createDataFrame([], "zone_id int, pollution double")
    assert one_to_many_join(cars, zones, fk="zone_id").count() == 0
    assert fanout_counts(cars, "zone_id").count() == 0
    assert latest_by_key(cars, keys="car_id", order_by="zone_id").count() == 0
    ev = spark.createDataFrame([], "user_id int, ts long")
    assert session_stats(ev, "user_id", "ts", gap=10).count() == 0


def test_trace_empty_sides(spark):
    from kafka_streams_one_to_many_join_spark.operators import (
        one_to_many_join_trace,
    )

    cars = spark.createDataFrame(
        [(0, 1, 100, 1.0)], "seq long, car_id int, zone_id int, fuel_level double"
    )
    no_zones = spark.createDataFrame(
        [], "seq long, zone_id int, pollution_level double"
    )
    # no zone events: nothing can ever be emitted (inner character)
    assert one_to_many_join_trace(cars, no_zones).count() == 0
    no_cars = spark.createDataFrame(
        [], "seq long, car_id int, zone_id int, fuel_level double"
    )
    zones = spark.createDataFrame(
        [(1, 100, 5.0)], "seq long, zone_id int, pollution_level double"
    )
    assert one_to_many_join_trace(no_cars, zones).count() == 0


def test_apply_upserts_semantics(spark):
    from kafka_streams_one_to_many_join_spark.operators import apply_upserts

    snapshot = spark.createDataFrame(
        [(1, 10, 100, 1.0), (2, 5, 101, 2.0)],
        "car_id int, seq long, zone_id int, fuel double",
    )
    delta = spark.createDataFrame(
        [
            (1, 12, 102, 1.5),   # newer: replaces car1
            (2, 3, 999, 9.9),    # STALE (seq 3 < snapshot 5): ignored
            (3, 7, 103, 3.0),    # brand-new key
        ],
        "car_id int, seq long, zone_id int, fuel double",
    )
    out = {
        r.car_id: (r.seq, r.zone_id, r.fuel)
        for r in apply_upserts(
            snapshot, delta, keys="car_id", order_by="seq",
            payload=["seq", "zone_id", "fuel"],
        ).collect()
    }
    assert out == {1: (12, 102, 1.5), 2: (5, 101, 2.0), 3: (7, 103, 3.0)}


def test_sessionize_matches_python_model_randomized(spark):
    """Seeded random workload vs a pure-Python reference model."""
    import random

    from kafka_streams_one_to_many_join_spark.operators import sessionize

    rng = random.Random(7)
    rows = []
    t = 0
    for _ in range(400):
        t += rng.randint(1, 60)
        rows.append((rng.randint(1, 9), t))
    # python model: per key, sorted ts, split on gap > 25
    model = {}
    by_key = {}
    for k, ts in sorted(rows, key=lambda r: (r[0], r[1])):
        sessions = by_key.setdefault(k, [])
        if sessions and ts - sessions[-1][-1] <= 25:
            sessions[-1].append(ts)
        else:
            sessions.append([ts])
    for k, sessions in by_key.items():
        for sid, sess in enumerate(sessions, start=1):
            for ts in sess:
                model[(k, ts)] = sid
    df = spark.createDataFrame(rows, "user_id int, ts long")
    got = {
        (r.user_id, r.ts): r.session_id
        for r in sessionize(df, "user_id", "ts", gap=25).collect()
    }
    assert got == model


def test_latest_by_key_matches_python_model_randomized(spark):
    import random

    rng = random.Random(13)
    rows = [(i, rng.randint(1, 15), rng.random()) for i in range(500)]
    model = {}
    for seq, k, v in rows:  # ascending seq: later wins
        model[k] = (seq, v)
    df = spark.createDataFrame(rows, "seq long, k int, v double")
    got = {
        r.k: (r.seq, r.v)
        for r in latest_by_key(df, keys="k", order_by="seq",
                               payload=["seq", "v"]).collect()
    }
    assert got == model


def test_bucketed_interval_join_matches_naive(spark):
    """Bucketed interval join == naive range join on a seeded workload
    (open intervals, tiny bucket width to force multi-bucket replication)."""
    import random

    from kafka_streams_one_to_many_join_spark.operators import (
        bucketed_interval_join,
    )

    rng = random.Random(5)
    intervals = []
    for i in range(120):
        s = rng.randint(0, 900)
        e = None if rng.random() < 0.2 else s + rng.randint(1, 200)
        intervals.append((i, rng.randint(1, 4), s, e))
    points = [(j, rng.randint(1, 4), rng.randint(0, 1000)) for j in range(300)]
    iv = spark.createDataFrame(intervals, "iid long, k int, s long, e long")
    pt = spark.createDataFrame(points, "pid long, k int, o long")
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_interval_join(
            pt, iv, on="k", point_ord="o", start="s", end="e", bucket=64
        ).collect()
    )
    naive = sorted(
        (p[0], i[0])
        for p in points
        for i in intervals
        if p[1] == i[1] and p[2] > i[2] and (i[3] is None or p[2] < i[3])
    )
    assert got == naive and len(got) > 100

    # dynamic-width mode: the width comes from a 1-row in-plan broadcast
    # (_bw) instead of a literal — results must be identical for any
    # positive width (the width only moves work, never semantics)
    from pyspark.sql import functions as F

    for bw in (7, 131, 5000):
        width = spark.range(1).select(F.lit(bw).cast("bigint").alias("_bw"))
        got_dyn = sorted(
            (r.pid, r.iid)
            for r in bucketed_interval_join(
                pt, iv, on="k", point_ord="o", start="s", end="e", bucket=width
            ).collect()
        )
        assert got_dyn == naive, f"dynamic width {bw} diverged"

    # merged-scalar mode: the bucket frame also carries _omax (the
    # open-interval bound, here computed in the same in-plan agg the
    # caller would use) — results identical, one fewer points scan
    width_omax = pt.agg(
        F.lit(131).cast("bigint").alias("_bw"),
        F.max("o").alias("_omax"),
    )
    got_merged = sorted(
        (r.pid, r.iid)
        for r in bucketed_interval_join(
            pt, iv, on="k", point_ord="o", start="s", end="e", bucket=width_omax
        ).collect()
    )
    assert got_merged == naive, "merged _bw/_omax frame diverged"

    # conflicting bound channels must raise, not silently prefer _omax
    import pytest

    with pytest.raises(ValueError, match="_omax"):
        bucketed_interval_join(
            pt, iv, on="k", point_ord="o", start="s", end="e",
            bucket=width_omax, end_open_max=F.lit(1000),
        )
