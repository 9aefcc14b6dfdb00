"""Temporal operator tests: as-of join edge semantics (inclusive equality,
no-prior-right nulls, per-key isolation) and session_window boundary
behavior (exactly-gap events start a new session)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from social_media_sentiment_analysis_spark.operators.temporal import (
    as_of_join,
    session_rollup,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts(0), "l0"), (1, ts(10), "l1"), (1, ts(20), "l2"),
         (2, ts(5), "l3"), (3, ts(9), "l4")],
        "k long, t timestamp, lval string")
    right = spark.createDataFrame(
        [(1, ts(10), "r-eq"), (1, ts(15), "r-mid"), (2, ts(6), "r-late")],
        "k long, rt timestamp, rval string")
    out = {r.lval: r.rval
           for r in as_of_join(left, right, "k", "t", "rt").collect()}
    assert out["l0"] is None          # before any right row
    assert out["l1"] == "r-eq"        # equal timestamps match (inclusive)
    assert out["l2"] == "r-mid"       # latest at-or-before wins
    assert out["l3"] is None          # right row is later than the left row
    assert out["l4"] is None          # keys don't leak across partitions


def test_asof_join_keeps_all_left_columns(spark):
    left = spark.createDataFrame([(1, ts(1), 42.5)], "k long, t timestamp, x double")
    right = spark.createDataFrame([(1, ts(0), 7)], "k long, rt timestamp, y long")
    row = as_of_join(left, right, "k", "t", "rt").collect()[0]
    assert (row.k, row.t, row.x, row.y) == (1, ts(1), 42.5, 7)


def test_session_rollup_gap_boundary(spark):
    # 0,10,20 chain; 50 (=20+30, exactly the gap) still merges — Spark joins
    # touching windows; 81 (>30 after 50) starts a new session
    events = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(10), 2.0), (1, ts(20), 3.0),
         (1, ts(50), 4.0), (1, ts(81), 6.0), (2, ts(0), 5.0)],
        "user_id long, ts timestamp, value double")
    out = session_rollup(
        events, "user_id", "ts", "30 minutes",
        [F.count(F.lit(1)).alias("n"), F.sum("value").alias("v")],
    ).orderBy("user_id", "session_start").collect()
    assert [(r.user_id, r.n, r.v) for r in out] == [
        (1, 4, 10.0), (1, 1, 6.0), (2, 1, 5.0)]
    first = out[0]
    assert first.session_start == ts(0)
    assert first.session_end == ts(80)   # last event (50) + 30-min gap


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([(1, ts(0), "a")], "k long, t timestamp, lv string")
    right = spark.createDataFrame([(1, ts(0), "b")], "k long, rt timestamp, rv string")
    plan = (
        as_of_join(left, right, "k", "t", "rt")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + one window exchange — no join operator, no second shuffle
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


class TestIntervalJoin:
    """interval_join: banded equi-join range join (operators/temporal.py)."""

    def _mk(self, spark):
        from datetime import datetime as dt
        left = spark.createDataFrame(
            [(i, 1 + (i % 2), dt(2024, 1, 1, 0, i)) for i in range(60)],
            "point_id long, k long, pts timestamp_ntz")
        right = spark.createDataFrame(
            [(100, 1, dt(2024, 1, 1, 0, 10), dt(2024, 1, 1, 0, 20)),
             (101, 1, dt(2024, 1, 1, 0, 15), dt(2024, 1, 1, 0, 25)),
             (102, 2, dt(2024, 1, 1, 0, 40), dt(2024, 1, 1, 0, 50)),
             (103, 2, dt(2024, 1, 1, 1, 30), dt(2024, 1, 1, 2, 30))],
            "iv_id long, k long, istart timestamp_ntz, iend timestamp_ntz")
        return left, right

    def test_matches_naive_theta_join(self, spark):
        from social_media_sentiment_analysis_spark.operators.temporal import (
            interval_join,
        )
        left, right = self._mk(spark)
        got = interval_join(
            left, right, left_ts="pts", right_start="istart",
            right_end="iend", keys=("k",), bucket_seconds=300)
        naive = left.join(
            right,
            (left.k == right.k) & (left.pts >= right.istart)
            & (left.pts <= right.iend)).select(left.point_id, right.iv_id)
        assert (sorted(map(tuple, got.select("point_id", "iv_id").collect()))
                == sorted(map(tuple, naive.collect())))
        # overlapping intervals produce one row per (point, interval) pair
        assert got.count() == naive.count()

    def test_bounds_inclusive_and_bucket_independent(self, spark):
        from social_media_sentiment_analysis_spark.operators.temporal import (
            interval_join,
        )
        left, right = self._mk(spark)
        expected = None
        for width in (60, 600, 7200):
            got = sorted(map(tuple, interval_join(
                left, right, left_ts="pts", right_start="istart",
                right_end="iend", keys=("k",), bucket_seconds=width)
                .select("point_id", "iv_id").collect()))
            if expected is None:
                expected = got
            assert got == expected, f"bucket_seconds={width} changed results"
        # closed bounds: minute-10 and minute-20 points both match iv 100
        pairs = set(expected)
        assert (10, 100) in pairs and (20, 100) in pairs

    def test_plans_as_equi_join_not_nested_loop(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.plans.inspect import (
            physical_plan,
        )
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )
        plan = physical_plan(QUERIES["error_impact"].builder(spark, sf_dir))
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestGapfill:
    def test_spine_is_dense_and_ffill_monotone(self, spark, sf_dir):
        from social_media_sentiment_analysis_spark.queries.registry import (
            QUERIES,
        )
        pdf = QUERIES["gapfill_hourly"].builder(spark, sf_dir).toPandas()
        per_type = pdf.groupby("event_type").size()
        assert per_type.nunique() == 1  # every type has the full spine
        # filled hours exist (sparse data at this SF) and carry a value
        gaps = pdf[pdf.n_events == 0]
        assert len(gaps) > 0
        # once a type has observed data, every later row carries a fill;
        # leading gaps (before first observation) stay null by design
        pdf = pdf.sort_values(["event_type", "hour"])
        seen = (pdf.n_events > 0).groupby(pdf.event_type).cummax()
        assert pdf.value_ffill[seen].notna().all()
        assert pdf.value_ffill[~seen].isna().all()
