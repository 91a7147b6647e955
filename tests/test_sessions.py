"""Semantic tests for gap-based event sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ilogtail_spark.dataops import sessions


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)) for i, u, s in rows],
        "event_id long, user_id long, ts timestamp",
    )


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        df = _ev(
            spark,
            [
                (1, 7, 0),
                (2, 7, 100),        # same session (gap 100 <= 600)
                (3, 7, 800),        # new session (gap 700 > 600)
                (4, 7, 900),
                (5, 8, 50),         # other user: own numbering
            ],
        )
        out = {
            r["event_id"]: r
            for r in sessions.sessionize(df, gap_seconds=600, order_col="event_id").collect()
        }
        assert [out[i]["session_ordinal"] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
        assert out[5]["session_ordinal"] == 1
        assert out[3]["session_id"] == "7:2"

    def test_exact_gap_does_not_split(self, spark):
        df = _ev(spark, [(1, 1, 0), (2, 1, 600)])
        out = sessions.sessionize(df, gap_seconds=600).collect()
        assert {r["session_ordinal"] for r in out} == {1}

    def test_tie_break_on_order_col(self, spark):
        # two events with identical ts: ordering must be by event_id
        df = _ev(spark, [(2, 1, 0), (1, 1, 0), (3, 1, 10000)])
        out = {
            r["event_id"]: r["session_ordinal"]
            for r in sessions.sessionize(df, gap_seconds=600, order_col="event_id").collect()
        }
        assert out == {1: 1, 2: 1, 3: 2}

    def test_session_stats(self, spark):
        df = _ev(spark, [(1, 7, 0), (2, 7, 100), (3, 7, 800), (4, 8, 0)])
        out = {
            (r["user_id"], r["session_ordinal"]): r
            for r in sessions.session_stats(df, gap_seconds=600, order_col="event_id").collect()
        }
        assert out[(7, 1)]["n_events"] == 2
        assert out[(7, 1)]["duration_sec"] == 100
        assert out[(7, 2)]["n_events"] == 1
        assert out[(7, 2)]["duration_sec"] == 0
        assert out[(8, 1)]["n_events"] == 1

    def test_single_exchange_in_plan(self, spark):
        df = _ev(spark, [(1, 7, 0), (2, 7, 100)])
        plan = sessions.session_stats(
            df, gap_seconds=600, order_col="event_id"
        )._jdf.queryExecution().executedPlan().toString()
        # sessionize windows + the per-session aggregate must share ONE
        # hash-partitioning on user_id (no second shuffle for groupBy)
        assert plan.count("Exchange hashpartitioning") == 1


class TestReviewRegressions:
    def test_null_ts_events_get_null_session(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [
                (1, 7, dt.datetime(2024, 1, 1, 0, 0, 0)),
                (2, 7, None),
                (3, 7, dt.datetime(2024, 1, 1, 0, 0, 1)),
            ],
            "event_id long, user_id long, ts timestamp",
        )
        out = {
            r["event_id"]: r
            for r in sessions.sessionize(df, gap_seconds=600, order_col="event_id").collect()
        }
        assert len(out) == 3
        assert out[2]["session_ordinal"] is None and out[2]["session_id"] is None
        # real sessions keep their numbering, unshifted
        assert out[1]["session_ordinal"] == 1 and out[3]["session_ordinal"] == 1
        stats = sessions.session_stats(df, gap_seconds=600, order_col="event_id").collect()
        assert len(stats) == 1 and stats[0]["n_events"] == 2

    def test_subsecond_gap_is_exact(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [
                (1, 7, base + dt.timedelta(microseconds=100_000)),
                # real gap = 600.8 s > 600 -> MUST split (floored-second
                # arithmetic would compute 600 and merge them)
                (2, 7, base + dt.timedelta(seconds=600, microseconds=900_000)),
            ],
            "event_id long, user_id long, ts timestamp",
        )
        out = sessions.sessionize(df, gap_seconds=600, order_col="event_id").collect()
        assert {r["session_ordinal"] for r in out} == {1, 2}


class TestSessionizeBounded:
    def test_splits_at_bucket_boundary(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 23, 59, 0)
        df = spark.createDataFrame(
            [
                (1, 7, base),
                # 2 min later but past UTC midnight -> new day, new session
                (2, 7, base + dt.timedelta(minutes=2)),
                (3, 7, base + dt.timedelta(minutes=4)),
            ],
            "event_id long, user_id long, ts timestamp",
        )
        out = {
            r["event_id"]: r
            for r in sessions.sessionize_bounded(
                df, gap_seconds=1800, order_col="event_id"
            ).collect()
        }
        assert out[1]["session_ordinal"] == 1
        assert out[2]["session_bucket"] == out[1]["session_bucket"] + 1
        assert out[2]["session_ordinal"] == 1  # numbering restarts per day
        assert out[3]["session_ordinal"] == 1  # same session as #2
        assert out[2]["session_id"] == out[3]["session_id"]
        assert out[1]["session_id"] != out[2]["session_id"]

    def test_matches_unbounded_within_one_bucket(self, spark):
        # when no stream crosses a boundary, per-bucket ordinals equal
        # the unbounded form's
        df = spark.range(300).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 997) % 80000
            ).alias("ts"),
        )
        plain = {
            r["event_id"]: r["session_ordinal"]
            for r in sessions.sessionize(
                df, gap_seconds=120, order_col="event_id"
            ).collect()
        }
        bounded = {
            r["event_id"]: r["session_ordinal"]
            for r in sessions.sessionize_bounded(
                df, gap_seconds=120, order_col="event_id",
                bound_seconds=100_000,  # all events in ONE bucket
            ).collect()
        }
        assert plain == bounded

    def test_hot_user_100x_median(self, spark):
        # one user with 100x the median event volume spread over ~50
        # days: the bounded form partitions on (user, day) so the hot
        # key spreads across tasks, and NULL-ts rows stay NULL
        hot = spark.range(10_000).select(
            F.col("id").alias("event_id"),
            F.lit(42).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 432
            ).alias("ts"),
        )
        cold = spark.range(100).select(
            (F.col("id") + 100_000).alias("event_id"),
            (F.col("id") % 10 + 100).alias("user_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        )
        df = hot.unionByName(cold)
        out = sessions.sessionize_bounded(df, gap_seconds=600, order_col="event_id")
        rows = out.where(F.col("user_id") == 42).collect()
        assert len(rows) == 10_000
        # 432 s gap < 600 -> one session per day for the hot user;
        # 86400/432 = 200 events/day => 50 buckets, ordinal always 1
        assert {r["session_ordinal"] for r in rows} == {1}
        assert len({r["session_bucket"] for r in rows}) == 51  # spans 51 UTC days
        # plan: the window partitions on (user, bucket)
        import re

        plan = out._jdf.queryExecution().executedPlan().toString()
        assert re.search(
            r"windowspecdefinition\(user_id#\d+L?, session_bucket#\d+L?", plan
        ), plan
