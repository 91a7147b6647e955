"""Semantic tests for gap-based event sessionization."""

from __future__ import annotations

import datetime as dt

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
