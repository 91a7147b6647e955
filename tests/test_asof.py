"""As-of join: semantics (inclusive/strict/tolerance/null handling),
deterministic tie-breaks, and the single-shuffle plan contract."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.dataops import asof


def _ts(s: str):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:05")),
            (2, 10, _ts("2024-01-01T00:00:30")),
            (3, 20, _ts("2024-01-01T00:00:10")),
            (4, 30, _ts("2024-01-01T00:00:10")),  # user with no right rows
            (5, None, _ts("2024-01-01T00:00:10")),  # null key
            (6, 10, None),  # null ts
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:00:05"), 1.0),  # tie with left #1
            (101, 10, _ts("2024-01-01T00:00:20"), 2.0),
            (102, 20, _ts("2024-01-01T00:00:11"), 3.0),  # after left #3
            (103, None, _ts("2024-01-01T00:00:01"), 4.0),  # null key dropped
            (104, 10, None, 5.0),  # null ts dropped
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    return left, right


def _run(left, right, **kw):
    out = asof.asof_join(
        left, right, on="user_id", ts_col="ts",
        right_cols=["event_id", "value"], prefix="r_", **kw
    )
    return {r["event_id"]: r for r in out.collect()}


class TestAsofSemantics:
    def test_inclusive_matches_and_misses(self, frames):
        left, right = frames
        m = _run(left, right)
        assert len(m) == 6  # every left row survives
        assert m[1]["r_event_id"] == 100  # tie: l.ts >= r.ts inclusive
        assert m[2]["r_event_id"] == 101 and m[2]["r_value"] == 2.0
        assert m[3]["r_event_id"] is None  # right row is later
        assert m[4]["r_event_id"] is None  # no rows for key
        assert m[5]["r_event_id"] is None  # null key never matches
        assert m[6]["r_event_id"] is None  # null ts never matches

    def test_strict_excludes_equal_ts(self, frames):
        left, right = frames
        m = _run(left, right, strict=True)
        assert m[1]["r_event_id"] is None  # equal ts no longer matches
        assert m[2]["r_event_id"] == 101  # strictly-earlier still does

    def test_tolerance_window(self, frames):
        left, right = frames
        m = _run(left, right, tolerance_seconds=5)
        assert m[1]["r_event_id"] == 100  # 0s old: inside
        assert m[2]["r_event_id"] is None  # 10s old: outside
        m2 = _run(left, right, tolerance_seconds=15)
        assert m2[2]["r_event_id"] == 101

    def test_tie_between_right_rows_is_greatest_payload(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts("2024-01-01T00:00:10"))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [
                (7, 10, _ts("2024-01-01T00:00:10"), 1.0),
                (9, 10, _ts("2024-01-01T00:00:10"), 2.0),
                (8, 10, _ts("2024-01-01T00:00:10"), 3.0),
            ],
            "event_id long, user_id long, ts timestamp, value double",
        )
        m = _run(left, right)
        assert m[1]["r_event_id"] == 9  # max of right_cols[0] wins

    def test_carries_forward_across_many_lefts(self, spark):
        left = spark.createDataFrame(
            [(i, 1, _ts(f"2024-01-01T00:00:{i:02d}")) for i in range(2, 50, 3)],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(100, 1, _ts("2024-01-01T00:00:03"), 1.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        m = _run(left, right)
        assert m[2]["r_event_id"] is None
        assert all(m[i]["r_event_id"] == 100 for i in range(5, 50, 3))


class TestAsofPlan:
    def test_single_exchange(self, frames):
        left, right = frames
        out = asof.asof_join(
            left, right, on="user_id", ts_col="ts", right_cols=["event_id"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # ONE hash-partitioned exchange: both sides union into a single
        # keyed window — no join node, no second shuffle
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan

    def test_left_columns_preserved(self, frames):
        left, right = frames
        out = asof.asof_join(
            left, right, on="user_id", ts_col="ts", right_cols=["value"]
        )
        assert out.columns == ["event_id", "user_id", "ts", "asof_ts", "asof_value"]


class TestAsofBucketed:
    """bucket_seconds: the skew-safe (key, bucket) + seed-row plan
    must return IDENTICAL results to the unbucketed join."""

    def test_all_semantics_match_unbucketed(self, frames):
        left, right = frames
        for kw in ({}, {"strict": True}, {"tolerance_seconds": 5}):
            plain = _run(left, right, **kw)
            bucketed = _run(left, right, bucket_seconds=10, **kw)
            assert plain.keys() == bucketed.keys()
            for k in plain:
                assert tuple(plain[k]) == tuple(bucketed[k]), (k, kw)

    def test_parity_on_randomized_stream(self, spark):
        # 40 keys x dense event stream, bucket = 1 minute; matches must
        # carry across many empty and non-empty bucket boundaries
        left = spark.range(2000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 40).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 37) % 7200
            ).alias("ts"),
        )
        right = spark.range(300).select(
            (F.col("id") + 10_000).alias("event_id"),
            (F.col("id") % 17).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 211) % 7200
            ).alias("ts"),
            (F.col("id") % 7).cast("double").alias("value"),
        )
        a = sorted(tuple(r) for r in asof.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols=["event_id", "value"],
        ).collect())
        b = sorted(tuple(r) for r in asof.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols=["event_id", "value"], bucket_seconds=60,
        ).collect())
        assert a == b

    def test_hot_key_spreads_over_buckets(self, spark):
        # ONE user at 100x the median volume: the unbucketed plan would
        # sort all its rows in one task; bucketed, every (key, bucket)
        # window partition holds at most one day of that key
        hot = spark.range(10_000).select(
            F.col("id").alias("event_id"),
            F.lit(777).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 864  # spread over ~100 days
            ).alias("ts"),
        )
        cold = spark.range(100).select(
            (F.col("id") + 50_000).alias("event_id"),
            (F.col("id") % 10).alias("user_id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        )
        left = hot.unionByName(cold)
        right = spark.range(50).select(
            (F.col("id") + 90_000).alias("event_id"),
            F.when(F.col("id") % 2 == 0, 777).otherwise(F.col("id") % 10)
            .cast("long").alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + F.col("id") * 100_000
            ).alias("ts"),
            F.lit(1.0).alias("value"),
        )
        a = sorted(tuple(r) for r in asof.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols=["event_id", "value"],
        ).collect())
        b = sorted(tuple(r) for r in asof.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols=["event_id", "value"], bucket_seconds=86_400,
        ).collect())
        assert a == b
        # plan: the event-stream window partitions on (key, bucket)
        out = asof.asof_join(
            left, right, on="user_id", ts_col="ts",
            right_cols=["event_id"], bucket_seconds=86_400,
        )
        import re

        plan = out._jdf.queryExecution().executedPlan().toString()
        # the event-stream window's partition spec is [__k__, __b__]
        assert re.search(
            r"windowspecdefinition\(__k__#\d+L?, __b__#\d+L?, __ts__", plan
        ), plan
