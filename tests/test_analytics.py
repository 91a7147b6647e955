"""grouped_quantiles (exact nearest-rank percentiles) and rrf_fuse
(reciprocal-rank fusion) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.dataops import analytics, retrieval


class TestGroupedQuantiles:
    def test_exact_nearest_rank_with_ties(self, spark):
        # group "a": sorted values [1, 2, 2, 3, 10] (n=5)
        #   p50 -> k=ceil(2.5)=3 -> 2;  p90 -> k=ceil(4.5)=5 -> 10
        # group "b": [7] -> every quantile is 7
        rows = [("a", 2.0), ("a", 1.0), ("a", 10.0), ("a", 2.0), ("a", 3.0),
                ("b", 7.0)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {
            (r["g"], r["q_micro"]): (r["n"], r["q_value"])
            for r in analytics.grouped_quantiles(
                df, "g", "value", (500_000, 900_000)
            ).collect()
        }
        assert out[("a", 500_000)] == (5, 2.0)
        assert out[("a", 900_000)] == (5, 10.0)
        assert out[("b", 500_000)] == (1, 7.0)
        assert out[("b", 900_000)] == (1, 7.0)

    def test_extremes_and_null_exclusion(self, spark):
        rows = [("a", 5.0), ("a", None), ("a", 1.0), ("c", None)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {
            (r["g"], r["q_micro"]): r["q_value"]
            for r in analytics.grouped_quantiles(
                df, "g", "value", (0, 1_000_000)
            ).collect()
        }
        # q=0 clamps k to 1 (the minimum); q=1e6 is the maximum;
        # NULLs drop out of n; all-NULL group "c" disappears
        assert out == {("a", 0): 1.0, ("a", 1_000_000): 5.0}

    def test_bad_args(self, spark):
        df = spark.createDataFrame([("a", 1.0)], "g string, value double")
        with pytest.raises(ValueError, match="non-empty"):
            analytics.grouped_quantiles(df, "g", "value", ())
        with pytest.raises(ValueError, match="micro"):
            analytics.grouped_quantiles(df, "g", "value", (2_000_000,))

    def test_every_requested_quantile_present_per_group(self, spark):
        rows = [("g%d" % (i % 3), float(i)) for i in range(100)]
        df = spark.createDataFrame(rows, "g string, value double")
        qs = (250_000, 500_000, 750_000, 990_000)
        out = analytics.grouped_quantiles(df, "g", "value", qs)
        counts = {
            r["g"]: r["cnt"]
            for r in out.groupBy("g").agg(F.count("*").alias("cnt")).collect()
        }
        assert counts == {"g0": len(qs), "g1": len(qs), "g2": len(qs)}


class TestRrfFuse:
    def test_hand_computed_fusion(self, spark):
        lex = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
            "query_id long, doc_id long, rank int",
        )
        vec = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
            "query_id long, doc_id long, rank int",
        )
        out = {
            r["doc_id"]: r
            for r in retrieval.rrf_fuse([lex, vec], k=4).collect()
        }
        nano = lambda r: 10**9 // (60 + r)  # noqa: E731
        assert out[11]["rrf_nano"] == nano(2) + nano(1)
        assert out[10]["rrf_nano"] == nano(1) + nano(3)
        assert out[11]["rank"] == 1 and out[10]["rank"] == 2
        assert out[12]["n_lists"] == 1 and out[11]["n_lists"] == 2
        assert out[11]["best_rank"] == 1 and out[13]["best_rank"] == 2

    def test_tie_breaks_to_lower_doc_id(self, spark):
        a = spark.createDataFrame(
            [(1, 20, 1), (1, 21, 2)], "query_id long, doc_id long, rank int"
        )
        b = spark.createDataFrame(
            [(1, 21, 1), (1, 20, 2)], "query_id long, doc_id long, rank int"
        )
        out = retrieval.rrf_fuse([a, b], k=2).collect()
        ranks = {r["doc_id"]: r["rank"] for r in out}
        assert ranks == {20: 1, 21: 2}

    def test_empty_rankings_rejected(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            retrieval.rrf_fuse([])


class TestFunnelReport:
    def test_strict_order_and_conversion(self, spark):
        rows = [
            # u1 completes in order
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:01:00"),
            (1, "purchase", "2024-01-01 10:02:00"),
            # u2: click BEFORE view -> must not count past step 1
            (2, "click", "2024-01-01 09:00:00"),
            (2, "view", "2024-01-01 10:00:00"),
            # u3: view + click only
            (3, "view", "2024-01-01 08:00:00"),
            (3, "click", "2024-01-01 08:30:00"),
            # u4: never viewed -> not in funnel at all
            (4, "purchase", "2024-01-01 07:00:00"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r["step_idx"]: r
            for r in analytics.funnel_report(
                df, ["view", "click", "purchase"]
            ).collect()
        }
        assert out[1]["n_users"] == 3 and out[1]["conversion_micro"] == 1_000_000
        assert out[2]["n_users"] == 2  # u1, u3 (u2's click precedes view)
        assert out[2]["conversion_micro"] == 666_666
        assert out[3]["n_users"] == 1 and out[3]["conversion_micro"] == 333_333
        assert out[3]["step"] == "purchase"

    def test_equal_timestamps_do_not_advance(self, spark):
        df = spark.createDataFrame(
            [(1, "view", "2024-01-01 10:00:00"),
             (1, "click", "2024-01-01 10:00:00")],
            "user_id long, event_type string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r["step_idx"]: r["n_users"]
            for r in analytics.funnel_report(df, ["view", "click"]).collect()
        }
        assert out == {1: 1, 2: 0}  # strict >

    def test_bad_args(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "2024-01-01")], "user_id long, event_type string, ts string"
        )
        with pytest.raises(ValueError, match="at least 2"):
            analytics.funnel_report(df, ["a"])
        with pytest.raises(ValueError, match="distinct"):
            analytics.funnel_report(df, ["a", "a"])


class TestCohortRetention:
    def test_weekly_cells(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00"),  # week of Jan 1 (Mon)
            (1, "2024-01-09 10:00:00"),  # week of Jan 8 -> offset 1
            (2, "2024-01-02 10:00:00"),  # same cohort, never returns
            (3, "2024-01-10 10:00:00"),  # cohort Jan 8
        ]
        df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {
            (str(r["cohort"]), r["offset"]): (r["n_users"], r["retention_micro"])
            for r in analytics.cohort_retention(df, period="week").collect()
        }
        assert out[("2024-01-01", 0)] == (2, 1_000_000)
        assert out[("2024-01-01", 1)] == (1, 500_000)
        assert out[("2024-01-08", 0)] == (1, 1_000_000)
        assert len(out) == 3

    def test_daily_and_null_ts(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 01:00:00"), (1, "2024-01-03 01:00:00"),
             (2, None)],
            "user_id long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            r["offset"]: r["n_users"]
            for r in analytics.cohort_retention(df, period="day").collect()
        }
        assert out == {0: 1, 2: 1}

    def test_bad_period(self, spark):
        df = spark.createDataFrame([(1, None)], "user_id long, ts timestamp")
        with pytest.raises(ValueError, match="period"):
            analytics.cohort_retention(df, period="month")


class TestRateSpikes:
    def test_spike_detection_and_cold_start(self, spark):
        # steady 10/hour for 5 hours, then 100 in hour 6
        rows = []
        eid = 0
        for h in range(5):
            for _ in range(10):
                rows.append((eid, "err", f"2024-01-01 0{h}:30:00")); eid += 1
        for _ in range(100):
            rows.append((eid, "err", "2024-01-01 05:30:00")); eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            str(r["bucket_ts"]): r
            for r in analytics.rate_spikes(df, min_trailing=3).collect()
        }
        assert len(out) == 6
        # hours 0-2: cold start (trailing_n < 3) -> never spike
        assert not out["2024-01-01 00:00:00"]["is_spike"]
        assert not out["2024-01-01 02:00:00"]["is_spike"]
        # hour 5: 100 > 3x avg(10) -> spike
        last = out["2024-01-01 05:00:00"]
        assert last["is_spike"] and last["trailing_n"] == 5
        assert last["trailing_sum"] == 50
        # steady hours never spike
        assert not out["2024-01-01 04:00:00"]["is_spike"]

    def test_boundary_is_strict(self, spark):
        # exactly factor x mean must NOT flag (strict >)
        rows = [(i, "e", f"2024-01-01 0{h}:00:00")
                for h in range(4) for i in range(10)]
        rows += [(99, "e", "2024-01-01 04:00:00")] * 30  # exactly 3x10
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            str(r["bucket_ts"]): r["is_spike"]
            for r in analytics.rate_spikes(df).collect()
        }
        assert out["2024-01-01 04:00:00"] is False

    def test_bad_args(self, spark):
        df = spark.createDataFrame([(1, "e", None)],
                                   "event_id long, event_type string, ts timestamp")
        with pytest.raises(ValueError, match="trailing"):
            analytics.rate_spikes(df, trailing=0)
        # Spark date_trunc returns NULL for unknown units — must raise,
        # not collapse every row into one (type, NULL) bucket
        with pytest.raises(ValueError, match="bucket"):
            analytics.rate_spikes(df, bucket="15 minutes")


class TestGapfillCounts:
    def test_zero_fills_missing_buckets(self, spark):
        rows = [
            (1, "a", "2024-01-01 00:10:00"),
            (2, "a", "2024-01-01 00:20:00"),
            (3, "a", "2024-01-01 03:05:00"),  # hours 1-2 silent
            (4, "b", "2024-01-01 05:00:00"),
            (5, "a", None),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            (r["event_type"], str(r["bucket_ts"])): r["n_events"]
            for r in analytics.gapfill_counts(df).collect()
        }
        assert out[("a", "2024-01-01 00:00:00")] == 2
        assert out[("a", "2024-01-01 01:00:00")] == 0
        assert out[("a", "2024-01-01 02:00:00")] == 0
        assert out[("a", "2024-01-01 03:00:00")] == 1
        assert out[("b", "2024-01-01 05:00:00")] == 1
        assert len(out) == 5  # 4 'a' buckets + 1 'b'; NULL ts dropped

    def test_bad_bucket(self, spark):
        df = spark.createDataFrame([(1, "a", None)],
                                   "event_id long, event_type string, ts timestamp")
        with pytest.raises(ValueError, match="bucket_seconds"):
            analytics.gapfill_counts(df, bucket_seconds=0)

    def test_span_wider_than_one_chunk(self, spark):
        # 20001 one-second buckets -> 3 explode chunks at 8192/chunk;
        # dense axis must still be exact and contiguous
        df = spark.createDataFrame(
            [(1, "a", "2024-01-01 00:00:00"), (2, "a", "2024-01-01 05:33:20")],
            "event_id long, event_type string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = analytics.gapfill_counts(df, bucket_seconds=1)
        rows = out.collect()
        assert len(rows) == 20_001
        assert sum(r["n_events"] for r in rows) == 2
        assert str(rows[0]["bucket_ts"]) == "2024-01-01 00:00:00"
        assert str(rows[-1]["bucket_ts"]) == "2024-01-01 05:33:20"

    def test_max_buckets_guard_raises(self, spark):
        from pyspark.errors.exceptions.base import PySparkException

        df = spark.createDataFrame(
            [(1, "a", "1970-01-01 00:00:00"), (2, "a", "2024-01-01 00:00:00")],
            "event_id long, event_type string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        with pytest.raises(PySparkException, match="max_buckets"):
            analytics.gapfill_counts(df, bucket_seconds=60).collect()
        # uncapped: the corrupt span is the caller's explicit choice
        n = analytics.gapfill_counts(
            df, bucket_seconds=7 * 86400, max_buckets=None
        ).count()
        assert n > 2_000


class TestIntervalJoin:
    PTS = "pid bigint, k string, ts timestamp"
    RNG = "rid bigint, k string, start_ts timestamp, end_ts timestamp"

    def _ts(self, s):
        import datetime as dt
        return dt.datetime.fromisoformat(s)

    def test_half_open_containment_with_keys(self, spark):
        pts = spark.createDataFrame(
            [(1, "u", self._ts("2024-01-01 10:00:00")),
             (2, "u", self._ts("2024-01-01 11:59:59")),
             (3, "u", self._ts("2024-01-01 12:00:00")),   # == end: excluded
             (4, "v", self._ts("2024-01-01 10:30:00")),   # wrong key
             (5, "u", self._ts("2024-01-01 10:00:00"))],  # == start: included
            self.PTS)
        rng = spark.createDataFrame(
            [(100, "u", self._ts("2024-01-01 10:00:00"),
              self._ts("2024-01-01 12:00:00"))], self.RNG)
        out = analytics.interval_join(
            pts, rng, keys=("k",), bucket_seconds=3600).collect()
        assert sorted(r["pid"] for r in out) == [1, 2, 5]
        assert all(r["r_rid"] == 100 for r in out)

    def test_no_duplicate_matches_across_buckets(self, spark):
        # range spans 5 buckets; each contained point matches exactly once
        pts = spark.createDataFrame(
            [(i, "u", self._ts("2024-01-01 0%d:30:00" % i))
             for i in range(5)], self.PTS)
        rng = spark.createDataFrame(
            [(1, "u", self._ts("2024-01-01 00:00:00"),
              self._ts("2024-01-01 05:00:00"))], self.RNG)
        out = analytics.interval_join(
            pts, rng, keys=("k",), bucket_seconds=3600).collect()
        assert sorted(r["pid"] for r in out) == [0, 1, 2, 3, 4]

    def test_boundary_range_does_not_overexplode(self, spark):
        # end exactly on a bucket boundary: the end bucket itself must
        # not be probed (a point at end_ts is excluded anyway, but the
        # explode width is what the ceil-minus-one form bounds)
        rng = spark.createDataFrame(
            [(1, "u", self._ts("2024-01-01 00:00:00"),
              self._ts("2024-01-01 01:00:00"))], self.RNG)
        pts = spark.createDataFrame(
            [(1, "u", self._ts("2024-01-01 01:00:00"))], self.PTS)
        assert analytics.interval_join(
            pts, rng, keys=("k",), bucket_seconds=3600).count() == 0

    def test_null_and_inverted_ranges_dropped(self, spark):
        pts = spark.createDataFrame(
            [(1, "u", self._ts("2024-01-01 10:00:00")), (2, "u", None)],
            self.PTS)
        rng = spark.createDataFrame(
            [(1, "u", None, self._ts("2024-01-01 12:00:00")),
             (2, "u", self._ts("2024-01-01 12:00:00"),
              self._ts("2024-01-01 10:00:00"))], self.RNG)
        assert analytics.interval_join(
            pts, rng, keys=("k",), bucket_seconds=3600).count() == 0

    def test_matches_plain_theta_join(self, spark):
        import random
        rnd = random.Random(7)
        base = self._ts("2024-01-01 00:00:00")
        import datetime as dt
        pts = spark.createDataFrame(
            [(i, "k%d" % (i % 3),
              base + dt.timedelta(seconds=rnd.randrange(90000)))
             for i in range(300)], self.PTS)
        rng = spark.createDataFrame(
            [(i, "k%d" % (i % 3),
              base + dt.timedelta(seconds=(s := rnd.randrange(80000))),
              base + dt.timedelta(seconds=s + rnd.randrange(1, 20000)))
             for i in range(40)], self.RNG)
        got = sorted(
            (r["pid"], r["r_rid"])
            for r in analytics.interval_join(
                pts, rng, keys=("k",), bucket_seconds=7200).collect())
        want = sorted(
            (r["pid"], r["rid"])
            for r in pts.alias("p").join(
                rng.alias("r"),
                (F.col("p.k") == F.col("r.k"))
                & (F.col("p.ts") >= F.col("r.start_ts"))
                & (F.col("p.ts") < F.col("r.end_ts"))).collect())
        assert got == want and len(got) > 0

    def test_bad_bucket_raises(self, spark):
        df = spark.createDataFrame([], self.PTS)
        with pytest.raises(ValueError, match="bucket_seconds"):
            analytics.interval_join(df, df, bucket_seconds=0)

    def test_subsecond_end_probes_its_partial_bucket(self, spark):
        # range [00:30:00, 01:00:00.5): the 500 ms reach into bucket 1
        # must be probed — second-truncating epoch math would stop at
        # bucket 0 and miss the 01:00:00.2 point
        import datetime as dt
        base = dt.datetime(2024, 1, 1, 0, 30, 0)
        rng = spark.createDataFrame(
            [(1, "u", base,
              dt.datetime(2024, 1, 1, 1, 0, 0, 500_000))], self.RNG)
        pts = spark.createDataFrame(
            [(1, "u", dt.datetime(2024, 1, 1, 1, 0, 0, 200_000)),
             (2, "u", dt.datetime(2024, 1, 1, 1, 0, 0, 500_000))],  # == end
            self.PTS)
        out = analytics.interval_join(
            pts, rng, keys=("k",), bucket_seconds=3600).collect()
        assert [r["pid"] for r in out] == [1]


class TestSlidingCounts:
    def test_each_event_in_window_over_slide_windows(self, spark):
        import datetime as dt
        df = spark.createDataFrame(
            [(1, "a", dt.datetime(2024, 1, 1, 10, 20, 0))],
            "event_id bigint, event_type string, ts timestamp")
        out = analytics.sliding_counts(
            df, key_cols=("event_type",),
            window_seconds=3600, slide_seconds=900).collect()
        # 4 windows cover 10:20: starts 09:30, 09:45, 10:00, 10:15
        starts = sorted(r["window_start"] for r in out)
        assert [s.strftime("%H:%M") for s in starts] == [
            "09:30", "09:45", "10:00", "10:15"]
        assert all(r["n_events"] == 1 for r in out)
        assert all(
            (r["window_end"] - r["window_start"]).total_seconds() == 3600
            for r in out)

    def test_counts_aggregate_within_window(self, spark):
        import datetime as dt
        rows = [(i, "a", dt.datetime(2024, 1, 1, 10, 0, i)) for i in range(5)]
        rows += [(9, "b", dt.datetime(2024, 1, 1, 10, 0, 0)), (10, "a", None)]
        df = spark.createDataFrame(
            rows, "event_id bigint, event_type string, ts timestamp")
        out = {(r["event_type"], r["window_start"].strftime("%H:%M")):
               r["n_events"]
               for r in analytics.sliding_counts(
                   df, window_seconds=1800, slide_seconds=900).collect()}
        assert out[("a", "09:45")] == 5 and out[("a", "10:00")] == 5
        assert out[("b", "10:00")] == 1
        # NULL ts dropped: 'a' appears in exactly 2 windows
        assert sum(1 for k in out if k[0] == "a") == 2

    def test_validation(self, spark):
        df = spark.createDataFrame([], "ts timestamp")
        with pytest.raises(ValueError, match="multiple"):
            analytics.sliding_counts(df, window_seconds=3600,
                                     slide_seconds=1000)
        with pytest.raises(ValueError, match="> 0"):
            analytics.sliding_counts(df, window_seconds=0)


class TestLogTemplates:
    def test_masking_and_counts(self, spark):
        rows = [
            ("GET /api/item/17 from 10.1.2.3 took 40ms",),
            ("GET /api/item/999 from 192.168.0.250 took 7ms",),
            ("order deadbeef-dead-beef-dead-beefdeadbeef total 12",),
            ("ERROR code=0xFF retrying",),
            ("ERROR code=0x1a2b retrying",),
            (None,),
        ]
        df = spark.createDataFrame(rows, "text string")
        out = {
            r["template"]: (r["n_events"], r["share_micro"])
            for r in analytics.log_templates(df).collect()
        }
        assert out == {
            "GET /api/item/<NUM> from <IP> took <NUM>ms": (2, 400_000),
            "order <UUID> total <NUM>": (1, 200_000),
            "ERROR code=<HEX> retrying": (2, 400_000),
        }

    def test_mask_order_is_confluent(self, spark):
        # a uuid contains hex runs and digits; an IP contains digits —
        # each must collapse to ITS placeholder, not be eaten by a
        # later, more general mask
        df = spark.createDataFrame(
            [("u=deadbeef-dead-beef-dead-beefdeadbeef ip=10.0.0.1 "
              "h=0x0 n=007",)],
            "text string",
        )
        [r] = analytics.log_templates(df).collect()
        assert r["template"] == "u=<UUID> ip=<IP> h=<HEX> n=<NUM>"

    def test_ts_bounds(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        t1 = dt.datetime(2024, 1, 2, 0, 0, 0)
        df = spark.createDataFrame(
            [("req 1", t1), ("req 2", t0), ("other", t1)],
            "text string, ts timestamp",
        )
        out = {
            r["template"]: (r["first_ts"], r["last_ts"])
            for r in analytics.log_templates(df, ts_col="ts").collect()
        }
        assert out["req <NUM>"] == (t0, t1)
        assert out["other"] == (t1, t1)

    def test_rare_templates_filters(self, spark):
        rows = [("common 1",)] * 8 + [("rare event A",), ("rare event B",)]
        df = spark.createDataFrame(rows, "text string")
        rare = {
            r["template"]
            for r in analytics.rare_templates(df, max_count=1).collect()
        }
        assert rare == {"rare event A", "rare event B"}
        # share-only mode: 10% bar excludes the 80% template
        rare2 = {
            r["template"]
            for r in analytics.rare_templates(
                df, max_count=None, max_share_micro=100_000
            ).collect()
        }
        assert rare2 == {"rare event A", "rare event B"}
        with pytest.raises(ValueError, match="max_count"):
            analytics.rare_templates(df, max_count=None)

    def test_parallelism_invariance(self, spark):
        rows = [(f"req {i} from 10.0.0.{i % 5}",) for i in range(200)]
        df = spark.createDataFrame(rows, "text string")
        a = analytics.log_templates(df.repartition(1)).collect()
        b = analytics.log_templates(df.repartition(13)).collect()
        key = lambda r: r["template"]
        assert sorted(a, key=key) == sorted(b, key=key)


class TestTransitionCounts:
    def test_bigrams_and_start(self, spark):
        rows = [
            (1, 1, "u"), (1, 2, "a"), (1, 3, "u"), (1, 4, "a"),
            (2, 1, "u"), (2, 2, "a"), (2, 3, "a"),
        ]
        df = spark.createDataFrame(rows, "k bigint, o bigint, s string")
        out = {
            (r["prev_state"], r["state"]): (r["n"], r["out_share_micro"])
            for r in analytics.transition_counts(
                df, "k", ("o",), "s"
            ).collect()
        }
        assert out == {
            ("<START>", "u"): (2, 1_000_000),
            ("u", "a"): (3, 1_000_000),
            ("a", "u"): (1, 500_000),
            ("a", "a"): (1, 500_000),
        }

    def test_no_start_and_null_state(self, spark):
        rows = [(1, 1, None), (1, 2, "x")]
        df = spark.createDataFrame(rows, "k bigint, o bigint, s string")
        out = {
            (r["prev_state"], r["state"]): r["n"]
            for r in analytics.transition_counts(
                df, "k", ("o",), "s", include_start=False
            ).collect()
        }
        # NULL participates as '' so the edge is not dropped
        assert out == {("", "x"): 1}
        with pytest.raises(ValueError, match="order_cols"):
            analytics.transition_counts(df, "k", (), "s")

    def test_custom_start_sentinel_and_share_validation(self, spark):
        # a genuine '<START>' state merges with the default sentinel;
        # a custom sentinel keeps the two populations apart
        rows = [(1, 1, "<START>"), (1, 2, "x")]
        df = spark.createDataFrame(rows, "k bigint, o bigint, s string")
        out = {
            (r["prev_state"], r["state"]): r["n"]
            for r in analytics.transition_counts(
                df, "k", ("o",), "s", start_state="<SEQ0>"
            ).collect()
        }
        assert out == {("<SEQ0>", "<START>"): 1, ("<START>", "x"): 1}
        with pytest.raises(ValueError, match="max_share_micro"):
            analytics.rare_templates(
                df.selectExpr("s AS text"),
                max_count=None,
                max_share_micro=-1,
            )


class TestKmvDistinct:
    def test_exact_below_k_and_estimate_above(self, spark):
        # group "small": 5 distinct values < k=8 -> exact count
        # group "big": 200 distinct values -> estimator path
        rows = [("small", i % 5) for i in range(20)] + [
            ("big", i) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g string, v bigint")
        out = {r["g"]: r for r in
               analytics.kmv_distinct(df, "g", "v", k=8).collect()}
        assert out["small"]["est_distinct"] == 5
        assert out["small"]["is_exact"] is True
        assert out["big"]["is_exact"] is False
        assert out["big"]["n_sketch"] == 8
        # KMV with k=8 is noisy (~41% rel error bound) but the
        # deterministic hash makes the estimate reproducible; assert
        # a generous bracket plus exact reproducibility
        est = out["big"]["est_distinct"]
        assert 50 <= est <= 800
        again = {r["g"]: r["est_distinct"] for r in
                 analytics.kmv_distinct(
                     df.repartition(7), "g", "v", k=8
                 ).collect()}
        assert again["big"] == est  # partitioning-invariant

    def test_nulls_excluded_and_bad_k(self, spark):
        df = spark.createDataFrame(
            [("a", 1), ("a", None), ("a", 1)], "g string, v bigint"
        )
        [r] = analytics.kmv_distinct(df, "g", "v", k=4).collect()
        assert r["est_distinct"] == 1 and r["is_exact"] is True
        with pytest.raises(ValueError, match="k must be"):
            analytics.kmv_distinct(df, "g", "v", k=1)


class TestActiveUsers:
    def test_dau_and_rolling_window(self, spark):
        rows = [
            # day 1: users 1, 2; day 2: user 1 again (twice); day 9: user 3
            (1, "2024-01-01 10:00:00"), (2, "2024-01-01 11:00:00"),
            (1, "2024-01-02 10:00:00"), (1, "2024-01-02 12:00:00"),
            (3, "2024-01-09 10:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        out = {
            str(r["day"]): (r["dau"], r["rolling_au"])
            for r in analytics.active_users(df, window_days=7).collect()
        }
        # day 2's trailing 7d covers days 1-2: users {1,2}
        assert out == {
            "2024-01-01": (2, 2),
            "2024-01-02": (1, 2),
            # day 9's window covers days 3-9: only user 3 (day-1/2
            # activity aged out)
            "2024-01-09": (1, 1),
        }

    def test_null_exclusion_and_bad_window(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00"), (None, "2024-01-01 11:00:00"),
             (2, None)],
            "user_id long, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = analytics.active_users(df, window_days=2).collect()
        assert len(out) == 1 and out[0]["dau"] == 1
        with pytest.raises(ValueError, match="window_days"):
            analytics.active_users(df, window_days=0)

    def test_keyed_variant(self, spark):
        rows = [("a", 1, "2024-01-01 10:00:00"),
                ("b", 1, "2024-01-01 10:00:00"),
                ("a", 2, "2024-01-02 10:00:00")]
        df = spark.createDataFrame(
            rows, "k string, user_id long, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            (r["k"], str(r["day"])): (r["dau"], r["rolling_au"])
            for r in analytics.active_users(
                df, key_cols=("k",), window_days=7
            ).collect()
        }
        assert out[("a", "2024-01-01")] == (1, 1)
        assert out[("a", "2024-01-02")] == (1, 2)
        assert out[("b", "2024-01-01")] == (1, 1)


class TestSlidingDistinct:
    def test_distinct_vs_count_and_windows(self, spark):
        rows = [
            # user 1 twice inside the same hour: counts 2, distinct 1
            (1, "a", "2024-01-01 10:05:00"),
            (1, "a", "2024-01-01 10:20:00"),
            (2, "a", "2024-01-01 10:40:00"),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            str(r["window_start"]): r["n_distinct"]
            for r in analytics.sliding_distinct(
                df, entity_col="user_id", key_cols=("event_type",),
                window_seconds=3600, slide_seconds=1800,
            ).collect()
        }
        # events at 10:05/10:20 land in windows starting 09:30 & 10:00;
        # 10:40 in 10:00 & 10:30
        assert out["2024-01-01 09:30:00"] == 1
        assert out["2024-01-01 10:00:00"] == 2
        assert out["2024-01-01 10:30:00"] == 1

    def test_bad_alignment(self, spark):
        df = spark.createDataFrame(
            [(1, "a", None)], "user_id long, event_type string, ts timestamp"
        )
        with pytest.raises(ValueError, match="multiple"):
            analytics.sliding_distinct(
                df, window_seconds=3600, slide_seconds=1000
            )


class TestMaskTemplateProperties:
    def test_masking_is_idempotent(self):
        # placeholders are digit-free, so a second pass is a no-op —
        # the confluence property the ordered chain relies on
        from hypothesis import given, settings
        from hypothesis import strategies as st

        import re as _re
        masks = analytics.TEMPLATE_MASKS

        def py_mask(s: str) -> str:
            for pat, rep in masks:
                s = _re.sub(pat, rep, s)
            return s

        @given(st.text(alphabet=st.sampled_from(
            list("abcdef0123456789.-x <>/:=")), max_size=60))
        @settings(max_examples=300, deadline=None)
        def check(s):
            assert py_mask(py_mask(s)) == py_mask(s)

        check()


class TestColumnProfile:
    def test_counts_nulls_distinct_minmax(self, spark):
        from ilogtail_spark.dataops import analytics

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (2, "b"), (3, "a")],
            "id bigint, v string",
        )
        got = {r["column"]: r for r in
               analytics.column_profile(df).collect()}
        assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
        assert got["id"]["n_distinct"] == 3
        assert (got["id"]["min_value"], got["id"]["max_value"]) == ("1", "3")
        assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
        assert (got["v"]["min_value"], got["v"]["max_value"]) == ("a", "b")

    def test_column_subset_and_validation(self, spark):
        import pytest

        from ilogtail_spark.dataops import analytics

        df = spark.createDataFrame([(1, "a")], "id bigint, v string")
        out = analytics.column_profile(df, ["v"]).collect()
        assert [r["column"] for r in out] == ["v"]
        with pytest.raises(ValueError, match="non-empty"):
            analytics.column_profile(df, [])
        with pytest.raises(ValueError, match="missing"):
            analytics.column_profile(df, ["nope"])


class TestProfileDiff:
    def test_drift_detection(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
            "id bigint, kind string, v bigint",
        )
        new = spark.createDataFrame(
            [(1, "a", 10), (2, "z", None), (4, "z", 99)],
            "id bigint, kind string, v bigint",
        )
        out = {
            r["column"]: r.asDict()
            for r in analytics.profile_diff(old, new).collect()
        }
        assert set(out) == {"id", "kind", "v"}
        v = out["v"]
        assert (v["n_rows_old"], v["n_rows_new"]) == (3, 3)
        assert (v["n_null_old"], v["n_null_new"], v["null_delta"]) == (0, 1, 1)
        assert v["distinct_delta"] == -1  # {10,20,30} -> {10,99}
        assert v["max_changed"] is True   # '30' -> '99'
        assert v["min_changed"] is False  # '10' both sides
        k = out["kind"]
        assert k["distinct_delta"] == -1  # {a,b,c} -> {a,z}
        assert k["max_changed"] is True   # 'c' -> 'z'

    def test_explicit_cols_and_validation(self, spark):
        old = spark.createDataFrame([(1, "a")], "id bigint, kind string")
        new = spark.createDataFrame([(1,)], "id bigint")
        # default: shared columns only
        out = analytics.profile_diff(old, new).collect()
        assert [r["column"] for r in out] == ["id"]
        # explicit missing column errors loudly
        with pytest.raises(ValueError, match="missing columns"):
            analytics.profile_diff(old, new, ["kind"])
        with pytest.raises(ValueError, match="share no columns"):
            analytics.profile_diff(
                old.select("kind"), new.select(F.col("id").alias("other"))
            )


class TestGroupedQuantileDiff:
    def test_drift(self, spark):
        old = spark.createDataFrame(
            [("a", float(v)) for v in range(1, 101)]
            + [("b", float(v)) for v in range(1, 11)],
            "g string, value double",
        )
        new = spark.createDataFrame(
            [("a", float(v * 2)) for v in range(1, 101)],
            "g string, value double",
        )
        out = {
            (r["g"], r["q_micro"]): r.asDict()
            for r in analytics.grouped_quantile_diff(
                old, new, "g", "value", (500_000, 990_000)
            ).collect()
        }
        a50 = out[("a", 500_000)]
        assert (a50["q_value_old"], a50["q_value_new"]) == (50.0, 100.0)
        assert a50["q_delta"] == 50.0
        assert (a50["n_old"], a50["n_new"]) == (100, 100)
        # group absent from the new side: counts 0, values/delta NULL
        b99 = out[("b", 990_000)]
        assert b99["n_new"] == 0
        assert b99["q_value_new"] is None and b99["q_delta"] is None


class TestTemplateDrift:
    def test_statuses_and_growth(self, spark):
        old = spark.createDataFrame(
            [("GET /api/item/1",), ("GET /api/item/2",),
             ("panic in alpha",), (None,)],
            "line string",
        )
        new = spark.createDataFrame(
            [("GET /api/item/7",), ("GET /api/item/8",),
             ("GET /api/item/9",), ("oom killed worker 3",)],
            "line string",
        )
        out = {
            r["template"]: r.asDict()
            for r in analytics.template_drift(old, new, "line").collect()
        }
        get = out["GET /api/item/<NUM>"]
        assert (get["n_old"], get["n_new"], get["delta"]) == (2, 3, 1)
        assert get["status"] == "changed"
        assert get["growth_micro"] == 1_500_000
        assert out["panic in alpha"]["status"] == "vanished"
        assert out["panic in alpha"]["growth_micro"] is None
        oom = out["oom killed worker <NUM>"]
        assert oom["status"] == "new"
        assert (oom["n_old"], oom["n_new"]) == (0, 1)

    def test_stable(self, spark):
        df = spark.createDataFrame([("heartbeat seq 1",)], "line string")
        out = analytics.template_drift(df, df, "line").collect()[0]
        assert out["status"] == "stable"
        assert out["growth_micro"] == 1_000_000


class TestOutageWindows:
    def test_gaps_detected(self, spark):
        rows = [
            ("api", "2024-01-01 00:00:00"),
            ("api", "2024-01-01 00:30:00"),
            ("api", "2024-01-01 02:30:00"),  # 2h gap
            ("api", "2024-01-01 02:40:00"),
            ("db", "2024-01-01 00:00:00"),
            ("db", "2024-01-01 00:10:00"),
        ]
        df = spark.createDataFrame(rows, "k string, t string").select(
            "k", F.col("t").cast("timestamp").alias("t"))
        out = analytics.outage_windows(
            df, "k", "t", min_gap_seconds=3600).collect()
        assert len(out) == 1
        r = out[0]
        assert r["key"] == "api" and r["gap_sec"] == 7200
        assert str(r["gap_start"]) == "2024-01-01 00:30:00"
        assert str(r["gap_end"]) == "2024-01-01 02:30:00"

    def test_threshold_inclusive_and_nulls_dropped(self, spark):
        rows = [
            ("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 01:00:00"),
            (None, "2024-01-01 00:00:00"), ("a", None),
        ]
        df = spark.createDataFrame(rows, "k string, t string").select(
            "k", F.col("t").cast("timestamp").alias("t"))
        out = analytics.outage_windows(df, "k", "t", 3600).collect()
        assert len(out) == 1 and out[0]["gap_sec"] == 3600

    def test_equal_timestamps_no_gap(self, spark):
        rows = [("a", "2024-01-01 00:00:00")] * 3
        df = spark.createDataFrame(rows, "k string, t string").select(
            "k", F.col("t").cast("timestamp").alias("t"))
        assert analytics.outage_windows(df, "k", "t", 1).count() == 0

    def test_validates(self, spark):
        df = spark.createDataFrame([("a",)], "k string")
        with pytest.raises(ValueError, match="missing columns"):
            analytics.outage_windows(df, "k", "t", 60)
        with pytest.raises(ValueError, match="min_gap_seconds"):
            analytics.outage_windows(df, "k", "k", 0)


class TestConcentrationReport:
    SCHEMA = "event_type string, user_id long"

    def test_shares_and_half(self, spark):
        from ilogtail_spark.dataops import analytics
        # type A: key 1 x6, key 2 x2, keys 3..4 x1 -> total 10
        rows = ([("A", 1)] * 6 + [("A", 2)] * 2 + [("A", 3), ("A", 4)]
                + [("B", 9)])
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["event_type"]: r.asDict()
               for r in analytics.concentration_report(
                   df, top_k=2).collect()}
        a = out["A"]
        assert a["n_events"] == 10 and a["n_keys"] == 4
        assert a["top1_share_micro"] == 600_000
        assert a["top2_share_micro"] == 800_000
        assert a["n_keys_half"] == 1
        b = out["B"]
        assert b["top1_share_micro"] == 1_000_000 and b["n_keys_half"] == 1

    def test_tie_break_by_key(self, spark):
        from ilogtail_spark.dataops import analytics
        # two keys with equal counts: rank order (count desc, key asc)
        rows = [("A", 2), ("A", 1)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r = analytics.concentration_report(df, top_k=1).collect()[0]
        assert r["top1_share_micro"] == 500_000
        assert r["n_keys_half"] == 1  # first key alone reaches 50%

    def test_top_k_validated(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame([("A", 1)], self.SCHEMA)
        with pytest.raises(ValueError, match="top_k"):
            analytics.concentration_report(df, top_k=0)

    def test_parallelism_invariant(self, spark):
        from ilogtail_spark.dataops import analytics
        rows = [("T%d" % (i % 3), i % 17) for i in range(300)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.concentration_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.concentration_report(
            df.repartition(7)).collect()))
        assert one == par


class TestSloBurn:
    SCHEMA = "event_type string, ts timestamp, svc string"

    @staticmethod
    def _rows():
        from datetime import datetime
        rows = []
        # hours 0-2: 10% errors (healthy at slo 20%); hours 3-5: 50%
        for h in range(6):
            err = 1 if h < 3 else 5
            for i in range(10):
                rows.append((
                    "error" if i < err else "ok",
                    datetime(2024, 1, 1, h, i), "a",
                ))
        return rows

    def test_burn_flips(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        out = sorted(
            analytics.slo_burn(
                df, slo_error_micro=200_000, window_buckets=3
            ).collect(),
            key=lambda r: r["bucket_ts"],
        )
        assert len(out) == 6
        # hour 2: window = hours 0-2, 3/30 errors -> 100000 micro,
        # burn 500000 -> healthy
        assert out[2]["win_err_micro"] == 100_000
        assert out[2]["burn_micro"] == 500_000
        assert out[2]["is_burning"] is False
        # hour 5: window = hours 3-5, 15/30 -> 500000, burn 2.5e6
        assert out[5]["win_err_micro"] == 500_000
        assert out[5]["is_burning"] is True
        # per-bucket ratio exact
        assert out[0]["err_micro"] == 100_000
        assert out[5]["err_micro"] == 500_000

    def test_window_shorter_at_series_start(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        r0 = sorted(
            analytics.slo_burn(df, window_buckets=3).collect(),
            key=lambda r: r["bucket_ts"],
        )[0]
        assert r0["win_total"] == 10  # only its own bucket observed

    def test_group_col(self, spark):
        from ilogtail_spark.dataops import analytics
        from datetime import datetime
        rows = [
            ("error", datetime(2024, 1, 1, 0), "a"),
            ("ok", datetime(2024, 1, 1, 0), "b"),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["group_key"]: r for r in analytics.slo_burn(
            df, group_col="svc", slo_error_micro=500_000
        ).collect()}
        assert out["a"]["is_burning"] is True
        assert out["b"]["is_burning"] is False

    def test_validation(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="window_buckets"):
            analytics.slo_burn(df, window_buckets=0)
        with pytest.raises(ValueError, match="slo_error_micro"):
            analytics.slo_burn(df, slo_error_micro=0)
        with pytest.raises(ValueError, match="bucket must"):
            analytics.slo_burn(df, bucket="fortnight")

    def test_parallelism_invariant(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        one = sorted(map(tuple, analytics.slo_burn(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.slo_burn(
            df.repartition(5)).collect()))
        assert one == par


class TestSeasonalProfile:
    SCHEMA = "event_type string, ts timestamp, svc string"

    @staticmethod
    def _rows():
        from datetime import datetime
        # 2024-01-01 and 2024-01-08 are Mondays (dow=1, Sunday=0)
        return [
            ("ok", datetime(2024, 1, 1, 10, 0), "a"),
            ("ok", datetime(2024, 1, 1, 10, 30), "a"),
            ("ok", datetime(2024, 1, 8, 10, 5), "a"),
            ("ok", datetime(2024, 1, 8, 10, 6), "a"),
            ("ok", datetime(2024, 1, 8, 10, 7), "b"),
            ("ok", datetime(2024, 1, 2, 3, 0), "b"),   # Tuesday 03:00
            ("ok", None, "a"),                          # excluded
        ]

    def test_cells_and_shares(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        out = {(r["dow"], r["hour"]): r
               for r in analytics.seasonal_profile(df).collect()}
        assert set(out) == {(1, 10), (2, 3)}
        mon = out[(1, 10)]
        assert mon["n_events"] == 5 and mon["n_days"] == 2
        assert mon["per_day_micro"] == 2_500_000
        assert mon["share_micro"] == 833_333  # 5/6 floor-micro
        tue = out[(2, 3)]
        assert tue["n_events"] == 1 and tue["n_days"] == 1
        assert tue["share_micro"] == 166_666

    def test_group_col(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        out = analytics.seasonal_profile(df, group_col="svc").collect()
        a = [r for r in out if r["group_key"] == "a"]
        # group a: 4 events, all in (Mon, 10) -> share 1e6
        assert sum(r["n_events"] for r in a) == 4
        assert all(r["share_micro"] == 1_000_000 for r in a)

    def test_parallelism_invariant(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(self._rows(), self.SCHEMA)
        one = sorted(map(tuple, analytics.seasonal_profile(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.seasonal_profile(
            df.repartition(5)).collect()))
        assert one == par


class TestFirstSeenCurve:
    SCHEMA = "user_id bigint, ts timestamp"

    def test_new_vs_returning(self, spark):
        from datetime import datetime
        from ilogtail_spark.dataops import analytics
        rows = [
            (1, datetime(2024, 1, 1, 5)), (2, datetime(2024, 1, 1, 6)),
            (1, datetime(2024, 1, 2, 5)),
            (3, datetime(2024, 1, 3, 5)),
            (None, datetime(2024, 1, 3, 6)), (3, None),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = sorted(analytics.first_seen_curve(df).collect(),
                     key=lambda r: r["bucket_ts"])
        assert [(r["n_active"], r["n_new"], r["n_returning"], r["cum_keys"])
                for r in out] == [(2, 2, 0, 2), (1, 0, 1, 2), (1, 1, 0, 3)]

    def test_validation(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="bucket must"):
            analytics.first_seen_curve(df, bucket="fortnight")

    def test_parallelism_invariant(self, spark):
        from datetime import datetime
        from ilogtail_spark.dataops import analytics
        rows = [(i % 7, datetime(2024, 1, 1 + i % 9, 5)) for i in range(40)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.first_seen_curve(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.first_seen_curve(
            df.repartition(7)).collect()))
        assert one == par


class TestCooccurrenceReport:
    SCHEMA = "event_type string, user_id bigint, ts timestamp"

    def test_pairs_and_jaccard(self, spark):
        from datetime import datetime
        from ilogtail_spark.dataops import analytics
        h1, h2 = datetime(2024, 1, 1, 10, 1), datetime(2024, 1, 1, 11, 1)
        rows = [
            ("a", 1, h1), ("b", 1, h1), ("c", 1, h1),
            ("a", 1, h1),              # dup in cell — counted once
            ("a", 2, h2), ("b", 2, h2),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = analytics.cooccurrence_report(df).collect()
        rows_by_pair = {(r["type_a"], r["type_b"]): r for r in out}
        ab = rows_by_pair[("a", "b")]
        assert ab["n_both"] == 2 and ab["n_a"] == 2 and ab["n_b"] == 2
        assert ab["jaccard_micro"] == 1_000_000
        ac = rows_by_pair[("a", "c")]
        assert ac["n_both"] == 1 and ac["jaccard_micro"] == 500_000
        # ordering: n_both DESC then names
        assert out[0]["type_a"] == "a" and out[0]["type_b"] == "b"

    def test_single_type_cells_emit_nothing(self, spark):
        from datetime import datetime
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame(
            [("a", 1, datetime(2024, 1, 1, 1)),
             ("a", 2, datetime(2024, 1, 1, 2))], self.SCHEMA)
        assert analytics.cooccurrence_report(df).count() == 0

    def test_parallelism_invariant(self, spark):
        from datetime import datetime
        from ilogtail_spark.dataops import analytics
        rows = [("t%d" % (i % 4), i % 5, datetime(2024, 1, 1, i % 12))
                for i in range(60)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.cooccurrence_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.cooccurrence_report(
            df.repartition(7)).collect()))
        assert one == par


class TestBurstinessReport:
    SCHEMA = "user_id bigint, ts timestamp"

    def test_regular_vs_bursty(self, spark):
        from datetime import datetime, timedelta
        from ilogtail_spark.dataops import analytics
        t0 = datetime(2024, 1, 1)
        rows = (
            # key 1: perfectly regular 1s gaps -> cv2 = 0
            [(1, t0 + timedelta(seconds=i)) for i in range(4)]
            # key 2: gaps 0s and 2s -> mean 1000ms, cv2 = 1e6
            + [(2, t0), (2, t0), (2, t0 + timedelta(seconds=2))]
            # key 3: all same ts -> sum 0 -> cv2 NULL
            + [(3, t0), (3, t0), (3, t0)]
            # key 4: only 2 events -> dropped at min_events=3
            + [(4, t0), (4, t0 + timedelta(seconds=1))]
        )
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["user_id"]: r
               for r in analytics.burstiness_report(df).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["cv2_micro"] == 0
        assert out[1]["mean_gap_ms"] == 1000
        assert out[1]["span_ms"] == 3000
        assert out[2]["cv2_micro"] == 1_000_000
        assert out[2]["mean_gap_ms"] == 1000
        assert out[3]["cv2_micro"] is None
        assert out[3]["span_ms"] == 0

    def test_validation(self, spark):
        from ilogtail_spark.dataops import analytics
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="min_events"):
            analytics.burstiness_report(df, min_events=2)

    def test_parallelism_invariant(self, spark):
        from datetime import datetime, timedelta
        from ilogtail_spark.dataops import analytics
        t0 = datetime(2024, 1, 1)
        rows = [(i % 6, t0 + timedelta(seconds=(i * 37) % 101))
                for i in range(60)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.burstiness_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.burstiness_report(
            df.repartition(7)).collect()))
        assert one == par


class TestRetryStorms:
    SCHEMA = "user_id int, event_type string, ts timestamp"

    def _df(self, spark, gaps, uid=1, etype="error"):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        rows, cur = [], 0
        for g in gaps:
            cur += g
            rows.append((uid, etype, t0 + timedelta(seconds=cur)))
        return spark.createDataFrame(rows, self.SCHEMA)

    def test_runs_retries_and_storms(self, spark):
        # gaps (s) after the first event: chain1 = 3 rows (storm),
        # then a 2000 s break, chain2 = 2 rows (retry but no storm)
        df = self._df(spark, [0, 100, 100, 2000, 50])
        r = analytics.retry_storms(
            df, ["user_id", "event_type"], window_sec=600, min_run=3
        ).collect()
        assert len(r) == 1
        row = r[0]
        assert (row["n_rows"], row["n_runs"]) == (5, 2)
        assert row["n_retries"] == 3
        assert row["n_storms"] == 1
        assert row["max_run"] == 3
        assert row["retry_share_micro"] == 600_000
    def test_no_retries_filtered_out(self, spark):
        df = self._df(spark, [0, 5000, 5000])
        assert analytics.retry_storms(df, window_sec=600).count() == 0

    def test_sub_second_gap_not_floored(self, spark):
        # 600.4 s gap: second-floored math would call it a retry
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        rows = [(1, "e", t0),
                (1, "e", t0 + timedelta(seconds=600, microseconds=400_000))]
        df = spark.createDataFrame(rows, self.SCHEMA)
        assert analytics.retry_storms(df, window_sec=600).count() == 0

    def test_identities_are_independent(self, spark):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        # interleaved users: each alone has gaps > window
        rows = [(u, "e", t0 + timedelta(seconds=i * 400))
                for i, u in enumerate([1, 2, 1, 2, 1, 2])]
        df = spark.createDataFrame(rows, self.SCHEMA)
        assert analytics.retry_storms(df, window_sec=600).count() == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="window_sec"):
            analytics.retry_storms(df, window_sec=0)
        with pytest.raises(ValueError, match="min_run"):
            analytics.retry_storms(df, min_run=1)
        with pytest.raises(ValueError, match="missing"):
            analytics.retry_storms(df, identity_cols=["nope"])
        with pytest.raises(ValueError, match="at least one column"):
            analytics.retry_storms(df, identity_cols=[])

    def test_single_exchange_plan(self, spark):
        df = self._df(spark, [0, 100, 100])
        plan = analytics.retry_storms(
            df, ["user_id", "event_type"]
        )._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1

    def test_parallelism_invariant(self, spark):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        rows = [(i % 5, "t%d" % (i % 2),
                 t0 + timedelta(seconds=(i * 313) % 7919))
                for i in range(80)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.retry_storms(
            df.coalesce(1), window_sec=900).collect()))
        par = sorted(map(tuple, analytics.retry_storms(
            df.repartition(7), window_sec=900).collect()))
        assert one == par


class TestJsonKeyCensus:
    SCHEMA = "event_type string, props string"

    def test_census_counts_rows_not_occurrences(self, spark):
        rows = [
            ("a", '{"k": 1, "k": 2}'),          # duplicate key: 1 row
            ("a", '{"k": 3, "trace": "t"}'),
            ("a", None),                          # no keys, counts in total
            ("b", '{"nested": {"inner": 1}}'),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {(r["event_type"], r["key"]): r
               for r in analytics.json_key_census(df).collect()}
        assert out[("a", "k")]["n_rows"] == 2
        assert out[("a", "k")]["n_type_rows"] == 3
        assert out[("a", "k")]["presence_micro"] == 666_666
        assert out[("a", "trace")]["n_rows"] == 1
        # nested keys are counted too (deliberate)
        assert out[("b", "nested")]["n_rows"] == 1
        assert out[("b", "inner")]["n_rows"] == 1

    def test_non_key_quoted_strings_ignored(self, spark):
        df = spark.createDataFrame(
            [("a", '{"k": "value with spaces"}')], self.SCHEMA)
        out = [r["key"] for r in analytics.json_key_census(df).collect()]
        assert out == ["k"]

    def test_validation(self, spark):
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="missing"):
            analytics.json_key_census(df, json_col="nope")

    def test_parallelism_invariant(self, spark):
        rows = [("t%d" % (i % 3), '{"k%d": 1, "c": 2}' % (i % 5))
                for i in range(60)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.json_key_census(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.json_key_census(
            df.repartition(7)).collect()))
        assert one == par


class TestTopPerGroup:
    def test_rank_and_share(self, spark):
        rows = ([("a", 1)] * 5 + [("a", 2)] * 3 + [("a", 3)] * 2
                + [("b", 9)])
        df = spark.createDataFrame(rows, "event_type string, user_id int")
        out = {(r["event_type"], r["rank"]): r
               for r in analytics.top_per_group(df, n=2).collect()}
        assert out[("a", 1)]["key"] == "1"
        assert out[("a", 1)]["n_rows"] == 5
        assert out[("a", 1)]["share_micro"] == 500_000
        assert out[("a", 2)]["key"] == "2"
        assert ("a", 3) not in out          # n=2 cut
        assert out[("b", 1)]["share_micro"] == 1_000_000

    def test_tie_breaks_by_key_asc(self, spark):
        rows = [("a", 5), ("a", 2), ("a", 2), ("a", 5)]
        df = spark.createDataFrame(rows, "event_type string, user_id int")
        out = {r["rank"]: r["key"]
               for r in analytics.top_per_group(df, n=2).collect()}
        assert (out[1], out[2]) == ("2", "5")

    def test_validation(self, spark):
        df = spark.createDataFrame([], "event_type string, user_id int")
        with pytest.raises(ValueError, match="n must"):
            analytics.top_per_group(df, n=0)
        with pytest.raises(ValueError, match="missing"):
            analytics.top_per_group(df, key_col="nope")

    def test_parallelism_invariant(self, spark):
        rows = [("g%d" % (i % 3), i % 11) for i in range(99)]
        df = spark.createDataFrame(rows, "event_type string, user_id int")
        one = sorted(map(tuple, analytics.top_per_group(
            df.coalesce(1), n=4).collect()))
        par = sorted(map(tuple, analytics.top_per_group(
            df.repartition(7), n=4).collect()))
        assert one == par


class TestTrendReport:
    SCHEMA = "event_type string, ts timestamp"

    def _df(self, spark, day_counts, key="e"):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        rows = []
        for day, cnt in enumerate(day_counts):
            for j in range(cnt):
                rows.append((key, t0 + timedelta(days=day, seconds=j)))
        return spark.createDataFrame(rows, self.SCHEMA)

    def test_exact_positive_slope(self, spark):
        # counts 1,2,3 over days 0,1,2 -> slope exactly 1/bucket
        df = self._df(spark, [1, 2, 3])
        r = analytics.trend_report(df).collect()[0]
        assert r["n_buckets"] == 3
        assert r["n_rows"] == 6
        assert r["slope_micro_per_bucket"] == 1_000_000

    def test_negative_slope(self, spark):
        # counts 7,2,2 over days 0..2: n=3 sx=3 sy=11 sxy=6 sxx=5
        # num = 3*6 - 3*11 = -15, den = 3*5 - 9 = 6 -> -2.5/bucket
        # (negative-remainder engine parity is pinned by the
        # events_trend oracle, whose natural slopes fall both ways)
        df = self._df(spark, [7, 2, 2])
        r = analytics.trend_report(df).collect()[0]
        assert r["slope_micro_per_bucket"] == -2_500_000

    def test_single_bucket_no_row(self, spark):
        df = self._df(spark, [5])
        assert analytics.trend_report(df).count() == 0

    def test_flat_series_zero_slope(self, spark):
        df = self._df(spark, [3, 3, 3, 3])
        assert analytics.trend_report(
            df).collect()[0]["slope_micro_per_bucket"] == 0

    def test_validation(self, spark):
        df = spark.createDataFrame([], self.SCHEMA)
        with pytest.raises(ValueError, match="bucket_seconds"):
            analytics.trend_report(df, bucket_seconds=0)
        with pytest.raises(ValueError, match="missing"):
            analytics.trend_report(df, key_col="nope")

    def test_parallelism_invariant(self, spark):
        from datetime import datetime, timedelta
        t0 = datetime(2024, 1, 1)
        rows = [("k%d" % (i % 3), t0 + timedelta(hours=(i * 7) % 96))
                for i in range(120)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        one = sorted(map(tuple, analytics.trend_report(
            df.coalesce(1)).collect()))
        par = sorted(map(tuple, analytics.trend_report(
            df.repartition(7)).collect()))
        assert one == par


class TestReferentialAudit:
    def test_orphans_and_null_keys(self, spark):
        ev = spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 99), ("a", None), ("b", 2)],
            "event_type string, user_id int")
        dim = spark.createDataFrame(
            [(1,), (2,), (2,)], "c_custkey int")
        out = {r["event_type"]: r
               for r in analytics.referential_audit(ev, dim).collect()}
        a = out["a"]
        # orphans: 99 and NULL; distinct non-null orphan keys: just 99
        assert (a["n_rows"], a["n_orphans"], a["n_orphan_keys"]) == (4, 2, 1)
        assert a["orphan_micro"] == 500_000
        b = out["b"]
        assert (b["n_orphans"], b["n_orphan_keys"]) == (0, 0)

    def test_duplicate_dim_keys_do_not_multiply_rows(self, spark):
        ev = spark.createDataFrame(
            [("a", 1)], "event_type string, user_id int")
        dim = spark.createDataFrame(
            [(1,), (1,), (1,)], "c_custkey int")
        r = analytics.referential_audit(ev, dim).collect()[0]
        assert (r["n_rows"], r["n_orphans"]) == (1, 0)

    def test_validation(self, spark):
        ev = spark.createDataFrame([], "event_type string, user_id int")
        dim = spark.createDataFrame([], "c_custkey int")
        with pytest.raises(ValueError, match="missing"):
            analytics.referential_audit(ev, dim, fk_col="nope")
        with pytest.raises(ValueError, match="dimension is missing"):
            analytics.referential_audit(ev, dim, pk_col="nope")

    def test_parallelism_invariant(self, spark):
        ev = spark.createDataFrame(
            [("t%d" % (i % 3), i % 17) for i in range(100)],
            "event_type string, user_id int")
        dim = spark.createDataFrame(
            [(k,) for k in range(0, 17, 2)], "c_custkey int")
        one = sorted(map(tuple, analytics.referential_audit(
            ev.coalesce(1), dim).collect()))
        par = sorted(map(tuple, analytics.referential_audit(
            ev.repartition(7), dim).collect()))
        assert one == par


class TestKAnonymityReport:
    def test_small_group_accounting(self, spark):
        rows = ([(1, "a")] * 6 + [(2, "a")] * 3 + [(3, "b")] * 1)
        df = spark.createDataFrame(rows, "user_id int, event_type string")
        r = analytics.k_anonymity_report(
            df, ["user_id", "event_type"], k=5).collect()[0]
        assert r["n_rows"] == 10
        assert r["n_groups"] == 3
        assert r["n_small_groups"] == 2       # sizes 3 and 1
        assert r["n_small_rows"] == 4
        assert r["small_rows_micro"] == 400_000
        assert (r["min_group"], r["max_group"]) == (1, 6)

    def test_nulls_form_their_own_group(self, spark):
        rows = [(None, "a")] * 5 + [(1, "a")]
        df = spark.createDataFrame(rows, "user_id int, event_type string")
        r = analytics.k_anonymity_report(
            df, ["user_id", "event_type"], k=5).collect()[0]
        assert r["n_groups"] == 2
        assert r["n_small_rows"] == 1          # only the (1, a) singleton

    def test_validation(self, spark):
        df = spark.createDataFrame([], "user_id int, event_type string")
        with pytest.raises(ValueError, match="k must"):
            analytics.k_anonymity_report(df, ["user_id"], k=1)
        with pytest.raises(ValueError, match="at least one column"):
            analytics.k_anonymity_report(df, [], k=5)
        with pytest.raises(ValueError, match="missing"):
            analytics.k_anonymity_report(df, ["nope"], k=5)

    def test_parallelism_invariant(self, spark):
        rows = [(i % 13, "t%d" % (i % 3)) for i in range(100)]
        df = spark.createDataFrame(rows, "user_id int, event_type string")
        one = analytics.k_anonymity_report(
            df.coalesce(1), ["user_id", "event_type"]).collect()
        par = analytics.k_anonymity_report(
            df.repartition(7), ["user_id", "event_type"]).collect()
        assert sorted(map(tuple, one)) == sorted(map(tuple, par))


class TestMttrReport:
    SCHEMA = "user_id long, ts string, event_type string, event_id long"

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"),
            "event_type", "event_id")

    def test_open_recover_and_consecutive_errors(self, spark):
        rows = [
            # u1: ok, err, err (same incident), ok (recovery), err (open)
            (1, "2024-01-01 00:00:00", "view", 0),
            (1, "2024-01-01 00:01:00", "error", 1),
            (1, "2024-01-01 00:02:00", "error", 2),
            (1, "2024-01-01 00:03:30", "view", 3),
            (1, "2024-01-01 00:10:00", "error", 4),
            # u2: never errors -> no row
            (2, "2024-01-01 00:00:00", "view", 5),
        ]
        out = {r["key"]: r for r in
               analytics.mttr_report(self._df(spark, rows)).collect()}
        assert set(out) == {1}
        r = out[1]
        assert r["n_incidents"] == 2
        assert r["n_recovered"] == 1 and r["n_open"] == 1
        # incident opened 00:01:00, recovered 00:03:30 -> 150 s
        assert r["mean_ttr_us"] == 150_000_000
        assert r["max_ttr_us"] == 150_000_000

    def test_exact_micros_no_second_floor(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00.200000", "error", 0),
            (1, "2024-01-01 00:00:00.900001", "click", 1),
        ]
        r = analytics.mttr_report(self._df(spark, rows)).collect()[0]
        assert r["mean_ttr_us"] == 700_001

    def test_all_open_mean_null(self, spark):
        rows = [(1, "2024-01-01 00:00:00", "error", 0)]
        r = analytics.mttr_report(self._df(spark, rows)).collect()[0]
        assert r["n_incidents"] == 1 and r["n_open"] == 1
        assert r["mean_ttr_us"] is None and r["max_ttr_us"] is None

    def test_ts_tie_broken_by_order_col(self, spark):
        # error and recovery share a timestamp: event_id orders them,
        # so the recovery counts with TTR 0
        rows = [
            (1, "2024-01-01 00:00:00", "error", 10),
            (1, "2024-01-01 00:00:00", "view", 11),
        ]
        r = analytics.mttr_report(self._df(spark, rows)).collect()[0]
        assert r["n_recovered"] == 1 and r["mean_ttr_us"] == 0

    def test_null_key_ts_dropped_and_validates(self, spark):
        rows = [
            (None, "2024-01-01 00:00:00", "error", 0),
            (1, None, "error", 1),
        ]
        assert analytics.mttr_report(self._df(spark, rows)).count() == 0
        import pytest as _pt
        with _pt.raises(ValueError, match="missing columns"):
            analytics.mttr_report(
                spark.createDataFrame([(1,)], "user_id long"))


class TestChangepointReport:
    SCHEMA = "event_type string, ts string"

    def _df(self, spark, hour_counts):
        rows = []
        for key, per_hour in hour_counts.items():
            for h, n in per_hour.items():
                rows += [(key, f"2024-01-01 {h:02d}:15:00")] * n
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"))

    def test_step_detected(self, spark):
        out = analytics.changepoint_report(
            self._df(spark, {"a": {0: 1, 1: 1, 2: 1, 3: 9, 4: 9}}),
            bucket_seconds=3600).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_buckets"] == 5 and r["n_rows"] == 21
        assert str(r["split_ts"]) == "2024-01-01 03:00:00"
        assert r["rate_before_micro"] == 1_000_000
        assert r["rate_after_micro"] == 9_000_000
        assert r["shift_micro"] == 8_000_000

    def test_tie_breaks_to_earliest_bucket(self, spark):
        # [5, 1, 5]: split at h1 and h2 both score |5 - 3| = 2e6
        r = analytics.changepoint_report(
            self._df(spark, {"a": {0: 5, 1: 1, 2: 5}}),
            bucket_seconds=3600).collect()[0]
        assert r["shift_micro"] == 2_000_000
        assert str(r["split_ts"]) == "2024-01-01 01:00:00"

    def test_floor_micro_means(self, spark):
        # [2,1,1,1]: split at h2 scores |1.5 - 1|: floors to 1500000
        # vs 1000000; best remains h1 (|2 - 1| = 1e6)
        r = analytics.changepoint_report(
            self._df(spark, {"a": {0: 2, 1: 1, 2: 1, 3: 1}}),
            bucket_seconds=3600).collect()[0]
        assert str(r["split_ts"]) == "2024-01-01 01:00:00"
        assert r["shift_micro"] == 1_000_000

    def test_single_bucket_no_row_and_validates(self, spark):
        assert analytics.changepoint_report(
            self._df(spark, {"a": {0: 3}}), bucket_seconds=3600
        ).count() == 0
        with pytest.raises(ValueError, match="bucket_seconds"):
            analytics.changepoint_report(
                self._df(spark, {"a": {0: 1}}), bucket_seconds=0)
        with pytest.raises(ValueError, match="missing columns"):
            analytics.changepoint_report(
                spark.createDataFrame([(1,)], "x long"))


class TestDiversityReport:
    SCHEMA = "event_type string, user_id long"

    def test_exact_simpson_and_effective(self, spark):
        rows = [("a", 1)] * 3 + [("a", 2)] + [("b", 9)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["gtype"]: r
               for r in analytics.diversity_report(df).collect()}
        a = out["a"]  # N=4, sum2=10
        assert (a["n_rows"], a["n_keys"]) == (4, 2)
        assert a["simpson_micro"] == 375_000       # (16-10)*1e6 // 16
        assert a["effective_keys_micro"] == 1_600_000
        b = out["b"]  # single key: no diversity, exactly one key
        assert b["simpson_micro"] == 0
        assert b["effective_keys_micro"] == 1_000_000

    def test_null_key_is_own_bucket(self, spark):
        rows = [("a", None), ("a", None), ("a", 3)]
        r = analytics.diversity_report(
            spark.createDataFrame(rows, self.SCHEMA)).collect()[0]
        # N=3, sum2=5 -> simpson (9-5)*1e6//9, effective 9e6//5
        assert r["n_keys"] == 2
        assert r["simpson_micro"] == 444_444
        assert r["effective_keys_micro"] == 1_800_000

    def test_validates(self, spark):
        with pytest.raises(ValueError, match="missing columns"):
            analytics.diversity_report(
                spark.createDataFrame([(1,)], "event_type string"))


class TestLDiversityReport:
    SCHEMA = "zip string, age string, diag string"

    def test_weak_groups_and_null_rules(self, spark):
        rows = [
            ("z1", "a", "flu"), ("z1", "a", "flu"), ("z1", "a", "cold"),
            ("z2", "b", "flu"), ("z2", "b", "flu"),        # homogeneous
            ("z3", "c", None), ("z3", "c", None),          # all-NULL: l=0
        ]
        df = spark.createDataFrame(rows, self.SCHEMA)
        r = analytics.l_diversity_report(
            df, ["zip", "age"], "diag", l=2).collect()[0]
        assert (r["n_rows"], r["n_groups"]) == (7, 3)
        assert r["n_weak_groups"] == 2 and r["n_weak_rows"] == 4
        assert r["weak_rows_micro"] == (4 * 1_000_000) // 7
        assert (r["min_l"], r["max_l"]) == (0, 2)

    def test_validates(self, spark):
        df = spark.createDataFrame([("a", "b", "c")], self.SCHEMA)
        with pytest.raises(ValueError, match="l must be >= 2"):
            analytics.l_diversity_report(df, ["zip"], "diag", l=1)
        with pytest.raises(ValueError, match="qi_cols"):
            analytics.l_diversity_report(df, [], "diag")
        with pytest.raises(ValueError, match="missing columns"):
            analytics.l_diversity_report(df, ["nope"], "diag")


class TestApdexReport:
    SCHEMA = "event_type string, value double"

    def test_bands_and_exact_milli(self, spark):
        rows = [("a", 5.0), ("a", 10.0), ("a", 15.0), ("a", 40.0),
                ("a", 41.0), ("a", None), ("b", 1.0)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["key"]: r
               for r in analytics.apdex_report(df, threshold=10.0).collect()}
        a = out["a"]  # sat 2 (<=10 inclusive), tol 2 (15, 40), fru 1
        assert (a["n"], a["n_satisfied"], a["n_tolerating"],
                a["n_frustrated"]) == (5, 2, 2, 1)
        assert a["apdex_milli"] == (2 * 2 + 2) * 500 // 5  # 600
        assert out["b"]["apdex_milli"] == 1000

    def test_validates(self, spark):
        df = spark.createDataFrame([("a", 1.0)], self.SCHEMA)
        with pytest.raises(ValueError, match="threshold"):
            analytics.apdex_report(df, threshold=0)
        with pytest.raises(ValueError, match="missing columns"):
            analytics.apdex_report(df, value_col="nope")


class TestExpHistogram:
    SCHEMA = "event_type string, value double"

    def test_power_of_two_bands(self, spark):
        # scale=1: v = floor(value) -> bit_length buckets
        rows = [("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0),
                ("a", 4.0), ("a", 7.9), ("a", -2.0), ("a", None)]
        df = spark.createDataFrame(rows, self.SCHEMA)
        out = {r["bucket"]: r
               for r in analytics.exp_histogram(df, scale=1).collect()}
        assert out[0]["n"] == 1 and out[0]["lo_scaled"] == 0
        assert out[1]["n"] == 1 and out[1]["lo_scaled"] == 1   # v=1
        assert out[2]["n"] == 2 and out[2]["lo_scaled"] == 2   # v=2,3
        assert out[3]["n"] == 2 and out[3]["lo_scaled"] == 4   # v=4,7
        assert out[3]["min_scaled"] == 4 and out[3]["max_scaled"] == 7
        neg = out[-1]
        assert neg["n"] == 1 and neg["lo_scaled"] is None

    def test_micro_scale_band_edges(self, spark):
        # 1.0 scaled to 1_000_000 -> bit_length 20 (2^19 <= v < 2^20)
        df = spark.createDataFrame([("a", 1.0)], self.SCHEMA)
        r = analytics.exp_histogram(df).collect()[0]
        assert r["bucket"] == 20 and r["lo_scaled"] == 2 ** 19

    def test_validates(self, spark):
        df = spark.createDataFrame([("a", 1.0)], self.SCHEMA)
        with pytest.raises(ValueError, match="scale"):
            analytics.exp_histogram(df, scale=0)
        with pytest.raises(ValueError, match="missing columns"):
            analytics.exp_histogram(df, key_col="nope")


class TestMadOutliers:
    SCHEMA = "event_type string, ts string"

    def _df(self, spark, hour_counts):
        rows = []
        for key, per_hour in hour_counts.items():
            for h, n in per_hour.items():
                rows += [(key, f"2024-01-01 {h:02d}:30:00")] * n
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"))

    def test_spike_flagged_median_robust(self, spark):
        # counts [3,3,4,4,5,50]: median (rank ceil(6/2)=3 of sorted)
        # = 4, devs [1,1,0,0,1,46], MAD (rank 3) = 1 -> only the 50
        # flags at k=5 (5*1=5 < 46)
        out = analytics.mad_outliers(
            self._df(spark, {"a": {0: 3, 1: 3, 2: 4, 3: 4, 4: 5, 5: 50}}),
            k=5).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_events"] == 50 and r["median"] == 4 and r["mad"] == 1
        assert str(r["bucket_ts"]) == "2024-01-01 05:00:00"

    def test_min_mad_floor_on_constant_series(self, spark):
        # constant counts + one small bump: MAD 0 floors to 1, so a
        # +3 bump does NOT flag at k=5 but a +8 bump does
        out1 = analytics.mad_outliers(
            self._df(spark, {"a": {h: 5 for h in range(6)} | {6: 8}}),
            k=5).collect()
        assert out1 == []
        out2 = analytics.mad_outliers(
            self._df(spark, {"a": {h: 5 for h in range(6)} | {6: 13}}),
            k=5).collect()
        assert len(out2) == 1 and out2[0]["n_events"] == 13

    def test_validates(self, spark):
        df = self._df(spark, {"a": {0: 1}})
        with pytest.raises(ValueError, match="bucket_seconds"):
            analytics.mad_outliers(df, bucket_seconds=0)
        with pytest.raises(ValueError, match="k must be"):
            analytics.mad_outliers(df, k=0)
        with pytest.raises(ValueError, match="min_mad"):
            analytics.mad_outliers(df, min_mad=0)
        with pytest.raises(ValueError, match="missing columns"):
            analytics.mad_outliers(df, key_col="nope")


class TestFunnelLatency:
    SCHEMA = "user_id long, event_type string, ts string"

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))

    def test_gaps_and_median(self, spark):
        rows = [
            # u1: view@0 -> click@10 -> purchase@70 (gaps 10 s, 60 s)
            (1, "view", "2024-01-01 00:00:00"),
            (1, "click", "2024-01-01 00:00:10"),
            (1, "purchase", "2024-01-01 00:01:10"),
            # u2: view@0 -> click@30 (gap 30 s); no purchase
            (2, "view", "2024-01-01 00:00:00"),
            (2, "click", "2024-01-01 00:00:30"),
            # u3: click BEFORE view -> never converts past step 1
            (3, "click", "2024-01-01 00:00:00"),
            (3, "view", "2024-01-01 00:00:05"),
        ]
        out = {r["step_idx"]: r for r in analytics.funnel_latency(
            self._df(spark, rows), ["view", "click", "purchase"]).collect()}
        two = out[2]
        assert two["n_users"] == 2
        # gaps sorted [10s, 30s], median rank ceil(2/2)=1 -> 10 s
        assert two["median_gap_us"] == 10_000_000
        assert two["max_gap_us"] == 30_000_000
        three = out[3]
        assert three["n_users"] == 1
        assert three["median_gap_us"] == 60_000_000

    def test_unreached_step_zero_row(self, spark):
        rows = [(1, "view", "2024-01-01 00:00:00")]
        out = {r["step_idx"]: r for r in analytics.funnel_latency(
            self._df(spark, rows), ["view", "click", "purchase"]).collect()}
        assert set(out) == {2, 3}
        assert out[2]["n_users"] == 0 and out[2]["median_gap_us"] is None

    def test_validates(self, spark):
        df = self._df(spark, [(1, "view", "2024-01-01 00:00:00")])
        with pytest.raises(ValueError, match="at least 2"):
            analytics.funnel_latency(df, ["view"])
        with pytest.raises(ValueError, match="distinct"):
            analytics.funnel_latency(df, ["view", "view"])
        with pytest.raises(ValueError, match="missing columns"):
            analytics.funnel_latency(df, ["view", "click"], user_col="nope")


class TestAttributionReport:
    SCHEMA = "user_id long, event_type string, ts string, event_id long"

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "event_id")

    def test_last_touch_lookback_and_direct(self, spark):
        rows = [
            # u1: view@0, click@100 -> purchase@160: last touch=click
            (1, "view", "2024-01-01 00:00:00", 0),
            (1, "click", "2024-01-01 00:01:40", 1),
            (1, "purchase", "2024-01-01 00:02:40", 2),
            # u2: view, then purchase 2 days later -> outside 1-day
            # lookback -> direct
            (2, "view", "2024-01-01 00:00:00", 3),
            (2, "purchase", "2024-01-03 00:00:00", 4),
            # u3: purchase with no touches at all -> direct
            (3, "purchase", "2024-01-01 00:00:00", 5),
            # error events are neither touch nor conversion
            (1, "error", "2024-01-01 00:02:00", 6),
        ]
        out = {r["channel"]: r for r in analytics.attribution_report(
            self._df(spark, rows), lookback_sec=86_400).collect()}
        assert set(out) == {"click", "direct"}
        c = out["click"]
        assert c["n_conversions"] == 1
        assert c["median_gap_us"] == 60_000_000
        assert c["share_micro"] == 1_000_000 // 3
        d = out["direct"]
        assert d["n_conversions"] == 2 and d["median_gap_us"] is None

    def test_ts_tie_touch_strictly_before(self, spark):
        # touch sharing the conversion's ts but a LOWER event_id is
        # strictly before in (ts, order) -> attributed, gap 0
        rows = [
            (1, "click", "2024-01-01 00:00:00", 10),
            (1, "purchase", "2024-01-01 00:00:00", 11),
        ]
        out = analytics.attribution_report(
            self._df(spark, rows)).collect()
        assert len(out) == 1
        assert out[0]["channel"] == "click" and out[0]["median_gap_us"] == 0

    def test_validates(self, spark):
        df = self._df(spark, [(1, "view", "2024-01-01 00:00:00", 0)])
        with pytest.raises(ValueError, match="touch_types"):
            analytics.attribution_report(df, touch_types=[])
        with pytest.raises(ValueError, match="cannot also be"):
            analytics.attribution_report(
                df, conversion_type="view", touch_types=["view"])
        with pytest.raises(ValueError, match="lookback_sec"):
            analytics.attribution_report(df, lookback_sec=0)
        with pytest.raises(ValueError, match="missing columns"):
            analytics.attribution_report(df, user_col="nope")


class TestGapHistogram:
    SCHEMA = "event_type string, ts string, event_id long"

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, self.SCHEMA).select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"),
            "event_id")

    def test_bands_and_first_event_no_gap(self, spark):
        rows = [
            ("a", "2024-01-01 00:00:00.000000", 0),
            ("a", "2024-01-01 00:00:00.000001", 1),  # gap 1 -> band 1
            ("a", "2024-01-01 00:00:00.000004", 2),  # gap 3 -> band 2
            ("a", "2024-01-01 00:00:00.000004", 3),  # gap 0 -> band 0
            ("b", "2024-01-01 00:00:00", 4),          # single: no gap
        ]
        out = {(r["key"], r["bucket"]): r for r in analytics.gap_histogram(
            self._df(spark, rows)).collect()}
        assert set(out) == {("a", 0), ("a", 1), ("a", 2)}
        assert out[("a", 0)]["lo_us"] == 0 and out[("a", 0)]["n"] == 1
        assert out[("a", 1)]["min_gap_us"] == 1
        assert out[("a", 2)]["lo_us"] == 2
        assert out[("a", 2)]["min_gap_us"] == 3

    def test_validates(self, spark):
        with pytest.raises(ValueError, match="missing columns"):
            analytics.gap_histogram(
                spark.createDataFrame([(1,)], "event_id long"))


class TestAttributionNegativeDomain:
    def test_pre_epoch_timestamps_attributed_correctly(self, spark):
        # negative epoch micros: the offset encoding must keep string
        # order = numeric order (plain zero-pad would mis-credit
        # 'direct')
        rows = [(1, "click", "1969-12-31 23:00:00", 0),
                (1, "purchase", "1969-12-31 23:30:00", 1)]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts string, "
            "event_id long").select(
            "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "event_id")
        out = analytics.attribution_report(df, lookback_sec=7200).collect()
        assert len(out) == 1
        assert out[0]["channel"] == "click"
        assert out[0]["median_gap_us"] == 1800 * 1_000_000


class TestUserLifetime:
    SCHEMA = "user_id long, ts string"

    def test_lifetime_days_and_density(self, spark):
        rows = [
            (1, "2024-01-01 10:00:00"), (1, "2024-01-01 23:59:59"),
            (1, "2024-01-03 00:00:00.500000"),
            (2, "2024-01-05 12:00:00"),
            (None, "2024-01-01 00:00:00"), (3, None),
        ]
        df = spark.createDataFrame(rows, self.SCHEMA).select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"))
        out = {r["user_id"]: r
               for r in analytics.user_lifetime(df).collect()}
        assert set(out) == {1, 2}
        one = out[1]
        assert one["n_events"] == 3 and one["active_days"] == 2
        # floor-second lifetime: .5s sub-second truncates per side
        assert one["lifetime_sec"] == (
            (2 * 86_400 - 10 * 3600))
        assert one["events_per_day_micro"] == 1_500_000
        two = out[2]
        assert two["lifetime_sec"] == 0 and two["active_days"] == 1

    def test_validates(self, spark):
        with pytest.raises(ValueError, match="missing columns"):
            analytics.user_lifetime(
                spark.createDataFrame([(1,)], "user_id long"))
