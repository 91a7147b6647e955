"""Structured Streaming tests: exactly-once file-source ingestion,
incremental resume from checkpoint, watermarked aggregates, stateful
token-bucket rate limit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.sources.transcripts import generate_transcripts
from ilogtail_spark.streaming import stream as stm

PIPE = Pipeline(
    processors=[
        {
            "Type": "processor_regex",
            "Regex": r"(\S+) (\d+) \[",
            "Keys": ["w1", "num"],
            "KeepSource": True,
        }
    ],
    router={
        "Mode": "first_match",
        "SourceKey": "role",
        "RouterRegex": ["assistant|user", "tool"],
        "RouterLogstore": ["sink_chat", "sink_tool"],
        "DefaultLogstore": "sink_other",
    },
)


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "in": str(tmp_path / "in"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    return d


def _write_batch(spark, path, n, seed):
    generate_transcripts(spark, n_turns=n, seed=seed).write.mode("append").parquet(path)


class TestStreamingPipeline:
    def test_available_now_matches_batch(self, spark, dirs):
        _write_batch(spark, dirs["in"], 2000, seed=1)
        q = stm.run_streaming_pipeline(
            stm.read_transcripts_stream(spark, dirs["in"]),
            PIPE,
            dirs["out"],
            dirs["ckpt"],
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{dirs['out']}/events")
        assert out.count() == 2000
        # batch equivalence: identical routing counts
        from ilogtail_spark.model import to_events

        batch = PIPE.route(to_events(spark.read.parquet(dirs["in"])))
        batch_counts = {
            r["__sink__"]: r["n"]
            for r in batch.groupBy("__sink__").agg(F.count("*").alias("n")).collect()
        }
        stream_counts = {
            r["sink"]: r["n"]
            for r in out.groupBy("sink").agg(F.count("*").alias("n")).collect()
        }
        assert stream_counts == batch_counts

    def test_incremental_resume_exactly_once(self, spark, dirs):
        _write_batch(spark, dirs["in"], 1000, seed=1)
        q = stm.run_streaming_pipeline(
            stm.read_transcripts_stream(spark, dirs["in"]),
            PIPE,
            dirs["out"],
            dirs["ckpt"],
        )
        q.awaitTermination(120)
        n1 = spark.read.parquet(f"{dirs['out']}/events").count()
        assert n1 == 1000
        # second batch arrives; restart from the SAME checkpoint -> only
        # the new file is processed (no duplicates)
        _write_batch(spark, dirs["in"], 500, seed=2)
        q2 = stm.run_streaming_pipeline(
            stm.read_transcripts_stream(spark, dirs["in"]),
            PIPE,
            dirs["out"],
            dirs["ckpt"],
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(f"{dirs['out']}/events").count() == 1500
        # a third run with nothing new is a no-op
        q3 = stm.run_streaming_pipeline(
            stm.read_transcripts_stream(spark, dirs["in"]),
            PIPE,
            dirs["out"],
            dirs["ckpt"],
        )
        q3.awaitTermination(120)
        assert spark.read.parquet(f"{dirs['out']}/events").count() == 1500

    def test_watermarked_aggregates(self, spark, dirs):
        _write_batch(spark, dirs["in"], 2000, seed=1)
        q = stm.run_streaming_aggregates(
            stm.read_transcripts_stream(spark, dirs["in"]),
            PIPE,
            dirs["out"],
            dirs["ckpt"],
        )
        q.awaitTermination(120)
        agg = spark.read.parquet(f"{dirs['out']}/aggregates")
        assert agg.columns == ["sink", "bucket_ts", "role", "events_total"]
        total = agg.agg(F.sum("events_total")).collect()[0][0]
        assert total == 2000


class TestStreamingRateLimit:
    def test_token_bucket(self, spark, dirs):
        rows = []
        import datetime as dt

        base = dt.datetime(2026, 1, 1)
        # 10 events in the same second for key A -> only `burst` pass;
        # spaced events for key B all pass
        for i in range(10):
            rows.append(("A", i, base))
        for i in range(5):
            rows.append(("B", i, base + dt.timedelta(seconds=2 * i)))
        spark.createDataFrame(
            rows, "key string, seq int, ts timestamp"
        ).write.parquet(dirs["in"])

        sdf = (
            spark.readStream.schema("key string, seq int, ts timestamp")
            .parquet(dirs["in"])
        )
        limited = stm.streaming_rate_limit(
            sdf, ["key"], limit_per_sec=1.0, burst=3
        )
        q = (
            limited.writeStream.format("parquet")
            .option("path", f"{dirs['out']}/rl")
            .option("checkpointLocation", f"{dirs['ckpt']}/rl")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.read.parquet(f"{dirs['out']}/rl")
        by_key = {
            r["key"]: r["n"]
            for r in out.groupBy("key").agg(F.count("*").alias("n")).collect()
        }
        assert by_key["A"] == 3  # burst only, no refill within the same second
        assert by_key["B"] == 5  # refill (2s gaps at 1/s) keeps all


def test_streaming_multiline_merge_across_batches(spark, tmp_path):
    """A logical event whose lines span two micro-batches merges via
    carried state; the trailing partial is withheld until its
    successor START arrives in a later run over the same checkpoint."""
    from ilogtail_spark.streaming.stream import streaming_multiline_merge

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx long, text string"

    def write_file(rows):
        import time as _time

        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        _time.sleep(1.1)  # distinct mtimes => deterministic batch order

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        merged = streaming_multiline_merge(
            stream, start_pattern="START.*", group_cols=["conv_id"],
            order_col="turn_idx", content_col="text",
        )
        (
            merged.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return {
            (r["conv_id"], r["evt_start"]): (r["n_lines"], r["merged"])
            for r in spark.read.parquet(out_dir).collect()
        }

    # batch 1: event A starts; batch 2 continues it and starts event B
    write_file([("c1", 0, "pre"), ("c1", 1, "START a"), ("c1", 2, "l1")])
    write_file([("c1", 3, "l2"), ("c1", 4, "START b"), ("c1", 5, "m1")])
    got = drain()
    # unmatched leading line -> its own event; event A complete (spans
    # the batch boundary); event B pending (no successor yet)
    assert got[("c1", 0)] == (1, "pre")
    assert got[("c1", 1)] == (3, "START a\nl1\nl2")
    assert ("c1", 4) not in got

    # a later file delivers the next START: event B flushes
    write_file([("c1", 6, "START c")])
    got2 = drain()
    assert got2[("c1", 4)] == (2, "START b\nm1")
    assert ("c1", 6) not in got2  # new trailing partial withheld


def test_streaming_multiline_force_emit_keeps_continuation(spark, tmp_path):
    """After a max_pending_lines force-emit, continuation lines of the
    oversize event arriving in LATER micro-batches must continue its
    chunk sequence — not be misread as before-first-start noise (and
    silently dropped under unmatched='discard')."""
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_multiline_merge

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx long, text string"

    def write_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        _time.sleep(1.1)

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        merged = streaming_multiline_merge(
            stream, start_pattern="START.*", group_cols=["conv_id"],
            order_col="turn_idx", content_col="text",
            unmatched="discard", max_pending_lines=3,
        )
        (
            merged.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return {
            (r["conv_id"], r["evt_start"]): (r["n_lines"], r["merged"])
            for r in spark.read.parquet(out_dir).collect()
        }

    # batch 1: the event hits the 3-line cap -> force-emitted chunk
    write_file([("c1", 0, "START a"), ("c1", 1, "l1"), ("c1", 2, "l2")])
    # batch 2: continuation lines of the SAME oversize event (no start)
    write_file([("c1", 3, "l3"), ("c1", 4, "l4")])
    # batch 3: next event boundary flushes the trailing chunk
    write_file([("c1", 5, "START b")])
    got = drain()
    assert got[("c1", 0)] == (3, "START a\nl1\nl2")  # force-emitted chunk
    assert got[("c1", 3)] == (2, "l3\nl4")  # continuation chunk, NOT dropped
    assert ("c1", 5) not in got  # new trailing partial withheld


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch is dropped by the
    engine's dedup state; the kept digest set equals the batch twin's."""
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_drop_exact_duplicates

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ts timestamp"

    spark.createDataFrame(
        [(1, "alpha", None), (2, "beta", None)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    spark.createDataFrame(
        [(3, "alpha", None), (4, "gamma", None)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = streaming_drop_exact_duplicates(stream)
    (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = spark.read.parquet(out_dir).collect()
    assert sorted(r["text"] for r in rows) == ["alpha", "beta", "gamma"]
    # the cross-batch duplicate (doc 3) lost to the first arrival
    assert {r["doc_id"] for r in rows if r["text"] == "alpha"} == {1}


def test_streaming_multiline_merge_out_of_order_batches(spark, tmp_path):
    """A later micro-batch delivering LOWER order values (late file
    pickup) still merges correctly: each pass re-sorts pending + new,
    so output is invariant to the batch split."""
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_multiline_merge

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "conv_id string, turn_idx long, text string"

    # file 1 (processed first): the HIGH turn range
    spark.createDataFrame(
        [("c1", 3, "START a"), ("c1", 4, "l4"), ("c1", 5, "l5")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    # file 2: the LOW range arrives later
    spark.createDataFrame(
        [("c1", 0, "pre"), ("c1", 1, "START b"), ("c1", 2, "l2")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    merged = streaming_multiline_merge(
        stream, start_pattern="START.*", group_cols=["conv_id"],
        order_col="turn_idx", content_col="text",
    )
    (
        merged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = {
        (r["conv_id"], r["evt_start"]): (r["n_lines"], r["merged"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got[("c1", 0)] == (1, "pre")
    assert got[("c1", 1)] == (2, "START b\nl2")  # completed by START a
    assert ("c1", 3) not in got  # trailing partial withheld


def test_streaming_sessionize_spans_batches_and_withholds_open_tail(
    spark, tmp_path
):
    """A session whose events straddle the micro-batch cut is emitted
    ONCE with the combined stats; each user's final open session stays
    in state (not emitted)."""
    import datetime as dt
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp, user_id long"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(i, secs, user):
        return (i, t0 + dt.timedelta(seconds=secs), user)

    # user 1: session A = events at 0s,10s (batch1) + 20s (batch2),
    # then a >gap jump to 2000s opens session B (stays pending).
    # user 2: one event only -> open session, never emitted.
    spark.createDataFrame(
        [ev(1, 0, 1), ev(2, 10, 1), ev(10, 5, 2)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    spark.createDataFrame(
        [ev(3, 20, 1), ev(4, 2000, 1)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    (
        streaming_sessionize(stream, gap_seconds=60)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1  # only user 1's closed session A
    r = rows[0]
    assert r["user_id"] == 1 and r["session_ordinal"] == 1
    assert r["n_events"] == 3
    assert (r["ended_us"] - r["started_us"]) == 20_000_000


class TestStreamingRateSpikes:
    def test_state_carries_across_batches(self, spark, tmp_path):
        import time as _time

        from ilogtail_spark.streaming.stream import streaming_rate_spikes

        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # 4 steady hours of 10 + one 100-event hour + a closer event;
        # split so the spike hour STRADDLES the two micro-batches
        rows = []
        eid = 0
        for h in range(4):
            for _ in range(10):
                rows.append((eid, "err", f"2024-01-01 0{h}:15:00")); eid += 1
        for m in (5, 10):  # first chunk of hour 4
            for _ in range(40):
                rows.append((eid, "err", f"2024-01-01 04:{m:02d}:00")); eid += 1
        batch1 = spark.createDataFrame(
            rows, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        rows2 = [(eid + i, "err", "2024-01-01 04:50:00") for i in range(20)]
        rows2.append((9999, "err", "2024-01-01 05:00:01"))  # closes hour 4
        batch2 = spark.createDataFrame(
            rows2, "event_id long, event_type string, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        batch1.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)
        batch2.coalesce(1).write.mode("append").parquet(in_dir)
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        (
            streaming_rate_spikes(stream, min_trailing=3)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = {
            r["bucket_us"]: r
            for r in spark.read.parquet(out_dir).collect()
        }
        # hours 0-4 closed (hour 5 stays pending) — hour 4 counts from
        # BOTH batches (80 + 20 = 100), trailing over 4 closed buckets
        assert len(out) == 5
        h4 = out[max(out)]
        assert h4["n_events"] == 100
        assert h4["trailing_n"] == 4 and h4["trailing_sum"] == 40
        assert bool(h4["is_spike"])
        # steady hours: not spikes (cold start or within factor)
        assert sum(1 for r in out.values() if r["is_spike"]) == 1


class TestStreamingNewTemplates:
    def test_emits_each_template_once_across_batches(self, spark, tmp_path):
        import time

        from ilogtail_spark.streaming.stream import streaming_new_templates

        in_dir = str(tmp_path / "in")
        out_dir = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        # batch 1: two shapes; batch 2: one repeat shape + one new one
        b1 = [("req 1 from 10.0.0.1",), ("ERROR code=0xAB retrying",)]
        b2 = [("req 99 from 10.9.9.9",), ("panic in alpha",)]
        spark.createDataFrame(b1, "line string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        time.sleep(1.1)
        spark.createDataFrame(b2, "line string").coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        stream = (
            spark.readStream.schema("line string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        (
            streaming_new_templates(stream, text_col="line")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = [
            r["template"]
            for r in spark.read.parquet(out_dir).collect()
        ]
        # the repeat shape in batch 2 must NOT re-emit: 3 templates
        assert sorted(got) == [
            "ERROR code=<HEX> retrying",
            "panic in alpha",
            "req <NUM> from <IP>",
        ]


def test_streaming_retry_storms_spans_batches_and_withholds_tail(
    spark, tmp_path
):
    """A storm chain straddling the micro-batch cut is emitted ONCE
    with combined stats; sub-min_run chains close silently; each
    identity's trailing open chain stays in state."""
    import datetime as dt
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_retry_storms

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, event_type string, ts timestamp"
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def ev(secs, user=1, etype="error"):
        return (user, etype, t0 + dt.timedelta(seconds=secs))

    # user 1: chain of 4 rows straddling the cut (0,100 | 200,300),
    # then >window jump to 5000 + one retry at 5050 (open 2-chain,
    # withheld). user 2: a 2-row chain closed by a late row -> below
    # min_run, silent.
    spark.createDataFrame(
        [ev(0), ev(100), ev(0, user=2), ev(50, user=2)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    spark.createDataFrame(
        [ev(200), ev(300), ev(5000), ev(5050), ev(9000, user=2)], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    (
        streaming_retry_storms(stream, window_sec=600, min_run=3)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1  # only user 1's closed 4-row storm
    r = rows[0]
    assert (r["user_id"], r["event_type"]) == (1, "error")
    assert r["n_rows"] == 4
    assert (r["run_ended_us"] - r["run_started_us"]) == 300_000_000


def test_streaming_retry_storms_validation(spark):
    from ilogtail_spark.streaming.stream import streaming_retry_storms

    df = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp")
    with pytest.raises(ValueError, match="window_sec"):
        streaming_retry_storms(df, window_sec=0)
    with pytest.raises(ValueError, match="min_run"):
        streaming_retry_storms(df, min_run=1)
    with pytest.raises(ValueError, match="at least one column"):
        streaming_retry_storms(df, identity_cols=[])


def test_streaming_outage_windows_gap_spans_batches(spark, tmp_path):
    """A silence gap whose closing event arrives in the NEXT
    micro-batch is emitted once with exact bounds; sub-threshold
    gaps and NULL keys/timestamps stay silent; a source that never
    recovers emits nothing."""
    import datetime as dt
    import time as _time

    from ilogtail_spark.streaming.stream import streaming_outage_windows

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_type string, ts timestamp"
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def ev(secs, key="api"):
        return (key, t0 + dt.timedelta(seconds=secs))

    # api: events at 0, 10 | (cut) | 7300 -> one 7290 s gap closing
    # in batch 2. db: small gaps only. quiet: one event then silence
    # forever -> nothing. NULL key and NULL ts rows are dropped.
    spark.createDataFrame(
        [ev(0), ev(10), ev(0, "db"), ev(0, "quiet"), (None, t0),
         ("api", None)],
        schema,
    ).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    spark.createDataFrame(
        [ev(7300), ev(100, "db")], schema
    ).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    (
        streaming_outage_windows(stream, min_gap_seconds=3600)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["key"] == "api" and r["gap_sec"] == 7290
    assert (r["gap_end_us"] - r["gap_start_us"]) == 7290 * 1_000_000


def test_streaming_outage_windows_validation(spark):
    from ilogtail_spark.streaming.stream import streaming_outage_windows

    df = spark.createDataFrame([], "event_type string, ts timestamp")
    with pytest.raises(ValueError, match="min_gap_seconds"):
        streaming_outage_windows(df, min_gap_seconds=0)
    with pytest.raises(ValueError, match="missing columns"):
        streaming_outage_windows(df, key_col="nope")
