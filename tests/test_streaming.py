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
