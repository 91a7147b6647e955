"""The headline end-to-end pipeline used by bench.py and the scaling
benchmark: synthetic transcripts -> parse -> filter -> route ->
per-sink aggregates.

This is the analog of the reference's file->blackhole regex benchmark
(test/benchmark/local/test_cases/performance_file_to_blackhole_
loongcollector/loongcollector.yaml: input_file -> regex parse with 11
groups -> regex filter -> blackhole), re-expressed over the
transcripts event model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.model import to_events
from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.sinks.writers import sink_aggregates
from ilogtail_spark.sources.transcripts import generate_transcripts

# nginx combined-log regex: the reference benchmark's 11-group parse
NGINX_REGEX = (
    r"(\S+) - (\S+) \[([^]]+)\] \"(\w+) (\S+) ([^\"]+)\" "
    r"(\d+) (\d+) \"([^\"]*)\" \"([^\"]*)\""
)
NGINX_KEYS = [
    "remote_addr",
    "remote_user",
    "time_local",
    "method",
    "url",
    "protocol",
    "status",
    "body_bytes_sent",
    "http_referer",
    "http_user_agent",
]

APPLOG_REGEX = (
    r"(\d{4}-\d{2}-\d{2} [\d:.]+) (\d+) \[(\S+)\] (\w+)\s+"
    r".*?latency_ms=(\d+) route=(\S+)"
)
APPLOG_KEYS = ["log_time", "seq", "worker", "level", "latency_ms", "route"]


def headline_pipeline() -> Pipeline:
    return Pipeline(
        processors=[
            # try nginx first; non-matching rows keep their source
            {
                "Type": "processor_regex",
                "Regex": NGINX_REGEX,
                "Keys": NGINX_KEYS,
                "KeepSource": True,
            },
            # app-log shape for rows the nginx regex didn't match
            {
                "Type": "processor_regex",
                "Regex": APPLOG_REGEX,
                "Keys": APPLOG_KEYS,
                "KeepSource": True,
            },
            # drop raw content once either parse succeeded
            {"Type": "processor_drop_last_key", "DropKey": "content", "Include": ["status"]},
            {"Type": "processor_add_fields", "Fields": {"pipeline": "headline"}},
        ],
        router={
            "Mode": "first_match",
            "SourceKey": "role",
            "RouterRegex": ["assistant", "tool", "user|system"],
            "RouterLogstore": ["sink_assistant", "sink_tool", "sink_user"],
            "DefaultLogstore": "sink_default",
        },
        flushers=[],
    )


def build_headline_pipeline(spark: SparkSession, n_turns: int) -> DataFrame:
    df = generate_transcripts(spark, n_turns=n_turns)
    ev = to_events(df)
    routed = headline_pipeline().route(ev)
    return sink_aggregates(routed, keys=["role", "tool"], time_bucket="1 hour")
