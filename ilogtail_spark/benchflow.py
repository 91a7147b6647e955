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


def enriched_pipeline() -> Pipeline:
    base = headline_pipeline()
    return Pipeline(
        processors=base.processors
        + [
            {
                "Type": "processor_dict_map",
                "SourceKey": "tool",
                "DestKey": "tool_class",
                "MapDict": {
                    "search": "retrieval",
                    "code": "execution",
                    "browser": "retrieval",
                    "calc": "execution",
                },
            }
        ],
        router=base.router,
        flushers=base.flushers,
    )


def build_headline_routed(
    spark: SparkSession, n_turns: int, enriched: bool = False
) -> DataFrame:
    """The routed EVENT frame — fields map included.

    Benchmarks must consume THIS frame (or aggregates derived from the
    fields map): an aggregate keyed only on top-level mirror columns
    lets Catalyst prune the whole parse chain out of the plan, and the
    'benchmark' then measures generation + routing of unparsed rows.
    (That pruning is a FEATURE for real aggregate-only queries — just
    not what a parse benchmark should measure.)
    """
    df = generate_transcripts(spark, n_turns=n_turns)
    ev = to_events(df)
    pipe = enriched_pipeline() if enriched else headline_pipeline()
    return pipe.route(ev)


def build_headline_pipeline(spark: SparkSession, n_turns: int) -> DataFrame:
    return build_headline_routed(spark, n_turns, enriched=False)


def build_headline_enriched(spark: SparkSession, n_turns: int) -> DataFrame:
    return build_headline_routed(spark, n_turns, enriched=True)


def headline_aggregates(routed: DataFrame) -> DataFrame:
    return sink_aggregates(routed, keys=["role", "tool"], time_bucket="1 hour")


def main() -> int:
    """Single-process benchmark runner: times the headline pipeline at
    the session's master (used by tools/scaling_bench.py to measure
    the two-parallelism scaling criterion in separate JVMs)."""
    import argparse
    import json
    import time

    from ilogtail_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--warmup-turns", type=int, default=50_000)
    ap.add_argument("--master", default=None)
    ap.add_argument("--enriched", action="store_true")
    ap.add_argument(
        "--repeats",
        type=int,
        default=5,
        help="best-of-N wall time (min): robust to co-tenant CPU steal "
        "on shared hosts, which otherwise dominates local[32] runs",
    )
    args = ap.parse_args()

    # AQE stays ON (it's the production config) but the advisory
    # post-shuffle partition size is lowered for BENCHMARK-scale data:
    # the default 64 MB would coalesce a few-million-row run into 2-4
    # tasks and measure nothing but stragglers — at 100 TB the default
    # is correct and coalescing is the feature, not the bug.
    spark = get_spark(
        app_name="ilogtail_spark_scaling",
        master=args.master,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            # scan splits sized for benchmark data: the 128m default
            # would give a ~1 GB input only ~8 scan tasks, capping the
            # parse stage below the core count (at 100 TB the default
            # is right — there are always enough splits)
            "spark.sql.files.maxPartitionBytes": "8m",
            # standard straggler hygiene (deterministic tasks + noop /
            # idempotent sinks make re-execution safe)
            "spark.speculation": "true",
            "spark.speculation.multiplier": "2",
            "spark.speculation.quantile": "0.9",
        },
    )

    def consume(df: DataFrame) -> None:
        df.write.format("noop").mode("overwrite").save()

    # materialize the input ONCE, untimed: the metric is the pipeline
    # over a transcripts TABLE (BASELINE.json), so generation (and its
    # row_number window shuffle) must not pollute the measurement; the
    # timed path reads parquet like production reads Iceberg
    import shutil
    import tempfile

    input_dir = tempfile.mkdtemp(prefix="benchflow_")
    try:
        # 128 files -> >=4 task waves at 32 cores: with one task per
        # core, a single straggler (co-tenant steal, GC pause) gates the
        # whole stage; finer granularity lets the scheduler rebalance
        generate_transcripts(spark, n_turns=args.turns).repartition(128).write.mode(
            "overwrite"
        ).parquet(input_dir)

        def build(limit: int | None = None):
            pipe = (
                enriched_pipeline() if args.enriched else headline_pipeline()
            )
            src = spark.read.parquet(input_dir)
            if limit:
                src = src.limit(limit)
            ev = to_events(src)
            routed = pipe.route(ev)
            return routed, headline_aggregates(routed)

        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        SINKS = ["sink_assistant", "sink_tool", "sink_user", "sink_default"]

        def with_sink_counts(routed):
            """Per-sink routed-row aggregates via df.observe: computed
            MAP-SIDE during the same pass that materializes the parsed
            events — zero extra scan, exactly the reference's per-sink
            self-monitor counters. (The hourly bucketed aggregate TABLE
            is a separate product output; the headline metric counts
            one end-to-end parse->enrich->route->aggregate pass.)"""
            ob = Observation()
            observed = routed.observe(
                ob,
                F.count(F.lit(1)).alias("total"),
                *[
                    F.count_if(F.col("__sink__") == s).alias(s)
                    for s in SINKS
                ],
            )
            return observed, ob

        w_routed, _w_agg = build(limit=args.warmup_turns)
        consume(w_routed)  # JIT/codegen warmup, small slice
        # build the plan ONCE (py4j expression construction + analysis
        # are driver-side, paid per DataFrame; a production job pays
        # them once for hours of execution)
        routed, _agg = build()
        times = []
        sink_counts: dict = {}
        for _ in range(args.repeats):
            observed, ob = with_sink_counts(routed)
            t0 = time.time()
            consume(observed)  # parse+enrich+route+aggregate, one pass
            sink_counts = dict(ob.get)
            times.append(time.time() - t0)
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)
    dt = min(times)
    print(
        json.dumps(
            {
                "master": spark.sparkContext.master,
                "turns": args.turns,
                "sec": round(dt, 3),
                "turns_per_sec": round(args.turns / dt),
                "all_secs": [round(x, 3) for x in times],
                "sink_counts": sink_counts,
            }
        )
    )
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
