"""End-to-end slice (SURVEY.md §7.1 step 1): synthetic transcripts ->
regex parse -> router -> multi-sink write + per-sink aggregates +
lineage manifest. Correctness vs an INDEPENDENT pure-Python oracle
(re module over collected rows), mirroring the reference's e2e
verifiers (test/engine/verify/{count,log_field,log_context}.go).
"""

import re

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.model import to_events
from ilogtail_spark.plans.lineage import RunManifest, run_pipeline
from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.sinks import writers
from ilogtail_spark.sources.transcripts import generate_transcripts

N = 3000

APPLOG_RE = r"^(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) (\d+) \[([^\]]+)\] (\w+)  (.*)$"


@pytest.fixture(scope="module")
def transcripts(spark):
    df = generate_transcripts(spark, n_turns=N, seed=42)
    df.cache()
    df.count()
    return df


def pipeline():
    return Pipeline(
        processors=[
            {
                "Type": "processor_regex",
                "SourceKey": "content",
                "Regex": APPLOG_RE,
                "Keys": ["log_time", "tid", "thread", "level", "msg"],
                "KeepSource": True,
            },
        ],
        router={
            "Mode": "first_match",
            "SourceKey": "role",
            "RouterRegex": ["user|assistant", "tool"],
            "RouterLogstore": ["sink_chat", "sink_tool"],
            "DefaultLogstore": "sink_default",
        },
        flushers=[
            {"Name": "sink_chat"},
            {"Name": "sink_tool"},
            {"Name": "sink_default"},
        ],
    )


def python_oracle(rows):
    """Independent reimplementation with stdlib re only."""
    pat = re.compile("(?s)" + APPLOG_RE)
    out = []
    for r in rows:
        # empty string is a present key with empty value (the reference's
        # contents map keeps empty values; only ABSENT keys are missing)
        fields = {"content": r["text"], "role": r["role"], "tool": r["tool"]}
        m = pat.search(r["text"])
        if m:
            for k, v in zip(["log_time", "tid", "thread", "level", "msg"], m.groups()):
                fields[k] = v
        role = r["role"]
        if role in ("user", "assistant"):
            sink = "sink_chat"
        elif role == "tool":
            sink = "sink_tool"
        else:
            sink = "sink_default"
        out.append((r["conv_id"], r["turn_idx"], sink, fields))
    return out


def test_generator_is_deterministic(spark):
    a = generate_transcripts(spark, n_turns=500, seed=42).collect()
    b = generate_transcripts(spark, n_turns=500, seed=42).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_generator_schema_and_skew(transcripts):
    assert [f.name for f in transcripts.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    per_conv = transcripts.groupBy("conv_id").count().collect()
    counts = sorted((r["count"] for r in per_conv), reverse=True)
    assert counts[0] > 5 * counts[len(counts) // 2]  # hot conversations exist


def test_e2e_counts_fields_and_resume(spark, transcripts, tmp_path):
    out_root = str(tmp_path / "out")
    run_id = "r1"
    events = to_events(transcripts)
    manifest = run_pipeline(
        spark, events, pipeline(), out_root, run_id, agg_keys=["role", "tool"]
    )

    rows = transcripts.collect()
    oracle = python_oracle(rows)

    # per-sink routed-row counts (verify/count.go analog)
    expected_counts: dict = {}
    for _, _, sink, _ in oracle:
        expected_counts[sink] = expected_counts.get(sink, 0) + 1
    assert manifest.sink_counts == expected_counts
    assert manifest.metrics["in_events_total"] == N
    assert manifest.metrics["out_events_total"] == N  # first_match w/o drop

    # per-turn field equality incl. text round-trip under stable order
    # (verify/log_field.go + log_order.go analog)
    got = {
        (r["conv_id"], r["turn_idx"]): (r["sink"], dict(r["fields"]))
        for r in spark.read.parquet(writers.events_path(out_root, run_id)).collect()
    }
    assert len(got) == N
    for conv_id, turn_idx, sink, fields in oracle:
        g_sink, g_fields = got[(conv_id, turn_idx)]
        assert g_sink == sink
        assert g_fields == fields, (conv_id, turn_idx)

    # aggregate table == oracle counts per (sink, bucket, role, tool)
    agg = spark.read.parquet(writers.agg_path(out_root, run_id))
    assert agg.agg(F.sum("events_total")).collect()[0][0] == N

    # resume: a finished run is a no-op (manifest short-circuits)
    m2 = run_pipeline(spark, events, pipeline(), out_root, run_id)
    assert m2.finished and m2.sink_counts == expected_counts


def test_crash_resume_no_duplicates(spark, transcripts, tmp_path):
    out_root = str(tmp_path / "out2")
    events = to_events(transcripts.limit(300))
    # simulate a crash after the events phase, before aggregates
    m1 = run_pipeline(
        spark, events, pipeline(), out_root, "rX", fail_after_phase="events"
    )
    assert m1.phases.get("events") and not m1.phases.get("aggregates")
    assert not m1.finished

    m2 = run_pipeline(spark, events, pipeline(), out_root, "rX")
    assert m2.finished
    total = spark.read.parquet(writers.events_path(out_root, "rX")).count()
    assert total == 300  # no duplicated sink rows after resume
    assert sum(m2.sink_counts.values()) == 300


def test_incremental_series_processes_only_new_files(spark, transcripts, tmp_path):
    """File-range checkpoint semantics (checkpoint.proto:18-38 analog):
    each increment of a series reads only files not committed by a
    previous FINISHED increment; an unchanged input is a no-op; the
    union of increments equals one full run."""
    from ilogtail_spark.plans.lineage import SeriesState, incremental_run

    in_dir = str(tmp_path / "in")
    out_root = str(tmp_path / "out3")
    first = transcripts.limit(400)
    first.coalesce(1).write.mode("append").parquet(in_dir)

    m1 = incremental_run(
        spark, in_dir, pipeline(), out_root, "ser",
        agg_keys=["role", "tool"], to_events_fn=to_events,
    )
    assert m1 is not None and m1.finished
    n1 = sum(m1.sink_counts.values())
    assert n1 == 400

    # unchanged input -> no-op, state untouched
    assert incremental_run(
        spark, in_dir, pipeline(), out_root, "ser",
        agg_keys=["role", "tool"], to_events_fn=to_events,
    ) is None

    # append a new file: only the delta is processed
    delta = transcripts.orderBy("conv_id", "turn_idx").limit(700).subtract(first)
    n_delta = delta.count()
    assert n_delta > 0
    delta.coalesce(1).write.mode("append").parquet(in_dir)
    m2 = incremental_run(
        spark, in_dir, pipeline(), out_root, "ser",
        agg_keys=["role", "tool"], to_events_fn=to_events,
    )
    assert m2 is not None and m2.finished
    assert sum(m2.sink_counts.values()) == n_delta
    assert m2.metrics["in_events_total"] == n_delta

    state = SeriesState.load(out_root, "ser")
    assert state.run_ids == ["ser_000000", "ser_000001"]
    # committed set covers every current input file
    listed = set(spark.read.parquet(in_dir).inputFiles())
    assert listed <= set(state.processed_files)


def test_stable_turn_ordering(spark, transcripts):
    from ilogtail_spark.model import stable_order

    ordered = stable_order(to_events(transcripts))
    pdf = ordered.select("conv_id", "turn_idx").toPandas()
    # within each partition-contiguous conv block, turn_idx ascends
    last = {}
    violations = 0
    for conv, idx in zip(pdf["conv_id"], pdf["turn_idx"]):
        if conv in last and idx <= last[conv]:
            violations += 1
        last[conv] = idx
    assert violations == 0


def test_iceberg_capability_documented(spark):
    """The Iceberg upgrade path is gated on the runtime jar; in this
    image it must be absent (no jar, no network) so the writer takes
    the parquet fallback — executable documentation of the blocker."""
    from ilogtail_spark.sinks.writers import iceberg_available

    assert iceberg_available(spark) is False


def test_iceberg_incremental_read_gated(spark):
    """Snapshot-range incremental read: exercised for real only when
    the runtime jar exists; here the capability gate must raise the
    typed error (and the test would flip to a live read if a jar
    ever appears in the image)."""
    import pytest as _pytest

    from ilogtail_spark.sinks import writers

    if writers.iceberg_available(spark):  # pragma: no cover - jar present
        df = writers.read_events_incremental(spark, "ilogtail.events")
        assert df.schema is not None
        _pytest.skip("iceberg runtime present; live read smoke passed")
    with _pytest.raises(writers.IcebergUnavailableError):
        writers.read_events_incremental(spark, "ilogtail.events", 1, 2)


def test_cli_yaml_config_runs_pipeline(spark, tmp_path, capsys):
    """--config pipeline.yaml: the reference's native config surface
    (CollectionPipeline.cpp:119 loads YAML pipelines); same pipeline
    dict, YAML syntax, end-to-end through the CLI entry point."""
    from ilogtail_spark import run as cli

    cfg = tmp_path / "pipe.yaml"
    cfg.write_text(
        """\
processors:
  - Type: processor_regex
    SourceKey: content
    Regex: '^(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3}) (\\d+) \\[([^\\]]+)\\] (\\w+)  (.*)$'
    Keys: [log_time, tid, thread, level, msg]
    KeepSource: true
router:
  Mode: first_match
  SourceKey: role
  RouterRegex: ['user|assistant', 'tool']
  RouterLogstore: [sink_chat, sink_tool]
  DefaultLogstore: sink_default
flushers:
  - Name: sink_chat
  - Name: sink_tool
  - Name: sink_default
agg_keys: [role, tool]
"""
    )
    rc = cli.main(
        [
            "--config", str(cfg),
            "--input", "synthetic:2000",
            "--out", str(tmp_path / "yout"),
            "--run-id", "y1",
        ]
    )
    assert rc == 0
    import json as _json

    line = capsys.readouterr().out.strip().splitlines()[-1]
    res = _json.loads(line)
    assert res["finished"] is True
    assert sum(res["sink_counts"].values()) == 2000
    assert set(res["sink_counts"]) == {"sink_chat", "sink_tool", "sink_default"}


def test_load_config_rejects_non_mapping(tmp_path):
    from ilogtail_spark import run as cli

    bad = tmp_path / "bad.yaml"
    bad.write_text("- just\n- a list\n")
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        cli.load_config(str(bad))


def test_write_routed_missing_sink_col_raises(spark, tmp_path):
    """An unrouted frame (no __sink__) that happens to carry a DATA
    column named 'sink' must error loudly, not silently partition by
    the data column (withColumnRenamed no-ops on a missing source)."""
    from pyspark.sql import functions as F

    from ilogtail_spark.sinks import writers

    df = spark.range(5).select(
        F.col("id"), F.lit("legacy").alias("sink")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="__sink__"):
        writers.write_routed(df, str(tmp_path), "r1")
