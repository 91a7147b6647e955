"""Run manifests: resumable, idempotent pipeline runs + stage metrics.

Model: the reference's checkpoints — per-file read offsets with
committed flags (core/protobuf/sls/checkpoint.proto:18-38,
PrimaryCheckpointPB/RangeCheckpointPB) and the Go leveldb
(config,key) store (pluginmanager/checkpoint_manager.go:26-118) —
plus its self-monitor counters (in/out/discarded per plugin,
pkg/selfmonitor/metrics_constants_plugin.go:38-41).

Spark mapping: a JSON manifest per run_id recording the input file
set, per-phase commit flags, per-sink routed-row counts and stage
metrics. Writes are idempotent per run_id (overwrite of the run_id
directory), so a crashed run re-executed with the same run_id
converges to exactly-once output; completed phases are skipped.
At cluster scale the manifest would live in the Iceberg table's
snapshot properties / a control table — the contract is identical.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import asdict, dataclass, field as dc_field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.sinks import writers


@dataclass
class RunManifest:
    run_id: str
    input_files: list = dc_field(default_factory=list)
    phases: dict = dc_field(default_factory=dict)  # phase -> bool committed
    sink_counts: dict = dc_field(default_factory=dict)  # sink -> rows
    metrics: dict = dc_field(default_factory=dict)  # stage counters
    finished: bool = False
    events_location: str = ""  # parquet dir or Iceberg table identifier

    @staticmethod
    def path(out_root: str, run_id: str) -> str:
        return f"{out_root}/_lineage/{run_id}.json"

    @classmethod
    def load(cls, out_root: str, run_id: str) -> "RunManifest":
        p = cls.path(out_root, run_id)
        if os.path.exists(p):
            with open(p) as f:
                return cls(**json.load(f))
        return cls(run_id=run_id)

    def save(self, out_root: str) -> None:
        p = self.path(out_root, self.run_id)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p))
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(self), f, indent=1, sort_keys=True)
        os.replace(tmp, p)  # atomic commit of the checkpoint


def run_pipeline(
    spark: SparkSession,
    df: DataFrame,
    pipeline: Pipeline,
    out_root: str,
    run_id: str,
    agg_keys: list[str] | None = None,
    time_bucket: str = "1 hour",
    fail_after_phase: str | None = None,  # test hook: simulate a crash
) -> RunManifest:
    """parse -> enrich -> route -> write events -> write aggregates.

    Phase commits make the run resumable: rerunning a crashed run_id
    skips committed phases and overwrites nothing that's final.
    """
    manifest = RunManifest.load(out_root, run_id)
    if manifest.finished:
        return manifest

    if not manifest.phases.get("events"):
        from ilogtail_spark.plans.pipeline import StageObserver

        obs_in = Observation()
        observed = df.observe(obs_in, F.count(F.lit(1)).alias("in_events_total"))
        stages = StageObserver()
        routed = pipeline.route(observed, stage_observer=stages)
        manifest.events_location = writers.write_routed(routed, out_root, run_id)
        manifest.input_files = sorted(df.inputFiles()) if df.isStreaming is False else []
        stage_metrics = stages.collect()
        manifest.metrics["in_events_total"] = obs_in.get["in_events_total"]
        router_stage = next(
            (v for k, v in reversed(stage_metrics.items()) if k.startswith("router")),
            None,
        )
        manifest.metrics["out_events_total"] = (
            router_stage["out_events_total"]
            if router_stage
            else manifest.metrics["in_events_total"]
        )
        manifest.metrics["discarded_events_total"] = (
            manifest.metrics["in_events_total"]
            - manifest.metrics["out_events_total"]
        )
        # per-stage self-monitor counters (in/out/discarded per plugin,
        # pkg/selfmonitor/metrics_constants_plugin.go:38-41)
        manifest.metrics["stages"] = stage_metrics
        manifest.phases["events"] = True
        manifest.save(out_root)
    if fail_after_phase == "events":
        return manifest

    if not manifest.phases.get("aggregates"):
        # aggregate FROM the committed events (stable input on resume;
        # also avoids recomputing the parse chain) — wherever phase 1
        # committed them (run_id parquet dir, or the Iceberg table)
        events = writers.read_events_back(
            spark,
            manifest.events_location or writers.events_path(out_root, run_id),
            run_id,
        )
        agg = writers.sink_aggregates(events, keys=agg_keys, time_bucket=time_bucket)
        writers.write_aggregates(agg, out_root, run_id)
        counts = (
            agg.groupBy("sink").agg(F.sum("events_total").alias("n")).collect()
        )
        manifest.sink_counts = {r["sink"]: r["n"] for r in counts}
        manifest.phases["aggregates"] = True
        manifest.save(out_root)
    if fail_after_phase == "aggregates":
        return manifest

    manifest.finished = True
    manifest.save(out_root)
    return manifest


@dataclass
class SeriesState:
    """Checkpoint state of an incremental run SERIES — the batch-mode
    analog of the reference's per-file range checkpoints
    (core/protobuf/sls/checkpoint.proto:18-38 RangeCheckpointPB: a
    committed flag per read range). Parquet files are immutable, so
    file == range and the committed set is simply the union of input
    files of all FINISHED increments; on an Iceberg table the same
    state is the last-processed snapshot id and the delta is an
    incremental snapshot-range read."""

    series: str
    processed_files: list = dc_field(default_factory=list)
    run_ids: list = dc_field(default_factory=list)
    next_seq: int = 0

    @staticmethod
    def path(out_root: str, series: str) -> str:
        return f"{out_root}/_lineage/{series}.series.json"

    @classmethod
    def load(cls, out_root: str, series: str) -> "SeriesState":
        p = cls.path(out_root, series)
        if os.path.exists(p):
            with open(p) as f:
                return cls(**json.load(f))
        return cls(series=series)

    def save(self, out_root: str) -> None:
        p = self.path(out_root, self.series)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p))
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(self), f, indent=1, sort_keys=True)
        os.replace(tmp, p)


def incremental_run(
    spark: SparkSession,
    input_dir: str,
    pipeline: Pipeline,
    out_root: str,
    series: str,
    agg_keys: list[str] | None = None,
    time_bucket: str = "1 hour",
    to_events_fn=None,
) -> RunManifest | None:
    """Process only the parquet files added to ``input_dir`` since the
    last increment of ``series``; returns None when there is nothing
    new (a cheap listing, no job). Each increment is a normal
    resumable :func:`run_pipeline` run (run_id = ``{series}_{seq}``),
    so a crash mid-increment resumes idempotently and the series
    state only advances once the increment FINISHES — the same
    commit-after-write contract as the reference's range checkpoints.

    Scale note: the delta listing is driver-side file metadata (names
    only, no data); the job itself reads only the new files, so
    incremental cost is O(delta), never O(history)."""
    state = SeriesState.load(out_root, series)
    listed = spark.read.format("parquet").load(input_dir)
    current = sorted(set(listed.inputFiles()))
    done = set(state.processed_files)
    new_files = [f for f in current if f not in done]
    if not new_files:
        return None
    run_id = f"{series}_{state.next_seq:06d}"
    df = spark.read.parquet(*new_files)
    if to_events_fn is not None:
        df = to_events_fn(df)
    manifest = run_pipeline(
        spark, df, pipeline, out_root, run_id,
        agg_keys=agg_keys, time_bucket=time_bucket,
    )
    if manifest.finished:
        state.processed_files = sorted(done | set(manifest.input_files))
        state.run_ids.append(run_id)
        state.next_seq += 1
        state.save(out_root)
    return manifest
