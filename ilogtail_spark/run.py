"""spark-submit entry point: run a pipeline config over an input table.

Usage (local or cluster — the script is the same; on a cluster add
--master/--py-files to spark-submit):

    spark-submit [--py-files ilogtail_spark.zip] -m ilogtail_spark.run \
        --config pipeline.json --input /path/transcripts.parquet \
        --out /path/out --run-id r42

    python -m ilogtail_spark.run --config pipeline.json \
        --input synthetic:100000 --out /tmp/out --run-id r1

The config is JSON or YAML (*.yaml/*.yml — the reference's native
pipeline-config surface); both carry the same mapping:

    {
      "processors": [{"Type": "processor_regex", ...}, ...],
      "router": {"Mode": "first_match", ...},
      "flushers": [{"Name": "sink_a", ...}, ...],
      "agg_keys": ["role", "tool"],
      "time_bucket": "1 hour"
    }
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def load_config(path: str) -> dict:
    """Load a pipeline config — JSON, or YAML for *.yaml/*.yml (the
    reference pipelines are YAML, CollectionPipeline.cpp:119; JSON
    stays the programmatic default). YAML is parsed with safe_load
    only — configs are data, never executable tags."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f)
    else:
        with open(path) as f:
            cfg = json.load(f)
    if not isinstance(cfg, dict):
        raise SystemExit(f"config {path} must be a mapping, got {type(cfg).__name__}")
    return _normalize_reference_config(cfg)


def _normalize_reference_config(cfg: dict) -> dict:
    """Accept a pipeline file written for the REFERENCE agent verbatim
    (example_config/*/config/*.yaml): its `enable`/`global` keys are
    control-plane settings with no Spark analog (dropped), `inputs`
    name file/container sources that this runner replaces with
    --input (dropped with a stderr note so nobody thinks a path was
    honored), and flushers carry `Type: flusher_xxx` instead of a
    sink `Name` — derive Name from Type so routing has a sink label.
    Processor Type names are already shared with the reference, so
    the `processors` list passes through untouched."""
    cfg = dict(cfg)
    if cfg.pop("enable", True) is False:
        # the reference agent would NOT run this pipeline; silently
        # executing a disabled config is an operational trap — make
        # the operator remove it from the command line instead
        raise SystemExit(
            "config is disabled (enable: false) — remove it from --config"
        )
    cfg.pop("global", None)
    if cfg.pop("inputs", None) is not None:
        print(
            "note: config 'inputs' section ignored — the input table "
            "comes from --input",
            file=sys.stderr,
        )
    flushers = []
    seen: dict[str, int] = {}
    for fl in cfg.get("flushers", []) or []:
        fl = dict(fl)
        if "Name" not in fl and "Type" in fl:
            base = str(fl["Type"]).removeprefix("flusher_")
            # two flushers of the same Type are distinct sinks in the
            # reference (e.g. two flusher_sls projects) — suffix the
            # derived name instead of silently merging their routes
            seen[base] = seen.get(base, 0) + 1
            fl["Name"] = base if seen[base] == 1 else f"{base}_{seen[base]}"
        flushers.append(fl)
    cfg["flushers"] = flushers
    return cfg


def _load_input(spark, args):
    from ilogtail_spark.model import to_events

    if args.input.startswith("synthetic:"):
        from ilogtail_spark.sources.transcripts import generate_transcripts

        df = generate_transcripts(spark, n_turns=int(args.input.split(":", 1)[1]))
    else:
        df = spark.read.parquet(args.input)
    return to_events(df, content_col=args.content_col)


def _run_multi(spark, args, cfgs: dict, make_pipe) -> int:
    """Batch multi-config run — M pipelines over ONE scan (the
    reference agent's operating mode: CollectionPipelineManager keeps
    a name->pipeline map and offers every event group to each).
    Output: events partitioned by (config, sink[, topic]) under the
    run_id directory via the SAME write path as single-config runs
    (writers.write_routed — topic handling, file sizing, and the
    Iceberg branch included), idempotent per run_id; the manifest
    commits per phase (events, then each config's aggregates) so a
    crash resumes at the failed phase instead of re-scanning. Reruns
    of a finished run_id short-circuit exactly like single-config
    runs."""
    from pyspark.sql import functions as F

    from ilogtail_spark.plans.lineage import RunManifest
    from ilogtail_spark.plans.multi import CONFIG_COL, run_pipelines, sink_counts
    from ilogtail_spark.sinks.writers import sink_aggregates, write_routed

    manifest = RunManifest.load(args.out, args.run_id)
    t0 = time.time()
    if not manifest.finished:
        events = _load_input(spark, args)
        try:
            routed = run_pipelines(
                events, {name: make_pipe(c) for name, c in cfgs.items()}
            )
            if not manifest.phases.get("events"):
                manifest.events_location = write_routed(
                    routed, args.out, args.run_id,
                    leading_partitions={CONFIG_COL: "config"},
                )
                # counts from the (still-cached) routed frame, NOT a
                # re-read of the output: one aggregate instead of a
                # second full pass, and an all-rows-dropped run yields
                # {} instead of an unreadable empty parquet directory
                manifest.sink_counts = dict(
                    sorted(
                        (f"{c}/{s}", n)
                        for (c, s), n in sink_counts(routed).items()
                    )
                )
                manifest.phases["events"] = True
                manifest.save(args.out)  # commit the expensive phase
            for name, c in cfgs.items():
                keys = c.get("agg_keys")
                if keys is None or manifest.phases.get(f"aggregates:{name}"):
                    continue
                agg = sink_aggregates(
                    routed.filter(F.col(CONFIG_COL) == name).drop(CONFIG_COL),
                    keys=keys,
                    time_bucket=c.get("time_bucket", "1 hour"),
                )
                agg.write.mode("overwrite").parquet(
                    f"{args.out}/aggregates/run_id={args.run_id}/config={name}"
                )
                manifest.phases[f"aggregates:{name}"] = True
                manifest.save(args.out)
        finally:
            events.unpersist()
        manifest.finished = True
        manifest.save(args.out)
    elapsed = time.time() - t0
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "mode": "multi",
                "configs": sorted(cfgs),
                "finished": manifest.finished,
                "elapsed_sec": round(elapsed, 3),
                "sink_counts": manifest.sink_counts,
            },
            sort_keys=True,
        )
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ilogtail_spark.run", description=__doc__)
    ap.add_argument(
        "--config",
        required=True,
        nargs="+",
        help="pipeline config file(s) — JSON, or YAML (*.yaml/*.yml), the "
        "reference's native pipeline-config surface. Several files = "
        "the reference agent's multi-config mode: every pipeline runs "
        "over ONE scan of the input (batch mode only), outputs "
        "partitioned by (config, sink); each config is named by its "
        "file stem",
    )
    ap.add_argument(
        "--input",
        required=True,
        help="parquet path of transcripts, or synthetic:N for N generated turns",
    )
    ap.add_argument("--out", required=True, help="output root (sinks + lineage)")
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--master", default=None, help="override spark master")
    ap.add_argument("--content-col", default="text")
    ap.add_argument(
        "--mode",
        choices=["batch", "streaming"],
        default="batch",
        help="streaming = incremental AvailableNow drain over the input "
        "directory with a checkpoint under <out>/_checkpoints: each "
        "invocation processes only files not yet committed — the "
        "reference's tail-and-resume operating mode (exactly-once per "
        "input file)",
    )
    args = ap.parse_args(argv)

    import os as _os

    cfgs = {
        _os.path.splitext(_os.path.basename(p))[0]: load_config(p)
        for p in args.config
    }
    if len(cfgs) != len(args.config):
        raise SystemExit("--config files must have distinct names")
    cfg = next(iter(cfgs.values()))

    from ilogtail_spark.session import get_spark
    from ilogtail_spark.plans.lineage import run_pipeline
    from ilogtail_spark.plans.pipeline import Pipeline

    spark = get_spark(app_name=f"ilogtail_spark:{args.run_id}", master=args.master)

    def _pipe(c: dict) -> Pipeline:
        return Pipeline(
            processors=c.get("processors", []),
            router=c.get("router"),
            flushers=c.get("flushers", []),
        )

    if len(cfgs) > 1:
        if args.mode == "streaming":
            raise SystemExit("multi-config runs are batch mode only")
        return _run_multi(spark, args, cfgs, _pipe)

    pipe = _pipe(cfg)

    if args.mode == "streaming":
        if args.input.startswith("synthetic:"):
            raise SystemExit("--mode streaming requires a parquet directory input")
        from ilogtail_spark.model import TRANSCRIPT_SCHEMA
        from ilogtail_spark.streaming.stream import (
            run_streaming_aggregates,
            run_streaming_pipeline,
        )

        # tail-first start: the watch directory may exist but be EMPTY
        # before the first file lands — fall back to the input_hint
        # schema rather than failing schema inference on a batch read
        try:
            schema = spark.read.parquet(args.input).schema
        except Exception:
            schema = TRANSCRIPT_SCHEMA
        stream = spark.readStream.schema(schema).parquet(args.input)
        # outputs namespaced by run_id so a shared --out with batch
        # runs never overwrites another run's committed directories
        events_path = f"{args.out}/events/run_id={args.run_id}"
        agg_path = f"{args.out}/aggregates/run_id={args.run_id}"
        t0 = time.time()
        q1 = run_streaming_pipeline(
            stream, pipe, args.out, f"{args.out}/_checkpoints/{args.run_id}",
            content_col=args.content_col, events_path=events_path,
        )
        q1.awaitTermination()
        q2 = run_streaming_aggregates(
            stream, pipe, args.out, f"{args.out}/_checkpoints/{args.run_id}",
            content_col=args.content_col,
            window=cfg.get("time_bucket", "1 hour"),
            keys=cfg.get("agg_keys") or ["role"],
            agg_path=agg_path,
        )
        q2.awaitTermination()
        elapsed = time.time() - t0
        from pyspark.sql import functions as F

        try:
            counts = {
                r["sink"]: r["n"]
                for r in spark.read.parquet(events_path)
                .groupBy("sink")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        except Exception:
            counts = {}  # nothing drained yet (empty watch dir)
        # manifest parity with batch mode: the checkpoint is the real
        # resume state; the manifest records the observable outcome
        from ilogtail_spark.plans.lineage import RunManifest

        manifest = RunManifest.load(args.out, args.run_id)
        manifest.sink_counts = dict(sorted(counts.items()))
        manifest.phases["streaming_drain"] = True
        manifest.events_location = events_path
        manifest.finished = True
        manifest.save(args.out)
        print(
            json.dumps(
                {
                    "run_id": args.run_id,
                    "mode": "streaming",
                    "finished": True,
                    "elapsed_sec": round(elapsed, 3),
                    "sink_counts": manifest.sink_counts,
                },
                sort_keys=True,
            )
        )
        return 0

    events = _load_input(spark, args)

    t0 = time.time()
    manifest = run_pipeline(
        spark,
        events,
        pipe,
        args.out,
        args.run_id,
        agg_keys=cfg.get("agg_keys"),
        time_bucket=cfg.get("time_bucket", "1 hour"),
    )
    elapsed = time.time() - t0
    # a resumed/finished run does no work — don't report a bogus rate
    n = manifest.metrics.get("in_events_total", 0) if elapsed >= 0.05 else 0
    print(
        json.dumps(
            {
                "run_id": manifest.run_id,
                "finished": manifest.finished,
                "elapsed_sec": round(elapsed, 3),
                "events_per_sec": round(n / elapsed) if elapsed > 0 else None,
                "metrics": manifest.metrics,
                "sink_counts": manifest.sink_counts,
            },
            sort_keys=True,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
