"""Multi-pipeline one-scan execution: per-(config, sink) counts must
equal running each pipeline separately, and the plan must read the
source ONCE (cache materialization) with one InMemoryTableScan per
pipeline branch."""

from __future__ import annotations

from pyspark.sql import functions as F

from ilogtail_spark.model import to_events
from ilogtail_spark.plans.multi import CONFIG_COL, run_pipelines, sink_counts
from ilogtail_spark.plans.pipeline import Pipeline
from ilogtail_spark.plans.router import SINK_COL

SF = "/root/testdata/sf0.001"


def _pipelines() -> dict[str, Pipeline]:
    return {
        "web": Pipeline(
            router={
                "Mode": "first_match",
                "SourceKey": "event_type",
                "RouterRegex": ["click|view", "purchase|signup"],
                "RouterLogstore": ["m_web", "m_account"],
                "DefaultLogstore": "m_other",
            },
        ),
        "audit": Pipeline(
            processors=[
                {
                    "Type": "processor_filter_regex",
                    "Include": {"event_type": "^(click|error)$"},
                }
            ],
            router={
                "Mode": "first_match",
                "SourceKey": "user_id",
                "RouterRegex": ["[0-9]*[02468]"],
                "RouterLogstore": ["m_even"],
                "DefaultLogstore": "m_odd",
            },
        ),
    }


def _events(spark):
    df = spark.read.parquet(f"{SF}/events.parquet")
    return to_events(
        df,
        content_col="props",
        field_cols=["event_type", "user_id"],
        id_cols=["event_id", "ts"],
    )


class TestRunPipelines:
    def test_counts_equal_separate_runs(self, spark):
        ev = _events(spark)
        pipelines = _pipelines()
        multi = run_pipelines(ev, pipelines)
        got = sink_counts(multi)
        ev.unpersist()
        for name, pipe in pipelines.items():
            solo = (
                pipe.route(_events(spark))
                .groupBy(SINK_COL)
                .count()
                .collect()
            )
            for r in solo:
                assert got[(name, r[SINK_COL])] == r["count"], (name, r)
        # every counted key belongs to a known pipeline
        assert {k[0] for k in got} == set(pipelines)

    def test_single_source_scan_in_plan(self, spark):
        import io
        import re
        from contextlib import redirect_stdout

        ev = _events(spark)
        multi = run_pipelines(ev, _pipelines())
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                multi.explain("formatted")
            plan = buf.getvalue()
            # one InMemoryTableScan per pipeline branch...
            assert plan.count("InMemoryTableScan") >= 2
            # ...and all branches share ONE parquet scan node (the
            # formatted tree prints the shared node id once per
            # reference — count distinct ids, not mentions)
            scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", plan))
            assert len(scan_ids) == 1, scan_ids
        finally:
            ev.unpersist()

    def test_rejects_empty(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            run_pipelines(_events(spark), {})

    def test_storage_level_none_same_counts_no_cache(self, spark):
        # persist=off trades M re-scans for zero cache footprint —
        # answers must be identical and no cache entry may be created
        ev_cached = _events(spark)
        pipelines = _pipelines()
        base = sink_counts(run_pipelines(ev_cached, pipelines))
        ev_cached.unpersist()
        ev_plain = _events(spark)
        got = sink_counts(
            run_pipelines(ev_plain, pipelines, storage_level=None)
        )
        assert got == base
        lvl = ev_plain.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)

    def test_storage_level_disk_only_applies_to_caller_frame(self, spark):
        ev = _events(spark)
        try:
            run_pipelines(ev, _pipelines(), storage_level="DISK_ONLY")
            lvl = ev.storageLevel
            assert lvl.useDisk and not lvl.useMemory
        finally:
            ev.unpersist()

    def test_unknown_storage_level_rejected(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="storage_level"):
            run_pipelines(
                _events(spark), _pipelines(), storage_level="NOT_A_LEVEL"
            )

    def test_reserved_config_column_dropped_cache_on_caller(self, spark):
        # an input carrying the reserved __config__ column: the tag
        # must come from the pipeline name, and the persist must land
        # on the CALLER's frame so events.unpersist() releases it
        ev = _events(spark).withColumn(CONFIG_COL, F.lit("stale"))
        try:
            multi = run_pipelines(ev, _pipelines())
            tags = {
                r[CONFIG_COL]
                for r in multi.select(CONFIG_COL).distinct().collect()
            }
            assert tags == set(_pipelines())
            assert ev.storageLevel.useMemory or ev.storageLevel.useDisk
        finally:
            ev.unpersist()
        lvl = ev.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)

    def test_disjoint_added_columns_null_fill(self, spark):
        # a processor that adds fields in one pipeline must not break
        # the by-name union: missing columns NULL-fill
        ev = _events(spark)
        pipelines = {
            "plain": Pipeline(
                router={"Mode": "first_match", "SourceKey": "event_type",
                        "RouterRegex": [".*"], "RouterLogstore": ["s"],
                        "DefaultLogstore": "s"},
            ),
            "tagged": Pipeline(
                processors=[{"Type": "processor_add_fields",
                             "Fields": {"stage": "audit"}}],
                router={"Mode": "first_match", "SourceKey": "event_type",
                        "RouterRegex": [".*"], "RouterLogstore": ["t"],
                        "DefaultLogstore": "t"},
            ),
        }
        multi = run_pipelines(ev, pipelines)
        try:
            rows = (
                multi.groupBy(CONFIG_COL)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            n = {r[CONFIG_COL]: r["n"] for r in rows}
            assert n["plain"] == n["tagged"] > 0
            tagged = multi.filter(
                (F.col(CONFIG_COL) == "tagged")
            ).limit(1).collect()[0]
            assert dict(tagged["fields"]).get("stage") == "audit"
        finally:
            ev.unpersist()


class TestMultiConfigCLI:
    def test_cli_multi_config_one_scan(self, spark, tmp_path, capsys):
        """Several --config files = the agent's multi-config mode:
        per-(config, sink) counts, idempotent rerun short-circuit."""
        import json

        from ilogtail_spark import run as cli

        a = tmp_path / "web.yaml"
        a.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['user|assistant']\n"
            "  RouterLogstore: [sink_chat]\n  DefaultLogstore: sink_rest\n"
            "flushers: [{Name: sink_chat}, {Name: sink_rest}]\n"
        )
        b = tmp_path / "audit.yaml"
        b.write_text(
            "processors:\n"
            "  - Type: processor_filter_regex\n"
            "    Include: {role: '^tool$'}\n"
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['.*']\n"
            "  RouterLogstore: [sink_all]\n  DefaultLogstore: sink_all\n"
            "flushers: [{Name: sink_all}]\n"
        )
        args = [
            "--config", str(a), str(b),
            "--input", "synthetic:3000",
            "--out", str(tmp_path / "mout"),
            "--run-id", "m1",
        ]
        assert cli.main(args) == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["mode"] == "multi" and res["finished"]
        counts = res["sink_counts"]
        web_total = sum(v for k, v in counts.items() if k.startswith("web/"))
        assert web_total == 3000  # web config routes every turn
        # audit keeps only tool turns; web's rest-sink also holds the
        # generator's other non-chat roles, so it bounds audit's count
        assert 0 < counts["audit/sink_all"] <= counts["web/sink_rest"]
        # rerun: finished manifest short-circuits with identical counts
        # — assert it STRUCTURALLY (output untouched), not by wall
        # clock, which co-tenant steal bursts make flaky
        import os

        events_dir = str(tmp_path / "mout" / "events" / "run_id=m1")
        mtime_before = os.path.getmtime(events_dir)
        assert cli.main(args) == 0
        res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res2["sink_counts"] == counts
        assert os.path.getmtime(events_dir) == mtime_before

    def test_cli_multi_config_rejects_streaming_and_dup_names(self, tmp_path):
        import pytest as _pytest

        from ilogtail_spark import run as cli

        c = tmp_path / "a.yaml"
        c.write_text("flushers: []\n")
        with _pytest.raises(SystemExit):
            cli.main([
                "--config", str(c), str(c),
                "--input", "synthetic:10", "--out", str(tmp_path / "x"),
                "--run-id", "r",
            ])
        d = tmp_path / "b.yaml"
        d.write_text("flushers: []\n")
        with _pytest.raises(SystemExit):
            cli.main([
                "--config", str(c), str(d), "--mode", "streaming",
                "--input", str(tmp_path), "--out", str(tmp_path / "y"),
                "--run-id", "r2",
            ])


class TestReferenceConfigCompat:
    def test_reference_yaml_loads_and_runs(self, spark, tmp_path, capsys):
        """A pipeline file in the REFERENCE agent's own YAML shape
        (enable/inputs/flushers-with-Type, cf.
        example_config/start_with_docker/config/file_simple.yaml)
        loads verbatim: control-plane keys drop, flusher Type becomes
        the sink name, processors pass through."""
        import json

        from ilogtail_spark import run as cli

        cfg = tmp_path / "ref_style.yaml"
        cfg.write_text(
            "enable: true\n"
            "inputs:\n"
            "  - Type: input_file\n"
            "    FilePaths: ['/home/test-log/*.log']\n"
            "processors:\n"
            "  - Type: processor_add_fields\n"
            "    Fields: {source: refcfg}\n"
            "flushers:\n"
            "  - Type: flusher_stdout\n"
            "    OnlyStdout: true\n"
        )
        loaded = cli.load_config(str(cfg))
        assert "enable" not in loaded and "inputs" not in loaded
        assert loaded["flushers"][0]["Name"] == "stdout"
        rc = cli.main([
            "--config", str(cfg),
            "--input", "synthetic:500",
            "--out", str(tmp_path / "rout"),
            "--run-id", "ref1",
        ])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["finished"] and sum(res["sink_counts"].values()) == 500


class TestMultiConfigEdges:
    def test_zero_routed_rows_finishes_and_resumes(self, spark, tmp_path, capsys):
        """All pipelines dropping every row must still finish: counts
        {}, manifest saved, rerun short-circuits (regression for the
        empty-parquet schema-inference crash)."""
        import json

        from ilogtail_spark import run as cli

        a = tmp_path / "x.yaml"
        a.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['nevermatches_zzz']\n"
            "  RouterLogstore: [s1]\n  DropDisMatch: true\n"
            "flushers: [{Name: s1}]\n"
        )
        b = tmp_path / "y.yaml"
        b.write_text(
            "processors:\n"
            "  - Type: processor_filter_regex\n"
            "    Include: {role: '^nosuchrole$'}\n"
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['.*']\n  RouterLogstore: [s2]\n"
            "  DefaultLogstore: s2\n"
            "flushers: [{Name: s2}]\n"
        )
        args = [
            "--config", str(a), str(b),
            "--input", "synthetic:200",
            "--out", str(tmp_path / "zout"), "--run-id", "z1",
        ]
        assert cli.main(args) == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res["finished"] and res["sink_counts"] == {}
        assert cli.main(args) == 0  # rerun short-circuits, no crash
        res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert res2["sink_counts"] == {}

    def test_duplicate_flusher_types_get_distinct_names(self, tmp_path):
        from ilogtail_spark import run as cli

        cfg = tmp_path / "dups.yaml"
        cfg.write_text(
            "flushers:\n"
            "  - Type: flusher_sls\n    Project: A\n"
            "  - Type: flusher_sls\n    Project: B\n"
            "  - Type: flusher_stdout\n"
        )
        fl = cli.load_config(str(cfg))["flushers"]
        assert [f["Name"] for f in fl] == ["sls", "sls_2", "stdout"]

    def test_multi_config_writes_per_config_aggregates(
        self, spark, tmp_path, capsys
    ):
        from ilogtail_spark import run as cli

        a = tmp_path / "agg.yaml"
        a.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['.*']\n  RouterLogstore: [all]\n"
            "  DefaultLogstore: all\n"
            "flushers: [{Name: all}]\n"
            "agg_keys: [role]\n"
        )
        b = tmp_path / "noagg.yaml"
        b.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['.*']\n  RouterLogstore: [all]\n"
            "  DefaultLogstore: all\n"
            "flushers: [{Name: all}]\n"
        )
        out = tmp_path / "aout"
        assert cli.main([
            "--config", str(a), str(b),
            "--input", "synthetic:400", "--out", str(out), "--run-id", "g1",
        ]) == 0
        capsys.readouterr()
        agg = spark.read.parquet(str(out / "aggregates" / "run_id=g1" / "config=agg"))
        assert agg.agg(F.sum("events_total")).collect()[0][0] == 400
        import os

        assert not os.path.exists(str(out / "aggregates" / "run_id=g1" / "config=noagg"))


class TestMultiConfigReviewRegressions:
    def test_input_with_config_and_sink_columns(self, spark, tmp_path):
        """Inputs legitimately carrying 'config'/'sink' data columns
        must not make references ambiguous: __config__ is reserved,
        and the storage boundary releases clashing data columns to
        <name>__data instead of colliding."""
        import duckdb

        src = tmp_path / "in"
        df = spark.range(100).select(
            F.col("id").alias("turn_idx"),
            F.lit("c1").alias("conv_id"),
            F.when(F.col("id") % 2 == 0, "user").otherwise("tool").alias("role"),
            F.lit("hello world").alias("text"),
            F.lit("search").alias("tool"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
            F.lit("legacy_cfg").alias("config"),   # clashing data cols
            F.lit("legacy_sink").alias("sink"),
        )
        df.write.parquet(str(src))
        from ilogtail_spark import run as cli

        a = tmp_path / "w.yaml"
        a.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['user']\n  RouterLogstore: [s_user]\n"
            "  DefaultLogstore: s_rest\nflushers: [{Name: s_user}, {Name: s_rest}]\n"
        )
        b = tmp_path / "x.yaml"
        b.write_text(
            "router:\n  Mode: first_match\n  SourceKey: role\n"
            "  RouterRegex: ['.*']\n  RouterLogstore: [s_all]\n"
            "  DefaultLogstore: s_all\nflushers: [{Name: s_all}]\n"
        )
        out = tmp_path / "cout"
        assert cli.main([
            "--config", str(a), str(b),
            "--input", str(src), "--out", str(out), "--run-id", "c1",
        ]) == 0
        # the clashing data columns survived, renamed at the boundary
        part = duckdb.sql(
            f"select * from read_parquet('{out}/events/run_id=c1/config=w/sink=s_user/*.parquet') limit 1"
        ).fetchdf()
        assert "sink__data" in part.columns
        assert part["sink__data"][0] == "legacy_sink"

    def test_disabled_reference_config_is_rejected(self, tmp_path):
        import pytest as _pytest

        from ilogtail_spark import run as cli

        cfg = tmp_path / "off.yaml"
        cfg.write_text("enable: false\nflushers: []\n")
        with _pytest.raises(SystemExit, match="disabled"):
            cli.load_config(str(cfg))
