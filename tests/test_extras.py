"""Apsara parse / geoip range enrich / otel reshapes / aggregator
aliases / SLS record format / file source tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from ilogtail_spark.operators.extras import to_sls_record
from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of


class TestApsara:
    LINE = (
        "[2026-02-03 10:11:12.123456]\t[ERROR]\t[12345]\t[main.cpp:88]"
        "\tkey1:value1\tkey2:value2"
    )

    def test_parse(self, spark):
        df = events_df(spark, [{"content": self.LINE}]).withColumn(
            "ts", F.to_timestamp(F.lit("2000-01-01"))
        )
        out = compile_processors(
            [{"Type": "processor_parse_apsara_native", "SourceKey": "content"}]
        )(df)
        row = out.collect()[0]
        f = dict(row["fields"])
        assert f["__LEVEL__"] == "ERROR"
        assert f["__THREAD__"] == "12345"
        assert f["__FILE__"] == "main.cpp"
        assert f["__LINE__"] == "88"
        assert f["key1"] == "value1"
        assert f["key2"] == "value2"
        assert f["microtime"] == "1770113472123456"
        assert "content" not in f  # dropped on success
        assert str(row["ts"]).startswith("2026-02-03 10:11:12")

    def test_parse_fail_keeps_source(self, spark):
        df = events_df(spark, [{"content": "not apsara"}])
        out = fields_of(
            compile_processors(
                [{"Type": "processor_parse_apsara_native", "SourceKey": "content"}]
            )(df)
        )
        assert out == [{"content": "not apsara"}]


class TestGeoIP:
    def test_range_lookup(self, spark, tmp_path):
        dim = spark.createDataFrame(
            [
                # 10.0.0.0 - 10.0.255.255
                (167772160, 167837695, "Hangzhou", "Zhejiang", "CN"),
                # 192.168.0.0 - 192.169.255.255 (spans two /16s)
                (3232235520, 3232366591, "Office", "LAN", "XX"),
            ],
            "net_start long, net_end long, city string, province string, country string",
        )
        p = str(tmp_path / "geo.parquet")
        dim.write.parquet(p)
        df = events_df(
            spark,
            [{"ip": "10.0.3.7"}, {"ip": "192.169.1.1"}, {"ip": "8.8.8.8"}],
        )
        out = fields_of(
            compile_processors(
                [{"Type": "processor_geoip", "SourceKey": "ip", "DimPath": p}]
            )(df)
        )
        by_ip = {d["ip"]: d for d in out}
        assert by_ip["10.0.3.7"]["city"] == "Hangzhou"
        assert by_ip["192.169.1.1"]["city"] == "Office"
        assert "city" not in by_ip["8.8.8.8"]

    def test_broadcast_hash_join(self, spark, tmp_path):
        dim = spark.createDataFrame(
            [(167772160, 167837695, "H", "Z", "CN")],
            "net_start long, net_end long, city string, province string, country string",
        )
        p = str(tmp_path / "geo2.parquet")
        dim.write.parquet(p)
        df = events_df(spark, [{"ip": "10.0.0.1"}])
        out = compile_processors(
            [{"Type": "processor_geoip", "SourceKey": "ip", "DimPath": p}]
        )(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # prefix trick => equi join
        assert "NestedLoop" not in plan


class TestOtel:
    def test_metric(self, spark):
        df = events_df(
            spark, [{"latency": "12.5", "svc": "a"}]
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01")))
        out = compile_processors(
            [
                {
                    "Type": "processor_otel_metric",
                    "MetricValues": {"latency_ms": "latency"},
                    "AttributeKeys": ["svc"],
                }
            ]
        )(df).collect()
        assert out[0]["metric_name"] == "latency_ms"
        assert out[0]["value"] == 12.5
        assert dict(out[0]["attributes"]) == {"svc": "a"}
        assert out[0]["time_unix_nano"] == 1767225600 * 10**9

    def test_trace(self, spark):
        df = events_df(
            spark,
            [{"span_name": "call", "latency": "20", "svc": "a"}],
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01"))).withColumn(
            "conv_id", F.lit("c1")
        ).withColumn("turn_idx", F.lit(3))
        out = compile_processors(
            [
                {
                    "Type": "processor_otel_trace",
                    "DurationMsKey": "latency",
                    "AttributeKeys": ["svc"],
                }
            ]
        )(df).collect()
        r = out[0]
        assert r["name"] == "call"
        assert len(r["trace_id"]) == 32 and len(r["span_id"]) == 16
        assert r["end_time_unix_nano"] - r["start_time_unix_nano"] == 20 * 10**6


class TestAggregatorAliases:
    def test_base_pack_id(self, spark):
        df = events_df(spark, [{"a": "1"}])
        out = compile_processors([{"Type": "aggregator_base"}])(df).collect()
        assert dict(out[0]["tags"])["__pack_id__"].startswith("pack-")

    def test_metadata_group(self, spark):
        df = events_df(spark, [{"a": "1"}], tags=[{"host": "h1"}])
        out = compile_processors(
            [{"Type": "aggregator_metadata_group", "GroupMetadataKeys": ["host", "missing"]}]
        )(df).collect()
        t = dict(out[0]["tags"])
        assert t["host"] == "h1"
        assert t["missing"] == ""

    def test_otel_routes_by_content_count(self, spark):
        rows = [
            {f"k{i}": "v" for i in range(1, n + 1)}
            for n in (3, 5, 6, 18, 19, 25)
        ]
        df = events_df(spark, rows)
        out = compile_processors([{"Type": "aggregator_opentelemetry"}])(df)
        sinks = [r["__sink__"] for r in out.collect()]
        # events_df adds no implicit keys; counts are exactly the dict sizes
        assert sinks == [
            "otlp-metrics", "otlp-metrics", "otlp-logs",
            "otlp-logs", "otlp-traces", "otlp-traces",
        ]

    def test_otel_drops_empty_contents(self, spark):
        df = events_df(spark, [{}, {"a": "1"}])
        out = compile_processors([{"Type": "aggregator_opentelemetry"}])(df)
        assert out.count() == 1

    def test_skywalking_routes_by_signature_key(self, spark):
        rows = [
            {"__name__": "cpu", "v": "1"},
            {"links": "[]", "spanId": "s"},
            {"otlp.name": "log", "body": "b"},
            {"whatever": "x"},
        ]
        df = events_df(spark, rows)
        out = compile_processors([{"Type": "aggregator_skywalking"}])(df)
        assert [r["__sink__"] for r in out.collect()] == [
            "skywalking-metrics", "skywalking-traces",
            "skywalking-logs", "skywalking-logs",
        ]

    def test_skywalking_drops_empty_contents(self, spark):
        # aggregator_skywalking.go:97/112 — empty-content logs are
        # never routed
        df = events_df(spark, [{}, {"links": "[]"}])
        out = compile_processors([{"Type": "aggregator_skywalking"}])(df)
        assert out.count() == 1

    def test_context_ordering(self, spark):
        from ilogtail_spark.sources.transcripts import generate_transcripts
        from ilogtail_spark.model import to_events

        ev = to_events(generate_transcripts(spark, 500))
        out = compile_processors([{"Type": "aggregator_context"}])(ev)
        pdf = out.withColumn("pid", F.spark_partition_id()).toPandas()
        for _, grp in pdf.groupby(["pid", "conv_id"]):
            assert list(grp["turn_idx"]) == sorted(grp["turn_idx"])


class TestSlsRecord:
    def test_custom_single(self, spark):
        df = events_df(spark, [{"k": "v"}], tags=[{"t": "1"}]).withColumn(
            "ts", F.to_timestamp(F.lit("2026-01-01"))
        )
        rec = json.loads(to_sls_record(df).collect()[0]["record"])
        assert rec == {"time": 1767225600, "contents": {"k": "v"}, "tags": {"t": "1"}}

    def test_flatten(self, spark):
        df = events_df(spark, [{"k": "v"}], tags=[{"t": "1"}]).withColumn(
            "ts", F.to_timestamp(F.lit("2026-01-01"))
        )
        rec = json.loads(to_sls_record(df, flatten=True).collect()[0]["record"])
        assert rec == {"k": "v", "t": "1"}


class TestLogFiles:
    def _write(self, tmp_path):
        (tmp_path / "a.log").write_text("line1\nline2\nline3\n")
        (tmp_path / "b.log").write_text("other1\nother2\n")
        return str(tmp_path / "*.log")

    def test_lines_mode(self, spark, tmp_path):
        from ilogtail_spark.sources.logfiles import read_log_files

        df = read_log_files(spark, self._write(tmp_path))
        rows = df.collect()
        assert len(rows) == 5
        by_file = {}
        for r in rows:
            name = r["__source_file__"].rsplit("/", 1)[-1]
            by_file.setdefault(name, []).append((r["__line__"], dict(r["fields"])["content"]))
        assert sorted(by_file["a.log"]) == [(0, "line1"), (1, "line2"), (2, "line3")]
        assert sorted(by_file["b.log"]) == [(0, "other1"), (1, "other2")]

    def test_wholetext_mode(self, spark, tmp_path):
        from ilogtail_spark.sources.logfiles import read_log_files

        df = read_log_files(spark, self._write(tmp_path), mode="wholetext")
        assert df.count() == 5
