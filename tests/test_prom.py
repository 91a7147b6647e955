"""Prometheus exposition parse + relabel tests (TextParser /
Relabel.cpp semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.prom import prom_parse, relabel
from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of


def lines_df(spark, lines: list[str]):
    return spark.createDataFrame([(x,) for x in lines], "text string")


class TestPromParse:
    def test_basic_and_labels(self, spark):
        rows = prom_parse(
            lines_df(
                spark,
                [
                    'http_requests_total{method="post",code="200"} 1027 1395066363000',
                    "metric_no_labels 42.5",
                    "# HELP comment line",
                    "",
                    "not a metric line !!",
                ],
            )
        ).collect()
        assert len(rows) == 2
        r0 = rows[0]
        assert r0["name"] == "http_requests_total"
        assert dict(r0["labels"]) == {
            "method": "post", "code": "200", "__name__": "http_requests_total",
        }
        assert r0["value"] == 1027.0 and r0["ts_ms"] == 1395066363000
        r1 = rows[1]
        assert r1["value"] == 42.5 and r1["ts_ms"] is None

    def test_escapes_inf_nan(self, spark):
        rows = prom_parse(
            lines_df(
                spark,
                [
                    'm{path="C:\\\\dir",msg="say \\"hi\\"\\nbye"} +Inf',
                    "m2 NaN",
                    "m3 -Inf",
                ],
            )
        ).collect()
        labels = dict(rows[0]["labels"])
        assert labels["path"] == "C:\\dir"
        assert labels["msg"] == 'say "hi"\nbye'
        assert rows[0]["value"] == float("inf")
        assert math.isnan(rows[1]["value"])
        assert rows[2]["value"] == float("-inf")

    def test_default_timestamp(self, spark):
        rows = prom_parse(
            lines_df(spark, ["m 1"]), default_ts_ms=1700000000000
        ).collect()
        assert rows[0]["ts_ms"] == 1700000000000

    def test_processor_surface(self, spark):
        df = events_df(
            spark, [{"content": 'up{job="api"} 1 1700000000000'}]
        )
        out = fields_of(
            compile_processors([{"Type": "processor_prom_parse_metric"}])(df)
        )
        assert out == [
            {"__name__": "up", "value": "1.0",
             "__time_ms__": "1700000000000", "job": "api"}
        ]

    def test_processor_keeps_other_columns(self, spark):
        # tags and id columns must survive the parse (event-model
        # contract every processor honors)
        df = events_df(
            spark, [{"content": "m 2"}], tags=[{"host": "h1"}]
        ).withColumn("conv_id", F.lit("c9"))
        out = compile_processors(
            [{"Type": "processor_prom_parse_metric"}]
        )(df).collect()
        assert dict(out[0]["tags"]) == {"host": "h1"}
        assert out[0]["conv_id"] == "c9"

    def test_processor_with_colliding_top_level_columns(self, spark):
        # an event frame can legitimately carry columns literally
        # named name/labels/value/ts_ms (a prior extract stage);
        # the parse must not create ambiguous duplicates
        df = (
            events_df(spark, [{"content": "m 3"}])
            .withColumn("name", F.lit("keepme"))
            .withColumn("value", F.lit(9))
            .withColumn("labels", F.lit("x"))
            .withColumn("ts_ms", F.lit(7))
        )
        out = compile_processors(
            [{"Type": "processor_prom_parse_metric"}]
        )(df).collect()
        assert out[0]["name"] == "keepme" and out[0]["value"] == 9
        assert out[0]["labels"] == "x" and out[0]["ts_ms"] == 7
        assert dict(out[0]["fields"])["value"] == "3.0"

    def test_label_named_value_does_not_clobber_sample(self, spark):
        df = events_df(spark, [{"content": 'm{value="x"} 7'}])
        out = fields_of(
            compile_processors([{"Type": "processor_prom_parse_metric"}])(df)
        )
        assert out[0]["value"] == "7.0"

    def test_malformed_label_body_rejects_line(self, spark):
        rows = prom_parse(
            lines_df(
                spark,
                ['m{a=unquoted,b="1"} 5', 'ok{b="1"} 5'],
            )
        ).collect()
        assert len(rows) == 1 and rows[0]["name"] == "ok"


def metrics_df(spark, rows):
    return spark.createDataFrame(
        [(r,) for r in rows], "labels map<string,string>"
    )


class TestRelabel:
    def test_replace_with_groups(self, spark):
        df = metrics_df(spark, [{"__address__": "host1:9100"}])
        out = relabel(
            df,
            [
                {
                    "source_labels": ["__address__"],
                    "regex": r"([^:]+):(\d+)",
                    "target_label": "host",
                    "replacement": "$1",
                }
            ],
        ).collect()
        assert dict(out[0]["labels"])["host"] == "host1"

    def test_replace_no_match_is_noop(self, spark):
        df = metrics_df(spark, [{"a": "x"}])
        out = relabel(
            df,
            [{"source_labels": ["a"], "regex": r"\d+",
              "target_label": "t", "replacement": "$0"}],
        ).collect()
        assert "t" not in dict(out[0]["labels"])

    def test_replace_empty_expansion_deletes_target(self, spark):
        df = metrics_df(spark, [{"a": "", "t": "old"}])
        out = relabel(
            df,
            [{"source_labels": ["a"], "regex": "(.*)",
              "target_label": "t", "replacement": "$1"}],
        ).collect()
        assert "t" not in dict(out[0]["labels"])

    def test_trailing_newline_value_not_matched(self, spark):
        # \A..\z anchoring: a label value ending in \n must NOT
        # full-match a regex without it (Java $ would)
        df = metrics_df(spark, [{"env": "prod\n"}, {"env": "prod"}])
        kept = relabel(
            df, [{"source_labels": ["env"], "regex": "prod", "action": "keep"}]
        ).collect()
        assert len(kept) == 1 and dict(kept[0]["labels"])["env"] == "prod"

    def test_lowercase_empty_source_deletes_target(self, spark):
        df = metrics_df(spark, [{"t": "old"}])  # source label missing
        out = relabel(
            df,
            [{"source_labels": ["missing"], "target_label": "t",
              "action": "lowercase"}],
        ).collect()
        assert "t" not in dict(out[0]["labels"])

    def test_keep_drop(self, spark):
        df = metrics_df(
            spark, [{"env": "prod"}, {"env": "dev"}, {"other": "1"}]
        )
        kept = relabel(
            df, [{"source_labels": ["env"], "regex": "prod", "action": "keep"}]
        ).collect()
        assert len(kept) == 1 and dict(kept[0]["labels"])["env"] == "prod"
        dropped = relabel(
            df, [{"source_labels": ["env"], "regex": "prod", "action": "drop"}]
        ).collect()
        assert len(dropped) == 2

    def test_labelmap_and_labeldrop(self, spark):
        df = metrics_df(
            spark, [{"__meta_kubernetes_pod": "p1", "keepme": "v"}]
        )
        out = relabel(
            df,
            [
                {"regex": "__meta_kubernetes_(.+)", "action": "labelmap",
                 "replacement": "k8s_$1"},
                {"regex": "__meta_.*", "action": "labeldrop"},
            ],
        ).collect()
        assert dict(out[0]["labels"]) == {"k8s_pod": "p1", "keepme": "v"}

    def test_lowercase_and_keepequal(self, spark):
        df = metrics_df(
            spark,
            [{"m": "ABC", "t": "abc"}, {"m": "DEF", "t": "xyz"}],
        )
        out = relabel(
            df,
            [
                {"source_labels": ["m"], "target_label": "low",
                 "action": "lowercase"},
                {"source_labels": ["low"], "target_label": "t",
                 "action": "keepequal"},
            ],
        ).collect()
        assert len(out) == 1 and dict(out[0]["labels"])["low"] == "abc"

    def test_unsupported_action_raises(self, spark):
        df = metrics_df(spark, [{"a": "1"}])
        with pytest.raises(ValueError, match="hashmod"):
            relabel(df, [{"action": "hashmod", "source_labels": ["a"],
                          "target_label": "t", "modulus": 4}])