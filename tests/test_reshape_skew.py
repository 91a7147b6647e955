"""Line split / multiline merge / log->metric / encrypt / tags /
shardhash / salted skew handling tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from ilogtail_spark.plans import skew
from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of


class TestSplitMerge:
    def test_split_log_string(self, spark):
        df = events_df(spark, [{"content": "l1\nl2\nl3", "k": "v"}])
        out = fields_of(
            compile_processors([{"Type": "processor_split_log_string"}])(df)
        )
        assert [d["content"] for d in out] == ["l1", "l2", "l3"]
        assert all(d["k"] == "v" for d in out)

    def test_split_log_missing_key_passthrough(self, spark):
        df = events_df(spark, [{"other": "x"}])
        out = fields_of(
            compile_processors([{"Type": "processor_split_log_string"}])(df)
        )
        assert out == [{"other": "x"}]

    def test_split_log_regex_reference_vector(self, spark):
        # the exact multi-line vector from split_log_regex_test.go
        # TestMultiLine (incl. the empty line keeping its newline on
        # the first event and the bare trailing '[')
        log = "[2017-12-12 00:00:00] 你好\nhello\n\n[2017xxxxxx]yyyy\n [zzzz\n["
        df = events_df(spark, [{"content": log, "k": "v"}])
        out = fields_of(
            compile_processors(
                [{"Type": "processor_split_log_regex",
                  "SplitRegex": r"\[.*", "PreserveOthers": True}]
            )(df)
        )
        assert [d["content"] for d in out] == [
            "[2017-12-12 00:00:00] 你好\nhello\n",
            "[2017xxxxxx]yyyy\n [zzzz",
            "[",
        ]
        assert all(d["k"] == "v" for d in out)

    def test_split_log_regex_single_line_cases(self, spark):
        cfg = [{"Type": "processor_split_log_regex",
                "SplitRegex": r"\[.*", "PreserveOthers": True}]
        # one matched line, with and without trailing newline -> one
        # event each, trailing newline preserved
        for log in ("[2017-12-12 00:00:00] xxxxxx",
                    "[2017-12-12 00:00:00] xxxxxx\n",
                    "xxxxxx"):
            out = fields_of(
                compile_processors(cfg)(events_df(spark, [{"content": log}]))
            )
            assert [d["content"] for d in out] == [log], repr(log)

    def test_split_log_regex_preserve_others_false(self, spark):
        df = events_df(spark, [{"content": "a\n[x\nb", "k": "v"}])
        out = fields_of(
            compile_processors(
                [{"Type": "processor_split_log_regex", "SplitRegex": r"\[.*"}]
            )(df)
        )
        assert out == [{"content": "a"}, {"content": "[x\nb"}]

    def test_split_log_regex_keyless_rows(self, spark):
        df = events_df(spark, [{"other": "x"}])
        keep = fields_of(
            compile_processors(
                [{"Type": "processor_split_log_regex",
                  "SplitRegex": ".*", "PreserveOthers": True}]
            )(df)
        )
        assert keep == [{"other": "x"}]
        drop = compile_processors(
            [{"Type": "processor_split_log_regex", "SplitRegex": ".*"}]
        )(df)
        assert drop.count() == 0

    def test_parse_container_log_containerd(self, spark):
        rows = [
            {"content": "2021-08-25T07:00:00.000000000Z stdout F full line"},
            {"content": "2021-08-25T07:00:01.000000000Z stdout P part line"},
            {"content": "2021-08-25T07:00:02.000000000Z stderr no tag here"},
            {"content": "2021-08-25T07:00:03.000000000Z stdout PP 1"},
        ]
        out = fields_of(
            compile_processors(
                [{"Type": "processor_parse_container_log"}]
            )(events_df(spark, rows))
        )
        assert out[0]["content"] == "full line" and "P" not in out[0]
        assert out[0]["_source_"] == "stdout"
        assert out[0]["_time_"] == "2021-08-25T07:00:00.000000000Z"
        assert out[1]["content"] == "part line" and out[1]["P"] == ""
        assert out[2]["content"] == "no tag here" and out[2]["_source_"] == "stderr"
        # single-char tag only counts when followed by a space
        assert out[3]["content"] == "PP 1"

    def test_parse_container_log_fail_and_ignore(self, spark):
        rows = [
            {"content": "2021-08-25T07:00:00Z bogus x"},  # invalid source
            {"content": "nodelimiters"},
            {"content": "2021-08-25T07:00:01Z stderr drop me"},
            {"content": "2021-08-25T07:00:02Z stdout keep me"},
        ]
        df = events_df(spark, rows)
        dropped = compile_processors(
            [{"Type": "processor_parse_container_log", "IgnoringStderr": True}]
        )(df)
        got = fields_of(dropped)
        assert [d["content"] for d in got] == ["keep me"]
        kept = fields_of(
            compile_processors(
                [{"Type": "processor_parse_container_log",
                  "IgnoringStderr": True, "KeepingSourceWhenParseFail": True}]
            )(df)
        )
        # malformed rows pass through unparsed; stderr still dropped
        assert [d["content"] for d in kept] == [
            "2021-08-25T07:00:00Z bogus x", "nodelimiters", "keep me",
        ]

    def test_parse_container_log_docker_json(self, spark):
        rows = [
            {"content": '{"log":"hello\\n","stream":"stdout","time":"2021-08-25T07:00:00Z"}'},
            {"content": '{"log":"no newline","stream":"stderr","time":"t2"}'},
            {"content": "not json"},
        ]
        out = fields_of(
            compile_processors(
                [{"Type": "processor_parse_container_log",
                  "Mode": "docker_json-file"}]
            )(events_df(spark, rows))
        )
        assert len(out) == 2
        assert out[0]["content"] == "hello" and out[0]["_source_"] == "stdout"
        assert out[0]["_time_"] == "2021-08-25T07:00:00Z"
        assert out[1]["content"] == "no newline"

    def test_parse_container_docker_trims_exactly_one_newline(self, spark):
        rows = [{"content": '{"log":"text\\n\\n","stream":"stdout","time":"t"}'}]
        out = fields_of(
            compile_processors(
                [{"Type": "processor_parse_container_log",
                  "Mode": "docker_json-file"}]
            )(events_df(spark, rows))
        )
        assert out[0]["content"] == "text\n"

    def test_merge_multiline(self, spark):
        rows = [
            {"content": "2026-01-01 start A"},
            {"content": "  continuation A1"},
            {"content": "  continuation A2"},
            {"content": "2026-01-01 start B"},
            {"content": "  continuation B1"},
        ]
        df = events_df(spark, rows).withColumn(
            "conv_id", F.lit("c1")
        )
        from pyspark.sql import Window  # noqa: F401

        df = df.withColumn(
            "turn_idx",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                    F.monotonically_increasing_id()
                )
            ),
        )
        out = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_merge_multiline_log",
                        "StartPattern": r"\d{4}-\d{2}-\d{2} start.*",
                    }
                ]
            )(df)
        )
        contents = sorted(d["content"] for d in out)
        assert contents == [
            "2026-01-01 start A\n  continuation A1\n  continuation A2",
            "2026-01-01 start B\n  continuation B1",
        ]

    def test_merge_discard_unmatched_head(self, spark):
        rows = [
            {"content": "orphan line"},
            {"content": "START x"},
            {"content": "tail"},
        ]
        df = (
            events_df(spark, rows)
            .withColumn("conv_id", F.lit("c"))
            .withColumn(
                "turn_idx",
                F.row_number().over(
                    __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                        F.monotonically_increasing_id()
                    )
                ),
            )
        )
        out = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_merge_multiline_log",
                        "StartPattern": "START.*",
                        "UnmatchedContentTreatment": "discard",
                    }
                ]
            )(df)
        )
        assert [d["content"] for d in out] == ["START x\ntail"]


class TestLogToMetric:
    def test_metric_shape(self, spark):
        df = events_df(
            spark,
            [{"latency": "12.5", "qps": "100", "svc": "a", "region": "eu"}],
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
        out = compile_processors(
            [
                {
                    "Type": "processor_log_to_sls_metric",
                    "MetricLabelKeys": ["svc", "region"],
                    "CustomMetricLabels": {"env": "prod"},
                    "MetricValues": {"latency_ms": "latency", "req_qps": "qps"},
                }
            ]
        )(df).collect()
        assert len(out) == 2
        by_name = {r["__name__"]: r for r in out}
        assert by_name["latency_ms"]["__value__"] == 12.5
        assert by_name["req_qps"]["__value__"] == 100.0
        assert by_name["latency_ms"]["__labels__"] == "env#$#prod|region#$#eu|svc#$#a"
        assert by_name["latency_ms"]["__time_nano__"] == str(1767225600 * 10**9)

    def test_metric_time_key_magnitudes(self, spark):
        df = events_df(spark, [{"v": "1", "t": "1767225600000"}]).withColumn(
            "ts", F.to_timestamp(F.lit("2000-01-01"))
        )
        out = compile_processors(
            [
                {
                    "Type": "processor_log_to_sls_metric",
                    "MetricTimeKey": "t",
                    "MetricLabelKeys": ["t"],
                    "MetricValues": {"m": "v"},
                }
            ]
        )(df).collect()
        assert out[0]["__time_nano__"] == str(1767225600000 * 10**6)

    def test_non_numeric_dropped(self, spark):
        df = events_df(spark, [{"v": "not-a-number", "l": "x"}]).withColumn(
            "ts", F.to_timestamp(F.lit("2000-01-01"))
        )
        out = compile_processors(
            [
                {
                    "Type": "processor_log_to_sls_metric",
                    "MetricLabelKeys": ["l"],
                    "MetricValues": {"m": "v"},
                }
            ]
        )(df).collect()
        assert out == []


class TestEncryptTags:
    def test_encrypt_roundtrip(self, spark):
        key = "00112233445566778899aabbccddeeff"
        iv = "000102030405060708090a0b0c0d0e0f"
        df = events_df(spark, [{"secret": "hello", "open": "world"}])
        out = compile_processors(
            [
                {
                    "Type": "processor_encrypt",
                    "SourceKeys": ["secret"],
                    "EncryptionParameters": {"Key": key, "IV": iv},
                }
            ]
        )(df)
        row = fields_of(out)[0]
        assert row["open"] == "world"
        assert row["secret"] != "hello"
        # decrypt back with Spark's aes_decrypt to prove real AES-CBC
        dec = spark.sql(
            f"SELECT CAST(aes_decrypt(unhex('{row['secret']}'), "
            f"unhex('{key}'), 'CBC', 'PKCS') AS STRING) AS d"
        ).collect()[0]["d"]
        assert dec == "hello"

    def test_cloud_meta_and_tags(self, spark):
        import socket

        df = events_df(spark, [{"a": "1"}])
        out = compile_processors(
            [
                {"Type": "processor_cloud_meta", "Metadata": ["__cloud_instance_id__"]},
                {"Type": "processor_tag_native", "Tags": {"team": "infra"}},
            ]
        )(df)
        row = out.collect()[0]
        assert dict(row["fields"])["__cloud_instance_id__"] == socket.gethostname()
        assert dict(row["tags"])["team"] == "infra"
        assert dict(row["tags"])["__hostname__"] == socket.gethostname()

    def test_content_value_group_tags(self, spark):
        df = events_df(spark, [{"svc": "a", "x": "1"}, {"svc": "b", "x": "2"}])
        out = compile_processors(
            [{"Type": "aggregator_content_value_group", "GroupKeys": ["svc"]}]
        )(df).collect()
        tags = {dict(r["fields"])["svc"]: dict(r["tags"]) for r in out}
        assert tags["a"]["svc"] == "a"
        assert tags["b"]["svc"] == "b"


class TestSkew:
    def _skewed(self, spark, n=2000):
        from ilogtail_spark.sources.transcripts import generate_transcripts

        return generate_transcripts(spark, n_turns=n)

    def test_shardhash_partitions(self, spark):
        df = self._skewed(spark)
        sharded = skew.shardhash(df, ["conv_id"], shard_count=8)
        assert sharded.rdd.getNumPartitions() == 8
        shards = sharded.select("__shard__").distinct().collect()
        assert all(0 <= r["__shard__"] < 8 for r in shards)
        # same key -> same shard (deterministic)
        again = skew.shardhash(df, ["conv_id"], shard_count=8)
        a = {
            (r["conv_id"], r["turn_idx"]): r["__shard__"]
            for r in sharded.select("conv_id", "turn_idx", "__shard__").collect()
        }
        b = {
            (r["conv_id"], r["turn_idx"]): r["__shard__"]
            for r in again.select("conv_id", "turn_idx", "__shard__").collect()
        }
        assert a == b

    def test_shardhash_power_of_two_enforced(self, spark):
        import pytest

        with pytest.raises(ValueError):
            skew.shardhash(self._skewed(spark, 100), ["conv_id"], shard_count=3)

    def test_salted_count_equals_plain_count(self, spark):
        df = self._skewed(spark)
        plain = {
            r["conv_id"]: r["n"]
            for r in df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        salted = {
            r["conv_id"]: r["n"] for r in skew.salted_count(df, "conv_id").collect()
        }
        assert plain == salted

    def test_salted_repartition_spreads_hot_key(self, spark):
        df = self._skewed(spark, 4000)
        hot = df.groupBy("conv_id").count().orderBy(F.desc("count")).first()["conv_id"]
        parts = (
            skew.salted_repartition(
                df.filter(F.col("conv_id") == hot), salt_buckets=8, partitions=8
            )
            .withColumn("pid", F.spark_partition_id())
            .select("pid")
            .distinct()
            .count()
        )
        assert parts > 1  # the hot conversation spans multiple tasks

    def test_stable_turn_order(self, spark):
        df = self._skewed(spark, 1000)
        ordered = skew.stable_turn_order(df)
        pdf = ordered.withColumn("pid", F.spark_partition_id()).toPandas()
        for (_, _), grp in pdf.groupby(["pid", "conv_id"]):
            idx = list(grp["turn_idx"])
            assert idx == sorted(idx)


def test_merge_multiline_max_lines_cap(spark):
    """MaxMergeLines scale guard: a 5-line logical event splits into
    chunks of at most 2 lines, order preserved, chunk ids 0,1,2."""
    from tests.helpers import events_df

    rows = [{"content": c} for c in
            ["START a", "l1", "l2", "l3", "l4", "START b", "m1"]]
    df = events_df(spark, rows).withColumn("g", F.lit("x"))
    df = df.withColumn("i", F.monotonically_increasing_id())
    out = compile_processors(
        [
            {
                "Type": "processor_merge_multiline_log",
                "StartPattern": "START.*",
                "GroupColumns": ["g"],
                "OrderColumns": ["i"],
                "UnmatchedContentTreatment": "discard",
                "MaxMergeLines": 2,
            }
        ]
    )(df)
    got = sorted(
        (r["__evt__"], r["__chunk__"], r["fields"]["content"])
        for r in out.collect()
    )
    assert got == [
        (1, 0, "START a\nl1"),
        (1, 1, "l2\nl3"),
        (1, 2, "l4"),
        (2, 0, "START b\nm1"),
    ]


def test_merge_multiline_no_cap_schema_unchanged(spark):
    from tests.helpers import events_df

    rows = [{"content": c} for c in ["START a", "l1"]]
    df = events_df(spark, rows).withColumn("g", F.lit("x"))
    df = df.withColumn("i", F.monotonically_increasing_id())
    out = compile_processors(
        [
            {
                "Type": "processor_merge_multiline_log",
                "StartPattern": "START.*",
                "GroupColumns": ["g"],
                "OrderColumns": ["i"],
            }
        ]
    )(df)
    assert "__chunk__" not in out.columns
    assert out.count() == 1


class TestSaltedJoin:
    def test_parity_with_plain_join_inner_and_left(self, spark):
        from ilogtail_spark.plans import skew

        left = spark.createDataFrame(
            [(1, i) for i in range(200)] + [(2, 900), (3, 901)],
            "k long, row_id long",
        )
        right = spark.createDataFrame(
            [(1, "hot"), (2, "warm"), (4, "unmatched")], "k long, tag string"
        )
        for how in ("inner", "left"):
            salted = skew.salted_join(
                left, right, on="k", salt_buckets=8,
                salt_src=["row_id"], how=how,
            )
            plain = left.join(right, "k", how)
            assert sorted(map(tuple, salted.collect())) == sorted(
                map(tuple, plain.collect())
            )

    def test_hot_key_spreads_over_buckets(self, spark):
        from ilogtail_spark.plans import skew
        from pyspark.sql import functions as F

        left = spark.createDataFrame(
            [(1, i) for i in range(512)], "k long, row_id long"
        )
        salts = (
            left.withColumn(
                "__salt__",
                F.pmod(F.xxhash64(F.col("row_id")), F.lit(8)),
            )
            .select("__salt__").distinct().count()
        )
        assert salts == 8  # one hot key fans out over all buckets

    def test_rejects_unsupported_how(self, spark):
        from ilogtail_spark.plans import skew

        df = spark.createDataFrame([(1, 2)], "k long, v long")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            skew.salted_join(df, df, on="k", how="full")


class TestHotkeyStats:
    def test_counts_shares_and_flags(self, spark):
        rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
        df = spark.createDataFrame(rows, "k string")
        out = skew.hotkey_stats(df, "k", top_k=2, hot_share_micro=500_000).collect()
        assert [(r["key"], r["n_rows"]) for r in out] == [("hot", 6), ("warm", 3)]
        assert out[0]["share_micro"] == 600_000 and out[0]["is_hot"] == 1
        assert out[1]["share_micro"] == 300_000 and out[1]["is_hot"] == 0

    def test_ties_break_by_key_ascending(self, spark):
        rows = [("b",)] * 2 + [("a",)] * 2 + [("c",)] * 1
        df = spark.createDataFrame(rows, "k string")
        out = skew.hotkey_stats(df, "k", top_k=3).collect()
        assert [r["key"] for r in out] == ["a", "b", "c"]

    def test_plans_take_ordered_top_k(self, spark):
        df = spark.createDataFrame([("x",), ("y",)], "k string")
        plan = (
            skew.hotkey_stats(df, "k", top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
