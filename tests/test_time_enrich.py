"""strptime / gotime / timestamp-native / dict_map / lookup-join tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of


def run_rows(spark, procs, rows, with_ts=True):
    df = events_df(spark, rows)
    if with_ts:
        df = df.withColumn("ts", F.to_timestamp(F.lit("2000-01-01 00:00:00")))
    return compile_processors(procs)(df)


class TestStrptime:
    def test_basic(self, spark):
        out = run_rows(
            spark,
            [{"Type": "processor_strptime", "SourceKey": "time", "Format": "%Y-%m-%d %H:%M:%S"}],
            [{"time": "2026-02-03 10:11:12"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2026, 2, 3, 10, 11, 12)

    def test_fraction_and_offset(self, spark):
        out = run_rows(
            spark,
            [
                {
                    "Type": "processor_strptime",
                    "SourceKey": "time",
                    "Format": "%Y-%m-%d %H:%M:%S.%3f",
                    "AdjustUTCOffset": True,
                    "UTCOffset": 3600,
                }
            ],
            [{"time": "2026-02-03 10:11:12.500"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2026, 2, 3, 9, 11, 12, 500000)

    def test_parse_failure_keeps_old_ts(self, spark):
        out = run_rows(
            spark,
            [{"Type": "processor_strptime", "SourceKey": "time", "Format": "%Y-%m-%d"}],
            [{"time": "garbage"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2000, 1, 1)

    def test_epoch_seconds(self, spark):
        out = run_rows(
            spark,
            [{"Type": "processor_strptime", "SourceKey": "time", "Format": "%s"}],
            [{"time": "1767225600"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2026, 1, 1, 0, 0)

    def test_precise_timestamp(self, spark):
        rows = fields_of(
            run_rows(
                spark,
                [
                    {
                        "Type": "processor_strptime",
                        "SourceKey": "time",
                        "Format": "%Y-%m-%d %H:%M:%S",
                        "EnablePreciseTimestamp": True,
                    }
                ],
                [{"time": "2026-01-01 00:00:00"}],
            )
        )
        assert rows[0]["precise_timestamp"] == "1767225600000"


class TestGotime:
    def test_layout_reformat(self, spark):
        rows = fields_of(
            run_rows(
                spark,
                [
                    {
                        "Type": "processor_gotime",
                        "SourceKey": "t",
                        "SourceFormat": "2006-01-02 15:04:05",
                        "DestKey": "d",
                        "DestFormat": "2006/01/02",
                        "SetTime": False,
                    }
                ],
                [{"t": "2026-02-03 10:11:12"}],
            )
        )
        assert rows[0]["d"] == "2026/02/03"

    def test_fixed_seconds_to_millis(self, spark):
        rows = fields_of(
            run_rows(
                spark,
                [
                    {
                        "Type": "processor_gotime",
                        "SourceKey": "t",
                        "SourceFormat": "seconds",
                        "DestKey": "d",
                        "DestFormat": "milliseconds",
                        "SetTime": False,
                    }
                ],
                [{"t": "1767225600"}],
            )
        )
        assert rows[0]["d"] == "1767225600000"

    def test_location_shift(self, spark):
        out = run_rows(
            spark,
            [
                {
                    "Type": "processor_gotime",
                    "SourceKey": "t",
                    "SourceFormat": "2006-01-02 15:04:05",
                    "SourceLocation": 8,
                    "DestLocation": 0,
                    "SetTime": True,
                }
            ],
            [{"t": "2026-02-03 10:11:12"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2026, 2, 3, 2, 11, 12)


class TestTimestampNative:
    def test_timezone(self, spark):
        out = run_rows(
            spark,
            [
                {
                    "Type": "processor_parse_timestamp_native",
                    "SourceKey": "time",
                    "SourceFormat": "%Y-%m-%d %H:%M:%S",
                    "SourceTimezone": "GMT+08:00",
                }
            ],
            [{"time": "2026-02-03 10:11:12"}],
        ).collect()
        assert out[0]["ts"] == dt.datetime(2026, 2, 3, 2, 11, 12)


class TestDictMap:
    DICT = {"127.0.0.1": "LocalHost-LocalHost", "192.168.0.1": "default login"}

    def _run(self, spark, cfg, rows):
        return fields_of(
            run_rows(spark, [{"Type": "processor_dict_map", **cfg}], rows, with_ts=False)
        )

    def test_in_place_overwrite(self, spark):
        out = self._run(
            spark,
            {"SourceKey": "ip", "MapDict": self.DICT},
            [{"ip": "127.0.0.1"}, {"ip": "8.8.8.8"}],
        )
        assert {"ip": "LocalHost-LocalHost"} in out
        assert {"ip": "8.8.8.8"} in out  # miss -> untouched (no HandleMissing here)

    def test_dest_key_insert(self, spark):
        out = self._run(
            spark,
            {"SourceKey": "ip", "DestKey": "host", "MapDict": self.DICT},
            [{"ip": "192.168.0.1"}],
        )
        assert out[0] == {"ip": "192.168.0.1", "host": "default login"}

    def test_fill_keeps_existing_dest(self, spark):
        out = self._run(
            spark,
            {"SourceKey": "ip", "DestKey": "host", "Mode": "fill", "MapDict": self.DICT},
            [{"ip": "192.168.0.1", "host": "already"}],
        )
        assert out[0]["host"] == "already"

    def test_overwrite_replaces_dest(self, spark):
        out = self._run(
            spark,
            {"SourceKey": "ip", "DestKey": "host", "Mode": "overwrite", "MapDict": self.DICT},
            [{"ip": "192.168.0.1", "host": "already"}],
        )
        assert out[0]["host"] == "default login"

    def test_handle_missing_source_key(self, spark):
        out = self._run(
            spark,
            {
                "SourceKey": "ip",
                "DestKey": "host",
                "MapDict": self.DICT,
                "HandleMissing": True,
                "Missing": "Unknown",
            },
            [{"other": "x"}],
        )
        assert out[0] == {"other": "x", "host": "Unknown"}

    def test_source_present_but_unmapped_no_missing(self, spark):
        # quirk: HandleMissing does NOT apply when the source key exists
        out = self._run(
            spark,
            {
                "SourceKey": "ip",
                "DestKey": "host",
                "MapDict": self.DICT,
                "HandleMissing": True,
            },
            [{"ip": "1.2.3.4"}],
        )
        assert out[0] == {"ip": "1.2.3.4"}

    def test_broadcast_join_in_plan(self, spark):
        df = events_df(spark, [{"ip": "127.0.0.1"}])
        out = compile_processors(
            [{"Type": "processor_dict_map", "SourceKey": "ip", "MapDict": self.DICT}]
        )(df)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestLookupJoin:
    def test_attach_columns(self, spark, tmp_path):
        dim = spark.createDataFrame(
            [("search", "retrieval", "team-a"), ("code", "execution", "team-b")],
            "tool string, tool_category string, owner_team string",
        )
        p = str(tmp_path / "dim.parquet")
        dim.write.parquet(p)
        df = events_df(spark, [{"tool": "search"}, {"tool": "shell"}])
        out = fields_of(
            compile_processors(
                [
                    {
                        "Type": "processor_lookup_join",
                        "SourceKey": "tool",
                        "DimPath": p,
                        "KeyColumn": "tool",
                        "AttachColumns": ["tool_category", "owner_team"],
                        "HandleMissing": True,
                        "Missing": "unknown",
                    }
                ]
            )(df)
        )
        by_tool = {d["tool"]: d for d in out}
        assert by_tool["search"]["tool_category"] == "retrieval"
        assert by_tool["search"]["owner_team"] == "team-a"
        assert by_tool["shell"]["tool_category"] == "unknown"
