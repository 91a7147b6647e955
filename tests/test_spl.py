"""processor_spl subset-compiler tests — the reference's own doc
example (processor-spl-native.md) plus per-command vectors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.spl import (
    SPLCompileError,
    compile_spl,
    rewrite_field_refs,
)
from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of, one


def run_one(spark, script: str, fields: dict) -> dict:
    df = events_df(spark, [fields])
    return one(compile_processors([{"Type": "processor_spl", "Script": script}])(df))


class TestRewrite:
    def test_identifiers_become_map_lookups(self):
        assert rewrite_field_refs("status = '200'") == "fields['status'] = '200'"

    def test_functions_and_keywords_untouched(self):
        out = rewrite_field_refs("cast(request_time as double) > 0.01 and upper(method) = 'GET'")
        assert out == (
            "cast(fields['request_time'] as double) > 0.01 "
            "and upper(fields['method']) = 'GET'"
        )

    def test_string_literals_untouched(self):
        out = rewrite_field_refs("msg like '%status and method%'")
        assert out == "fields['msg'] like '%status and method%'"

    def test_niladic_functions_untouched(self):
        # current_timestamp etc. are valid WITHOUT parens in Spark SQL:
        # they must stay function calls, not become NULL map lookups
        out = rewrite_field_refs("ts < current_timestamp and d = current_date")
        assert out == "fields['ts'] < current_timestamp and fields['d'] = current_date"

    def test_user_stays_a_field_ref(self):
        # `user` is a common log FIELD; it must not be swallowed by
        # Spark's niladic current-user function
        assert rewrite_field_refs("user = 'alice'") == "fields['user'] = 'alice'"

    def test_numeric_literals_untouched(self):
        assert rewrite_field_refs("k > 1e5") == "fields['k'] > 1e5"
        assert rewrite_field_refs("k = 0x1F") == "fields['k'] = 0x1F"
        assert (
            rewrite_field_refs("cast(v as double) > 1.5E-3")
            == "cast(fields['v'] as double) > 1.5E-3"
        )
        assert rewrite_field_refs("n = .5") == "fields['n'] = .5"


class TestSPL:
    def test_reference_doc_example(self, spark):
        """The exact nginx pipeline from processor-spl-native.md."""
        line = (
            '127.0.0.1 - - [07/Jul/2022:10:43:30 +0800] '
            '"POST /PutData?Category=YunOsAccountOpLog" '
            '0.024 18204 200 37 "-" "aliyun-sdk-java"'
        )
        script = (
            "*\n"
            "| parse-regexp content, '([\\d\\.]+) \\S+ \\S+ \\[(\\S+) \\S+\\] "
            '\\"(\\w+) ([^\\\\"]*)\\" ([\\d\\.]+) (\\d+) (\\d+) (\\d+|-) '
            '\\"([^\\\\"]*)\\" \\"([^\\\\"]*)\\"\' '
            "as ip, time, method, url, request_time, request_length, status, "
            "length, ref_url, browser\n"
            "| project-away content"
        )
        out = run_one(spark, script, {"content": line})
        assert out == {
            "ip": "127.0.0.1",
            "time": "07/Jul/2022:10:43:30",
            "method": "POST",
            "url": "/PutData?Category=YunOsAccountOpLog",
            "request_time": "0.024",
            "request_length": "18204",
            "status": "200",
            "length": "37",
            "ref_url": "-",
            "browser": "aliyun-sdk-java",
        }

    def test_where_extend_project(self, spark):
        df = events_df(
            spark,
            [
                {"content": "x", "status": "200", "ms": "12"},
                {"content": "y", "status": "500", "ms": "90"},
            ],
        )
        script = (
            "* | where status = '200' "
            "| extend slow = cast(ms as int) > 50 "
            "| project status, slow"
        )
        out = fields_of(
            compile_processors([{"Type": "processor_spl", "Script": script}])(df)
        )
        assert out == [{"status": "200", "slow": "false"}]

    def test_parse_json_and_rename(self, spark):
        out = run_one(
            spark,
            "* | parse-json content | project-rename kind = a",
            {"content": '{"a": "1", "b": "2"}'},
        )
        assert out["kind"] == "1" and out["b"] == "2"

    def test_parse_csv_and_limit(self, spark):
        df = events_df(spark, [{"content": "a,b"}, {"content": "c,d"}])
        script = "* | parse-csv content as c1, c2 | limit 1"
        out = fields_of(
            compile_processors([{"Type": "processor_spl", "Script": script}])(df)
        )
        assert len(out) == 1
        assert out[0]["c1"] in ("a", "c")

    def test_unknown_stage_fails_at_compile(self):
        with pytest.raises(SPLCompileError):
            compile_spl("* | frobnicate x")

    def test_must_start_with_star(self):
        with pytest.raises(SPLCompileError):
            compile_spl("where a = 'b'")

    def test_pipe_inside_regex_quote_not_split(self, spark):
        out = run_one(
            spark,
            "* | parse-regexp content, '(a|b)(\\d+)' as letter, num",
            {"content": "b42"},
        )
        assert out["letter"] == "b" and out["num"] == "42"

    def test_parse_kv_custom_delims(self, spark):
        out = run_one(
            spark,
            "* | parse-kv content, '&', '='",
            {"content": "a=1&b=two&c=3"},
        )
        assert out["a"] == "1" and out["b"] == "two" and out["c"] == "3"

    def test_niladic_in_where_executes(self, spark):
        # end-to-end: the niladic call must survive the rewrite and
        # evaluate (every row's ts is far in the past => all kept)
        out = run_one(
            spark,
            "* | where cast(ts as timestamp) < current_timestamp",
            {"content": "x", "ts": "2001-01-01 00:00:00"},
        )
        assert out["content"] == "x"

    def test_pack_fields_list(self, spark):
        out = run_one(
            spark,
            "* | pack-fields a, b as packed",
            {"content": "x", "a": "1", "b": "2", "c": "3"},
        )
        assert out["packed"] == '{"a":"1","b":"2"}'
        assert "a" not in out and "b" not in out and out["c"] == "3"

    def test_pack_fields_include_regex(self, spark):
        out = run_one(
            spark,
            "* | pack-fields -include='tag_.*' as tags",
            {"content": "x", "tag_env": "prod", "tag_dc": "eu", "msg": "m"},
        )
        import json

        assert json.loads(out["tags"]) == {"tag_env": "prod", "tag_dc": "eu"}
        assert "tag_env" not in out and out["msg"] == "m"

    def test_stats_grouped(self, spark):
        df = events_df(
            spark,
            [
                {"status": "200", "ms": "10"},
                {"status": "200", "ms": "30"},
                {"status": "500", "ms": "100"},
            ],
        )
        script = "* | stats count() as cnt, avg(ms) as avg_ms by status"
        out = {
            r["status"]: r
            for r in fields_of(
                compile_processors(
                    [{"Type": "processor_spl", "Script": script}]
                )(df)
            )
        }
        assert out["200"]["cnt"] == "2" and out["200"]["avg_ms"] == "20.0"
        assert out["500"]["cnt"] == "1" and out["500"]["avg_ms"] == "100.0"

    def test_stats_global_no_by(self, spark):
        df = events_df(spark, [{"ms": "1"}, {"ms": "3"}])
        out = fields_of(
            compile_processors(
                [{"Type": "processor_spl", "Script": "* | stats sum(ms) as total"}]
            )(df)
        )
        assert out == [{"total": "4.0"}]

    def test_stats_unknown_agg_fails_compile(self):
        with pytest.raises(SPLCompileError, match="stats aggregate"):
            compile_spl("* | stats median(ms) as m by k")

    def test_stats_numeric_agg_requires_field(self):
        with pytest.raises(SPLCompileError, match="needs a field"):
            compile_spl("* | stats sum() as t")

    def test_stats_count_field_counts_non_null(self, spark):
        df = events_df(
            spark, [{"u": "a", "x": "1"}, {"u": "b"}, {"u": "c", "x": "3"}]
        )
        out = fields_of(
            compile_processors(
                [{"Type": "processor_spl",
                  "Script": "* | stats count() as rows, count(x) as xs"}]
            )(df)
        )
        assert out == [{"rows": "3", "xs": "2"}]

    def test_stats_malformed_numeric_does_not_abort(self, spark):
        # ANSI mode: one bad value must degrade to null, not crash
        df = events_df(
            spark, [{"k": "g", "ms": "10"}, {"k": "g", "ms": "timeout"}]
        )
        out = fields_of(
            compile_processors(
                [{"Type": "processor_spl",
                  "Script": "* | stats sum(ms) as total by k"}]
            )(df)
        )
        assert out == [{"k": "g", "total": "10.0"}]

    def test_stats_null_group_key_is_absent_not_null(self, spark):
        # rows lacking the group field aggregate under an ABSENT key
        # entry (the fields-map invariant), not a null-valued one
        df = events_df(spark, [{"host": "h1", "v": "1"}, {"v": "2"}])
        out = fields_of(
            compile_processors(
                [{"Type": "processor_spl",
                  "Script": "* | stats count() as n by host"}]
            )(df)
        )
        by_n = {r["n"]: r for r in out}
        assert by_n["1"].get("host") in ("h1", None)
        assert all("host" not in r or r["host"] is not None for r in out)

    def test_sort_and_limit(self, spark):
        df = events_df(
            spark, [{"content": "x", "n": "3"}, {"content": "y", "n": "1"},
                    {"content": "z", "n": "2"}]
        )
        script = "* | sort by n | limit 2"
        out = fields_of(
            compile_processors([{"Type": "processor_spl", "Script": script}])(df)
        )
        assert [r["n"] for r in out] == ["1", "2"]

    def test_spl_compiles_to_same_plan_as_configs(self, spark):
        """The SPL front-end is just another way to spell the operator
        chain: Spark's semantic plan comparison must see the script and
        the explicit config list as the same computation."""
        df = events_df(spark, [{"content": "a,b", "st": "200"}])
        script = (
            "* | parse-csv content as c1, c2 "
            "| where st = '200' "
            "| project-away content"
        )
        via_spl = compile_processors(
            [{"Type": "processor_spl", "Script": script}]
        )(df)
        via_cfg = compile_processors(
            [
                {
                    "Type": "processor_csv",
                    "SourceKey": "content",
                    "SplitKeys": ["c1", "c2"],
                    "KeepSource": True,
                },
            ]
        )(df).filter(F.expr("fields['st'] = '200'"))
        via_cfg = compile_processors(
            [{"Type": "processor_drop", "DropKeys": ["content"]}]
        )(via_cfg)
        assert via_spl.sameSemantics(via_cfg)
