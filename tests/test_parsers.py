"""Grok / JSON / split / csv / kv / anchor parser tests, mirroring the
reference's table-driven vectors (plugins/processor/*/..._test.go)."""

from __future__ import annotations

from ilogtail_spark.plans.pipeline import compile_processors
from tests.helpers import events_df, fields_of, one


def run_one(spark, procs, fields: dict) -> dict:
    df = events_df(spark, [fields])
    return one(compile_processors(procs)(df))


def run_many(spark, procs, rows: list[dict]) -> list[dict]:
    df = events_df(spark, rows)
    return fields_of(compile_processors(procs)(df))


# -- grok (processor_grok_test.go:120-300) ---------------------------------
class TestGrok:
    def test_single_pattern(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_grok", "Match": ["%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}"]}],
            {"content": "begin 123.456 end"},
        )
        assert out == {
            "content": "begin 123.456 end",
            "word1": "begin",
            "request_time": "123.456",
            "word2": "end",
        }

    def test_no_match_keeps_source(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_grok", "Match": ["%{WORD:w} %{NUMBER:n} %{WORD:w2}"]}],
            {"content": "asdfdsafdsf"},
        )
        assert out == {"content": "asdfdsafdsf"}

    def test_multiple_patterns_first_match_wins(self, spark):
        procs = [
            {
                "Type": "processor_grok",
                "KeepSource": False,
                "CustomPatterns": {
                    "HTTP": "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes} %{NUMBER:duration}"
                },
                "Match": [
                    "%{HTTP}",
                    "%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}",
                    "%{YEAR:year} %{MONTH:month} %{MONTHDAY:day} %{QUOTEDSTRING:motto}",
                ],
            }
        ]
        rows = [
            {"content": "begin 123.456 end"},
            {"content": '2019 June 24 "I am iron man"'},
            {"content": "WRONG LOG"},
            {"content": "10.0.0.0 GET /index.html 15824 0.043"},
        ]
        out = run_many(spark, procs, rows)
        assert {"word1": "begin", "request_time": "123.456", "word2": "end"} in out
        assert {
            "year": "2019",
            "month": "June",
            "day": "24",
            "motto": '"I am iron man"',
        } in out
        # parse failure + IgnoreParseFailure default true -> source kept
        assert {"content": "WRONG LOG"} in out
        assert {
            "client": "10.0.0.0",
            "method": "GET",
            "request": "/index.html",
            "bytes": "15824",
            "duration": "0.043",
        } in out

    def test_unicode(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_grok", "Match": ["%{WORD:word1} %{WORD:word2}"]}],
            {"content": "hello こんにちは"},
        )
        assert out["word1"] == "hello"
        assert out["word2"] == "こんにちは"

    def test_discard_on_failure(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_grok",
                    "Match": ["%{NUMBER:n} only"],
                    "IgnoreParseFailure": False,
                }
            ],
            {"content": "no numbers here", "other": "x"},
        )
        # source field removed; row survives
        assert out == {"other": "x"}

    def test_cycle_detection(self):
        import pytest
        from ilogtail_spark.functions.grok import GrokCompileError, compile_grok

        with pytest.raises(GrokCompileError):
            compile_grok("%{A}", {"A": "%{B}", "B": "%{A}"})

    def test_timeout_guards_catastrophic_backtracking(self):
        """The reference's per-log TimeoutMilliSeconds
        (processor_grok.go:46,148-158): a pathological pattern on a
        hostile input must time out and count as UNMATCHED, not hang
        the executor. Runs the row fn directly (no Spark) so the
        wall-clock assertion is tight."""
        import time

        import pytest

        from ilogtail_spark.functions.recache import HAS_REGEX_MODULE
        from ilogtail_spark.operators.base import build

        if not HAS_REGEX_MODULE:
            pytest.skip("regex module absent: timeout guard unavailable")
        p = build(
            {
                "Type": "processor_grok",
                "CustomPatterns": {"EVIL": r"(a+)+c"},
                "Match": ["%{EVIL:x}"],
                "KeepSource": True,
                "TimeoutMilliSeconds": 50,
            }
        )
        # the bounded engine must actually be engaged (regression guard:
        # regex-module patterns report __module__ '_regex', which once
        # made the type check silently fail and the timeout dead code)
        from ilogtail_spark.functions.recache import _is_regex_module, compile_cached

        assert _is_regex_module(compile_cached("(a+)+c", prefer_regex_module=True))
        fn = p.make_fn()
        # 3000 chars: verified to run indefinitely in the regex engine
        # WITHOUT the timeout — this test hangs if the guard dies again
        hostile = {"content": "a" * 3000 + "b"}
        t0 = time.time()
        out = fn(dict(hostile))
        elapsed = time.time() - t0
        assert elapsed < 2.0, f"timeout guard did not bound the scan ({elapsed:.1f}s)"
        assert "x" not in out  # timed out => unmatched
        assert out["content"] == hostile["content"]
        # sane input still parses under the same config
        ok = fn({"content": "aaac end"})
        assert ok["x"] == "aaac"

    def test_desensitize_timeout_guard(self):
        import time

        import pytest

        from ilogtail_spark.functions.recache import HAS_REGEX_MODULE
        from ilogtail_spark.operators.base import build

        if not HAS_REGEX_MODULE:
            pytest.skip("regex module absent")
        p = build(
            {
                "Type": "processor_desensitize_pandas",
                "SourceKey": "content",
                "Method": "md5",
                "Match": "regex",
                "RegexBegin": r"(x+)+y",
                "RegexContent": "[0-9]+",
                "TimeoutMilliSeconds": 50,
            }
        )
        fn = p.make_fn()
        hostile = "x" * 3000 + "z tail"
        t0 = time.time()
        out = fn({"content": hostile})
        assert time.time() - t0 < 2.0
        assert out["content"] == hostile  # timed out scan leaves value as-is

    def test_pattern_may_backtrack_heuristic(self):
        from ilogtail_spark.functions.grok import compile_grok
        from ilogtail_spark.functions.recache import pattern_may_backtrack

        risky = [r"(a+)+c", r"(\w*)*x", r"(?:/[\w%-]*)+", r"(a{2,})+"]
        safe = [
            r"(?:ab)+",
            r"a+b*c{2,3}",
            r"(abc|def)g",
            r"(?:(?:25[0-5]|2[0-4][0-9])\.){3}",
        ]
        for s in risky:
            assert pattern_may_backtrack(s), s
        for s in safe:
            assert not pattern_may_backtrack(s), s
        # the common bank patterns keep the stdlib fast path —
        # including URIPATH, whose classic ambiguous (?:/[...]*)+ form
        # is re-expressed as the equivalent linear /[...]*
        for expr in (
            "%{COMBINEDAPACHELOG}",
            "%{SYSLOGBASE}",
            "%{TIMESTAMP_ISO8601}",
            "%{URIPATH:p}",
            "%{URIPATHPARAM:p}",
        ):
            src, _ = compile_grok(expr)
            assert not pattern_may_backtrack(src), expr

    def test_default_bank_parity_count(self):
        # reference ships 78 defaults
        # (processor_grok_default_patterns.go:19-96); the bank must
        # cover the same names
        from ilogtail_spark.functions.grok import DEFAULT_PATTERNS

        assert len(DEFAULT_PATTERNS) >= 78

    def test_default_bank_all_compile(self):
        from ilogtail_spark.functions.grok import DEFAULT_PATTERNS, compile_grok

        for name in DEFAULT_PATTERNS:
            compile_grok("%{" + name + "}")  # raises on bad regex/cycle

    def test_added_pattern_vectors(self):
        """Full-match vectors for the patterns added for bank parity
        (shapes from processor_grok_test.go and the public grok
        language)."""
        import re

        from ilogtail_spark.functions.grok import compile_grok

        vectors = {
            # leading +/-/. can never match: the pattern opens with \b
            # (same quirk as the reference's regexp2 form)
            "BASE16FLOAT": ["0x1f.ab", "3A.F", "1F"],
            "URN": ["urn:isbn:0451450523", "urn:ietf:rfc:2648"],
            "MAC": ["00:1B:44:11:3A:B7", "00-1B-44-11-3A-B7", "001b.4411.3ab7"],
            "HOST": ["example.com", "node-1.internal"],
            "TTY": ["/dev/pts/3", "/dev/tty0"],
            "DATESTAMP_RFC2822": ["Mon, 02 Jan 2006 15:04:05 -07:00"],
            "DATESTAMP_EVENTLOG": ["20240817153045"],
            "HTTPDERROR_DATE": ["Mon Jan 02 15:04:05 2006"],
        }
        for name, samples in vectors.items():
            src, _ = compile_grok("%{" + name + "}")
            pat = re.compile(src)
            for s in samples:
                assert pat.fullmatch(s), f"{name} failed on {s!r}"

    def test_httpd_errorlog_captures(self):
        import re

        from ilogtail_spark.functions.grok import compile_grok, grok_match_all

        src, groups = compile_grok("%{HTTPD20_ERRORLOG}")
        pat = re.compile(src)
        out = grok_match_all(
            pat,
            groups,
            "[Mon Jan 02 15:04:05 2006] [error] [client 1.2.3.4] File not found",
        )
        assert out["loglevel"] == "error"
        assert out["clientip"] == "1.2.3.4"
        assert out["errormsg"] == "File not found"

        src24, groups24 = compile_grok("%{HTTPD24_ERRORLOG}")
        out24 = grok_match_all(
            re.compile(src24),
            groups24,
            "[Mon Jan 02 15:04:05 2006] [core:notice] [pid 100:tid 200] "
            "AH00094: Command line: 'httpd'",
        )
        assert out24["module"] == "core"
        assert out24["loglevel"] == "notice"
        assert out24["pid"] == "100"
        assert out24["errorcode"] == "AH00094"


# -- json (processor_json_test.go) -----------------------------------------
class TestJson:
    NESTED = '{"k1":{"k2":{"k3":{"k4":{"k51":"51","k52":"52"},"k41":"41"}}},"k6":[{"x":"a"},{"x":"b"}],"k7":[]}'

    def test_flatten_default_depth_source_prefix(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_json",
                    "SourceKey": "js_key",
                    "ExpandConnector": "-",
                    "UseSourceKeyAsPrefix": True,
                }
            ],
            {"js_key": self.NESTED},
        )
        assert out["js_key-k1-k2-k3-k4-k51"] == "51"
        assert out["js_key-k1-k2-k3-k4-k52"] == "52"
        assert out["js_key-k1-k2-k3-k41"] == "41"
        assert out["js_key-k6"] == '[{"x":"a"},{"x":"b"}]'
        assert out["js_key-k7"] == "[]"
        assert out["js_key"] == self.NESTED  # KeepSource default true

    def test_prefix_and_ignore_first_connector(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_json",
                    "SourceKey": "js_key",
                    "ExpandConnector": "-",
                    "Prefix": "j",
                    "IgnoreFirstConnector": True,
                    "KeepSource": False,
                }
            ],
            {"js_key": self.NESTED},
        )
        assert out["jk1-k2-k3-k4-k51"] == "51"
        assert out["jk6"] == '[{"x":"a"},{"x":"b"}]'
        assert "js_key" not in out

    def test_depth_limit(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_json",
                    "SourceKey": "js_key",
                    "ExpandConnector": "-",
                    "UseSourceKeyAsPrefix": True,
                    "ExpandDepth": 1,
                }
            ],
            {"js_key": self.NESTED},
        )
        assert (
            out["js_key-k1"]
            == '{"k2":{"k3":{"k4":{"k51":"51","k52":"52"},"k41":"41"}}}'
        )

    def test_expand_array(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_json",
                    "SourceKey": "j",
                    "ExpandArray": True,
                }
            ],
            {"j": '{"a":[1,{"b":"x"}],"c":"2.50"}'},
        )
        assert out["_a[0]"] == "1"
        assert out["_a[1]_b"] == "x"
        assert out["_c"] == "2.50"

    def test_parse_error_keeps_source(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_json", "SourceKey": "j", "KeepSource": False}],
            {"j": "not json"},
        )
        assert out == {"j": "not json"}  # KeepSourceIfParseError default

    def test_raw_number_preserved(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_json", "SourceKey": "j"}],
            {"j": '{"a":5.0,"b":1e3,"c":true,"d":null}'},
        )
        assert out["_a"] == "5.0"
        assert out["_b"] == "1e3"
        assert out["_c"] == "true"
        assert out["_d"] == "null"

    def test_json_expr_fast_path(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_json_expr",
                    "SourceKey": "j",
                    "Paths": {"svc": "$.service", "lat": "$.nested.latency"},
                }
            ],
            {"j": '{"service":"s1","nested":{"latency":12}}'},
        )
        assert out["svc"] == "s1"
        assert out["lat"] == "12"


# -- split char / string (split/*_test.go) ---------------------------------
class TestSplit:
    def test_split_char_basic(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_char",
                    "SourceKey": "content",
                    "SplitSep": "|",
                    "SplitKeys": ["a", "b", "c"],
                }
            ],
            {"content": "1|2|3"},
        )
        assert out == {"a": "1", "b": "2", "c": "3"}

    def test_split_char_preserve_others(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_char",
                    "SourceKey": "content",
                    "SplitSep": "|",
                    "SplitKeys": ["a", "b"],
                    "PreserveOthers": True,
                }
            ],
            {"content": "1|2|3|4"},
        )
        assert out == {"a": "1", "b": "2", "_split_preserve_": "3|4"}

    def test_split_char_quote(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_char",
                    "SourceKey": "content",
                    "SplitSep": ",",
                    "Quote": '"',
                    "QuoteFlag": True,
                    "SplitKeys": ["a", "b", "c"],
                }
            ],
            {"content": '1,"x,y",3'},
        )
        assert out == {"a": "1", "b": "x,y", "c": "3"}

    def test_split_char_doubled_quote_escape(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_char",
                    "SourceKey": "content",
                    "SplitSep": ",",
                    "Quote": '"',
                    "QuoteFlag": True,
                    "SplitKeys": ["a", "b"],
                }
            ],
            {"content": '"say ""hi""",2'},
        )
        assert out == {"a": 'say "hi"', "b": "2"}

    def test_split_string_multichar(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_string",
                    "SourceKey": "content",
                    "SplitSep": "::",
                    "SplitKeys": ["x", "y"],
                }
            ],
            {"content": "a::b::c::d"},
        )
        assert out == {"x": "a", "y": "b"}

    def test_split_string_preserve(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_string",
                    "SourceKey": "content",
                    "SplitSep": "::",
                    "SplitKeys": ["x", "y"],
                    "PreserveOthers": True,
                }
            ],
            {"content": "a::b::c::d"},
        )
        assert out == {"x": "a", "y": "b", "_split_preserve_": "c::d"}

    def test_split_string_expand_others(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_string",
                    "SourceKey": "content",
                    "SplitSep": ",",
                    "SplitKeys": ["x"],
                    "PreserveOthers": True,
                    "ExpandOthers": True,
                    "ExpandKeyPrefix": "expand_",
                }
            ],
            {"content": "a,b,c"},
        )
        assert out == {"x": "a", "expand_1": "b", "expand_2": "c"}

    def test_split_string_shortened(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_string",
                    "SourceKey": "content",
                    "SplitSep": ",",
                    "SplitKeys": ["x", "y", "z"],
                }
            ],
            {"content": "a,b"},
        )
        assert out == {"x": "a", "y": "b"}


class TestCSVAndDelimiter:
    def test_csv_basic(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_csv",
                    "SourceKey": "content",
                    "SplitKeys": ["a", "b", "c"],
                }
            ],
            {"content": '1,"x, y",3'},
        )
        assert out == {"a": "1", "b": "x, y", "c": "3"}

    def test_csv_expand_overflow(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_csv",
                    "SourceKey": "content",
                    "SplitKeys": ["a"],
                    "ExpandOthers": True,
                    "ExpandKeyPrefix": "ex_",
                }
            ],
            {"content": "1,2,3"},
        )
        assert out == {"a": "1", "ex_1": "2", "ex_2": "3"}

    def test_delimiter_native_extend(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_parse_delimiter_native",
                    "SourceKey": "content",
                    "Separator": ",",
                    "Keys": ["a", "b"],
                    "OverflowedFieldsTreatment": "extend",
                    "KeepingSourceWhenParseSucceed": False,
                }
            ],
            {"content": "1,2,3,4"},
        )
        assert out == {"a": "1", "b": "2", "__column2__": "3", "__column3__": "4"}

    def test_delimiter_native_keep_overflow(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_parse_delimiter_native",
                    "SourceKey": "content",
                    "Separator": ",",
                    "Keys": ["a", "b"],
                    "OverflowedFieldsTreatment": "keep",
                    "KeepingSourceWhenParseSucceed": False,
                }
            ],
            {"content": "1,2,3,4"},
        )
        assert out == {"a": "1", "b": "2,3,4"}


class TestKeyValue:
    def test_kv_defaults(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_split_key_value", "SourceKey": "content"}],
            {"content": "class:main\tuser:root\tlatency:12"},
        )
        assert out == {"class": "main", "user": "root", "latency": "12"}

    def test_kv_fallback_keys(self, spark):
        out = run_one(
            spark,
            [{"Type": "processor_split_key_value", "SourceKey": "content"}],
            {"content": ":v0\tstray\tk:v"},
        )
        assert out == {"empty_key_0": "v0", "no_separator_key_0": "stray", "k": "v"}

    def test_kv_discard_no_separator(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_key_value",
                    "SourceKey": "content",
                    "DiscardWhenSeparatorNotFound": True,
                }
            ],
            {"content": "a:1\tstray\tb:2"},
        )
        assert out == {"a": "1", "b": "2"}

    def test_kv_quoted_value_with_delimiter(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_split_key_value",
                    "SourceKey": "content",
                    "Delimiter": " ",
                    "Separator": "=",
                    "Quote": '"',
                }
            ],
            {"content": 'a="hello world" b=2'},
        )
        assert out == {"a": "hello world", "b": "2"}


class TestAnchor:
    def test_anchor_string(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_anchor",
                    "SourceKey": "content",
                    "Anchors": [
                        {"Start": "time:", "Stop": " ", "FieldName": "time"},
                        {"Start": "status:", "Stop": "", "FieldName": "status"},
                    ],
                }
            ],
            {"content": "time:12:34 level:info status:ok"},
        )
        assert out["time"] == "12:34"
        assert out["status"] == "ok"

    def test_anchor_json(self, spark):
        out = run_one(
            spark,
            [
                {
                    "Type": "processor_anchor",
                    "SourceKey": "content",
                    "KeepSource": False,
                    "Anchors": [
                        {"Start": "json:", "Stop": "|end", "FieldName": "j", "FieldType": "json"}
                    ],
                }
            ],
            {"content": 'json:{"a":{"b":"1"}}|end'},
        )
        assert out == {"j_a_b": "1"}
