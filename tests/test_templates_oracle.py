"""FIXTURES.md F2 contract: every text-template family parses through
its proper operator and matches an independent pure-Python oracle
(re/json/csv directly on the generated text)."""

from __future__ import annotations

import json
import re

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.model import to_events
from ilogtail_spark.plans.pipeline import compile_processors
from ilogtail_spark.sources.transcripts import generate_transcripts

N = 4000

NGINX_RE = (
    r'(\S+) - (\S+) \[([^]]+)\] "(\w+) (\S+) ([^"]+)" '
    r'(\d+) (\d+) "([^"]*)" "([^"]*)"'
)
NGINX_KEYS = [
    "remote_addr", "remote_user", "time_local", "method", "url",
    "protocol", "status", "body_bytes_sent", "http_referer",
    "http_user_agent",
]
SYSLOG_GROK = r"%{TIMESTAMP_ISO8601:time} %{WORD:module}\[%{POSINT:pid}\]: %{GREEDYDATA:msg}"


@pytest.fixture(scope="module")
def turns(spark):
    df = generate_transcripts(spark, n_turns=N, seed=7)
    rows = df.select("conv_id", "turn_idx", "text").collect()
    return df, {(r["conv_id"], r["turn_idx"]): r["text"] for r in rows}


def run_parser(spark, df, procs):
    ev = to_events(df)
    out = compile_processors(procs)(ev)
    return {
        (r["conv_id"], r["turn_idx"]): dict(r["fields"])
        for r in out.select("conv_id", "turn_idx", "fields").collect()
    }


def test_nginx_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [{"Type": "processor_regex", "Regex": NGINX_RE, "Keys": NGINX_KEYS, "KeepSource": True}],
    )
    pat = re.compile("(?s)" + NGINX_RE)
    n_matched = 0
    for key, text in texts.items():
        m = pat.search(text)
        if not m:
            continue
        n_matched += 1
        for i, k in enumerate(NGINX_KEYS):
            assert got[key][k] == m.group(i + 1), (key, k)
    assert n_matched > N // 20  # template share ~1/7


def test_syslog_grok_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark, df, [{"Type": "processor_grok", "Match": [SYSLOG_GROK]}]
    )
    # independent oracle: plain-regex equivalent of the grok pattern
    pat = re.compile(
        r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z) (\w+)\[(\d+)\]: (.*)", re.S
    )
    n = 0
    for key, text in texts.items():
        m = pat.search(text)
        if not m:
            continue
        n += 1
        assert got[key]["time"] == m.group(1), key
        assert got[key]["module"] == m.group(2)
        assert got[key]["pid"] == m.group(3)
        assert got[key]["msg"] == m.group(4)
    assert n > N // 20


def test_json_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [{"Type": "processor_json", "SourceKey": "content", "ExpandArray": True}],
    )
    n = 0
    for key, text in texts.items():
        if not text.startswith('{"service"'):
            continue
        n += 1
        obj = json.loads(text)
        f = got[key]
        assert f["_service"] == obj["service"]
        assert f["_latency_ms"] == str(obj["latency_ms"])
        assert f["_ok"] == ("true" if obj["ok"] else "false")
        assert f["_nested_a"] == str(obj["nested"]["a"])
        assert f["_nested_b_c"] == obj["nested"]["b"]["c"]
        assert f["_items[0]"] == str(obj["items"][0])
        assert f["_items[1]"] == str(obj["items"][1])
    assert n > N // 20


def test_delimiter_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [
            {
                "Type": "processor_parse_delimiter_native",
                "SourceKey": "content",
                "Separator": "\t",
                "Keys": ["uid", "date", "method", "value"],
                "KeepingSourceWhenParseSucceed": True,
            }
        ],
    )
    pat = re.compile(r"^\d+\t\d{4}-\d{2}-\d{2}\t(?:buy|sell|hold)\t\d+$")
    n = 0
    for key, text in texts.items():
        if not pat.match(text):
            continue
        n += 1
        parts = text.split("\t")
        f = got[key]
        assert [f["uid"], f["date"], f["method"], f["value"]] == parts, key
    assert n > N // 20


def test_keyvalue_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [{"Type": "processor_split_key_value", "SourceKey": "content", "KeepSource": True}],
    )
    n = 0
    for key, text in texts.items():
        if not text.startswith("class:main\t"):
            continue
        n += 1
        f = got[key]
        assert f["class"] == "main"
        assert f["user"].startswith("u")
        assert f["latency"].isdigit()
        assert "empty_key_0" in f  # the ':emptyN' pair
        assert "no_separator_key_0" in f  # the 'strayN' token
    assert n > N // 20


def test_sensitive_template(spark, turns):
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [
            {
                "Type": "processor_desensitize",
                "SourceKey": "content",
                "Match": "regex",
                "RegexBegin": "password=",
                "RegexContent": "[^&]*",
            },
            {
                "Type": "processor_desensitize_pandas",
                "SourceKey": "content",
                "Method": "md5",
                "Match": "regex",
                "RegexBegin": "token=",
                "RegexContent": "[^&]*",
            },
        ],
    )
    import hashlib

    n = 0
    for key, text in texts.items():
        if not text.startswith("password="):
            continue
        n += 1
        # independent oracle of both desensitize passes
        step1 = re.sub(r"(password=)[^&]*", r"\1********", text)
        def md5_span(m):
            return m.group(1) + hashlib.md5(m.group(2).encode()).hexdigest()
        expected = re.sub(r"(token=)([^&]*)", md5_span, step1)
        assert got[key]["content"] == expected, key
    assert n > N // 20


def test_text_roundtrip_identity(spark, turns):
    """Per-turn text equality under stable ordering: rows that match
    NO parser keep their content byte-identical through the whole
    chain (the north rule's per-row invariant)."""
    df, texts = turns
    got = run_parser(
        spark,
        df,
        [
            {"Type": "processor_regex", "Regex": NGINX_RE, "Keys": NGINX_KEYS, "KeepSource": True},
            {"Type": "processor_grok", "Match": [SYSLOG_GROK]},
            {"Type": "processor_json", "SourceKey": "content"},
        ],
    )
    for key, text in texts.items():
        assert got[key]["content"] == text, key
