"""processor_regex semantics (mirrors plugins/processor/regex/regex_test.go
table-driven style: literal contents in, exact key/value assertions out)."""

import pytest

from ilogtail_spark.operators.base import build
from tests.helpers import events_df, fields_of, one

APPLOG = "2021-08-27 13:04:14.920 77711773 [ThreadName] INFO  rpc succeeded"
APPLOG_RE = r"(\d+-\d+-\d+ \d+:\d+:\d+\.\d+)\s(\d+)\s\[([^\]]+)\]\s(\w+)\s+(.*)"

ENGINES = ["expr", "pandas"]


@pytest.mark.parametrize("engine", ENGINES)
def test_basic_extract_drops_source(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "SourceKey": "content",
            "Regex": APPLOG_RE,
            "Keys": ["time", "tid", "thread", "level", "msg"],
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": APPLOG}])))
    assert out == {
        "time": "2021-08-27 13:04:14.920",
        "tid": "77711773",
        "thread": "ThreadName",
        "level": "INFO",
        "msg": "rpc succeeded",
    }


@pytest.mark.parametrize("engine", ENGINES)
def test_keep_source(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "Regex": r"level=(\w+)",
            "Keys": ["level"],
            "KeepSource": True,
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": "a level=WARN b"}])))
    assert out == {"content": "a level=WARN b", "level": "WARN"}


@pytest.mark.parametrize("engine", ENGINES)
def test_no_match_keeps_source_by_default(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "Regex": r"level=(\w+)",
            "Keys": ["level"],
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": "nothing here"}])))
    assert out == {"content": "nothing here"}  # KeepSourceIfParseError default


@pytest.mark.parametrize("engine", ENGINES)
def test_no_match_drop_source_when_disabled(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "Regex": r"level=(\w+)",
            "Keys": ["level"],
            "KeepSourceIfParseError": False,
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": "nothing here", "x": "1"}])))
    assert out == {"x": "1"}


@pytest.mark.parametrize("engine", ENGINES)
def test_full_match_anchors_both_ends(spark, engine):
    cfg = {
        "Type": "processor_regex",
        "Regex": r"(\w+)=(\w+)",
        "Keys": ["k", "v"],
        "FullMatch": True,
        "Engine": engine,
    }
    p = build(cfg)
    rows = fields_of(
        p.apply(events_df(spark, [{"content": "a=b"}, {"content": "x a=b y"}]))
    )
    assert rows[0] == {"k": "a", "v": "b"}
    assert rows[1] == {"content": "x a=b y"}  # partial match fails under FullMatch


@pytest.mark.parametrize("engine", ENGINES)
def test_dot_matches_newline(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "Regex": r"start:(.*):end",
            "Keys": ["body"],
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": "start:a\nb:end"}])))
    assert out == {"body": "a\nb"}  # (?s) applied like the reference


@pytest.mark.parametrize("engine", ENGINES)
def test_fewer_groups_than_keys_is_parse_failure(spark, engine):
    p = build(
        {
            "Type": "processor_regex",
            "Regex": r"(\w+)",
            "Keys": ["a", "b"],
            "Engine": engine,
        }
    )
    out = one(p.apply(events_df(spark, [{"content": "hello"}])))
    assert out == {"content": "hello"}


def test_rows_never_dropped(spark):
    p = build(
        {"Type": "processor_regex", "Regex": r"(z)", "Keys": ["z"]}
    )
    assert p.apply(events_df(spark, [{"content": "a"}, {"content": "z"}])).count() == 2
