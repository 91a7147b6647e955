from pyspark.sql import functions as F

from ilogtail_spark.plans.router import SINK_COL, TOPIC_COL, route
from tests.helpers import events_df


def _sinks(routed):
    return [
        (dict(r["fields"]), r[SINK_COL])
        for r in routed.select("fields", SINK_COL).collect()
    ]


def test_first_match_full_anchored_ordered(spark):
    rows = [
        {"role": "user"},
        {"role": "assistant"},
        {"role": "tool"},
        {"role": "toolbox"},   # NOT full-match of 'tool' -> default
        {"other": "x"},        # missing key -> default
    ]
    router = {
        "Mode": "first_match",
        "SourceKey": "role",
        "RouterRegex": ["user|assistant", "tool"],
        "RouterLogstore": ["sink_chat", "sink_tool"],
        "DefaultLogstore": "sink_default",
    }
    out = _sinks(route(events_df(spark, rows), router, []))
    assert [s for _, s in out] == [
        "sink_chat",
        "sink_chat",
        "sink_tool",
        "sink_default",
        "sink_default",
    ]


def test_first_match_drop_dismatch(spark):
    router = {
        "Mode": "first_match",
        "SourceKey": "role",
        "RouterRegex": ["tool"],
        "RouterLogstore": ["sink_tool"],
        "DropDisMatch": True,
    }
    rows = [{"role": "tool"}, {"role": "user"}, {}]
    out = _sinks(route(events_df(spark, rows), router, []))
    assert out == [({"role": "tool"}, "sink_tool")]


def test_first_match_order_matters(spark):
    router = {
        "Mode": "first_match",
        "SourceKey": "role",
        "RouterRegex": [".*", "tool"],
        "RouterLogstore": ["sink_all", "sink_tool"],
    }
    out = _sinks(route(events_df(spark, [{"role": "tool"}]), router, []))
    assert out == [({"role": "tool"}, "sink_all")]  # first match wins


def test_multicast_copies_to_every_matching_sink(spark):
    rows = [{"role": "tool", "lvl": "ERROR"}, {"role": "user", "lvl": "INFO"}]
    tags = [{"env": "prod"}, {"env": "dev"}]
    flushers = [
        {"Name": "all"},  # no Match -> receives everything
        {"Name": "errors", "Match": {"Type": "field", "Key": "lvl", "Value": "ERROR|FATAL"}},
        {"Name": "prod", "Match": {"Type": "tag", "Key": "env", "Value": "prod"}},
    ]
    routed = route(events_df(spark, rows, tags), {"Mode": "multicast"}, flushers)
    got = sorted(
        (r["fields"]["role"], r[SINK_COL]) for r in routed.collect()
    )
    assert got == [
        ("tool", "all"),
        ("tool", "errors"),
        ("tool", "prod"),
        ("user", "all"),
    ]


def test_dynamic_topic_fmtstr(spark):
    rows = [{"role": "tool", "service": "svc1"}]
    flushers = [{"Name": "all", "Topic": "app-%{content.service}"}]
    routed = route(events_df(spark, rows), {"Mode": "multicast"}, flushers)
    r = routed.select(TOPIC_COL).collect()[0]
    assert r[TOPIC_COL] == "app-svc1"


def test_multicast_row_matching_no_sink_is_discarded(spark):
    flushers = [
        {"Name": "errors", "Match": {"Type": "field", "Key": "lvl", "Value": "ERROR"}}
    ]
    routed = route(
        events_df(spark, [{"lvl": "INFO"}]), {"Mode": "multicast"}, flushers
    )
    assert routed.count() == 0


def test_multicast_discarding_tag(spark):
    """Match.DiscardingTag (Condition.cpp:109-111): the copy delivered
    to a tag-matched flusher drops the matched tag; other sinks'
    copies keep it."""
    from tests.helpers import events_df
    from ilogtail_spark.plans.router import route

    df = events_df(spark, [{"a": "1"}], tags=[{"env": "prod", "keep": "x"}])
    flushers = [
        {"Name": "sink_all"},
        {
            "Name": "sink_prod",
            "Match": {"Type": "tag", "Key": "env", "Value": "prod", "DiscardingTag": True},
        },
    ]
    out = route(df, {"Mode": "multicast"}, flushers).collect()
    tags = {r["__sink__"]: dict(r["tags"]) for r in out}
    assert tags["sink_prod"] == {"keep": "x"}
    assert tags["sink_all"] == {"env": "prod", "keep": "x"}
