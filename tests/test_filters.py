from ilogtail_spark.operators.base import build
from tests.helpers import events_df, fields_of


def test_filter_regex_include_exclude(spark):
    p = build(
        {
            "Type": "processor_filter_regex",
            "Include": {"level": "WARN|ERROR"},
            "Exclude": {"msg": "ignore"},
        }
    )
    rows = [
        {"level": "WARN", "msg": "disk"},        # kept
        {"level": "INFO", "msg": "x"},           # dropped: include fails
        {"msg": "no level"},                     # dropped: missing include key
        {"level": "ERROR", "msg": "please ignore me"},  # dropped: exclude
        {"level": "ERROR"},                      # kept: exclude key missing
    ]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out == [rows[0], rows[4]]


def test_filter_regex_is_find_not_fullmatch(spark):
    p = build({"Type": "processor_filter_regex", "Include": {"msg": "err"}})
    out = fields_of(p.apply(events_df(spark, [{"msg": "an error occurred"}])))
    assert len(out) == 1  # Go regexp.MatchString finds anywhere


def test_filter_key_regex(spark):
    p = build(
        {
            "Type": "processor_filter_key_regex",
            "Include": ["^lvl", "msg"],
            "Exclude": ["^secret"],
        }
    )
    rows = [
        {"lvl": "W", "msg": "a"},                 # kept
        {"lvl": "W"},                             # dropped: no key matching msg
        {"lvl": "W", "msg": "a", "secret_x": "s"},  # dropped: exclude key
    ]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out == [rows[0]]


def test_filter_native_condition_tree(spark):
    p = build(
        {
            "Type": "processor_filter_native",
            "ConditionExp": {
                "operator": "and",
                "operands": [
                    {"key": "level", "exp": "WARN|ERROR"},
                    {
                        "operator": "not",
                        "operands": [{"key": "msg", "exp": "debug"}],
                    },
                ],
            },
        }
    )
    rows = [
        {"level": "WARN", "msg": "x"},
        {"level": "INFO", "msg": "x"},
        {"level": "ERROR", "msg": "debug noise"},
    ]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out == [rows[0]]


def test_fields_with_condition_first_match_wins(spark):
    p = build(
        {
            "Type": "processor_fields_with_condition",
            "DropIfNotMatchCondition": False,
            "Switch": [
                {
                    "Case": {
                        "RelationOperator": "contains",
                        "FieldConditions": {"msg": "error"},
                    },
                    "Actions": [
                        {"Type": "processor_add_fields", "Fields": {"severity": "high"}},
                        {"Type": "processor_drop", "DropKeys": ["tmp"]},
                    ],
                },
                {
                    "Case": {"FieldConditions": {"msg": "error disk"}},
                    "Actions": [
                        {"Type": "processor_add_fields", "Fields": {"severity": "later"}}
                    ],
                },
            ],
        }
    )
    rows = [
        {"msg": "error disk", "tmp": "1"},  # both cases match -> first wins
        {"msg": "fine", "tmp": "1"},        # no case -> untouched
    ]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out[0] == {"msg": "error disk", "severity": "high"}
    assert out[1] == {"msg": "fine", "tmp": "1"}


def test_fields_with_condition_drop_if_not_match(spark):
    p = build(
        {
            "Type": "processor_fields_with_condition",
            "DropIfNotMatchCondition": True,
            "Switch": [
                {
                    "Case": {
                        "RelationOperator": "startwith",
                        "FieldConditions": {"msg": "err"},
                    },
                    "Actions": [],
                }
            ],
        }
    )
    rows = [{"msg": "err: x"}, {"msg": "ok"}]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out == [rows[0]]


def test_rate_limit_caps_per_key_per_bucket(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            ({"svc": "a"}, dt.datetime(2026, 1, 1, 0, 0, 0)),
            ({"svc": "a"}, dt.datetime(2026, 1, 1, 0, 0, 0, 500000)),
            ({"svc": "a"}, dt.datetime(2026, 1, 1, 0, 0, 0, 900000)),
            ({"svc": "a"}, dt.datetime(2026, 1, 1, 0, 0, 1)),
            ({"svc": "b"}, dt.datetime(2026, 1, 1, 0, 0, 0)),
        ],
        "fields map<string,string>, ts timestamp",
    )
    p = build({"Type": "processor_rate_limit", "Fields": ["svc"], "Limit": "2/s"})
    out = p.apply(df)
    assert out.count() == 4  # svc=a capped at 2 in second 0, 1 in second 1; svc=b 1
