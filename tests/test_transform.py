import hashlib

from ilogtail_spark.operators.base import build
from tests.helpers import events_df, fields_of, one


def test_rename(spark):
    p = build(
        {
            "Type": "processor_rename",
            "SourceKeys": ["a", "missing", "same"],
            "DestKeys": ["b", "m2", "same"],
        }
    )
    out = one(p.apply(events_df(spark, [{"a": "1", "same": "s", "c": "2"}])))
    assert out == {"b": "1", "same": "s", "c": "2"}


def test_add_fields_overwrite_vs_ignore(spark):
    rows = [{"k": "old"}]
    p1 = build({"Type": "processor_add_fields", "Fields": {"k": "new", "x": "1"}})
    assert one(p1.apply(events_df(spark, rows))) == {"k": "new", "x": "1"}
    p2 = build(
        {
            "Type": "processor_add_fields",
            "Fields": {"k": "new", "x": "1"},
            "IgnoreIfExist": True,
        }
    )
    assert one(p2.apply(events_df(spark, rows))) == {"k": "old", "x": "1"}


def test_drop_and_pick(spark):
    rows = [{"a": "1", "b": "2", "c": "3"}]
    assert one(
        build({"Type": "processor_drop", "DropKeys": ["b", "zz"]}).apply(
            events_df(spark, rows)
        )
    ) == {"a": "1", "c": "3"}
    assert one(
        build({"Type": "processor_pick_key", "Include": ["a", "c"]}).apply(
            events_df(spark, rows)
        )
    ) == {"a": "1", "c": "3"}
    assert one(
        build({"Type": "processor_pick_key", "Exclude": ["a"]}).apply(
            events_df(spark, rows)
        )
    ) == {"b": "2", "c": "3"}


def test_drop_last_key_only_after_full_parse(spark):
    p = build(
        {
            "Type": "processor_drop_last_key",
            "DropKey": "content",
            "Include": ["time", "level"],
        }
    )
    rows = [
        {"content": "raw", "time": "t", "level": "I"},  # parsed -> drop raw
        {"content": "raw", "time": "t"},  # incomplete -> keep raw
    ]
    out = fields_of(p.apply(events_df(spark, rows)))
    assert out[0] == {"time": "t", "level": "I"}
    assert out[1] == {"content": "raw", "time": "t"}


def test_md5_and_base64_roundtrip(spark):
    rows = [{"v": "hello"}]
    out = one(
        build({"Type": "processor_md5", "SourceKey": "v", "MD5Key": "h"}).apply(
            events_df(spark, rows)
        )
    )
    assert out["h"] == hashlib.md5(b"hello").hexdigest()

    enc = one(
        build(
            {"Type": "processor_base64_encoding", "SourceKey": "v", "NewKey": "e"}
        ).apply(events_df(spark, rows))
    )
    import base64

    assert enc["e"] == base64.b64encode(b"hello").decode()
    dec = one(
        build(
            {"Type": "processor_base64_decoding", "SourceKey": "e", "NewKey": "d"}
        ).apply(events_df(spark, [{"e": enc["e"]}]))
    )
    assert dec["d"] == "hello"


def test_packjson(spark):
    p = build(
        {
            "Type": "processor_packjson",
            "SourceKeys": ["b", "a"],
            "DestKey": "packed",
            "KeepSource": False,
        }
    )
    out = one(p.apply(events_df(spark, [{"a": "1", "b": "2", "keep": "x"}])))
    assert out == {"packed": '{"a":"1","b":"2"}', "keep": "x"}


def test_string_replace_methods(spark):
    rows = [{"v": "error code=42 code=7"}]
    out = one(
        build(
            {
                "Type": "processor_string_replace",
                "SourceKey": "v",
                "Method": "regex",
                "Match": r"code=\d+",
                "ReplaceString": "code=*",
            }
        ).apply(events_df(spark, rows))
    )
    assert out["v"] == "error code=* code=*"

    out = one(
        build(
            {
                "Type": "processor_string_replace",
                "SourceKey": "v",
                "Method": "const",
                "Match": "error",
                "ReplaceString": "warn",
                "DestKey": "w",
            }
        ).apply(events_df(spark, rows))
    )
    assert out["w"] == "warn code=42 code=7"
    assert out["v"] == rows[0]["v"]  # DestKey leaves source in place

    out = one(
        build(
            {
                "Type": "processor_string_replace",
                "SourceKey": "v",
                "Method": "unquote",
            }
        ).apply(events_df(spark, [{"v": '"a\\tb\\"c"'}]))
    )
    assert out["v"] == 'a\tb"c'

    # a value legitimately containing a NUL byte next to an escaped
    # backslash must survive intact (the old sentinel-substitution
    # chain rewrote the NUL into a backslash), and '\\n' must stay a
    # literal backslash + n, never a newline
    out = one(
        build(
            {
                "Type": "processor_string_replace",
                "SourceKey": "v",
                "Method": "unquote",
            }
        ).apply(events_df(spark, [{"v": '"a\x00b\\\\nc"'}]))
    )
    assert out["v"] == "a\x00b\\nc"


def test_desensitize_full_and_regex(spark):
    rows = [{"v": "password=hunter2&user=alice"}]
    out = one(
        build(
            {
                "Type": "processor_desensitize",
                "SourceKey": "v",
                "Method": "const",
                "Match": "regex",
                "RegexBegin": "password=",
                "RegexContent": "[^&]*",
                "ReplaceString": "***",
            }
        ).apply(events_df(spark, rows))
    )
    assert out["v"] == "password=***&user=alice"

    out = one(
        build(
            {
                "Type": "processor_desensitize",
                "SourceKey": "v",
                "Method": "md5",
                "Match": "full",
            }
        ).apply(events_df(spark, rows))
    )
    assert out["v"] == hashlib.md5(rows[0]["v"].encode()).hexdigest()


def test_desensitize_pandas_regex_md5(spark):
    rows = [{"v": "tok=abc&tok=xyz"}]
    out = one(
        build(
            {
                "Type": "processor_desensitize_pandas",
                "SourceKey": "v",
                "Method": "md5",
                "Match": "regex",
                "RegexBegin": "tok=",
                "RegexContent": "[^&]*",
            }
        ).apply(events_df(spark, rows))
    )
    h = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out["v"] == f"tok={h('abc')}&tok={h('xyz')}"


def test_appender(spark):
    p = build({"Type": "processor_appender", "Key": "labels", "Value": "|extra"})
    assert one(p.apply(events_df(spark, [{"labels": "a"}]))) == {"labels": "a|extra"}
    assert one(p.apply(events_df(spark, [{}]))) == {"labels": "|extra"}
