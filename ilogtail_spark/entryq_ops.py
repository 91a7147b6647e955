"""Driver-checkable queries for the operators that previously had
only pytest coverage (VERDICT r01 §"What's missing" item 1): one
oracle query per operator family so CORRECTNESS_r{N}.json attests
every SURVEY.md §2 row.

Same construction discipline as entryq.py: log lines are SYNTHESIZED
deterministically from table columns inside the query on BOTH sides
(format_string vs printf), so parse parity is proven on identical
inputs with no external fixtures.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, TAGS_COL, to_events
from ilogtail_spark.plans.pipeline import Pipeline, compile_processors
from ilogtail_spark.entryq import K_REGEX, _events, _t, query


# ---------------------------------------------------------------------------
# processor_split_char — quote state machine incl. doubled-quote escape
# and PreserveOthers overflow (split_char.go:69-156)
# ---------------------------------------------------------------------------
@query(
    "split_char_quoted",
    """
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS c1,
           event_type AS c2,
           printf('qu;ot"ed%d', user_id % 10) AS c3,
           printf('tail-%d', user_id % 5) AS overflow
    FROM events
    ORDER BY event_id
    """,
)
def q_split_char_quoted(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        '%d;%s;"qu;ot""ed%d";tail-%d',
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id") % 10,
        F.col("user_id") % 5,
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [
            {
                "Type": "processor_split_char",
                "SourceKey": "content",
                "SplitSep": ";",
                "Quote": '"',
                "QuoteFlag": True,
                "SplitKeys": ["c1", "c2", "c3"],
                "PreserveOthers": True,
            }
        ]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("c1").alias("c1"),
        f.getItem("c2").alias("c2"),
        f.getItem("c3").alias("c3"),
        f.getItem("_split_preserve_").alias("overflow"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_split_string — multi-char separator, ExpandOthers overflow
# keys (split_string.go:33-101)
# ---------------------------------------------------------------------------
@query(
    "split_string_expand",
    """
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS a,
           event_type AS b,
           printf('x%d', user_id % 7) AS ex1,
           printf('y%d', event_id % 11) AS ex2
    FROM events
    ORDER BY event_id
    """,
)
def q_split_string_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "%d::%s::x%d::y%d",
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id") % 7,
        F.col("event_id") % 11,
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [
            {
                "Type": "processor_split_string",
                "SourceKey": "content",
                "SplitSep": "::",
                "SplitKeys": ["a", "b"],
                "ExpandOthers": True,
                "ExpandKeyPrefix": "ex",
            }
        ]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("a").alias("a"),
        f.getItem("b").alias("b"),
        f.getItem("ex1").alias("ex1"),
        f.getItem("ex2").alias("ex2"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_anchor — Start/Stop substring extraction + FieldType=json
# expansion (anchor.go:46-67)
# ---------------------------------------------------------------------------
@query(
    "anchor_extract",
    """
    SELECT event_id,
           event_type AS v,
           CAST(user_id % 50 AS VARCHAR) AS j_a,
           printf('c%d', event_id % 9) AS j_b_c
    FROM events
    ORDER BY event_id
    """,
)
def q_anchor_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        'pre [val=%s] json={"a":%d,"b":{"c":"c%d"}}',
        F.col("event_type"),
        F.col("user_id") % 50,
        F.col("event_id") % 9,
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [
            {
                "Type": "processor_anchor",
                "SourceKey": "content",
                "Anchors": [
                    {"Start": "[val=", "Stop": "]", "FieldName": "v"},
                    {
                        "Start": "json=",
                        "Stop": "",
                        "FieldName": "j",
                        "FieldType": "json",
                        "ExpandDepth": 0,
                    },
                ],
            }
        ]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("v").alias("v"),
        f.getItem("j_a").alias("j_a"),
        f.getItem("j_b_c").alias("j_b_c"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_base64_decoding + processor_drop + processor_drop_last_key
# chained: encode -> decode round-trip, drop parsed key, drop the raw
# line once parse keys are demonstrably present
# ---------------------------------------------------------------------------
@query(
    "transform_drop_b64",
    """
    SELECT event_id,
           to_base64(event_type::BLOB) AS t64,
           event_type AS t_back,
           0 AS has_content,
           0 AS has_k
    FROM events
    ORDER BY event_id
    """,
)
def q_transform_drop_b64(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
            {"Type": "processor_base64_encoding", "SourceKey": "event_type", "NewKey": "t64"},
            {"Type": "processor_base64_decoding", "SourceKey": "t64", "NewKey": "t_back"},
            {"Type": "processor_drop", "DropKeys": ["k"]},
            # drop the raw line only because t_back proves the chain ran
            {"Type": "processor_drop_last_key", "DropKey": "content", "Include": ["t_back"]},
        ]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("t64").alias("t64"),
        f.getItem("t_back").alias("t_back"),
        f.getItem("content").isNotNull().cast("int").alias("has_content"),
        f.getItem("k").isNotNull().cast("int").alias("has_k"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_string_replace Method=unquote — strip one quote layer and
# unescape \n \t \r \" \\ (the JSON-ish unquote of the reference's
# stringreplace plugin); the quoted line is synthesized on both sides
# ---------------------------------------------------------------------------
@query(
    "string_replace_unquote",
    """
    SELECT event_id,
           'ab' || chr(10) || event_type || chr(9) || 'e"f' || chr(92) || 'ng'
             AS unquoted
    FROM events
    ORDER BY event_id
    """,
)
def q_string_replace_unquote(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    # line = "ab\n<event_type>\te\"f\ng" in its escaped, quoted form —
    # the trailing \\n (escaped backslash + n) must unquote to a
    # LITERAL backslash + 'n', not a newline
    line = F.concat(
        F.lit('"ab\\n'), F.col("event_type"), F.lit('\\te\\"f\\\\ng"')
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [
            {
                "Type": "processor_string_replace",
                "SourceKey": "content",
                "Method": "unquote",
                "DestKey": "unquoted",
            }
        ]
    )(ev)
    return out.select(
        "event_id", F.col(FIELDS_COL).getItem("unquoted").alias("unquoted")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_desensitize (pandas twin) — Method=md5 per matched span
# (processor_desensitize.go:146-184): DuckDB recomputes the md5 of the
# known span from the synthesized content
# ---------------------------------------------------------------------------
@query(
    "desensitize_md5_span",
    """
    SELECT event_id,
           '{"k": ' || md5(regexp_extract(props, '\\{"k": (\\d+)\\}', 1)) || '}'
             AS masked
    FROM events
    ORDER BY event_id
    """,
)
def q_desensitize_md5_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {
                "Type": "processor_desensitize_pandas",
                "SourceKey": "content",
                "Method": "md5",
                "Match": "regex",
                "RegexBegin": '"k": ',
                "RegexContent": "[0-9]+",
            }
        ]
    )(ev)
    return out.select(
        "event_id", F.col(FIELDS_COL).getItem("content").alias("masked")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_filter_key_regex — predicate over KEY NAMES
# (processor_filter_key_regex.go:73-96): err_code exists only on
# error rows, so Include ['^err_'] keeps exactly those
# ---------------------------------------------------------------------------
@query(
    "filter_key_regex",
    """
    SELECT count(*) AS n
    FROM events
    WHERE event_type = 'error'
    """,
)
def q_filter_key_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {
                "Type": "processor_fields_with_condition",
                "Switch": [
                    {
                        "Case": {"FieldConditions": {"event_type": "error"}},
                        "Actions": [
                            {"Type": "processor_add_fields", "Fields": {"err_code": "E1"}}
                        ],
                    }
                ],
            },
            {"Type": "processor_filter_key_regex", "Include": ["^err_"]},
        ]
    )(ev)
    return out.agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# processor_parse_timestamp_native — strptime + SourceTimezone
# (ProcessorParseTimestampNative.h:23-36): the string carries local
# GMT+08:00 wall time; parsing must recover the original UTC instant
# ---------------------------------------------------------------------------
@query(
    "parse_timestamp_tz",
    """
    SELECT event_id, date_trunc('second', ts) AS parsed_ts
    FROM events
    ORDER BY event_id
    """,
)
def q_parse_timestamp_tz(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    tstr = F.date_format(
        F.col("ts") + F.make_interval(hours=F.lit(8)), "yyyy-MM-dd HH:mm:ss"
    )
    ev = to_events(
        df.withColumn("tstr", tstr).drop("ts"),
        content_col="props",
        field_cols=["tstr"],
        id_cols=["event_id"],
    )
    out = compile_processors(
        [
            {
                "Type": "processor_parse_timestamp_native",
                "SourceKey": "tstr",
                "SourceFormat": "%Y-%m-%d %H:%M:%S",
                "SourceTimezone": "GMT+08:00",
            }
        ]
    )(ev)
    return out.select("event_id", F.col("ts").alias("parsed_ts")).orderBy("event_id")


# ---------------------------------------------------------------------------
# packing aggregators — aggregator_base (__pack_id__ tag),
# aggregator_content_value_group (group identity stamped on tags),
# aggregator_metadata_group (tags-side twin)
# ---------------------------------------------------------------------------
@query(
    "aggregators_pack_tags",
    """
    SELECT event_id, event_type AS tag_type, 1 AS pack_ok
    FROM events
    ORDER BY event_id
    """,
)
def q_aggregators_pack_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {"Type": "aggregator_base"},
            {"Type": "aggregator_content_value_group", "GroupKeys": ["event_type"]},
            {"Type": "aggregator_metadata_group", "GroupMetadataKeys": ["event_type"]},
        ]
    )(ev)
    t = F.col(TAGS_COL)
    return out.select(
        "event_id",
        t.getItem("event_type").alias("tag_type"),
        t.getItem("__pack_id__").rlike(r"^pack-[0-9]+$").cast("int").alias("pack_ok"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# aggregator_opentelemetry — signal routing by content count (metric
# records <= 5 contents, spans >= 19, logs between; empty dropped);
# content counts synthesized deterministically per event_id
# ---------------------------------------------------------------------------
@query(
    "aggregator_otel_route",
    """
    WITH t AS (SELECT event_id % 24 AS n FROM events)
    SELECT CASE WHEN n <= 5 THEN 'otlp-metrics'
                WHEN n >= 19 THEN 'otlp-traces'
                ELSE 'otlp-logs' END AS sink,
           count(*) AS n_rows
    FROM t WHERE n > 0
    GROUP BY 1 ORDER BY sink
    """,
)
def q_aggregator_otel_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.router import SINK_COL

    raw = _t(spark, sf_dir, "events")
    n = (F.col("event_id") % 24).cast("int")
    keys = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(F.lit("k"), i.cast("string")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ev = raw.select(
        "event_id",
        F.map_from_arrays(
            keys, F.transform(keys, lambda _: F.lit("v"))
        ).alias(FIELDS_COL),
        F.create_map().cast("map<string,string>").alias(TAGS_COL),
    )
    out = compile_processors([{"Type": "aggregator_opentelemetry"}])(ev)
    return (
        out.groupBy(F.col(SINK_COL).alias("sink"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("sink")
    )


# ---------------------------------------------------------------------------
# aggregator_skywalking — signal routing by signature content key
# (__name__ -> metrics, links -> traces, otlp.name -> logs,
# unrecognized -> logs)
# ---------------------------------------------------------------------------
@query(
    "aggregator_skywalking_route",
    """
    SELECT CASE event_id % 4
             WHEN 0 THEN 'skywalking-metrics'
             WHEN 1 THEN 'skywalking-traces'
             ELSE 'skywalking-logs' END AS sink,
           count(*) AS n_rows
    FROM events
    GROUP BY 1 ORDER BY sink
    """,
)
def q_aggregator_skywalking_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.router import SINK_COL

    raw = _t(spark, sf_dir, "events")
    key = (
        F.when(F.col("event_id") % 4 == 0, F.lit("__name__"))
        .when(F.col("event_id") % 4 == 1, F.lit("links"))
        .when(F.col("event_id") % 4 == 2, F.lit("otlp.name"))
        .otherwise(F.lit("unrecognized"))
    )
    ev = raw.select(
        "event_id",
        F.create_map(key, F.lit("x")).alias(FIELDS_COL),
        F.create_map().cast("map<string,string>").alias(TAGS_COL),
    )
    out = compile_processors([{"Type": "aggregator_skywalking"}])(ev)
    return (
        out.groupBy(F.col(SINK_COL).alias("sink"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("sink")
    )


# ---------------------------------------------------------------------------
# aggregator_context / aggregator_default — per-source co-location:
# after the context repartition, every row of a source lives in ONE
# partition (the observable the reference's per-source packing needs)
# ---------------------------------------------------------------------------
@query(
    "context_colocate",
    """
    SELECT user_id, 1 AS n_partitions, count(*) AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_context_colocate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).withColumn(
        "user_id", F.col(FIELDS_COL).getItem("user_id").cast("long")
    )
    out = compile_processors(
        [{"Type": "aggregator_context", "GroupColumn": "user_id", "OrderColumn": "event_id"}]
    )(ev)
    out = out.withColumn("__pid__", F.spark_partition_id())
    return (
        out.groupBy("user_id")
        .agg(
            F.countDistinct("__pid__").cast("int").alias("n_partitions"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# processor_cloud_meta + processor_tag_native — constant metadata
# fields / custom group tags. The operator resolves __cloud_zone__
# from the environment at plan-build (driver) time; the oracle string
# is built at import time in the SAME process, so the expected value
# is interpolated from the same environment and the check is
# machine-independent.
# ---------------------------------------------------------------------------
_ZONE = os.environ.get("CLOUD_ZONE", "local-a").replace("'", "''")


@query(
    "cloud_meta_tags",
    f"""
    SELECT event_id, '{_ZONE}' AS zone, 'core' AS team
    FROM events
    ORDER BY event_id
    """,
)
def q_cloud_meta_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {
                "Type": "processor_cloud_meta",
                "Metadata": ["__cloud_zone__"],
                "RenameMetadata": {"__cloud_zone__": "zone"},
            },
            {"Type": "processor_tag_native", "Tags": {"team": "core"}, "AddHostTags": False},
        ]
    )(ev)
    return out.select(
        "event_id",
        F.col(FIELDS_COL).getItem("zone").alias("zone"),
        F.col(TAGS_COL).getItem("team").alias("team"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_otel_trace — span reshape with deterministic md5 identity
# fallback and DurationMs from a parsed field
# ---------------------------------------------------------------------------
@query(
    "otel_trace",
    """
    SELECT event_id,
           md5(CAST(event_id AS VARCHAR)) AS trace_id,
           substr(md5(CAST(event_id AS VARCHAR)), 1, 16) AS span_id,
           'span' AS name,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS BIGINT)
             AS start_time_unix_nano,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000000000
                + CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS BIGINT) * 1000000
             AS BIGINT) AS end_time_unix_nano
    FROM events
    ORDER BY event_id
    """,
)
def q_otel_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
            {"Type": "processor_otel_trace", "DurationMsKey": "k"},
        ]
    )(ev)
    return out.select(
        "event_id",
        "trace_id",
        "span_id",
        "name",
        "start_time_unix_nano",
        "end_time_unix_nano",
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# dynamic sink naming (pkg/fmtstr format_topic) — per-record topic
# from fields + tags compiled to one concat expression
# ---------------------------------------------------------------------------
@query(
    "fmtstr_topic",
    """
    SELECT 'app-' || event_type || '-prod' AS topic, count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY topic
    """,
)
def q_fmtstr_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.functions.fmtstr import compile_fmtstr

    df = _t(spark, sf_dir, "events")
    ev = to_events(
        df,
        content_col="props",
        field_cols=["event_type"],
        id_cols=["event_id"],
        tags={"env": "prod"},
    )
    topic = compile_fmtstr("app-%{content.event_type}-%{tag.env}")
    return (
        ev.groupBy(topic.alias("topic"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("topic")
    )


# ---------------------------------------------------------------------------
# input_file source — write the synthesized lines as REAL text files,
# read them back through read_log_files (glob, per-file provenance,
# per-file line numbering), parse, and aggregate. ``contig`` attests
# the 0..n-1 per-file line numbering (sum over files of max+1 == rows).
# ---------------------------------------------------------------------------
@query(
    "file_source_lines",
    """
    SELECT count(*) AS n_lines,
           CAST(sum(CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS BIGINT))
                AS BIGINT) AS sum_k,
           count(*) AS contig
    FROM events
    """,
)
def q_file_source_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.sources.logfiles import read_log_files

    tag = os.path.basename(os.path.normpath(sf_dir))
    log_dir = os.path.join(tempfile.gettempdir(), f"ilogtail_spark_logsrc_{tag}")
    df = _t(spark, sf_dir, "events")
    df.select(F.col("props").alias("value")).coalesce(2).write.mode(
        "overwrite"
    ).text(log_dir)

    lines = read_log_files(spark, log_dir, mode="lines")
    parsed = compile_processors(
        [{"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True}]
    )(lines)
    per_file = parsed.groupBy("__source_file__").agg(
        F.count(F.lit(1)).alias("__n__"),
        (F.max("__line__") + 1).alias("__maxp1__"),
        F.sum(F.col(FIELDS_COL).getItem("k").cast("long")).alias("__sumk__"),
    )
    return per_file.agg(
        F.sum("__n__").alias("n_lines"),
        F.sum("__sumk__").alias("sum_k"),
        F.sum("__maxp1__").alias("contig"),
    )


# ---------------------------------------------------------------------------
# multiline merge, UnmatchedContentTreatment=single_line
# (ProcessorMergeMultilineLogNative.cpp:353-380): lines before the
# first START each become their own event (negative provenance ids)
# ---------------------------------------------------------------------------
@query(
    "merge_multiline_single_line",
    """
    WITH lines AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 5 = 2 THEN 'START ' || event_id
                  ELSE 'cont ' || event_id END AS content
      FROM events
    ), evts AS (
      SELECT *, sum(CASE WHEN content LIKE 'START%' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS evt0,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM lines
    ), tagged AS (
      SELECT user_id, event_id, content,
             CAST(CASE WHEN evt0 > 0 THEN evt0 ELSE -rn END AS BIGINT) AS evt
      FROM evts
    )
    SELECT user_id, evt, string_agg(content, chr(10) ORDER BY event_id) AS merged
    FROM tagged
    GROUP BY user_id, evt
    ORDER BY user_id, evt
    """,
)
def q_merge_multiline_single_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    content = F.when(
        F.col("event_id") % 5 == 2,
        F.format_string("START %d", F.col("event_id")),
    ).otherwise(F.format_string("cont %d", F.col("event_id")))
    ev = to_events(
        df.withColumn("line", content),
        content_col="line",
        field_cols=[],
        id_cols=["user_id", "event_id"],
    )
    out = compile_processors(
        [
            {
                "Type": "processor_merge_multiline_log",
                "StartPattern": "START.*",
                "GroupColumns": ["user_id"],
                "OrderColumns": ["event_id"],
                "UnmatchedContentTreatment": "single_line",
            }
        ]
    )(ev)
    return out.select(
        "user_id",
        F.col("__evt__").alias("evt"),
        F.col(FIELDS_COL).getItem("content").alias("merged"),
    ).orderBy("user_id", "evt")


# ---------------------------------------------------------------------------
# streaming token-bucket rate limiter (applyInPandasWithState) — run
# as a real bounded stream (AvailableNow + checkpoint) over input
# engineered so admission has a closed form the oracle can compute:
# burst=3, refill 0.25/s, events 1 s apart per key => admitted iff
# i <= 2 or i % 4 == 0 (i = 0-based position within the key).
# ---------------------------------------------------------------------------
@query(
    "streaming_rate_limit",
    """
    WITH seq AS (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS i
      FROM events
    )
    SELECT event_type, count(*) AS admitted
    FROM seq
    WHERE i < 40 AND (i <= 2 OR i % 4 = 0)
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_streaming_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ilogtail_spark.streaming.stream import streaming_rate_limit

    root = tempfile.mkdtemp(prefix="ilogtail_spark_ratelim_")
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"

    w = Window.partitionBy("event_type").orderBy("event_id")
    base = (
        _t(spark, sf_dir, "events")
        .withColumn("i", F.row_number().over(w) - 1)
        .filter(F.col("i") < 40)
        .select(
            "event_type",
            "event_id",
            F.timestamp_seconds(F.lit(1704067200) + F.col("i")).alias("ts"),
        )
    )
    base.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(
        "event_type string, event_id long, ts timestamp"
    ).parquet(in_dir)
    limited = streaming_rate_limit(
        stream, key_cols=["event_type"], limit_per_sec=0.25, burst=3
    )
    (
        limited.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("admitted"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# checkpointed streaming pipeline + aggregates — the stateless surface
# (parse -> route -> per-sink windowed counts) run as a real
# AvailableNow stream with exactly-once file commits; oracle = the
# batch SQL over the same input
# ---------------------------------------------------------------------------
@query(
    "streaming_pipeline_agg",
    """
    SELECT CASE
             WHEN regexp_full_match(event_type, 'click|view') THEN 'sink_web'
             WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'sink_account'
             ELSE 'sink_default'
           END AS sink,
           date_trunc('hour', ts) AS bucket_ts,
           event_type AS role,
           count(*) AS events_total
    FROM events WHERE event_id < 2000
    GROUP BY 1, 2, 3
    ORDER BY sink, bucket_ts, role
    """,
)
def q_streaming_pipeline_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import run_streaming_aggregates

    root = tempfile.mkdtemp(prefix="ilogtail_spark_sagg_")
    in_dir = f"{root}/in"

    # transcripts-shaped input derived from events: role <- event_type
    (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("event_id").cast("int").alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.col("props").alias("text"),
            F.lit("").alias("tool"),
            F.col("ts"),
        )
        .coalesce(2)
        .write.parquet(in_dir)
    )
    from ilogtail_spark.model import TRANSCRIPT_SCHEMA

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(in_dir)
    pipe = Pipeline(
        processors=[],
        router={
            "Mode": "first_match",
            "SourceKey": "role",
            "RouterRegex": ["click|view", "purchase|signup"],
            "RouterLogstore": ["sink_web", "sink_account"],
            "DefaultLogstore": "sink_default",
        },
        flushers=[],
    )
    run_streaming_aggregates(
        stream, pipe, root, f"{root}/ckpt", window="1 hour"
    ).awaitTermination()
    return spark.read.parquet(f"{root}/aggregates").orderBy(
        "sink", "bucket_ts", "role"
    )


# ---------------------------------------------------------------------------
# streaming multiline merge — stateful merge across micro-batches
# (AvailableNow drain over a 2-file input). The oracle replicates the
# batch window merge and EXCLUDES each group's final logical event:
# that's the pending partial the stateful operator withholds until a
# successor start arrives (the contract under test).
# ---------------------------------------------------------------------------
@query(
    "streaming_multiline_merge",
    """
    WITH lines AS (
      SELECT CAST(user_id % 13 AS VARCHAR) AS conv_id,
             event_id AS turn_idx,
             CASE WHEN event_id % 4 = 1 THEN 'START ' || event_id
                  ELSE 'cont ' || event_id END AS text
      FROM events WHERE event_id < 400
    ), evts AS (
      SELECT *, sum(CASE WHEN text LIKE 'START%' THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS UNBOUNDED PRECEDING) AS evt
      FROM lines
    ), merged AS (
      SELECT conv_id, evt,
             CAST(min(turn_idx) AS BIGINT) AS evt_start,
             CAST(count(*) AS INT) AS n_lines,
             string_agg(text, chr(10) ORDER BY turn_idx) AS merged
      FROM evts WHERE evt > 0
      GROUP BY conv_id, evt
    ), unmatched AS (
      SELECT conv_id, CAST(turn_idx AS BIGINT) AS evt_start,
             1 AS n_lines, text AS merged
      FROM evts WHERE evt = 0
    )
    SELECT conv_id, evt_start, n_lines, merged FROM (
      SELECT conv_id, evt_start, n_lines, merged,
             row_number() OVER (PARTITION BY conv_id ORDER BY evt_start DESC) AS rn
      FROM merged
    ) WHERE rn > 1  -- the last event per group is the withheld partial
    UNION ALL
    SELECT * FROM unmatched
    ORDER BY conv_id, evt_start
    """,
)
def q_streaming_multiline_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_multiline_merge

    root = tempfile.mkdtemp(prefix="ilogtail_spark_smerge_")
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"

    base = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 400)
        .select(
            (F.col("user_id") % 13).cast("string").alias("conv_id"),
            F.col("event_id").alias("turn_idx"),
            F.when(
                F.col("event_id") % 4 == 1,
                F.format_string("START %d", F.col("event_id")),
            )
            .otherwise(F.format_string("cont %d", F.col("event_id")))
            .alias("text"),
        )
    )
    # two files => two micro-batches: events split across the boundary
    # exercise the carried state
    base.filter(F.col("turn_idx") < 200).coalesce(1).write.parquet(in_dir)
    base.filter(F.col("turn_idx") >= 200).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema("conv_id string, turn_idx long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    merged = streaming_multiline_merge(
        stream, start_pattern="START.*", group_cols=["conv_id"],
        order_col="turn_idx", content_col="text",
    )
    (
        merged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out_dir).orderBy("conv_id", "evt_start")


# ---------------------------------------------------------------------------
# lineage manifest + resume — run the flagship pipeline through
# run_pipeline twice with the same run_id: the rerun must short-circuit
# on the committed manifest with identical per-sink counts, and the
# self-monitor observe counters must equal the input cardinality
# ---------------------------------------------------------------------------
@query(
    "lineage_resume",
    """
    SELECT CASE
             WHEN regexp_full_match(event_type, 'click|view') THEN 'sink_web'
             WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'sink_account'
             ELSE 'sink_default'
           END AS sink,
           count(*) AS n,
           (SELECT count(*) FROM events) AS in_events,
           1 AS resumed_ok
    FROM events
    GROUP BY 1
    ORDER BY sink
    """,
)
def q_lineage_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.lineage import run_pipeline
    from ilogtail_spark.entryq import PIPELINE_E2E

    # drop the k-filter so every event routes (counts = events table)
    pipe = Pipeline(
        processors=[
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True}
        ],
        router=PIPELINE_E2E.router,
        flushers=[],
    )
    # unique per-invocation dir (concurrent harness processes must not
    # clobber each other's manifests)
    out_root = tempfile.mkdtemp(prefix="ilogtail_spark_lineage_")

    ev = _events(spark, sf_dir)
    m1 = run_pipeline(spark, ev, pipe, out_root, run_id="att", agg_keys=["event_type"])
    m2 = run_pipeline(spark, ev, pipe, out_root, run_id="att", agg_keys=["event_type"])
    resumed_ok = int(
        m2.finished and m1.sink_counts == m2.sink_counts and bool(m1.sink_counts)
    )
    in_events = int(m1.metrics.get("in_events_total", -1))
    rows = [
        (sink, int(n), in_events, resumed_ok)
        for sink, n in sorted(m1.sink_counts.items())
    ]
    return spark.createDataFrame(
        rows, "sink string, n long, in_events long, resumed_ok int"
    ).orderBy("sink")


# ---------------------------------------------------------------------------
# processor_split_log_regex — 1 log -> N logs at full-matching lines
# (split_log_regex.go:56-101); the multi-line value is synthesized
# identically on both sides, so the oracle enumerates the segments
# ---------------------------------------------------------------------------
@query(
    "split_log_regex",
    """
    SELECT event_id, seg FROM (
      SELECT event_id, 'pre' AS seg, 0 AS ord FROM events
      UNION ALL
      SELECT event_id,
             'START a' || CAST(user_id AS VARCHAR) || chr(10) || 'cont', 1
      FROM events
      UNION ALL
      SELECT event_id, 'START b' || CAST(event_id AS VARCHAR), 2 FROM events
    ) ORDER BY event_id, ord
    """,
)
def q_split_log_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "pre\nSTART a%d\ncont\nSTART b%d",
        F.col("user_id"),
        F.col("event_id"),
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [
            {
                "Type": "processor_split_log_regex",
                "SplitKey": "content",
                "SplitRegex": "START.*",
                "PreserveOthers": True,
            }
        ]
    )(ev)
    seg = F.col(FIELDS_COL).getItem("content")
    ordc = (
        F.when(seg == "pre", F.lit(0))
        .when(seg.startswith("START a"), F.lit(1))
        .otherwise(F.lit(2))
    )
    return out.select("event_id", seg.alias("seg"), ordc.alias("__o__")).orderBy(
        "event_id", "__o__"
    ).drop("__o__")


# ---------------------------------------------------------------------------
# processor_parse_container_log — containerd text normalization
# (ProcessorParseContainerLogNative.cpp:176-258): time/source/P-F tag
# variants synthesized identically on both sides
# ---------------------------------------------------------------------------
@query(
    "container_log_parse",
    """
    SELECT event_id,
           '2021-08-25T07:00:00.000000000Z' AS t,
           CASE WHEN event_id % 2 = 0 THEN 'stdout' ELSE 'stderr' END AS src,
           'msg ' || event_type AS content,
           CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END AS is_partial
    FROM events
    ORDER BY event_id
    """,
)
def q_container_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    src = F.when(F.col("event_id") % 2 == 0, F.lit("stdout")).otherwise(
        F.lit("stderr")
    )
    tag = (
        F.when(F.col("event_id") % 3 == 0, F.lit("F "))
        .when(F.col("event_id") % 3 == 1, F.lit("P "))
        .otherwise(F.lit(""))
    )
    line = F.concat(
        F.lit("2021-08-25T07:00:00.000000000Z "),
        src,
        F.lit(" "),
        tag,
        F.lit("msg "),
        F.col("event_type"),
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors(
        [{"Type": "processor_parse_container_log"}]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("_time_").alias("t"),
        f.getItem("_source_").alias("src"),
        f.getItem("content").alias("content"),
        F.map_contains_key(f, "P").cast("int").alias("is_partial"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# prometheus exposition parse + relabel
# (ProcessorPromParseMetricNative.cpp:27-67, Relabel.cpp:147-230):
# lines synthesized identically on both sides; the relabel chain
# (labelmap -> replace -> keep) is enumerable in SQL
# ---------------------------------------------------------------------------
@query(
    "prom_parse_metrics",
    """
    SELECT CAST(event_id AS VARCHAR) AS id,
           'req_total' AS name,
           'm' || CAST(user_id % 3 AS VARCHAR) AS method,
           CAST(user_id AS DOUBLE) AS value,
           CAST(1700000000000 + event_id AS BIGINT) AS ts_ms
    FROM events
    ORDER BY CAST(id AS BIGINT)
    """,
)
def q_prom_parse_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.operators.prom import prom_parse

    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        'req_total{id="%d",method="m%d"} %d %d',
        F.col("event_id"),
        F.col("user_id") % 3,
        F.col("user_id"),
        F.col("event_id") + 1700000000000,
    )
    out = prom_parse(df.withColumn("text", line))
    lb = F.col("labels")
    return out.select(
        lb.getItem("id").alias("id"),
        F.col("name"),
        lb.getItem("method").alias("method"),
        F.col("value"),
        F.col("ts_ms"),
    ).orderBy(F.col("id").cast("long"))


@query(
    "prom_relabel_chain",
    """
    SELECT CAST(event_id AS VARCHAR) AS id,
           'api' AS k8s_app,
           'host' || CAST(user_id % 5 AS VARCHAR) AS host
    FROM events
    WHERE event_id % 2 = 0
    ORDER BY CAST(id AS BIGINT)
    """,
)
def q_prom_relabel_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.operators.prom import relabel

    df = _t(spark, sf_dir, "events").select(
        F.create_map(
            F.lit("id"), F.col("event_id").cast("string"),
            F.lit("__meta_app"), F.lit("api"),
            F.lit("__address__"),
            F.format_string("host%d:9100", F.col("user_id") % 5),
            F.lit("parity"),
            (F.col("event_id") % 2).cast("string"),
        ).alias("labels")
    )
    out = relabel(
        df,
        [
            {"regex": "__meta_(.+)", "action": "labelmap",
             "replacement": "k8s_$1"},
            {"source_labels": ["__address__"], "regex": r"([^:]+):\d+",
             "target_label": "host", "replacement": "$1"},
            {"source_labels": ["parity"], "regex": "0", "action": "keep"},
            {"regex": "__.*|parity", "action": "labeldrop"},
        ],
    )
    lb = F.col("labels")
    return out.select(
        lb.getItem("id").alias("id"),
        lb.getItem("k8s_app").alias("k8s_app"),
        lb.getItem("host").alias("host"),
    ).orderBy(F.col("id").cast("long"))


# ---------------------------------------------------------------------------
# streaming exact dedup — engine dedup state across micro-batches; the
# kept DIGEST SET must equal the batch definition (arrival order only
# decides WHICH member survives, and digests are member-invariant)
# ---------------------------------------------------------------------------
@query(
    "streaming_exact_dedup",
    """
    SELECT DISTINCT md5(text) AS digest FROM documents ORDER BY digest
    """,
)
def q_streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.streaming.stream import streaming_drop_exact_duplicates

    root = tempfile.mkdtemp(prefix="ilogtail_spark_sdedup_")
    in_dir, out_dir, ckpt = f"{root}/in", f"{root}/out", f"{root}/ckpt"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # two files -> two micro-batches; duplicates span the split
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    import time as _time

    _time.sleep(1.1)  # distinct mtimes => deterministic batch order
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    (
        streaming_drop_exact_duplicates(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.read.parquet(out_dir)
        .select(F.md5(F.col("text")).alias("digest"))
        .orderBy("digest")
    )


# ---------------------------------------------------------------------------
# incremental series — file-range checkpoints (checkpoint.proto:18-38
# RangeCheckpointPB analog): two increments over a growing input dir
# must together equal one full run, and an unchanged input is a no-op
# ---------------------------------------------------------------------------
@query(
    "lineage_incremental",
    """
    SELECT CASE
             WHEN regexp_full_match(event_type, 'click|view') THEN 'sink_web'
             WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'sink_account'
             ELSE 'sink_default'
           END AS sink,
           count(*) AS n,
           2 AS increments,
           1 AS noop_ok
    FROM events
    GROUP BY 1
    ORDER BY sink
    """,
)
def q_lineage_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.lineage import SeriesState, incremental_run
    from ilogtail_spark.entryq import PIPELINE_E2E

    pipe = Pipeline(
        processors=[
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True}
        ],
        router=PIPELINE_E2E.router,
        flushers=[],
    )
    # unique per-invocation dir: a fixed path + rmtree would let two
    # concurrent harness processes (driver + mirror) delete each
    # other's in-flight series state
    base = tempfile.mkdtemp(prefix="ilogtail_spark_incr_")
    in_dir, out_root = os.path.join(base, "in"), os.path.join(base, "out")

    raw = _t(spark, sf_dir, "events")

    def as_events(df: DataFrame) -> DataFrame:
        return to_events(
            df, content_col="props",
            field_cols=["event_type", "user_id"], id_cols=["event_id", "ts"],
        )

    def run_once() -> object:
        return incremental_run(
            spark, in_dir, pipe, out_root, "ser",
            agg_keys=["event_type"], to_events_fn=as_events,
        )

    raw.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    m1 = run_once()
    raw.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    m2 = run_once()
    noop_ok = int(run_once() is None and m1.finished and m2.finished)
    totals: dict[str, int] = {}
    for m in (m1, m2):
        for sink, n in m.sink_counts.items():
            totals[sink] = totals.get(sink, 0) + int(n)
    incs = len(SeriesState.load(out_root, "ser").run_ids)
    rows = [(s, n, incs, noop_ok) for s, n in sorted(totals.items())]
    return spark.createDataFrame(
        rows, "sink string, n long, increments int, noop_ok int"
    ).orderBy("sink")


# ---------------------------------------------------------------------------
# processor_spl — the SPL pipe-language front-end compiled onto the
# same operators (ProcessorSPL.cpp:30-96; SLS SPL doc syntax)
# ---------------------------------------------------------------------------
@query(
    "spl_pipeline",
    """
    SELECT event_id,
           regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS k,
           CASE WHEN CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS INT) >= 50
                THEN 'true' ELSE 'false' END AS hot,
           event_type
    FROM events
    WHERE regexp_matches(event_type, '^(click|view|purchase)$')
    ORDER BY event_id
    """,
)
def q_spl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    script = (
        "* "
        "| parse-regexp content, '\\{\"k\": (\\d+)\\}' as k "
        "| where event_type rlike '^(click|view|purchase)$' "
        "| extend hot = cast(k as int) >= 50 "
        "| project k, hot, event_type"
    )
    out = compile_processors([{"Type": "processor_spl", "Script": script}])(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("k").alias("k"),
        f.getItem("hot").alias("hot"),
        f.getItem("event_type").alias("event_type"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# SPL stats — the grouped-aggregation pipe command (SLS SPL `stats`):
# parse the numeric k out of props, aggregate per event_type
# ---------------------------------------------------------------------------
@query(
    "spl_stats",
    """
    WITH t AS (
      SELECT event_type,
             CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS DOUBLE) AS k
      FROM events
    )
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(k) AS DOUBLE) AS total_k,
           CAST(floor(avg(k) * 1000000) AS BIGINT) AS avg_k_micro
    FROM t GROUP BY 1 ORDER BY event_type
    """,
)
def q_spl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    script = (
        "* "
        "| parse-regexp content, '\\{\"k\": (\\d+)\\}' as k "
        "| stats count() as cnt, sum(k) as total_k, avg(k) as avg_k "
        "by event_type"
    )
    out = compile_processors([{"Type": "processor_spl", "Script": script}])(ev)
    f = F.col(FIELDS_COL)
    # avg in fixed-point micro (floor of identical IEEE doubles is
    # bit-identical on both engines; round() half-up vs ties is not)
    return out.select(
        f.getItem("event_type").alias("event_type"),
        f.getItem("cnt").cast("long").alias("cnt"),
        f.getItem("total_k").cast("double").alias("total_k"),
        F.floor(f.getItem("avg_k").cast("double") * 1_000_000)
        .cast("long")
        .alias("avg_k_micro"),
    ).orderBy("event_type")


