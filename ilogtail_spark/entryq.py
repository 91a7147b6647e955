"""Query registry backing ``__spark_entry__.py``.

One entry per implemented operator (SURVEY.md §2): each query runs the
operator through the real pipeline surface (``to_events`` →
processors → router → aggregates) over the driver's parquet tables,
and each has an ANSI-SQL oracle DuckDB can run on the same tables.

Design notes for oracle parity:
  * every computed column is aliased IDENTICALLY in the Spark plan and
    the SQL (the driver hash-compares values after sorting columns by
    name);
  * floats are avoided or rounded the same way on both sides;
  * log-line parsing queries SYNTHESIZE the line deterministically
    from table columns inside the query on BOTH sides (format_string
    vs printf), then parse it back — proving parse parity on identical
    inputs without external fixtures.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ilogtail_spark.model import FIELDS_COL, to_events
from ilogtail_spark.plans.pipeline import Pipeline, compile_processors
from ilogtail_spark.plans.router import SINK_COL, route
from ilogtail_spark.sinks.writers import sink_aggregates

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def ensure_conf(spark: SparkSession) -> None:
    """Runtime confs the pipeline depends on, set defensively because
    the driver may hand us a session built without them.

    LAST_WIN: ``map_concat(old, parsed)`` must let later writes win —
    the reference's insert-or-overwrite content semantics
    (plugins/processor/regex/regex.go:105-129)."""
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_conf(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table as a pipeline event stream: the JSON ``props``
    payload is the raw content; event_type/user_id ride as fields."""
    df = _t(spark, sf_dir, "events")
    return to_events(
        df,
        content_col="props",
        field_cols=["event_type", "user_id"],
        id_cols=["event_id", "ts"],
    )


K_REGEX = r'\{"k": (\d+)\}'


# ---------------------------------------------------------------------------
# processor_regex — extract k from the JSON-ish props via regex, aggregate
# ---------------------------------------------------------------------------
@query(
    "regex_parse",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_regex_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [{"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"]}]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(f.getItem("event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(f.getItem("k").cast("long")).alias("sum_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# processor_filter_regex — Include/Exclude regex predicates
# ---------------------------------------------------------------------------
@query(
    "filter_regex",
    """
    SELECT event_type, count(*) AS n
    FROM (
      SELECT event_type,
             regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS k
      FROM events
      WHERE regexp_matches(event_type, '^(?:error|purchase)$')
    )
    WHERE NOT regexp_matches(k, '^1')
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"]},
            {
                "Type": "processor_filter_regex",
                "Include": {"event_type": "^(?:error|purchase)$"},
                "Exclude": {"k": "^1"},
            },
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(f.getItem("event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# processor_filter_native — boolean expression tree (AND/OR/NOT over regex)
# ---------------------------------------------------------------------------
@query(
    "filter_condition_tree",
    """
    SELECT event_type, count(*) AS n
    FROM (
      SELECT event_type,
             regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS k
      FROM events
    )
    WHERE regexp_matches(event_type, 'error')
       OR (regexp_matches(event_type, 'purchase')
           AND regexp_matches(k, '^[5-9][0-9]$'))
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_filter_condition_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    tree = {
        "operator": "or",
        "operands": [
            {"key": "event_type", "exp": "error"},
            {
                "operator": "and",
                "operands": [
                    {"key": "event_type", "exp": "purchase"},
                    {"key": "k", "exp": "^[5-9][0-9]$"},
                ],
            },
        ],
    }
    run = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"]},
            {"Type": "processor_filter_native", "ConditionExp": tree},
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(f.getItem("event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# router first_match — Go logstore_router semantics (full-anchored regex,
# first match wins, default store)
# ---------------------------------------------------------------------------
@query(
    "router_first_match",
    """
    SELECT CASE
             WHEN regexp_full_match(event_type, 'click|view') THEN 'sink_web'
             WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'sink_account'
             ELSE 'sink_default'
           END AS sink,
           count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY sink
    """,
)
def q_router_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    routed = route(
        ev,
        {
            "Mode": "first_match",
            "SourceKey": "event_type",
            "RouterRegex": ["click|view", "purchase|signup"],
            "RouterLogstore": ["sink_web", "sink_account"],
            "DefaultLogstore": "sink_default",
        },
        [],
    )
    return (
        routed.groupBy(F.col(SINK_COL).alias("sink"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink")
    )


# ---------------------------------------------------------------------------
# router multicast — C++ Router semantics: a row is COPIED to every
# matching flusher (rows may land in several sinks)
# ---------------------------------------------------------------------------
@query(
    "router_multicast",
    """
    WITH k AS (
      SELECT event_type,
             regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS k
      FROM events
    )
    SELECT sink, count(*) AS n FROM (
      SELECT 'sink_all' AS sink FROM k
      UNION ALL
      SELECT 'sink_errors' AS sink FROM k
        WHERE regexp_full_match(event_type, 'error')
      UNION ALL
      SELECT 'sink_hot' AS sink FROM k
        WHERE regexp_matches(k, '^[5-9][0-9]$')
    )
    GROUP BY sink
    ORDER BY sink
    """,
)
def q_router_multicast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [{"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True}]
    )
    parsed = run(ev)
    flushers = [
        {"Name": "sink_all"},
        {"Name": "sink_errors", "Match": {"Type": "field", "Key": "event_type", "Value": "error"}},
        {
            "Name": "sink_hot",
            "Match": {"Type": "expr", "Exp": {"key": "k", "exp": "^[5-9][0-9]$"}},
        },
    ]
    routed = route(parsed, {"Mode": "multicast"}, flushers)
    return (
        routed.groupBy(F.col(SINK_COL).alias("sink"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("sink")
    )


# ---------------------------------------------------------------------------
# field transforms: add_fields / rename / md5 / base64 / pick_key chained
# ---------------------------------------------------------------------------
@query(
    "transform_fields",
    """
    SELECT event_id,
           regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS kval,
           md5(props) AS props_md5,
           to_base64(event_type::BLOB) AS type_b64,
           'ilogtail-spark' AS origin
    FROM events
    ORDER BY event_id
    """,
)
def q_transform_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
            {"Type": "processor_add_fields", "Fields": {"origin": "ilogtail-spark"}},
            {"Type": "processor_rename", "SourceKeys": ["k"], "DestKeys": ["kval"]},
            {"Type": "processor_md5", "SourceKey": "content", "MD5Key": "props_md5"},
            {
                "Type": "processor_base64_encoding",
                "SourceKey": "event_type",
                "NewKey": "type_b64",
            },
            {
                "Type": "processor_pick_key",
                "Include": ["kval", "props_md5", "type_b64", "origin"],
            },
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        F.col("event_id"),
        f.getItem("kval").alias("kval"),
        f.getItem("props_md5").alias("props_md5"),
        f.getItem("type_b64").alias("type_b64"),
        f.getItem("origin").alias("origin"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_fields_with_condition — switch/case, first matching case wins
# ---------------------------------------------------------------------------
@query(
    "fields_with_condition",
    """
    SELECT CASE
             WHEN event_type = 'error' THEN 'high'
             WHEN event_type = 'purchase' OR event_type = 'signup' THEN 'mid'
             ELSE 'low'
           END AS severity,
           count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY severity
    """,
)
def q_fields_with_condition(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {
                "Type": "processor_fields_with_condition",
                "Switch": [
                    {
                        "Case": {"FieldConditions": {"event_type": "error"}},
                        "Actions": [
                            {"Type": "processor_add_fields", "Fields": {"severity": "high"}}
                        ],
                    },
                    {
                        "Case": {
                            "LogicalOperator": "or",
                            "FieldConditions": {
                                "event_type": "purchase",
                                "event_type2_unused": "never",
                            },
                        },
                        "Actions": [
                            {"Type": "processor_add_fields", "Fields": {"severity": "mid"}}
                        ],
                    },
                    {
                        "Case": {"FieldConditions": {"event_type": "signup"}},
                        "Actions": [
                            {"Type": "processor_add_fields", "Fields": {"severity": "mid"}}
                        ],
                    },
                ],
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(F.coalesce(f.getItem("severity"), F.lit("low")).alias("severity"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("severity")
    )


# ---------------------------------------------------------------------------
# processor_rate_limit — cap N rows per (key combo, time bucket)
# ---------------------------------------------------------------------------
@query(
    "rate_limit",
    """
    SELECT event_type, count(*) AS n
    FROM (
      SELECT event_type
      FROM events
      QUALIFY row_number() OVER (
        PARTITION BY event_type, CAST(floor(epoch(ts) / 60) AS BIGINT)
        ORDER BY ts, event_id
      ) <= 3
    )
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {
                "Type": "processor_rate_limit",
                "Fields": ["event_type"],
                "Limit": "3/m",
                "OrderColumns": ("ts", "event_id"),
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(f.getItem("event_type").alias("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# processor_desensitize — regex scan-replace (mask the number after "k": )
# ---------------------------------------------------------------------------
@query(
    "desensitize",
    """
    SELECT event_id,
           regexp_replace(props, '("k": )[0-9]+', '\\1********', 'g') AS masked
    FROM events
    ORDER BY event_id
    """,
)
def q_desensitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {
                "Type": "processor_desensitize",
                "SourceKey": "content",
                "Method": "const",
                "Match": "regex",
                "ReplaceString": "********",
                "RegexBegin": '"k": ',
                "RegexContent": "[0-9]+",
            }
        ]
    )
    out = run(ev)
    return out.select(
        F.col("event_id"), F.col(FIELDS_COL).getItem("content").alias("masked")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_timestamp_filter_native + per-sink aggregates (the flagship
# end-to-end: parse -> filter -> route -> hourly per-sink counts)
# ---------------------------------------------------------------------------
PIPELINE_E2E = Pipeline(
    processors=[
        {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
        {
            "Type": "processor_filter_regex",
            "Include": {"k": "^[0-9]+$"},
        },
    ],
    router={
        "Mode": "first_match",
        "SourceKey": "event_type",
        "RouterRegex": ["click|view", "purchase|signup"],
        "RouterLogstore": ["sink_web", "sink_account"],
        "DefaultLogstore": "sink_default",
    },
    flushers=[],
)


@query(
    "e2e_sink_hourly_counts",
    """
    SELECT CASE
             WHEN regexp_full_match(event_type, 'click|view') THEN 'sink_web'
             WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'sink_account'
             ELSE 'sink_default'
           END AS sink,
           date_trunc('hour', ts) AS bucket_ts,
           event_type,
           count(*) AS events_total
    FROM events
    WHERE regexp_matches(regexp_extract(props, '\\{"k": (\\d+)\\}', 1), '^[0-9]+$')
    GROUP BY 1, 2, 3
    ORDER BY sink, bucket_ts, event_type
    """,
)
def q_e2e_sink_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    routed = PIPELINE_E2E.route(ev)
    agg = sink_aggregates(routed, keys=["event_type"], time_bucket="1 hour")
    return agg.orderBy("sink", "bucket_ts", "event_type")


# ---------------------------------------------------------------------------
# multi-pipeline, one scan — the reference agent's multi-config mode
# (CollectionPipelineManager name->pipeline map; every event group is
# offered to each config). Two configs with different processors and
# routers run over ONE persisted scan of the events table.
# ---------------------------------------------------------------------------
@query(
    "multi_pipeline_counts",
    """
    WITH a AS (
      SELECT 'web' AS config,
             CASE WHEN regexp_full_match(event_type, 'click|view') THEN 'm_web'
                  WHEN regexp_full_match(event_type, 'purchase|signup') THEN 'm_account'
                  ELSE 'm_other' END AS sink
      FROM events
    ), b AS (
      SELECT 'audit' AS config,
             CASE WHEN regexp_full_match(CAST(user_id AS VARCHAR), '[0-9]*[02468]')
                  THEN 'm_even' ELSE 'm_odd' END AS sink
      FROM events
      WHERE regexp_matches(event_type, '^(click|error)$')
    )
    SELECT config, sink, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY config, sink
    ORDER BY config, sink
    """,
)
def q_multi_pipeline_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.multi import CONFIG_COL, run_pipelines
    from ilogtail_spark.plans.router import SINK_COL

    ev = _events(spark, sf_dir)
    pipelines = {
        "web": Pipeline(
            router={
                "Mode": "first_match",
                "SourceKey": "event_type",
                "RouterRegex": ["click|view", "purchase|signup"],
                "RouterLogstore": ["m_web", "m_account"],
                "DefaultLogstore": "m_other",
            },
        ),
        "audit": Pipeline(
            processors=[
                {
                    "Type": "processor_filter_regex",
                    "Include": {"event_type": "^(click|error)$"},
                }
            ],
            router={
                "Mode": "first_match",
                "SourceKey": "user_id",
                "RouterRegex": ["[0-9]*[02468]"],
                "RouterLogstore": ["m_even"],
                "DefaultLogstore": "m_odd",
            },
        ),
    }
    try:
        routed = run_pipelines(ev, pipelines)
        out = (
            routed.groupBy(
                F.col(CONFIG_COL).alias("config"),
                F.col(SINK_COL).alias("sink"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("config", "sink")
        )
        # tiny aggregate: materialize it, then release the one-scan
        # cache (run_pipelines persisted `ev`) so back-to-back
        # registry queries don't accumulate cached relations — in a
        # finally so a failed job can't leak the persisted input
        return out.localCheckpoint()
    finally:
        ev.unpersist()


# ---------------------------------------------------------------------------
# processor_grok — parse a synthesized access-log line; the oracle
# reconstructs the fields from the same deterministic construction
# ---------------------------------------------------------------------------
@query(
    "grok_parse",
    """
    SELECT event_id,
           printf('10.0.%d.%d', user_id % 200, event_id % 250) AS client,
           event_type AS method,
           printf('/api/%s/%d', event_type, event_id % 1000) AS request,
           CAST(user_id AS VARCHAR) AS bytes,
           CAST(event_id % 97 AS VARCHAR) AS duration
    FROM events
    ORDER BY event_id
    """,
)
def q_grok_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "10.0.%d.%d %s /api/%s/%d %d %d",
        F.col("user_id") % 200,
        F.col("event_id") % 250,
        F.col("event_type"),
        F.col("event_type"),
        F.col("event_id") % 1000,
        F.col("user_id"),
        F.col("event_id") % 97,
    )
    ev = to_events(
        df.withColumn("line", line),
        content_col="line",
        field_cols=[],
        id_cols=["event_id"],
    )
    run = compile_processors(
        [
            {
                "Type": "processor_grok",
                "CustomPatterns": {
                    "HTTP": "%{IP:client} %{WORD:method} %{URIPATHPARAM:request} %{NUMBER:bytes} %{NUMBER:duration}"
                },
                "Match": ["%{HTTP}"],
                "KeepSource": False,
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("client").alias("client"),
        f.getItem("method").alias("method"),
        f.getItem("request").alias("request"),
        f.getItem("bytes").alias("bytes"),
        f.getItem("duration").alias("duration"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_json — dynamic flatten incl. nested objects and arrays
# ---------------------------------------------------------------------------
@query(
    "json_flatten",
    """
    SELECT event_id,
           CAST(user_id % 50 AS VARCHAR) AS a_b,
           CAST(event_id % 7 AS VARCHAR) AS arr0,
           event_type AS arr1_x,
           CAST(user_id AS VARCHAR) AS v
    FROM events
    ORDER BY event_id
    """,
)
def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    doc = F.format_string(
        '{"a":{"b":%d},"arr":[%d,{"x":"%s"}],"v":%d}',
        F.col("user_id") % 50,
        F.col("event_id") % 7,
        F.col("event_type"),
        F.col("user_id"),
    )
    ev = to_events(
        df.withColumn("doc", doc), content_col="doc", field_cols=[], id_cols=["event_id"]
    )
    run = compile_processors(
        [
            {
                "Type": "processor_json",
                "SourceKey": "content",
                "ExpandArray": True,
                "KeepSource": False,
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("_a_b").alias("a_b"),
        f.getItem("_arr[0]").alias("arr0"),
        f.getItem("_arr[1]_x").alias("arr1_x"),
        f.getItem("_v").alias("v"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_csv — RFC-4180 with a quoted field containing the separator
# ---------------------------------------------------------------------------
@query(
    "split_csv",
    """
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS c1,
           event_type AS c2,
           printf('q,%d', user_id % 10) AS c3,
           CAST(user_id AS VARCHAR) AS c4
    FROM events
    ORDER BY event_id
    """,
)
def q_split_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        '%d,%s,"q,%d",%d',
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id") % 10,
        F.col("user_id"),
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    run = compile_processors(
        [
            {
                "Type": "processor_csv",
                "SourceKey": "content",
                "SplitKeys": ["c1", "c2", "c3", "c4"],
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        *[f.getItem(c).alias(c) for c in ["c1", "c2", "c3", "c4"]],
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_split_key_value — incl. empty-key and no-separator fallbacks
# ---------------------------------------------------------------------------
@query(
    "split_key_value",
    """
    SELECT event_id,
           event_type AS type,
           CAST(user_id AS VARCHAR) AS uid,
           printf('v%d', event_id % 5) AS empty_key_0,
           printf('stray%d', user_id % 3) AS no_separator_key_0
    FROM events
    ORDER BY event_id
    """,
)
def q_split_key_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "type:%s\tuid:%d\t:v%d\tstray%d",
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id") % 5,
        F.col("user_id") % 3,
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    run = compile_processors(
        [{"Type": "processor_split_key_value", "SourceKey": "content"}]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("type").alias("type"),
        f.getItem("uid").alias("uid"),
        f.getItem("empty_key_0").alias("empty_key_0"),
        f.getItem("no_separator_key_0").alias("no_separator_key_0"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_parse_delimiter_native — overflow EXTEND policy
# ---------------------------------------------------------------------------
@query(
    "split_delimiter",
    """
    SELECT event_id,
           CAST(event_id AS VARCHAR) AS a,
           event_type AS b,
           CAST(user_id AS VARCHAR) AS col2,
           CAST(event_id % 13 AS VARCHAR) AS col3
    FROM events
    ORDER BY event_id
    """,
)
def q_split_delimiter(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "%d|%s|%d|%d",
        F.col("event_id"),
        F.col("event_type"),
        F.col("user_id"),
        F.col("event_id") % 13,
    )
    ev = to_events(
        df.withColumn("line", line), content_col="line", field_cols=[], id_cols=["event_id"]
    )
    run = compile_processors(
        [
            {
                "Type": "processor_parse_delimiter_native",
                "SourceKey": "content",
                "Separator": "|",
                "Keys": ["a", "b"],
                "OverflowedFieldsTreatment": "extend",
                "KeepingSourceWhenParseSucceed": False,
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("a").alias("a"),
        f.getItem("b").alias("b"),
        f.getItem("__column2__").alias("col2"),
        f.getItem("__column3__").alias("col3"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_strptime — round-trip the event time through a string field
# ---------------------------------------------------------------------------
@query(
    "strptime_time",
    """
    SELECT event_id, date_trunc('second', ts) AS parsed_ts
    FROM events
    ORDER BY event_id
    """,
)
def q_strptime_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    tstr = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")
    ev = to_events(
        df.withColumn("tstr", tstr).drop("ts"),
        content_col="props",
        field_cols=["tstr"],
        id_cols=["event_id"],
    )
    run = compile_processors(
        [
            {
                "Type": "processor_strptime",
                "SourceKey": "tstr",
                "Format": "%Y-%m-%d %H:%M:%S",
            }
        ]
    )
    out = run(ev)
    return out.select("event_id", F.col("ts").alias("parsed_ts")).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_gotime — Go-layout reformat of a time field
# ---------------------------------------------------------------------------
@query(
    "gotime_reformat",
    """
    SELECT event_id, strftime(ts, '%Y/%m/%d') AS d
    FROM events
    ORDER BY event_id
    """,
)
def q_gotime_reformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    tstr = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")
    ev = to_events(
        df.withColumn("tstr", tstr).drop("ts"),
        content_col="props",
        field_cols=["tstr"],
        id_cols=["event_id"],
    )
    run = compile_processors(
        [
            {
                "Type": "processor_gotime",
                "SourceKey": "tstr",
                "SourceFormat": "2006-01-02 15:04:05",
                "DestKey": "d",
                "DestFormat": "2006/01/02",
                "SetTime": False,
            }
        ]
    )
    out = run(ev)
    return out.select(
        "event_id", F.col(FIELDS_COL).getItem("d").alias("d")
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_dict_map — broadcast lookup enrich (miss leaves row untouched)
# ---------------------------------------------------------------------------
EVENT_CLASS = {
    "click": "engagement",
    "view": "engagement",
    "purchase": "revenue",
    "signup": "growth",
    # 'error' intentionally unmapped
}


@query(
    "dict_map_enrich",
    """
    SELECT CASE event_type
             WHEN 'click' THEN 'engagement'
             WHEN 'view' THEN 'engagement'
             WHEN 'purchase' THEN 'revenue'
             WHEN 'signup' THEN 'growth'
             ELSE ''
           END AS category,
           count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY category
    """,
)
def q_dict_map_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    run = compile_processors(
        [
            {
                "Type": "processor_dict_map",
                "SourceKey": "event_type",
                "DestKey": "category",
                "MapDict": EVENT_CLASS,
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(F.coalesce(f.getItem("category"), F.lit("")).alias("category"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("category")
    )


# ---------------------------------------------------------------------------
# processor_lookup_join — broadcast join against a dimension table
# ---------------------------------------------------------------------------
@query(
    "lookup_join_enrich",
    """
    SELECT n.n_name AS nation, count(*) AS n
    FROM events e JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def q_lookup_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events").withColumn(
        "nk", (F.col("user_id") % 25).cast("string")
    )
    ev = to_events(df, content_col="props", field_cols=["nk"], id_cols=["event_id"])
    run = compile_processors(
        [
            {
                "Type": "processor_lookup_join",
                "SourceKey": "nk",
                "DimPath": f"{sf_dir}/nation.parquet",
                "KeyColumn": "n_nationkey",
                "AttachColumns": ["n_name"],
            }
        ]
    )
    out = run(ev)
    f = F.col(FIELDS_COL)
    return (
        out.filter(f.getItem("n_name").isNotNull())
        .groupBy(f.getItem("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# packjson + appender + string_replace — chained transforms
# ---------------------------------------------------------------------------
@query(
    "transform_pack_append",
    """
    SELECT event_id,
           printf('{"event_type":"%s","uid":"%d"}', event_type, user_id) AS packed,
           concat(event_type, '-suffixed') AS appended,
           regexp_replace(CAST(user_id AS VARCHAR), '[0-9]', 'N', 'g') AS masked_uid
    FROM events
    ORDER BY event_id
    """,
)
def q_transform_pack_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    ev = to_events(
        df, content_col="props", field_cols=["event_type", "user_id"], id_cols=["event_id"]
    )
    # seed 'appended' with event_type (appender concatenates onto the
    # existing value), then run the chain
    seeded = compile_processors(
        [
            {"Type": "processor_rename", "SourceKeys": ["user_id"], "DestKeys": ["uid"]},
            {
                "Type": "processor_packjson",
                "SourceKeys": ["event_type", "uid"],
                "DestKey": "packed",
            },
        ]
    )(ev)
    seeded = seeded.withColumn(
        FIELDS_COL,
        F.map_concat(
            F.col(FIELDS_COL),
            F.create_map(F.lit("appended"), F.col(FIELDS_COL).getItem("event_type")),
        ),
    )
    out = compile_processors(
        [
            {"Type": "processor_appender", "Key": "appended", "Value": "-suffixed"},
            {
                "Type": "processor_string_replace",
                "SourceKey": "uid",
                "Method": "regex",
                "Match": "[0-9]",
                "ReplaceString": "N",
                "DestKey": "masked_uid",
            },
        ]
    )(seeded)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("packed").alias("packed"),
        f.getItem("appended").alias("appended"),
        f.getItem("masked_uid").alias("masked_uid"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_split_log_string — 1 event -> N events (explode)
# ---------------------------------------------------------------------------
@query(
    "split_log_string",
    """
    SELECT event_id, line FROM (
      SELECT event_id, event_type AS line FROM events
      UNION ALL
      SELECT event_id, CAST(user_id AS VARCHAR) AS line FROM events
    )
    ORDER BY event_id, line
    """,
)
def q_split_log_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    two_lines = F.format_string("%s\n%d", F.col("event_type"), F.col("user_id"))
    ev = to_events(
        df.withColumn("tl", two_lines), content_col="tl", field_cols=[], id_cols=["event_id"]
    )
    out = compile_processors([{"Type": "processor_split_log_string"}])(ev)
    return out.select(
        "event_id", F.col(FIELDS_COL).getItem("content").alias("line")
    ).orderBy("event_id", "line")


# ---------------------------------------------------------------------------
# processor_merge_multiline_log — N physical lines -> logical events
# ---------------------------------------------------------------------------
@query(
    "merge_multiline",
    """
    WITH lines AS (
      SELECT user_id, event_id,
             CASE WHEN event_id % 3 = 0 THEN 'START ' || event_id
                  ELSE 'cont ' || event_id END AS content
      FROM events
    ), evts AS (
      SELECT *, sum(CASE WHEN content LIKE 'START%' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS UNBOUNDED PRECEDING) AS evt
      FROM lines
    )
    SELECT user_id, CAST(evt AS BIGINT) AS evt,
           string_agg(content, chr(10) ORDER BY event_id) AS merged
    FROM evts WHERE evt > 0
    GROUP BY user_id, evt
    ORDER BY user_id, evt
    """,
)
def q_merge_multiline(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    content = F.when(
        F.col("event_id") % 3 == 0,
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
                "UnmatchedContentTreatment": "discard",
            }
        ]
    )(ev)
    return out.select(
        "user_id",
        F.col("__evt__").alias("evt"),
        F.col(FIELDS_COL).getItem("content").alias("merged"),
    ).orderBy("user_id", "evt")


# ---------------------------------------------------------------------------
# processor_log_to_sls_metric — log -> metric event reshape
# ---------------------------------------------------------------------------
@query(
    "log_to_metric",
    """
    SELECT event_id,
           'k_metric' AS mname,
           'env#$#prod|event_type#$#' || event_type AS mlabels,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS VARCHAR) AS mtime_nano,
           CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS DOUBLE) AS mvalue
    FROM events
    ORDER BY event_id
    """,
)
def q_log_to_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
            {
                "Type": "processor_log_to_sls_metric",
                "MetricLabelKeys": ["event_type"],
                "CustomMetricLabels": {"env": "prod"},
                "MetricValues": {"k_metric": "k"},
            },
        ]
    )(ev)
    return out.select(
        "event_id",
        F.col("__name__").alias("mname"),
        F.col("__labels__").alias("mlabels"),
        F.col("__time_nano__").alias("mtime_nano"),
        F.col("__value__").alias("mvalue"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# skew-safe salted count — two-phase aggregate must equal the plain one
# ---------------------------------------------------------------------------
@query(
    "skew_salted_count",
    """
    SELECT event_type, count(*) AS n FROM events GROUP BY 1 ORDER BY event_type
    """,
)
def q_skew_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ilogtail_spark.plans.skew import salted_count

    df = _t(spark, sf_dir, "events").withColumn(
        "turn_idx", F.col("event_id").cast("int")
    )
    return salted_count(df, key="event_type", salt_buckets=8).orderBy("event_type")


# ---------------------------------------------------------------------------
# processor_encrypt — AES-CBC. DuckDB has no AES builtin, so the oracle
# checks the DETERMINISTIC observables: the decrypted plaintext (the
# in-plan aes_decrypt(aes_encrypt(x)) round-trip) and the ciphertext
# length, which for Spark's CBC+PKCS (output = 16-byte IV || cipher)
# is an exact function of the plaintext byte length:
# 2 * (16 + 16 * (floor(len/16) + 1)) hex chars.
# ---------------------------------------------------------------------------
@query(
    "encrypt_roundtrip",
    """
    SELECT event_id,
           event_type AS plain,
           CAST(2 * (16 + 16 * (floor(strlen(event_type) / 16) + 1)) AS BIGINT)
             AS cipher_hex_len
    FROM events
    ORDER BY event_id
    """,
)
def q_encrypt_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = "00112233445566778899aabbccddeeff"
    iv = "000102030405060708090a0b0c0d0e0f"
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {
                "Type": "processor_encrypt",
                "SourceKeys": ["event_type"],
                "EncryptionParameters": {"Key": key, "IV": iv},
            }
        ]
    )(ev)
    f = F.col(FIELDS_COL)
    decrypted = F.expr(
        f"CAST(aes_decrypt(unhex(fields['event_type']), unhex('{key}'), "
        f"'CBC', 'PKCS') AS STRING)"
    )
    return out.select(
        "event_id",
        decrypted.alias("plain"),
        F.length(f.getItem("event_type")).cast("long").alias("cipher_hex_len"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_parse_apsara_native — Apsara header + k:v tail
# ---------------------------------------------------------------------------
@query(
    "apsara_parse",
    """
    SELECT event_id,
           'INFO' AS level,
           CAST(user_id AS VARCHAR) AS thread,
           event_type AS k1,
           CAST(CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT) * 1000000
                AS VARCHAR) AS microtime
    FROM events
    ORDER BY event_id
    """,
)
def q_apsara_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    line = F.format_string(
        "[%s]\t[INFO]\t[%d]\tk1:%s",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss"),
        F.col("user_id"),
        F.col("event_type"),
    )
    ev = to_events(
        df.withColumn("line", line).drop("ts"),
        content_col="line",
        field_cols=[],
        id_cols=["event_id"],
    )
    out = compile_processors(
        [{"Type": "processor_parse_apsara_native", "SourceKey": "content"}]
    )(ev)
    f = F.col(FIELDS_COL)
    return out.select(
        "event_id",
        f.getItem("__LEVEL__").alias("level"),
        f.getItem("__THREAD__").alias("thread"),
        f.getItem("k1").alias("k1"),
        f.getItem("microtime").alias("microtime"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# processor_geoip — IP range broadcast lookup
# ---------------------------------------------------------------------------
@query(
    "geoip_enrich",
    """
    SELECT CASE
             WHEN user_id % 256 < 64 THEN 'region-a'
             WHEN user_id % 256 < 128 THEN 'region-b'
             ELSE NULL
           END AS city,
           count(*) AS n
    FROM events
    GROUP BY 1
    ORDER BY city NULLS FIRST
    """,
)
def q_geoip_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    # range dim: 10.0.0.0-10.0.63.255 -> region-a, 10.0.64.0-10.0.127.255 -> region-b
    dim_dir = os.path.join(tempfile.gettempdir(), "ilogtail_spark_geoip_dim")
    spark.createDataFrame(
        [
            (167772160, 167788543, "region-a", "p", "c"),
            (167788544, 167804927, "region-b", "p", "c"),
        ],
        "net_start long, net_end long, city string, province string, country string",
    ).write.mode("overwrite").parquet(dim_dir)
    df = _t(spark, sf_dir, "events").withColumn(
        "ip", F.format_string("10.0.%d.%d", F.col("user_id") % 256, F.col("event_id") % 256)
    )
    ev = to_events(df, content_col="props", field_cols=["ip"], id_cols=["event_id"])
    out = compile_processors(
        [{"Type": "processor_geoip", "SourceKey": "ip", "DimPath": dim_dir}]
    )(ev)
    f = F.col(FIELDS_COL)
    return (
        out.groupBy(f.getItem("city").alias("city"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("city").asc_nulls_first())
    )


# ---------------------------------------------------------------------------
# processor_otel_metric — OTel metric reshape
# ---------------------------------------------------------------------------
@query(
    "otel_metric",
    """
    SELECT event_id,
           'k_gauge' AS metric_name,
           CAST(CAST(floor(epoch(ts)) AS BIGINT) * 1000000000 AS BIGINT) AS time_unix_nano,
           CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS DOUBLE) AS value
    FROM events
    ORDER BY event_id
    """,
)
def q_otel_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    out = compile_processors(
        [
            {"Type": "processor_regex", "Regex": K_REGEX, "Keys": ["k"], "KeepSource": True},
            {
                "Type": "processor_otel_metric",
                "MetricValues": {"k_gauge": "k"},
                "AttributeKeys": ["event_type"],
            },
        ]
    )(ev)
    return out.select(
        "event_id", "metric_name", "time_unix_nano", "value"
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# sls output record format (converter custom_single)
# ---------------------------------------------------------------------------
@query(
    "sls_record_format",
    """
    SELECT event_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS time,
           '{"time":' || CAST(floor(epoch(ts)) AS BIGINT) ||
           ',"contents":{"content":' || to_json(props) ||
           ',"event_type":' || to_json(event_type) || '},"tags":{}}' AS record
    FROM events
    ORDER BY event_id
    """,
)
def q_sls_record_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _t(spark, sf_dir, "events")
    ev = to_events(
        df, content_col="props", field_cols=["event_type"], id_cols=["event_id", "ts"]
    )
    # same projection as extras.to_sls_record, keeping event_id for
    # the oracle compare
    time_col = F.unix_timestamp(F.col("ts")).cast("long")
    rec = F.to_json(
        F.struct(
            time_col.alias("time"),
            F.col(FIELDS_COL).alias("contents"),
            F.col("tags").alias("tags"),
        )
    )
    return ev.select(
        "event_id", time_col.alias("time"), rec.alias("record")
    ).orderBy("event_id")


def entry_query(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Driver smoke entry: the flagship end-to-end pipeline."""
    return q_e2e_sink_hourly_counts(spark, sf_dir)
