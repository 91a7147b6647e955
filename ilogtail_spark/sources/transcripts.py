"""Deterministic synthetic transcripts table (FIXTURES.md F1/F2).

The analog of the reference's ``input_mock`` deterministic source
(plugins/input/mock/) plus the benchmark's nginx log generator
(test/benchmark/local/test_cases/.../case.feature): every value is a
pure function of (seed, row id), computed JVM-side with built-in
expressions — no Python in the generation path, so 10^7-row bench
inputs materialize at scan speed.

Schema == BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Turn text follows one of 7 template shapes (chosen by hash) that
exercise every parser family: nginx-access regex, app-log regex,
syslog/grok, JSON, delimiter, key-value, sensitive k=v.

Conversation sizes are Zipf-skewed: conversation ranks are drawn as
``floor(n_convs * u^SKEW)`` so low ranks are hot — a few conv_ids own
a large share of turns (exercises salting / AQE skew handling).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOOLS = ["search", "code", "browser", "calc", "shell"]  # 'shell' is absent from the enrich dim (HandleMissing test)
ROLES = ["user", "assistant", "system", "tool"]
SKEW = 3  # u^3 -> conversation 0 receives ~ n^(1/3)-fold share

TEMPLATE_NAMES = [
    "nginx",
    "applog",
    "syslog",
    "json",
    "delimiter",
    "keyvalue",
    "sensitive",
]


def _h(salt: int, *cols: Column) -> Column:
    """Deterministic non-negative 63-bit hash of columns."""
    return F.abs(F.xxhash64(F.lit(salt), *cols))


def generate_transcripts(
    spark: SparkSession,
    n_turns: int = 10_000,
    n_convs: int | None = None,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    if n_convs is None:
        n_convs = max(1, n_turns // 20)
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism

    df = spark.range(0, n_turns, numPartitions=partitions)
    rid = F.col("id")

    # Zipf-ish conversation assignment: u in [0,1) -> rank = floor(C*u^SKEW).
    u = (_h(seed, rid) % 1_000_000) / 1_000_000.0
    conv_rank = F.floor(F.lit(n_convs) * F.pow(u, F.lit(SKEW))).cast("long")
    df = df.withColumn("conv_rank", conv_rank)

    # turn_idx = arrival order within the conversation (row_number), so
    # generation order != (conv_id, turn_idx) order — forces the
    # stability window downstream.
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_rank").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    conv_id = F.format_string("conv_%08d", F.col("conv_rank"))
    h_role = _h(seed + 1, rid) % 10
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(h_role < 4, F.lit("user"))
        .when(h_role < 8, F.lit("assistant"))
        .otherwise(F.lit("tool"))
    )
    tool = F.when(
        role == "tool",
        _elem(TOOLS, _h(seed + 2, rid) % len(TOOLS)),
    ).otherwise(F.lit(""))

    # Deterministic event time: base + conv spacing + turn spacing.
    secs = F.col("conv_rank") * 97 + F.col("turn_idx") * 7
    ts = F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=secs)

    df = (
        df.withColumn("conv_id", conv_id)
        .withColumn("role", role)
        .withColumn("tool", tool)
        .withColumn("ts", ts)
    )
    df = df.withColumn("text", _text_expr(seed, rid, df))
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _elem(values: list[str], idx: Column) -> Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (idx + 1).cast("int"))


def _text_expr(seed: int, rid: Column, df: DataFrame) -> Column:
    """Pick one of 7 template shapes by hash and render it JVM-side."""
    t = _h(seed + 3, rid) % len(TEMPLATE_NAMES)
    h1 = _h(seed + 4, rid)
    h2 = _h(seed + 5, rid)
    h3 = _h(seed + 6, rid)

    methods = _elem(["GET", "POST", "PUT", "DELETE"], h1 % 4)
    status = _elem(["200", "200", "200", "404", "500", "302"], h2 % 6)
    ip = F.format_string(
        "10.%d.%d.%d", (h1 % 200).cast("int"), (h2 % 250).cast("int"), (h3 % 250).cast("int")
    )
    clock = F.date_format(F.col("ts"), "dd/MMM/yyyy:HH:mm:ss Z")
    nginx = F.format_string(
        '%s - frank [%s] "%s /api/v1/%s/%d HTTP/1.1" %s %d "-" "agent-%d"',
        ip,
        clock,
        methods,
        _elem(["users", "orders", "items", "search"], h3 % 4),
        (h1 % 10_000).cast("int"),
        status,
        (h2 % 50_000).cast("int"),
        (h3 % 9).cast("int"),
    )

    applog = F.format_string(
        "%s %d [Worker-%d] %s  request done latency_ms=%d route=/r/%d",
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"),
        (h1 % 100_000_000).cast("int"),
        (h2 % 16).cast("int"),
        _elem(["INFO", "WARN", "ERROR", "DEBUG"], h3 % 4),
        (h1 % 2_000).cast("int"),
        (h2 % 40).cast("int"),
    )

    syslog = F.format_string(
        "%s %s[%d]: tool call %s code=%d",
        F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        _elem(["search", "code", "browser", "calc"], h1 % 4),
        (1000 + h2 % 9000).cast("int"),
        _elem(["ok", "failed", "retried"], h3 % 3),
        (h1 % 3).cast("int"),
    )

    jsonl = F.format_string(
        '{"service":"svc%d","latency_ms":%d,"ok":%s,"nested":{"a":%d,"b":{"c":"x%d"}},"items":[%d,%d]}',
        (h1 % 8).cast("int"),
        (h2 % 5_000).cast("int"),
        _elem(["true", "false"], h3 % 2),
        (h1 % 100).cast("int"),
        (h2 % 10).cast("int"),
        (h3 % 7).cast("int"),
        (h1 % 7).cast("int"),
    )

    delim = F.format_string(
        "%d\t%s\t%s\t%d",
        (h1 % 100_000).cast("int"),
        F.date_format(F.col("ts"), "yyyy-MM-dd"),
        _elem(["buy", "sell", "hold"], h2 % 3),
        (h3 % 1_000_000).cast("int"),
    )

    keyvalue = F.format_string(
        "class:main\tuser:u%d\tlatency:%d\t:empty%d\tstray%d",
        (h1 % 1_000).cast("int"),
        (h2 % 900).cast("int"),
        (h3 % 5).cast("int"),
        (h1 % 5).cast("int"),
    )

    sensitive = F.format_string(
        "password=secret%d&user=alice%d&token=tok_%d&note=ok",
        (h1 % 100).cast("int"),
        (h2 % 50).cast("int"),
        (h3 % 100_000).cast("int"),
    )

    return (
        F.when(t == 0, nginx)
        .when(t == 1, applog)
        .when(t == 2, syslog)
        .when(t == 3, jsonl)
        .when(t == 4, delim)
        .when(t == 5, keyvalue)
        .otherwise(sensitive)
    )


def template_of(seed: int = 42):
    """Python-side template chooser matching _text_expr's hash pick —
    used by tests' independent oracle to know which parser applies.
    Returns a function (row_id) -> template name.

    Note: tests instead detect the template from the text itself
    (regex sniffing) so the oracle stays independent of generator
    internals; this helper exists for dataset statistics only.
    """

    def which(row_id: int) -> str:
        raise NotImplementedError(
            "tests sniff templates from text; see tests/oracle.py"
        )

    return which


def tool_lookup_rows() -> list[tuple[str, str, str]]:
    """FIXTURES.md F3 enrich dimension ('shell' intentionally absent)."""
    return [
        ("search", "retrieval", "team-a"),
        ("code", "execution", "team-b"),
        ("browser", "retrieval", "team-a"),
        ("calc", "execution", "team-c"),
    ]


def tool_lookup_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        tool_lookup_rows(), "tool string, tool_category string, owner_team string"
    )
